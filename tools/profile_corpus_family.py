"""Phase-level profile of the corpus-flags family (the r18 optimization
targets): times each materialization point of corpus_flags_rederive /
corpus_flags_increment / flags_increment_risk and reports the Spark
job count each phase paid, so the optimization targets the actual jobs
(guide §1 'measure first' — these queries are fixed-size fixtures, so
job-count latency, not data volume, is the hypothesis to test).

Usage: python tools/profile_corpus_family.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gis_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("profile-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    last = {"j": 0, "t": time.time()}

    def phase(label: str) -> None:
        j, t = jobs(), time.time()
        print(
            f"{label:45s} {t - last['t']:7.2f}s  jobs+={j - last['j']}"
        )
        last["j"], last["t"] = j, t

    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.dedup import (
        MINHASH_JACCARD_T,
        _docs,
        _exact_jaccard,
        build_dedup_snapshot,
        minhash_candidates,
    )

    docs = _docs(spark, None)
    inc = CB.increment_docs_risky(docs)
    phase("setup (lazy)")

    names = build_dedup_snapshot(spark, SF_DIR, None, "full")
    phase("build_dedup_snapshot (cold)")

    # warm: run the whole contract query once so JIT/codegen and
    # session artifacts are steady, as the bench does
    CB.corpus_flags_rederive(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    phase("corpus_flags_rederive WARM total")

    # phase-by-phase steady-state replay of the composition
    per_pair = CB._risk_pairs_for(spark, names, inc).localCheckpoint()
    phase("  per_pair probe + localCheckpoint")
    intra = (
        _exact_jaccard(
            inc.select("doc_id", "text"),
            minhash_candidates(inc.select("doc_id", "text")),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    phase("  intra chain + localCheckpoint")
    frozen = CB.increment_curation_flags(
        spark, SF_DIR, inc, use_stored_snapshot=True,
        shared_pairs=per_pair, shared_intra=intra,
    )
    frozen.write.format("noop").mode("overwrite").save()
    phase("  frozen flags (incl. label_components#1)")
    fix = CB.rederive_risky_component_flags(
        spark, SF_DIR, inc, shared_pairs=per_pair, shared_intra=intra
    ).localCheckpoint()
    phase("  rederive fix + localCheckpoint (#2 fixpoint)")
    n = fix.count()
    phase(f"  fix.count() = {n}")

    # steady-state full contract queries, noop-sunk (bench methodology)
    for qname in (
        "corpus_flags_rederive",
        "corpus_flags_increment",
        "flags_increment_risk",
        "corpus_build_funnel",
    ):
        from gis_etl_spark.queries import REGISTRY

        b, _ = REGISTRY[qname][0], None
        b(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        phase(f"{qname} steady #1")
        b(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        phase(f"{qname} steady #2")

    spark.stop()


if __name__ == "__main__":
    main()
