"""Stage-split profile of dedup_embedding_lsh at sf0.1 (VERDICT r10
item 2: 2.98 s r8 -> 5.28 s r10 with the code untouched).

Times each stage through a noop sink (count), warm-run minimum of 3,
the same method that isolated the minhash md5 bottleneck in r9.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gis_etl_spark.session import get_spark
from gis_etl_spark.io import read_table
from gis_etl_spark.ops import similarity as S

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn, runs=3):
    vals = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        vals.append(time.time() - t0)
    return round(min(vals), 3)


def main() -> None:
    spark = get_spark()
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    emb = S._emb(spark, SF_DIR)
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        F.col("doc_id").alias("vec_id"), "lang", "v"
    )
    out = {}

    bands = S._band_values_arrow(joined, S.EMB_LSH_BITS, S.EMB_LSH_BANDS)
    out["1_band_values"] = timed(lambda: bands.count())

    lists = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.collect_list("vec_id").alias("vs"))
        .filter(F.size("vs") <= S.EMB_LSH_BUCKET_CAP)
    )
    out["2_bucket_lists"] = timed(lambda: lists.count())

    cands = S._bucket_pairs(bands, S.EMB_LSH_BUCKET_CAP)
    out["3_pair_cands"] = timed(lambda: cands.count())
    out["3b_n_cands"] = cands.count()

    scored = S._verify_pairs_exact(cands, joined, SF_DIR)
    out["4_verify"] = timed(lambda: scored.count())

    kept = scored.filter(F.col("cos") >= S.EMB_DEDUP_T).distinct()
    out["5_kept_distinct"] = timed(lambda: kept.count())
    out["5b_n_kept"] = kept.count()

    full = S.dedup_embedding_lsh(spark, SF_DIR)
    out["6_full_query"] = timed(lambda: full.count())

    # bucket-size distribution: is skew the suspect?
    sizes = (
        bands.groupBy("band_idx", "band_val")
        .count()
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_bucket"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
            F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
        )
        .collect()[0]
    )
    out["buckets"] = sizes.asDict()
    print(json.dumps(out, default=str, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
