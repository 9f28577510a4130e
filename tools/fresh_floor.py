"""Fresh-session floor for one registry query or streaming twin: run
it in THIS process's brand-new SparkSession/JVM (warm once, min of two
timed runs) and print one JSON line.

bench.py spawns this per top-wall entry so every round records the
quiesced-executor floor next to the in-suite wall — the r10–r11
dedup_embedding_lsh investigation took two rounds precisely because the
in-suite number (suite-state tax included) was the only record. r13
extends the same treatment to the streaming section (VERDICT r12
item 1): each twin drains the SAME rig bench uses (events / orders /
×10-replicated docs, 8 input files) through a memory sink, in its own
JVM with its own state-store machinery.

Usage:
  python tools/fresh_floor.py <registry_query>
  python tools/fresh_floor.py --stream <streaming_twin>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gis_etl_spark.queries import REGISTRY
from gis_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# twin -> (builder name in pipelines.streaming, input rig, output mode).
# Rigs mirror bench._streaming_benches exactly so floor and in-suite
# wall measure the same drain.
STREAM_RIGS: dict[str, tuple[str, str, str]] = {
    "streaming_sessionize": ("streaming_sessionize", "events", "update"),
    "streaming_event_dedup": ("streaming_event_dedup", "events", "append"),
    "streaming_funnel": ("streaming_funnel", "events", "update"),
    "streaming_rolling_anomaly": (
        "streaming_rolling_anomaly", "events", "append",
    ),
    "streaming_latest_state": ("streaming_latest_state", "orders", "update"),
    "streaming_exact_dedup": ("streaming_exact_dedup", "docs10", "update"),
    "streaming_span_dedup": ("streaming_span_dedup", "docs10", "update"),
    "streaming_chunk_dedup": ("streaming_chunk_dedup", "docs10", "update"),
    "streaming_chunk_decontaminate": (
        "streaming_chunk_decontaminate", "docs10", "update",
    ),
    "streaming_cms_cells": ("streaming_cms_cells", "docs10", "update"),
    "streaming_heavy_hitters": (
        "streaming_heavy_hitter_candidates", "docs10", "update",
    ),
    "streaming_minhash_dedup": (
        "streaming_minhash_dedup", "docs10", "update",
    ),
    "streaming_incremental_dedup": (
        "streaming_incremental_dedup", "docs10", "update",
    ),
    "streaming_pii_redact": ("streaming_pii_redact", "docs10", "append"),
    # drains through the durable foreachBatch parquet sink — its state
    # is index-sized and a memory sink OOMs the 1g heap (see bench)
    "streaming_postings_build": (
        "streaming_postings_build", "docs10", "checkpointed",
    ),
    "streaming_ann_drift": ("streaming_ann_drift", "embshift", "complete"),
    "streaming_ingest_curation": (
        "streaming_ingest_curation", "docs10", "update",
    ),
}


def _registry_floor(spark, name: str) -> float:
    builder, _ = REGISTRY[name]

    def run() -> None:
        builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    run()  # warm: worker fork, codegen, broadcast/fixture caches
    t0 = time.time()
    run()
    t1 = time.time()
    run()
    return round(min(t1 - t0, time.time() - t1), 3)


def _stream_input(spark, kind: str, tmp: str) -> str:
    from pyspark.sql import functions as F

    from gis_etl_spark.io import read_table

    path = os.path.join(tmp, kind)
    if kind == "events":
        df = read_table(spark, SF_DIR, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    elif kind == "orders":
        df = read_table(spark, SF_DIR, "orders")
    elif kind == "embshift":  # the bench's drifted-embedding stream
        df = read_table(spark, SF_DIR, "embeddings").select(
            "vec_id",
            F.expr(
                "cast(transform(cast(embedding as array<double>),"
                " x -> x + 0.5D) as array<float>)"
            ).alias("embedding"),
            "label",
        )
    else:  # docs10: the bench's ×10 duplication-pressure corpus
        docs = read_table(spark, SF_DIR, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        df = spark.range(10).crossJoin(docs).select(
            (F.col("doc_id") + F.col("id") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            "text", "lang", "source", "n_chars",
        )
    df.repartition(8).write.mode("overwrite").parquet(path)
    return path


def _stream_floor(spark, name: str) -> float:
    from gis_etl_spark.pipelines import streaming as S

    builder_name, kind, mode = STREAM_RIGS[name]
    builder = getattr(S, builder_name)
    if name == "streaming_ann_drift":
        # frozen codebook, exactly as the in-suite rig passes it
        from gis_etl_spark.ops.similarity import _coarse_codebook

        cents = _coarse_codebook(spark, SF_DIR)
        raw = builder
        builder = lambda sp, d: raw(sp, d, cents)  # noqa: E731
    tmp = tempfile.mkdtemp(prefix="fresh_stream_")
    try:
        in_dir = _stream_input(spark, kind, tmp)

        if mode == "checkpointed":
            # index-sized state (~1.2M rows here) lives in RocksDB —
            # the in-heap HDFSBackedStateStore OOMs the 1g driver
            # across successive queries (providers cache per query)
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )

        def run(i: int) -> None:
            if mode == "checkpointed":
                S.run_checkpointed(
                    builder(spark, in_dir),
                    os.path.join(tmp, f"ff_ck_{i}"),
                    os.path.join(tmp, f"ff_out_{i}"),
                    output_mode="update",
                )
            else:
                S.run_to_memory(builder(spark, in_dir), f"ff_{i}", mode)
            S.release_snapshot_caches()

        run(0)  # warm: micro-batch + state-store machinery init
        t0 = time.time()
        run(1)
        t1 = time.time()
        run(2)
        return round(min(t1 - t0, time.time() - t1), 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    spark = get_spark("gis-etl-spark-fresh-floor")
    spark.sparkContext.setLogLevel("ERROR")
    if args[0] == "--stream":
        name = args[1]
        floor = _stream_floor(spark, name)
    else:
        name = args[0]
        floor = _registry_floor(spark, name)
    print(json.dumps({"name": name, "fresh_min_sec": floor}))
    spark.stop()


if __name__ == "__main__":
    main()
