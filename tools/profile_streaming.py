"""Per-batch breakdown of one streaming twin's availableNow drain:
batch count, per-batch durationMs components (addBatch / getBatch /
queryPlanning / walCommit / stateStore commit), state operator metrics.
Says WHERE a drain's wall goes (guide §1/§7.1 applied to the streaming
section) — micro-batch machinery vs state store vs the actual plan.

Usage: python tools/profile_streaming.py <twin> [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from gis_etl_spark.session import get_spark
from tools.fresh_floor import STREAM_RIGS, _stream_input

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from gis_etl_spark.pipelines import streaming as S

    builder_name, kind, mode = STREAM_RIGS[name]
    builder = getattr(S, builder_name)
    if name == "streaming_ann_drift":
        from gis_etl_spark.ops.similarity import _coarse_codebook

        spark = get_spark("profile-streaming")
        cents = _coarse_codebook(spark, SF_DIR)
        raw = builder
        builder = lambda sp, d: raw(sp, d, cents)  # noqa: E731
    else:
        spark = get_spark("profile-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="prof_stream_")
    in_dir = _stream_input(spark, kind, tmp)

    if mode == "checkpointed":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    for i in range(n_runs):
        t0 = time.time()
        sdf = builder(spark, in_dir)
        t_build = time.time() - t0
        out_mode = "update" if mode == "checkpointed" else mode
        t0 = time.time()
        if mode == "checkpointed":
            q = (
                sdf.writeStream.foreachBatch(
                    lambda bdf, bid: S._sink_write(
                        bdf, bid, os.path.join(tmp, f"out_{i}")
                    )
                )
                .outputMode(out_mode)
                .option(
                    "checkpointLocation", os.path.join(tmp, f"ck_{i}")
                )
                .trigger(availableNow=True)
                .start()
            )
        else:
            q = (
                sdf.writeStream.format("memory")
                .queryName(f"prof_{i}")
                .outputMode(out_mode)
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination()
        wall = time.time() - t0
        S.release_snapshot_caches()
        batches = []
        for p in q.recentProgress:
            d = p["durationMs"]
            batches.append(
                {
                    "batchId": p["batchId"],
                    "rows": p.get("numInputRows"),
                    "total": d.get("triggerExecution"),
                    "addBatch": d.get("addBatch"),
                    "getBatch": d.get("getBatch"),
                    "latestOffset": d.get("latestOffset"),
                    "planning": d.get("queryPlanning"),
                    "walCommit": d.get("walCommit"),
                    "commitOffsets": d.get("commitOffsets"),
                    "state": [
                        {
                            "op": so.get("operatorName"),
                            "commitMs": so.get("allUpdatesTimeMs"),
                            "commit": so.get("commitTimeMs"),
                            "rowsTotal": so.get("numRowsTotal"),
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
            )
        print(
            json.dumps(
                {
                    "run": i,
                    "build_sec": round(t_build, 3),
                    "drain_sec": round(wall, 3),
                    "n_batches": len(batches),
                    "batches": batches,
                },
                default=str,
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
