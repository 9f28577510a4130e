"""Benchmark harness — the driver runs this per round and records the
single JSON line it prints as BENCH_r{N}.json.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], times each
end-to-end (plan + execute + collect-to-count), and prints:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gis_etl_spark.queries import REGISTRY
from gis_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship relational queries plus (as they land)
# geometry / layout / north-star ops. Keep this the "would a user care"
# list, not every registry entry.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "top3_orders_per_customer",
    "events_hourly_rollup",
    "sessionize_events",
]


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark("gis-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/Python bridge once so per-query numbers measure the
    # query, not session startup.
    next(iter(REGISTRY.values()))[0](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        builder, _ = REGISTRY[name]
        t0 = time.time()
        builder(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    result = {
        "metric": "suite_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
