"""Fresh-session floor for one registry query: run it in THIS process's
brand-new SparkSession/JVM (warm once, min of two timed runs through the
noop sink) and print one JSON line.

bench.py spawns this per top-wall entry so every round records the
quiesced-executor floor next to the in-suite wall — the r10–r11
dedup_embedding_lsh investigation took two rounds precisely because the
in-suite number (suite-state tax included) was the only record.

Usage: python tools/fresh_floor.py <query_name>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gis_etl_spark.queries import REGISTRY
from gis_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    builder, _ = REGISTRY[name]
    spark = get_spark("gis-etl-spark-fresh-floor")
    spark.sparkContext.setLogLevel("ERROR")

    def run() -> None:
        builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    run()  # warm: worker fork, codegen, broadcast/fixture caches
    t0 = time.time()
    run()
    t1 = time.time()
    run()
    floor = round(min(t1 - t0, time.time() - t1), 3)
    print(json.dumps({"name": name, "fresh_min_sec": floor}))
    spark.stop()


if __name__ == "__main__":
    main()
