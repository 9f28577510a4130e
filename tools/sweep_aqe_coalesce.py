"""A/B the AQE small-partition coalescing policy (guide §2.2):
`spark.sql.adaptive.coalescePartitions.parallelismFirst` defaults to
true, which stops AQE from coalescing below the default parallelism —
on tiny post-shuffle stages that leaves up to 32 near-empty reduce
tasks per exchange paying pure scheduling overhead, and on a busy
cluster the Spark docs themselves recommend false. false +
advisoryPartitionSizeInBytes makes the post-shuffle partition count
derive from DATA SIZE (scale-adaptive) instead of the core count.

Both configs are runtime-settable, so one session measures both with
ABBA ordering to cancel drift. Usage:
  python tools/sweep_aqe_coalesce.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gis_etl_spark.queries import REGISTRY
from gis_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q21_waiting_suppliers",
    "top3_orders_per_customer",
    "sessionize_events",
    "customer_name_ed1_pairs",
    "supplier_copurchase_pairs",
    "leakage_safe_splits",
    "dedup_minhash_pairs",
    "bm25_topk",
    "cohort_retention",
    "funnel_events",
    "mixture_draw_split",
    "training_data_prep",
]

KEY = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("aqe-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        builder, _ = REGISTRY[name][0], None
        t0 = time.time()
        builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    print(f"{'query':34s} {'pf=true':>8s} {'pf=false':>9s}  delta")
    tot_t = tot_f = 0.0
    for name in names:
        if name not in REGISTRY:
            continue
        # warm both configs once
        spark.conf.set(KEY, "true")
        run(name)
        spark.conf.set(KEY, "false")
        run(name)
        # ABBA: true, false, false, true — min of each
        spark.conf.set(KEY, "true")
        a1 = run(name)
        spark.conf.set(KEY, "false")
        b1 = run(name)
        b2 = run(name)
        spark.conf.set(KEY, "true")
        a2 = run(name)
        ta, tb = min(a1, a2), min(b1, b2)
        tot_t += ta
        tot_f += tb
        print(f"{name:34s} {ta:8.3f} {tb:9.3f}  {tb - ta:+.3f}")
    print(f"{'TOTAL':34s} {tot_t:8.2f} {tot_f:9.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
