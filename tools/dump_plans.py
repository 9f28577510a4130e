"""Dump `.explain("formatted")` for registry queries into plans/<tag>/.

Usage:
  python tools/dump_plans.py <tag> [query ...]      # default: bench HEADLINE

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX,
default 'before') plus a one-line-per-query summary (Exchange count,
join strategies, Python eval nodes, pushed filters) to stdout — the
optimization-round receipt artifact (plans/r18/*_before.txt /
*_after.txt) the judge checks plan claims against.

Only builds plans (no execution) — but note some builders eagerly
materialize session artifacts (dedup snapshot, ANN/BM25 index tables,
localCheckpoints) as a side effect, so the first run on a fresh
session pays those builds.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gis_etl_spark.queries import REGISTRY
from gis_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r18"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in REGISTRY]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = REGISTRY[name][0](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — keep dumping the rest
            print(f"=== {name}: ERROR {type(e).__name__}: {e}")
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        pushed = [
            p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p
        ]
        print(
            f"=== {name}: Exchange={plan.count('Exchange')} "
            f"BHJ={plan.count('BroadcastHashJoin')} "
            f"SMJ={plan.count('SortMergeJoin')} "
            f"SHJ={plan.count('ShuffledHashJoin')} "
            f"PyEval={plan.count('EvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow')} "
            f"Window={plan.count('Window')} "
            f"pushed={len(pushed)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
