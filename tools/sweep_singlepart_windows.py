"""One-off probe: find every registry plan with a Window fed by an
Exchange SinglePartition (the scale anti-pattern the r12 plan-hygiene
guard pins). Prints offenders; the pytest sweep carries the allowlist."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gis_etl_spark.queries import REGISTRY
from gis_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_NODE = re.compile(r"^(?P<pre>[\s:+*|-]*)(?P<name>\w.*)$")


def window_feeds(plan_str: str) -> list[str]:
    """For each Window node, the first Exchange below it (its required
    child distribution). Returns the exchange descriptions."""
    lines = plan_str.splitlines()
    parsed = []
    for ln in lines:
        m = _NODE.match(ln)
        if not m or not m.group("name"):
            continue
        parsed.append((len(m.group("pre")), m.group("name")))
    feeds = []
    for i, (d, name) in enumerate(parsed):
        if not name.startswith("Window"):
            continue
        for d2, name2 in parsed[i + 1:]:
            if d2 <= d:
                break
            if name2.startswith("Exchange"):
                feeds.append(name2)
                break
    return feeds


def main() -> None:
    spark = get_spark()
    offenders = []
    for name, (builder, _) in sorted(REGISTRY.items()):
        try:
            plan = builder(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}")
            continue
        bad = [f for f in window_feeds(plan) if "SinglePartition" in f]
        if bad:
            offenders.append(name)
            print(f"FLAG  {name}: {bad[0][:100]}")
    print(f"\n{len(offenders)} offender(s): {offenders}")


if __name__ == "__main__":
    main()
