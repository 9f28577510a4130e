"""A/A in-suite tax probe: run a slice of bench's HEADLINE list twice
in ONE session (same warm+min-of-2 policy as bench.py) and print both
passes' walls. If pass 2 is systematically slower than pass 1, the
suite accumulates state (storage blocks / broadcasts / listener
backlog) that taxes later queries — the mechanism VERDICT r18 suspects
behind the driver's in-suite regression. Optional env:

  AB_N         how many headline queries per pass (default 40)
  AB_PASSES    number of passes (default 2)
  AB_CONF      extra spark conf as "k=v,k=v" (A/B the fix candidates)

Prints one JSON line per pass plus a final summary line.
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


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _mem_snapshot(spark) -> dict:
    """Driver/executor memory + GC snapshot via the local REST UI."""
    try:
        import urllib.request

        port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
        base = f"http://localhost:{port}/api/v1/applications"
        with urllib.request.urlopen(base, timeout=5) as r:
            appid = json.load(r)[0]["id"]
        with urllib.request.urlopen(f"{base}/{appid}/executors", timeout=5) as r:
            ex = json.load(r)[0]
        return {
            "storage_mem": ex["memoryUsed"],
            "rdd_blocks": ex["rddBlocks"],
            "gc_ms": ex["totalGCTime"],
        }
    except Exception as e:  # noqa: BLE001
        return {"err": str(e)[:120]}


def main() -> None:
    n = int(os.environ.get("AB_N", "40"))
    passes = int(os.environ.get("AB_PASSES", "2"))
    extra = {}
    for kv in os.environ.get("AB_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    import bench  # HEADLINE order

    names = [q for q in bench.HEADLINE if q in REGISTRY][:n]
    spark = get_spark("ab-suite", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["count_lineitem"][0](spark, SF_DIR).count()

    per_pass: list[dict[str, float]] = []
    for p in range(passes):
        walls: dict[str, float] = {}
        t_pass = time.time()
        for name in names:
            builder, _ = REGISTRY[name]
            try:
                _materialize(builder(spark, SF_DIR))
                t0 = time.time()
                _materialize(builder(spark, SF_DIR))
                t1 = time.time()
                _materialize(builder(spark, SF_DIR))
                walls[name] = round(min(t1 - t0, time.time() - t1), 3)
            except Exception as e:  # noqa: BLE001
                walls[name] = -1.0
                print(f"# {name}: {type(e).__name__}: {e}"[:200],
                      file=sys.stderr)
        per_pass.append(walls)
        print(json.dumps({
            "pass": p,
            "sum": round(sum(v for v in walls.values() if v > 0), 2),
            "wall": round(time.time() - t_pass, 2),
            "mem": _mem_snapshot(spark),
            "queries": walls,
        }))
        sys.stdout.flush()
    if passes >= 2:
        a, b = per_pass[0], per_pass[-1]
        ratio = {
            k: round(b[k] / a[k], 2)
            for k in a
            if a.get(k, 0) > 0 and b.get(k, 0) > 0
        }
        worst = sorted(ratio, key=ratio.get, reverse=True)[:10]
        print(json.dumps({
            "summary": "lastpass_vs_pass0",
            "sum0": round(sum(v for v in a.values() if v > 0), 2),
            "sumN": round(sum(v for v in b.values() if v > 0), 2),
            "worst": {k: ratio[k] for k in worst},
        }))


if __name__ == "__main__":
    main()
