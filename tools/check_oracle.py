"""Local replica of the driver's correctness gate.

Runs every queries() entry at sf0.01 (or $SPARK_GRAFT_SF_DIR), runs the
matching oracle_sql() through DuckDB over the same parquet, and compares
row count + schema + order-insensitive value hash, mirroring the
driver's CORRECTNESS_r{N}.json check. Usage:

    python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from gis_etl_spark.io import TPCH_TABLES
from gis_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# DuckDB integer families. If one of these reaches pandas as float64 while
# the matching Spark column stays integral, the driver's value-hash renders
# e.g. "6070.0" against Spark's "6070" and the gate reds even though the
# values are identical. The known asymmetric cause is HUGEINT (DuckDB's
# sum(INT*) result type, no pandas integer mapping) — that cost three r2
# driver rows. A NULL-bearing BIGINT also lands as float64 via .df(), but
# the Spark side degrades identically through toPandas (asof_click_view's
# gap_us passed r2's driver hash this way), so it is only flagged when the
# Spark column is NULL-free and would stay int64. Fix flagged columns by
# casting ::BIGINT / coalescing NULLs in the oracle SQL.
_DUCK_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
}


def lint_oracle_df_typing(con, sql: str, scols, srows) -> list[str]:
    """Return lint messages for int-typed oracle columns that a
    pandas-style fetch (`.df()`, as the driver's gate uses) would
    degrade to float64 while Spark's side stays integral."""
    rel = con.sql(sql)
    types = [str(t).upper() for t in rel.types]
    pdf = rel.df()
    sidx = {c: i for i, c in enumerate(scols)}
    msgs = []
    for col, t in zip(rel.columns, types):
        if t not in _DUCK_INT_TYPES:
            continue
        if not str(pdf[col].dtype).startswith("float"):
            continue
        i = sidx.get(col)
        spark_has_null = i is not None and any(r[i] is None for r in srows)
        if spark_has_null:
            continue  # both sides degrade to float64 → hashes still agree
        msgs.append(
            f"oracle-typing: `{col}` is {t} in DuckDB but float64 via "
            f".df() while Spark stays int; cast it (::BIGINT) in the oracle"
        )
    return msgs


def _normalize_cell(v, naive_dt_is_local: bool = False) -> str:
    if v is None:
        return "NULL"
    # TZ-robust timestamp canonicalization (datetime, not date): a
    # PySpark collect() renders TimestampType via fromtimestamp() in the
    # HOST-LOCAL zone, while DuckDB fetchall() returns the naive-UTC
    # instant — identical instants, different reprs on a non-UTC host.
    # Re-anchor both to UTC before hashing. (The driver's gate runs on a
    # UTC host, where the two reprs coincide; this keeps the local gate
    # honest under `TZ=America/New_York python tools/check_oracle.py`.)
    import datetime as _dt

    if isinstance(v, _dt.datetime) and v.tzinfo is None:
        if naive_dt_is_local:
            v = _dt.datetime.fromtimestamp(
                v.timestamp(), tz=_dt.timezone.utc
            )
        else:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return v.isoformat()
    if isinstance(v, float):
        # Consistent float rendering on both engines; queries already
        # round explicitly, this only canonicalizes -0.0 / int-floats.
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, colnames, naive_dt_is_local: bool = False) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(_normalize_cell(r[i], naive_dt_is_local) for i in order)
        for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    only = set(sys.argv[1:])
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        try:
            problems.extend(
                lint_oracle_df_typing(con, oracles[name], scols, srows)
            )
        except Exception as e:  # noqa: BLE001
            problems.append(f"oracle-typing lint error: {e}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            sh = value_hash(srows, scols, naive_dt_is_local=True)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                pairs = list(
                    zip(
                        sorted(map(str, srows))[:3],
                        sorted(map(str, orows))[:3],
                    )
                )
                for sp, du in pairs:
                    problems.append(f"  spark={sp}")
                    problems.append(f"  duck ={du}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
