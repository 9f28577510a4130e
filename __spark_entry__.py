"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``gis_etl_spark`` package; this module is
the thin contract adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gis_etl_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 shape (SURVEY.md §7.3 minimum slice): parquet scan with
    pushed filter → two-phase hash aggregation → sort.
    """
    builder, _ = REGISTRY["q1_pricing_summary"]
    return builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: builder for name, (builder, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles for DuckDB; ops DuckDB cannot express are
    omitted (driver records a rows-only check; engine-internal golden
    tests cover them under tests/)."""
    return {
        name: sql for name, (_, sql) in REGISTRY.items() if sql is not None
    }
