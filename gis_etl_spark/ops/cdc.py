"""Changelog / CDC operators [beyond-reference]: compact an append-only
change stream into current state, and build SCD2 validity intervals.

The reference engine (SURVEY §2) has no change-data-capture surface —
its pipelines are one-shot conversions (east_asia.py:286-314 reads a
static corpus and writes once). A production lakehouse ingest, though,
receives the same keys again and again (Debezium-style changelogs,
nightly re-extracts), and the two primitives every such pipeline needs
are:

- **latest-state compaction** (`cdc_latest_state`): collapse all
  changes per key to the most recent one — the batch materialization
  of a streaming upsert view;
- **SCD2 intervals** (`scd2_intervals`): turn the change history per
  key into [valid_from, valid_to) version rows — the
  slowly-changing-dimension type-2 layout whose output joins back to
  fact streams through ops.joins.asof_join / interval_join.

The orders table stands in for the changelog: key = o_custkey, change
time = (o_orderdate, o_orderkey) — the orderkey tiebreak makes the
change order total, so every decision below is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_etl_spark.io import read_table


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest state per key via ONE hash aggregation of
    max(struct(change_time…, payload…)).

    Plan shape / 100 TB: `max` over a struct whose leading fields are
    the change-version key gets partial aggregation on the map side —
    each input partition reduces to ≤ |keys| rows BEFORE the shuffle,
    so a changelog with a billion updates to a million keys moves a
    million rows, not a billion. The window rendition
    (row_number() = 1) must instead shuffle + SORT every change row.
    Determinism: struct comparison is lexicographic and
    (o_orderdate, o_orderkey) is unique per key, so the max is total —
    unlike `max_by`, which documents ties as nondeterministic."""
    orders = read_table(spark, sf_dir, "orders")
    latest = F.max(
        F.struct(
            F.col("o_orderdate"),
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.col("o_totalprice"),
        )
    ).alias("s")
    return (
        orders.groupBy("o_custkey")
        .agg(latest)
        .select(
            "o_custkey",
            F.col("s.o_orderkey").alias("last_orderkey"),
            F.col("s.o_orderstatus").alias("last_status"),
            F.col("s.o_totalprice").alias("last_totalprice"),
            F.col("s.o_orderdate").alias("last_update"),
        )
        .orderBy("o_custkey")
    )


def cdc_latest_state_sql() -> str:
    """Independent rendition: the classic row_number()-window form —
    agreement shows the aggregate plan computes the same 'latest'."""
    return """
        SELECT o_custkey,
               o_orderkey   AS last_orderkey,
               o_orderstatus AS last_status,
               o_totalprice AS last_totalprice,
               o_orderdate  AS last_update
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders
        ) WHERE rn = 1
        ORDER BY o_custkey
    """


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: per key, order the changes and close each
    version's interval with the next change's timestamp
    (valid_to = lead(valid_from); NULL = current version).

    Plan shape / 100 TB: one shuffle on the key, then a per-key sort
    inside the window — parallel across keys (no global sort). Keys are
    the natural partitioning; skewed keys (one entity with millions of
    changes) are the same AQE/salting case as any windowed op. The
    output is interval-join-ready: enrich facts against the dimension
    as-of any time via ops.joins.interval_join."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            F.row_number().over(w).alias("version"),
            "o_orderkey",
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("o_custkey", "version")
    )


def scd2_intervals_sql() -> str:
    return """
        SELECT o_custkey,
               row_number() OVER w AS version,
               o_orderkey,
               o_orderstatus AS status,
               o_totalprice AS totalprice,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               (lead(o_orderdate) OVER w IS NULL) AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, version
    """
