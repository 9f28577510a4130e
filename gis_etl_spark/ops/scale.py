"""Scale-engineering helpers: the levers a 1000-executor / 100 TB
deployment reaches for when the default plan shape stops working
(SURVEY.md §4.2 'hand-rolled physical choices', generalized).

- bucketed tables   — pre-shuffled storage: writing both join sides
  bucketed by the join key makes every future equi-join on that key
  shuffle-free (Exchange disappears from the plan; verified by test).
  This is the 100 TB answer to 'this join runs nightly'.
- salted joins      — when one key dominates (power-law sources,
  celebrity users), split the hot key across N salt buckets:
  replicate the small side N×, scatter the big side, join on
  (key, salt). AQE's skew-join handles sort-merge skew automatically;
  salting is the explicit fix when AQE can't (e.g. broadcast is
  impossible and a single key exceeds one task).
- resilient reads   — per-file fault isolation: the reference
  try/excepts each of 358 files and retries empties
  (east_asia.py:85-106); Spark's equivalents are
  ignoreCorruptFiles/ignoreMissingFiles, scoped here per-read rather
  than session-wide so healthy pipelines still fail loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Both sides
    of a recurring join bucketed by the same key & count → joins read
    co-located buckets with NO Exchange."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: scatter the big side's hot keys across
    n_salts partitions, replicate the small side once per salt, join on
    (key, salt). Output columns = big ∪ small minus the helper salt.

    Deterministic salt (hash of the whole big row's key + a uniform
    spreader) so the join stays reproducible.
    """
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt",
        F.pmod(
            F.hash(F.col(key), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ).cast("int"),
    )
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")


def read_parquet_resilient(
    spark: SparkSession, *paths: str
) -> DataFrame:
    """Parquet scan that skips corrupt/missing files (per-file fault
    isolation — east_asia.py:85-91's try/except-and-continue). Scoped
    via per-read options, not session conf, so other reads still fail
    loudly on corruption."""
    return (
        spark.read.option("ignoreCorruptFiles", "true")
        .option("ignoreMissingFiles", "true")
        .parquet(*paths)
    )
