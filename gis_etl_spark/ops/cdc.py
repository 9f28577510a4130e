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


def _merge_changes(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(base, changes) for the MERGE contract query — both derived
    deterministically from the orders table so every SF has a real
    insert/update/delete mix:

    - base = orders with o_orderkey % 4 != 3 (the standing snapshot);
    - inserts = the held-out % 4 == 3 rows (op 'I');
    - updates = base keys with % 4 == 1: status -> 'U', priority ->
      '9-MERGED' (op 'U' carries the full new payload);
    - deletes = base keys with % 20 == 0 (op 'D', payload ignored)."""
    base = orders.filter(F.col("o_orderkey") % 4 != 3)
    ins = orders.filter(F.col("o_orderkey") % 4 == 3).select(
        F.lit("I").alias("op"), *orders.columns
    )
    upd = (
        base.filter(F.col("o_orderkey") % 4 == 1)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_orderpriority", F.lit("9-MERGED"))
        .select(F.lit("U").alias("op"), *orders.columns)
    )
    dele = base.filter(F.col("o_orderkey") % 20 == 0).select(
        F.lit("D").alias("op"), *orders.columns
    )
    return base, ins.unionAll(upd).unionAll(dele)


def merge_apply(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Generic MERGE INTO: apply a changes frame carrying an `op`
    column ('I' insert / 'U' update / 'D' delete; U and I carry the
    full new payload in base's columns) to `base` on `key`. The
    relational statement of the lakehouse upsert:

        result = (base anti-join touched-keys) ∪ U-payloads ∪ I-payloads

    Join strategy is left to AQE (batch size is a runtime property).
    Multi-change-per-key batches must be compacted first
    (cdc_latest_state's max-struct keeper); this operator assumes at
    most one change per key, the post-compaction contract.

    The anti-join removes EVERY touched key — including 'I' keys — so
    an insert whose key already exists in base replaces the base row
    (upsert) instead of silently duplicating the key. The result
    therefore always has at most one row per key given the one-change-
    per-key contract (ADVICE r14)."""
    touched = changes.select(key)
    survivors = base.join(touched, key, "left_anti")
    new_rows = changes.filter(F.col("op").isin("I", "U")).select(
        *base.columns
    )
    return survivors.unionAll(new_rows)


def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics — the lakehouse upsert primitive the
    latest-state compaction feeds: apply one changelog batch of
    inserts / updates / deletes to a base snapshot in a single plan.

    result = (base ⟕ anti-join on touched keys) ∪ U-payloads ∪
    I-payloads — deletes vanish by not being re-emitted. Precedence:
    a key can appear once per op class here (derivation is disjoint
    by construction: %20==0 keys are even, %4==1 keys odd, inserts
    held out of base), so no intra-batch ordering question arises;
    multi-change batches are first compacted by cdc_latest_state.

    Scale: ONE equi-join of base against the touched-key set (anti) —
    no forced broadcast hint: this fixture's batch touches ~30% of
    base keys, and at 100 TB the batch size is a runtime property, so
    the join strategy is left to AQE (small batch → runtime broadcast;
    big batch → hash join on the key both sides bucket on) — plus a
    union of the new payloads. Nothing shuffles twice; a real
    lakehouse writer then rewrites only the files the touched keys
    live in (the row-group-pruning story from the geometry side
    applies verbatim: key-clustered layout makes touched-file
    discovery a min/max skip)."""
    orders = read_table(spark, sf_dir, "orders")
    base, changes = _merge_changes(orders)
    return (
        merge_apply(base, changes, "o_orderkey")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy("o_orderkey")
    )


def cdc_merge_apply_sql() -> str:
    """Independent ANSI rendition of the same MERGE outcome (DuckDB's
    MERGE statement mutates tables; the oracle states the result
    relationally: anti-join + union of new payloads)."""
    return """
        WITH base AS (
          SELECT * FROM orders WHERE o_orderkey % 4 != 3
        ), ins AS (
          SELECT * FROM orders WHERE o_orderkey % 4 = 3
        ), upd AS (
          SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                 o_totalprice, o_orderdate,
                 '9-MERGED' AS o_orderpriority
          FROM base WHERE o_orderkey % 4 = 1
        ), del AS (
          SELECT o_orderkey FROM base WHERE o_orderkey % 20 = 0
        ), touched AS (
          SELECT o_orderkey FROM ins
          UNION ALL SELECT o_orderkey FROM upd
          UNION ALL SELECT o_orderkey FROM del
        ), survivors AS (
          SELECT b.* FROM base b
          LEFT JOIN touched t USING (o_orderkey)
          WHERE t.o_orderkey IS NULL
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM (
          SELECT * FROM survivors
          UNION ALL SELECT * FROM ins
          UNION ALL SELECT * FROM upd
        )
        ORDER BY o_orderkey
    """


def merge_apply_log(
    base: DataFrame, changelog: DataFrame, key: str
) -> DataFrame:
    """Ordered MULTI-BATCH merge (VERDICT r14 item 6): apply a
    changelog carrying a monotone `batch_id` column — a SEQUENCE of
    merge batches where later operations win — to `base` in one pass.
    Lakehouse reality: a table sees batch after batch of I/U/D; folding
    them one merge at a time rewrites the base per batch. This
    operator proves the compaction+merge composition instead:

        last-writer-wins per key  (max-struct on batch_id)
        → ONE merge_apply of the compacted batch.

    Equivalence to the sequential fold (property-tested): with at most
    one change per (key, batch) — the per-batch post-compaction
    contract — the sequential outcome per key depends only on its
    LAST change: D deletes whatever state preceded it; U/I leave the
    final payload regardless of history (merge_apply treats an 'I' on
    an existing key as an upsert, so a delete-then-reinsert sequence
    lands on the reinserted payload).

    Intra-batch ties (VERDICT r15 item 8): a changelog VIOLATING the
    ≤1-change-per-(key, batch) contract does not fail silently into
    struct-comparison accident — the compaction struct carries an
    explicit op precedence rank after batch_id, pinning the defined
    outcome: within one batch, an upsert (U, then I) beats a delete
    (D). Rationale: a batch that both writes and deletes a key is
    producer error; resolving toward the surviving payload is the
    recoverable choice (a spurious survivor is correctable by the next
    batch's D; a spurious delete loses the payload). Remaining ties
    (two U's for one (key, batch)) break on the payload columns
    themselves — deterministic, since the struct comparison is total.
    Tested in tests/test_cdc_graph.py.

    Scale: the compaction is one groupBy(key) max(struct(batch_id,
    op, payload…)) — associative, map-side combined, shuffling ≤ one
    row per touched key however many batches the log holds (the
    cdc_latest_state shape); then exactly one anti-join + union
    against base. Nothing scans base more than once, and the log is
    never windowed."""
    payload = [c for c in base.columns if c != key]
    op_rank = (
        F.when(F.col("op") == "U", F.lit(2))
        .when(F.col("op") == "I", F.lit(1))
        .otherwise(F.lit(0))
    )
    compacted = (
        changelog.groupBy(key)
        .agg(
            F.max(
                F.struct(
                    F.col("batch_id"),
                    op_rank.alias("op_rank"),
                    F.col("op").alias("op"),
                    *[F.col(c).alias(c) for c in payload],
                )
            ).alias("w")
        )
        .select(
            F.col("w.op").alias("op"),
            key,
            *[F.col(f"w.{c}").alias(c) for c in payload],
        )
    )
    return merge_apply(base, compacted, key)


def _merge_log_changes(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic 3-batch changelog over the orders fixture, with
    keys deliberately touched by SEVERAL batches so last-writer-wins
    is load-bearing:

    - base: o_orderkey % 4 != 3 (the merge fixture's base);
    - batch 0: U on %4==1 keys (status 'U', priority '0-B0'),
               D on %20==0 keys;
    - batch 1: I of the held-out %4==3 keys,
               U on %8==1 keys (⊂ batch 0's U set — overrides to
               priority '1-B1');
    - batch 2: D on %16==1 keys (⊂ batch 1's U set — final delete),
               I on %20==0 keys (re-insert of batch 0's deletes,
               priority '2-B2' — the delete-then-reinsert case)."""
    base = orders.filter(F.col("o_orderkey") % 4 != 3)

    def chg(df: DataFrame, op: str, bid: int, status=None, prio=None):
        out = df
        if status is not None:
            out = out.withColumn("o_orderstatus", F.lit(status))
        if prio is not None:
            out = out.withColumn("o_orderpriority", F.lit(prio))
        return out.select(
            F.lit(op).alias("op"),
            F.lit(bid).cast("long").alias("batch_id"),
            *orders.columns,
        )

    b0 = chg(
        base.filter(F.col("o_orderkey") % 4 == 1), "U", 0, "U", "0-B0"
    ).unionAll(chg(base.filter(F.col("o_orderkey") % 20 == 0), "D", 0))
    b1 = chg(
        orders.filter(F.col("o_orderkey") % 4 == 3), "I", 1
    ).unionAll(
        chg(base.filter(F.col("o_orderkey") % 8 == 1), "U", 1, "U", "1-B1")
    )
    b2 = chg(base.filter(F.col("o_orderkey") % 16 == 1), "D", 2).unionAll(
        chg(
            base.filter(F.col("o_orderkey") % 20 == 0), "I", 2, "I", "2-B2"
        )
    )
    return base, b0.unionAll(b1).unionAll(b2)


def cdc_merge_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-batch MERGE contract query: three overlapping changelog
    batches compact to last-writer-wins and apply as one merge —
    updates overridden by later updates, an update chain ending in a
    delete, and a delete followed by a re-insert all land on the
    final batch's outcome (fixture: _merge_log_changes)."""
    # six changelog legs + base + the merge's anti-join each re-scan
    # orders (13 scans in one plan). Measured r18: checkpointing the
    # source once LOST 2× (3.87 s vs 1.92 s fresh floor) — the
    # materialization carries FULL-WIDTH rows and every consumer loses
    # parquet column pruning, while the 13 scans are narrow, pushed
    # columnar reads of a small file. Deliberately left lazy.
    orders = read_table(spark, sf_dir, "orders")
    base, log = _merge_log_changes(orders)
    return (
        merge_apply_log(base, log, "o_orderkey")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy("o_orderkey")
    )


def cdc_merge_apply_log_sql() -> str:
    """Independent ANSI rendition: the compaction is the textbook
    window argmax (row_number over batch_id DESC) — deliberately NOT
    the engine's max-struct — then the same relational merge
    statement, so the hash match pins the max-struct == window-argmax
    equivalence as well as the merge outcome."""
    return """
        WITH base AS (
          SELECT * FROM orders WHERE o_orderkey % 4 != 3
        ), log AS (
          SELECT 'U' AS op, 0 AS batch_id, o_orderkey, o_custkey,
                 'U' AS o_orderstatus, o_totalprice, o_orderdate,
                 '0-B0' AS o_orderpriority
          FROM base WHERE o_orderkey % 4 = 1
          UNION ALL
          SELECT 'D', 0, o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice, o_orderdate, o_orderpriority
          FROM base WHERE o_orderkey % 20 = 0
          UNION ALL
          SELECT 'I', 1, o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice, o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 4 = 3
          UNION ALL
          SELECT 'U', 1, o_orderkey, o_custkey, 'U', o_totalprice,
                 o_orderdate, '1-B1'
          FROM base WHERE o_orderkey % 8 = 1
          UNION ALL
          SELECT 'D', 2, o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice, o_orderdate, o_orderpriority
          FROM base WHERE o_orderkey % 16 = 1
          UNION ALL
          SELECT 'I', 2, o_orderkey, o_custkey, 'I', o_totalprice,
                 o_orderdate, '2-B2'
          FROM base WHERE o_orderkey % 20 = 0
        ), compacted AS (
          SELECT op, o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice, o_orderdate, o_orderpriority
          FROM (
            SELECT l.*, row_number() OVER (
              PARTITION BY o_orderkey ORDER BY batch_id DESC) AS rk
            FROM log l
          ) WHERE rk = 1
        ), touched AS (
          SELECT o_orderkey FROM compacted
        ), survivors AS (
          SELECT b.* FROM base b
          LEFT JOIN touched t USING (o_orderkey)
          WHERE t.o_orderkey IS NULL
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM (
          SELECT * FROM survivors
          UNION ALL
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderdate, o_orderpriority
          FROM compacted WHERE op IN ('I', 'U')
        )
        ORDER BY o_orderkey
    """
