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

from pyspark.sql import DataFrame, SparkSession, Window
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


BLOOM_BITS_PER_KEY = 12
BLOOM_K = 4  # bits set per key inside its one-word block

_BLOOM_INTERNAL_COLS = ("_bh", "_bmask", "_bword", "_bloom", "_bkey", "_vkey")


def _check_reserved(df: DataFrame, what: str) -> None:
    """Refuse inputs that already carry this module's internal helper
    columns — a silent withColumn overwrite would corrupt the result
    instead of failing (ADVICE r8)."""
    clash = set(df.columns) & set(_BLOOM_INTERNAL_COLS)
    if clash:
        raise ValueError(
            f"bloom_semi_join: {what} already has reserved internal "
            f"column(s) {sorted(clash)}; rename them before calling"
        )


def _bloom_parts(df: DataFrame, key: str) -> DataFrame:
    """Attach `_bword` (block index column placeholder — caller pmods by
    n_words) and `_bmask` (the key's 4-bit in-word mask) to `df`.

    Split-block Bloom filter (SBBF) layout per the public Parquet spec /
    Putze et al. 2007 'Cache-, Hash- and Space-Efficient Bloom Filters':
    every key maps to ONE 64-bit word and sets BLOOM_K bits inside it,
    the bit positions taken from independent bytes of a second hash lane.
    One word per key means membership is a single equi-join on the word
    index plus a mask test — no per-hash fan-out, no Python, pure JVM."""
    out = df.withColumn("_bh", F.xxhash64(F.col(key), F.lit(0x5BBF)))
    mask = " | ".join(
        f"shiftleft(1L, cast((shiftrightunsigned(_bh, {8 * j}) & 63) AS INT))"
        for j in range(BLOOM_K)
    )
    return out.withColumn("_bmask", F.expr(mask)).drop("_bh")


def bloom_build(dim: DataFrame, key: str, n_words: int) -> DataFrame:
    """Aggregate a dim-side SBBF: one row per occupied 64-bit block,
    (`_bword` int, `_bloom` long). Shuffles only |distinct keys| narrow
    rows and returns ≤ n_words rows — broadcastable at any dim size a
    semi-join could use (n_words is the caller's memory knob: 8 B/block)."""
    keys = dim.select(F.col(key).alias("_bkey")).distinct()
    parts = _bloom_parts(keys, "_bkey").withColumn(
        "_bword",
        F.pmod(F.xxhash64(F.col("_bkey"), F.lit(0xB10C)), F.lit(n_words)),
    )
    return parts.groupBy("_bword").agg(F.bit_or("_bmask").alias("_bloom"))


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_words: int = 1 << 12,
) -> DataFrame:
    """Exact semi-join with a Bloom pre-prune: `fact` rows whose
    `fact_key` appears in `dim[dim_key]`.

    Two phases, both exact in the end:
      1. PRUNE (map-side): broadcast the ≤ n_words-row SBBF from
         bloom_build and keep only fact rows whose block has all K bits
         set — a BroadcastHashJoin on the block index, zero fact-side
         shuffle, no false negatives by construction.
      2. VERIFY: left_semi on the real key removes the Bloom's false
         positives, so the result is bit-identical to a plain semi-join.

    Why at 100 TB: the verify join is the expensive one (dim too big to
    broadcast → both sides shuffle on the key). The Bloom runs BEFORE
    that shuffle and costs 8·n_words bytes broadcast + one map-side
    probe, so only the ~fp_rate false positives plus true matches pay
    shuffle I/O. This is the explicit form of the runtime-bloom pruning
    Spark's optimizer injects (spark.sql.optimizer.runtime.bloomFilter),
    usable when the build side is a derived frame the optimizer can't
    see through. Generalizes the reference's manifest-lookup J2 shape
    (east_asia.py:382-393) to dims past broadcast size.

    Key-type contract: xxhash64 is TYPE-sensitive (an int 7 and a
    bigint 7 hash differently), so mismatched key types would make the
    prune drop true matches — silent false negatives the verify join
    cannot recover. Both keys must share one Spark type; mismatches
    raise instead of corrupting (ADVICE r8)."""
    ft = fact.schema[fact_key].dataType
    dt = dim.schema[dim_key].dataType
    if ft != dt:
        raise ValueError(
            f"bloom_semi_join: fact_key {fact_key!r} is {ft.simpleString()} "
            f"but dim_key {dim_key!r} is {dt.simpleString()}; xxhash64 is "
            "type-sensitive, so mixed-width keys silently drop true "
            "matches — cast both sides to one type first"
        )
    _check_reserved(fact, "fact")
    _check_reserved(dim, "dim")
    candidates = bloom_prune(fact, dim, fact_key, dim_key, n_words)
    dim_keys = dim.select(F.col(dim_key).alias("_vkey")).distinct()
    return candidates.join(
        dim_keys, candidates[fact_key] == dim_keys["_vkey"], "left_semi"
    )


def bloom_prune(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_words: int = 1 << 12,
) -> DataFrame:
    """Phase 1 of bloom_semi_join alone: the map-side SBBF prune —
    fact rows whose key block passes the Bloom test (true matches plus
    the filter's false positives, no false negatives). Exposed so the
    bench can measure exactly how many rows survive the prune — i.e.
    the fact-side rows that would pay the verify join's shuffle."""
    blocks = bloom_build(dim, dim_key, n_words)
    probe = _bloom_parts(fact, fact_key).withColumn(
        "_bword",
        F.pmod(F.xxhash64(F.col(fact_key), F.lit(0xB10C)), F.lit(n_words)),
    )
    return (
        probe.join(F.broadcast(blocks), "_bword", "inner")
        .filter(F.col("_bloom").bitwiseAND(F.col("_bmask")) == F.col("_bmask"))
        .drop("_bword", "_bmask", "_bloom")
    )


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


def mg_k(threshold_frac: float) -> int:
    """Misra-Gries counter budget for a relative threshold φ: the
    pigeonhole guarantee needs k ≥ 1/φ; ×4 slack costs only summary
    size."""
    import math

    return max(64, int(math.ceil(4.0 / threshold_frac)))


def mg_update(counts: dict, items, k: int) -> dict:
    """Merge (key, cnt) pairs into a Misra-Gries summary capped at k
    counters — the mergeable-summaries rule (Agarwal et al. PODS'12):
    add, then subtract the (k+1)-th largest from everything and drop
    the non-positive. Shared by the batch candidates pass and the
    streaming twin so their summaries evolve identically."""
    import numpy as np

    for kk, vv in items:
        counts[kk] = counts.get(kk, 0) + int(vv)
    if len(counts) > k:
        vals = np.fromiter(counts.values(), dtype="int64")
        cut = int(
            np.partition(vals, len(vals) - (k + 1))[len(vals) - (k + 1)]
        )
        counts = {kk: vv - cut for kk, vv in counts.items() if vv > cut}
    return counts


def heavy_hitters(
    df: DataFrame,
    key: str,
    threshold_frac: float,
    k: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """EXACT frequency heavy hitters (keys with count ≥
    ceil(threshold_frac · N)) without ever shuffling the full key
    space — the 100 TB answer to "which tokens/users/ids dominate".

    Two passes, both bounded:
      1. CANDIDATES — one Misra-Gries summary per partition
         (mapInPandas; state capped at k counters no matter how many
         distinct keys stream past — a plain groupBy must hash or
         spill |vocab| per task). Batch-merged vectorized: each Arrow
         batch pre-aggregates with value_counts, merges into the
         running summary, and the summary contracts by subtracting
         the (k+1)-th largest count (mergeable-summaries rule —
         Agarwal et al., PODS'12). Pigeonhole guarantee: a key with
         global frequency ≥ φN has local frequency ≥ φ·n_p in some
         partition, and Misra-Gries with k ≥ 1/φ counters never
         evicts it; k defaults to ceil(4/φ) for slack. Only ≤ k
         candidate rows + 1 total-count row leave each partition.
      2. VERIFY — exact counts for the candidate set only: broadcast
         left-semi prune, then a groupBy whose shuffle carries just
         candidate-key rows. The output is therefore EXACT (the
         sketch only proposes; the threshold filter applies true
         counts), deterministic, and oracle-checkable with plain
         GROUP BY ... HAVING.

    The candidate summary (≤ k·P + P rows — bounded by CONSTRUCTION,
    not by data) is collected once; the driver holds the candidate
    key list and one scalar, then ships the keys back as the
    broadcast side."""
    import math

    import pandas as pd

    if not 0.0 < threshold_frac < 1.0:
        raise ValueError(f"threshold_frac: {threshold_frac!r}")
    if k is None:
        k = mg_k(threshold_frac)

    def mg(batches):
        counts: dict = {}
        n_seen = 0
        for pdf in batches:
            col = pdf[key].dropna()
            n_seen += len(col)
            counts = mg_update(counts, col.value_counts().items(), k)
        out = pd.DataFrame(
            {
                key: list(counts.keys()) + [None],
                "_n": [0] * len(counts) + [n_seen],
            }
        )
        yield out

    rows = (
        df.select(key)
        .mapInPandas(mg, f"{key} string, _n long")
        .collect()
    )
    total = sum(r["_n"] for r in rows)
    threshold = int(math.ceil(threshold_frac * total))
    cand_keys = sorted({r[key] for r in rows if r[key] is not None})
    if stats is not None:
        stats["total_rows"] = total
        stats["candidate_keys"] = len(cand_keys)
        stats["threshold"] = threshold
    spark = df.sparkSession
    candidates = spark.createDataFrame(
        [(c,) for c in cand_keys], f"{key} string"
    )
    return (
        df.join(F.broadcast(candidates), key, "left_semi")
        .groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold))
        .orderBy(F.desc("cnt"), F.asc(key))
    )


def bucketed_running_sum(
    df: DataFrame,
    part_col: str,
    hash_col: str,
    tiebreak_col: str,
    val_col: str,
    out_col: str,
) -> DataFrame:
    """Range-split running sum — `sum(val) OVER (PARTITION BY part
    ORDER BY hash, tiebreak ROWS UNBOUNDED PRECEDING)` for partitions
    too large to sort in one window task (the skewed-mega-source
    problem: a plain per-part window pins the whole part to one task).

    The first hex char of `hash_col` (any lexicographically-ordered
    hex string — md5 here; production picks prefix length by skew)
    splits each part into 16 ranges whose (bucket, hash) order IS the
    global hash order, so:

      pass 1: per-(part, bucket) totals — map-side combine;
      pass 2: running OFFSETS across buckets — a window over the
              ≤16-row-per-part aggregate, never `df` rows;
      pass 3: within-bucket running sums (windows partitioned by
              (part, bucket): max partition = |largest part|/16)
              + broadcast offset join.

    Returns `df` + `out_col`, bit-identical to the plain window
    (equality receipts: tests/test_properties.py's draw-split test
    and the same-oracle hash proof on mixture_draw_split)."""
    b = F.substring(hash_col, 1, 1)
    w_df = df.withColumn("_rsb", b)
    offsets = (
        w_df.groupBy(part_col, "_rsb")
        .agg(F.sum(val_col).alias("_bt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bt").over(
                    Window.partitionBy(part_col)
                    .orderBy("_rsb")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(part_col, "_rsb", "_off")
    )
    wnd = (
        Window.partitionBy(part_col, "_rsb")
        .orderBy(hash_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        w_df.withColumn("_c", F.sum(val_col).over(wnd))
        .join(F.broadcast(offsets), [part_col, "_rsb"])
        .withColumn(out_col, F.col("_c") + F.col("_off"))
        .drop("_rsb", "_c", "_off")
    )
