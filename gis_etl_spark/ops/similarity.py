"""Similarity-search operators [north-star]: brute-force cosine top-k,
exact near-pair detection, and LSH-bucketed approximate nearest
neighbors over `embeddings.embedding: array<float>` (SURVEY.md §2.11).

Exactness: Spark's sequential `aggregate` dot product is bit-identical
to DuckDB's `list_dot_product` (probed in round 1: max diff 0.0 across
5k vectors), so cosine values agree exactly; outputs still round to 6
decimals as belt-and-braces.

The ANN path is deliberately *relational* LSH: random-hyperplane
signatures (Charikar '02) whose plane weights derive from md5 hashes —
w(p, d) = (h60('p_d') mod 2001 − 1000)/1000 — so the identical plane
matrix is constructible in ANSI SQL and the whole ANN pipeline
(signature → band bucket → candidate → exact rerank) is oracle-checked,
not just rows-counted.

Scale notes (100 TB):
- top-k broadcasts the query set and never shuffles the corpus: map-side
  cosine + per-partition top-k via window over a rank-pruned frame;
- the exact near-pair query is quadratic and therefore gated to a
  corpus slice — the ANN variant is the scale path (buckets bound the
  join fan-out);
- at real scale the signature build is one pass and buckets become the
  bucketing key of a sorted table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_etl_spark.io import read_table
from gis_etl_spark.ops.text import EMB_DEDUP_T, h60_sql

TOPK = 5
N_QUERIES = 8          # query set = vec_id < 8
NEAR_T = 0.4           # near-pair cosine threshold
PAIR_SLICE = 1000      # exact near-pair gate: vec_id < 1000
# ANN config: 32 planes, 8 bands × 4 bits — swept empirically: this
# corpus's true neighbors sit at cosine ≈ 0.5 (per-plane agreement
# ~0.63), a hard LSH regime; this config measures recall 0.80 at ~39%
# candidate rate (finer bands collapse recall, coarser ones degenerate
# to brute force). Used by similarity_ann_lsh (8 query vectors — the
# candidate volume is bounded by the broadcast query side, so the
# coarse/cheap config is fine there).
N_PLANES = 32
N_SIG_BANDS = 8
BAND_BITS = N_PLANES // N_SIG_BANDS


def emb_lsh_config(
    threshold: float, target_recall: float = 0.6, bits: int | None = None
) -> tuple[int, int]:
    """Derive (band_bits, n_bands) for hyperplane LSH from the dedup
    cosine threshold via the published collision model (Charikar '02,
    STOC: P[plane agrees] = 1 − arccos(cos θ)/π).

    Pair recall for b-bit bands OR'd over B bands is 1 − (1 − p^b)^B,
    evaluated at the *threshold* (the hardest pair we must still find);
    B is the smallest band count reaching target_recall. Wider bands
    (larger b) cut the random-pair collision rate ~2^-b per band, so b
    is chosen as wide as the threshold affords: production-grade
    near-dup thresholds (≥ 0.6, where true dups sit at cosine ≈ 0.9+)
    get 16-bit bands — random collision ~B/65536 per pair, so candidate
    volume stays near-linear in corpus size; low thresholds are a
    fundamentally hard LSH regime (ρ = ln p1/ln p2 → 1) and get 8-bit
    bands — still quadratic in the worst case, which is why the bucket
    cap below exists.
    """
    import math

    if bits is None:
        bits = 16 if threshold >= 0.6 else 8
    p = 1.0 - math.acos(threshold) / math.pi
    bands = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p**bits))
    return bits, bands


# Embedding-dedup config, derived from the shared threshold (the exact
# band count comes out of emb_lsh_config — 8-bit bands at this 0.35
# threshold). Measured at sf0.1 (n=2000, true pairs at cosine
# 0.35-0.45): recall 0.61 vs the exact baseline at a 16.5% candidate
# rate — vs round 2's 4-bit bands at 40.8% (effectively brute force).
EMB_LSH_BITS, EMB_LSH_BANDS = emb_lsh_config(EMB_DEDUP_T)
EMB_LSH_PLANES = EMB_LSH_BITS * EMB_LSH_BANDS
# Standard LSH skew guard: buckets larger than this are dropped from
# pair generation (and counted by dedup_embedding_lsh_audit). Expected
# bucket size is corpus/2^bits per band; 128 is ~16× that at the bench
# corpus and only trims pathological skew (e.g. the all-zeros vector
# bucket). At 100 TB this bound is what keeps Σ|bucket|² finite.
EMB_LSH_BUCKET_CAP = 128


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cos_arrow(va: Column, vb: Column) -> Column:
    """Cosine similarity as ONE vectorized Arrow pass, bit-identical to
    the HOF rendition `_dot(a,b)/(_norm(a)*_norm(b))` and to DuckDB's
    list_dot_product: the accumulation loops over DIMENSIONS in order
    (acc = acc + a_k*b_k — the exact operation sequence of
    aggregate(zip_with)) while numpy vectorizes across ROWS. Use on
    large candidate streams where the CodegenFallback HOF chain's
    ~30 µs/pair dominates (measured 9× on the sf0.1 dedup bench); the
    Column rendition stays for small query sets and SQL parity."""

    @F.pandas_udf("double")
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="f8")
        A = np.array(a.tolist(), dtype="f8")
        B = np.array(b.tolist(), dtype="f8")
        n, d = A.shape
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for k in range(d):
            dot = dot + A[:, k] * B[:, k]
            na = na + A[:, k] * A[:, k]
            nb = nb + B[:, k] * B[:, k]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    # pure function; the marker only stops the optimizer duplicating
    # the ArrowEvalPython below a pushed `cos >= T` filter (guide §4.4
    # — see _cos_by_id_arrow)
    return _udf.asNondeterministic()(va, vb)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


# Per-query top-k pre-pass fan: the salted first level bounds any one
# reducer's sort to ~|candidates|/SALT rows, the final level sorts at
# most k·SALT rows per query.
SHORTLIST_SALT = 32


def _per_query_topk(
    df: DataFrame, k: int, order_cols: list[Column], salt_on: str,
    rank_name: str = "rk",
) -> DataFrame:
    """Top-k rows per query_id under a TOTAL order, with the sorted
    volume bounded at any corpus size.

    A bare Window.partitionBy("query_id") sends every candidate row of
    a query through ONE reducer — |queries| reducers each sorting the
    whole corpus for the flat-ADC scans. This two-level rendition first
    takes top-k within (query_id, salt = pmod(hash-ish id, SALT)) so
    each sort sees ~1/SALT of the candidates, then runs the final
    window over at most k·SALT surviving rows per query. Because the
    order is total and the per-salt groups partition the candidates,
    the union of per-salt top-k is a superset of the global top-k —
    the output is row-identical to the single-window form (pinned by
    the oracle hash, whose SQL keeps the one-window shape).

    `order_cols` must be a total order (ties broken on a unique id);
    `salt_on` is a column whose values spread uniformly (vec_id)."""
    w1 = Window.partitionBy("query_id", "_salt").orderBy(*order_cols)
    pre = (
        df.withColumn("_salt", F.pmod(F.col(salt_on), F.lit(SHORTLIST_SALT)))
        .withColumn("_prk", F.row_number().over(w1))
        .filter(F.col("_prk") <= k)
        .drop("_salt", "_prk")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order_cols)
    return (
        pre.withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
    )


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors, one
    map-side pass over the corpus, window top-k. The baseline every ANN
    variant is measured against."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("v"), F.col("qv"))
             / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("cos"),
        )
    )
    return (
        _per_query_topk(
            scored, TOPK, [F.desc("cos"), F.asc("neighbor_id")],
            "neighbor_id", rank_name="rank",
        )
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cos", 6).alias("sim"),
        )
        .orderBy("query_id", "rank")
    )


# Hard-negative mining band: candidates with rounded cosine in
# [HARDNEG_LO, HARDNEG_HI) — similar enough to be informative
# negatives for contrastive training, strictly below the near-dup
# regime (true neighbors on this corpus sit at cosine ≈ 0.5, random
# pairs concentrate near 0 in 64-dim).
HARDNEG_LO = 0.2
HARDNEG_HI = 0.45
HARDNEG_K = 10


def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training — per
    query, the top-{HARDNEG_K} most-similar corpus vectors whose
    ROUNDED cosine lies in [{HARDNEG_LO}, {HARDNEG_HI}): the
    'closest non-positives' that make informative negatives, with the
    positive band (near-dups and true neighbors) excluded by the upper
    bound. Both the band filter and the ranking use the round(cos, 6)
    value so the boundary and tie behavior are engine-exact against
    the oracle (the minhash_pairs_sql rounding discipline).

    Scale: identical posture to similarity_topk — queries broadcast,
    one map-side cosine pass over the corpus, no corpus shuffle; the
    band filter prunes before ranking and the salted two-level top-k
    bounds every reducer's sort. Mining against a 100 TB corpus for a
    large query set loops over broadcast-sized query buckets."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (_norm(F.col("v")) * _norm(F.col("qv"))),
                6,
            ).alias("sim"),
        )
        .filter(
            (F.col("sim") >= HARDNEG_LO) & (F.col("sim") < HARDNEG_HI)
        )
    )
    return (
        _per_query_topk(
            scored, HARDNEG_K, [F.desc("sim"), F.asc("neighbor_id")],
            "neighbor_id", rank_name="rank",
        )
        .select("query_id", "neighbor_id", "rank", "sim")
        .orderBy("query_id", "rank")
    )


def similarity_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs (cosine ≥ 0.4) on a bounded slice —
    the quadratic check ANN approximates. Gated to vec_id < 1000: at
    scale this plan is intentionally disallowed; use the LSH variant."""
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < PAIR_SLICE)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (_dot(F.col("va"), F.col("vb"))
             / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cos"),
        )
        .filter(F.col("cos") >= NEAR_T)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("sim"))
        .orderBy("vec_a", "vec_b")
    )


def _planes(spark: SparkSession) -> DataFrame:
    """The md5-derived hyperplane matrix as a tiny DataFrame:
    (plane p, dim d) → weight in [-1, 1]. Broadcastable; identical
    construction exists in the oracle SQL."""
    rows = spark.range(N_PLANES).select(F.col("id").alias("p"))
    dims = spark.range(64).select(F.col("id").alias("d"))
    h = F.conv(
        F.substring(F.md5(F.concat_ws("_", "p", "d")), 1, 15), 16, 10
    ).cast("long")
    return rows.crossJoin(dims).select(
        "p", "d", ((h % 2001 - 1000) / 1000.0).alias("w")
    )


def _plane_matrix(n_planes: int = N_PLANES) -> np.ndarray:
    """The md5-derived hyperplane weights as a (n_planes, 64) array —
    numerically identical to _planes() and the oracle SQL: w(p, d) =
    (int(md5(f'{p}_{d}')[:15 hex], 16) % 2001 - 1000) / 1000."""
    import hashlib

    W = np.empty((n_planes, 64))
    for p in range(n_planes):
        for d in range(64):
            h = int(
                hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16
            )
            W[p, d] = (h % 2001 - 1000) / 1000.0
    return W


def _signatures_arrow(emb: DataFrame) -> DataFrame:
    """vec_id → signature in ONE Arrow pass: per-plane signed sums
    accumulated over dimensions IN ORDER (the scan order both the
    posexplode/groupBy rendition and the oracle's unnest/GROUP BY
    accumulate in), sign bits packed. Replaces a shuffle of
    O(vectors × dims × planes) exploded rows with a map-side kernel —
    at 1M docs the relational build would shuffle 2B rows; this ships
    none."""
    W = _plane_matrix()

    @F.pandas_udf("long")
    def _udf(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        X = np.array(v.tolist(), dtype="f8")
        n, d = X.shape
        sig = np.zeros(n, dtype=np.int64)
        for p in range(N_PLANES):
            dp = np.zeros(n)
            for k in range(d):
                dp = dp + X[:, k] * W[p, k]
            sig += (dp > 0).astype(np.int64) << p
        return pd.Series(sig)

    return emb.select("vec_id", _udf(F.col("v")).alias("sig"))


def _band_values_arrow(emb: DataFrame, bits: int, bands: int) -> DataFrame:
    """vec_id → (band_idx, band_val) rows for bits×bands hyperplane LSH
    in ONE Arrow pass. Unlike _signatures_arrow's packed 64-bit long,
    band values are emitted directly (bits×bands planes can exceed 64),
    so the band count is unbounded.

    Parity contract with the oracle SQL: per (vector, plane) the dot
    product accumulates over dimensions IN ORDER on the Spark side (the
    k-outer loop adds x_k·w_pk to every plane per step — the same
    per-element IEEE operation sequence as a p-outer/k-inner loop). The
    oracle's unnest/GROUP BY sum carries NO ordering guarantee (a hash
    aggregate may reorder, especially multithreaded), so what bucket
    parity actually rests on is sign(dot) being insensitive to
    summation order; a dot product within float rounding of zero is the
    residual (never observed) cross-engine flake risk."""
    W = _plane_matrix(bits * bands)
    shifts = 1 << np.arange(bits, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _udf(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        X = np.array(v.tolist(), dtype="f8")
        n, d = X.shape
        dp = np.zeros((n, W.shape[0]))
        for k in range(d):
            dp += X[:, k : k + 1] * W[:, k]
        bitsm = dp > 0
        vals = np.empty((n, bands), dtype=np.int64)
        for b in range(bands):
            vals[:, b] = bitsm[:, b * bits : (b + 1) * bits] @ shifts
        return pd.Series(list(vals))

    return emb.select(
        "vec_id", F.posexplode(_udf(F.col("v"))).alias("band_idx", "band_val")
    )


def _bucket_pairs(bands_df: DataFrame, cap: int) -> DataFrame:
    """Candidate pairs from band buckets with the size cap applied —
    the standard LSH skew guard: a degenerate bucket (e.g. all-zero
    vectors) would otherwise contribute |bucket|² candidate pairs.

    ONE exchange, no self-join: group each bucket to a member list,
    drop oversized lists (`size(vs) > cap` — the cap also bounds the
    per-row memory of the list), then expand pairs JVM-side with two
    nested explodes. A self-join rendition evaluates the signature UDF
    once per join branch (measured: 2 of the 4 ArrowEvalPython nodes in
    the round-2 plan) and shuffles the band rows twice."""
    lists = (
        bands_df.groupBy("band_idx", "band_val")
        .agg(F.collect_list("vec_id").alias("vs"))
        .filter(F.size("vs") <= cap)
    )
    # r18 (guide §2.2): the bucket-list aggregate is tiny (~10k lists,
    # a few MB), so AQE coalesces its post-shuffle output to ONE
    # partition — and everything pipelined on top of it (the two-level
    # pair explode AND the caller's exact-cosine verify over every
    # candidate) then ran as a single task on one core (measured: all
    # 429,951 sf0.1 candidates in 1 partition; the verify was the
    # query's dominant stage). Re-spread the lists across the cluster
    # before the fan-out: the exchange moves only the capped member
    # lists, and defaultParallelism keeps the width scale-adaptive
    # instead of a local constant. Explicit repartition is exempt from
    # AQE coalescing, so the width survives.
    par = bands_df.sparkSession.sparkContext.defaultParallelism
    lists = lists.repartition(par)
    # NO distinct here: a pair colliding in k bands appears k times, but
    # the exact verify is deterministic per pair, so callers dedup AFTER
    # the cosine filter — distinct on the few surviving rows instead of
    # an extra full-width shuffle of every candidate.
    return (
        lists.select(F.explode("vs").alias("doc_a"), "vs")
        .select("doc_a", F.explode("vs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def _signatures(emb: DataFrame, planes: DataFrame) -> DataFrame:
    """vec_id → 16-bit hyperplane signature, fully relational:
    posexplode the vector, join the plane matrix on dim, per-plane
    signed sums, pack sign bits."""
    comp = emb.select(
        "vec_id", F.posexplode(F.col("v")).alias("d", "x")
    )
    dots = (
        comp.join(F.broadcast(planes), "d")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dp"))
    )
    # F.shiftleft needs a literal shift — use exact 2^p multiplication
    # (p ≤ 16, well inside double's exact-integer range)
    bit = F.when(F.col("dp") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
    return (
        dots.withColumn(
            "bit", bit * F.pow(F.lit(2.0), F.col("p")).cast("long")
        )
        .groupBy("vec_id")
        .agg(F.sum("bit").alias("sig"))
    )


def _band_buckets(sig: DataFrame) -> DataFrame:
    """Signature → (vec_id, band_idx, band_val) bucket rows."""
    return sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("sig"), b * BAND_BITS)
                        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for b in range(N_SIG_BANDS)
                ]
            )
        ).alias("band"),
    ).select("vec_id", "band.band_idx", "band.band_val")


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: hyperplane signature → 8-bit band buckets →
    candidates sharing any band with a query → exact cosine rerank →
    top-k. Recall < 1 by construction; the oracle runs the identical
    pipeline so results still hash-match."""
    emb = _emb(spark, sf_dir)
    sig = _signatures_arrow(emb)
    bands = _band_buckets(sig)
    qbands = bands.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band_idx", "band_val"
    )
    cands = (
        bands.join(F.broadcast(qbands), ["band_idx", "band_val"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        cands.join(emb.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("v"), F.col("qv"))
             / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("cos"),
        )
    )
    return (
        _per_query_topk(
            scored, TOPK, [F.desc("cos"), F.asc("neighbor_id")],
            "neighbor_id", rank_name="rank",
        )
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cos", 6).alias("sim"),
        )
        .orderBy("query_id", "rank")
    )


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, PRODUCTION path: banded hyperplane-LSH
    self-join instead of the all-pairs cross join of
    ops.text.dedup_embedding_pairs (the gated verification baseline).

    Plan shape: signature build is one pass over embeddings
    (O(n·planes)); the pair-candidate step is an EQUI-join of band
    buckets with itself (doc_a < doc_b, distinct), so the fan-out is
    Σ_buckets |bucket|² — the banded-LSH bound shared with
    dedup_minhash_pairs — and the exact cosine verify runs on candidates
    only. No CartesianProduct anywhere (pinned by test_plan_hygiene).

    Config: emb_lsh_config(EMB_DEDUP_T) → 8-bit bands × 46 from 368
    planes (the Charikar math in its docstring; this corpus's injected
    near-dups sit at cosine ≈ 0.35-0.45, a hard LSH regime — production
    thresholds ≥ 0.6 derive 16-bit bands whose random collision rate
    is ~bands/65536 per pair). Oversized buckets are dropped via
    EMB_LSH_BUCKET_CAP (audited by dedup_embedding_lsh_audit), bounding
    the candidate volume at any corpus size. Recall vs the exact
    baseline is pinned in tests/test_northstar.py; measured 0.66 at
    sf0.1 with an 18.6% candidate rate (round 2's 4-bit bands: 40.8%,
    effectively brute force)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = _emb(spark, sf_dir)
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        F.col("doc_id").alias("vec_id"), "lang", "v"
    )
    pair_cands = _bucket_pairs(
        _band_values_arrow(joined, EMB_LSH_BITS, EMB_LSH_BANDS),
        EMB_LSH_BUCKET_CAP,
    )
    scored = _verify_pairs_exact(pair_cands, joined, sf_dir)
    lang = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a")
    )
    return (
        scored
        .filter(F.col("cos") >= EMB_DEDUP_T)
        # distinct here, on the surviving rows only (see _bucket_pairs)
        .distinct()
        .join(F.broadcast(lang), "doc_a")
        .select("doc_a", "doc_b", "lang_a", F.round("cos", 6).alias("sim"))
        .orderBy("doc_a", "doc_b")
    )


# Ceiling (rows) for the driver-side corpus materialization in the LSH
# verify stage. Expected driver footprint at the cap: 1M × 64 doubles
# ≈ 512 MB plus pandas overhead — the same order as a broadcast dim
# table. Above it the verify falls back to the shuffle-based vector
# join, which never touches the driver. Tests monkeypatch this to force
# the fallback at tiny corpora.
EMB_CORPUS_DRIVER_CAP = 1_000_000


def _verify_pairs_exact(
    pair_cands: DataFrame, joined: DataFrame, sf_dir: str
) -> DataFrame:
    """Exact-cosine verification of LSH candidate pairs, with a scale
    gate choosing between two physically different but numerically
    IDENTICAL plans (both kernels accumulate over dimensions in order —
    the parity contract shared with the oracle SQL):

    - corpus ≤ EMB_CORPUS_DRIVER_CAP rows (counted first): verify by ID
      LOOKUP — ship only (doc_a, doc_b) id pairs to the Arrow kernel
      (16 B/pair) and gather both vectors from a closure-captured corpus
      matrix. Joining the arrays onto every candidate row instead moved
      ~1 KB/pair through the exchange and dominated the bench (measured
      2.9 s of 6.5 s at sf0.1). The matrix ships to each executor once,
      like a broadcast dim table.
    - above the cap (the 100 TB regime): candidate ⋈ vectors join on
      each side of the pair (`_cos_arrow` on the joined arrays). Twice
      the exchange volume per candidate, but nothing ever materializes
      on the driver; the join keys are ids, so AQE can pick
      broadcast/sort-merge per side as the corpus dictates.

    Returns pair_cands plus a `cos` column.

    Side effect (documented contract): building the plan runs one Spark
    COUNT job to pick the path, and — below the cap — the toPandas()
    collect at first use; other registry builders are side-effect-free.
    """
    if _corpus_rows(joined, sf_dir) <= EMB_CORPUS_DRIVER_CAP:
        cos_pair = _cos_by_id_arrow(*_corpus_matrix(joined, sf_dir))
        return pair_cands.withColumn(
            "cos", cos_pair(F.col("doc_a"), F.col("doc_b"))
        )
    va = joined.select(F.col("vec_id").alias("doc_a"), F.col("v").alias("va"))
    vb = joined.select(F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"))
    return (
        pair_cands.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("cos", _cos_arrow(F.col("va"), F.col("vb")))
        .drop("va", "vb")
    )


# corpus-matrix / row-count cache for the verify stage, keyed by
# (sf_dir, dataset fingerprint): the collect is deterministic for a
# given dataset *state*, and the gate/bench call each builder
# repeatedly. The fingerprint (mtime_ns + size of embeddings.parquet)
# invalidates the entry if the dataset is regenerated at the same path
# within one process (ADVICE r3).
_CORPUS_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
_CORPUS_ROWS_CACHE: dict[tuple, int] = {}


def _corpus_key(sf_dir: str) -> tuple:
    import os

    try:
        st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
        return (sf_dir, st.st_mtime_ns, st.st_size)
    except OSError:
        return (sf_dir,)


def _corpus_rows(joined: DataFrame, sf_dir: str) -> int:
    key = _corpus_key(sf_dir)
    if key not in _CORPUS_ROWS_CACHE:
        _CORPUS_ROWS_CACHE[key] = joined.count()
    return _CORPUS_ROWS_CACHE[key]


def _corpus_matrix(
    joined: DataFrame, sf_dir: str
) -> tuple[np.ndarray, np.ndarray]:
    key = _corpus_key(sf_dir)
    if key not in _CORPUS_CACHE:
        pdf = joined.select("vec_id", "v").toPandas().sort_values("vec_id")
        _CORPUS_CACHE[key] = (
            pdf["vec_id"].to_numpy(dtype=np.int64),
            np.array(pdf["v"].tolist(), dtype="f8"),
        )
    return _CORPUS_CACHE[key]


def _cos_by_id_arrow(ids: np.ndarray, V: np.ndarray):
    """Pairwise-cosine Arrow kernel over id pairs, gathering vectors
    from the captured (sorted-id, matrix) corpus. Accumulates over
    dimensions IN ORDER — bit-identical to _cos_arrow and DuckDB's
    list_dot_product (the parity contract of the oracle-checked
    queries that use it)."""

    @F.pandas_udf("double")
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="f8")
        A = V[np.searchsorted(ids, a.to_numpy())]
        B = V[np.searchsorted(ids, b.to_numpy())]
        n, d = A.shape
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for k in range(d):
            dot = dot + A[:, k] * B[:, k]
            na = na + A[:, k] * A[:, k]
            nb = nb + B[:, k] * B[:, k]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    # asNondeterministic (r18, guide §4.4): the verify filter
    # `cos >= T` references this UDF's output column, and the
    # optimizer's filter pushdown then evaluates the UDF TWICE — once
    # below the pushed filter and once in the surviving projection
    # (two ArrowEvalPython nodes for one call in the r17 plan,
    # plans/r18/dedup_embedding_lsh_before.txt nodes 20/23). The
    # function is pure, the marker only stops the optimizer from
    # duplicating it; every candidate pair now pays ONE cosine.
    return _udf.asNondeterministic()


def dedup_embedding_lsh_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-guard audit for dedup_embedding_lsh: per-band bucket stats
    and how much the EMB_LSH_BUCKET_CAP drop discarded. At 100 TB the
    dropped-rows column is the operator's honesty metric — a cap that
    silently ate a hot bucket would otherwise read as 'no duplicates
    there'. One groupBy over the band rows; no joins."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = _emb(spark, sf_dir)
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        F.col("doc_id").alias("vec_id"), "lang", "v"
    )
    bands = _band_values_arrow(joined, EMB_LSH_BITS, EMB_LSH_BANDS)
    sizes = bands.groupBy("band_idx", "band_val").agg(
        F.count("*").alias("bsize")
    )
    over = F.col("bsize") > EMB_LSH_BUCKET_CAP
    return (
        sizes.groupBy("band_idx")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("bsize").alias("max_bucket"),
            F.sum(F.when(over, 1).otherwise(0)).alias("n_dropped_buckets"),
            F.sum(F.when(over, F.col("bsize")).otherwise(0)).alias(
                "n_dropped_rows"
            ),
        )
        .orderBy("band_idx")
    )


N_PROBE = 2


def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN, fully relational: coarse quantizer = per-label
    mean vectors (the codebook `embedding_label_centroids` computes);
    every vector is ASSIGNED to its nearest centroid (not its label —
    assignment is computed, as a trained IVF would); queries probe
    their nprobe=2 nearest centroids; candidates are the vectors
    assigned to probed lists; exact cosine rerank → top-k.

    The complement to the hyperplane-LSH variant: LSH buckets are
    data-independent, IVF lists follow the data distribution. At 100 TB
    the assignment becomes the partition/bucket key of the stored
    corpus so a probe reads only its lists.
    """
    emb = _emb(spark, sf_dir)
    comp = emb.select("vec_id", "label", F.posexplode("v").alias("d", "x"))
    cents = (
        comp.groupBy(F.col("label").alias("c_id"), "d")
        .agg(F.avg("x").alias("cx"))
    )
    # cosine(vec, centroid) for every pair via component join
    sims = (
        comp.join(F.broadcast(cents), "d")
        .groupBy("vec_id", "c_id")
        .agg(F.sum(F.col("x") * F.col("cx")).alias("dot"))
    )
    norms_v = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv")
    )
    norms_c = cents.groupBy("c_id").agg(
        F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("nc")
    )
    cos_vc = (
        sims.join(norms_v, "vec_id")
        .join(F.broadcast(norms_c), "c_id")
        .select(
            "vec_id", "c_id",
            (F.col("dot") / (F.col("nv") * F.col("nc"))).alias("cos"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("c_id")
    )
    ranked = cos_vc.withColumn("rk", F.row_number().over(w_assign))
    assignment = ranked.filter(F.col("rk") == 1).select(
        "vec_id", F.col("c_id").alias("list_id")
    )
    probes = (
        ranked.filter(
            (F.col("rk") <= N_PROBE) & (F.col("vec_id") < N_QUERIES)
        )
        .select(F.col("vec_id").alias("query_id"), F.col("c_id").alias("list_id"))
    )
    cands = (
        assignment.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        cands.join(emb.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("v"), F.col("qv"))
             / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("cos"),
        )
    )
    return (
        _per_query_topk(
            scored, TOPK, [F.desc("cos"), F.asc("neighbor_id")],
            "neighbor_id", rank_name="rank",
        )
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cos", 6).alias("sim"),
        )
        .orderBy("query_id", "rank")
    )


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components — the vector aggregation shape IVF
    training needs (explode → (label, dim) mean)."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", F.posexplode("v").alias("d", "x"))
        .groupBy("label", "d")
        .agg(F.round(F.avg("x"), 6).alias("mean_x"))
        .orderBy("label", "d")
    )


def oracle_sqls() -> dict[str, str]:
    cos = (
        "list_dot_product(a.v, q.qv) / "
        "(sqrt(list_dot_product(a.v, a.v)) * "
        "sqrt(list_dot_product(q.qv, q.qv)))"
    )
    pair_cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * "
        "sqrt(list_dot_product(b.v, b.v)))"
    )
    hw = h60_sql("p.p::VARCHAR || '_' || d.d::VARCHAR")
    # Shared CTE chain for the embedding-dedup LSH twins: md5-derived
    # plane weights → ordered per-plane dots → per-band packed sign
    # bits (planes grouped p // bits; band_val cast ::BIGINT — the
    # shifted sum is HUGEINT, which pandas would render float64) →
    # bucket sizes. `kept` applies the EMB_LSH_BUCKET_CAP skew guard.
    _EMB_LSH_BAND_CTES = f"""
            planes AS (
              SELECT p.p, d.d, (({hw}) % 2001 - 1000) / 1000.0 AS w
              FROM range({EMB_LSH_PLANES}) p(p), range(64) d(d)
            ),
            comp AS (
              SELECT vec_id, d - 1 AS d, x
              FROM (SELECT vec_id, unnest(v) AS x,
                           generate_subscripts(v, 1) AS d FROM e)
            ),
            dots AS (
              SELECT c.vec_id, pl.p, sum(c.x * pl.w) AS dp
              FROM comp c JOIN planes pl ON pl.d = c.d
              GROUP BY c.vec_id, pl.p
            ),
            bands AS (
              SELECT vec_id, p // {EMB_LSH_BITS} AS band_idx,
                     (sum(CASE WHEN dp > 0 THEN 1::BIGINT ELSE 0 END
                          << (p % {EMB_LSH_BITS})))::BIGINT AS band_val
              FROM dots GROUP BY vec_id, p // {EMB_LSH_BITS}
            ),
            bsizes AS (
              SELECT band_idx, band_val, count(*) AS bsize
              FROM bands GROUP BY band_idx, band_val
            )
    """
    _EMB_LSH_KEPT_CTES = _EMB_LSH_BAND_CTES + f""",
            kept AS (
              SELECT b.band_idx, b.band_val, b.vec_id
              FROM bands b JOIN bsizes s USING (band_idx, band_val)
              WHERE s.bsize <= {EMB_LSH_BUCKET_CAP}
            )
    """
    return {
        "similarity_topk": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
                  WHERE vec_id < {N_QUERIES}),
            scored AS (
              SELECT q.query_id, a.vec_id AS neighbor_id, {cos} AS cos
              FROM e a, q WHERE a.vec_id <> q.query_id
            ), ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id)
                       AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS sim
            FROM ranked WHERE rank <= {TOPK}
            ORDER BY query_id, rank
        """,
        # band filter AND ranking on round(cos, 6), matching the engine
        # column exactly (boundary + tie parity)
        "similarity_hard_negatives": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
                  WHERE vec_id < {N_QUERIES}),
            scored AS (
              SELECT q.query_id, a.vec_id AS neighbor_id,
                     round({cos}, 6) AS sim
              FROM e a, q WHERE a.vec_id <> q.query_id
            ), banded AS (
              SELECT * FROM scored
              WHERE sim >= {HARDNEG_LO} AND sim < {HARDNEG_HI}
            ), ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id)
                       AS rank
              FROM banded
            )
            SELECT query_id, neighbor_id, rank, sim
            FROM ranked WHERE rank <= {HARDNEG_K}
            ORDER BY query_id, rank
        """,
        "similarity_near_pairs": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings WHERE vec_id < {PAIR_SLICE})
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round({pair_cos}, 6) AS sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE {pair_cos} >= {NEAR_T}
            ORDER BY vec_a, vec_b
        """,
        "similarity_ann_lsh": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            planes AS (
              SELECT p.p, d.d, (({hw}) % 2001 - 1000) / 1000.0 AS w
              FROM range({N_PLANES}) p(p), range(64) d(d)
            ),
            comp AS (
              SELECT vec_id, d - 1 AS d, x
              FROM (SELECT vec_id, unnest(v) AS x,
                           generate_subscripts(v, 1) AS d FROM e)
            ),
            dots AS (
              SELECT c.vec_id, pl.p, sum(c.x * pl.w) AS dp
              FROM comp c JOIN planes pl ON pl.d = c.d
              GROUP BY c.vec_id, pl.p
            ),
            sig AS (
              SELECT vec_id,
                     sum(CASE WHEN dp > 0 THEN 1::BIGINT ELSE 0 END << p)
                       AS sig
              FROM dots GROUP BY vec_id
            ),
            bands AS (
              SELECT vec_id, b.b AS band_idx,
                     (sig >> (b.b * {BAND_BITS})) & {(1 << BAND_BITS) - 1}
                       AS band_val
              FROM sig, range({N_SIG_BANDS}) b(b)
            ),
            qb AS (SELECT vec_id AS query_id, band_idx, band_val
                   FROM bands WHERE vec_id < {N_QUERIES}),
            cands AS (
              SELECT DISTINCT qb.query_id, bands.vec_id
              FROM bands JOIN qb USING (band_idx, band_val)
              WHERE bands.vec_id <> qb.query_id
            ),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
                  WHERE vec_id < {N_QUERIES}),
            scored AS (
              SELECT c.query_id, a.vec_id AS neighbor_id, {cos} AS cos
              FROM cands c
              JOIN e a ON a.vec_id = c.vec_id
              JOIN q ON q.query_id = c.query_id
            ), ranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id)
                       AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS sim
            FROM ranked WHERE rank <= {TOPK}
            ORDER BY query_id, rank
        """,
        "dedup_embedding_lsh": f"""
            WITH e AS (
              SELECT d.doc_id AS vec_id, d.lang, em.embedding::DOUBLE[] AS v
              FROM documents d JOIN embeddings em ON d.doc_id = em.vec_id
            ),
            {_EMB_LSH_KEPT_CTES},
            cands AS (
              SELECT DISTINCT ba.vec_id AS doc_a, bb.vec_id AS doc_b
              FROM kept ba JOIN kept bb
                USING (band_idx, band_val)
              WHERE ba.vec_id < bb.vec_id
            ),
            verified AS (
              SELECT c.doc_a, c.doc_b, ea.lang AS lang_a,
                     list_dot_product(ea.v, eb.v) /
                     (sqrt(list_dot_product(ea.v, ea.v)) *
                      sqrt(list_dot_product(eb.v, eb.v))) AS cos
              FROM cands c
              JOIN e ea ON ea.vec_id = c.doc_a
              JOIN e eb ON eb.vec_id = c.doc_b
            )
            SELECT doc_a, doc_b, lang_a, round(cos, 6) AS sim
            FROM verified WHERE cos >= {EMB_DEDUP_T}
            ORDER BY doc_a, doc_b
        """,
        "dedup_embedding_lsh_audit": f"""
            WITH e AS (
              SELECT d.doc_id AS vec_id, d.lang, em.embedding::DOUBLE[] AS v
              FROM documents d JOIN embeddings em ON d.doc_id = em.vec_id
            ),
            {_EMB_LSH_BAND_CTES}
            SELECT band_idx,
                   count(*)::BIGINT AS n_buckets,
                   max(bsize)::BIGINT AS max_bucket,
                   sum(CASE WHEN bsize > {EMB_LSH_BUCKET_CAP}
                       THEN 1 ELSE 0 END)::BIGINT AS n_dropped_buckets,
                   sum(CASE WHEN bsize > {EMB_LSH_BUCKET_CAP}
                       THEN bsize ELSE 0 END)::BIGINT AS n_dropped_rows
            FROM bsizes GROUP BY band_idx ORDER BY band_idx
        """,
        "embedding_label_centroids": """
            SELECT label, d - 1 AS d, round(avg(x), 6) AS mean_x
            FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
                         generate_subscripts(embedding, 1) AS d
                  FROM embeddings)
            GROUP BY label, d ORDER BY label, d
        """,
        "similarity_ivf": f"""
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            comp AS (
              SELECT vec_id, label, d - 1 AS d, x
              FROM (SELECT vec_id, label, unnest(v) AS x,
                           generate_subscripts(v, 1) AS d FROM e)
            ),
            cents AS (
              SELECT label AS c_id, d, avg(x) AS cx
              FROM comp GROUP BY label, d
            ),
            sims AS (
              SELECT c.vec_id, ct.c_id, sum(c.x * ct.cx) AS dot
              FROM comp c JOIN cents ct USING (d)
              GROUP BY c.vec_id, ct.c_id
            ),
            nv AS (SELECT vec_id, sqrt(sum(x * x)) AS nv
                   FROM comp GROUP BY vec_id),
            nc AS (SELECT c_id, sqrt(sum(cx * cx)) AS nc
                   FROM cents GROUP BY c_id),
            cos_vc AS (
              SELECT s.vec_id, s.c_id, s.dot / (nv.nv * nc.nc) AS cos
              FROM sims s JOIN nv USING (vec_id) JOIN nc USING (c_id)
            ),
            ranked AS (
              SELECT vec_id, c_id,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, c_id) AS rk
              FROM cos_vc
            ),
            assignment AS (
              SELECT vec_id, c_id AS list_id FROM ranked WHERE rk = 1
            ),
            probes AS (
              SELECT vec_id AS query_id, c_id AS list_id
              FROM ranked
              WHERE rk <= {N_PROBE} AND vec_id < {N_QUERIES}
            ),
            cands AS (
              SELECT DISTINCT p.query_id, a.vec_id
              FROM assignment a JOIN probes p USING (list_id)
              WHERE a.vec_id <> p.query_id
            ),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
                  WHERE vec_id < {N_QUERIES}),
            scored AS (
              SELECT c.query_id, a.vec_id AS neighbor_id, {cos} AS cos
              FROM cands c
              JOIN e a ON a.vec_id = c.vec_id
              JOIN q ON q.query_id = c.query_id
            ), rranked AS (
              SELECT query_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id)
                       AS rank
              FROM scored
            )
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS sim
            FROM rranked WHERE rank <= {TOPK}
            ORDER BY query_id, rank
        """,
    }


# --- trained-codebook IVF (distributed Lloyd iterations) --------------------

K_KMEANS = 8
KMEANS_ITERS = 3
KMEANS_DP = 6  # centroid components rounded per iteration (see below)
_KMEANS_CACHE: dict[tuple, list[list[float]]] = {}


def kmeans_reference(
    vecs: dict[int, list[float]],
    k: int = K_KMEANS,
    iters: int = KMEANS_ITERS,
    dp: int = KMEANS_DP,
) -> list[list[float]]:
    """Sequential pure-Python Lloyd — the independent reference the
    Spark trainer must reproduce EXACTLY, and the generator for the
    oracle SQL's codebook literals.

    Determinism contract (shared with kmeans_fit and the SQL twin):
    - seed centroids = vectors vec_id 0..k-1, components rounded;
    - distance = left-to-right sum of (x-y)^2 (bit-matches Spark's
      aggregate(zip_with) and DuckDB's list_dot_product of the diff);
    - ties -> smaller centroid id; empty cluster keeps its centroid;
    - new centroids rounded to `dp` decimals EVERY iteration — the
      quantization step that absorbs summation-order ULP noise across
      engines (cluster sums are shuffle-ordered in Spark, sequential
      here; round(6) makes them identical unless a sum lands within
      5e-7 of a rounding boundary AND engines differ — not observed).
    """
    d = len(next(iter(vecs.values())))
    cents = [[round(c, dp) for c in vecs[i]] for i in range(k)]
    ids = sorted(vecs)
    for _ in range(iters):
        sums = [[0.0] * d for _ in range(k)]
        counts = [0] * k
        for vid in ids:
            v = vecs[vid]
            best, bd = 0, None
            for ci, c in enumerate(cents):
                acc = 0.0
                for x, y in zip(v, c):
                    acc += (x - y) * (x - y)
                if bd is None or acc < bd:
                    bd, best = acc, ci
            counts[best] += 1
            for j, x in enumerate(v):
                sums[best][j] += x
        cents = [
            [round(s / counts[ci], dp) for s in sums[ci]]
            if counts[ci]
            else cents[ci]
            for ci in range(k)
        ]
    return cents


def _lit_vec(c: list[float]) -> Column:
    """Literal double array as ONE parsed SQL expression instead of
    len(c)+1 py4j F.lit round-trips — the codebook-literal plans
    (IVF/PQ/IVFPQ) were spending ~2x their execution time just
    BUILDING the expression tree through the bridge. `repr(x)D` is
    bit-exact: repr is shortest-exact and Java's Double parsing is
    correctly rounded (verified bit-for-bit in tests)."""
    return F.expr(_lit_vec_sql(c))


def _lit_vec_sql(c: list[float]) -> str:
    return "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"


def _lit_mat_sql(mat: list[list[float]]) -> str:
    """Literal array<array<double>> as one SQL string (same repr
    round-trip exactness contract as _lit_vec)."""
    return "array(" + ",".join(_lit_vec_sql(c) for c in mat) + ")"


def _dtable_cells_sql(cbs: list[list[list[float]]], qres_sql: str) -> str:
    """The ADC distance-table cells of one query(-residual) row as ONE
    generator expression: inline all (m, c_id, pd2u) rows computed
    against the LITERAL codebooks (r19, guide §7.3 + §2.4).

    Replaces the former per-build `createDataFrame(codebook rows)` +
    broadcast join: that rendition re-parallelized the 64-row codebook
    into defaultParallelism pickled slices on EVERY builder call (a
    32-task broadcast-side stage of ~0.3 s pure Python-bridge latency,
    zero CPU — profiled r19) and paid a join just to pair each query
    subvector with each centroid. The arithmetic here is term-for-term
    the old plan's: d2 = aggregate(zip_with(qsub, c, (x-y)²), 0.0,
    acc+x) with qsub = slice(qres, m·DSUB+1, DSUB), quantized
    floor(d2·10^PQ_DP + 0.5) — literals go through repr (shortest-
    exact) and Spark's correctly-rounded double parser, so every cell
    is bit-identical to the joined rendition."""
    scale = f"{float(10**PQ_DP)!r}D"
    return (
        "inline(flatten(transform("
        + "array(" + ",".join(_lit_mat_sql(m) for m in cbs) + ")"
        + ", (sub, m) -> transform(sub, (c, ci) -> named_struct("
        + "'m', m, 'c_id', ci, 'pd2u', floor(aggregate(zip_with("
        + f"slice({qres_sql}, m * {PQ_DSUB} + 1, {PQ_DSUB}), c, "
        + "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x) "
        + f"* {scale} + 0.5D))))))"
    )


def _d2_cols(v: Column | str, cents: list[list[float]]) -> Column:
    """array of struct(d2, c_id); argmin = array_min (lexicographic:
    smallest d2, ties -> smallest c_id). d2 is the same left-to-right
    (x-y)^2 sum as the reference.

    `v` is an SQL expression string ("v", "slice(v, 1, 8)"): the whole
    k-way distance array parses as ONE JVM expression. The previous
    Column/lambda rendition created k zip_with + k aggregate
    higher-order lambdas through py4j (~25 bridge round-trips each) —
    profiling showed the PQ plans spending 2x their execution time
    just BUILDING expression trees. Semantics are unchanged: the SQL
    text is the same zip_with/aggregate the lambdas produced."""
    assert isinstance(v, str), "pass the vector as an SQL expression string"
    items = []
    for ci, c in enumerate(cents):
        arr = "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
        agg = (
            f"aggregate(zip_with({v}, {arr}, "
            "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
        )
        items.append(f"named_struct('d2', {agg}, 'c_id', {ci})")
    return F.expr("array(" + ",".join(items) + ")")


def kmeans_fit(
    emb: DataFrame,
    k: int = K_KMEANS,
    iters: int = KMEANS_ITERS,
    dp: int = KMEANS_DP,
) -> list[list[float]]:
    """Distributed Lloyd: the canonical Spark iterative-algorithm shape
    — the codebook (k×d doubles) lives on the DRIVER and re-broadcasts
    as literals each iteration; the data never re-shuffles (assignment
    is a map-side expression, stats are one partial+final agg per
    iteration). tests/test_northstar.py asserts codebook equality with
    kmeans_reference."""
    seeds = {
        int(r["vec_id"]): [float(x) for x in r["v"]]
        for r in emb.filter(F.col("vec_id") < k).select("vec_id", "v").collect()
    }
    cents = [[round(c, dp) for c in seeds[i]] for i in range(k)]
    for _ in range(iters):
        assigned = emb.select(
            F.array_min(_d2_cols("v", cents))
            .getField("c_id")
            .alias("c"),
            "v",
        )
        stats = (
            assigned.select("c", F.posexplode("v").alias("d", "x"))
            .groupBy("c", "d")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_c: dict[int, dict[int, tuple[float, int]]] = {}
        for r in stats:
            by_c.setdefault(int(r["c"]), {})[int(r["d"])] = (
                float(r["s"]),
                int(r["n"]),
            )
        cents = [
            [
                round(by_c[ci][j][0] / by_c[ci][j][1], dp)
                for j in range(len(cents[ci]))
            ]
            if ci in by_c
            else cents[ci]
            for ci in range(k)
        ]
    return cents


def similarity_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over a TRAINED codebook (distributed Lloyd, k=8, 3
    iterations) — the complement of similarity_ivf's label-mean
    quantizer: lists follow the learned cluster structure, not the
    labels. Same probe/rerank contract (nprobe=2, exact cosine top-k).
    The oracle embeds the INDEPENDENTLY-trained reference codebook as
    literals, so a hash match verifies Spark's distributed training
    reached the identical codebook AND the identical retrieval."""
    emb = _emb(spark, sf_dir)
    cents = _coarse_codebook(spark, sf_dir)
    d2 = F.array_min(_d2_cols("v", cents))
    assigned = emb.select(
        "vec_id", "v", d2.getField("c_id").alias("list_id")
    )
    # nprobe nearest lists per query: rank the full d2 array
    ranked = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(
                F.array_sort(_d2_cols("v", cents))
            ).alias("rk", "s"),
        )
        .filter(F.col("rk") < N_PROBE)
        .select("query_id", F.col("s").getField("c_id").alias("list_id"))
    )
    cands = (
        assigned.join(F.broadcast(ranked), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "v")
        .distinct()
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = cands.join(F.broadcast(qv), "query_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("v"), F.col("qv"))
         / (_norm(F.col("v")) * _norm(F.col("qv")))).alias("cos"),
    )
    return (
        _per_query_topk(
            scored, TOPK, [F.desc("cos"), F.asc("neighbor_id")],
            "neighbor_id", rank_name="rank",
        )
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cos", 6).alias("sim"),
        )
        .orderBy("query_id", "rank")
    )


def _sql_d2(c_rel: str) -> str:
    """Squared distance e.v ↔ {c_rel}.c in the shared bit-exact form:
    list_dot_product of the elementwise diff (same left-to-right sum
    as Spark's aggregate(zip_with))."""
    diff = f"list_transform(list_zip(e.v, {c_rel}.c), s -> s[1] - s[2])"
    return f"list_dot_product({diff}, {diff})"


def _kmeans_train_ctes() -> tuple[str, str]:
    """The Lloyd training loop as unrolled SQL CTEs over an `emb`
    relation (vec_id, v) — shared by every oracle that must retrain
    the coarse codebook independently (IVF retrieval, SemDeDup).
    Returns (cte_block, final_centroid_relation_name)."""
    steps = []
    steps.append(
        f"""cents0 AS (
          SELECT vec_id AS c_id,
                 list_transform(v, x -> round(x, {KMEANS_DP})) AS c
          FROM emb WHERE vec_id < {K_KMEANS}
        )"""
    )
    for t in range(KMEANS_ITERS):
        steps.append(
            f"""a{t} AS (
          SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {_sql_d2('c')} ASC, c.c_id ASC)
                     AS rk
            FROM emb e CROSS JOIN cents{t} c
          ) WHERE rk = 1
        ), comp{t} AS (
          SELECT a.c_id, t.i, round(avg(e.v[i]), {KMEANS_DP}) AS cx
          FROM a{t} a JOIN emb e USING (vec_id),
               unnest(range(1, len(e.v) + 1)) AS t(i)
          GROUP BY a.c_id, t.i
        ), cents{t + 1} AS (
          SELECT c_id, list(cx ORDER BY i) AS c FROM comp{t} GROUP BY c_id
          UNION ALL
          SELECT c_id, c FROM cents{t}
          WHERE c_id NOT IN (SELECT DISTINCT c_id FROM a{t})
        )"""
        )
    return ",\n        ".join(steps), f"cents{KMEANS_ITERS}"


def ivf_kmeans_oracle_sql() -> str:
    """The ENTIRE pipeline — Lloyd training AND retrieval — as one
    sf-agnostic SQL string: the 3 iterations unroll into CTE chains
    over the `embeddings` view, so the oracle independently retrains
    the codebook on whatever scale factor the harness mounts (the
    driver gates at sf0.01, pytest at sf0.001). Distance uses
    list_dot_product of the elementwise diff — bit-identical to
    Spark's sequential zip_with sum — and centroid components round
    to {KMEANS_DP}dp per iteration, the same quantization contract
    that makes the distributed/sequential/SQL trainers agree."""

    d2 = _sql_d2
    train, final = _kmeans_train_ctes()
    cos = (
        "list_dot_product(a.v, q.qv) / "
        "(sqrt(list_dot_product(a.v, a.v)) * "
        "sqrt(list_dot_product(q.qv, q.qv)))"
    )
    return f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        {train},
        d2s AS (
          SELECT e.vec_id, c.c_id, {d2('c')} AS d2
          FROM emb e CROSS JOIN {final} c
        ), ranked AS (
          SELECT vec_id, c_id,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2 ASC, c_id ASC) AS rk
          FROM d2s
        ), assigned AS (
          SELECT vec_id, c_id AS list_id FROM ranked WHERE rk = 1
        ), probes AS (
          SELECT vec_id AS query_id, c_id AS list_id FROM ranked
          WHERE rk <= {N_PROBE} AND vec_id < {N_QUERIES}
        ), cands AS (
          SELECT DISTINCT p.query_id, a.vec_id
          FROM probes p JOIN assigned a USING (list_id)
          WHERE a.vec_id <> p.query_id
        ), qv AS (
          SELECT vec_id AS query_id, v AS qv FROM emb
          WHERE vec_id < {N_QUERIES}
        ), scored AS (
          SELECT c.query_id, c.vec_id AS neighbor_id, {cos} AS cos
          FROM cands c
          JOIN emb a ON a.vec_id = c.vec_id
          JOIN qv q ON q.query_id = c.query_id
        ), topk AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC)
                   AS rank,
                 round(cos, 6) AS sim
          FROM scored
        )
        SELECT query_id, neighbor_id, rank, sim FROM topk
        WHERE rank <= {TOPK} ORDER BY query_id, rank
    """


# ---------------------------------------------------------------------------
# SemDeDup (Abbas, Tirumala, Simig, Ganguli, Morcos 2023: "SemDeDup:
# Data-efficient learning at web-scale through semantic deduplication",
# arXiv:2303.09540) — semantic near-dup removal: cluster the embedding
# space, then compare pairs only WITHIN a cluster. The clustering bounds
# the quadratic term: the paper runs 110k clusters over LAION-440M
# (~4k vectors/cluster); here k=K_KMEANS over the test corpus. The
# reference repo has no embedding ops at all (SURVEY §2.11 north-star).
# ---------------------------------------------------------------------------

# Same cosine threshold as the hyperplane-LSH dedup path: SemDeDup and
# dedup_embedding_lsh are two scale strategies (clustering vs banding)
# for the SAME near-dup contract, so they share the contract constant —
# tests compare their recall against the exact pairwise baseline.
SEMDEDUP_T = EMB_DEDUP_T  # 0.35

# Block side for the per-cluster pairwise kernel: peak memory is
# BLOCK² doubles (+ the cluster's own vectors) REGARDLESS of cluster
# size, so a skewed mega-cluster degrades to more block iterations
# instead of OOMing the executor. 2048² doubles = 32 MB/block. Tests
# shrink this to force multi-block execution on small clusters.
SEMDEDUP_BLOCK = 2048


def _semdedup_dropped(M: "np.ndarray", t: float, block: int) -> "np.ndarray":
    """Per-cluster SemDeDup drop flags with BLOCKED pairwise cosine:
    rows of M are id-ordered unit vectors; returns dropped[i] ⇔ some
    j < i with cos(M[j], M[i]) >= t.

    The cosine matrix is computed one (row-block × col-block) tile at
    a time, each tile accumulated over the dimension axis left-to-right
    — the same IEEE sequence per element as the unblocked outer-product
    loop and the oracle's list_dot_product, so blocking cannot flip a
    >= t comparison. Peak extra memory: block² doubles, independent of
    cluster size (the mega-cluster enforcement SCALE.md prescribes —
    the audit's over_cap flag now means 'slow', never 'OOM')."""
    n = M.shape[0]
    dropped = np.zeros(n, dtype=bool)
    for jlo in range(1, n, block):  # col block: candidate dropped js
        jhi = min(jlo + block, n)
        for ilo in range(0, jhi, block):  # row block: potential twins
            ihi = min(ilo + block, jhi)
            tile = np.zeros((ihi - ilo, jhi - jlo))
            for k in range(M.shape[1]):
                tile += M[ilo:ihi, k][:, None] * M[jlo:jhi, k][None, :]
            hit = tile >= t
            # only i < j counts: mask the diagonal-and-above of the
            # overlapping region (global indices)
            gi = np.arange(ilo, ihi)[:, None]
            gj = np.arange(jlo, jhi)[None, :]
            dropped[jlo:jhi] |= (hit & (gi < gj)).any(axis=0)
    return dropped


def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: drop every vector that has a lower-id semantic twin
    (cosine >= SEMDEDUP_T) inside its k-means cluster. Reuses the SAME
    trained coarse codebook as similarity_ivf_kmeans (one Lloyd fit,
    cached per corpus fingerprint, pays for both retrieval and dedup —
    exactly the shared-quantizer economy the SemDeDup paper argues for).

    Keeper rule: deterministic, non-iterative — vec v survives iff no
    u < v in the same cluster with cos(u, v) >= T. (The paper keeps one
    representative per connected near-dup group; min-id domination is
    the order-free variant of its "keep lowest index" tie-break and
    needs no iteration-to-fixpoint.)

    Plan shape / 100 TB: assignment is a map-side argmin over broadcast
    centroid literals (no shuffle); the pairwise stage is ONE shuffle on
    list_id into a per-cluster Arrow kernel (applyInPandas) that does
    all pairs of a cluster in one vectorized pass — never a cross join
    (registry-wide no-CartesianProduct sweep), and ~4x faster than the
    relational self-join rendition whose per-pair HOF dot evaluates
    interpreted. The quadratic term is bounded by the largest cluster
    in TIME only — the kernel is tile-blocked (_semdedup_dropped), so
    peak memory is SEMDEDUP_BLOCK² per task and a skewed mega-cluster
    degrades to more tile iterations instead of an executor OOM;
    semdedup_cluster_audit flags such clusters (at scale k grows with
    the corpus — SemDeDup §3: fix the TARGET cluster size, derive k).
    Cosine accumulates
    in dimension order — the bit-exact IEEE sequence the oracle's
    list_dot_product uses — so the >= T comparison cannot flip
    cross-engine."""
    emb = _emb(spark, sf_dir)
    cents = _coarse_codebook(spark, sf_dir)
    # normalize ONCE on the map side: cosine then costs one dot per
    # pair instead of dot + two norms — 3x less work inside the
    # quadratic stage. The oracle normalizes with the identical
    # elementwise form, so the parity stays bit-exact.
    assigned = (
        emb.withColumn("nrm", _norm(F.col("v")))
        .select(
            "vec_id",
            F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("vn"),
            F.array_min(_d2_cols("v", cents))
            .getField("c_id")
            .alias("list_id"),
        )
    )
    t = float(SEMDEDUP_T)

    def cluster_dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        # Pairwise cosine for ONE cluster, dimension-ordered (the same
        # IEEE sequence as the HOF / list_dot_product dot — the
        # relational self-join rendition evaluates the lambda dot per
        # pair interpreted, ~4x slower at 5k vectors), BLOCKED in
        # SEMDEDUP_BLOCK² tiles so a mega-cluster costs iterations, not
        # executor memory (see _semdedup_dropped).
        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        M = np.array(pdf["vn"].tolist(), dtype=np.float64)[order]
        dropped = _semdedup_dropped(M, t, SEMDEDUP_BLOCK)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "list_id": pdf["list_id"].iloc[0],
                "dropped": dropped,
            }
        )

    return (
        assigned.groupBy("list_id")
        .applyInPandas(
            cluster_dedup, "vec_id long, list_id int, dropped boolean"
        )
        .orderBy("vec_id")
    )


# the paper's control is TARGET cluster size (k scales with the
# corpus); this cap is the guard-rail for when a skewed corpus defeats
# that — same role as EMB_LSH_BUCKET_CAP for the banded path
SEMDEDUP_CLUSTER_CAP = 4096


def semdedup_cluster_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster cost audit for semdedup — the honesty metric the
    quadratic stage needs: each cluster's size, the pair count it
    contributes (n·(n−1)/2 — the actual kernel work), and whether it
    exceeds SEMDEDUP_CLUSTER_CAP. Since the kernel is tile-blocked
    (_semdedup_dropped: peak memory SEMDEDUP_BLOCK², any cluster size),
    over_cap now means 'quadratic TIME hotspot — raise k', never an
    executor OOM and never a silent truncation.
    Assignment-only plan: one map-side argmin + one tiny groupBy —
    runs long before anyone pays the pairwise stage."""
    emb = _emb(spark, sf_dir)
    cents = _coarse_codebook(spark, sf_dir)
    assigned = emb.select(
        F.array_min(_d2_cols("v", cents)).getField("c_id").alias("list_id")
    )
    return (
        assigned.groupBy("list_id")
        .agg(F.count("*").alias("n_vecs"))
        .select(
            "list_id",
            "n_vecs",
            (F.col("n_vecs") * (F.col("n_vecs") - 1) / 2)
            .cast("long")
            .alias("n_pairs"),
            (F.col("n_vecs") > SEMDEDUP_CLUSTER_CAP).alias("over_cap"),
        )
        .orderBy("list_id")
    )


def semdedup_oracle_sql() -> str:
    """Independent SemDeDup: retrains the codebook via the shared
    unrolled-Lloyd CTEs, re-derives assignments, and recomputes every
    intra-cluster cosine with list_dot_product — a hash match verifies
    training + assignment + the pairwise keep/drop decisions
    end-to-end."""
    train, final = _kmeans_train_ctes()
    # normalized-once cosine, elementwise x / sqrt(dot(v,v)) then one
    # dot — the exact operation sequence of the Spark plan
    cos = "list_dot_product(ea.vn, eb.vn)"
    return f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 list_transform(embedding::DOUBLE[],
                   x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[])))
                   AS vn
          FROM embeddings
        ),
        {train},
        d2s AS (
          SELECT e.vec_id, c.c_id, {_sql_d2('c')} AS d2
          FROM emb e CROSS JOIN {final} c
        ), assigned AS (
          SELECT vec_id, c_id AS list_id FROM (
            SELECT vec_id, c_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2 ASC, c_id ASC) AS rk
            FROM d2s
          ) WHERE rk = 1
        ), drops AS (
          SELECT DISTINCT b.vec_id
          FROM assigned a
          JOIN assigned b USING (list_id)
          JOIN emb ea ON ea.vec_id = a.vec_id
          JOIN emb eb ON eb.vec_id = b.vec_id
          WHERE a.vec_id < b.vec_id AND {cos} >= {SEMDEDUP_T}
        )
        SELECT s.vec_id, s.list_id,
               (s.vec_id IN (SELECT vec_id FROM drops)) AS dropped
        FROM assigned s ORDER BY s.vec_id
    """


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011: "Product Quantization
# for Nearest Neighbor Search") — the memory-scale ANN path: a 64-dim
# double vector compresses to PQ_M small codes (here 8 codes of 3 bits),
# and search runs against the codes through a per-query distance table
# (ADC: asymmetric distance computation), never touching raw vectors.
# At 100 TB the codes table is ~32× smaller than the corpus and the
# distance table is a broadcast of PQ_M × PQ_KSUB × |queries| floats.
# ---------------------------------------------------------------------------

PQ_M = 8        # subspaces
PQ_DSUB = 8     # dims per subspace (64 / PQ_M)
PQ_KSUB = 8     # centroids per subspace (3-bit codes)
PQ_ITERS = 2    # Lloyd iterations per subspace
PQ_DP = 9       # partial-d2 fixed-point decimals (exact int64 sums)
_PQ_CACHE: dict[tuple, list[list[list[float]]]] = {}


def pq_fit(emb: DataFrame) -> list[list[list[float]]]:
    """Train PQ_M per-subspace codebooks ([m][c_id][dsub]) by running
    the SAME distributed Lloyd as similarity_ivf_kmeans on each
    subvector slice — identical determinism contract (seed = vec_id <
    k, per-iteration round(KMEANS_DP), ties → smaller c_id). Driver
    traffic per iteration is the k×dsub aggregate stats, independent
    of corpus size."""
    return [
        kmeans_fit(
            emb.select(
                "vec_id",
                F.slice("v", m * PQ_DSUB + 1, PQ_DSUB).alias("v"),
            ),
            k=PQ_KSUB,
            iters=PQ_ITERS,
        )
        for m in range(PQ_M)
    ]


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    # keyed by dataset fingerprint (mtime+size), not bare path — a
    # corpus regenerated at the same path must retrain, same contract
    # as _corpus_matrix. NOTE builder-time side effect: building a PQ
    # query plan triggers the (memoized) training Spark jobs.
    key = _corpus_key(sf_dir)
    cbs = _PQ_CACHE.get(key)
    if cbs is None:
        cbs = pq_fit(_emb(spark, sf_dir))
        _PQ_CACHE[key] = cbs
    return cbs


def pq_codes_col(cbs: list[list[list[float]]]) -> Column:
    """array<int> of PQ_M codes for column `v` — argmin centroid per
    subspace, evaluated as the same array_min(struct(d2, c_id))
    lexicographic idiom the kmeans assignment uses. Pure JVM
    expression: encoding a 100 TB corpus is a map-only stage."""
    return F.array(
        *[
            F.array_min(
                _d2_cols(f"slice(v, {m * PQ_DSUB + 1}, {PQ_DSUB})", cbs[m])
            ).getField("c_id")
            for m in range(PQ_M)
        ]
    )


def _pq_adc_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, units): the ADC distance of every corpus
    vector to every query, as exact int64 fixed-point units — the
    shared core of similarity_pq_adc and similarity_pq_rerank.

    Each distance-table cell is quantized to PQ_DP decimals
    (floor(d2·1e9 + 0.5), exact int64) before the per-candidate sum,
    so the M-term addition is order-free cross-engine.

    Scale: codes = map-only; the dtable joins are broadcasts
    (PQ_M·PQ_KSUB·|queries| rows); the candidate sum shuffles
    |corpus|·|queries| pre-aggregated rows. For large query sets,
    bucket queries and loop — the corpus-side codes never recompute."""
    emb = _emb(spark, sf_dir)
    cbs = _pq_codebooks(spark, sf_dir)
    codes = emb.select(
        "vec_id", F.posexplode(pq_codes_col(cbs)).alias("m", "code")
    )
    # r19: the distance table is built by ONE literal-codebook
    # generator expression per query row (see _dtable_cells_sql) —
    # the former createDataFrame(codebook) + broadcast join cost a
    # 32-task pickled-slice stage and a join per build, for 64 rows
    # of literals the plan already holds.
    dtable = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.expr(_dtable_cells_sql(cbs, "v")),
    )
    return (
        codes.join(
            F.broadcast(dtable),
            (codes.m == dtable.m) & (codes.code == dtable.c_id),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2u").alias("units"))
    )


def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed top-k by L2: encode the corpus to PQ_M codes, then
    for each query build the ADC distance table (per-subspace d2 to
    every centroid) and rank candidates by the exact integer sum of
    table lookups. Returns (query_id, neighbor_id, rank, approx_d2);
    ranking ties break on neighbor_id. The oracle retrains all PQ_M
    codebooks in unrolled SQL CTEs — a hash match verifies training,
    encoding, and ADC retrieval end-to-end."""
    approx = _pq_adc_distances(spark, sf_dir)
    return (
        _per_query_topk(
            approx, TOPK, [F.asc("units"), F.asc("vec_id")], "vec_id",
            rank_name="rank",
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            (F.col("units").cast("double") / F.lit(float(10**PQ_DP))).alias(
                "approx_d2"
            ),
        )
        .orderBy("query_id", "rank")
    )


PQ_RERANK_R = 50  # ADC shortlist size fed to the exact rerank (flat PQ)
# IVFPQ+R shortlist size — pinned at the r13 frontier knee: recall@5
# is shortlist-capped on this corpus (see similarity_ivfpq_rerank
# docstring), and R=100 buys 90% recall at unchanged candidate volume.
IVFPQ_RERANK_R = 100


def similarity_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production two-stage retrieval (IVFADC-with-rerank per Jégou
    et al. 2011 §V): ADC over compressed codes shortlists PQ_RERANK_R
    candidates per query, then ONLY the shortlist pays an exact-L2
    rerank against raw vectors. Returns (query_id, neighbor_id, rank,
    d2) — the final top-{TOPK} by exact distance.

    Recall of the final top-k equals ADC recall@{PQ_RERANK_R}, which
    on this corpus (isotropic synthetic embeddings — the hardest case
    for any space partitioner; distances concentrate in 64-dim) is
    ~0.8–0.9 vs ~0.2 for raw ADC@{TOPK}; the property test pins the
    floor. d2 is the same left-to-right zip_with sum as the kmeans
    contract, bit-identical to the oracle's list_dot_product diff.

    Scale: the rerank join touches |queries|·R rows of raw vectors —
    independent of corpus size; everything upstream reads codes only."""
    approx = _pq_adc_distances(spark, sf_dir)
    shortlist = _per_query_topk(
        approx, PQ_RERANK_R, [F.asc("units"), F.asc("vec_id")], "vec_id"
    ).select("query_id", "vec_id")
    emb = _emb(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        shortlist.join(emb.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "vec_id", d2.alias("d2"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("d2", 6).alias("d2"),
        )
        .orderBy("query_id", "rank")
    )


def _pq_d2_sql(e_sv: str, c_rel: str) -> str:
    diff = f"list_transform(list_zip({e_sv}, {c_rel}.c), s -> s[1] - s[2])"
    return f"list_dot_product({diff}, {diff})"


def _pq_train_core(src: str = "emb") -> tuple[str, str, list[str]]:
    """(train_ctes, codes_union, final_codebook_names): per-subspace
    Lloyd training + encoding CTE text over any (vec_id, v) relation —
    shared by the raw-vector PQ oracles and the IVFPQ residual oracle
    (same unrolled pattern as ivf_kmeans_oracle_sql, once per
    subspace)."""
    d2 = _pq_d2_sql
    steps = []
    code_selects = []
    fins = []
    for m in range(PQ_M):
        a, b = m * PQ_DSUB + 1, m * PQ_DSUB + PQ_DSUB
        steps.append(
            f"""sub{m} AS MATERIALIZED (
          SELECT vec_id, v[{a}:{b}] AS sv FROM {src}
        ), c{m}_0 AS (
          SELECT vec_id AS c_id,
                 list_transform(sv, x -> round(x, {KMEANS_DP})) AS c
          FROM sub{m} WHERE vec_id < {PQ_KSUB}
        )"""
        )
        for t in range(PQ_ITERS):
            steps.append(
                f"""a{m}_{t} AS (
          SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {d2('e.sv', 'c')} ASC,
                                               c.c_id ASC) AS rk
            FROM sub{m} e CROSS JOIN c{m}_{t} c
          ) WHERE rk = 1
        ), comp{m}_{t} AS (
          SELECT a.c_id, t.i, round(avg(e.sv[i]), {KMEANS_DP}) AS cx
          FROM a{m}_{t} a JOIN sub{m} e USING (vec_id),
               unnest(range(1, {PQ_DSUB} + 1)) AS t(i)
          GROUP BY a.c_id, t.i
        ), c{m}_{t + 1} AS (
          SELECT c_id, list(cx ORDER BY i) AS c
          FROM comp{m}_{t} GROUP BY c_id
          UNION ALL
          SELECT c_id, c FROM c{m}_{t}
          WHERE c_id NOT IN (SELECT DISTINCT c_id FROM a{m}_{t})
        )"""
            )
        fin = f"c{m}_{PQ_ITERS}"
        fins.append(fin)
        steps.append(
            f"""codes{m} AS (
          SELECT vec_id, c_id AS code FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {d2('e.sv', 'c')} ASC,
                                               c.c_id ASC) AS rk
            FROM sub{m} e CROSS JOIN {fin} c
          ) WHERE rk = 1
        )"""
        )
        code_selects.append(
            f"SELECT vec_id, {m} AS m, code FROM codes{m}"
        )
    train = ",\n        ".join(steps)
    codes_union = "\n          UNION ALL ".join(code_selects)
    return train, codes_union, fins


def _pq_train_sql() -> tuple[str, str, str]:
    """(train_ctes, codes_union, dt_union) for the RAW-vector PQ
    oracles: the shared core plus per-subspace query distance tables
    (queries = vec_id < N_QUERIES of the same corpus)."""
    train, codes_union, fins = _pq_train_core("emb")
    dt_steps = []
    dt_selects = []
    for m, fin in enumerate(fins):
        dt_steps.append(
            f"""dt{m} AS (
          SELECT e.vec_id AS query_id, c.c_id,
                 CAST(floor({_pq_d2_sql('e.sv', 'c')} * 1e{PQ_DP} + 0.5)
                      AS BIGINT) AS pd2u
          FROM sub{m} e CROSS JOIN {fin} c
          WHERE e.vec_id < {N_QUERIES}
        )"""
        )
        dt_selects.append(
            f"SELECT query_id, {m} AS m, c_id, pd2u FROM dt{m}"
        )
    train = train + ",\n        " + ",\n        ".join(dt_steps)
    dt_union = "\n          UNION ALL ".join(dt_selects)
    return train, codes_union, dt_union


_PQ_ADC_CTES = """
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        {train},
        codes AS (
          {codes_union}
        ), dt AS (
          {dt_union}
        ), adc AS (
          SELECT d.query_id, c.vec_id,
                 CAST(sum(d.pd2u) AS BIGINT) AS units
          FROM codes c JOIN dt d ON d.m = c.m AND d.c_id = c.code
          WHERE c.vec_id <> d.query_id
          GROUP BY d.query_id, c.vec_id
        )"""


def pq_adc_oracle_sql() -> str:
    """The whole PQ pipeline — per-subspace Lloyd training, encoding,
    ADC retrieval — as one sf-agnostic SQL string."""
    train, codes_union, dt_union = _pq_train_sql()
    head = _PQ_ADC_CTES.format(
        train=train, codes_union=codes_union, dt_union=dt_union
    )
    return f"""{head}, topk AS (
          SELECT query_id, vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY units ASC, vec_id ASC) AS rank,
                 CAST(units AS DOUBLE) / 1e{PQ_DP} AS approx_d2
          FROM adc
        )
        SELECT query_id, neighbor_id, rank, approx_d2 FROM topk
        WHERE rank <= {TOPK} ORDER BY query_id, rank
    """


def pq_rerank_oracle_sql() -> str:
    """ADC shortlist + exact-L2 rerank, sharing the training/encode/
    ADC CTEs with pq_adc_oracle_sql. Exact d2 = list_dot_product of
    the elementwise diff — bit-identical to Spark's zip_with sum."""
    train, codes_union, dt_union = _pq_train_sql()
    head = _PQ_ADC_CTES.format(
        train=train, codes_union=codes_union, dt_union=dt_union
    )
    diff = "list_transform(list_zip(a.v, q.v), s -> s[1] - s[2])"
    return f"""{head}, shortlist AS (
          SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY units ASC, vec_id ASC) AS rk
            FROM adc
          ) WHERE rk <= {PQ_RERANK_R}
        ), rerank AS (
          SELECT s.query_id, s.vec_id,
                 list_dot_product({diff}, {diff}) AS d2
          FROM shortlist s
          JOIN emb a ON a.vec_id = s.vec_id
          JOIN emb q ON q.vec_id = s.query_id
        ), topk AS (
          SELECT query_id, vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d2 ASC, vec_id ASC) AS rank,
                 round(d2, 6) AS d2
          FROM rerank
        )
        SELECT query_id, neighbor_id, rank, d2 FROM topk
        WHERE rank <= {TOPK} ORDER BY query_id, rank
    """


# ---------------------------------------------------------------------------
# IVFADC proper (Jégou et al. 2011 §IV): IVF coarse quantizer + PQ on
# RESIDUALS — the composition production ANN systems actually ship.
# The coarse centroid absorbs the vector's position; PQ only has to
# code the (much smaller) residual, so the same code budget buys far
# less quantization error than raw-vector PQ.
# ---------------------------------------------------------------------------

_IVFPQ_CACHE: dict[tuple, list[list[list[float]]]] = {}


def _coarse_codebook(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """THE trained coarse quantizer accessor — distributed Lloyd,
    memoized per dataset fingerprint (mtime+size: a regenerated corpus
    must retrain; the gates invoke consumers repeatedly, 3 Spark
    actions per fit). Single shared implementation for IVF retrieval,
    SemDeDup, IVFPQ, the drift monitor, and its streaming twin (r14:
    the per-consumer inline memo blocks collapsed onto this)."""
    key = _corpus_key(sf_dir)
    cents = _KMEANS_CACHE.get(key)
    if cents is None:
        cents = kmeans_fit(_emb(spark, sf_dir))
        _KMEANS_CACHE[key] = cents
    return cents


def _residuals(emb: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(vec_id, list_id, v=residual): assign each vector to its coarse
    list and subtract that centroid — pure JVM expressions."""
    assigned = emb.select(
        "vec_id",
        "v",
        F.array_min(_d2_cols("v", cents))
        .getField("c_id")
        .alias("list_id"),
    )
    # one parsed expression (r19): the centroid matrix literal + the
    # subtraction lambda cost ~25 py4j round-trips per Column before
    res_v = F.expr(
        f"zip_with(v, element_at({_lit_mat_sql(cents)}, list_id + 1), "
        "(x, y) -> x - y)"
    )
    return assigned.select("vec_id", "list_id", res_v.alias("v"))


def _ivfpq_codebooks(
    spark: SparkSession, sf_dir: str, res: DataFrame
) -> list[list[list[float]]]:
    """Residual PQ codebooks for the IVFPQ chain, memoized per corpus
    fingerprint (training is deterministic, see pq_fit)."""
    key = (*_corpus_key(sf_dir), "ivfpq")
    cbs = _IVFPQ_CACHE.get(key)
    if cbs is None:
        cbs = pq_fit(res.select("vec_id", "v"))
        _IVFPQ_CACHE[key] = cbs
    return cbs


def _ivfpq_adc_units(
    spark: SparkSession, sf_dir: str, n_probe: int = N_PROBE
) -> DataFrame:
    """(query_id, vec_id, units): probed-ADC distance of every
    candidate in a query's n_probe nearest lists, as exact int64
    fixed-point units — the shared core of similarity_ivfpq and
    similarity_ivfpq_rerank (coarse-assign the corpus, PQ-encode the
    residuals, per-(query, probed-list) distance tables on the query
    residual — the asymmetric distance of Jégou et al. §IV). This
    rendition trains/encodes IN-PLAN; similarity_ivfpq_serve runs the
    same probe against the PERSISTED index tables."""
    emb = _emb(spark, sf_dir)
    cents = _coarse_codebook(spark, sf_dir)
    res = _residuals(emb, cents)
    cbs = _ivfpq_codebooks(spark, sf_dir, res)
    codes = res.select(
        "vec_id", "list_id", F.posexplode(pq_codes_col(cbs)).alias("m", "code")
    )
    return _ivfpq_probe_adc(spark, emb, codes, cents, cbs, n_probe)


def _ivfpq_probe_adc(
    spark: SparkSession,
    emb: DataFrame,
    codes: DataFrame,
    cents: list[list[float]],
    cbs: list[list[list[float]]],
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Probed-ADC scan over an ALREADY-ENCODED corpus: given the
    (vec_id, list_id, m, code) frame (in-plan or a stored bucketed
    table) plus driver-side coarse centroids and residual codebooks,
    build the per-(query, probed-list) distance tables and return
    (query_id, vec_id, units)."""
    # probed lists per query (same ranked-d2 idiom as similarity_ivf_kmeans)
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "v",
            F.posexplode(
                F.array_sort(_d2_cols("v", cents))
            ).alias("rk", "s"),
        )
        .filter(F.col("rk") < n_probe)
        .select("query_id", "v", F.col("s").getField("c_id").alias("list_id"))
    )
    # r19: per-(query, probed-list) distance tables via ONE literal-
    # codebook generator expression on the query residual (see
    # _dtable_cells_sql) — replaces the per-build createDataFrame +
    # broadcast join; cell arithmetic is bit-identical.
    qres_sql = (
        f"zip_with(v, element_at({_lit_mat_sql(cents)}, list_id + 1), "
        "(x, y) -> x - y)"
    )
    dtable = probes.select(
        "query_id",
        "list_id",
        F.expr(_dtable_cells_sql(cbs, qres_sql)),
    )
    return (
        codes.join(
            F.broadcast(dtable),
            (codes.list_id == dtable.list_id)
            & (codes.m == dtable.m)
            & (codes.code == dtable.c_id),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2u").alias("units"))
    )


def similarity_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC retrieval: coarse-assign the corpus, PQ-encode the
    residuals, then for each query probe the N_PROBE nearest lists and
    rank THEIR vectors by the exact-int64 sum of per-subspace lookups
    against the QUERY RESIDUAL for that list (each probed list gets
    its own distance table because the query residual differs per
    list). Returns (query_id, neighbor_id, rank, approx_d2).

    Scale: everything raw-vector-sized stays map-only (assignment,
    residuals, encoding); the per-query tables are
    |queries|·N_PROBE·PQ_M·PQ_KSUB broadcast cells; candidates are
    only the probed lists' rows. The oracle retrains BOTH quantizers
    (coarse k-means and all PQ_M residual codebooks) in unrolled SQL,
    so a hash match verifies the entire two-level training + encoding
    + probed-ADC retrieval.

    Quality note (measured on the per-round dashboard): raw probed-ADC
    @{TOPK} recall is low on this isotropic corpus (~15% at sf0.1) —
    the deployable rung is similarity_ivfpq_rerank, which caps the
    same chain with an exact rerank (Jégou et al. §V)."""
    approx = _ivfpq_adc_units(spark, sf_dir)
    return (
        _per_query_topk(
            approx, TOPK, [F.asc("units"), F.asc("vec_id")], "vec_id",
            rank_name="rank",
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            (F.col("units").cast("double") / F.lit(float(10**PQ_DP))).alias(
                "approx_d2"
            ),
        )
        .orderBy("query_id", "rank")
    )


def similarity_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC+R (Jégou et al. 2011 §V) — the deployable rung of the
    IVFPQ chain: the probed-ADC scan shortlists IVFPQ_RERANK_R
    candidates per query from the N_PROBE nearest lists, then ONLY the shortlist
    pays an exact-L2 rerank against raw vectors. Returns (query_id,
    neighbor_id, rank, d2), the final top-{TOPK} by exact distance;
    ties break on neighbor_id.

    Why this rung exists: the r11 quality dashboard measured raw
    probed-ADC recall@{TOPK} at 15% (3-bit residual codes on an
    isotropic corpus) while its ADC recall@R is high — exactly the
    gap §V's rerank closes; the same pattern lifted flat PQ from 22%
    to 67% (similarity_pq_rerank) and int8 to 100%. Recall floor vs
    the exact-L2 baseline pinned in tests/test_northstar.py.

    Operating point (r13 frontier sweep, VERDICT r12 item 4): recall
    on this corpus is capped by the SHORTLIST SIZE, not the probe
    budget — the 3-bit residual codes rank so noisily that the true
    neighbor often sits outside the ADC top-50 even when its list is
    probed (r=50 recall@5 stays 70% from n_probe=2 to 8, while
    r=100/200 reach 90/95% at n_probe=2). The pinned knee is
    (N_PROBE={N_PROBE}, R={IVFPQ_RERANK_R}): ≥90% recall@5 at
    UNCHANGED candidate volume — only the corpus-size-independent
    rerank join grows, |queries|·{IVFPQ_RERANK_R} rows. The per-round
    bench records the (n_probe × R) curve (ann_frontier_* artifacts).

    Scale: identical to similarity_ivfpq upstream (map-only encode,
    broadcast tables, candidates bounded by the probed lists), plus a
    rerank join that touches |queries|·R raw-vector rows — independent
    of corpus size. The shortlist ranking rides the salted two-level
    window, so no reducer ever sorts a whole list's candidates."""
    approx = _ivfpq_adc_units(spark, sf_dir)
    return _rerank_exact(spark, sf_dir, approx, r=IVFPQ_RERANK_R)


def _rerank_exact(
    spark: SparkSession,
    sf_dir: str,
    approx: DataFrame,
    r: int = PQ_RERANK_R,
    emb: DataFrame | None = None,
    queries: DataFrame | None = None,
) -> DataFrame:
    """The +R tail shared by similarity_ivfpq_rerank and
    similarity_ivfpq_serve (and the bench frontier sweep): shortlist
    the approx (query_id, vec_id, units) frame to r candidates per
    query via the salted two-level top-k, exact-L2 rerank the
    shortlist against raw vectors, return the final top-{TOPK}.
    `emb`/`queries` default to the sf_dir corpus and its vec_id <
    N_QUERIES head; the bench drift experiment passes an augmented
    corpus and a drifted query set."""
    shortlist = _per_query_topk(
        approx, r, [F.asc("units"), F.asc("vec_id")], "vec_id"
    ).select("query_id", "vec_id")
    if emb is None:
        emb = _emb(spark, sf_dir)
    qsrc = queries if queries is not None else emb
    qv = qsrc.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        shortlist.join(emb.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "vec_id", d2.alias("d2"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("d2", 6).alias("d2"),
        )
        .orderBy("query_id", "rank")
    )


# Bucket count for the persisted codes table. At fixture scale this
# matches K_KMEANS; at production scale the coarse codebook is
# thousands of lists (k ~ sqrt(n)), so hashing list_id into a few
# hundred buckets spreads well and the probe stays co-located.
IVFPQ_INDEX_BUCKETS = 8


def ivfpq_index_tables(sf_dir: str) -> dict[str, str]:
    """Catalog names of the persisted IVFPQ index artifacts, keyed by
    the corpus fingerprint (mtime+size — a regenerated corpus gets new
    tables, same contract as the training caches)."""
    from hashlib import md5

    fp = md5(repr(_corpus_key(sf_dir)).encode()).hexdigest()[:10]
    return {
        "coarse": f"ann_ivfpq_coarse_{fp}",
        "codebooks": f"ann_ivfpq_codebooks_{fp}",
        "codes": f"ann_ivfpq_codes_{fp}",
    }


def build_ivfpq_index(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Train the IVFPQ index ONCE and persist it as the serving
    artifacts a production deployment stores (VERDICT r12 item 3 —
    the snapshot pattern of incremental_dedup_pairs applied to ANN):

    - `coarse`   (c_id, c array<double>): coarse k-means centroids;
    - `codebooks`(m, c_id, c array<double>): PQ residual codebooks;
    - `codes`    (vec_id, list_id, m, code): the encoded corpus,
      bucketed by list_id and sorted within buckets — the probe that
      fans candidates out of the n_probe nearest lists reads only
      those buckets' files and never reshuffles the corpus (receipt:
      tests/test_scale.py::test_ivfpq_stored_codes_probe_no_shuffle).

    Training floats survive the parquet round-trip exactly (IEEE
    doubles), so a query served from the stored index is bit-identical
    to the in-plan chain. Idempotent: returns immediately when all
    three tables exist for this corpus fingerprint. Refresh story: a
    corpus rewrite changes the fingerprint → new table names; periodic
    re-encoders would swap the names atomically via a view."""
    names = ivfpq_index_tables(sf_dir)
    if all(spark.catalog.tableExists(t) for t in names.values()):
        return names
    # The default session catalog is in-memory: a previous session can
    # leave table DIRECTORIES in the warehouse that this session's
    # catalog doesn't know, and saveAsTable refuses to adopt an
    # existing location (LOCATION_ALREADY_EXISTS). Clear the stale
    # locations before rebuilding — the bucketing metadata only lives
    # in the catalog, so orphaned files can't be trusted as an index.
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme in ("", "file") and wh.path:
        import os as _os

        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            loc = _os.path.join(wh.path, t.lower())
            if _os.path.exists(loc):
                shutil.rmtree(loc, ignore_errors=True)
    emb = _emb(spark, sf_dir)
    cents = _coarse_codebook(spark, sf_dir)
    res = _residuals(emb, cents)
    cbs = _ivfpq_codebooks(spark, sf_dir, res)
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "c_id int, c array<double>",
    ).write.mode("overwrite").saveAsTable(names["coarse"])
    spark.createDataFrame(
        [
            (m, ci, [float(x) for x in cbs[m][ci]])
            for m in range(PQ_M)
            for ci in range(PQ_KSUB)
        ],
        "m int, c_id int, c array<double>",
    ).write.mode("overwrite").saveAsTable(names["codebooks"])
    (
        res.select(
            "vec_id",
            "list_id",
            F.posexplode(pq_codes_col(cbs)).alias("m", "code"),
        )
        .write.mode("overwrite")
        .bucketBy(IVFPQ_INDEX_BUCKETS, "list_id")
        .sortBy("list_id", "vec_id")
        .saveAsTable(names["codes"])
    )
    return names


def _load_ivfpq_index(
    spark: SparkSession, names: dict[str, str]
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Driver-side load of the stored quantizers (two tiny collects)."""
    cents_rows = spark.table(names["coarse"]).orderBy("c_id").collect()
    cents = [list(r["c"]) for r in cents_rows]
    cbs: list[list[list[float]]] = [
        [None] * PQ_KSUB for _ in range(PQ_M)  # type: ignore[list-item]
    ]
    for r in spark.table(names["codebooks"]).collect():
        cbs[r["m"]][r["c_id"]] = list(r["c"])
    return cents, cbs


def append_to_ivfpq_index(
    spark: SparkSession, sf_dir: str, new_emb: DataFrame
) -> dict[str, str]:
    """Incremental index maintenance — the cheap rung of the refresh
    story: NEW vectors (vec_id, v) encode map-only against the FROZEN
    stored quantizers (coarse assign → residual → PQ codes, zero
    training jobs, existing codes untouched) and append to the
    bucketed codes table with the SAME bucket spec, so the probe plan
    is unchanged and stays co-located. This is how a daily crawl
    increment lands in the serving index; the expensive rung — full
    retrain because the distribution drifted — is a new fingerprint's
    build_ivfpq_index + view swap (SCALE.md §r13).

    Receipt (tests/test_scale.py::test_ivfpq_index_append_no_retrain):
    appending duplicates of existing vectors yields byte-identical
    codes, the table keeps its bucket spec, and the appended rows are
    immediately probe-visible."""
    names = ivfpq_index_tables(sf_dir)
    cents, cbs = _load_ivfpq_index(spark, names)
    (
        _residuals(new_emb, cents)
        .select(
            "vec_id",
            "list_id",
            F.posexplode(pq_codes_col(cbs)).alias("m", "code"),
        )
        .write.mode("append")
        .bucketBy(IVFPQ_INDEX_BUCKETS, "list_id")
        .sortBy("list_id", "vec_id")
        .saveAsTable(names["codes"])
    )
    return names


# Which path the last similarity_ivfpq_serve call used ("stored" |
# "fallback") — bench records it so a silent fallback is visible in
# the artifacts, not just in pytest.
SERVE_PATH_USED = "unset"

# The ONLY errors that legitimately mean "this session cannot write
# the index tables": Spark catalog errors (AnalysisException covers
# unwritable/locked catalogs) and local-filesystem errors from the
# stale-location cleanup. Anything else is a build bug and must raise.
from pyspark.errors import AnalysisException as _AnalysisException

_CATALOG_UNWRITABLE_ERRORS = (_AnalysisException, OSError)

# JVM-side write failures a genuinely unwritable warehouse raises at
# EXECUTION time (not analysis): saveAsTable surfaces them as
# Py4JJavaError wrapping a permission / space / rename error.
# Matched by NARROW filesystem-write markers only — a bare
# "IOException" marker would also match any executor failure whose
# stack trace mentions an IOException (corrupt input parquet, shuffle
# fetch failure), silently serving the fallback for what is really a
# build bug (ADVICE r14). Those must raise.
_UNWRITABLE_JVM_MARKERS = (
    "Permission denied",
    "Read-only file system",
    "ReadOnlyFileSystem",
    "No space left",
    "Failed to rename",
    "Mkdirs failed",
)


def _is_unwritable_jvm_error(e: Exception) -> bool:
    try:
        from py4j.protocol import Py4JJavaError
    except ImportError:  # pragma: no cover
        return False
    if not isinstance(e, Py4JJavaError):
        return False
    msg = str(e)
    return any(m in msg for m in _UNWRITABLE_JVM_MARKERS)


def similarity_ivfpq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC+R served from the PERSISTED index — the shape a 100 TB
    deployment actually runs: build_ivfpq_index writes the codebooks
    and the bucketed coded corpus once; every query after that loads
    two tiny codebook tables driver-side and probes the stored codes
    table without re-training, re-encoding, or reshuffling anything
    corpus-sized. Output is bit-identical to similarity_ivfpq_rerank
    (training floats round-trip parquet exactly), so the oracle is the
    same unrolled retrain-and-probe SQL — a hash match pins that the
    STORED artifacts equal what training produces.

    Falls back to the in-plan chain ONLY on unwritable-warehouse
    errors: AnalysisException from saveAsTable, OSError from the
    location handling, and execution-time JVM write failures
    (Py4JJavaError whose rendered trace carries a narrow
    filesystem-write marker — permission / read-only / no-space /
    rename / mkdirs, per _UNWRITABLE_JVM_MARKERS; a bare IOException
    mention does NOT qualify, ADVICE r14). A genuine index-build bug
    (bad codebook shapes, training failures) RAISES instead of
    silently serving the fallback as if the stored path worked
    (VERDICT r13 item 4; receipt:
    tests/test_scale.py::test_ivfpq_serve_poisoned_build_raises).
    Which path served is recorded in SERVE_PATH_USED for the bench
    artifact."""
    global SERVE_PATH_USED
    SERVE_PATH_USED = "unset"  # a raise mid-build leaves no stale claim
    try:
        names = build_ivfpq_index(spark, sf_dir)
    except _CATALOG_UNWRITABLE_ERRORS:  # pragma: no cover
        SERVE_PATH_USED = "fallback"
        return similarity_ivfpq_rerank(spark, sf_dir)
    except Exception as e:  # pragma: no cover — JVM write failures
        if not _is_unwritable_jvm_error(e):
            raise
        SERVE_PATH_USED = "fallback"
        return similarity_ivfpq_rerank(spark, sf_dir)
    SERVE_PATH_USED = "stored"
    cents, cbs = _load_ivfpq_index(spark, names)
    codes = spark.table(names["codes"])
    emb = _emb(spark, sf_dir)
    approx = _ivfpq_probe_adc(spark, emb, codes, cents, cbs)
    return _rerank_exact(spark, sf_dir, approx, r=IVFPQ_RERANK_R)


def _ivfpq_adc_head_sql() -> str:
    """Shared oracle head for the IVFPQ family: coarse k-means
    training (unrolled like ivf_kmeans_oracle_sql), residual
    computation, all PQ_M residual codebooks (shared generator,
    src='res'), per-(query, probed-list) distance tables on query
    residuals, through the probed `adc` CTE — ivfpq_oracle_sql and
    ivfpq_rerank_oracle_sql append their tails."""

    def cd2(c_rel: str) -> str:
        diff = f"list_transform(list_zip(e.v, {c_rel}.c), s -> s[1] - s[2])"
        return f"list_dot_product({diff}, {diff})"

    steps = [
        f"""cents0 AS (
          SELECT vec_id AS c_id,
                 list_transform(v, x -> round(x, {KMEANS_DP})) AS c
          FROM emb WHERE vec_id < {K_KMEANS}
        )"""
    ]
    for t in range(KMEANS_ITERS):
        steps.append(
            f"""ka{t} AS MATERIALIZED (
          SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cd2('c')} ASC, c.c_id ASC)
                     AS rk
            FROM emb e CROSS JOIN cents{t} c
          ) WHERE rk = 1
        ), kcomp{t} AS (
          SELECT a.c_id, t.i, round(avg(e.v[i]), {KMEANS_DP}) AS cx
          FROM ka{t} a JOIN emb e USING (vec_id),
               unnest(range(1, len(e.v) + 1)) AS t(i)
          GROUP BY a.c_id, t.i
        ), cents{t + 1} AS MATERIALIZED (
          SELECT c_id, list(cx ORDER BY i) AS c FROM kcomp{t} GROUP BY c_id
          UNION ALL
          SELECT c_id, c FROM cents{t}
          WHERE c_id NOT IN (SELECT DISTINCT c_id FROM ka{t})
        )"""
        )
    kfin = f"cents{KMEANS_ITERS}"
    coarse = ",\n        ".join(steps)

    train, codes_union, fins = _pq_train_core("res")
    dtp_steps = []
    dtp_selects = []
    for m, fin in enumerate(fins):
        a, b = m * PQ_DSUB + 1, m * PQ_DSUB + PQ_DSUB
        dtp_steps.append(
            f"""qsub{m} AS (
          SELECT query_id, list_id, v[{a}:{b}] AS sv FROM qres
        ), dtp{m} AS (
          SELECT e.query_id, e.list_id, c.c_id,
                 CAST(floor({_pq_d2_sql('e.sv', 'c')} * 1e{PQ_DP} + 0.5)
                      AS BIGINT) AS pd2u
          FROM qsub{m} e CROSS JOIN {fin} c
        )"""
        )
        dtp_selects.append(
            f"SELECT query_id, list_id, {m} AS m, c_id, pd2u FROM dtp{m}"
        )
    dtp = ",\n        ".join(dtp_steps)
    dtp_union = "\n          UNION ALL ".join(dtp_selects)

    return f"""
        WITH emb AS MATERIALIZED (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        {coarse},
        assigned AS MATERIALIZED (
          SELECT vec_id, c_id AS list_id FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cd2('c')} ASC, c.c_id ASC)
                     AS rk
            FROM emb e CROSS JOIN {kfin} c
          ) WHERE rk = 1
        ), res AS MATERIALIZED (
          SELECT e.vec_id, a.list_id,
                 list_transform(list_zip(e.v, c.c), s -> s[1] - s[2]) AS v
          FROM emb e JOIN assigned a USING (vec_id)
          JOIN {kfin} c ON c.c_id = a.list_id
        ),
        {train},
        codes AS MATERIALIZED (
          {codes_union}
        ), probes AS MATERIALIZED (
          SELECT vec_id AS query_id, c_id AS list_id FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cd2('c')} ASC, c.c_id ASC)
                     AS rk
            FROM emb e CROSS JOIN {kfin} c
            WHERE e.vec_id < {N_QUERIES}
          ) WHERE rk <= {N_PROBE}
        ), qres AS MATERIALIZED (
          SELECT p.query_id, p.list_id,
                 list_transform(list_zip(q.v, c.c), s -> s[1] - s[2]) AS v
          FROM probes p
          JOIN emb q ON q.vec_id = p.query_id
          JOIN {kfin} c ON c.c_id = p.list_id
        ),
        {dtp},
        dtp_all AS (
          {dtp_union}
        ), codesl AS (
          SELECT c.vec_id, a.list_id, c.m, c.code
          FROM codes c JOIN assigned a USING (vec_id)
        ), adc AS (
          SELECT d.query_id, c.vec_id,
                 CAST(sum(d.pd2u) AS BIGINT) AS units
          FROM codesl c
          JOIN dtp_all d
            ON d.list_id = c.list_id AND d.m = c.m AND d.c_id = c.code
          WHERE c.vec_id <> d.query_id
          GROUP BY d.query_id, c.vec_id
        )"""


def ivfpq_oracle_sql() -> str:
    """The ENTIRE two-level pipeline in one sf-agnostic SQL string:
    shared IVFPQ head (training + encoding + probed ADC) capped with
    the raw ADC top-k ranking."""
    return f"""{_ivfpq_adc_head_sql()}, topk AS (
          SELECT query_id, vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY units ASC, vec_id ASC) AS rank,
                 CAST(units AS DOUBLE) / 1e{PQ_DP} AS approx_d2
          FROM adc
        )
        SELECT query_id, neighbor_id, rank, approx_d2 FROM topk
        WHERE rank <= {TOPK} ORDER BY query_id, rank
    """


def ivfpq_rerank_oracle_sql() -> str:
    """IVFADC+R oracle: the shared IVFPQ head's probed-ADC candidates
    shortlisted to PQ_RERANK_R, then the exact-L2 rerank CTE — the
    same tail composition as pq_rerank_oracle_sql, so a hash match
    verifies coarse + residual training, encoding, probed ADC, the
    shortlist, and the rerank end-to-end."""
    diff = "list_transform(list_zip(a.v, q.v), s -> s[1] - s[2])"
    return f"""{_ivfpq_adc_head_sql()}, shortlist AS (
          SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY units ASC, vec_id ASC) AS rk
            FROM adc
          ) WHERE rk <= {IVFPQ_RERANK_R}
        ), rerank AS (
          SELECT s.query_id, s.vec_id,
                 list_dot_product({diff}, {diff}) AS d2
          FROM shortlist s
          JOIN emb a ON a.vec_id = s.vec_id
          JOIN emb q ON q.vec_id = s.query_id
        ), topk AS (
          SELECT query_id, vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d2 ASC, vec_id ASC) AS rank,
                 round(d2, 6) AS d2
          FROM rerank
        )
        SELECT query_id, neighbor_id, rank, d2 FROM topk
        WHERE rank <= {TOPK} ORDER BY query_id, rank
    """


DIMSTAT_DP = 6  # fixed-point decimals for per-dimension moments


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension first/second moments of the embedding corpus —
    the observability step before any standardization/whitening that
    PQ/IVF preprocessing applies (a skewed or off-center dimension
    ruins subspace quantizers). Returns (dim, n, sum_units,
    sumsq_units): exact int64 fixed-point sums, so the stats are
    bit-stable under any partitioning and hash-checkable; mean and
    variance derive downstream as sum/n and (n·SS − S²)/n² without
    ever summing floats.

    Plan: posexplode → ONE hash agg on the 64-value dim key (partial
    map-side); nothing else. Scale note: at ~1e12 rows the int64
    sum-of-squares approaches overflow — swap the two sums to
    `decimal(38,0)` per fixedpoint.py's scale note (same determinism,
    one cast)."""
    emb = _emb(spark, sf_dir)
    q = F.floor(
        F.col("x") * F.lit(float(10**DIMSTAT_DP)) + F.lit(0.5)
    ).cast("long")
    return (
        emb.select(F.posexplode("v").alias("dim", "x"))
        .select("dim", q.alias("q"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("q").alias("sum_units"),
            F.sum(F.col("q") * F.col("q")).alias("sumsq_units"),
        )
        .orderBy("dim")
    )


def embedding_dim_stats_sql() -> str:
    return f"""
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(unnest(embedding::DOUBLE[]) * 1e{DIMSTAT_DP} + 0.5)
              AS BIGINT) AS q
  FROM embeddings
)
SELECT dim, count(*)::BIGINT AS n,
       sum(q)::BIGINT AS sum_units,
       sum(q * q)::BIGINT AS sumsq_units
FROM ex GROUP BY dim ORDER BY dim
"""


INT8_ERR_DP = 7  # reconstruction-error fixed-point decimals


def embedding_int8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization audit — the 4× memory cut an ANN
    serving tier takes before anything fancier (per-dimension affine
    codes: code = round((x − min_d)/scale_d), scale_d =
    (max_d − min_d)/255). Returns per dimension: n, the exact integer
    code checksum (quantization is deterministic cross-engine: the
    affine transform is IEEE double arithmetic and round() is
    half-away-from-zero on both), the summed |reconstruction error|
    in 1e-7 fixed-point units (fixedpoint discipline — float sums
    reorder, integer sums don't), and the rounded dimension range.

    Plan: posexplode → 64-row min/max agg → broadcast back → one
    partial+final agg on the dim key. Two passes over the array
    column (range, then codes) — the price of a data-dependent
    codebook; at 100 TB both passes are map-side-combined aggs on a
    64-value key, and the range pass can run on a sample if the
    clipping tolerance allows."""
    emb = _emb(spark, sf_dir)
    ex = emb.select(F.posexplode("v").alias("dim", "x"))
    rng = ex.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    j = ex.join(F.broadcast(rng), "dim")
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    code = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0.0))
        .otherwise(F.round((F.col("x") - F.col("mn")) / scale, 0))
        .cast("long")
    )
    recon = F.col("mn") + code.cast("double") * scale
    err_units = F.floor(
        F.abs(F.col("x") - recon) * F.lit(float(10**INT8_ERR_DP))
        + F.lit(0.5)
    ).cast("long")
    return (
        j.select("dim", code.alias("code"), err_units.alias("eu"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("code").alias("code_sum"),
            F.sum("eu").alias("err_units"),
        )
        .join(
            rng.select(
                "dim",
                F.round("mn", 6).alias("dim_min"),
                F.round("mx", 6).alias("dim_max"),
            ),
            "dim",
        )
        .orderBy("dim")
    )


def embedding_int8_stats_sql() -> str:
    return f"""
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings
), rng AS (
  SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim
), coded AS (
  SELECT e.dim, e.x, r.mn, r.mx,
         CASE WHEN r.mx = r.mn THEN 0
              ELSE CAST(round((e.x - r.mn) / ((r.mx - r.mn) / 255.0), 0)
                        AS BIGINT) END AS code
  FROM ex e JOIN rng r USING (dim)
), errs AS (
  SELECT dim, code,
         CAST(floor(abs(x - (mn + code::DOUBLE * ((mx - mn) / 255.0)))
                    * 1e{INT8_ERR_DP} + 0.5) AS BIGINT) AS eu
  FROM coded
)
SELECT e.dim AS dim, count(*)::BIGINT AS n,
       sum(e.code)::BIGINT AS code_sum,
       sum(e.eu)::BIGINT AS err_units,
       round(any_value(r.mn), 6) AS dim_min,
       round(any_value(r.mx), 6) AS dim_max
FROM errs e JOIN rng r USING (dim)
GROUP BY e.dim ORDER BY e.dim
"""


# ---------------------------------------------------------------------------
# int8-ADC retrieval: serve ANN from the scalar int8 codes that
# embedding_int8_stats audits — the standard memory-bound serving plan
# (4x smaller corpus resident per executor than float32, 32x smaller
# than the float64 test vectors). Same two-stage shape as
# similarity_pq_rerank: approximate distances on codes shortlist R
# candidates, exact float rerank touches raw vectors for the
# shortlist only.
# ---------------------------------------------------------------------------

INT8_ADC_DP = 9      # ADC-cell fixed-point decimals (exact int64 sums)
INT8_RERANK_R = 50   # ADC shortlist size fed to the exact rerank


def _int8_adc_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, units): approximate squared-L2 of every
    corpus vector to every query, computed ENTIRELY from the int8
    codes — exact int64 fixed-point units so the 64-term sum is
    order-free cross-engine.

    The quantizer is embedding_int8_stats' per-dimension affine map
    (code = round((x − mn_d)/scale_d), scale_d = (mx_d − mn_d)/255).
    ADC per Jégou et al. 2011 §III applied to scalar quantization:
    each (query, dim) precomputes the distance table cell
    (q_d − recon(code))² for all 256 codes, so the corpus-side scan
    does table LOOKUPS, never float recon math per vector.

    Plan shape and 100 TB posture:
    - rng: 64-row min/max agg (map-side combined), broadcast back;
    - codes: one posexplode pass over the corpus — map-only;
    - dtable: |queries|·64·256 rows built from broadcast pieces,
      itself broadcast (8 queries → 131,072 rows ≈ 3 MB);
    - adc: codes ⋈ broadcast(dtable) on (dim, code) with partial
      aggregation — the only shuffle carries |corpus|·|queries|
      pre-aggregated (query_id, vec_id, partial-sum) rows.
    The corpus never materializes driver-side and raw vectors are
    read only by the caller's rerank stage."""
    emb = _emb(spark, sf_dir)
    ex = emb.select("vec_id", F.posexplode("v").alias("dim", "x"))
    rng = ex.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    code = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0.0))
        .otherwise(F.round((F.col("x") - F.col("mn")) / scale, 0))
        .cast("long")
    )
    codes = ex.join(F.broadcast(rng), "dim").select(
        "vec_id", "dim", code.alias("code")
    )
    qx = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.posexplode("v").alias("dim", "qx"),
        )
    )
    diff = F.col("qx") - (F.col("mn") + F.col("code") * scale)
    dtable = (
        qx.join(F.broadcast(rng), "dim")
        .select(
            "query_id",
            "dim",
            F.explode(F.sequence(F.lit(0), F.lit(255))).alias("code"),
            "qx",
            "mn",
            "mx",
        )
        .select(
            "query_id",
            "dim",
            F.col("code").cast("long").alias("code"),
            F.floor(
                diff * diff * F.lit(float(10**INT8_ADC_DP)) + F.lit(0.5)
            ).alias("u"),
        )
    )
    return (
        codes.join(
            F.broadcast(dtable),
            (codes.dim == dtable.dim) & (codes.code == dtable.code),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("u").alias("units"))
    )


def similarity_int8_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage int8 retrieval: ADC over scalar-quantized codes
    shortlists INT8_RERANK_R candidates per query; only the shortlist
    pays an exact-L2 rerank against raw vectors (|queries|·R rows —
    independent of corpus size). Returns (query_id, neighbor_id, rank,
    d2), the final top-{TOPK} by exact distance; ties break on
    neighbor_id. Exact d2 is the same left-to-right zip_with sum as
    the PQ contract, bit-identical to the oracle's list_dot_product
    diff. Recall floor vs exact top-k pinned in tests/test_northstar."""
    approx = _int8_adc_units(spark, sf_dir)
    shortlist = _per_query_topk(
        approx, INT8_RERANK_R, [F.asc("units"), F.asc("vec_id")], "vec_id"
    ).select("query_id", "vec_id")
    emb = _emb(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        shortlist.join(emb.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "vec_id", d2.alias("d2"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("d2", 6).alias("d2"),
        )
        .orderBy("query_id", "rank")
    )


def int8_adc_oracle_sql() -> str:
    """The whole int8 pipeline — per-dim affine quantization, ADC
    distance tables, shortlist, exact rerank — as one sf-agnostic SQL
    string. Cell math mirrors the Spark expressions token-for-token
    (same IEEE op order); the 64-cell sums are exact int64."""
    diff = "list_transform(list_zip(a.v, q.v), s -> s[1] - s[2])"
    return f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), ex AS (
          SELECT vec_id, generate_subscripts(v, 1) - 1 AS dim,
                 unnest(v) AS x
          FROM emb
        ), rng AS (
          SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim
        ), codes AS (
          SELECT e.vec_id, e.dim,
                 CASE WHEN r.mx = r.mn THEN 0
                      ELSE CAST(round((e.x - r.mn)
                                      / ((r.mx - r.mn) / 255.0), 0)
                                AS BIGINT) END AS code
          FROM ex e JOIN rng r USING (dim)
        ), qx AS (
          SELECT vec_id AS query_id, dim, x AS qx FROM ex
          WHERE vec_id < {N_QUERIES}
        ), dt AS (
          SELECT query_id, dim, code,
                 CAST(floor(df * df * 1e{INT8_ADC_DP} + 0.5)
                      AS BIGINT) AS u
          FROM (
            SELECT q.query_id, q.dim, t.code,
                   q.qx - (r.mn + t.code * ((r.mx - r.mn) / 255.0)) AS df
            FROM qx q JOIN rng r USING (dim)
            CROSS JOIN (SELECT unnest(range(0, 256)) AS code) t
          )
        ), adc AS (
          SELECT d.query_id, c.vec_id, CAST(sum(d.u) AS BIGINT) AS units
          FROM codes c JOIN dt d ON d.dim = c.dim AND d.code = c.code
          WHERE c.vec_id <> d.query_id
          GROUP BY d.query_id, c.vec_id
        ), shortlist AS (
          SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY units ASC, vec_id ASC) AS rk
            FROM adc
          ) WHERE rk <= {INT8_RERANK_R}
        ), rerank AS (
          SELECT s.query_id, s.vec_id,
                 list_dot_product({diff}, {diff}) AS d2
          FROM shortlist s
          JOIN emb a ON a.vec_id = s.vec_id
          JOIN emb q ON q.vec_id = s.query_id
        ), topk AS (
          SELECT query_id, vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d2 ASC, vec_id ASC) AS rank,
                 round(d2, 6) AS d2
          FROM rerank
        )
        SELECT query_id, neighbor_id, rank, d2 FROM topk
        WHERE rank <= {TOPK} ORDER BY query_id, rank
    """


# --- quantization-error drift monitor ---------------------------------------

DRIFT_SHIFT = 0.5  # per-dim mean offset of the synthetic drifted batch
DRIFT_ERR_SCALE = 1_000_000  # d2 fixedpoint: floor(d2 * 1e6 + 0.5)
# The operating rule's pinned numbers (SCALE.md, VERDICT r14 item 7):
# the always-on monitor fires when the corpus-weighted drift ratio
# crosses 1.5× the training error; the recall probe then decides a
# rebuild when the append path trails a rebuild by ≥ 10 recall points.
DRIFT_TRIGGER_X1000 = 1_500
RECALL_REBUILD_GAP_PTS = 10


def _assign_err_rollup(df: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Per-list (n, err fixedpoint units) of assigning `df`(…, v) to the
    FROZEN codebook: argmin over the broadcast centroid literals (the
    similarity_ivf_kmeans assignment expression), per-row d2 quantized
    to int64 units so the sums are order-independent and bit-exact
    cross-engine (fixedpoint.py's contract), then one partial+final
    agg. Map-side only — the corpus never shuffles on anything but the
    {K_KMEANS}-group rollup key."""
    m = F.array_min(_d2_cols("v", cents))
    per = df.select(
        m.getField("c_id").cast("long").alias("list_id"),
        F.floor(
            m.getField("d2") * F.lit(float(DRIFT_ERR_SCALE)) + F.lit(0.5)
        ).alias("u"),
    )
    return per.groupBy("list_id").agg(
        F.count("*").alias("n"), F.sum("u").alias("units")
    )


def ann_drift_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ALWAYS-ON rebuild-trigger monitor for the persisted ANN
    index (SCALE.md's operating rule): per coarse list, the mean
    quantization error (d2 to the assigned frozen centroid) of the
    TRAINING corpus vs an incoming drifted batch. Recall-based triggers
    (bench's ann_recall_after_append_pct) need ground-truth top-k — too
    expensive to run per ingest; quantization error needs only the
    assignment the index build already computes, so a production
    deployment charts THIS per batch and schedules the recall probe /
    rebuild when it moves.

    The drifted batch here is the same synthetic +{DRIFT_SHIFT}/dim
    mean offset the bench drift experiment appends (deterministic at
    every SF; in production the increment is the day's embeddings).

    All error sums are int64 fixedpoint (floor(d2·1e6 + 0.5) per row,
    summed exactly), averages are integer division, and the headline
    `drift_x1000` = avg_inc·1000 div avg_train — bit-exact cross-engine
    with no float aggregation anywhere.

    Output per list_id 0..{K_KMEANS−1}: (list_id, n_train,
    err_units_train, avg_units_train, n_inc, err_units_inc,
    avg_units_inc, drift_x1000), ordered. Empty lists report zeros and
    NULL averages in both engines.

    Scale: the codebook is K·d driver-side literals (the kmeans_fit
    memo, bounded by construction); both rollups are map-side argmin +
    partial agg over K groups; the final join is K rows. No window, no
    corpus shuffle."""
    emb = _emb(spark, sf_dir)
    cents = _coarse_codebook(spark, sf_dir)
    inc = emb.select(
        "vec_id",
        F.expr(f"transform(v, x -> x + {DRIFT_SHIFT!r}D)").alias("v"),
    )
    t = _assign_err_rollup(emb, cents)
    i = _assign_err_rollup(inc, cents)
    lists = spark.range(len(cents)).select(F.col("id").alias("list_id"))
    j = (
        lists.join(
            t.select(
                "list_id",
                F.col("n").alias("tn"),
                F.col("units").alias("tu"),
            ),
            "list_id",
            "left",
        )
        .join(
            i.select(
                "list_id",
                F.col("n").alias("inn"),
                F.col("units").alias("iu"),
            ),
            "list_id",
            "left",
        )
        .select(
            "list_id",
            F.coalesce("tn", F.lit(0)).alias("n_train"),
            F.coalesce("tu", F.lit(0)).alias("err_units_train"),
            F.expr("CASE WHEN tn > 0 THEN tu div tn END").alias(
                "avg_units_train"
            ),
            F.coalesce("inn", F.lit(0)).alias("n_inc"),
            F.coalesce("iu", F.lit(0)).alias("err_units_inc"),
            F.expr("CASE WHEN inn > 0 THEN iu div inn END").alias(
                "avg_units_inc"
            ),
            F.expr(
                "CASE WHEN tn > 0 AND inn > 0 AND tu div tn > 0 "
                "THEN ((iu div inn) * 1000) div (tu div tn) END"
            ).alias("drift_x1000"),
        )
    )
    return j.orderBy("list_id")


def ann_drift_oracle_sql() -> str:
    """The twin retrains the codebook independently (the shared Lloyd
    CTEs), assigns both relations with the bit-exact d2 form, and does
    the same int64 fixedpoint rollup."""
    train, final = _kmeans_train_ctes()
    d2 = _sql_d2("c")
    s = DRIFT_ERR_SCALE

    def assign(rel: str) -> str:
        return f"""(
          SELECT c_id, CAST(floor(d2 * {s} + 0.5) AS BIGINT) AS u FROM (
            SELECT e.vec_id, c.c_id, {d2} AS d2,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {d2} ASC, c.c_id ASC) AS rk
            FROM {rel} e CROSS JOIN {final} c
          ) WHERE rk = 1
        )"""

    return f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        {train},
        inc AS (
          SELECT vec_id, list_transform(v, x -> x + {DRIFT_SHIFT}) AS v
          FROM emb
        ),
        rt AS (
          SELECT c_id, count(*)::BIGINT AS n, sum(u)::BIGINT AS units
          FROM {assign('emb')} GROUP BY c_id
        ),
        ri AS (
          SELECT c_id, count(*)::BIGINT AS n, sum(u)::BIGINT AS units
          FROM {assign('inc')} GROUP BY c_id
        ),
        ls AS (SELECT unnest(range({K_KMEANS}))::BIGINT AS list_id)
        SELECT l.list_id,
               coalesce(rt.n, 0)::BIGINT AS n_train,
               coalesce(rt.units, 0)::BIGINT AS err_units_train,
               (CASE WHEN rt.n > 0 THEN rt.units // rt.n END)::BIGINT
                 AS avg_units_train,
               coalesce(ri.n, 0)::BIGINT AS n_inc,
               coalesce(ri.units, 0)::BIGINT AS err_units_inc,
               (CASE WHEN ri.n > 0 THEN ri.units // ri.n END)::BIGINT
                 AS avg_units_inc,
               (CASE WHEN rt.n > 0 AND ri.n > 0 AND rt.units // rt.n > 0
                     THEN ((ri.units // ri.n) * 1000) // (rt.units // rt.n)
                END)::BIGINT AS drift_x1000
        FROM ls l
        LEFT JOIN rt ON rt.c_id = l.list_id
        LEFT JOIN ri ON ri.c_id = l.list_id
        ORDER BY l.list_id
    """
