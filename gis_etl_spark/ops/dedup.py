"""Deduplication operators [north-star]: exact, MinHash+LSH, SimHash,
n-gram Jaccard (SURVEY.md §2.11; Broder '97 for MinHash, Charikar '02
for SimHash — both public algorithms, re-expressed as relational plans).

Every operator is pure DataFrame algebra (explode → hash-agg → band
join) so it scales as a set of shuffles — no Python in the hot path,
and every step has an exact ANSI-SQL twin for the DuckDB oracle.

Cross-engine determinism:
- word hash h60 = int(md5(word)[:15], 16) — 60-bit, overflow-safe;
- MinHash permutations h_j = (a_j * (h60 % P) + b_j) % P with
  P = 2^31-1 and seeded a_j/b_j constants < 2^31 → products < 2^62,
  no int64 overflow in either engine;
- SimHash uses bits 0..59 of h60 (60-bit signature keeps the sign bit
  clear in both engines' BIGINT);
- band keys are md5 strings of the concatenated signature slice.

Scale design: candidate generation is the whole point of LSH — the
band join groups by (band_idx, band_key) so the shuffle is O(docs ×
bands), never O(docs²); only candidates pay the exact-verify join.
At 100 TB the band tables are further bucketable by band_key.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_etl_spark.fixtures import ensure_documents_aug
from gis_etl_spark.ops.text import h60_sql

P31 = 2**31 - 1
N_HASHES = 16
# 8 bands × 2 rows: P(candidate | j) = 1-(1-j²)⁸ → 0.90 at j=0.5,
# 0.08 at j=0.1 — tuned for shingle-jaccard near-dups on a corpus
# whose tiny vocabulary makes word-SET similarity uninformative
# (measured: random-pair word-set jaccard median 0.63).
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS
SIM_BITS = 60
SIM_BANDS = 4
SIM_BAND_BITS = SIM_BITS // SIM_BANDS  # 15
MINHASH_JACCARD_T = 0.35

# Connected-components driver fast path (r18): edge sets at or below
# this size run the exact union-find on the driver (one bounded
# collect, ~16 bytes/edge — ~2 MB at the default) instead of the
# O(diameter) distributed fixpoint. The gate is a SIZE test, not a
# cluster test: affected-/increment-sized graphs stay under it at any
# corpus scale, corpus-wide graphs exceed it and run distributed.
# Broadcast-join-sized by design; override via env for tuning.
LABEL_PROP_DRIVER_MAX_EDGES = int(
    os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES", "131072")
)
NGRAM_JACCARD_T = 0.3
SIMHASH_MAX_HAMMING = 12

# seeded permutation constants, shared verbatim with the oracle SQL
_rng = np.random.default_rng(20240813)
MINHASH_A = [int(a) for a in _rng.integers(1, P31, size=N_HASHES)]
MINHASH_B = [int(b) for b in _rng.integers(0, P31, size=N_HASHES)]


def _docs(spark: SparkSession, docs_path: str | None = None) -> DataFrame:
    """The dedup corpus: the duplicate-injected fixture by default
    (contract queries), or an explicit parquet path (CLI --input —
    ADVICE r13: the subcommands must operate on the user's corpus)."""
    from gis_etl_spark.io import read_parquet_cached

    return read_parquet_cached(spark, docs_path or ensure_documents_aug())


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _doc_words(df: DataFrame) -> DataFrame:
    """doc_id + exploded DISTINCT words (set semantics for Jaccard)."""
    return df.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), " +"))).alias("w"),
    )


def _doc_shingles(df: DataFrame) -> DataFrame:
    """doc_id + exploded DISTINCT word-trigram shingles — the MinHash
    feature set (order-sensitive; word sets are uninformative on a
    narrow vocabulary)."""
    return (
        df.select("doc_id", F.split(F.trim("text"), " +").alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    # guard size<3: Spark's sequence(0, -1) yields a
                    # DESCENDING range, not an empty array
                    F.when(
                        F.size("ws") >= 3,
                        F.expr(
                            "transform(sequence(0, size(ws) - 3), "
                            "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                )
            ).alias("w"),
        )
    )


def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groups with >1 member → (hash,
    n_copies, keep_id). One hash-shuffle; at 100 TB this is the
    standard first pass before any fuzzy method."""
    return (
        _docs(spark)
        .groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("content_hash")
    )


def dedup_exact_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving document ids after exact dedup (keep = min doc_id
    per content hash) — dropDuplicates with a deterministic keeper."""
    docs = _docs(spark)
    w = Window.partitionBy(F.md5(F.col("text")))
    return (
        docs.withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "lang", "source")
    )


def _minhash_signatures(df: DataFrame) -> DataFrame:
    """doc_id → m0..m{k-1} minhash columns (shingle-set MinHash)."""
    words = _doc_shingles(df).withColumn("h", _h60(F.col("w")) % P31)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % P31).alias(f"m{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return words.groupBy("doc_id").agg(*aggs)


def minhash_signature_narrow(df: DataFrame) -> DataFrame:
    """doc_id → m0..m{k-1} minhash columns computed PER ROW with array
    higher-order functions — the same integers as _minhash_signatures
    (same shingles, same h60, same (a·h+b) mod P31 permutations; a·h <
    2^62 so int64 never overflows) but fully STATELESS: no groupBy
    anywhere, so a structured stream can compute signatures without
    burning its one stateful-operator budget (signature-groupBy +
    bucket-groupBy would be two chained stateful aggs, which Spark
    rejects without time windows — and per-doc signature state would
    grow with |docs| forever).

    Batch keeps _minhash_signatures: HOF lambdas evaluate interpreted
    (outside whole-stage codegen) and measured 7× slower per CPU at 62k
    docs, while the explode variant's groupBy combines map-side to ~one
    row per doc before its shuffle — explode+partial-agg is the right
    BATCH plan; this is the right STREAM plan. Parity is test-pinned
    bit-for-bit. Docs with fewer than 3 tokens have no shingles and are
    dropped — identical to the explode variant, where they produce no
    rows to group."""
    staged = _shingle_hashes(df)
    sigs = [
        F.array_min(
            F.expr(f"transform(hs, h -> ({a}L * h + {b}L) % {P31})")
        ).alias(f"m{j}")
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return staged.select("doc_id", *sigs)


def _shingle_hashes(df: DataFrame) -> DataFrame:
    """doc_id → hs: array<bigint> of DISTINCT shingle hashes (h60 %
    P31), all JVM-side so md5 stays bit-identical to the batch chain.
    Docs with <3 tokens have no shingles and are dropped. Shared by
    both stateless signature stages."""
    sh = F.when(
        F.size("ws") >= 3,
        F.array_distinct(
            F.expr(
                "transform(sequence(0, size(ws) - 3), "
                "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select("doc_id", F.split(F.trim("text"), " +").alias("ws"))
        .select("doc_id", sh.alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.expr(
                "transform(sh, w -> cast(conv(substring(md5(w), 1, 15), "
                f"16, 10) AS BIGINT) % {P31})"
            ).alias("hs"),
        )
    )


def minhash_signature_arrow(df: DataFrame) -> DataFrame:
    """doc_id → m0..m{k-1} minhash columns — the FULLY-VECTORIZED
    stateless stage: ONE mapInPandas hop does shingling, md5 hashing
    AND all 16 permutation lanes. Bit-equal to
    minhash_signature_narrow / _minhash_signatures / the DuckDB oracle:
    same ' +'-split tokens of the space-trimmed text, same word-trigram
    shingles, same h60 = int(md5_hex[:15], 16) % P31 (hashlib.md5 over
    UTF-8 == Spark md5 == DuckDB md5), same (a·h+b) mod P31 lanes
    (a, h < 2^31 ⇒ no int64 overflow; both operands nonnegative ⇒
    numpy % == SQL %), same <3-token drop.

    Why hashlib and not the JVM expression chain: the per-shingle
    `transform(sh, w -> conv(substring(md5(w),1,15),16,10) % P)` is a
    CodegenFallback higher-order function — measured ~20 µs per
    shingle (9.2 s of the 10.3 s batch wall at 50k docs; r9 blamed the
    16 lane traversals, but the shingle HASHING was the bottleneck —
    sig_narrow and the r9 half-Arrow form profiled within 2% of each
    other). hashlib.md5 on short byte strings runs ~1 µs, and the lane
    math is one (a·H+b) % P broadcast plus a segmented
    np.minimum.reduceat per lane. A per-batch text→hashes memo also
    collapses repeated documents — precisely the duplicate-heavy
    traffic a dedup stream exists to absorb.

    Stream-legal: mapInPandas is stateless, so a structured stream's
    one stateful-operator budget stays free for the bucket store."""
    import re
    from hashlib import md5 as _md5

    import pandas as pd

    a_vec = np.asarray(MINHASH_A, dtype=np.int64)
    b_vec = np.asarray(MINHASH_B, dtype=np.int64)
    out_schema = "doc_id long, " + ", ".join(
        f"m{j} long" for j in range(N_HASHES)
    )
    split = re.compile(" +").split

    def _doc_hashes(text: str) -> np.ndarray:
        # Spark F.trim strips SPACES only — match with strip(' ')
        ws = split(text.strip(" "))
        if len(ws) < 3:
            return _EMPTY_I64
        sh = {
            " ".join(ws[i : i + 3]): None for i in range(len(ws) - 2)
        }
        return np.fromiter(
            (
                int(_md5(s.encode("utf-8")).hexdigest()[:15], 16) % P31
                for s in sh
            ),
            dtype=np.int64,
            count=len(sh),
        )

    def _lanes(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            memo: dict[str, np.ndarray] = {}
            ids, segs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL text has no shingles — same drop as the JVM
                # path's size(sh) > 0 filter (split(trim(NULL)) → NULL)
                if not isinstance(text, str):
                    continue
                hs = memo.get(text)
                if hs is None:
                    hs = _doc_hashes(text)
                    memo[text] = hs
                if len(hs):
                    ids.append(doc_id)
                    segs.append(hs)
            if not ids:
                continue
            lens = np.fromiter(
                (len(s) for s in segs), dtype=np.int64, count=len(segs)
            )
            hs_all = np.concatenate(segs)
            starts = np.concatenate(
                ([0], np.cumsum(lens[:-1], dtype=np.int64))
            )
            out = {"doc_id": np.asarray(ids, dtype=np.int64)}
            for j in range(N_HASHES):
                perm = (a_vec[j] * hs_all + b_vec[j]) % P31
                out[f"m{j}"] = np.minimum.reduceat(perm, starts)
            yield pd.DataFrame(out)

    return df.select("doc_id", "text").mapInPandas(
        _lanes, schema=out_schema
    )


_EMPTY_I64 = np.empty(0, dtype=np.int64)


def incremental_stage_arrow(df: DataFrame) -> DataFrame:
    """The stateless per-document stage of the STREAMING incremental
    dedup twin, one vectorized mapInPandas hop per arriving doc:
    (doc_id, fph = md5 hex of the text — hashlib over UTF-8 ==
    Spark/DuckDB md5, hs = distinct trigram-shingle h60%P31 hashes,
    m0..m{k-1} minhash lanes). Shingles/hashing/lanes are bit-equal
    to minhash_signature_arrow (same ' +'-split of the space-trimmed
    text, same h60 % P31, same (a·h+b) mod P31); docs with <3 tokens
    emit hs = [] and NULL lanes (they can still be exact duplicates);
    NULL text emits nothing (md5(NULL) is NULL in the batch chain —
    joins never match it).

    The shingle set travels as int64 HASHES, not strings: the
    streaming twin carries this array through its 8-band explode and
    intersects it per candidate, and the hash array is ~3× smaller
    and ~5× cheaper to intersect (profiled: the string-array verify
    was 10 of the twin's 16 s). Set equality to the string-set
    Jaccard holds absent 60-bit collisions (P ≈ n²·2⁻⁶⁰ — the same
    tolerance every h60 consumer in this module accepts)."""
    import re
    from hashlib import md5 as _md5

    import pandas as pd

    a_vec = np.asarray(MINHASH_A, dtype=np.int64)
    b_vec = np.asarray(MINHASH_B, dtype=np.int64)
    out_schema = (
        "doc_id long, fph string, hs array<long>, "
        + ", ".join(f"m{j} long" for j in range(N_HASHES))
    )
    split = re.compile(" +").split

    def _stage(batches):
        # Columnar assembly (VERDICT r12): per-doc work is only the
        # string shingling + md5 hashing (memoized per distinct text);
        # the 16 minhash lanes compute batch-wide via ONE
        # concatenate-segments + np.minimum.reduceat pass per lane —
        # the same segmented form as minhash_signature_arrow — and the
        # output is a dict-of-arrays DataFrame, never list-of-dicts.
        for pdf in batches:
            if not len(pdf):
                continue
            ids: list[int] = []
            fphs: list[str] = []
            hs_lists: list[list[int]] = []
            row_seg: list[int] = []   # per kept row: segment idx | -1
            segs: list[np.ndarray] = []  # one per DISTINCT shingled text
            memo: dict[str, tuple] = {}  # text -> (fph, uh, seg_idx)
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):
                    continue
                hit = memo.get(text)
                if hit is None:
                    fph = _md5(text.encode("utf-8")).hexdigest()
                    ws = split(text.strip(" "))
                    sh = (
                        list(
                            {
                                " ".join(ws[i : i + 3]): None
                                for i in range(len(ws) - 2)
                            }
                        )
                        if len(ws) >= 3
                        else []
                    )
                    if sh:
                        hs = np.fromiter(
                            (
                                int(
                                    _md5(s.encode("utf-8")).hexdigest()[:15],
                                    16,
                                )
                                % P31
                                for s in sh
                            ),
                            dtype=np.int64,
                            count=len(sh),
                        )
                        # np.unique: hs is a SET (array_intersect and
                        # size() both assume distinct elements); the
                        # lane min is unchanged by the dedup
                        uh = np.unique(hs)
                        seg_idx = len(segs)
                        segs.append(uh)
                    else:
                        uh, seg_idx = _EMPTY_I64, -1
                    hit = (fph, uh.tolist(), seg_idx)
                    memo[text] = hit
                fph, hs_list, seg_idx = hit
                ids.append(doc_id)
                fphs.append(fph)
                hs_lists.append(hs_list)
                row_seg.append(seg_idx)
            if not ids:
                continue
            n = len(ids)
            out = {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "fph": fphs,
                "hs": hs_lists,
            }
            seg_of_row = np.asarray(row_seg, dtype=np.int64)
            mask = seg_of_row < 0  # True = no shingles -> NULL lanes
            gather = np.where(mask, 0, seg_of_row)
            if segs:
                lens = np.fromiter(
                    (len(s) for s in segs), dtype=np.int64, count=len(segs)
                )
                hs_all = np.concatenate(segs)
                starts = np.concatenate(
                    ([0], np.cumsum(lens[:-1], dtype=np.int64))
                )
                for j in range(N_HASHES):
                    perm = (a_vec[j] * hs_all + b_vec[j]) % P31
                    mins = np.minimum.reduceat(perm, starts)
                    out[f"m{j}"] = pd.arrays.IntegerArray(
                        mins[gather], mask.copy()
                    )
            else:
                for j in range(N_HASHES):
                    out[f"m{j}"] = pd.arrays.IntegerArray(
                        np.zeros(n, dtype=np.int64), np.ones(n, dtype=bool)
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "text").mapInPandas(_stage, schema=out_schema)


def _band_keys(sig: DataFrame) -> DataFrame:
    """Signature → (doc_id, band_idx, band_key) exploded."""
    bands = []
    for b in range(N_BANDS):
        cols = [
            F.col(f"m{j}").cast("string")
            for j in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)
        ]
        bands.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws(",", *cols)).alias("band_key"),
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_key")


def minhash_candidates(df: DataFrame) -> DataFrame:
    """LSH candidate pairs: docs sharing any band bucket (a < b)."""
    bk = _band_keys(_minhash_signatures(df))
    left = bk.alias("l")
    right = bk.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _exact_jaccard(df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Shingle-set Jaccard for candidate pairs via a shared-item join.

    The shingle frame feeds three subtrees (sizes + both pair sides)
    and each lazily re-runs the explode over df. Measured r18:
    checkpointing it once LOST to the recompute at sf0.1 (1.67 s vs
    1.55 s fresh floor on dedup_minhash_pairs) — the explode reads a
    narrow text column and codegens cheaply, while the materialization
    writes the ~100× inflated shingle rows. Deliberately left lazy."""
    words = _doc_shingles(df)
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("nw"))
    wa = words.select(F.col("doc_id").alias("doc_a"), "w")
    wb = words.select(F.col("doc_id").alias("doc_b"), "w")
    inter = (
        pairs.join(wa, "doc_a")
        .join(wb, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("nw", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("nw", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
    )


def dedup_minhash_pairs(
    spark: SparkSession, sf_dir: str, docs_path: str | None = None
) -> DataFrame:
    """MinHash+LSH near-dup detection, exact-verified: trigram shingles
    → minhash signatures → band buckets → candidates → shingle Jaccard
    ≥ 0.35. Output is a subset of dedup_ngram_jaccard_pairs (LSH recall
    < 1 by design); the oracle runs the identical pipeline."""
    docs = _docs(spark, docs_path)
    pairs = minhash_candidates(docs)
    return (
        _exact_jaccard(docs, pairs)
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .orderBy("doc_a", "doc_b")
    )


def fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination — the MinHash rendition of
    decontaminate_overlap for eval items that were paraphrased, not
    copied, into the corpus (the case the exact 5-gram audit misses;
    standard practice in pretraining data recipes alongside the exact
    n-gram pass).

    Semantics: eval set = doc_id % EVAL_MOD == 0 over the dedup fixture
    (whose injected near-duplicates play the paraphrased-leak role);
    emit every (corpus doc, eval doc) pair sharing a MinHash band
    bucket whose EXACT trigram-shingle Jaccard ≥ MINHASH_JACCARD_T.

    Plan shape vs dedup_minhash_pairs: the same signature/band chain,
    but the band join is BIPARTITE — corpus band keys equi-join the
    BROADCAST eval side (eval sets are small by construction), so at
    100 TB the corpus never self-joins and never shuffles: candidates
    are a map-side broadcast probe, and only the shortlist pays the
    exact-Jaccard verify. The oracle replays the identical chain
    (signatures, banding, verify) in SQL, so the hash match pins
    candidate generation, not just the verified survivors."""
    from gis_etl_spark.ops.text import EVAL_MOD

    docs = _docs(spark)
    bk = _band_keys(_minhash_signatures(docs))
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    ev = bk.filter(is_eval).select(
        F.col("doc_id").alias("eval_id"), "band_idx", "band_key"
    )
    corp = bk.filter(~is_eval)
    pairs = (
        corp.join(F.broadcast(ev), ["band_idx", "band_key"])
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("eval_id").alias("doc_b"),
        )
        .distinct()
    )
    return (
        _exact_jaccard(docs, pairs)
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select(
            F.col("doc_a").alias("doc_id"),
            F.col("doc_b").alias("eval_id"),
            "jaccard",
        )
        .orderBy("doc_id", "eval_id")
    )


# Incremental-dedup snapshot split: the 'new crawl' increment is
# doc_id % INC_MOD == INC_NEW_REM (25%); everything else is the
# persisted corpus snapshot.
INC_MOD = 4
INC_NEW_REM = 3


def incremental_dedup_pairs(
    spark: SparkSession, sf_dir: str, docs_path: str | None = None
) -> DataFrame:
    """Bipartite incremental dedup — the production shape for 'dedup
    the new crawl against the existing corpus' (VERDICT r11 item 6):
    the snapshot side exists as two persisted artifacts (a
    doc_fingerprints table and a MinHash band-key/signature table, the
    exact frames doc_fingerprints/dedup_minhash_pairs already verify),
    and the new increment NEVER self-joins and never re-shingles
    history:

    1. exact pass: new-side content fingerprints probe the stored
       fingerprint table → (new_id, snap_id, 'exact', 1.0) for every
       byte-identical hit; these docs drop at ingest and skip stage 2;
    2. fuzzy pass: the surviving new docs' band keys probe the stored
       band table (same trigram-shingle MinHash chain as
       dedup_minhash_pairs, bucketed bipartite instead of self-join);
       candidates pay the exact trigram-Jaccard verify ≥
       {MINHASH_JACCARD_T} → (new_id, snap_id, 'fuzzy', jaccard).

    Output: (new_id, snap_id, kind, jaccard), one row per detected
    duplicate pair, ordered. Fixture split: new = doc_id % INC_MOD ==
    INC_NEW_REM over the dedup corpus (injected near-duplicates play
    the recrawl role); both snapshot artifacts are derived in-plan
    here — in production they are stored tables, bucketed by
    content_hash / (band_idx, band_key), so both probes are
    co-located joins (SCALE.md §r12).

    100 TB posture: the increment is small relative to the snapshot,
    so BOTH probes broadcast the NEW side and stream the snapshot
    scan map-side — the mirror image of fuzzy_decontaminate's
    broadcast-eval design; history is never shuffled, and only the
    shortlist pays the verify join. The oracle replays the identical
    chain (fingerprints, signatures, banding, exclusion of exact hits
    from the fuzzy probe, verify) so the hash match pins candidate
    generation end-to-end."""
    docs = _docs(spark, docs_path)
    is_new = F.col("doc_id") % INC_MOD == INC_NEW_REM

    fp = docs.select("doc_id", F.md5("text").alias("fph"))
    new_fp = fp.filter(is_new).select(
        F.col("doc_id").alias("new_id"), "fph"
    )
    exact = (
        fp.filter(~is_new)
        .join(F.broadcast(new_fp), "fph")
        .select(
            "new_id",
            F.col("doc_id").alias("snap_id"),
            F.lit("exact").alias("kind"),
            F.lit(1.0).alias("jaccard"),
        )
    )

    # bk feeds both probe sides (new_b and the snapshot side of cands);
    # measured r18: checkpointing it LOST to the lazy recompute at
    # sf0.1 (2.23 s vs 2.00 s fresh floor — the eager job costs more
    # than re-running the signature chain over this corpus), so the
    # double derivation is deliberately kept lazy; the production-scale
    # form of "derive once" is the STORED band table the _stored
    # variant probes.
    bk = _band_keys(_minhash_signatures(docs))
    new_b = (
        bk.filter(is_new)
        .join(
            exact.select(F.col("new_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        .select(F.col("doc_id").alias("new_id"), "band_idx", "band_key")
    )
    cands = (
        bk.filter(~is_new)
        .join(F.broadcast(new_b), ["band_idx", "band_key"])
        .select(
            F.col("new_id").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
        )
        .distinct()
    )
    fuzzy = (
        _exact_jaccard(docs, cands)
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select(
            F.col("doc_a").alias("new_id"),
            F.col("doc_b").alias("snap_id"),
            F.lit("fuzzy").alias("kind"),
            "jaccard",
        )
    )
    return exact.unionByName(fuzzy).orderBy("new_id", "snap_id")


DEDUP_SNAP_BUCKETS = 8


def dedup_snapshot_tables(
    docs_path: str | None = None, scope: str = "incsplit"
) -> dict[str, str]:
    """Catalog names of the PERSISTED snapshot-side dedup artifacts,
    keyed by the corpus file fingerprint (mtime+size — the
    ivfpq/bm25/flags table contract) and the snapshot SCOPE
    ('incsplit' = the contract fixture's history side, doc_id %
    {INC_MOD} != {INC_NEW_REM}; 'full' = the whole corpus is history —
    the CLI posture, where increments arrive later via
    append_to_dedup_snapshot): content fingerprints, band keys,
    distinct shingles, shingle-set sizes, per-doc quality composites,
    and component labels. These are the tables the incremental probes,
    the displacement-risk monitor, and the targeted re-derive read in
    production instead of re-deriving history per increment."""
    import os
    from hashlib import md5

    path = docs_path or ensure_documents_aug()
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size, scope)
    except OSError:
        key = (path, scope)
    fp = md5(repr(key).encode()).hexdigest()[:10]
    return {
        "fingerprints": f"dedup_snap_fp_{fp}",
        "bands": f"dedup_snap_bands_{fp}",
        "shingles": f"dedup_snap_sh_{fp}",
        "sizes": f"dedup_snap_sz_{fp}",
        # r17 (VERDICT r16 item 1): per-doc quality composites and
        # component labels, persisted so the displacement-risk monitor
        # and the targeted re-derive PROBE history instead of
        # re-deriving its pair graph + qualities in-plan — the
        # bm25_stats pattern applied to the snapshot's two remaining
        # in-plan history artifacts.
        "quality": f"dedup_snap_q_{fp}",
        "members": f"dedup_snap_mb_{fp}",
        # r18 (ADVICE r17 high + guide §2.3/§6): per-doc (source, n,
        # pii_hits), persisted so the targeted re-derive serves its
        # base-side attributes from a column-pruned bucketed scan
        # instead of a full corpus TEXT scan — and so docs whose text
        # lives only in prior increments (not documents.parquet) are
        # never silently dropped from the keeper argmax.
        "attrs": f"dedup_snap_at_{fp}",
    }


def _snapshot_frames(docs: DataFrame) -> dict[str, DataFrame]:
    """The per-doc snapshot artifacts for a corpus frame — one shared
    derivation for the initial build and the per-batch append. The
    component/member table is NOT here: membership depends on the pair
    graph, so build and append derive it separately (build: the
    snapshot-side verified pairs; append: intra-batch pairs under the
    frozen-history posture — see append_to_dedup_snapshot)."""
    from gis_etl_spark.ops.text import (
        STOPWORDS,
        pii_hits_col,
        pii_planted_txt,
        quality_score_from_counts,
        words_col,
    )

    sh = _doc_shingles(docs)
    w = words_col(F.col("text"))
    return {
        "fingerprints": docs.select(
            "doc_id", F.md5("text").alias("fph")
        ),
        "bands": _band_keys(_minhash_signatures(docs)),
        "shingles": sh,
        "sizes": sh.groupBy("doc_id").agg(F.count("*").alias("nw")),
        # quality composite per doc — byte-identical to the funnel's
        # gate (quality_score_from_counts over (n, nd, nstop); the
        # _flag_count_cols hash contract), persisted so the risk
        # monitor compares increment vs history qualities without a
        # history text scan
        "quality": docs.select(
            "doc_id",
            quality_score_from_counts(
                F.size(w),
                F.size(F.array_distinct(w)),
                F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))),
            ).alias("quality_score"),
        ),
        # per-doc funnel attributes (r18): the remediation's base-side
        # inputs, byte-identical to _flag_count_cols' n and the shared
        # planted-text PII gate — stored so no consumer ever re-scans
        # history text for them
        "attrs": docs.select(
            "doc_id",
            "source",
            F.size(w).cast("long").alias("n"),
            pii_hits_col(pii_planted_txt()).alias("pii_hits"),
        ),
    }


_SNAP_BUCKET_COLS = {
    "fingerprints": ("fph",),
    "bands": ("band_idx", "band_key"),
    "shingles": ("w",),
    "sizes": ("doc_id",),
    "quality": ("doc_id",),
    "members": ("doc_id",),
    "attrs": ("doc_id",),
}


def _members_with_keepers(
    labels: DataFrame, quality: DataFrame
) -> DataFrame:
    """(doc_id, component, keeper_id) from component labels + the
    per-doc quality frame — the keeper argmax is ONE
    groupBy(component) max(struct(quality, -doc_id)) (the
    _member_keepers shape), joined back on component."""
    member = labels.join(quality, "doc_id")
    keep = (
        member.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col("quality_score").alias("q"),
                    (-F.col("doc_id")).alias("nid"),
                )
            ).alias("k")
        )
        .select("component", (-F.col("k.nid")).alias("keeper_id"))
    )
    return member.join(keep, "component").select(
        "doc_id", "component", "keeper_id"
    )


def _snapshot_member_labels(
    spark: SparkSession,
    sf_dir: str,
    docs_path: str | None,
    scope: str,
    quality: DataFrame,
) -> DataFrame:
    """(doc_id, component, keeper_id) over the SNAPSHOT side's verified
    near-dup pair graph — the member labels build_dedup_snapshot
    persists. Verified MinHash pairs are a pairwise property (band
    collision + exact Jaccard of the two shingle sets), so the snapshot
    subset's edges are exactly the full corpus's session-memoized edge
    set (_verified_pair_edges) filtered to snapshot endpoints; the
    fixpoint then runs over that filtered edge set once, AT BUILD TIME
    — the whole point of storing the labels is that monitors and
    targeted re-derives never rerun it."""
    if scope == "incsplit":
        edges = _verified_pair_edges(spark, sf_dir, docs_path).filter(
            (F.col("doc_a") % INC_MOD != INC_NEW_REM)
            & (F.col("doc_b") % INC_MOD != INC_NEW_REM)
        )
        labels = label_components(edges)
    else:
        # full scope: the snapshot side IS the whole corpus, so the
        # labels are the session-memoized fixpoint result
        labels = _component_labels(spark, sf_dir, docs_path)
    return _members_with_keepers(labels, quality)


def _require_unique_batch(new_docs: DataFrame, op: str) -> None:
    """Intra-batch uniqueness guard shared by the append rungs (ADVICE
    r16): the stored-id guards only compare the batch against the
    STORED tables, so a batch carrying the same doc_id twice would
    append duplicated artifact/posting/flag rows — the exact
    double-count corruption class those guards block. ONE aggregate
    job over the (batch-sized) increment."""
    n_rows, n_ids = new_docs.agg(
        F.count("*"), F.count_distinct("doc_id")
    ).first()
    if n_rows != n_ids:
        raise ValueError(
            f"{op}: increment holds {n_rows} rows but only {n_ids} "
            "distinct doc_id(s); duplicated ids within one batch would "
            "append duplicated rows. dropDuplicates('doc_id') upstream "
            "or re-ingest under unique ids."
        )


def build_dedup_snapshot(
    spark: SparkSession,
    sf_dir: str,
    docs_path: str | None = None,
    scope: str = "incsplit",
) -> dict[str, str]:
    """Build + persist the snapshot-side dedup index ONCE — the
    build→probe→append ladder (build_ivfpq_index / build_bm25_index)
    applied to the incremental-dedup story, making the
    'in production the snapshot artifacts are stored tables' posture
    of incremental_dedup_pairs real instead of narrated. Snapshot =
    the incremental split's history side (doc_id % {INC_MOD} !=
    {INC_NEW_REM}); each table is bucketed on its probe key
    (fingerprints by fph, bands by (band_idx, band_key), shingles by
    w, sizes by doc_id) so snapshot-side joins co-locate without a
    shuffle at any corpus size. Idempotent per corpus fingerprint.

    Scale: one derivation pass over history, after which every
    increment pays only broadcast probes of these tables —
    incremental_dedup_pairs_stored is hash-pinned equal to the
    in-plan rung (same oracle), and append_to_dedup_snapshot grows
    history by appending, never recomputing. scope='full' snapshots
    the WHOLE corpus (the CLI posture) instead of the fixture's
    history side."""
    names = dedup_snapshot_tables(docs_path, scope)
    existing = [t for t in names.values() if spark.catalog.tableExists(t)]
    if len(existing) == len(names):
        return names
    if existing:
        # PARTIAL existence (ADVICE r17 medium): a durable warehouse
        # built by an older engine version has the old roles but not
        # the new ones. Rebuilding "the missing ones" from the base
        # corpus is impossible for tables whose rows cover previously
        # APPENDED increments (their text is not in the base corpus),
        # and silently dropping + rebuilding ALL tables would destroy
        # every appended increment's artifacts while reporting success
        # — the exact rebuild-and-wipe class the durable catalog
        # exists to prevent. Refuse loudly; the operator chooses when
        # to rebuild and must re-ingest increments afterwards.
        missing = sorted(set(names.values()) - set(existing))
        raise ValueError(
            "build_dedup_snapshot: snapshot is PARTIAL — "
            f"{len(existing)}/{len(names)} tables exist but "
            f"{missing} are missing (engine upgrade added new snapshot "
            "roles?). Refusing to rebuild implicitly: that would wipe "
            "every previously appended increment's artifacts. DROP the "
            f"existing tables ({sorted(existing)}) and rebuild "
            "explicitly, then re-ingest increments."
        )
    import os as _os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    if wh.scheme in ("", "file") and wh.path:
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            loc = _os.path.join(wh.path, t.lower())
            if _os.path.exists(loc):
                shutil.rmtree(loc, ignore_errors=True)

    snap = _docs(spark, docs_path)
    if scope == "incsplit":
        snap = snap.filter(F.col("doc_id") % INC_MOD != INC_NEW_REM)
    frames = dict(_snapshot_frames(snap))
    frames["members"] = _snapshot_member_labels(
        spark, sf_dir, docs_path, scope, frames["quality"]
    )
    for role, frame in frames.items():
        (
            frame.write.mode("overwrite")
            .bucketBy(DEDUP_SNAP_BUCKETS, *_SNAP_BUCKET_COLS[role])
            .saveAsTable(names[role])
        )
    return names


def append_to_dedup_snapshot(
    spark: SparkSession,
    sf_dir: str,
    new_docs: DataFrame,
    docs_path: str | None = None,
    scope: str = "incsplit",
) -> dict[str, str]:
    """Fold an ingested batch into the stored snapshot so the NEXT
    increment's probes see it — the cheap maintenance rung: derive the
    batch's artifact frames (batch-sized work only — the intra-batch
    component labels included; see the frozen-history note below) and append
    them under the same bucket specs. No stats freeze is involved
    (fingerprints/bands/shingles are per-doc, not corpus-relative), so
    unlike the BM25 delta there is no staleness to monitor — appending
    IS the exact maintenance operation, receipt-tested: a doc
    duplicated across two batches is detected by the second batch's
    probe purely through the rows the first batch appended.

    Precondition, ENFORCED (r16 review — the append_to_bm25_index
    guard applied to its sibling rungs): the batch must be NEW
    doc_ids. A re-appended batch would duplicate artifact rows, and
    duplicated shingle rows double the Jaccard intersection count
    while `sizes` keeps the true set size — the verify can then
    exceed 1.0 and falsely cross the threshold. The guard broadcasts
    the batch's id set over one column-pruned scan of the stored
    fingerprint table (every doc has a fingerprint row; `sizes` would
    miss sub-3-token docs). ALSO enforced (ADVICE r16): the batch must
    be unique WITHIN itself — a doc_id appearing twice in one batch
    slips past the stored-id guard yet appends the same duplicated
    shingle rows the guard exists to block."""
    names = build_dedup_snapshot(spark, sf_dir, docs_path, scope)
    _require_unique_batch(new_docs, "append_to_dedup_snapshot")
    new_ids = new_docs.select("doc_id").distinct()
    n_dup = (
        spark.table(names["fingerprints"])
        .select("doc_id")
        .join(F.broadcast(new_ids), "doc_id", "left_semi")
        .select("doc_id")
        .distinct()
        .count()
    )
    if n_dup:
        raise ValueError(
            f"append_to_dedup_snapshot: {n_dup} doc_id(s) of the batch "
            f"already have snapshot artifacts in {names['fingerprints']};"
            " re-appending would corrupt the stored Jaccard verify."
            " Re-ingest under new ids, or rebuild the snapshot."
        )
    # Monotone-id guard (ADVICE r17 low): the keeper argmax breaks
    # quality TIES by smaller doc_id, and the risk monitor's risky
    # channel fires only on strictly-higher quality — a new doc whose
    # quality exactly ties an incumbent's and whose id is SMALLER
    # would win a full re-derive without firing any channel. The
    # fixture increments satisfy id-monotonicity structurally; CLI
    # batches must too, enforced here (one column-pruned max over the
    # stored fingerprint table vs the batch's min).
    hi = spark.table(names["fingerprints"]).agg(F.max("doc_id")).first()[0]
    lo = new_docs.agg(F.min("doc_id")).first()[0]
    if hi is not None and lo is not None and lo <= hi:
        raise ValueError(
            f"append_to_dedup_snapshot: batch min doc_id {lo} does not "
            f"exceed the stored max doc_id {hi}; increment ids must be "
            "monotonically larger than all stored ids (quality ties "
            "break by smaller id, so a smaller-id recrawl could win "
            "keepership without firing the displacement-risk monitor)."
        )
    batch = new_docs.select("doc_id", "text", "source")
    frames = dict(_snapshot_frames(batch))
    # Component labels for the batch come from its INTRA-batch verified
    # pairs only — the frozen-history posture: a batch doc that also
    # matches history keeps its intra-batch label rather than merging
    # into history's component. For the risk monitor this errs
    # CONSERVATIVE — a later increment matching both sides sees two
    # distinct components and fires the bridging channel (an over-,
    # never an under-detection: two truly distinct components are never
    # stored under one label). Exact linkage is the re-derive's job.
    intra = (
        _exact_jaccard(batch, minhash_candidates(batch))
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select("doc_a", "doc_b")
    )
    frames["members"] = _members_with_keepers(
        label_components(intra), frames["quality"]
    )
    for role, frame in frames.items():
        (
            frame.write.mode("append")
            .bucketBy(DEDUP_SNAP_BUCKETS, *_SNAP_BUCKET_COLS[role])
            .saveAsTable(names[role])
        )
    return names


def incremental_dedup_pairs_stored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """incremental_dedup_pairs served from the PERSISTED snapshot
    tables — registered against the SAME oracle as the in-plan rung,
    so the hash match pins stored artifacts == fresh derivation (the
    bm25_topk_stored equality-proof pattern): exact pass probes the
    stored fingerprint table, the fuzzy pass probes the stored band
    table and pays the Jaccard verify against the stored shingle and
    size tables; only the increment's side is derived in-plan.

    Scale: the increment's fingerprints, band keys, and shingles
    broadcast; history is touched only via column-pruned scans of the
    bucketed tables (and snapshot-side joins would co-locate
    bucket-to-bucket if the broadcast were infeasible — the r12
    SMJ-without-exchange receipt)."""
    names = build_dedup_snapshot(spark, sf_dir)
    docs = _docs(spark, None)
    new = docs.filter(F.col("doc_id") % INC_MOD == INC_NEW_REM).select(
        "doc_id", "text"
    )
    return _stored_bipartite_pairs(spark, names, new).orderBy(
        "new_id", "snap_id"
    )


def _stored_bipartite_pairs(
    spark: SparkSession, names: dict[str, str], new: DataFrame
) -> DataFrame:
    """(new_id, snap_id, kind, jaccard) for `new` docs probed against
    the STORED snapshot tables — the serving core shared by
    incremental_dedup_pairs_stored (ordered contract output) and the
    incremental curation-flags path (which collapses it to displaced
    ids).

    Self-match guard (ADVICE r16): a probe doc whose OWN artifacts
    already sit in the snapshot (a mis-ordered operator extended the
    snapshot before flagging the batch) would exactly match its own
    fingerprint row and silently displace the whole batch; pairs with
    new_id == snap_id are excluded on both arms, and the flags path
    additionally refuses such batches loudly
    (ops.corpus.increment_curation_flags)."""
    fp_new = new.select(F.col("doc_id").alias("new_id"), F.md5("text").alias("fph"))
    exact = (
        spark.table(names["fingerprints"])
        .join(F.broadcast(fp_new), "fph")
        .filter(F.col("new_id") != F.col("doc_id"))
        .select(
            "new_id",
            F.col("doc_id").alias("snap_id"),
            F.lit("exact").alias("kind"),
            F.lit(1.0).alias("jaccard"),
        )
    )

    # new_clean feeds the signature chain AND both shingle consumers,
    # and its lineage contains the exact-probe broadcast join —
    # materialize it (increment-sized) so each consumer rescans rows
    # instead of re-probing the fingerprints table (guide §2.4)
    new_clean = new.join(
        exact.select(F.col("new_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    ).localCheckpoint()
    bk_new = _band_keys(_minhash_signatures(new_clean)).select(
        F.col("doc_id").alias("new_id"), "band_idx", "band_key"
    )
    cands = (
        spark.table(names["bands"])
        .join(F.broadcast(bk_new), ["band_idx", "band_key"])
        .filter(F.col("new_id") != F.col("doc_id"))
        .select(
            F.col("new_id").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # the increment's shingle explode is consumed twice (intersection
    # join + the na size agg) — one materialization, two rescans
    wa = (
        _doc_shingles(new_clean)
        .select(F.col("doc_id").alias("doc_a"), "w")
        .localCheckpoint()
    )
    wb = spark.table(names["shingles"]).select(
        F.col("doc_id").alias("doc_b"), "w"
    )
    inter = (
        cands.join(wa, "doc_a")
        .join(wb, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    na = (
        wa.groupBy("doc_a").agg(F.count("*").alias("na"))
    )
    nb = spark.table(names["sizes"]).select(
        F.col("doc_id").alias("doc_b"), F.col("nw").alias("nb")
    )
    fuzzy = (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select(
            F.col("doc_a").alias("new_id"),
            F.col("doc_b").alias("snap_id"),
            F.lit("fuzzy").alias("kind"),
            "jaccard",
        )
    )
    return exact.unionByName(fuzzy)


def bipartite_dup_new_ids(snap: DataFrame, new: DataFrame) -> DataFrame:
    """The generalized bipartite probe at the heart of
    incremental_dedup_pairs, returning just the displaced side: ids of
    `new` docs with an EXACT (content fingerprint) or VERIFIED FUZZY
    (band probe + trigram Jaccard ≥ {MINHASH_JACCARD_T}) duplicate in
    the `snap` corpus — (doc_id) distinct. Consumed by the incremental
    curation-flags path (ops.corpus.increment_curation_flags), where
    'has any duplicate in frozen history' decides the near_dedup stage
    flag of an arriving document.

    Scale: the new side is the small increment — its fingerprints and
    band keys BROADCAST over the snapshot scans (in production the
    snapshot sides are the stored fingerprint/band tables, bucketed,
    so both probes are co-located); only the band shortlist pays the
    exact-Jaccard verify. History is never shuffled."""
    return (
        bipartite_dup_pairs(snap, new)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )


def bipartite_dup_pairs(snap: DataFrame, new: DataFrame) -> DataFrame:
    """The pair-level bipartite probe under bipartite_dup_new_ids:
    (new_id, snap_id, kind) for every detected duplicate relation of a
    `new` doc against the `snap` corpus — 'exact' (content
    fingerprint; such docs skip the band probe, the
    incremental_dedup_pairs staging) or 'fuzzy' (band candidate +
    trigram Jaccard ≥ {MINHASH_JACCARD_T}). Consumed pairwise by the
    displacement-risk monitor (ops.corpus.flags_increment_risk), which
    needs to compare qualities ACROSS each pair, and collapsed to ids
    by the flags path."""
    fp_n = new.select(
        F.col("doc_id").alias("new_id"), F.md5("text").alias("fph")
    )
    exact = (
        snap.select(F.col("doc_id").alias("snap_id"), F.md5("text").alias("fph"))
        .join(F.broadcast(fp_n), "fph")
        .filter(F.col("new_id") != F.col("snap_id"))
        .select("new_id", "snap_id")
        .distinct()
    )
    new_clean = new.join(
        exact.select(F.col("new_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    bk_n = (
        _band_keys(_minhash_signatures(new_clean))
        .select(F.col("doc_id").alias("new_id"), "band_idx", "band_key")
    )
    cands = (
        _band_keys(_minhash_signatures(snap))
        .join(F.broadcast(bk_n), ["band_idx", "band_key"])
        .filter(F.col("new_id") != F.col("doc_id"))
        .select(
            F.col("new_id").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
        )
        .distinct()
    )
    fuzzy = (
        _exact_jaccard(
            snap.select("doc_id", "text").unionByName(
                new_clean.select("doc_id", "text")
            ),
            cands,
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select(
            F.col("doc_a").alias("new_id"),
            F.col("doc_b").alias("snap_id"),
        )
        .distinct()
    )
    return exact.withColumn("kind", F.lit("exact")).unionByName(
        fuzzy.withColumn("kind", F.lit("fuzzy"))
    )


def incremental_dedup_pairs_sql(src: str) -> str:
    """SQL replay of incremental_dedup_pairs: same fingerprint split,
    same shingle/signature/band CTE chain (shared prefix), same
    exact-hit exclusion before the bipartite band probe, same rounded
    Jaccard threshold."""
    return f"""
        WITH {_minhash_prefix_sql(src)}, fp AS (
          SELECT doc_id, md5(text) AS fph FROM {src}
        ), exact AS (
          SELECT n.doc_id AS new_id, s.doc_id AS snap_id
          FROM fp n JOIN fp s USING (fph)
          WHERE n.doc_id % {INC_MOD} = {INC_NEW_REM}
            AND s.doc_id % {INC_MOD} != {INC_NEW_REM}
        ), cands AS (
          SELECT DISTINCT n.doc_id AS new_id, s.doc_id AS snap_id
          FROM bands n JOIN bands s
            ON n.band_idx = s.band_idx AND n.band_key = s.band_key
          WHERE n.doc_id % {INC_MOD} = {INC_NEW_REM}
            AND s.doc_id % {INC_MOD} != {INC_NEW_REM}
            AND n.doc_id NOT IN (SELECT new_id FROM exact)
        ), sizes AS (
          SELECT doc_id, count(*) AS nw FROM dw GROUP BY doc_id
        ), inter AS (
          SELECT c.new_id, c.snap_id, count(*) AS inter
          FROM cands c
          JOIN dw a ON a.doc_id = c.new_id
          JOIN dw b ON b.doc_id = c.snap_id AND b.w = a.w
          GROUP BY c.new_id, c.snap_id
        ), fuzzy AS (
          SELECT i.new_id, i.snap_id,
                 round(i.inter * 1.0 / (sa.nw + sb.nw - i.inter), 4)
                   AS jaccard
          FROM inter i
          JOIN sizes sa ON sa.doc_id = i.new_id
          JOIN sizes sb ON sb.doc_id = i.snap_id
          -- rounded threshold, matching the engine filter (see
          -- minhash_pairs_sql)
          WHERE round(i.inter * 1.0 / (sa.nw + sb.nw - i.inter), 4)
                >= {MINHASH_JACCARD_T}
        )
        SELECT new_id, snap_id, 'exact' AS kind, 1.0 AS jaccard
        FROM exact
        UNION ALL
        SELECT new_id, snap_id, 'fuzzy' AS kind, jaccard FROM fuzzy
        ORDER BY new_id, snap_id
    """


def label_components(pairs: DataFrame) -> DataFrame:
    """Connected components over an undirected pair graph — min-label
    propagation iterated to FIXPOINT with a driver loop (the kmeans_fit
    discipline): each iteration is one equi-join + partial/final
    min-agg, lineage truncated per iteration via localCheckpoint so the
    plan never grows; the loop exits on a changed-count of zero, so
    the result is the exact transitive closure independent of the
    iteration schedule. Shared by near-dup cluster assembly
    (dedup_components) and spatial clustering (geo_spatial_clusters).

    Input: (doc_a, doc_b) pairs, one row per undirected edge.
    Output: (doc_id, component = min id reachable), one row per node
    that appears in any pair.

    Small-graph fast path (r18, guide §1.2 step 1 — the distributed
    algorithm first): the edge frame is materialized ONCE
    (localCheckpoint) and counted; at or below
    {LABEL_PROP_DRIVER_MAX_EDGES} edges (env
    SPARK_GRAFT_CC_DRIVER_EDGES; ~2 MB of longs at the default) the
    exact union-find runs on the driver — 3 bounded jobs total instead
    of O(diameter) join+agg rounds — and the result comes back as a
    local relation. This is the broadcast-join smallness test applied
    to the fixpoint: increment/affected-sized graphs (the remediation,
    intra-batch linkage, spatial clusters) stay under it at ANY corpus
    scale by construction, while corpus-wide pair graphs exceed it and
    take the distributed fixpoint unchanged. Both paths compute the
    identical exact transitive closure (oracle-pinned)."""
    spark = pairs.sparkSession
    undirected = pairs.select("doc_a", "doc_b").localCheckpoint()
    if (
        undirected.limit(LABEL_PROP_DRIVER_MAX_EDGES + 1).count()
        <= LABEL_PROP_DRIVER_MAX_EDGES
    ):
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in undirected.collect():
            a, b = row[0], row[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        dtype = dict(pairs.dtypes)["doc_a"]
        return spark.createDataFrame(
            [(n, find(n)) for n in sorted(parent)],
            f"doc_id {dtype}, component {dtype}",
        )
    pairs = undirected
    # edges are pre-partitioned on the iteration's join key (doc_b)
    # BEFORE the checkpoint: the localCheckpoint preserves the hash
    # partitioning, so the per-iteration join re-shuffles only the
    # labels side — the (static) edge frame never crosses the network
    # again (guide §2.4: two operations keyed the same way share one
    # exchange).
    edges = (
        pairs.select("doc_a", "doc_b")
        .union(
            pairs.select(
                F.col("doc_b").alias("doc_a"),
                F.col("doc_a").alias("doc_b"),
            )
        )
        .repartition("doc_b")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc_id")).distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    # labels decrease monotonically per node, so the fixpoint test is
    # 'label sum unchanged' — one cheap aggregate over the freshly
    # checkpointed frame instead of the old self-join diff count
    # (halves the per-iteration work; matters on deep single-linkage
    # chains where the loop runs O(graph diameter) rounds)
    total = labels.agg(F.sum("component")).collect()[0][0]
    while True:
        # one pass per iteration (r18, guide §2.3/§2.4): propagate
        # each node's label across its edges and fold the node's own
        # label back in through a UNION + min-agg — 2 exchanges
        # (labels into the join, the groupBy) instead of the previous
        # join + groupBy + second labels join (3). min(own ∪
        # neighbors') is exactly the old least(component,
        # coalesce(nbr_min)) — nodes with no surviving neighbor rows
        # keep their label through the union arm.
        prop = edges.join(
            labels.withColumnRenamed("doc_id", "doc_b"), "doc_b"
        ).select(F.col("doc_a").alias("doc_id"), "component")
        labels = (
            prop.unionByName(labels)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        new_total = labels.agg(F.sum("component")).collect()[0][0]
        if new_total == total:
            break
        total = new_total
    return labels


_STAR_ROUNDS = {"last": 0}  # observability for tests/benchmarks


def label_components_stars(pairs: DataFrame) -> DataFrame:
    """Connected components by ALTERNATING STAR CONTRACTION (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii 2014: "Connected
    Components in MapReduce and Beyond", two-phase alternating
    algorithm) — the long-chain answer to label_components' O(diameter)
    rounds: large-star hangs every strictly-larger neighbor off the
    minimum of each neighborhood, small-star re-hangs the smaller ones,
    and the edge set contracts toward per-component stars in
    O(log n) alternations regardless of diameter.

    Per round: two groupBy-min + join passes over the edge frame, each
    localCheckpointed (flat lineage); convergence = the canonical edge
    set stopped changing (count + endpoint sums — exact, since star
    contraction is monotone). Output schema matches label_components:
    (doc_id, component = min id of the component)."""

    def canon(e: DataFrame) -> DataFrame:
        return e.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v")).distinct()

    def both_dirs(e: DataFrame) -> DataFrame:
        return e.unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def star(e: DataFrame, large: bool) -> DataFrame:
        """One star operation over canonical edges e."""
        d = both_dirs(e)
        m = (
            d.groupBy("u")
            .agg(F.min("v").alias("nmin"))
            .select(
                "u", F.least(F.col("u"), F.col("nmin")).alias("m")
            )
        )
        dm = d.join(m, "u")
        if large:
            out = dm.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            out = dm.filter(F.col("v") <= F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            ).unionAll(m.select("u", F.col("m").alias("v")))
        return canon(out)

    edges = canon(
        pairs.select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        )
    ).localCheckpoint()

    def fingerprint(e: DataFrame) -> tuple:
        # (count, sum u, sum v) alone can collide across distinct edge
        # sets (e.g. {(1,4),(2,3)} vs {(1,3),(2,4)}) and small-star can
        # inject new edges mid-run, so the triple is not monotone; the
        # order-independent sum of a 64-bit edge hash makes a collision
        # that also matches count+sums astronomically unlikely, at the
        # cost of one extra agg column in the same pass.
        r = e.agg(
            F.count("*"),
            F.sum("u"),
            F.sum("v"),
            # decimal(38,0): full-range int64 hashes overflow a long
            # sum under ANSI mode; decimal headroom covers 10^19 edges
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        ).collect()[0]
        return (r[0], r[1], r[2], r[3])

    fp = fingerprint(edges)
    rounds = 0
    while True:
        rounds += 1
        edges = star(star(edges, large=True), large=False).localCheckpoint()
        new_fp = fingerprint(edges)
        if new_fp == fp:
            break
        fp = new_fp
    _STAR_ROUNDS["last"] = rounds

    # converged: edges are per-component stars rooted at the min id
    d = both_dirs(edges)
    labels = (
        d.groupBy("u")
        .agg(F.min("v").alias("nmin"))
        .select(
            F.col("u").alias("doc_id"),
            F.least(F.col("u"), F.col("nmin")).alias("component"),
        )
    )
    return labels


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER assembly: connected components over the
    MinHash near-dup pair graph — the step between pair detection and
    actual dedup (keep one doc per component, not one per pair; pair
    lists double-count transitive duplicates A~B~C).

    Spark shape: min-label propagation iterated to FIXPOINT with a
    driver loop (the kmeans_fit discipline): each iteration is one
    equi-join + partial/final min-agg, lineage truncated per iteration
    via localCheckpoint so the plan never grows. Converges in
    O(component diameter) iterations — near-dup clusters are shallow
    (diameter ≤ a few), and the loop exits on a changed-count of zero,
    so the result equals the exact transitive closure the oracle's
    recursive CTE computes, independent of iteration schedule.

    Output: one row per doc appearing in any pair — (doc_id,
    component = min doc_id of its cluster, n_members, is_kept)."""
    # same edge set as _verified_pair_edges (dedup_minhash_pairs
    # modulo its ordering, which label propagation ignores) — serve
    # the labels from the session memo
    labels = _component_labels(spark, sf_dir)
    sizes = labels.groupBy("component").agg(
        F.count("*").alias("n_members")
    )
    return (
        labels.join(sizes, "component")
        .select(
            "doc_id",
            "component",
            "n_members",
            (F.col("doc_id") == F.col("component")).alias("is_kept"),
        )
        .orderBy("doc_id")
    )


# Session memo for the verified near-dup pair EDGE set — the pair
# graph is the shared upstream of components/keepers/cluster-stats,
# and in production it is a materialized table consumed by every
# policy pass, not recomputed per consumer. Keyed by the augmented
# corpus fingerprint (path+mtime+size, the similarity-cache contract);
# the value is a localCheckpointed frame, so the whole MinHash chain
# runs once per session per corpus.
_PAIR_EDGE_CACHE: dict[tuple, DataFrame] = {}


def _verified_pair_edges(
    spark: SparkSession, sf_dir: str, docs_path: str | None = None
) -> DataFrame:
    import os as _os

    path = docs_path or ensure_documents_aug()
    # Keyed by (corpus fingerprint, applicationId): a localCheckpoint
    # belongs to ITS SparkContext — after a stop()/recreate cycle in
    # the same process (sequential CLI runs, test session churn) a
    # fingerprint-only key would hand back a frame whose checkpoint
    # blocks died with the old context (ADVICE r13). A new app id
    # misses and rebuilds; stale entries for dead contexts are evicted
    # so their checkpoint storage isn't pinned by the module global.
    app_id = spark.sparkContext.applicationId
    try:
        st = _os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size, app_id)
    except OSError:
        key = (path, app_id)
    cached = _PAIR_EDGE_CACHE.get(key)
    if cached is None:
        for k in [k for k in _PAIR_EDGE_CACHE if k[-1] != app_id]:
            del _PAIR_EDGE_CACHE[k]
        cached = (
            dedup_minhash_pairs(spark, sf_dir, docs_path)
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        _PAIR_EDGE_CACHE[key] = cached
    return cached


# Session memo for the COMPONENT LABELS over the verified pair edges —
# the _PAIR_EDGE_CACHE discipline one level up (r18, guide §1.2 step 1:
# don't recompute what a consumer chain shares): the label fixpoint is
# a driver loop of ~3 jobs per round, and five consumers (keeper
# policy, cluster stats, component assembly, the funnel's flags, the
# corpus writer) each re-ran it per call. Same keying/eviction as the
# edge cache; the stored snapshot's `members` table is the durable,
# cross-process form of the same artifact.
_COMPONENT_LABEL_CACHE: dict[tuple, DataFrame] = {}


def _component_labels(
    spark: SparkSession, sf_dir: str, docs_path: str | None = None
) -> DataFrame:
    """(doc_id, component) over _verified_pair_edges, fixpoint run once
    per session per corpus fingerprint and localCheckpointed."""
    import os as _os

    path = docs_path or ensure_documents_aug()
    app_id = spark.sparkContext.applicationId
    try:
        st = _os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size, app_id)
    except OSError:
        key = (path, app_id)
    cached = _COMPONENT_LABEL_CACHE.get(key)
    if cached is None:
        for k in [k for k in _COMPONENT_LABEL_CACHE if k[-1] != app_id]:
            del _COMPONENT_LABEL_CACHE[k]
        # label_components' result is already localCheckpointed at
        # loop exit — no second checkpoint needed
        cached = label_components(
            _verified_pair_edges(spark, sf_dir, docs_path)
        )
        _COMPONENT_LABEL_CACHE[key] = cached
    return cached


def dedup_canonical_keepers(
    spark: SparkSession, sf_dir: str, docs_path: str | None = None
) -> DataFrame:
    """Canonical-representative selection per near-dup cluster — the
    'which copy survives' policy step between cluster assembly
    (dedup_components) and the corpus write: instead of the min-id
    keeper, keep each cluster's HIGHEST-QUALITY member (rounded
    quality_score from ops.text.text_quality_scores; ties → smaller
    doc_id). A crawl usually holds the same article as a clean
    original and several boilerplate-wrapped recrawls — min-id keeps
    whichever was crawled first; this keeps the best one.

    Output: one row per doc appearing in any verified near-dup pair —
    (doc_id, component, quality_score, keeper_id, is_kept), ordered.

    Scale: component labels from the fixpoint min-label propagation;
    quality is a map-side expression; the keeper argmax is ONE
    groupBy(component) with max(struct(quality, -doc_id)) — map-side
    partial agg, the CDC max(struct) shape, no window over members —
    and the keeper table (|components| rows) joins back on component.
    The oracle replays the exact transitive closure (recursive CTE),
    the quality twin, and a one-window argmax.

    Corpus note: quality is computed over the SAME augmented dedup
    fixture (_docs) the pair graph comes from — the injected
    duplicates need scores too — with expressions identical to
    text_quality_scores / its SQL twin (quality_score_cte_sql)."""
    return (
        _member_keepers(spark, sf_dir, docs_path)
        .select(
            "doc_id",
            "component",
            "quality_score",
            "keeper_id",
            (F.col("doc_id") == F.col("keeper_id")).alias("is_kept"),
        )
        .orderBy("doc_id")
    )


def _member_keepers(
    spark: SparkSession, sf_dir: str, docs_path: str | None = None
) -> DataFrame:
    """(doc_id, component, quality_score, keeper_id) for every doc in
    a verified near-dup pair — the shared core of the keeper policy
    (dedup_canonical_keepers) and its application (dedup_apply_keepers
    / apply_keepers_corpus). No ordering: consumers add their own."""
    from gis_etl_spark.ops.text import (
        STOPWORDS,
        quality_score_from_counts,
        words_col,
    )

    docs = _docs(spark, docs_path)
    labels = _component_labels(spark, sf_dir, docs_path)
    w = words_col(F.col("text"))
    staged = docs.select(
        "doc_id",
        F.size(w).alias("n"),
        F.size(F.array_distinct(w)).alias("nd"),
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).alias("nstop"),
    )
    q = staged.select(
        "doc_id",
        quality_score_from_counts(
            F.col("n"), F.col("nd"), F.col("nstop")
        ).alias("quality_score"),
    )
    member = labels.join(q, "doc_id")
    keep = (
        member.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col("quality_score").alias("q"),
                    (-F.col("doc_id")).alias("nid"),
                )
            ).alias("k")
        )
        .select("component", (-F.col("k.nid")).alias("keeper_id"))
    )
    return member.join(keep, "component").select(
        "doc_id", "component", "quality_score", "keeper_id"
    )


def apply_keepers_corpus(
    spark: SparkSession, sf_dir: str, docs_path: str | None = None
) -> DataFrame:
    """The corpus a canonical-keeper dedup run actually WRITES: every
    document that is not a displaced cluster member (singletons — docs
    in no verified pair — survive untouched; within each near-dup
    cluster only the keeper survives). One left-anti join of the
    corpus against the |members − components|-row non-keeper id table;
    at 100 TB the id table is small enough to broadcast and the corpus
    never reshuffles. Schema == input corpus schema."""
    docs = _docs(spark, docs_path)
    non_keepers = (
        _member_keepers(spark, sf_dir, docs_path)
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id")
    )
    return docs.join(F.broadcast(non_keepers), "doc_id", "left_anti")


def dedup_apply_keepers(
    spark: SparkSession, sf_dir: str, docs_path: str | None = None
) -> DataFrame:
    """Canonical-keeper dedup APPLIED end-to-end (VERDICT r13 item 1):
    the before/after data-card delta of materializing the keeper-only
    corpus — the rollup a 100 TB dedup run publishes next to the
    corpus it writes. Per source: docs/tokens before, docs/tokens
    after dropping every non-keeper cluster member, and the removed
    deltas.

    Plan: ONE pass over the corpus — per-doc (source, token count)
    projection, left join against the broadcast non-keeper id table
    (|members − components| rows), one map-side-combined conditional
    rollup by source. The corpus itself is written by
    apply_keepers_corpus (CLI: `canonical-dedup --write-survivors`);
    this query is its audit, sharing the same non-keeper set.

    Oracle: recursive-CTE transitive closure + the quality argmax +
    the same left-join rollup, all ANSI."""
    from gis_etl_spark.ops.text import words_col

    docs = _docs(spark, docs_path)
    non_keepers = (
        _member_keepers(spark, sf_dir, docs_path)
        .filter(F.col("doc_id") != F.col("keeper_id"))
        .select("doc_id", F.lit(True).alias("removed"))
    )
    per = docs.select(
        "doc_id", "source", F.size(words_col(F.col("text"))).alias("n")
    )
    keep = F.col("removed").isNull()
    return (
        per.join(F.broadcast(non_keepers), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs_before"),
            F.sum("n").alias("n_tokens_before"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_docs_after"),
            F.sum(F.when(keep, F.col("n")).otherwise(0)).alias(
                "n_tokens_after"
            ),
            F.sum(F.when(keep, 0).otherwise(1)).alias("n_docs_removed"),
            F.sum(F.when(keep, 0).otherwise(F.col("n"))).alias(
                "n_tokens_removed"
            ),
        )
        .orderBy("source")
    )


def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE HISTOGRAM — the observability rollup a
    curator reads before choosing a dedup policy: per cluster size,
    how many clusters exist, how many docs they hold, and how many of
    those are redundant (docs − clusters: what any keep-one policy
    deletes). A corpus dominated by size-2 clusters wants pair-level
    dedup; a fat tail of mega-clusters signals boilerplate that span-
    level dedup should catch first.

    Output: (n_members, n_clusters, n_docs, n_redundant), ordered by
    size. Singleton docs (in no verified pair) are deliberately
    absent — the histogram describes the DUPLICATE mass; total corpus
    size lives in source_data_card.

    Scale: components from the fixpoint propagation; then two
    map-side-combined aggregations (component → size, size →
    histogram). Nothing touches text after the pair graph."""
    labels = _component_labels(spark, sf_dir)
    sizes = labels.groupBy("component").agg(
        F.count("*").alias("n_members")
    )
    return (
        sizes.groupBy("n_members")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "n_members",
            "n_clusters",
            (F.col("n_members") * F.col("n_clusters")).alias("n_docs"),
            (
                (F.col("n_members") - 1) * F.col("n_clusters")
            ).alias("n_redundant"),
        )
        .orderBy("n_members")
    )


def _simhash(df: DataFrame) -> DataFrame:
    """60-bit SimHash over word counts (Charikar '02): bit i of the
    signature = sign of Σ_w cnt_w · (2·bit_i(h60(w)) − 1)."""
    wc = (
        df.select(
            "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", _h60(F.col("w")))
    )
    bit_sums = [
        F.sum(
            F.col("cnt")
            * (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{i}")
        for i in range(SIM_BITS)
    ]
    sums = wc.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(SIM_BITS):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast(
            "long"
        )
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.alias("simhash"))


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 15-bit band buckets → Hamming ≤ 12."""
    docs = _docs(spark)
    sig = _simhash(docs)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("simhash"), b * SIM_BAND_BITS)
                        .bitwiseAND(F.lit((1 << SIM_BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for b in range(SIM_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    l, r = bands.alias("l"), bands.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sim_a"),
            F.col("r.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cands.select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram shingle Jaccard: pairs sharing ≥ 3 shingles,
    Jaccard ≥ 0.3 — the order-sensitive complement to word-set MinHash
    (reordered text keeps word sets but destroys shingles)."""
    docs = _docs(spark)
    # guard size<3: Spark's sequence(0, -1) yields a DESCENDING range,
    # not an empty array — short docs must produce zero shingles
    shingled = (
        docs.select(
            "doc_id", F.split(F.trim("text"), " +").alias("ws")
        )
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.when(
                        F.size("ws") >= 3,
                        F.expr(
                            "transform(sequence(0, size(ws) - 3), "
                            "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                )
            ).alias("sh"),
        )
    )
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("ns"))
    sa = shingled.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = shingled.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        sa.join(sb, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
        .filter(F.col("inter") >= 3)
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("ns", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("ns", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= NGRAM_JACCARD_T)
        .orderBy("doc_a", "doc_b")
    )


# --- oracle SQL -------------------------------------------------------------


LEAKAGE_N_SPLITS = 10  # train/val/test bucketing granularity


def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split assignment — the step a
    training pipeline runs after near-dup detection: hash-bucket
    documents into LEAKAGE_N_SPLITS splits BY NEAR-DUP COMPONENT
    (every member of a duplicate cluster shares its component's
    bucket), so a paraphrase of a training document can never land in
    the eval split. Naive per-document hashing leaks by construction —
    the output audits both schemes side by side.

    Output, one row per split: (split_id, n_docs, n_components,
    leaky_pairs, leaky_pairs_naive) where leaky_pairs counts verified
    near-dup pairs straddling split boundaries under the component
    scheme (0 by construction — the audit PROVES the property) and
    leaky_pairs_naive counts the same pairs under per-doc hashing
    (nonzero: the leaks the component scheme prevents). A straddling
    pair is attributed to its doc_a (min-id) side's split.

    Scale: component labels come from the fixpoint min-label
    propagation (one equi-join + partial agg per round); split
    assignment is a map-side md5 expression; the audits join the
    (tiny, already-shortlisted) verified pair set against the split
    map. Nothing here is heavier than the dedup pass that precedes it
    in any real pipeline."""
    docs = _docs(spark).select("doc_id")
    # the verified pair set and its component labels are EXACTLY the
    # frames _verified_pair_edges/_component_labels memoize for the
    # keeper/cluster/funnel consumers (same _docs corpus, same chain,
    # already localCheckpointed) — re-deriving the MinHash chain and
    # re-running the fixpoint per call was this query's whole wall
    pairs = _verified_pair_edges(spark, sf_dir)
    comp = _component_labels(spark, sf_dir)
    n = LEAKAGE_N_SPLITS
    assigned = (
        docs.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
        .select(
            "doc_id",
            "component",
            (_h60(F.col("component").cast("string")) % n).alias(
                "split_id"
            ),
            (_h60(F.col("doc_id").cast("string")) % n).alias(
                "naive_split"
            ),
        )
    )
    per_split = assigned.groupBy("split_id").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("component").alias("n_components"),
    )
    sa = assigned.select(
        F.col("doc_id").alias("doc_a"),
        F.col("split_id").alias("sa"),
        F.col("naive_split").alias("na"),
    )
    sb = assigned.select(
        F.col("doc_id").alias("doc_b"),
        F.col("split_id").alias("sb"),
        F.col("naive_split").alias("nb"),
    )
    pj = pairs.join(sa, "doc_a").join(sb, "doc_b")
    comp_leaks = (
        pj.filter(F.col("sa") != F.col("sb"))
        .groupBy(F.col("sa").alias("split_id"))
        .agg(F.count("*").alias("leaky_pairs"))
    )
    naive_leaks = (
        pj.filter(F.col("na") != F.col("nb"))
        .groupBy(F.col("na").alias("split_id"))
        .agg(F.count("*").alias("leaky_pairs_naive"))
    )
    return (
        per_split.join(comp_leaks, "split_id", "left")
        .join(naive_leaks, "split_id", "left")
        .select(
            "split_id",
            "n_docs",
            "n_components",
            F.coalesce("leaky_pairs", F.lit(0)).alias("leaky_pairs"),
            F.coalesce("leaky_pairs_naive", F.lit(0)).alias(
                "leaky_pairs_naive"
            ),
        )
        .orderBy("split_id")
    )


def leakage_safe_splits_sql(src: str) -> str:
    """SQL replay of leakage_safe_splits: the dedup_components
    recursive-CTE transitive closure (exact, schedule-independent —
    the fixpoint twin's proven oracle form) + the same md5-derived
    split buckets and pair audits."""
    n = LEAKAGE_N_SPLITS
    return f"""
        WITH RECURSIVE
        p AS (SELECT doc_a, doc_b FROM ({minhash_pairs_sql(src)}) mh),
        e AS (SELECT doc_a AS u, doc_b AS v FROM p
              UNION ALL
              SELECT doc_b, doc_a FROM p),
        reach(u, v) AS (
          SELECT u, v FROM e
          UNION
          SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v
        ),
        comp AS (
          SELECT u AS doc_id, least(u, min(v)) AS component
          FROM reach GROUP BY u
        ),
        assigned AS (
          SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
          FROM {src} d LEFT JOIN comp c ON c.doc_id = d.doc_id
        ),
        s AS (
          SELECT doc_id, component,
                 {h60_sql("component::VARCHAR")} % {n} AS split_id,
                 {h60_sql("doc_id::VARCHAR")} % {n} AS naive_split
          FROM assigned
        ),
        per AS (
          SELECT split_id, count(*) AS n_docs,
                 count(DISTINCT component) AS n_components
          FROM s GROUP BY split_id
        ),
        pj AS (
          SELECT a.split_id AS sa, b.split_id AS sb,
                 a.naive_split AS na, b.naive_split AS nb
          FROM p JOIN s a ON a.doc_id = p.doc_a
                 JOIN s b ON b.doc_id = p.doc_b
        ),
        cs AS (SELECT sa AS split_id, count(*) AS lk
               FROM pj WHERE sa != sb GROUP BY sa),
        ns AS (SELECT na AS split_id, count(*) AS lkn
               FROM pj WHERE na != nb GROUP BY na)
        SELECT per.split_id, per.n_docs, per.n_components,
               coalesce(cs.lk, 0)::BIGINT AS leaky_pairs,
               coalesce(ns.lkn, 0)::BIGINT AS leaky_pairs_naive
        FROM per LEFT JOIN cs USING (split_id)
                 LEFT JOIN ns USING (split_id)
        ORDER BY per.split_id
    """


def _minhash_prefix_sql(src: str) -> str:
    """The shared ws0→dw→hashed→sig→bands CTE chain (shingles,
    signatures, band keys) over `src` — the common head of the
    self-join (minhash_pairs_sql) and bipartite (fuzzy_decontaminate)
    oracles.

    dw = distinct trigram shingles (1-based DuckDB lists: i..i+2 for
    i in 1..len-2 matches Spark's 0-based i..i+2 for i in 0..size-3).
    """
    h = h60_sql("w")
    minhash_cols = ", ".join(
        f"min(({a} * (h % {P31}) + {b}) % {P31}) AS m{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_rows = []
    for b in range(N_BANDS):
        cols = "||','||".join(
            f"m{j}::VARCHAR"
            for j in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_key FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_rows)
    return f"""ws0 AS (
          SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS ww
          FROM {src}
        ), dw AS (
          SELECT DISTINCT doc_id,
                 ww[i] || ' ' || ww[i+1] || ' ' || ww[i+2] AS w
          FROM ws0, unnest(range(1, greatest(len(ww) - 1, 1))) AS t(i)
        ), hashed AS (
          SELECT doc_id, {h} AS h FROM dw
        ), sig AS (
          SELECT doc_id, {minhash_cols} FROM hashed GROUP BY doc_id
        ), bands AS (
          {bands_sql}
        )"""


def minhash_pairs_sql(src: str) -> str:
    """The full MinHash+LSH verified-pairs pipeline as one SQL string
    over `src` (any relation producing doc_id, text) — parameterized so
    composition queries (training_data_prep) run the identical chain on
    a filtered survivor set. Nested-WITH-safe: wrap in parentheses as a
    subquery or CTE body."""
    return f"""
        WITH {_minhash_prefix_sql(src)}, cands AS (
          SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
          FROM bands l JOIN bands r
            ON l.band_idx = r.band_idx AND l.band_key = r.band_key
           AND l.doc_id < r.doc_id
        ), sizes AS (
          SELECT doc_id, count(*) AS nw FROM dw GROUP BY doc_id
        ), inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS inter
          FROM cands c
          JOIN dw a ON a.doc_id = c.doc_a
          JOIN dw b ON b.doc_id = c.doc_b AND b.w = a.w
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT i.doc_a, i.doc_b,
               round(i.inter * 1.0 / (sa.nw + sb.nw - i.inter), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        -- threshold on the ROUNDED value, exactly as the engine
        -- filters its round(...,4) jaccard column: an unrounded WHERE
        -- here diverges for true ratios in [T-5e-5, T) (ADVICE-class
        -- boundary parity; DuckDB and Spark round half-away identically)
        WHERE round(i.inter * 1.0 / (sa.nw + sb.nw - i.inter), 4)
              >= {MINHASH_JACCARD_T}
        ORDER BY i.doc_a, i.doc_b
    """


def fuzzy_decontaminate_sql(src: str) -> str:
    """The bipartite (corpus × eval) rendition of minhash_pairs_sql —
    the exact SQL replay of fuzzy_decontaminate's chain: same shingle/
    signature/band CTEs, candidates restricted to corpus-side docs
    sharing a band bucket with an eval-side doc, same exact-Jaccard
    verify and threshold. A hash match therefore pins the bipartite
    candidate generation, not just the survivors."""
    from gis_etl_spark.ops.text import EVAL_MOD

    return f"""
        WITH {_minhash_prefix_sql(src)}, cands AS (
          SELECT DISTINCT r.doc_id AS doc_id, l.doc_id AS eval_id
          FROM bands l JOIN bands r
            ON l.band_idx = r.band_idx AND l.band_key = r.band_key
          WHERE l.doc_id % {EVAL_MOD} = 0 AND r.doc_id % {EVAL_MOD} != 0
        ), sizes AS (
          SELECT doc_id, count(*) AS nw FROM dw GROUP BY doc_id
        ), inter AS (
          SELECT c.doc_id, c.eval_id, count(*) AS inter
          FROM cands c
          JOIN dw a ON a.doc_id = c.doc_id
          JOIN dw b ON b.doc_id = c.eval_id AND b.w = a.w
          GROUP BY c.doc_id, c.eval_id
        )
        SELECT i.doc_id, i.eval_id,
               round(i.inter * 1.0 / (sa.nw + sb.nw - i.inter), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_id
        JOIN sizes sb ON sb.doc_id = i.eval_id
        -- rounded threshold, matching the engine filter (see
        -- minhash_pairs_sql)
        WHERE round(i.inter * 1.0 / (sa.nw + sb.nw - i.inter), 4)
              >= {MINHASH_JACCARD_T}
        ORDER BY i.doc_id, i.eval_id
    """


def oracle_sqls() -> dict[str, str]:
    path = ensure_documents_aug()
    d = f"read_parquet('{path}')"
    h = h60_sql("w")
    minhash_common = minhash_pairs_sql(d)
    from gis_etl_spark.ops.text import WORDS_SQL as _words_sql
    from gis_etl_spark.ops.text import quality_score_cte_sql

    _quality_cte = quality_score_cte_sql(d)

    bit_sums = ", ".join(
        f"sum(cnt * (((h >> {i}) & 1) * 2 - 1)) AS s{i}"
        for i in range(SIM_BITS)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN 1::BIGINT ELSE 0 END << {i})"
        for i in range(SIM_BITS)
    )
    sim_bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_idx, "
        f"(simhash >> {b * SIM_BAND_BITS}) & {(1 << SIM_BAND_BITS) - 1} "
        f"AS band_val FROM sig"
        for b in range(SIM_BANDS)
    )
    simhash_sql = f"""
        WITH wc AS (
          SELECT doc_id, w, count(*) AS cnt, {h} AS h
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), ' +')) AS w
                FROM {d})
          GROUP BY doc_id, w
        ), sums AS (
          SELECT doc_id, {bit_sums} FROM wc GROUP BY doc_id
        ), sig AS (
          SELECT doc_id, ({sim_expr}) AS simhash FROM sums
        ), bands AS (
          {sim_bands}
        ), cands AS (
          SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                 l.simhash AS sim_a, r.simhash AS sim_b
          FROM bands l JOIN bands r
            ON l.band_idx = r.band_idx AND l.band_val = r.band_val
           AND l.doc_id < r.doc_id
        )
        SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
        FROM cands
        WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_MAX_HAMMING}
        ORDER BY doc_a, doc_b
    """

    # DuckDB lists are 1-based: shingle i uses ws[i], ws[i+1], ws[i+2]
    # for i in 1..len-2, matching Spark's 0-based i in 0..size-3.
    ngram_sql = f"""
        WITH ws AS (
          SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
          FROM {d}
        ), sh AS (
          SELECT DISTINCT doc_id,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
          FROM ws, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)
        ), sizes AS (
          SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 3
        )
        SELECT i.doc_a, i.doc_b,
               round(i.inter * 1.0 / (sa.ns + sb.ns - i.inter), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE round(i.inter * 1.0 / (sa.ns + sb.ns - i.inter), 4)
              >= {NGRAM_JACCARD_T}
        ORDER BY i.doc_a, i.doc_b
    """

    return {
        "dedup_exact_groups": f"""
            SELECT md5(text) AS content_hash, count(*) AS n_copies,
                   min(doc_id) AS keep_id
            FROM {d} GROUP BY 1 HAVING count(*) > 1 ORDER BY 1
        """,
        "dedup_exact_kept": f"""
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
              FROM {d}
            ) WHERE doc_id = keep_id
        """,
        "dedup_minhash_pairs": minhash_common,
        "fuzzy_decontaminate": fuzzy_decontaminate_sql(d),
        "incremental_dedup_pairs": incremental_dedup_pairs_sql(d),
        "leakage_safe_splits": leakage_safe_splits_sql(d),
        # exact transitive closure over the same pair graph — equals
        # Spark's fixpoint-converged min-label propagation
        "dedup_components": f"""
            WITH RECURSIVE
            p AS (SELECT doc_a, doc_b FROM ({minhash_common}) mh),
            e AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION ALL
                  SELECT doc_b, doc_a FROM p),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v
            ),
            comp AS (
              SELECT u AS doc_id, least(u, min(v)) AS component
              FROM reach GROUP BY u
            )
            SELECT doc_id, component,
                   count(*) OVER (PARTITION BY component) AS n_members,
                   doc_id = component AS is_kept
            FROM comp ORDER BY doc_id
        """,
        "dedup_simhash_pairs": simhash_sql,
        "dedup_ngram_jaccard_pairs": ngram_sql,
        # same transitive closure + the text quality twin + a one-
        # window argmax (quality DESC, doc_id ASC) — the keeper policy
        "dedup_canonical_keepers": f"""
            WITH RECURSIVE
            p AS (SELECT doc_a, doc_b FROM ({minhash_common}) mh),
            e AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION ALL
                  SELECT doc_b, doc_a FROM p),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v
            ),
            comp AS (
              SELECT u AS doc_id, least(u, min(v)) AS component
              FROM reach GROUP BY u
            ),
            q AS {_quality_cte},
            member AS (
              SELECT c.doc_id, c.component, q.quality_score
              FROM comp c JOIN q USING (doc_id)
            ),
            keep AS (
              SELECT component, doc_id AS keeper_id FROM (
                SELECT component, doc_id,
                       row_number() OVER (
                         PARTITION BY component
                         ORDER BY quality_score DESC, doc_id ASC) AS rk
                FROM member
              ) WHERE rk = 1
            )
            SELECT m.doc_id, m.component, m.quality_score, k.keeper_id,
                   m.doc_id = k.keeper_id AS is_kept
            FROM member m JOIN keep k USING (component)
            ORDER BY m.doc_id
        """,
        # same closure → per-component sizes → size histogram
        "dedup_cluster_stats": f"""
            WITH RECURSIVE
            p AS (SELECT doc_a, doc_b FROM ({minhash_common}) mh),
            e AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION ALL
                  SELECT doc_b, doc_a FROM p),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v
            ),
            comp AS (
              SELECT u AS doc_id, least(u, min(v)) AS component
              FROM reach GROUP BY u
            ),
            sizes AS (
              SELECT component, count(*) AS n_members
              FROM comp GROUP BY component
            )
            SELECT n_members, count(*)::BIGINT AS n_clusters,
                   (n_members * count(*))::BIGINT AS n_docs,
                   ((n_members - 1) * count(*))::BIGINT AS n_redundant
            FROM sizes GROUP BY n_members ORDER BY n_members
        """,
        # same closure + keeper argmax, then the APPLICATION: per-
        # source before/after rollup of dropping every non-keeper
        "dedup_apply_keepers": f"""
            WITH RECURSIVE
            p AS (SELECT doc_a, doc_b FROM ({minhash_common}) mh),
            e AS (SELECT doc_a AS u, doc_b AS v FROM p
                  UNION ALL
                  SELECT doc_b, doc_a FROM p),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON e.u = r.v
            ),
            comp AS (
              SELECT u AS doc_id, least(u, min(v)) AS component
              FROM reach GROUP BY u
            ),
            q AS {_quality_cte},
            member AS (
              SELECT c.doc_id, c.component, q.quality_score
              FROM comp c JOIN q USING (doc_id)
            ),
            keep AS (
              SELECT component, doc_id AS keeper_id FROM (
                SELECT component, doc_id,
                       row_number() OVER (
                         PARTITION BY component
                         ORDER BY quality_score DESC, doc_id ASC) AS rk
                FROM member
              ) WHERE rk = 1
            ),
            removed AS (
              SELECT m.doc_id FROM member m JOIN keep k USING (component)
              WHERE m.doc_id != k.keeper_id
            ),
            per AS (
              SELECT doc_id, source, len({_words_sql}) AS n FROM {d}
            )
            SELECT per.source,
                   count(*)::BIGINT AS n_docs_before,
                   sum(per.n)::BIGINT AS n_tokens_before,
                   sum(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS n_docs_after,
                   sum(CASE WHEN r.doc_id IS NULL THEN per.n ELSE 0 END)
                     ::BIGINT AS n_tokens_after,
                   sum(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END)
                     ::BIGINT AS n_docs_removed,
                   sum(CASE WHEN r.doc_id IS NULL THEN 0 ELSE per.n END)
                     ::BIGINT AS n_tokens_removed
            FROM per LEFT JOIN removed r USING (doc_id)
            GROUP BY per.source ORDER BY per.source
        """,
    }


# --- end-to-end training-data prep composition ------------------------------

PREP_QUALITY_T = 0.2


def training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-corpus prep funnel as ONE lazy plan:
    quality gate → exact dedup → MinHash near-dedup → per-language
    survivor audit. Composes the already-verified operators (same
    expressions, same constants), so the whole funnel stays
    hash-checkable against the SQL twin.

    Funnel semantics:
    1. keep docs with rounded quality_score >= 0.2 (ops.text formula);
    2. exact dedup: keep min doc_id per md5(text);
    3. near-dedup: MinHash/LSH verified pairs (jaccard >= 0.35) among
       survivors, drop the higher doc_id of each pair (greedy keeper —
       the standard approximation of connected-component dedup;
       deterministic because pairs are a < b);
    4. audit: per lang, counts at each stage + sum(doc_id) checksum.

    Scale: stages 1-2 are one shuffle each; stage 3 is the LSH chain
    (O(docs × bands)); the audit is a broadcast-sized rollup."""
    from gis_etl_spark.ops.text import STOPWORDS, words_col

    docs = _docs(spark)
    w = words_col(F.col("text"))
    staged = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(w).alias("n"),
        F.size(F.array_distinct(w)).alias("nd"),
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).alias("nstop"),
    )
    # stage FLAGS on one lineage instead of per-stage sub-DataFrames:
    # every audit count then comes from a single conditional rollup —
    # the sub-DataFrame formulation re-executed the funnel lineage once
    # per stage count (audited at 54 exchanges; this plan runs the doc
    # scan twice — flags + LSH survivor side — instead of five times).
    flagged = staged.withColumn(
        "q_ok",
        F.round(
            F.least(F.col("n") / F.lit(100.0), F.lit(1.0))
            * (F.col("nd") / F.col("n"))
            * (1.0 - F.col("nstop") / F.col("n")),
            4,
        )
        >= PREP_QUALITY_T,
    )
    # exact keep: min doc_id among QUALITY rows of the same content
    # hash (conditional window — identical to deduping the filtered set)
    w_hash = Window.partitionBy(F.md5(F.col("text")))
    flagged = flagged.withColumn(
        "e_ok",
        F.col("q_ok")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("q_ok"), F.col("doc_id"))).over(w_hash)
        ),
    )
    # flagged feeds TWO consumers — the LSH survivor chain and the
    # final audit rollup — and each re-ran the doc scan + three
    # words_col() array passes + the md5 window (guide §2.4, r18).
    # One materialization; both sides rescan ExistingRDD.
    flagged = flagged.localCheckpoint()
    survivors = flagged.filter(F.col("e_ok")).select("doc_id", "lang", "text")
    pairs = _exact_jaccard(survivors, minhash_candidates(survivors)).filter(
        F.col("jaccard") >= MINHASH_JACCARD_T
    )
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    final_flagged = flagged.join(
        drops.withColumn("dropped", F.lit(True)), "doc_id", "left"
    ).withColumn(
        "f_ok", F.col("e_ok") & F.coalesce(~F.col("dropped"), F.lit(True))
    )
    return (
        final_flagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_raw"),
            F.count_if("q_ok").alias("n_quality"),
            F.count_if("e_ok").alias("n_exact"),
            F.count_if("f_ok").alias("n_final"),
            F.coalesce(
                F.sum(F.when(F.col("f_ok"), F.col("doc_id"))), F.lit(0)
            ).alias("id_sum"),
        )
        .orderBy("lang")
    )


def training_data_prep_sql() -> str:
    from gis_etl_spark.ops.text import STOPWORDS, WORDS_SQL

    path = ensure_documents_aug()
    d = f"read_parquet('{path}')"
    w = WORDS_SQL
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    pairs = minhash_pairs_sql("(SELECT doc_id, text FROM exact)")
    return f"""
        WITH s AS (
          SELECT doc_id, lang, text, len({w}) AS n,
                 len(list_distinct({w})) AS nd,
                 len(list_filter({w}, x -> x IN ({stop_list}))) AS nstop
          FROM {d}
        ), quality AS (
          SELECT doc_id, lang, text FROM s
          WHERE round(least(n / 100.0, 1.0) * (nd * 1.0 / n)
                      * (1.0 - nstop * 1.0 / n), 4) >= {PREP_QUALITY_T}
        ), exact AS (
          SELECT doc_id, lang, text FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
            FROM quality
          ) WHERE doc_id = keep_id
        ), pairs AS (
          {pairs}
        ), drops AS (
          SELECT DISTINCT doc_b AS doc_id FROM pairs
        ), final AS (
          SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        ), raw_c AS (
          SELECT lang, count(*) AS n_raw FROM {d} GROUP BY lang
        ), q_c AS (
          SELECT lang, count(*) AS n_quality FROM quality GROUP BY lang
        ), e_c AS (
          SELECT lang, count(*) AS n_exact FROM exact GROUP BY lang
        ), f_c AS (
          SELECT lang, count(*) AS n_final, sum(doc_id)::BIGINT AS id_sum
          FROM final GROUP BY lang
        )
        SELECT r.lang, r.n_raw,
               coalesce(q.n_quality, 0) AS n_quality,
               coalesce(e.n_exact, 0) AS n_exact,
               coalesce(f.n_final, 0) AS n_final,
               coalesce(f.id_sum, 0) AS id_sum
        FROM raw_c r
        LEFT JOIN q_c q USING (lang)
        LEFT JOIN e_c e USING (lang)
        LEFT JOIN f_c f USING (lang)
        ORDER BY r.lang
    """


# ---------------------------------------------------------------------------
# Sub-document (span-level) exact dedup — the C4/RefinedWeb line-dedup
# analog, chunked per Lee et al. 2021 ("Deduplicating Training Data
# Makes Language Models Better": remove repeated substrings, not just
# whole documents). The fixture corpus has no newlines, so the dedup
# unit is a fixed-width k-word span — the same operator shape as line
# dedup with lines replaced by word chunks.
# ---------------------------------------------------------------------------

SPAN_K = 5  # words per span; 5 gives a ~6% cross-doc duplicate rate
            # on the fixture corpus (probed), enough to exercise keeps
            # AND drops at every sf


def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup over the RAW documents table: each doc is
    cut into consecutive SPAN_K-word spans; a span that already
    appeared earlier in the corpus (first occurrence = min (doc_id,
    span_idx)) is dropped; surviving spans reassemble in order.
    Returns (doc_id, n_spans, n_kept, text_dedup) for every document.

    Plan: split → transform/slice chunking (JVM higher-order
    functions, no explode until spans exist) → ONE shuffle
    partitioned by span text for the first-occurrence row_number →
    per-doc reassembly via sorted collect_list. Span strings are
    ~5 words, so shuffling them directly is fine; at 100 TB swap the
    partition key for md5(span) and keep everything else unchanged.
    Docs whose every span was seen before reassemble to '' rather
    than disappearing — the caller decides whether to drop empties."""
    from gis_etl_spark.io import read_table

    k = SPAN_K
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    spans = (
        docs.select("doc_id", F.split(F.trim("text"), " +").alias("ws"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, (size(ws) + {k - 1}) div {k} - 1),"
                    f" i -> concat_ws(' ', slice(ws, i * {k} + 1, {k})))"
                )
            ).alias("cid", "span"),
        )
    )
    w = Window.partitionBy("span").orderBy("doc_id", "cid")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1, F.struct("cid", "span")
                            )
                        )
                    ),
                    lambda x: x["span"],
                ),
                " ",
            ).alias("text_dedup"),
        )
        .orderBy("doc_id")
    )


def dedup_spans_sql() -> str:
    """ANSI oracle for dedup_spans over the pre-registered `documents`
    view. DuckDB's 1-based list positions map to Spark's 0-based chunk
    ids via (pos-1) // k; the FILTERed string_agg coalesces to '' so a
    fully-deduped doc matches Spark's empty array_join."""
    k = SPAN_K
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), ' +')) AS w,
         generate_subscripts(regexp_split_to_array(trim(text), ' +'), 1) AS pos
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
), spans AS (
  SELECT doc_id, (pos - 1) // {k} AS cid,
         string_agg(w, ' ' ORDER BY pos) AS span
  FROM words GROUP BY doc_id, cid
), ranked AS (
  SELECT doc_id, cid, span,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, cid) AS rn
  FROM spans
)
SELECT doc_id,
       count(*)::BIGINT AS n_spans,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       coalesce(string_agg(span, ' ' ORDER BY cid) FILTER (WHERE rn = 1),
                '') AS text_dedup
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# The round-4 prep funnel: every stage this engine gained for training
# corpora, composed into ONE lazy plan (the v1 funnel remains as the
# quality→exact→MinHash rendition).
# ---------------------------------------------------------------------------

PREP2_SURPRISAL_MAX = 302_000  # ~90th pct of the corpus (probed): the
                               # rare-token-garbage gate
PREP2_SHARDS = 16


def training_data_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern prep funnel as ONE lazy plan: unigram-surprisal gate
    → span-boilerplate gate → exact dedup → content-hash sharding,
    audited per shard. Composes the verified operators (same
    expressions, same constants as text_unigram_surprisal /
    dedup_spans / dedup_exact_kept / training_shards), so the whole
    funnel stays hash-checkable against the SQL twin.

    Stage semantics (all-integer comparisons — nothing can flip):
    1. s_ok: mean unigram surprisal ≤ {PREP2_SURPRISAL_MAX} fixed-point
       units (drop rare-token-heavy garbage);
    2. p_ok: s_ok AND at least half the doc's 5-word spans are the
       corpus-first occurrence (2·n_kept ≥ n_spans — drop boilerplate);
    3. e_ok: p_ok AND doc is the min-doc_id keeper of its md5 among
       p_ok survivors;
    4. audit per shard h60(text) % {PREP2_SHARDS}: stage counts,
       surviving-token budget, id checksum.

    Scale: the surprisal model is a broadcast; spans pay one shuffle
    on the span key; the per-doc joins all key on doc_id; the shard
    rollup is {PREP2_SHARDS} groups."""
    from gis_etl_spark.ops.text import SURPRISAL_SCALE, h60, words_col

    docs = _docs(spark).filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    toks = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count("*").alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v_size")
    )
    model = vocab.crossJoin(F.broadcast(totals)).select(
        "w",
        F.expr(
            f"((n_total + v_size) * {SURPRISAL_SCALE}) div (c + 1)"
        ).alias("tok_units"),
    )
    sup = (
        toks.join(F.broadcast(model), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.expr("sum(tok_units) div count(*)").alias("su"),
        )
    )

    k = SPAN_K
    spans = (
        docs.select("doc_id", F.split(F.trim("text"), " +").alias("ws"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, (size(ws) + {k - 1}) div {k} - 1),"
                    f" i -> concat_ws(' ', slice(ws, i * {k} + 1, {k})))"
                )
            ).alias("cid", "span"),
        )
    )
    w_span = Window.partitionBy("span").orderBy("doc_id", "cid")
    spanagg = (
        spans.withColumn("rn", F.row_number().over(w_span))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        )
    )

    base = docs.select("doc_id", "text").join(sup, "doc_id").join(
        spanagg, "doc_id"
    )
    flagged = base.withColumn(
        "s_ok", F.col("su") <= PREP2_SURPRISAL_MAX
    ).withColumn(
        "p_ok",
        F.col("s_ok") & (2 * F.col("n_kept") >= F.col("n_spans")),
    )
    w_hash = Window.partitionBy(F.md5(F.col("text")))
    flagged = flagged.withColumn(
        "e_ok",
        F.col("p_ok")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("p_ok"), F.col("doc_id"))).over(w_hash)
        ),
    )
    return (
        flagged.withColumn(
            "shard", h60(F.col("text")) % PREP2_SHARDS
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_raw"),
            F.count_if("s_ok").alias("n_surprisal"),
            F.count_if("p_ok").alias("n_span_ok"),
            F.count_if("e_ok").alias("n_final"),
            F.coalesce(
                F.sum(F.when(F.col("e_ok"), F.col("n_tokens"))), F.lit(0)
            ).alias("tok_budget"),
            F.coalesce(
                F.sum(F.when(F.col("e_ok"), F.col("doc_id"))), F.lit(0)
            ).alias("id_sum"),
        )
        .orderBy("shard")
    )


def training_data_prep_v2_sql() -> str:
    from gis_etl_spark.ops.text import SURPRISAL_SCALE, WORDS_SQL, h60_sql

    path = ensure_documents_aug()
    d = f"read_parquet('{path}')"
    k = SPAN_K
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM {d}
  WHERE text IS NOT NULL AND length(trim(text)) > 0
), toks AS (
  SELECT doc_id, unnest({WORDS_SQL}) AS w FROM docs
), vocab AS (
  SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY w
), totals AS (
  SELECT sum(c)::BIGINT AS n_total, count(*)::BIGINT AS v_size FROM vocab
), model AS (
  SELECT w, (((n_total + v_size) * {SURPRISAL_SCALE}) // (c + 1))::BIGINT
           AS tok_units
  FROM vocab CROSS JOIN totals
), sup AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
         (sum(m.tok_units)::BIGINT // count(*))::BIGINT AS su
  FROM toks t JOIN model m USING (w) GROUP BY t.doc_id
), words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), ' +')) AS w,
         generate_subscripts(regexp_split_to_array(trim(text), ' +'), 1)
           AS pos
  FROM docs
), spans AS (
  SELECT doc_id, (pos - 1) // {k} AS cid,
         string_agg(w, ' ' ORDER BY pos) AS span
  FROM words GROUP BY doc_id, cid
), ranked AS (
  SELECT doc_id, cid,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, cid) AS rn
  FROM spans
), spanagg AS (
  SELECT doc_id, count(*)::BIGINT AS n_spans,
         sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept
  FROM ranked GROUP BY doc_id
), flagged AS (
  SELECT dd.doc_id, dd.text, s.n_tokens,
         (s.su <= {PREP2_SURPRISAL_MAX}) AS s_ok,
         (s.su <= {PREP2_SURPRISAL_MAX}
          AND 2 * a.n_kept >= a.n_spans) AS p_ok
  FROM docs dd JOIN sup s USING (doc_id) JOIN spanagg a USING (doc_id)
), keepers AS (
  SELECT md5(text) AS h, min(doc_id) AS keep_id
  FROM flagged WHERE p_ok GROUP BY md5(text)
), final AS (
  SELECT f.*, (f.p_ok AND f.doc_id = kp.keep_id) AS e_ok
  FROM flagged f LEFT JOIN keepers kp ON md5(f.text) = kp.h
)
SELECT ({h60_sql("text")} % {PREP2_SHARDS})::BIGINT AS shard,
       count(*)::BIGINT AS n_raw,
       sum(CASE WHEN s_ok THEN 1 ELSE 0 END)::BIGINT AS n_surprisal,
       sum(CASE WHEN p_ok THEN 1 ELSE 0 END)::BIGINT AS n_span_ok,
       sum(CASE WHEN e_ok THEN 1 ELSE 0 END)::BIGINT AS n_final,
       coalesce(sum(CASE WHEN e_ok THEN n_tokens END), 0)::BIGINT
         AS tok_budget,
       coalesce(sum(CASE WHEN e_ok THEN doc_id END), 0)::BIGINT AS id_sum
FROM final GROUP BY shard ORDER BY shard
"""


def edit1_pairs(df: DataFrame, col: str) -> DataFrame:
    """Edit-distance-≤1 string similarity SELF-JOIN via deletion
    neighborhoods (the Pass-Join family, Li et al., ICDE 2011) — the
    fuzzy-key matcher record linkage and typo-level dedup need.
    Each string generates len+1 variants (itself + every
    single-character deletion), all JVM-side; two strings within one
    edit ALWAYS share a variant (substitution at i → both i-deletions
    equal; insertion/deletion → the shorter string equals one of the
    longer's deletions), so a hash join on the variant yields a
    complete candidate set and levenshtein verifies the shortlist —
    never an all-pairs O(n²) scan. At 100 TB the variant fan-out is
    len+1 (bounded, map-side) and the join shuffles only variant
    collisions; the brute twin exists solely as the oracle."""
    # the distinct-names frame feeds both sub-join sides and the indel
    # identity side, and the deletion frame feeds three join inputs —
    # without materialization the scan+distinct executed 4× and the
    # len+1 explode 3× per run (plan audit r18). One localCheckpoint
    # each: every consumer rescans the materialized rows.
    s = (
        df.select(F.col(col).alias("s"))
        .filter(F.col("s").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    # position-tagged deletions: a substitution at i collides ONLY on
    # the i-deletions of both strings, so the join key is (variant,
    # position) — without the tag, repeated characters (zero-padded
    # ids, runs) make one string's deletions at many positions
    # identical and buckets cross-multiply (measured 10.9 s → 3.9 s on
    # 15k TPC-H names at sf0.1 — the remaining wall is the 262k-pair
    # output itself)
    # r19: the distinct above is AQE-coalesced to ONE partition (15k
    # names ≈ 1.5 MB), and the checkpoint froze that width into every
    # consumer — the variant self-join, the indel join and the
    # levenshtein verify all ran as single tasks (stage profile: 3
    # single-task stages of 0.9-1.3 s each, the whole query serial).
    # Hash-partition the deletion frame on the JOIN key to
    # defaultParallelism before the checkpoint (explicit width — a
    # keyed repartition without it gets re-coalesced): the self-join
    # then rides the checkpoint's partitioning with zero exchange and
    # cluster-wide width. Same fix as the r18 _bucket_pairs respread.
    para = df.sparkSession.sparkContext.defaultParallelism
    dels = (
        s.select(
            "s",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, length(s)), i -> "
                    "concat(substr(s, 1, i - 1), substr(s, i + 1)))"
                )
            ).alias("tag", "v"),
        )
        .repartition(para, "v", "tag")
        .localCheckpoint()
    )
    sub_cand = (
        dels.alias("a")
        .join(dels.alias("b"), ["v", "tag"])
        .filter(F.col("a.s") < F.col("b.s"))
        .select(
            F.col("a.s").alias("a_val"), F.col("b.s").alias("b_val")
        )
    )
    # insertion/deletion: the shorter string IS a deletion variant of
    # the longer — join identities against deletions, normalize order
    indel_cand = (
        s.alias("i")
        .join(dels.alias("d"), F.col("i.s") == F.col("d.v"))
        .filter(F.col("i.s") != F.col("d.s"))
        .select(
            F.least("i.s", "d.s").alias("a_val"),
            F.greatest("i.s", "d.s").alias("b_val"),
        )
    )
    # dedup scope (guide §2.4 — "a distinct on data that is already
    # unique"): a sub_cand pair shares a (variant, tag) ⇔ the two
    # equal-length strings differ at EXACTLY position tag, so each
    # substitution pair appears exactly once and never in indel_cand
    # (whose pairs differ in length) — the global distinct on the
    # output-sized candidate set was a full extra exchange. Only
    # indel_cand can repeat (a run of equal characters gives the same
    # deletion variant at several tags), so only it is deduped.
    cand = sub_cand.unionByName(indel_cand.distinct())
    return (
        cand.filter(F.levenshtein("a_val", "b_val") <= 1)
        .orderBy("a_val", "b_val")
    )


def customer_name_ed1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract query for edit1_pairs: ED≤1 customer-name pairs (the
    digit-structured TPC-H names make a dense typo graph — 19.5k pairs
    at sf0.01). Engine runs the deletion-neighborhood plan; the oracle
    is deliberately the brute all-pairs levenshtein join the engine
    refuses to run."""
    from gis_etl_spark.io import read_table

    cust = read_table(spark, sf_dir, "customer")
    return edit1_pairs(cust, "c_name").select(
        F.col("a_val").alias("a_name"), F.col("b_val").alias("b_name")
    )


CUSTOMER_ED1_SQL = """
WITH names AS (SELECT DISTINCT c_name FROM customer)
SELECT a.c_name AS a_name, b.c_name AS b_name
FROM names a JOIN names b
  ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY a_name, b_name
"""
