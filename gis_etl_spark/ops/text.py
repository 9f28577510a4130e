"""Text-analysis operators [north-star] — language ID, quality scoring,
token counting, fingerprinting over the `documents` table (SURVEY.md
§2.11; no reference citations exist — these are the LLM-data-pipeline
extensions BASELINE.json requires).

Parity rules with the ANSI oracle:
- tokenization is `regexp_split(trim(text), ' +')` — identical
  semantics in Java regex and RE2 for this pattern;
- every hash is the md5-prefix integer h60(s) =
  int(md5(s)[:15], 16), bit-identical in Spark (`conv`) and DuckDB
  (`('0x' || ...)::BIGINT`) — verified in round-1 probes;
- ratios are rounded so engine-order float noise cancels.

Scale notes: everything here is JVM-native expressions (split /
higher-order filter / explode + hash agg) — zero Python in the hot
path; the global token frequency is the only shuffle-heavy op and is
a classic two-phase count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_etl_spark.io import read_table, read_table_spread

# small marker-word sets per language; with the driver's synthetic
# shared-vocabulary corpus these exercise the operator (argmax over
# weighted hits with deterministic tie-break), not real linguistics.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "scan", "fast"),
    "es": ("data", "row", "sort"),
    "fr": ("query", "merge", "line"),
    "de": ("hash", "join", "batch"),
    "zh": ("window", "big", "stream"),
}
STOPWORDS = ("the", "a", "of", "and", "to")


def quality_score_from_counts(
    n: Column, nd: Column, nstop: Column
) -> Column:
    """THE quality composite — round(least(n/100,1)·(nd/n)·(1−nstop/n),
    4) over (token count, distinct tokens, stopword tokens). Single
    shared expression: text_quality_scores, the dedup keeper policy,
    the corpus funnel, and the streaming ingest twin must all gate on
    byte-identical scores (hash-contract requirement), so none of them
    may restate it."""
    return F.round(
        F.least(n / F.lit(100.0), F.lit(1.0))
        * (nd / n)
        * (1.0 - nstop / n),
        4,
    )


def h60(col: Column) -> Column:
    """60-bit integer from the md5 hex prefix — cross-engine stable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def words_col(text: Column) -> Column:
    return F.split(F.trim(text), " +")


WORDS_SQL = "regexp_split_to_array(trim(text), ' +')"


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counting: counts, distinct counts, mean token
    length — the basic stats a quality filter consumes."""
    docs = read_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.length(F.regexp_replace(F.trim("text"), " ", "")).alias("n_letters"),
        F.round(
            F.length(F.regexp_replace(F.trim("text"), " ", "")) / F.size(w), 4
        ).alias("avg_token_len"),
    )


CHUNK_TOKENS = 64  # tokens per chunk window
CHUNK_STRIDE = 48  # window step → 16-token overlap between neighbors

# DuckDB twin of _chunk_frame — shared CTE prefix for the
# document_chunks and chunk_dedup_groups oracles (lists are 1-based:
# list_slice bounds mirror Spark's F.slice(ws, idx*S + 1, C)).
_CHUNK_CTE_SQL = f"""base AS (
              SELECT doc_id, {WORDS_SQL} AS ws, len({WORDS_SQL}) AS n
              FROM documents
            ), idx AS (
              SELECT doc_id, ws, n,
                     unnest(range(0, CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                       ELSE 1 + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                                // {CHUNK_STRIDE} END)) AS chunk_idx
              FROM base
            ), chunks AS (
              SELECT doc_id, chunk_idx,
                     least({CHUNK_TOKENS},
                           n - chunk_idx * {CHUNK_STRIDE}) AS n_tok,
                     md5(array_to_string(
                       list_slice(ws, chunk_idx * {CHUNK_STRIDE} + 1,
                                  chunk_idx * {CHUNK_STRIDE}
                                    + {CHUNK_TOKENS}),
                       ' ')) AS chunk_md5
              FROM idx
            )"""


def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the RAG-indexing / training
    sequence-prep primitive (split every document into CHUNK_TOKENS-token
    windows every CHUNK_STRIDE tokens, last window short; every token is
    covered, consecutive chunks share the overlap so no boundary context
    is lost).

    Whole-stage-codegen throughout: tokenize once, explode a
    `sequence(0, n_chunks-1)` index (narrow, bounded fan-out n/stride),
    slice + reassemble each window with array HOFs, fingerprint with
    md5. No shuffle at all until the caller aggregates, no Python, and
    chunking parallelism is per-document — a 100 TB corpus chunks
    map-side in one pass. Chunk identity = (doc_id, chunk_idx) plus a
    content md5 so downstream chunk-level dedup (chunk_dedup_groups)
    composes directly."""
    return _chunk_frame(spark, sf_dir).orderBy("doc_id", "chunk_idx")


def _chunk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered (doc_id, chunk_idx, n_tok, chunk_md5) frame shared by
    document_chunks (which presents it sorted) and chunk_dedup_groups
    (which aggregates it — no point paying a sort the agg discards)."""
    return chunk_select(read_table(spark, sf_dir, "documents"))


def chunk_select(docs: DataFrame) -> DataFrame:
    """The chunking expression applied to ANY (doc_id, text) frame —
    pure select/explode (stateless, stream-legal), shared by the batch
    chunk frame and streaming_chunk_dedup."""
    C, S = CHUNK_TOKENS, CHUNK_STRIDE
    w = words_col(F.col("text"))
    staged = docs.select(
        "doc_id", w.alias("ws"), F.size(w).alias("n")
    ).withColumn(
        "n_chunks",
        F.when(F.col("n") <= C, F.lit(1)).otherwise(
            F.lit(1) + F.expr(f"div(n - {C} + {S} - 1, {S})")
        ),
    )
    return staged.select(
        "doc_id",
        "ws",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n_chunks") - 1)
        ).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.least(
            F.lit(C), F.col("n") - F.col("chunk_idx") * S
        ).alias("n_tok"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("ws"), F.col("chunk_idx") * S + 1, C)
            )
        ).alias("chunk_md5"),
    )


def chunk_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document chunk-level exact dedup — the C4-style boilerplate
    kill composed directly on document_chunks output: every
    CHUNK_TOKENS-token window whose content appears more than once
    anywhere in the corpus collapses to one deterministic keeper (the
    lexicographically-min (doc_id, chunk_idx) occurrence).

    One hash-shuffle on chunk_md5 with map-side partial aggregation —
    count / distinct-doc / min-struct all combine — then a post-agg
    filter; no window function, no all-pairs. At 100 TB this is the
    same single-agg shape as dedup_exact_groups applied one level below
    the document, and the downstream kill is an anti-join of
    (doc_id, chunk_idx) against the keeper set."""
    chunks = _chunk_frame(spark, sf_dir)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("_k"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "chunk_md5",
            "n_copies",
            "n_docs",
            F.col("_k.doc_id").alias("keeper_doc"),
            F.col("_k.chunk_idx").alias("keeper_idx"),
        )
        .orderBy("chunk_md5")
    )


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, lexical diversity, length factor
    → one composite score, the standard pretraining-corpus gate."""
    docs = read_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    staged = docs.select(
        "doc_id",
        F.size(w).alias("n"),
        F.size(F.array_distinct(w)).alias("nd"),
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).alias("nstop"),
    )
    return staged.select(
        "doc_id",
        F.round(F.col("nstop") / F.col("n"), 4).alias("stopword_ratio"),
        F.round(F.col("nd") / F.col("n"), 4).alias("diversity"),
        F.round(
            F.least(F.col("n") / F.lit(100.0), F.lit(1.0))
            * (F.col("nd") / F.col("n"))
            * (1.0 - F.col("nstop") / F.col("n")),
            4,
        ).alias("quality_score"),
    )


def quality_score_cte_sql(src: str = "documents") -> str:
    """(doc_id, quality_score) as a parenthesized subquery — the exact
    text_quality_scores composite (same staged n/nd/nstop CTE, same
    float op order, same 4dp round), reusable by oracles that consume
    the score (dedup_canonical_keepers)."""
    w = WORDS_SQL
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""(
          WITH s AS (
            SELECT doc_id, len({w}) AS n,
                   len(list_distinct({w})) AS nd,
                   len(list_filter({w}, x -> x IN ({stop_list}))) AS nstop
            FROM {src}
          )
          SELECT doc_id,
                 round(least(n / 100.0, 1.0) * (nd * 1.0 / n)
                       * (1.0 - nstop * 1.0 / n), 4) AS quality_score
          FROM s
        )"""


N_DECILES = 10


def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global NTILE(10) over the quality score WITHOUT a global
    single-partition sort — the scale-safe way to stratify a corpus
    into quality bands for curriculum mixing / pruning.

    A bare `ntile() OVER (ORDER BY …)` window moves EVERY row to one
    partition (Spark warns, then dies at 100 TB). This plan instead:
      1. counts rows per DISTINCT score — one ordinary shuffle; the
         result is ≤ 10⁴+1 rows BY CONSTRUCTION (scores are rounded to
         4dp in [0, 1]), so the cumulative-offset window over it is a
         provably tiny single partition;
      2. ranks within each equal-score group in parallel
         (row_number over a window PARTITIONED by score);
      3. global rank = group offset + intra-group rank, and the decile
         falls out of NTILE's closed form: the first (N mod b) buckets
         take ceil(N/b) rows, the rest floor(N/b) — pure integer
         arithmetic, verified against the engines' own ntile by both
         the oracle and tests/test_northstar.py.
    N is the one driver scalar (A8 pattern). Ties are impossible:
    (score, doc_id) is unique, so the rank — and thus every decile
    boundary — is total and deterministic."""
    # q feeds THREE consumers (the N scalar, the per-score histogram,
    # the rank join) and each re-ran the full quality compute — the
    # words_col array passes over every document (guide §2.4, r18).
    # Checkpoint the two-column frame once; 3 corpus passes → 1.
    q = (
        text_quality_scores(spark, sf_dir)
        .select("doc_id", "quality_score")
        .localCheckpoint()
    )
    n = q.count()
    # degenerate-corpus guard: fewer rows than buckets would zero
    # size_small and divide by it; NTILE's own semantics put one row
    # per bucket then stop — b = min(b, n) reproduces that exactly
    b = min(N_DECILES, n) if n else 1
    size_small = n // b
    size_big = size_small + 1
    cut = (n % b) * size_big  # rows 1..cut live in the big buckets
    per_score = q.groupBy("quality_score").agg(F.count("*").alias("cnt"))
    w_off = (
        Window.orderBy("quality_score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_score.select(
        "quality_score",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
    )
    w_in = Window.partitionBy("quality_score").orderBy("doc_id")
    ranked = (
        q.join(F.broadcast(offsets), "quality_score")
        .select(
            "doc_id",
            "quality_score",
            (F.col("off") + F.row_number().over(w_in)).alias("rk"),
        )
    )
    decile = F.when(
        F.col("rk") <= cut,
        F.expr(f"(rk - 1) div {size_big}") + 1,
    ).otherwise(
        F.expr(f"(rk - {cut} - 1) div {size_small}") + (n % b) + 1
    )
    return (
        ranked.select("doc_id", "quality_score", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("quality_score").alias("min_score"),
            F.max("quality_score").alias("max_score"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("decile")
    )


def quality_deciles_sql() -> str:
    """Oracle: the textbook ntile() window — agreement proves the
    distributed closed-form bucketing reproduces NTILE exactly."""
    w = WORDS_SQL
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
        WITH s AS (
          SELECT doc_id, len({w}) AS n,
                 len(list_distinct({w})) AS nd,
                 len(list_filter({w}, x -> x IN ({stop_list}))) AS nstop
          FROM documents
        ), q AS (
          SELECT doc_id,
                 round(least(n / 100.0, 1.0) * (nd * 1.0 / n)
                       * (1.0 - nstop * 1.0 / n), 4) AS quality_score
          FROM s
        ), d AS (
          SELECT doc_id, quality_score,
                 ntile({N_DECILES}) OVER (ORDER BY quality_score, doc_id)
                   AS decile
          FROM q
        )
        SELECT decile, count(*)::BIGINT AS n_docs,
               min(quality_score) AS min_score,
               max(quality_score) AS max_score,
               sum(doc_id)::BIGINT AS id_sum
        FROM d GROUP BY decile ORDER BY decile
    """


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: hits per language, argmax with a fixed
    tie-break order — the n-gram-heuristic shape of fasttext-style
    lang-id, as a pure relational plan."""
    docs = read_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    def hit_counter(markers: tuple[str, ...]):
        # NB: a one-parameter closure — F.filter treats two-parameter
        # lambdas as (value, index)
        return lambda x: x.isin(*markers)

    scored = docs.select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(w, hit_counter(markers))).alias(f"hits_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    # deterministic argmax: first language in declaration order wins ties
    pred = None
    best = None
    for lang in LANG_MARKERS:
        c = F.col(f"hits_{lang}")
        if pred is None:
            pred, best = F.lit(lang), c
        else:
            pred = F.when(c > best, F.lit(lang)).otherwise(pred)
            best = F.when(c > best, c).otherwise(best)
    return scored.select(
        "doc_id", "lang", pred.alias("predicted_lang"), best.alias("best_hits")
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 60-bit content hash over the normalized
    text (exact-dup key) + a coarse 16-bit prefix bucket (shard key)."""
    docs = read_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), " +", " ")
    fp = h60(norm)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.shiftright(fp, 44).alias("bucket16"),
    )


def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup per language — partial/final agg, no Python."""
    docs = read_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    return (
        docs.select("lang", F.size(w).alias("n"), F.col("n_chars"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency top-25: explode → two-phase count →
    top-k. The explode fan-out is the scale hazard; the partial agg
    keeps the shuffle at |vocab|, not |tokens|."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(words_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(25)
    )


# GPT-2-style pre-tokenizer, restricted to the lookahead-free subset
# so Java regex (Spark) and RE2 (DuckDB) match identically: contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs. (The original GPT-2 pattern's trailing (?!\S)
# lookahead is NOT RE2-expressible and is dropped; that branch only
# re-splits whitespace preceding EOS.)
BPE_PRETOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?\\p{L}+"
    "| ?\\p{N}+"
    "| ?[^\\s\\p{L}\\p{N}]+"
    "|\\s+"
)


def regex_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under the BPE-ish regex pre-tokenizer vs plain
    whitespace — the two tokenizer cost models a training-data pipeline
    budgets with (whitespace undercounts punctuation-heavy text; the
    pre-tokenizer count is the upper bound on BPE sequence length).
    Per doc: both counts plus their ratio; all map-side (one regex pass
    per row inside codegen, no shuffle until the final sort)."""
    docs = read_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    re_toks = F.regexp_extract_all(
        F.col("text"), F.lit(BPE_PRETOKEN_RE), 0
    )
    # whitespace runs are pre-tokenizer bookkeeping, not tokens — count
    # the non-blank matches
    nb = F.size(
        F.filter(re_toks, lambda t: F.trim(t) != F.lit(""))
    )
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens_ws"),
        nb.alias("n_tokens_re"),
        F.round(
            nb.cast("double") / F.size(w).cast("double"), 4
        ).alias("re_per_ws"),
    ).orderBy("doc_id")


II_TOP_K = 5  # champion-list length per token
II_MIN_DF = 5  # index only tokens appearing in >= this many docs


def inverted_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Champion-list inverted index — the retrieval-prep complement of
    tfidf_top_terms (that one is doc→terms; this is token→docs): for
    every token with document frequency ≥ II_MIN_DF, the top II_TOP_K
    postings by (tf DESC, doc_id) plus the token's df and corpus tf.
    Emitted FLAT (one row per token, rank) so the cross-engine value
    hash pins every posting; the (tf, doc_id) order is total, so rank
    is deterministic.

    Scale shape: explode → (token, doc) partial-agg count → per-token
    window top-k. The window partitions by token (millions of
    partitions, no global skew: a stop-word's postings are capped by
    the top-k, and the df/tf aggregates are partial before shuffle).
    This is how champion lists (Manning IR §7.1.3) are built for a
    100 TB corpus: one shuffle for tf, one for the per-token window."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("token")
    )
    # tf feeds two consumers (the per-token stats and the champion
    # window) through one IDENTICAL (token, doc_id) exchange — runtime
    # exchange reuse executes it once, and the r18 eager-checkpoint
    # experiment measured an in-suite REGRESSION (0.67 → 1.01 s; same
    # class as the mixture family). Left lazy.
    tf = terms.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"),
        F.sum("tf").cast("long").alias("corpus_tf"),
    )
    w = Window.partitionBy("token").orderBy(
        F.desc("tf"), F.asc("doc_id")
    )
    ranked = tf.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= II_TOP_K
    )
    return (
        ranked.join(stats, "token")
        .filter(F.col("df") >= II_MIN_DF)
        .select("token", "df", "corpus_tf", "rank", "doc_id", "tf")
        .orderBy("token", "rank")
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10   # postings returned per query
BM25_NTERMS = 8  # top corpus tokens -> BM25_NTERMS/2 two-term queries
# champion-list depth for the WAND-style pruned rung: per term,
# top-⌈α·√df⌉ postings (floored at BM25_TOPK so a safe query's
# champion pool can fill the result). A FIXED depth cannot serve every
# corpus size — measured: 64 discharges the θ>UB bound for all 4
# contract queries at sf0.01 (16% of postings touched) but NEVER fires
# at sf0.1, while 256 is wasteful at sf0.01; α·√df lands 64-90 at
# ~400-posting terms and ~280 at ~3,900-posting terms, both measured
# all-safe (6.6% touched at sf0.1). Depth only tunes pruning
# effectiveness — exactness is depth-independent (bound + fallback).
BM25_CHAMP_ALPHA = 4.5
# staleness-monitor fixture: every doc_id % MOD == 0 re-ingested under
# a new id — a deterministic ~33% corpus growth, heavy df drift
BM25_DRIFT_MOD = 3
# Rebuild decision loop (VERDICT r15 item 3 — the ANN
# drift→probe→decide pattern applied to the text index): the always-on
# monitor (bm25_stats_drift) FIRES when any query term's fresh/frozen
# df ratio crosses the trigger; the probe (top-k agreement of
# frozen-stats delta-overlay serving vs a fresh-stats rebuild over the
# augmented corpus) then picks the rung — agreement at/above the
# threshold means frozen-stats ranking still holds and MINOR
# COMPACTION suffices; below it, the stats themselves are stale and
# only build_bm25_index (new fingerprint + swap) restores ranking.
# 1200 ≈ fires at a ~20% corpus growth — comfortably before the ~33%
# canary (measured df drift 1338 at sf0.1).
BM25_DRIFT_TRIGGER_X1000 = 1200
BM25_AGREEMENT_REBUILD_T = 95  # probe pct below this → full rebuild


def _bm25_per_term_score() -> Column:
    """THE canonical per-posting BM25 double expression — one
    definition consumed by the in-plan scorer, the pruned rung, AND
    the index build (a stored posting's impact score is this exact
    double, so the stored path is bit-identical to fresh derivation).
    Expects columns tf, df, dl, n_docs, n_tokens in scope."""
    idf = F.expr(
        "ln(1.0D + (cast(n_docs as double) - cast(df as double) + 0.5D)"
        " / (cast(df as double) + 0.5D))"
    )
    denom = F.expr(
        f"cast(tf as double) + {BM25_K1}D * (1.0D - {BM25_B}D"
        f" + {BM25_B}D * cast(dl as double)"
        " * cast(n_docs as double) / cast(n_tokens as double))"
    )
    return idf * (F.expr(f"cast(tf as double) * {1.0 + BM25_K1}D")) / denom


def _bm25_posting_scores(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(posts, qnames): per matching posting the exact per-term BM25
    score — posts = (query_id, token, doc_id, sc double) — plus the
    query-name table. The shared subplan of bm25_topk (which sums sc
    per (query, doc)) and bm25_topk_pruned (which prunes with champion
    lists before summing); both consume the IDENTICAL score
    expression, so their results agree double-for-double."""
    docs = read_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("token")
    )
    # ONE corpus pass (guide §1.2 step 1 / §2.4): tf is the root of
    # every other frame here, but dl/stats/corpus/qterms each planned
    # their own explode+aggregate over the raw corpus (audited: 4-5
    # full scan+explode passes per bm25_topk run, and the pruned rung
    # multiplies them through its three posts consumers). Materialize
    # tf once per invocation and derive dl = Σ tf per doc — the same
    # int64 count the separate explode produced. The durable form of
    # this materialization at 100 TB is the stored index
    # (build_bm25_index); the in-plan rung pays it per run, once.
    tf = (
        terms.groupBy("token", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = tf.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.sum("tf").alias("corpus_tf"),
    )
    corpus = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").alias("n_tokens"),
    )
    qterms = (
        stats.filter(~F.col("token").isin(*STOPWORDS))
        .orderBy(F.desc("corpus_tf"), F.asc("token"))
        .limit(BM25_NTERMS)
        .select(
            "token",
            "df",
            F.row_number()
            .over(Window.orderBy(F.desc("corpus_tf"), F.asc("token")))
            .alias("trk"),
        )
        .select(
            "token",
            "df",
            F.expr("cast((trk - 1) div 2 as bigint)").alias("query_id"),
        )
    )
    qnames = qterms.groupBy("query_id").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("token"))).alias(
            "q_terms"
        )
    )
    # one canonical double expression, replicated verbatim in SQL
    per_term = _bm25_per_term_score()
    posts = (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("query_id", "token", "df", "doc_id", per_term.alias("sc"))
    )
    return posts, qnames


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 query scoring — the missing rung between the champion-list
    index (inverted_index_topk) and a serving stack: score documents
    for a query set and return each query's top-{BM25_TOPK}.

    Query set (deterministic + data-derived, the similarity family's
    vec_id<N convention adapted to text): the {BM25_NTERMS} most
    frequent non-stopword tokens by (corpus tf DESC, token ASC) pair
    up in rank order into {BM25_NTERMS}//2 two-term queries.

    Score: Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    idf = ln(1 + (N−df+0.5)/(df+0.5)) (Robertson-Sparck Jones, +1
    floor), k1={BM25_K1}, b={BM25_B}. Determinism: each per-term score
    is one canonical double expression replicated token-for-token in
    the SQL twin; a query has ≤2 terms, so the per-doc sum is a single
    commutative double add (order cannot vary); the SUM is then
    quantized to int64 units (floor(score·1e6 + 0.5)) and ranking
    ties break on doc_id — the fixedpoint discipline, with ln's
    cross-engine agreement absorbed exactly as the kmeans contract
    absorbs it (a flip needs the product to land within an ulp of a
    rounding boundary; not observed).

    Output: (query_id, q_terms, rank, doc_id, score_units), ordered.

    Scale: one explode→(token,doc) partial-agg shuffle for tf; df and
    the corpus stats are map-side-combined aggregates; the query-term
    table ({BM25_NTERMS} rows) broadcasts into the postings join, so
    only matching postings survive the map side; the final window
    partitions by query over candidate docs only."""
    posts, qnames = _bm25_posting_scores(spark, sf_dir)
    scored = posts.groupBy("query_id", "doc_id").agg(
        F.floor(F.sum("sc") * F.lit(1e6) + F.lit(0.5)).alias("score_units")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_units"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .join(F.broadcast(qnames), "query_id")
        .select("query_id", "q_terms", "rank", "doc_id", "score_units")
        .orderBy("query_id", "rank")
    )


def _bm25_champ_depth() -> Column:
    """Champion depth per term: max(k, ⌈α·√df⌉) — in-plan, df-driven
    (a fixed depth cannot serve every corpus size; see
    BM25_CHAMP_ALPHA)."""
    return F.greatest(
        F.lit(BM25_TOPK),
        F.ceil(F.lit(BM25_CHAMP_ALPHA) * F.sqrt(F.col("df"))),
    )


# Champion-rank sentinel for DELTA postings appended between rebuilds
# (append_to_bm25_index): delta rows are never champions, but they are
# ALWAYS candidates (the delta-store contract below), so the θ>UB
# exactness bound keeps holding — outsiders are main-index
# non-champions only, still bounded by ub_t.
BM25_DELTA_CRK = 2_147_483_647
# Champion-rank sentinel for NON-CHAMPION main-index postings
# (VERDICT r15 item 1): serving only ever consumes crk via
# `crk <= champ_depth` and `crk == BM25_DELTA_CRK`, so rows outside a
# token's champion prefix never need their exact rank — the build
# stamps them with this constant instead of windowing the full
# (Zipf-skewed) posting list. Strictly between any real champion depth
# (⌈α·√df⌉ « 2^31 for any physical corpus) and the delta sentinel.
BM25_NONCHAMP_CRK = 2_147_483_646
# Salt fan-out for the build-time champion ranking: the hottest
# token's posting list is split across this many tasks for the local
# top-C pass (the _per_query_topk two-level discipline). Sized so
# |hottest posting list| / BM25_BUILD_SALTS fits one task's sort
# budget; scale it with the corpus, not the cluster.
BM25_BUILD_SALTS = 32


def _champion_ranked(
    scored: DataFrame, materialize: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Bounded champion ranking — the de-skewed replacement for the
    full-posting-list `row_number` window of the r15 index build
    (VERDICT r15 item 1, the salted two-level top-C pattern of
    _per_query_topk applied to the build path).

    `scored` = (token, doc_id, tf, sc, df, ...). Returns (ranked,
    cache) where ranked = (token, doc_id, tf, sc, crk) with crk = the
    EXACT global champion rank for every row in its token's true
    top-max(k,⌈α·√df⌉) by (sc DESC, doc_id ASC) and
    {BM25_NONCHAMP_CRK} for every other row; `cache` is the persisted
    intermediate the caller must unpersist after its terminal action.

    Exactness: stage 1 ranks within (token, salt=h(doc_id) %
    {BM25_BUILD_SALTS}) — any row of the true global top-C has < C
    rows ahead of it globally, hence < C ahead within its salt, so the
    per-salt top-C survivor set CONTAINS the true top-C; stage 2 ranks
    the ≤ salts·C survivors per token, where every row globally ahead
    of a true-top-C row is itself a survivor, so stage-2 rank == true
    global rank for exactly the true top-C (everything else ranks
    > C and is stamped non-champion). No window ever sees more than
    |posting list| / salts (stage 1) or salts·C (stage 2) rows per
    partition.

    The intermediate is persisted because both output branches
    (survivors and non-survivors) consume it — without the persist the
    corpus-wide explode/aggregate subtree underneath runs twice.
    `materialize=False` skips the persist (plan audits: a cached frame
    prints as InMemoryRelation, hiding the windows under test)."""
    depth = _bm25_champ_depth()
    local = scored.withColumn(
        "salt",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(BM25_BUILD_SALTS)),
    ).withColumn(
        "lrk",
        F.row_number().over(
            Window.partitionBy("token", "salt").orderBy(
                F.desc("sc"), F.asc("doc_id")
            )
        ),
    )
    if materialize:
        local = local.persist()
    wg = Window.partitionBy("token").orderBy(F.desc("sc"), F.asc("doc_id"))
    cols = ["token", "doc_id", "tf", "sc", "crk"]
    champs = (
        local.filter(F.col("lrk") <= depth)
        .withColumn("gk", F.row_number().over(wg))
        .withColumn(
            "crk",
            F.when(F.col("gk") <= depth, F.col("gk")).otherwise(
                F.lit(BM25_NONCHAMP_CRK)
            ),
        )
        .select(*cols)
    )
    rest = (
        local.filter(F.col("lrk") > depth)
        .withColumn("crk", F.lit(BM25_NONCHAMP_CRK))
        .select(*cols)
    )
    return champs.unionByName(rest), local


def _bm25_prune_parts_from(posts: DataFrame):
    """The pruning sub-frames, given per-posting scores WITH champion
    ranks — posts = (query_id, token, df, doc_id, sc, crk). Shared by
    the in-plan pruned rung (crk from a query-time window) and the
    STORED-index serve path (crk persisted at build time, so serving
    never windows the postings). Returns (champ, champ_ranked, safe,
    rank_window).

    Delta-store contract: rows with crk == BM25_DELTA_CRK (postings
    appended against frozen stats between rebuilds) never join the
    champion lists, but every delta doc is force-included in the
    candidate set — the immutable-main + delta-overlay shape real
    search engines serve, keeping the champion bound exact because
    non-candidates remain main-index non-champions."""
    k = BM25_TOPK
    champ = posts.filter(F.col("crk") <= _bm25_champ_depth())
    # per-term upper bound for non-champions = the weakest champion
    ub_q = (
        champ.groupBy("query_id", "token")
        .agg(F.min("sc").alias("ub"))
        .groupBy("query_id")
        .agg(
            F.floor(F.sum("ub") * F.lit(1e6) + F.lit(0.5)).alias(
                "ub_units"
            )
        )
    )
    # the candidate set is ≤ Σ champion depths + |delta| rows (≤ a few
    # hundred per query by construction; the delta is small between
    # rebuilds by definition) — broadcast it into the postings so the
    # full-score pass is map-side (a plain join statically plans SMJ
    # here; audited r15)
    cand = (
        champ.select("query_id", "doc_id")
        .unionByName(
            posts.filter(F.col("crk") == BM25_DELTA_CRK).select(
                "query_id", "doc_id"
            )
        )
        .distinct()
    )
    champ_scored = (
        posts.join(F.broadcast(cand), ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id", "doc_id")
        .agg(
            F.floor(F.sum("sc") * F.lit(1e6) + F.lit(0.5)).alias(
                "score_units"
            )
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_units"), F.asc("doc_id")
    )
    champ_ranked = champ_scored.withColumn("rank", F.row_number().over(w))
    theta = champ_ranked.filter(F.col("rank") == k).select(
        "query_id", F.col("score_units").alias("theta_units")
    )
    # safe ⇔ a k-th champion exists AND θ strictly beats the outsider
    # bound (strict: an outsider tying θ would win the doc_id break)
    safe = (
        theta.join(F.broadcast(ub_q), "query_id")
        .filter(F.col("theta_units") > F.col("ub_units"))
        .select("query_id")
    )
    return champ, champ_ranked, safe, w


def _bm25_pruned_final(
    posts: DataFrame, qnames: DataFrame, champ_ranked, safe, w
) -> DataFrame:
    """The branch-routing tail shared by the in-plan and stored pruned
    rungs: champion result for safe queries, full postings for the
    rest, identical output contract to bm25_topk."""
    k = BM25_TOPK
    safe_part = champ_ranked.join(F.broadcast(safe), "query_id", "left_semi")
    full_part = (
        posts.join(F.broadcast(safe), "query_id", "left_anti")
        .groupBy("query_id", "doc_id")
        .agg(
            F.floor(F.sum("sc") * F.lit(1e6) + F.lit(0.5)).alias(
                "score_units"
            )
        )
        .withColumn("rank", F.row_number().over(w))
    )
    return (
        safe_part.unionByName(full_part)
        .filter(F.col("rank") <= k)
        .join(F.broadcast(qnames), "query_id")
        .select("query_id", "q_terms", "rank", "doc_id", "score_units")
        .orderBy("query_id", "rank")
    )


def _bm25_prune_parts(spark: SparkSession, sf_dir: str):
    """The shared sub-frames of the in-plan pruned BM25 rung: (posts,
    qnames, champ, champ_ranked, safe, rank_window). `safe` is the
    query-id set whose θ>UB bound discharged — consumed by
    bm25_topk_pruned (branch routing) and bm25_prune_stats (the bench
    receipt)."""
    posts, qnames = _bm25_posting_scores(spark, sf_dir)
    # posts (query-term postings only — small) feeds three consumers
    # (the crk window, the candidate full-score join, the unsafe-query
    # fallback); materialized once so each stops re-running the
    # posting-score joins (guide §2.4 — audited 272 Exchanges before)
    posts = posts.localCheckpoint()
    wt = Window.partitionBy("query_id", "token").orderBy(
        F.desc("sc"), F.asc("doc_id")
    )
    posts_crk = posts.withColumn("crk", F.row_number().over(wt))
    champ, champ_ranked, safe, w = _bm25_prune_parts_from(posts_crk)
    return posts, qnames, champ, champ_ranked, safe, w


def bm25_prune_stats(spark: SparkSession, sf_dir: str) -> dict:
    """The pruning receipt: total matching postings, champion-list
    postings, safe query ids, and the share of postings the pruned
    rung actually touches (champions + unsafe queries' full postings).
    Bench records touched_pct as bm25_pruned_postings_pct."""
    posts, _, champ, _, safe, _ = _bm25_prune_parts(spark, sf_dir)
    posts = posts.persist()
    try:
        total = posts.count()
        n_champ = champ.count()
        safe_ids = sorted(r["query_id"] for r in safe.collect())
        unsafe_posts = (
            posts.join(F.broadcast(safe), "query_id", "left_anti").count()
            if safe_ids
            else total
        )
        # touched = champions of SAFE queries + unsafe queries' full
        # postings (which already contain their champions) — counting
        # all champions double-counted unsafe ones and could exceed
        # 100% in the all-fallback case (ADVICE r15)
        n_champ_safe = (
            champ.join(F.broadcast(safe), "query_id", "left_semi").count()
            if safe_ids
            else 0
        )
        return {
            "total_postings": total,
            "champion_postings": n_champ,
            "safe_query_ids": safe_ids,
            "touched_pct": round(
                100.0 * (n_champ_safe + unsafe_posts) / total, 1
            )
            if total
            else 0.0,
        }
    finally:
        posts.unpersist()


def bm25_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAND-style champion-list BM25 (VERDICT r14 item 5) — the scale
    rung above bm25_topk, which scores EVERY posting of every query
    term (the hottest terms touch most of the corpus). Provably exact:
    registered against the SAME oracle as bm25_topk, so the hash match
    pins that pruning changes nothing (the mixture_draw_split proof
    pattern).

    Per (query, term), the champion list is the top
    max({BM25_TOPK}, ⌈{BM25_CHAMP_ALPHA}·√df_t⌉) postings by exact
    per-term score; ub_t = the C_t-th (minimum champion) score
    upper-bounds every non-champion posting of t.
    Candidates in ANY of their query's champion lists are scored FULLY
    (their other-term postings joined back in), giving the k-th
    champion score θ_q. A doc outside every champion list scores
    ≤ Σ_t ub_t = UB_q, so when θ_q's int64 units exceed UB_q's, no
    outsider can reach the top-k even on the doc_id tiebreak (units
    are floor-quantized, monotone) and the champion result is exact.
    Queries where the bound does NOT discharge (θ ≤ UB, or fewer than
    k champion candidates) fall back to full postings — per query, in
    the same plan, via an anti-filter on the safe-query id set.

    Scale: the champion window shuffles matching postings by
    (query, token) ONCE to build lists a production deployment stores
    as an index artifact next to inverted_index_topk (amortized across
    query batches; rebuilt with the index). The full-scoring branch
    carries only unsafe queries' postings — the safe-id table is a
    ≤ {BM25_NTERMS}//2-row broadcast, so hot-term postings for safe
    queries die map-side. Bench records the postings-touched
    reduction (bm25_pruned_postings_pct)."""
    posts, qnames, _champ, champ_ranked, safe, w = _bm25_prune_parts(
        spark, sf_dir
    )
    return _bm25_pruned_final(posts, qnames, champ_ranked, safe, w)




BM25_INDEX_BUCKETS = 8


def bm25_index_tables(sf_dir: str) -> dict[str, str]:
    """Catalog names of the persisted BM25 serving artifacts, keyed by
    the documents-table fingerprint (mtime+size — a regenerated corpus
    gets new tables; the ivfpq_index_tables contract applied to
    text)."""
    import os
    from hashlib import md5

    try:
        st = os.stat(os.path.join(sf_dir, "documents.parquet"))
        key = (sf_dir, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (sf_dir,)
    fp = md5(repr(key).encode()).hexdigest()[:10]
    return {
        "postings": f"bm25_postings_{fp}",
        "stats": f"bm25_stats_{fp}",
        "corpus": f"bm25_corpus_{fp}",
    }


def build_bm25_index(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Build + persist the IMPACT-ORDERED BM25 index once — the text
    mirror of build_ivfpq_index (the serving posture a 100 TB corpus
    actually deploys):

    - `postings` (token, doc_id, tf, sc double, crk int): one row per
      (token, doc) with the PRECOMPUTED impact score — the canonical
      per-term double frozen at build time (df/dl/avgdl are corpus
      stats, so the score is query-independent) — and the champion
      rank within the token's posting list (exact for the champion
      prefix, {BM25_NONCHAMP_CRK} beyond it — serving never consumes
      non-champion ranks). Stopword postings are dropped at build:
      query terms derive from the non-stopword stats slice, so a
      stopword posting can never be probed (bm25_topk_stored's
      same-oracle hash match is the receipt). Bucketed by token and
      sorted by (token, crk): a query's terms prune to their buckets,
      and the champion filter is a stored-column predicate — serving
      NEVER windows or re-scores the postings.
    - `stats` (token, df, corpus_tf): per-term stats over the FULL
      vocabulary, stopwords included (query-term derivation, the √df
      champion depth, and frozen-df scoring of arbitrary deltas).
    - `corpus` (n_docs, n_tokens): the two corpus scalars.

    Doubles round-trip parquet exactly, so a query served from the
    stored index is bit-identical to the in-plan chain —
    bm25_topk_stored registers against the SAME oracle as bm25_topk
    and the hash match pins the stored artifacts == fresh derivation.
    Idempotent while the corpus fingerprint is unchanged.

    Scale (VERDICT r15 item 1): champion ranks come from the salted
    two-level top-C pass (_champion_ranked) — no window ever
    partitions by token over a full posting list, so the Zipf-hot
    token no longer lands its |corpus|-sized list in one task."""
    names = bm25_index_tables(sf_dir)
    if all(spark.catalog.tableExists(t) for t in names.values()):
        return names
    # stale-location cleanup (in-memory catalog, same as the ANN build)
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

    ranked, cache, stats, corpus = _bm25_build_frames(spark, sf_dir)
    try:
        (
            ranked.write.mode("overwrite")
            .bucketBy(BM25_INDEX_BUCKETS, "token")
            .sortBy("token", "crk")
            .saveAsTable(names["postings"])
        )
    finally:
        cache.unpersist()
    stats.write.mode("overwrite").saveAsTable(names["stats"])
    corpus.write.mode("overwrite").saveAsTable(names["corpus"])
    return names


def _bm25_build_frames(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The exact frames build_bm25_index persists — (ranked_postings,
    cache_to_unpersist, stats, corpus) — exposed unwritten so tests
    can audit the BUILD plan (the de-skew receipt: no window over an
    unbounded per-token partition) without touching the catalog."""
    docs = read_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("token")
    )
    tf = terms.groupBy("token", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    # same single-corpus-pass shape as _bm25_posting_scores: dl/stats/
    # corpus re-derive from the materialized tf instead of four
    # independent explode passes. Gated on `materialize` so the plan
    # audits (materialize=False) still see the full lazy build plan.
    if materialize:
        tf = tf.localCheckpoint()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = tf.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.sum("tf").alias("corpus_tf"),
    )
    corpus = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").alias("n_tokens"),
    )
    scored = (
        tf.filter(~F.col("token").isin(*STOPWORDS))
        .join(stats.select("token", "df"), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "token",
            "doc_id",
            "tf",
            _bm25_per_term_score().alias("sc"),
            "df",
        )
    )
    ranked, cache = _champion_ranked(scored, materialize=materialize)
    return ranked, cache, stats, corpus


def bm25_topk_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the PERSISTED impact-ordered index — the shape
    a production text-serving stack runs: build_bm25_index wrote the
    scored postings, per-term stats, and corpus scalars once; every
    query batch after that derives its query terms from the tiny
    stats table, probes only its terms' postings (token-bucketed, so
    the broadcast join prunes map-side), applies the champion filter
    as a stored-column predicate (crk — no query-time window over
    postings), and runs the same θ>UB exactness bound with per-query
    full-postings fallback. Output is bit-identical to bm25_topk /
    bm25_topk_pruned (stored doubles round-trip exactly), so this
    registers against the SAME oracle — the hash match pins the
    stored artifacts.

    Scale: query-time cost is O(champion postings of the query terms)
    for safe queries; the corpus-sized explode/shuffle happened once
    at build time. Appends need a stats refresh (df/avgdl drift) —
    the rebuild economics are the ANN index's, measured in bench as
    bm25_index_build_ms."""
    names = build_bm25_index(spark, sf_dir)
    return _bm25_serve_from(
        spark.table(names["postings"]), spark.table(names["stats"])
    )


def _bm25_serve_from(posts_t: DataFrame, stats_t: DataFrame) -> DataFrame:
    """Serve BM25 top-k from an arbitrary scored-postings frame
    (token, doc_id, tf, sc, crk) + stats frame — the stored tables in
    production; bench also feeds it stored ∪ in-plan delta to measure
    frozen-stats ranking drift without mutating the shared table."""
    qterms = (
        stats_t.filter(~F.col("token").isin(*STOPWORDS))
        .orderBy(F.desc("corpus_tf"), F.asc("token"))
        .limit(BM25_NTERMS)
        .select(
            "token",
            "df",
            F.row_number()
            .over(Window.orderBy(F.desc("corpus_tf"), F.asc("token")))
            .alias("trk"),
        )
        .select(
            "token",
            "df",
            F.expr("cast((trk - 1) div 2 as bigint)").alias("query_id"),
        )
    )
    qnames = qterms.groupBy("query_id").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("token"))).alias(
            "q_terms"
        )
    )
    posts = posts_t.join(
        F.broadcast(qterms.select("token", "df", "query_id")), "token"
    ).select("query_id", "token", "df", "doc_id", "sc", "crk")
    # posts (query-term postings only — small) feeds four consumers
    # (champion filter, delta-candidate filter, candidate full-score
    # join, unsafe-query fallback); without the checkpoint each one
    # re-derived the stats-window qterms subtree AND re-probed the
    # stored/delta postings union — the r18tmp audit counted the same
    # table scanned 17× and the qterms Window 25× in ONE
    # bm25_topk_after_append plan. Same guide §2.4 discipline as
    # _bm25_prune_parts (the in-plan rung's measured 272→62 fix).
    posts = posts.localCheckpoint()
    champ, champ_ranked, safe, w = _bm25_prune_parts_from(posts)
    return _bm25_pruned_final(posts, qnames, champ_ranked, safe, w)


def append_to_bm25_index(
    spark: SparkSession, sf_dir: str, new_docs: DataFrame
) -> dict[str, str]:
    """Incremental BM25 index maintenance — the cheap rung of the
    text refresh story (append_to_ivfpq_index's contract applied to
    postings): NEW documents (doc_id, text) encode map-only against
    the FROZEN stored stats — per-term df from the stats table (an
    unseen token scores with df=0, the RSJ formula's natural novel-
    term idf), corpus n_docs/n_tokens from the corpus table — and
    append to the token-bucketed postings table with the SAME bucket
    spec and the BM25_DELTA_CRK sentinel rank (delta rows never join
    champion lists; serving force-includes them as candidates, so
    results stay exact w.r.t. the frozen-stats scores). The stats and
    corpus tables are NOT touched — that staleness is the rebuild
    trigger bm25_stats_drift monitors, and the expensive rung is a
    new fingerprint's build_bm25_index + view swap.

    Precondition, ENFORCED (ADVICE r15): the increment must be NEW
    doc_ids — a delta posting for a doc already in the index would
    silently double-count that doc's score at serve (the same
    silent-duplicate class merge_apply closed). The guard broadcasts
    the increment's id set over one column-pruned scan of the stored
    postings and raises on any hit; re-ingesting an updated document
    means a new id (the corpus convention) or a rebuild.

    Scale: one explode + partial-agg over the INCREMENT only, a
    broadcast join against the |vocab| stats table, and the guard's
    single doc_id-column scan of the main index (in production the
    registry/bloom the corpus already keeps). The batch must also be
    unique WITHIN itself (ADVICE r16 — _require_unique_batch): an
    intra-batch duplicate id passes the stored-id scan yet writes two
    delta postings per token for one doc."""
    from gis_etl_spark.ops.dedup import _require_unique_batch

    names = bm25_index_tables(sf_dir)
    _require_unique_batch(new_docs, "append_to_bm25_index")
    new_ids = new_docs.select("doc_id").distinct()
    n_dup = (
        spark.table(names["postings"])
        .select("doc_id")
        .join(F.broadcast(new_ids), "doc_id", "left_semi")
        .select("doc_id")
        .distinct()
        .count()
    )
    if n_dup:
        raise ValueError(
            f"append_to_bm25_index: {n_dup} doc_id(s) of the increment "
            f"already have postings in {names['postings']}; delta rows "
            "for an existing doc would double-count its score at serve."
            " Re-ingest updated documents under new ids, or rebuild."
        )
    (
        _bm25_delta_postings(spark, names, new_docs)
        .write.mode("append")
        .bucketBy(BM25_INDEX_BUCKETS, "token")
        .sortBy("token", "crk")
        .saveAsTable(names["postings"])
    )
    return names


def _bm25_delta_postings(
    spark: SparkSession, names: dict[str, str], new_docs: DataFrame
) -> DataFrame:
    """The exact frame append_to_bm25_index writes: the increment's
    postings scored against the FROZEN stored stats, flagged with the
    delta sentinel rank. Exposed separately so bench can union it
    in-plan against the stored postings without mutating the shared
    table mid-suite (the ANN drift-recall pattern)."""
    stats_t = spark.table(names["stats"]).select("token", "df")
    corpus_t = spark.table(names["corpus"])
    terms = new_docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("token")
    )
    tf = terms.groupBy("token", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = terms.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    # dl counts every token; the delta's stored postings mirror the
    # build's stopword drop (a stopword posting is never probed)
    return (
        tf.filter(~F.col("token").isin(*STOPWORDS))
        .join(F.broadcast(stats_t), "token", "left")
        .withColumn("df", F.coalesce("df", F.lit(0)))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus_t))
        .select(
            "token",
            "doc_id",
            "tf",
            _bm25_per_term_score().alias("sc"),
            F.lit(BM25_DELTA_CRK).alias("crk"),
        )
    )


def bm25_topk_after_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-overlay serving under the HASH GATE: the stored index
    plus the deterministic increment (every doc_id % {BM25_DRIFT_MOD}
    == 0 re-ingested under id+5M — the bm25_stats_drift fixture),
    served through the same champion/θ>UB machinery with the
    increment's postings scored against the FROZEN stats. The delta is
    unioned IN-PLAN (_bm25_delta_postings — no catalog mutation, so
    the registry stays order-independent); the oracle independently
    re-derives frozen stats from the base corpus and scores the
    augmented posting set with them, so the hash match pins the
    frozen-stats append SEMANTICS — what append_to_bm25_index writes
    and the delta-candidate force-inclusion serves — not just the
    plumbing."""
    names = build_bm25_index(spark, sf_dir)
    key = names["postings"]  # fingerprint-derived
    if key not in _DELTA_PQ_CACHE:
        # materialize the increment's postings ONCE per corpus
        # fingerprint — exactly what append_to_bm25_index does to the
        # catalog, here to a scratch path so the shared tables stay
        # unmutated. Without this, each pruning branch re-derives the
        # delta explode subtree (measured 5.9 s vs 2.3 s at sf0.1).
        import os as _os
        import tempfile as _tempfile

        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        delta_docs = docs.filter(
            F.col("doc_id") % BM25_DRIFT_MOD == 0
        ).select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
        # per-process unique scratch dir (ADVICE r15: a deterministic
        # gettempdir() path is clobber-able by concurrent processes on
        # the same corpus and pre-creatable on multi-user hosts);
        # removed at interpreter exit (ADVICE r16: repeated bench runs
        # on a long-lived host would otherwise each leak a full
        # delta-postings parquet copy) — exit, not a finally here,
        # because later calls in THIS process re-read the cached path.
        import atexit as _atexit
        import shutil as _shutil

        scratch = _tempfile.mkdtemp(prefix="bm25_delta_")
        _atexit.register(_shutil.rmtree, scratch, ignore_errors=True)
        path = _os.path.join(scratch, key)
        _bm25_delta_postings(spark, names, delta_docs).write.mode(
            "overwrite"
        ).parquet(path)
        _DELTA_PQ_CACHE[key] = path
    delta = spark.read.parquet(_DELTA_PQ_CACHE[key])
    return _bm25_serve_from(
        spark.table(names["postings"]).unionByName(delta),
        spark.table(names["stats"]),
    )


# scratch-materialized delta postings per corpus fingerprint (see
# bm25_topk_after_append)
_DELTA_PQ_CACHE: dict[str, str] = {}


def bm25_topk_after_append_sql() -> str:
    """The twin scores EVERY posting of the augmented corpus (base ∪
    clones) with stats frozen to the BASE corpus — df via LEFT JOIN
    (unseen tokens score with df=0, the engine's novel-term rule),
    n_docs/n_tokens from base — no pruning, full ranking; agreement
    pins that the champion/delta-overlay serve is exact w.r.t. the
    frozen-stats scores."""
    stop = ", ".join(f"'{t}'" for t in STOPWORDS)
    k1, b = BM25_K1, BM25_B
    return f"""
        WITH terms0 AS (
          SELECT doc_id, unnest({WORDS_SQL}) AS token FROM documents
        ), tf0 AS (
          SELECT token, doc_id, count(*)::BIGINT AS tf
          FROM terms0 GROUP BY token, doc_id
        ), dl0 AS (
          SELECT doc_id, count(*)::BIGINT AS dl
          FROM terms0 GROUP BY doc_id
        ), stats0 AS (
          SELECT token, count(DISTINCT doc_id)::BIGINT AS df,
                 sum(tf)::BIGINT AS corpus_tf
          FROM tf0 GROUP BY token
        ), corpus0 AS (
          SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS n_tokens
          FROM dl0
        ), aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 5000000, text FROM documents
          WHERE doc_id % {BM25_DRIFT_MOD} = 0
        ), terms1 AS (
          SELECT doc_id, unnest({WORDS_SQL}) AS token FROM aug
        ), tf1 AS (
          SELECT token, doc_id, count(*)::BIGINT AS tf
          FROM terms1 GROUP BY token, doc_id
        ), dl1 AS (
          SELECT doc_id, count(*)::BIGINT AS dl
          FROM terms1 GROUP BY doc_id
        ), qterms AS (
          SELECT token, df,
                 ((row_number() OVER (
                     ORDER BY corpus_tf DESC, token ASC) - 1) // 2)
                   ::BIGINT AS query_id
          FROM stats0 WHERE token NOT IN ({stop})
          ORDER BY corpus_tf DESC, token ASC LIMIT {BM25_NTERMS}
        ), qnames AS (
          SELECT query_id,
                 string_agg(token, ' ' ORDER BY token) AS q_terms
          FROM qterms GROUP BY query_id
        ), scored AS (
          SELECT q.query_id, t.doc_id,
                 CAST(floor(sum(
                   ln(1.0 + (CAST(c.n_docs AS DOUBLE)
                             - CAST(coalesce(s.df, 0) AS DOUBLE) + 0.5)
                          / (CAST(coalesce(s.df, 0) AS DOUBLE) + 0.5))
                   * (CAST(t.tf AS DOUBLE) * {1.0 + k1})
                   / (CAST(t.tf AS DOUBLE) + {k1} * (1.0 - {b}
                      + {b} * CAST(d.dl AS DOUBLE)
                        * CAST(c.n_docs AS DOUBLE)
                        / CAST(c.n_tokens AS DOUBLE)))
                 ) * 1e6 + 0.5) AS BIGINT) AS score_units
          FROM tf1 t
          JOIN qterms q USING (token)
          LEFT JOIN stats0 s USING (token)
          JOIN dl1 d USING (doc_id)
          CROSS JOIN corpus0 c
          GROUP BY q.query_id, t.doc_id
        ), ranked AS (
          SELECT query_id, doc_id, score_units,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score_units DESC, doc_id ASC) AS rank
          FROM scored
        )
        SELECT r.query_id, n.q_terms, r.rank, r.doc_id, r.score_units
        FROM ranked r JOIN qnames n USING (query_id)
        WHERE r.rank <= {BM25_TOPK}
        ORDER BY r.query_id, r.rank
    """


def compact_bm25_index(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """MINOR compaction — the middle rung of the index lifecycle
    (build → append → COMPACT → rebuild): fold the delta postings into
    the main champion structure WITHOUT touching the frozen stats.
    Only the tokens the delta touched are re-ranked (champion rank =
    row_number over (sc DESC, doc_id) across main + delta rows of that
    token); every other token's rows pass through byte-identical.
    Scores are already frozen-stats scores, so serving output is
    provably UNCHANGED — the θ>UB bound is exact in both
    configurations and the per-doc scores are the same doubles —
    while the delta overlay shrinks to zero (no more force-included
    candidates; compacted delta rows compete for champion slots like
    any main row). Receipt: tests pin serve-before == serve-after and
    zero remaining sentinel rows.

    Scale: the touched-token set is ≤ |delta vocabulary| (broadcast);
    re-ranking shuffles only touched tokens' postings and goes through
    the same salted two-level champion pass as the build (a delta can
    touch a Zipf-hot token — its full list must never land in one
    task); the swap is a new bucketed table + two catalog renames,
    never an in-place rewrite (you cannot overwrite a table you are
    reading). Swap order (ADVICE r15): live → *_old, tmp → live, drop
    *_old — the only failure window leaves *_old recoverable by a
    rename instead of NO table under the serving name."""
    names = bm25_index_tables(sf_dir)
    posts = spark.table(names["postings"])
    touched = (
        posts.filter(F.col("crk") == BM25_DELTA_CRK)
        .select("token")
        .distinct()
    )
    untouched = posts.join(F.broadcast(touched), "token", "left_anti")
    # champion depth needs the FROZEN df; a delta-only token absent
    # from stats ranks with df=0 depth (it can never be a query term)
    touched_stats = (
        spark.table(names["stats"])
        .select("token", "df")
        .join(F.broadcast(touched), "token", "left_semi")
    )
    scored = (
        posts.join(F.broadcast(touched), "token", "left_semi")
        .drop("crk")
        .join(F.broadcast(touched_stats), "token", "left")
        .withColumn("df", F.coalesce("df", F.lit(0)))
    )
    reranked, cache = _champion_ranked(scored)
    compacted = untouched.unionByName(reranked)
    tmp_name = f"{names['postings']}_compacting"
    old_name = f"{names['postings']}_old"
    import os as _os
    import shutil
    from urllib.parse import urlparse

    for t in (tmp_name, old_name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # stale-directory cleanup (in-memory catalog: a crashed prior
        # run can orphan the location a rename would move onto)
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
        if wh.scheme in ("", "file") and wh.path:
            loc = _os.path.join(wh.path, t.lower())
            if _os.path.exists(loc):
                shutil.rmtree(loc, ignore_errors=True)
    try:
        (
            compacted.write.mode("overwrite")
            .bucketBy(BM25_INDEX_BUCKETS, "token")
            .sortBy("token", "crk")
            .saveAsTable(tmp_name)
        )
    finally:
        cache.unpersist()
    spark.sql(f"ALTER TABLE {names['postings']} RENAME TO {old_name}")
    spark.sql(f"ALTER TABLE {tmp_name} RENAME TO {names['postings']}")
    spark.sql(f"DROP TABLE {old_name}")
    return names


def bm25_stats_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rebuild-trigger monitor for the stored BM25 index — the
    text analog of ann_drift_stat: how stale are the FROZEN stats the
    delta postings score with? For each of the index's query terms
    (the serving-relevant slice): frozen df (read from the STORED
    stats table, so a hash match also pins the stored artifact)
    vs fresh df over the corpus + the deterministic delta increment
    (every doc_id % {BM25_DRIFT_MOD} == 0 re-ingested under a new id —
    the bench append fixture), plus the corpus-level avgdl in
    milli-tokens, frozen vs fresh. All integers; `df_drift_x1000` =
    df_fresh·1000 div df_frozen is the per-term trigger the operating
    rule charts.

    Output: (token, df_frozen, df_fresh, df_drift_x1000,
    avgdl_frozen_milli, avgdl_fresh_milli), ordered by token.

    Scale: fresh stats are one partial-agg pass over base + increment;
    the frozen side reads the |vocab| stats table; the join is
    ≤ {BM25_NTERMS} rows."""
    names = build_bm25_index(spark, sf_dir)
    stats_t = spark.table(names["stats"])
    corpus_t = spark.table(names["corpus"])

    qtok = (
        stats_t.filter(~F.col("token").isin(*STOPWORDS))
        .orderBy(F.desc("corpus_tf"), F.asc("token"))
        .limit(BM25_NTERMS)
        .select("token", F.col("df").alias("df_frozen"))
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = docs.filter(F.col("doc_id") % BM25_DRIFT_MOD == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    aug = docs.unionByName(delta)
    terms = aug.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("token")
    )
    fresh = terms.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df_fresh")
    )
    fresh_corpus = (
        terms.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("dl"))
        .agg(
            F.expr("(sum(dl) * 1000) div count(*)").alias(
                "avgdl_fresh_milli"
            )
        )
    )
    frozen_corpus = corpus_t.select(
        F.expr("(n_tokens * 1000) div n_docs").alias("avgdl_frozen_milli")
    )
    return (
        qtok.join(fresh, "token")
        .crossJoin(F.broadcast(frozen_corpus))
        .crossJoin(F.broadcast(fresh_corpus))
        .select(
            "token",
            "df_frozen",
            "df_fresh",
            F.expr("(df_fresh * 1000) div df_frozen").alias(
                "df_drift_x1000"
            ),
            "avgdl_frozen_milli",
            "avgdl_fresh_milli",
        )
        .orderBy("token")
    )


def bm25_stats_drift_sql() -> str:
    """The twin re-derives the 'frozen' side from the base documents
    (the stored stats table IS deterministic in the corpus, so
    agreement also pins the artifact) and the fresh side from the
    same base + increment union."""
    stop = ", ".join(f"'{t}'" for t in STOPWORDS)
    return f"""
        WITH terms0 AS (
          SELECT doc_id, unnest({WORDS_SQL}) AS token FROM documents
        ), stats0 AS (
          SELECT token, count(DISTINCT doc_id)::BIGINT AS df,
                 count(*)::BIGINT AS corpus_tf
          FROM terms0 GROUP BY token
        ), qtok AS (
          SELECT token, df AS df_frozen
          FROM stats0 WHERE token NOT IN ({stop})
          ORDER BY corpus_tf DESC, token ASC LIMIT {BM25_NTERMS}
        ), dl0 AS (
          SELECT doc_id, count(*)::BIGINT AS dl
          FROM terms0 GROUP BY doc_id
        ), frozen_c AS (
          SELECT (sum(dl) * 1000) // count(*) AS avgdl_frozen_milli
          FROM dl0
        ), aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 5000000, text FROM documents
          WHERE doc_id % {BM25_DRIFT_MOD} = 0
        ), terms1 AS (
          SELECT doc_id, unnest({WORDS_SQL}) AS token FROM aug
        ), fresh AS (
          SELECT token, count(DISTINCT doc_id)::BIGINT AS df_fresh
          FROM terms1 GROUP BY token
        ), dl1 AS (
          SELECT doc_id, count(*)::BIGINT AS dl
          FROM terms1 GROUP BY doc_id
        ), fresh_c AS (
          SELECT (sum(dl) * 1000) // count(*) AS avgdl_fresh_milli
          FROM dl1
        )
        SELECT q.token, q.df_frozen, f.df_fresh,
               ((f.df_fresh * 1000) // q.df_frozen)::BIGINT
                 AS df_drift_x1000,
               fc.avgdl_frozen_milli::BIGINT AS avgdl_frozen_milli,
               rc.avgdl_fresh_milli::BIGINT AS avgdl_fresh_milli
        FROM qtok q
        JOIN fresh f USING (token)
        CROSS JOIN frozen_c fc
        CROSS JOIN fresh_c rc
        ORDER BY q.token
    """


def bm25_topk_sql() -> str:
    """The twin rebuilds tf/df/dl/corpus stats, the same query-term
    ranking, and the token-for-token score expression in DuckDB."""
    stop = ", ".join(f"'{t}'" for t in STOPWORDS)
    k1, b = BM25_K1, BM25_B
    return f"""
        WITH terms AS (
          SELECT doc_id, unnest({WORDS_SQL}) AS token FROM documents
        ), tf AS (
          SELECT token, doc_id, count(*)::BIGINT AS tf
          FROM terms GROUP BY token, doc_id
        ), dl AS (
          SELECT doc_id, count(*)::BIGINT AS dl
          FROM terms GROUP BY doc_id
        ), stats AS (
          SELECT token, count(DISTINCT doc_id)::BIGINT AS df,
                 sum(tf)::BIGINT AS corpus_tf
          FROM tf GROUP BY token
        ), corpus AS (
          SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS n_tokens
          FROM dl
        ), qterms AS (
          SELECT token, df,
                 ((row_number() OVER (
                     ORDER BY corpus_tf DESC, token ASC) - 1) // 2)
                   ::BIGINT AS query_id
          FROM stats WHERE token NOT IN ({stop})
          ORDER BY corpus_tf DESC, token ASC LIMIT {BM25_NTERMS}
        ), qnames AS (
          SELECT query_id,
                 string_agg(token, ' ' ORDER BY token) AS q_terms
          FROM qterms GROUP BY query_id
        ), scored AS (
          SELECT q.query_id, t.doc_id,
                 CAST(floor(sum(
                   ln(1.0 + (CAST(c.n_docs AS DOUBLE)
                             - CAST(q.df AS DOUBLE) + 0.5)
                          / (CAST(q.df AS DOUBLE) + 0.5))
                   * (CAST(t.tf AS DOUBLE) * {1.0 + k1})
                   / (CAST(t.tf AS DOUBLE) + {k1} * (1.0 - {b}
                      + {b} * CAST(d.dl AS DOUBLE)
                        * CAST(c.n_docs AS DOUBLE)
                        / CAST(c.n_tokens AS DOUBLE)))
                 ) * 1e6 + 0.5) AS BIGINT) AS score_units
          FROM tf t
          JOIN qterms q USING (token)
          JOIN dl d USING (doc_id)
          CROSS JOIN corpus c
          GROUP BY q.query_id, t.doc_id
        ), ranked AS (
          SELECT query_id, doc_id, score_units,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score_units DESC, doc_id ASC) AS rank
          FROM scored
        )
        SELECT r.query_id, n.q_terms, r.rank, r.doc_id, r.score_units
        FROM ranked r JOIN qnames n USING (query_id)
        WHERE r.rank <= {BM25_TOPK}
        ORDER BY r.query_id, r.rank
    """


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, fully relational: explode → tf per (doc, term) → idf by
    document frequency → top-3 terms per doc by tf·idf. Two shuffles
    (term stats + window) — the standard scalable formulation; the
    vocabulary table broadcasts back."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar, one job — stable across engines
    terms = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("term")
    )
    # tf feeds two consumers (the df rollup and the scoring join); the
    # two branches share one IDENTICAL (doc_id, term) exchange, which
    # runtime exchange reuse already executes once — an r18 eager
    # checkpoint here showed no in-suite win for the same reason the
    # mixture-family one regressed (see mixture_token_plan). Left lazy.
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = tf.join(F.broadcast(df_counts), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


EMB_PAIR_SLICE = 2000   # all-pairs gate: doc_id < 2000 (see docstring)
EMB_DEDUP_T = 0.35      # cosine threshold shared with dedup_embedding_lsh

EVAL_MOD = 97           # doc_id % 97 == 0 plays the held-out benchmark set
DECON_NGRAM = 5         # decontamination shingle width (words)
DECON_T = 2             # ≥ 2 shared 5-grams → contaminated


def decon_shingle_arr(tokens_col: str) -> Column:
    """Distinct DECON_NGRAM-gram shingle array over a token-array
    column (referenced BY NAME — the transform lambda indexes it).
    The single source of the shingle expression for
    decontaminate_overlap, chunk_decontaminate, and the streaming
    twin: batch/stream parity is structural, not copy-synchronized."""
    n = DECON_NGRAM
    parts = ", ".join(f"{tokens_col}[i+{k}]" for k in range(n))
    return F.array_distinct(
        F.when(
            F.size(tokens_col) >= n,
            F.expr(
                f"transform(sequence(0, size({tokens_col}) - {n}), "
                f"i -> concat_ws(' ', {parts}))"
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def chunk_token_windows(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, n_tok, cw): the CHUNK_TOKENS/CHUNK_STRIDE
    token windows of a (doc_id, text) frame WITH the token slice
    (chunk_select's md5 sibling keeps only the fingerprint). Pure
    select/explode — stateless, stream-legal; shared by
    chunk_decontaminate and streaming_chunk_decontaminate."""
    C, S = CHUNK_TOKENS, CHUNK_STRIDE
    w = words_col(F.col("text"))
    staged = docs.select(
        "doc_id", w.alias("ws"), F.size(w).alias("n")
    ).withColumn(
        "n_chunks",
        F.when(F.col("n") <= C, F.lit(1)).otherwise(
            F.lit(1) + F.expr(f"div(n - {C} + {S} - 1, {S})")
        ),
    )
    return staged.select(
        "doc_id",
        "ws",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n_chunks") - 1)
        ).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.least(
            F.lit(C), F.col("n") - F.col("chunk_idx") * S
        ).alias("n_tok"),
        F.slice(F.col("ws"), F.col("chunk_idx") * S + 1, C).alias("cw"),
    )


def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the training-data op that removes
    documents overlapping a held-out eval set (the fixture has no eval
    corpus, so docs with doc_id % EVAL_MOD == 0 play that role
    deterministically).

    Shape: distinct 5-gram word shingles of the EVAL docs (eval sets
    are small) broadcast against the corpus's shingles — a map-side
    semi-join at any corpus scale — then a per-doc count of shared
    shingles. Output audits the FULL non-eval corpus: (doc_id,
    n_shared, contaminated), zero-overlap docs included via left join."""
    docs = read_table(spark, sf_dir, "documents")

    def shingles(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id", words_col(F.col("text")).alias("ws")
        ).select("doc_id", F.explode(decon_shingle_arr("ws")).alias("sh"))

    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_sh = shingles(docs.filter(is_eval)).select("sh").distinct()
    corpus_sh = shingles(docs.filter(~is_eval))
    hits = (
        corpus_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        docs.filter(~is_eval)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= DECON_T).alias(
                "contaminated"
            ),
        )
        .orderBy("doc_id")
    )


def chunk_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination at CHUNK granularity — the composition of
    decontaminate_overlap's 5-gram eval audit with document_chunks'
    windowing, reported per (doc_id, chunk_idx): what a pretraining
    pipeline actually blocks on (killing a whole document for one
    contaminated window throws away clean tokens; killing nothing
    leaks the eval set).

    Semantics: eval set = doc_id % EVAL_MOD == 0 (document-level
    shingles, same as decontaminate_overlap); every CHUNK_TOKENS-token
    window of every NON-eval document reports its count of distinct
    5-gram shingles shared with the eval set, zero-overlap chunks
    included. contaminated = n_shared >= DECON_T.

    Scale shape: one map-only pass chunks + shingles the corpus (the
    bounded explode of document_chunks, then the bounded per-chunk
    shingle explode); the eval shingle set broadcasts (eval sets are
    small by construction); one hash-agg on (doc_id, chunk_idx). No
    all-pairs anywhere — identical posture to the two parents, so the
    composition inherits their 100 TB story unchanged."""
    docs = read_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_sh = (
        docs.filter(is_eval)
        .select(words_col(F.col("text")).alias("ws"))
        .select(F.explode(decon_shingle_arr("ws")).alias("sh"))
        .distinct()
    )
    chunks = chunk_token_windows(docs.filter(~is_eval))
    ch_sh = chunks.select(
        "doc_id",
        "chunk_idx",
        F.explode(decon_shingle_arr("cw")).alias("sh"),
    )
    hits = (
        ch_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id", "chunk_idx")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        chunks.select("doc_id", "chunk_idx", "n_tok")
        .join(hits, ["doc_id", "chunk_idx"], "left")
        .select(
            "doc_id",
            "chunk_idx",
            "n_tok",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= DECON_T).alias(
                "contaminated"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_CHUNK_DECON_PARTS = " || ' ' || ".join(
    f"w[i+{k}]" for k in range(DECON_NGRAM)
)
_CHUNK_DECON_CW_PARTS = " || ' ' || ".join(
    f"cw[i+{k}]" for k in range(DECON_NGRAM)
)
CHUNK_DECON_SQL = f"""
WITH ws AS (
  SELECT doc_id, {WORDS_SQL} AS w FROM documents
), eval_sh AS (
  SELECT DISTINCT {_CHUNK_DECON_PARTS} AS sh
  FROM ws, unnest(range(1, greatest(len(w) - {DECON_NGRAM - 2}, 1)))
       AS t(i)
  WHERE doc_id % {EVAL_MOD} = 0
), base AS (
  SELECT doc_id, w AS tok, len(w) AS n FROM ws
  WHERE doc_id % {EVAL_MOD} != 0
), idx AS (
  SELECT doc_id, tok, n,
         unnest(range(0, CASE WHEN n <= {CHUNK_TOKENS} THEN 1
           ELSE 1 + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                    // {CHUNK_STRIDE} END)) AS chunk_idx
  FROM base
), chunks AS (
  SELECT doc_id, chunk_idx,
         least({CHUNK_TOKENS}, n - chunk_idx * {CHUNK_STRIDE}) AS n_tok,
         list_slice(tok, chunk_idx * {CHUNK_STRIDE} + 1,
                    chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}) AS cw
  FROM idx
), csh AS (
  SELECT DISTINCT doc_id, chunk_idx, {_CHUNK_DECON_CW_PARTS} AS sh
  FROM chunks,
       unnest(range(1, greatest(len(cw) - {DECON_NGRAM - 2}, 1))) AS t(i)
), hits AS (
  SELECT c.doc_id, c.chunk_idx, count(*) AS n_shared
  FROM csh c JOIN eval_sh e USING (sh)
  GROUP BY c.doc_id, c.chunk_idx
)
SELECT ch.doc_id, ch.chunk_idx, ch.n_tok,
       coalesce(h.n_shared, 0) AS n_shared,
       coalesce(h.n_shared, 0) >= {DECON_T} AS contaminated
FROM chunks ch LEFT JOIN hits h USING (doc_id, chunk_idx)
ORDER BY doc_id, chunk_idx
"""


def text_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality rules, after Rae et al. 2021
    §A1.1 (the rule *shapes* — word-count bounds, mean word length
    band, symbol ratio, max single-word dominance); the thresholds
    here are fixture-tuned (10-100k words, mean length 2-12), not the
    paper's exact cutoffs.

    Degenerate docs: empty/whitespace-only text yields NULL ratios on
    both engines (guarded divisions — Spark's non-ANSI x/0 NULL vs
    DuckDB's IEEE NaN would otherwise diverge) and passes_gopher is
    simply false via the word-count bound. A NULL text produces no
    exploded words, so the inner join drops the document — acceptable
    for this fixture (no NULL texts); corpora with NULL texts want a
    left join + coalesce(max_word_count, 0).

    Scale shape: the per-doc scalars are row-local column expressions;
    the one stat that needs word frequencies (top-word dominance) is
    explode → two-phase count → max — a hash shuffle keyed on
    (doc_id, word), NOT a per-row fold over the word array (which is
    O(words²) per document and dies on long documents). The join back
    to the scalar side co-partitions on doc_id.
    """
    docs = read_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    top = (
        docs.select("doc_id", F.explode(w).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_word_count"))
    )
    staged = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.length(F.regexp_replace(F.trim("text"), " ", "")).alias("n_chars"),
        F.length(
            F.regexp_replace(F.trim("text"), "[A-Za-z0-9 ]", "")
        ).alias("n_symbols"),
    ).join(top, "doc_id")
    # guarded denominators: NULL (not NaN/inf) on degenerate docs,
    # matching the oracle's nullif()
    n_words_nz = F.when(F.col("n_words") > 0, F.col("n_words"))
    n_chars_nz = F.when(F.col("n_chars") > 0, F.col("n_chars"))
    mean_len = F.col("n_chars") / n_words_nz
    return staged.select(
        "doc_id",
        "n_words",
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(F.col("n_symbols") / n_chars_nz, 4).alias("symbol_ratio"),
        F.round(F.col("max_word_count") / n_words_nz, 4).alias(
            "top_word_frac"
        ),
        (
            F.col("n_words").between(10, 100_000)
            & mean_len.between(2.0, 12.0)
            & (F.col("n_symbols") / n_chars_nz <= 0.1)
            & (F.col("max_word_count") / n_words_nz <= 0.2)
        ).alias("passes_gopher"),
    ).orderBy("doc_id")


REP_DUP_T = 0.2  # duplicate-trigram fraction flag threshold (fixture-tuned)


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter — the Gopher-family rule class text_gopher_flags
    does NOT cover (Rae et al. 2021 §A1.1 also drops documents whose
    content repeats; rule *shape* reproduced here over word trigrams,
    thresholds fixture-tuned): per document, total vs distinct trigram
    counts, the duplicate-trigram fraction, and the single most
    repeated trigram's share.

    Plan shape: ZERO shuffle — all three stats are row-local
    higher-order functions over the (doc-sized) trigram array:
    size, array_distinct, and max multiplicity via sort + one-pass
    run-length fold (O(n log n) per row, never the O(n²)
    count-each-element fold). The explode → two-phase-count rendition
    (the gopher top-word path) shuffled every (doc, trigram) string
    pair and benched 7.1 s at sf0.1; this runs in whole-stage codegen
    at scan speed. For pathological single-row documents (arrays past
    ~millions of words) the exploded rendition bounds memory better —
    that trade is the docstring's to state, and corpus docs are
    nowhere near it. Docs with < 3 words yield 0 trigrams, NULL
    fractions, repetitive = false through the guarded comparison.
    """
    docs = read_table_spread(spark, sf_dir, "documents")
    # stage the word array as an ATTRIBUTE before the lambda: an
    # expression referenced inside transform() is re-evaluated per
    # element (re-splitting the whole text → O(words²) per doc)
    words = docs.select("doc_id", words_col(F.col("text")).alias("ws"))
    tri = F.when(
        F.size("ws") >= 3,
        F.expr(
            "transform(sequence(0, size(ws) - 3), "
            "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    # max multiplicity: sort, then fold counting the longest equal run
    top_count = F.expr(
        "aggregate(array_sort(_tri), "
        "struct(cast(null as string) AS prev, 0L AS run, 0L AS best), "
        "(s, x) -> struct(x, "
        "  if(x <=> s.prev, s.run + 1, 1L), "
        "  greatest(s.best, if(x <=> s.prev, s.run + 1, 1L))), "
        "s -> s.best)"
    )
    staged = words.select(
        "doc_id",
        tri.alias("_tri"),
    ).select(
        "doc_id",
        F.size("_tri").cast("long").alias("n_trigrams"),
        F.size(F.array_distinct("_tri")).cast("long").alias("n_distinct"),
        top_count.alias("top_count"),
    )
    n_tri_nz = F.when(F.col("n_trigrams") > 0, F.col("n_trigrams"))
    dup_frac = (F.col("n_trigrams") - F.col("n_distinct")) / n_tri_nz
    return staged.select(
        "doc_id",
        "n_trigrams",
        "n_distinct",
        F.round(dup_frac, 4).alias("dup_frac"),
        F.round(F.col("top_count") / n_tri_nz, 4).alias("top_frac"),
        ((F.col("n_trigrams") > 0) & (dup_frac > REP_DUP_T)).alias(
            "repetitive"
        ),
    ).orderBy("doc_id")


def text_repetition_sql() -> str:
    return f"""
        WITH base AS (
          SELECT doc_id, {WORDS_SQL} AS ws FROM documents
        ), tri AS (
          -- scalar range() returns a LIST, so the comprehension stays
          -- row-local (DuckDB's table range() can't lateral-join on ws)
          SELECT doc_id,
                 unnest([ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                         for i in range(1, greatest(len(ws) - 1, 1))])
                   AS tri
          FROM base
        ), counted AS (
          SELECT doc_id, sum(c)::BIGINT AS n_trigrams,
                 count(*) AS n_distinct, max(c) AS top_count
          FROM (SELECT doc_id, tri, count(*) AS c FROM tri
                GROUP BY doc_id, tri)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(n_trigrams, 0) AS n_trigrams,
               coalesce(n_distinct, 0) AS n_distinct,
               round((n_trigrams - n_distinct) * 1.0
                     / nullif(n_trigrams, 0), 4) AS dup_frac,
               round(top_count * 1.0 / nullif(n_trigrams, 0), 4)
                 AS top_frac,
               (coalesce(n_trigrams, 0) > 0
                AND (n_trigrams - n_distinct) * 1.0
                    / nullif(n_trigrams, 0) > {REP_DUP_T})
                 AS repetitive
        FROM documents d LEFT JOIN counted USING (doc_id)
        ORDER BY d.doc_id
    """


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
# Octet-exact IPv4 (0-255 per octet) with NO lookarounds — DuckDB's
# RE2 has neither lookahead nor backreferences, so the pattern set is
# restricted to the RE2 ∩ java.util.regex common subset by design.
_PII_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_PII_IPV4 = rf"\b{_PII_OCTET}\.{_PII_OCTET}\.{_PII_OCTET}\.{_PII_OCTET}\b"
# 16-digit card shape in 4-groups (separator - or space; mixed allowed:
# a backreference would pin them equal, but RE2 has no backreferences).
# Shape only — Luhn validity is audited separately (n_cards_luhn):
# redaction is deliberately conservative (a redacted false positive is
# harmless; a leaked true positive is not).
_PII_CARD = r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection — the redaction-gate scan every training-data
    pipeline runs (emails / phone-shaped / SSN-shaped tokens).

    The synthetic corpus contains no PII, so the query plants a
    deterministic contact line on every 10th doc and an SSN-shaped
    token on every 21st INSIDE the query (identical expression in the
    oracle SQL) — the detector is exercised on realistic positives
    without mutating shared fixtures; regex edge cases are unit-tested
    on adversarial literals. All-native regexp_count, no Python."""
    docs = read_table(spark, sf_dir, "documents")
    txt = pii_planted_txt()
    staged = docs.select(
        "doc_id",
        F.regexp_count(txt, F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(txt, F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count(txt, F.lit(_PII_SSN)).alias("n_ssns"),
    )
    return staged.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ssns",
        (
            (F.col("n_emails") + F.col("n_phones") + F.col("n_ssns")) > 0
        ).alias("has_pii"),
    ).orderBy("doc_id")


def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, EXACT all-pairs rendition — the
    verification baseline for ops.similarity.dedup_embedding_lsh, which
    is the production path. Quadratic by construction, therefore hard-
    gated to doc_id < EMB_PAIR_SLICE on both engine and oracle sides:
    at corpus scale this plan is intentionally disallowed (the gate
    keeps the cross join ≤ 2000² regardless of input size)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang").filter(
        F.col("doc_id") < EMB_PAIR_SLICE
    )
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "lang", "v"
    )
    a = joined.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"),
        F.col("v").alias("va"),
    )
    b = joined.select(
        F.col("doc_id").alias("doc_b"), F.col("v").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(F.col("va"), lambda x: x * x),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(F.col("vb"), lambda x: x * x),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", "lang_a", (dot / (na * nb)).alias("cos")
        )
        .filter(F.col("cos") >= EMB_DEDUP_T)
        .select("doc_a", "doc_b", "lang_a", F.round("cos", 6).alias("sim"))
        .orderBy("doc_a", "doc_b")
    )


def oracle_sqls() -> dict[str, str]:
    w = WORDS_SQL
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    hits = {
        lang: (
            f"len(list_filter({w}, x -> x IN "
            f"({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    # argmax with declaration-order tie-break, as nested CASE
    langs = list(LANG_MARKERS)
    pred_expr = f"'{langs[0]}'"
    best_expr = hits[langs[0]]
    for lang in langs[1:]:
        pred_expr = (
            f"CASE WHEN {hits[lang]} > ({best_expr}) THEN '{lang}' "
            f"ELSE ({pred_expr}) END"
        )
        best_expr = (
            f"CASE WHEN {hits[lang]} > ({best_expr}) THEN {hits[lang]} "
            f"ELSE ({best_expr}) END"
        )
    norm = "regexp_replace(lower(trim(text)), ' +', ' ', 'g')"
    tfidf_sql = f"""
        WITH terms AS (
          SELECT doc_id, unnest({w}) AS term FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM terms GROUP BY doc_id, term
        ), dfc AS (
          SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
        ), scored AS (
          SELECT tf.doc_id, tf.term,
                 round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0
                                  / dfc.df), 6) AS tfidf
          FROM tf JOIN dfc USING (term)
        ), ranked AS (
          SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term ASC) AS rk
          FROM scored
        )
        SELECT doc_id, term, tfidf, rk FROM ranked
        WHERE rk <= 3 ORDER BY doc_id, rk
    """
    emb_pair_cos = (
        "list_dot_product(a.va, b.vb) / "
        "(sqrt(list_dot_product(a.va, a.va)) * "
        "sqrt(list_dot_product(b.vb, b.vb)))"
    )
    emb_pairs_sql = f"""
        WITH j AS (
          SELECT d.doc_id, d.lang, e.embedding::DOUBLE[] AS v
          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
          WHERE d.doc_id < {EMB_PAIR_SLICE}
        ), a AS (SELECT doc_id AS doc_a, lang AS lang_a, v AS va FROM j),
        b AS (SELECT doc_id AS doc_b, v AS vb FROM j)
        SELECT doc_a, doc_b, lang_a, round({emb_pair_cos}, 6) AS sim
        FROM a JOIN b ON doc_a < doc_b
        WHERE {emb_pair_cos} >= {EMB_DEDUP_T}
        ORDER BY doc_a, doc_b
    """
    decon_parts = " || ' ' || ".join(
        f"w[i+{k}]" for k in range(DECON_NGRAM)
    )
    decon_sql = f"""
        WITH ws AS (
          SELECT doc_id, {WORDS_SQL} AS w FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, {decon_parts} AS sh
          FROM ws, unnest(range(1, greatest(len(w) - {DECON_NGRAM - 2}, 1)))
               AS t(i)
        ), eval_sh AS (
          SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} = 0
        ), hits AS (
          SELECT s.doc_id, count(*) AS n_shared
          FROM sh s JOIN eval_sh e USING (sh)
          WHERE s.doc_id % {EVAL_MOD} != 0
          GROUP BY s.doc_id
        )
        SELECT d.doc_id,
               coalesce(h.n_shared, 0) AS n_shared,
               coalesce(h.n_shared, 0) >= {DECON_T} AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % {EVAL_MOD} != 0
        ORDER BY d.doc_id
    """

    # the SHARED planted-positive text (pii_planted_txt_sql): the r14
    # ipv4/card plants ride along but match none of the three patterns
    # counted here, so pii_scan's output is unchanged — one text
    # expression everywhere beats three drifting copies.
    pii_txt = pii_planted_txt_sql()
    pii_sql = f"""
        WITH staged AS (
          SELECT doc_id,
                 len(regexp_extract_all({pii_txt}, '{_PII_EMAIL}'))
                   AS n_emails,
                 len(regexp_extract_all({pii_txt}, '{_PII_PHONE}'))
                   AS n_phones,
                 len(regexp_extract_all({pii_txt}, '{_PII_SSN}'))
                   AS n_ssns
          FROM documents
        )
        SELECT doc_id, n_emails, n_phones, n_ssns,
               (n_emails + n_phones + n_ssns) > 0 AS has_pii
        FROM staged ORDER BY doc_id
    """

    return {
        "tfidf_top_terms": tfidf_sql,
        "dedup_embedding_pairs": emb_pairs_sql,
        "decontaminate_overlap": decon_sql,
        "pii_scan": pii_sql,
        "text_token_stats": f"""
            SELECT doc_id,
                   len({w}) AS n_tokens,
                   len(list_distinct({w})) AS n_distinct,
                   length(replace(trim(text), ' ', '')) AS n_letters,
                   round(length(replace(trim(text), ' ', ''))
                         / len({w}), 4) AS avg_token_len
            FROM documents
        """,
        "regex_token_stats": f"""
            WITH m AS (
              SELECT doc_id, len({w}) AS n_ws,
                     len(list_filter(
                       regexp_extract_all(text,
                         '{BPE_PRETOKEN_RE.replace("'", "''")}'),
                       x -> trim(x) != '')) AS n_re
              FROM documents
            )
            SELECT doc_id, n_ws AS n_tokens_ws, n_re AS n_tokens_re,
                   round(n_re::DOUBLE / n_ws::DOUBLE, 4) AS re_per_ws
            FROM m ORDER BY doc_id
        """,
        "text_quality_scores": f"""
            WITH s AS (
              SELECT doc_id, len({w}) AS n,
                     len(list_distinct({w})) AS nd,
                     len(list_filter({w}, x -> x IN ({stop_list}))) AS nstop
              FROM documents
            )
            SELECT doc_id,
                   round(nstop * 1.0 / n, 4) AS stopword_ratio,
                   round(nd * 1.0 / n, 4) AS diversity,
                   round(least(n / 100.0, 1.0) * (nd * 1.0 / n)
                         * (1.0 - nstop * 1.0 / n), 4) AS quality_score
            FROM s
        """,
        "lang_id": f"""
            SELECT doc_id, lang,
                   ({pred_expr}) AS predicted_lang,
                   ({best_expr}) AS best_hits
            FROM documents
        """,
        "doc_fingerprints": f"""
            SELECT doc_id,
                   {h60_sql(norm)} AS fingerprint,
                   {h60_sql(norm)} >> 44 AS bucket16
            FROM documents
        """,
        "token_stats_by_lang": f"""
            SELECT lang, count(*) AS n_docs,
                   sum(len({w}))::BIGINT AS total_tokens,
                   round(avg(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "top_tokens": f"""
            SELECT token, count(*) AS cnt
            FROM (SELECT unnest({w}) AS token FROM documents)
            GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 25
        """,
        # the sketch only proposes candidates; the engine's output is
        # exact counts past a relative threshold, so the oracle is a
        # plain HAVING — ceil(frac·N) computes on the same doubles
        "heavy_hitter_tokens": f"""
            WITH t AS (SELECT unnest({w}) AS token FROM documents),
            tot AS (SELECT count(*) AS n FROM t),
            c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token)
            SELECT c.token AS token, c.cnt AS cnt
            FROM c, tot
            WHERE c.cnt >= CAST(ceil({HH_FRAC} * tot.n) AS BIGINT)
            ORDER BY cnt DESC, token ASC
        """,
        "inverted_index_topk": f"""
            WITH terms AS (
              SELECT doc_id, unnest({w}) AS token FROM documents
            ), tf AS (
              SELECT token, doc_id, count(*) AS tf
              FROM terms GROUP BY token, doc_id
            ), stats AS (
              SELECT token, count(DISTINCT doc_id) AS df,
                     sum(tf)::BIGINT AS corpus_tf
              FROM tf GROUP BY token
            ), ranked AS (
              SELECT token, doc_id, tf,
                     row_number() OVER (PARTITION BY token
                                        ORDER BY tf DESC, doc_id) AS rank
              FROM tf
            )
            SELECT r.token, s.df, s.corpus_tf, r.rank, r.doc_id, r.tf
            FROM ranked r JOIN stats s USING (token)
            WHERE r.rank <= {II_TOP_K} AND s.df >= {II_MIN_DF}
            ORDER BY r.token, r.rank
        """,
        "document_chunks": f"""
            WITH {_CHUNK_CTE_SQL}
            SELECT doc_id, chunk_idx, n_tok, chunk_md5
            FROM chunks ORDER BY doc_id, chunk_idx
        """,
        "chunk_dedup_groups": f"""
            WITH {_CHUNK_CTE_SQL}, agg AS (
              SELECT chunk_md5, count(*) AS n_copies,
                     count(DISTINCT doc_id) AS n_docs
              FROM chunks GROUP BY chunk_md5 HAVING count(*) > 1
            ), keeper AS (
              SELECT chunk_md5, doc_id AS keeper_doc,
                     chunk_idx AS keeper_idx
              FROM (SELECT chunk_md5, doc_id, chunk_idx,
                           row_number() OVER (
                             PARTITION BY chunk_md5
                             ORDER BY doc_id, chunk_idx) AS rn
                    FROM chunks)
              WHERE rn = 1
            )
            SELECT a.chunk_md5, a.n_copies, a.n_docs,
                   k.keeper_doc, k.keeper_idx
            FROM agg a JOIN keeper k USING (chunk_md5)
            ORDER BY a.chunk_md5
        """,
        "text_gopher_flags": f"""
            WITH tw AS (
              SELECT doc_id, max(c) AS max_word_count FROM (
                SELECT doc_id, count(*) AS c
                FROM (SELECT doc_id, unnest({w}) AS word FROM documents)
                GROUP BY doc_id, word
              ) GROUP BY doc_id
            ), s AS (
              SELECT doc_id,
                     len({w}) AS n_words,
                     length(replace(trim(text), ' ', '')) AS n_chars,
                     length(regexp_replace(trim(text), '[A-Za-z0-9 ]', '',
                                           'g')) AS n_symbols
              FROM documents
            )
            SELECT s.doc_id, n_words,
                   round(n_chars * 1.0 / nullif(n_words, 0), 4)
                     AS mean_word_len,
                   round(n_symbols * 1.0 / nullif(n_chars, 0), 4)
                     AS symbol_ratio,
                   round(max_word_count * 1.0 / nullif(n_words, 0), 4)
                     AS top_word_frac,
                   (n_words BETWEEN 10 AND 100000
                    AND n_chars * 1.0 / nullif(n_words, 0)
                        BETWEEN 2.0 AND 12.0
                    AND n_symbols * 1.0 / nullif(n_chars, 0) <= 0.1
                    AND max_word_count * 1.0 / nullif(n_words, 0) <= 0.2)
                     AS passes_gopher
            FROM s JOIN tw ON s.doc_id = tw.doc_id
            ORDER BY s.doc_id
        """,
    }


SAMPLE_MOD = 10  # keep h60(text) % 10 == 0 → deterministic ~10%


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling — the reproducible
    corpus-subsampling op a training pipeline needs (Bernoulli `sample`
    is seed+partitioning dependent; content-hash sampling is stable
    across runs, engines, AND repartitioning, and `h60 % mod` keys the
    sample to the document, so duplicates sample identically). Audit:
    per-language kept counts + id checksum."""
    docs = read_table(spark, sf_dir, "documents")
    kept = docs.filter(h60(F.col("text")) % SAMPLE_MOD == 0)
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


def stratified_sample_sql() -> str:
    return f"""
        SELECT lang, count(*) AS n_kept, sum(doc_id)::BIGINT AS id_sum
        FROM documents
        WHERE ({h60_sql('text')}) % {SAMPLE_MOD} = 0
        GROUP BY lang ORDER BY lang
    """


# mixture resampling: uniform target share per language, total output
# budget = 2/5 of the corpus, hash-domain resolution D. ALL-INTEGER
# arithmetic (shares as exact fractions, `div` not `/`) — thresholds at
# 100 TB magnitudes exceed double's 53-bit mantissa, so float division
# would disagree between engines.
MIX_D = 1_000_000
MIX_BUDGET_NUM, MIX_BUDGET_DEN = 2, 5  # output budget = 2/5 of corpus
MIX_N_LANGS = 5                        # uniform share = 1/5 each


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling — reshape a skewed corpus toward a
    target language mixture (the data-mixing step before a training
    run): per language, keep rate = min(1, target_count / n_lang)
    where target_count = share × budget, applied as a deterministic
    content-hash threshold (stable across runs/engines/partitioning,
    like stratified_sample). Languages under their target keep all
    docs (no upsampling here — repetition policy belongs to the
    training loader).

    Plan: one groupBy for per-lang counts (tiny), window-sum for the
    corpus total on that 5-row frame, broadcast the thresholds back,
    hash-filter map-side, re-aggregate. Two shuffles of the full
    corpus at most, both keyed on lang."""
    docs = read_table(spark, sf_dir, "documents")
    counts = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_in"))
        .withColumn(
            "total", F.sum("n_in").over(Window.partitionBy(F.lit(0)))
        )
        .withColumn(
            "threshold",
            F.least(
                F.lit(MIX_D).cast("long"),
                F.expr(
                    f"(((total * {MIX_BUDGET_NUM}) div {MIX_BUDGET_DEN})"
                    f" * {MIX_D}) div ({MIX_N_LANGS} * n_in)"
                ),
            ),
        )
        .select("lang", "n_in", "threshold")
    )
    kept = docs.join(F.broadcast(counts), "lang").filter(
        h60(F.col("text")) % MIX_D < F.col("threshold")
    )
    return (
        kept.groupBy("lang", "n_in", "threshold")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


N_SHARDS = 16          # training-export shard fan-out
PACK_BUDGET = 2048     # tokens per packed training sequence
TOK_CHARS = 4          # chars-per-token heuristic divisor


def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-export sharding — the last mile of a
    data pipeline: every document goes to shard h60(text) % N_SHARDS,
    so shard assignment is a pure content property (stable across
    runs/engines/partitioning, and duplicates co-shard, which keeps
    any later per-shard dedup exact). Audit: per-shard doc count,
    byte volume, id checksum.

    Scale: zero joins — one map-side hash + one 16-key groupBy (the
    partial agg collapses everything executor-side). At 100 TB the
    shard id becomes the writer's partitionBy key; this query IS the
    manifest."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()  # NULL text is not exportable
    )
    return (
        docs.withColumn("shard", (h60(F.col("text")) % N_SHARDS).cast("int"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_bytes"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("shard")
    )


def training_shards_sql() -> str:
    return f"""
        SELECT (({h60_sql('text')}) % {N_SHARDS})::INT AS shard,
               count(*) AS n_docs,
               sum(n_chars)::BIGINT AS n_bytes,
               sum(doc_id)::BIGINT AS id_sum
        FROM documents
        WHERE text IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style pretraining
    layout: within each shard, documents are laid out in a
    deterministic content order (h60, doc_id — unique, so both
    engines sort identically), token counts accumulate, and sequence
    seq_id = floor(preceding_cumsum / PACK_BUDGET) — i.e. the corpus
    is concatenated and split every PACK_BUDGET tokens. Token count
    is the integer heuristic (n_chars + 3) div 4: deterministic and
    engine-exact (a real tokenizer plugs in as a token-count column
    upstream). Audit: per-shard docs, tokens, packed-sequence count,
    and docs that straddle a chunk boundary.

    Scale: ONE shuffle, keyed on shard (bounded fan-out), running sum
    via a window — the same plan at any corpus size; no driver state.
    """
    # NULL text is excluded explicitly: its hash sort key would be
    # NULL, and the engines disagree on NULL placement in ASC order
    # (Spark NULLS FIRST, ANSI/DuckDB NULLS LAST) — the one
    # nondeterminism this layout cannot tolerate. Integer `div`
    # everywhere: cumulative token counts at 100 TB exceed double's
    # 53-bit mantissa, where float division diverges cross-engine.
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    ).select(
        "doc_id",
        (h60(F.col("text")) % N_SHARDS).cast("int").alias("shard"),
        F.expr(
            f"(coalesce(n_chars, 0) + {TOK_CHARS - 1}) div {TOK_CHARS}"
        ).alias("n_tok"),
        h60(F.col("text")).alias("h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.withColumn("cum", F.sum("n_tok").over(w)).select(
        "shard",
        "doc_id",
        "n_tok",
        F.expr(f"(cum - n_tok) div {PACK_BUDGET}").alias("seq_id"),
        F.expr(f"(cum - 1) div {PACK_BUDGET}").alias("end_seq"),
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            (F.max("end_seq") + 1).alias("n_seqs"),
            F.sum(
                F.when(F.col("end_seq") > F.col("seq_id"), 1).otherwise(0)
            ).alias("n_straddlers"),
        )
        .orderBy("shard")
    )


def sequence_pack_sql() -> str:
    return f"""
        WITH d AS (
          SELECT doc_id,
                 (({h60_sql('text')}) % {N_SHARDS})::INT AS shard,
                 (coalesce(n_chars, 0) + {TOK_CHARS - 1})
                   // {TOK_CHARS} AS n_tok,
                 ({h60_sql('text')}) AS h
          FROM documents
          WHERE text IS NOT NULL
        ), p AS (
          SELECT shard, doc_id, n_tok,
                 sum(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
          FROM d
        )
        SELECT shard, count(*) AS n_docs,
               sum(n_tok)::BIGINT AS n_tokens,
               (max((cum - 1) // {PACK_BUDGET}) + 1)::BIGINT AS n_seqs,
               sum(CASE WHEN (cum - 1) // {PACK_BUDGET}
                         > (cum - n_tok) // {PACK_BUDGET}
                        THEN 1 ELSE 0 END)::BIGINT AS n_straddlers
        FROM p
        GROUP BY shard ORDER BY shard
    """


def mixture_sample_sql() -> str:
    return f"""
        WITH c AS (
          SELECT lang, count(*) AS n_in FROM documents GROUP BY lang
        ), t AS (
          SELECT lang, n_in, sum(n_in) OVER () AS total FROM c
        ), thr AS (
          SELECT lang, n_in,
                 least({MIX_D},
                       (((total * {MIX_BUDGET_NUM}) // {MIX_BUDGET_DEN})
                        * {MIX_D}) // ({MIX_N_LANGS} * n_in))::BIGINT
                   AS threshold
          FROM t
        )
        SELECT d.lang, n_in, threshold,
               count(*) AS n_kept, sum(d.doc_id)::BIGINT AS id_sum
        FROM documents d JOIN thr USING (lang)
        WHERE ({h60_sql('d.text')}) % {MIX_D} < threshold
        GROUP BY d.lang, n_in, threshold
        ORDER BY d.lang
    """


SOURCE_CAP = 15  # max docs kept per source domain


def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (the CCNet/Dolma-style domain-balancing step: no
    single source may dominate the training mix): keep at most
    SOURCE_CAP documents per source, chosen in (h60(text), doc_id)
    order — a pure content property, so the kept set is identical
    across runs, engines, and physical row order. Sources under the
    cap pass through whole. Returns the per-source audit
    (source, n_in, n_kept, id_sum).

    Plan: ONE shuffle on source for the row_number window, plus a
    broadcast of the tiny per-source counts. Scale note: an exact cap
    needs a per-source ordering, so heavy domains pay a per-group
    sort; when an approximate cap suffices at 100 TB, swap to the
    mixture_sample idiom — a rate threshold on the hash
    (cap/n_in × 2⁶⁰) — which is sort-free and map-side."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    counts = docs.groupBy("source").agg(F.count("*").alias("n_in"))
    w = Window.partitionBy("source").orderBy(
        h60(F.col("text")).asc(), F.col("doc_id").asc()
    )
    kept = docs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= SOURCE_CAP
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
        )
        .join(F.broadcast(counts), "source")
        .select("source", "n_in", "n_kept", "id_sum")
        .orderBy("source")
    )


def source_cap_sample_sql() -> str:
    return f"""
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY {h60_sql("text")} ASC, doc_id ASC)
           AS rn
  FROM documents WHERE text IS NOT NULL
), counts AS (
  SELECT source, count(*)::BIGINT AS n_in FROM documents
  WHERE text IS NOT NULL GROUP BY source
)
SELECT c.source, c.n_in,
       count(*)::BIGINT AS n_kept,
       sum(r.doc_id)::BIGINT AS id_sum
FROM ranked r JOIN counts c USING (source)
WHERE r.rn <= {SOURCE_CAP}
GROUP BY c.source, c.n_in
ORDER BY c.source
"""


SURPRISAL_SCALE = 10_000  # fixed-point units per inverse-probability


def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality scoring — the CCNet-style step (Wenzek et al.
    2020 score documents with a KenLM 5-gram; offline this engine
    trains the model on the corpus itself at order 1): per document,
    the mean unigram surprisal under an add-1-smoothed corpus model.
    High scores = rare-token-heavy documents (the quality-filter
    signal). Returns (doc_id, n_tokens, surprisal_units).

    Determinism: log-probabilities are NOT used — libm ln() is not
    bit-identical across engines, so a boundary doc could flip its
    floor. Instead each token scores the RATIONAL surprisal
    floor(((N + V) · SCALE) / (c(w) + 1)) — pure int64 arithmetic,
    exactly monotone with -log p(w) per token, zero float ops
    anywhere. The doc score is the integer mean of token scores.

    Scale: vocab counts are one groupBy over exploded tokens (partial
    agg before the shuffle); the model — one row per vocab entry — is
    broadcast (real corpora: ~1M rows, comfortably broadcastable);
    the doc score is one groupBy on doc_id."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    toks = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("w")
    )
    # One explode, not two (guide §2.3/§2.4, r18): aggregate to
    # per-(doc, word) counts ONCE and weight every downstream sum by
    # cnt — Σ_tokens units == Σ_(doc,w) units·cnt exactly (pure int64,
    # so the rewrite is bit-identical), the vocab rollup and the
    # scoring join both read the checkpointed frame instead of
    # re-running the corpus explode, and the model join moves
    # |distinct (doc, w)| rows instead of every token occurrence.
    wtf = toks.groupBy("doc_id", "w").agg(
        F.count("*").alias("cnt")
    ).localCheckpoint()
    vocab = wtf.groupBy("w").agg(F.sum("cnt").alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v_size")
    )
    model = vocab.crossJoin(F.broadcast(totals)).select(
        "w",
        F.expr(
            f"((n_total + v_size) * {SURPRISAL_SCALE}) div (c + 1)"
        ).alias("tok_units"),
    )
    return (
        wtf.join(F.broadcast(model), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.expr(
                "sum(tok_units * cnt) div sum(cnt)"
            ).alias("surprisal_units"),
        )
        .orderBy("doc_id")
    )


def text_unigram_surprisal_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({WORDS_SQL}) AS w
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
), vocab AS (
  SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY w
), totals AS (
  SELECT sum(c)::BIGINT AS n_total, count(*)::BIGINT AS v_size FROM vocab
), model AS (
  SELECT w,
         (((n_total + v_size) * {SURPRISAL_SCALE}) // (c + 1))::BIGINT
           AS tok_units
  FROM vocab CROSS JOIN totals
)
SELECT t.doc_id,
       count(*)::BIGINT AS n_tokens,
       (sum(m.tok_units)::BIGINT // count(*))::BIGINT AS surprisal_units
FROM toks t JOIN model m USING (w)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


BPE_MERGES = 12  # learned merge operations (unrolled in the oracle SQL)
_BPE_CACHE: dict[tuple, list[tuple[int, str, int]]] = {}


def _docs_fingerprint(sf_dir: str) -> tuple:
    import os

    try:
        st = os.stat(os.path.join(sf_dir, "documents.parquet"))
        return (sf_dir, st.st_mtime_ns, st.st_size)
    except OSError:
        return (sf_dir,)


def _bpe_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, s, f): distinct corpus words with frequency, s = the word's
    symbol sequence as a space-joined string (initially characters).
    BPE trains on exactly this aggregate — never the raw corpus."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    return (
        docs.select(F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .select(
            "w",
            F.concat_ws(
                " ", F.array_remove(F.split("w", ""), "")
            ).alias("s"),
            "f",
        )
    )


def _bpe_pair_counts(freq: DataFrame) -> DataFrame:
    ws = F.split(F.col("s"), " ")
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        freq.select(F.explode(pairs).alias("pr"), "f")
        .groupBy("pr")
        .agg(F.sum("f").alias("cnt"))
    )


def _bpe_apply_merge(freq: DataFrame, pair: str) -> DataFrame:
    """Merge one learned pair into every symbol sequence. Replace runs
    left-to-right over non-overlapping occurrences of ' a b ' in the
    padded string — the same scan in Spark, DuckDB, and Python
    str.replace, which is what makes the trainer oracle-exact.
    (Textbook BPE differs only when occurrences share a boundary
    symbol, e.g. 'a a a'; the rule here is deterministic and
    documented, not lucky.)"""
    merged = pair.replace(" ", "")
    return freq.select(
        "w",
        F.trim(
            F.replace(
                F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                F.lit(f" {pair} "),
                F.lit(f" {merged} "),
            )
        ).alias("s"),
        "f",
    )


def bpe_fit(spark: SparkSession, sf_dir: str) -> list[tuple[int, str, int]]:
    """Learn BPE_MERGES merge operations (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units") as
    a driver loop over distributed pair counts — the same iterative
    shape as the k-means trainer: per iteration ONE (pair, count) row
    reaches the driver (the argmax, ties → lexicographically smaller
    pair); the word-frequency table never leaves the cluster. At
    scale, persist the freq frame between iterations; at fixture
    scale the re-scan is cheaper than the cache bookkeeping."""
    key = _docs_fingerprint(sf_dir)
    cached = _BPE_CACHE.get(key)
    if cached is not None:
        return cached
    freq = _bpe_word_freq(spark, sf_dir)
    merges: list[tuple[int, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        best = (
            _bpe_pair_counts(freq)
            .orderBy(F.desc("cnt"), F.asc("pr"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pr, cnt = best[0]["pr"], int(best[0]["cnt"])
        merges.append((rank, pr, cnt))
        freq = _bpe_apply_merge(freq, pr)
    _BPE_CACHE[key] = merges
    return merges


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table, (merge_rank, pair, cnt) — the
    trainer itself as a contract query. The oracle retrains all
    BPE_MERGES operations in unrolled MATERIALIZED SQL CTEs, so a
    hash match verifies the full iterative training loop (pair
    counting, argmax tie-breaking, merge application) against an
    independent engine."""
    merges = bpe_fit(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, cnt long"
    ).orderBy("merge_rank")


def bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges: per document, whitespace word count
    vs BPE subword count (the token-budget number a training pipeline
    actually consumes). The word→segmentation mapping is the final
    trained freq table — vocabulary-bounded and broadcast; tokenizing
    a 100 TB corpus is then one broadcast join, no per-doc Python."""
    merges = bpe_fit(spark, sf_dir)
    freq = _bpe_word_freq(spark, sf_dir)
    for _, pr, _ in merges:
        freq = _bpe_apply_merge(freq, pr)
    mapping = freq.select(
        "w", F.size(F.split("s", " ")).alias("n_sub")
    )
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    toks = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("w")
    )
    return (
        toks.join(F.broadcast(mapping), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .orderBy("doc_id")
    )


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY (subwords emitted per whitespace word) per
    language — the standard tokenizer-evaluation metric: a tokenizer
    trained on a mixed corpus over-segments under-represented
    languages, inflating their token budgets and effective cost.
    Composes the trained BPE mapping (same merges, same broadcast
    word→n_sub table as bpe_segment_stats) with the documents' lang
    column: per lang, total words, total subwords, fertility =
    subwords/words.

    Scale: identical to bpe_segment_stats (vocabulary-bounded
    broadcast mapping, one token explode, map-side-combined agg) with
    a lang-keyed final agg — a handful of groups."""
    merges = bpe_fit(spark, sf_dir)
    freq = _bpe_word_freq(spark, sf_dir)
    for _, pr, _ in merges:
        freq = _bpe_apply_merge(freq, pr)
    mapping = freq.select(
        "w", F.size(F.split("s", " ")).alias("n_sub")
    )
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    toks = docs.select(
        "lang", F.explode(words_col(F.col("text"))).alias("w")
    )
    return (
        toks.join(F.broadcast(mapping), "w")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .select(
            "lang",
            "n_words",
            "n_subwords",
            F.round(
                F.col("n_subwords") / F.col("n_words"), 4
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


def bpe_fertility_by_lang_sql() -> str:
    return f"""WITH {_bpe_train_ctes()},
mapping AS (
  SELECT w, len(string_split(s, ' '))::BIGINT AS n_sub
  FROM w{BPE_MERGES}
), toks AS (
  SELECT lang, unnest({WORDS_SQL}) AS w
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
)
SELECT t.lang,
       count(*)::BIGINT AS n_words,
       sum(m.n_sub)::BIGINT AS n_subwords,
       round(sum(m.n_sub) * 1.0 / count(*), 4) AS fertility
FROM toks t JOIN mapping m USING (w)
GROUP BY t.lang
ORDER BY t.lang
"""


def _bpe_train_ctes() -> str:
    """Shared unrolled-CTE text: w0 (char-split word freq) through
    w{BPE_MERGES} plus per-iteration p{t}/b{t}. MATERIALIZED is
    load-bearing: each b{t} is referenced three times and the chain
    re-evaluates exponentially without it."""
    steps = [
        """w0 AS MATERIALIZED (
  SELECT w, array_to_string(regexp_split_to_array(w, ''), ' ') AS s,
         count(*)::BIGINT AS f
  FROM (SELECT unnest(regexp_split_to_array(trim(text), ' +')) AS w
        FROM documents
        WHERE text IS NOT NULL AND length(trim(text)) > 0)
  GROUP BY 1, 2)"""
    ]
    for t in range(BPE_MERGES):
        steps.append(
            f"""p{t} AS MATERIALIZED (
  SELECT pr, sum(f)::BIGINT AS cnt FROM (
    SELECT unnest(list_transform(
             generate_series(1, len(string_split(s, ' ')) - 1),
             i -> string_split(s, ' ')[i] || ' ' || string_split(s, ' ')[i+1]))
             AS pr,
           f
    FROM w{t})
  GROUP BY pr
), b{t} AS MATERIALIZED (
  SELECT pr, cnt FROM p{t} ORDER BY cnt DESC, pr ASC LIMIT 1
), w{t + 1} AS MATERIALIZED (
  SELECT w,
         trim(replace(' ' || s || ' ',
                      ' ' || (SELECT pr FROM b{t}) || ' ',
                      ' ' || replace((SELECT pr FROM b{t}), ' ', '') || ' '))
           AS s,
         f
  FROM w{t})"""
        )
    return ",\n".join(steps)


def bpe_train_merges_sql() -> str:
    sel = "\nUNION ALL ".join(
        f"SELECT {t + 1} AS merge_rank, (SELECT pr FROM b{t}) AS pair, "
        f"(SELECT cnt FROM b{t}) AS cnt"
        for t in range(BPE_MERGES)
    )
    return f"WITH {_bpe_train_ctes()}\n{sel}\nORDER BY merge_rank"


def bpe_segment_stats_sql() -> str:
    return f"""WITH {_bpe_train_ctes()},
mapping AS (
  SELECT w, len(string_split(s, ' '))::BIGINT AS n_sub
  FROM w{BPE_MERGES}
), toks AS (
  SELECT doc_id, unnest({WORDS_SQL}) AS w
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
)
SELECT t.doc_id,
       count(*)::BIGINT AS n_words,
       sum(m.n_sub)::BIGINT AS n_subwords
FROM toks t JOIN mapping m USING (w)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


HH_FRAC = 0.001  # heavy-hitter threshold: 0.1% of all token occurrences


def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-dominating tokens (count ≥ ceil(0.1% · total)) via the
    bounded-memory Misra-Gries candidates + exact-verify pass
    (ops.scale.heavy_hitters) — the boilerplate/stopword radar a
    training-data pipeline runs BEFORE choosing filters. Unlike
    top_tokens' fixed top-25, the threshold is relative, so the
    output adapts to corpus skew; unlike a plain groupBy, per-task
    state is capped at k counters no matter the vocabulary size."""
    from gis_etl_spark.ops.scale import heavy_hitters

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(words_col(F.col("text"))).alias("token"))
    return heavy_hitters(toks, "token", HH_FRAC)


WS_N = 500  # weighted-sample budget


def weighted_sample_docs(
    spark: SparkSession, sf_dir: str, n: int = WS_N
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res, Inf. Proc. Lett. 97(5), 2006): per row a key u^(1/w) from
    a uniform u and weight w; the top-n keys ARE a weight-proportional
    WOR sample. u derives from the doc_id content hash
    ((h60 + 1) / 2^60 ∈ (0, 1]) — deterministic across runs, engines,
    and partitioning, same discipline as stratified_sample; w is the
    document length (longer docs proportionally likelier — the
    quality/length-weighted corpus subsampling step).

    Scale shape: the key is one map-side expression; top-n goes
    through TakeOrderedAndProject (per-partition heap + merge of n·P
    rows — never a global sort). The float pow rank order is the only
    cross-engine surface; ranks at the budget boundary are
    generically separated, and the ULP-level Java-vs-libm pow gap
    cannot reorder them."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    u = (h60(F.col("doc_id").cast("string")) + F.lit(1)) / F.lit(2.0**60)
    key = F.pow(u, F.lit(1.0) / F.col("n_chars"))
    return (
        docs.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(n)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


def weighted_sample_sql() -> str:
    two60 = float(2.0**60)
    return f"""
        WITH s AS (
          SELECT doc_id, n_chars,
                 pow((({h60_sql("doc_id::VARCHAR")}) + 1) / {two60!r},
                     1.0 / n_chars) AS es_key
          FROM documents WHERE n_chars > 0
        ), top AS (
          SELECT doc_id, n_chars FROM s
          ORDER BY es_key DESC, doc_id ASC LIMIT {WS_N}
        )
        SELECT doc_id, n_chars FROM top ORDER BY doc_id
    """


# --- Count-Min Sketch (Cormode & Muthukrishnan 2005) -------------------------

CMS_D = 4      # hash rows
CMS_W = 1024   # buckets per row
CMS_TOP = 30   # verified point-query set: the exact top-k tokens


def cms_cell_array(token: Column) -> Column:
    """token -> array of its CMS_D (row, bucket) cells — md5-salted per
    row, engine-portable; shared by the batch sketch and the streaming
    twin (pure expression, stateless, stream-legal)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (h60(F.concat(F.lit(f"{i}:"), token)) % CMS_W).alias("b"),
            )
            for i in range(CMS_D)
        ]
    )


def cms_cells(toks: DataFrame) -> DataFrame:
    """(r, b, c) CMS counter table over a (token) frame: one explode +
    one map-side-combined agg onto at most CMS_D*CMS_W keys."""
    return (
        toks.select(F.explode(cms_cell_array(F.col("token"))).alias("x"))
        .groupBy(F.col("x.r").alias("r"), F.col("x.b").alias("b"))
        .agg(F.count("*").alias("c"))
    )


def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch over the token stream, with its point-query
    estimates EXACT-VERIFIED on the true top-{CMS_TOP} tokens — the
    frequency-sketch member of the sketch family (KMV = distinct,
    Misra-Gries = heavy hitters, sampled ranks = quantiles; CMS answers
    'how often does THIS key occur' in bounded memory).

    Sketch build is one pass: each token explodes to CMS_D (row,
    bucket) cells (md5-salted per row — engine-portable, no seeded
    RNG), and the counter table is a map-side-combined agg onto at
    most CMS_D×CMS_W = {4×1024} keys REGARDLESS of vocabulary — the
    same bounded-state contract as the Misra-Gries pass, but
    mergeable across shards by plain cell-wise addition. The estimate
    for a key is min over rows of its cell counters (one-sided: never
    under-counts; over-counts by collision mass ≤ ε·N w.h.p.).

    Output: (token, exact_n, cms_est, overcount) for the exact
    top-{CMS_TOP} tokens (count desc, token asc — deterministic), the
    standard way to audit a CMS against ground truth at test scale.
    The oracle rebuilds the identical sketch in SQL, so the hash match
    pins the hashing, the counter table, and the min-combine."""
    docs = read_table_spread(spark, sf_dir, "documents")
    toks = docs.select(F.explode(words_col(F.col("text"))).alias("token"))
    cells_of = cms_cell_array(F.col("token"))
    cms = cms_cells(toks)

    # The (count desc, token asc) order is total, so orderBy+limit is
    # exactly the row_number()<=CMS_TOP top-k — and compiles to
    # TakeOrderedAndProject (per-partition partial top-k, then a
    # single CMS_TOP-row merge) instead of an Exchange SinglePartition
    # sorting the whole vocabulary through one reducer.
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("token"))
        .limit(CMS_TOP)
    )
    probes = top.select(
        "token", "exact_n", F.explode(cells_of).alias("x")
    ).select("token", "exact_n", F.col("x.r").alias("r"), F.col("x.b").alias("b"))
    return (
        probes.join(F.broadcast(cms), ["r", "b"])
        .groupBy("token", "exact_n")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), F.asc("token"))
    )


def cms_token_counts_sql() -> str:
    """SQL replay of cms_token_counts: same salted-md5 row hashes,
    same counter table, same min-combine and top-k tie-break."""
    row_hashes = [h60_sql(f"'{i}:' || token") for i in range(CMS_D)]
    cells = "\n          UNION ALL ".join(
        f"SELECT {i} AS r, {h} % {CMS_W} AS b FROM toks"
        for i, h in enumerate(row_hashes)
    )
    probes = "\n          UNION ALL ".join(
        f"SELECT token, exact_n, {i} AS r, {h} % {CMS_W} AS b FROM top"
        for i, h in enumerate(row_hashes)
    )
    return f"""
        WITH toks AS (
          SELECT unnest({WORDS_SQL}) AS token FROM documents
        ), cells AS (
          {cells}
        ), cms AS (
          SELECT r, b, count(*) AS c FROM cells GROUP BY r, b
        ), top AS (
          SELECT token, exact_n FROM (
            SELECT token, count(*) AS exact_n,
                   row_number() OVER (ORDER BY count(*) DESC, token ASC)
                     AS rk
            FROM toks GROUP BY token
          ) WHERE rk <= {CMS_TOP}
        ), probes AS (
          {probes}
        ), est AS (
          SELECT p.token, p.exact_n, min(c.c) AS cms_est
          FROM probes p JOIN cms c ON c.r = p.r AND c.b = p.b
          GROUP BY p.token, p.exact_n
        )
        SELECT token, exact_n::BIGINT AS exact_n,
               cms_est::BIGINT AS cms_est,
               (cms_est - exact_n)::BIGINT AS overcount
        FROM est ORDER BY exact_n DESC, token ASC
    """


def corpus_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate-n-gram fraction per document — the
    cross-document complement of text_repetition (which is
    intra-document): for each doc, the share of its DISTINCT
    {DECON_NGRAM}-gram shingles that occur in at least one OTHER
    document. The standard near-dup/boilerplate quality signal a
    pretraining recipe thresholds on (docs that are mostly made of
    corpus-shared n-grams are templates, mirrors, or spam), using the
    same shingle helper as the decontamination pack so the feature
    definition is single-sourced.

    Output: (doc_id, n_shingles, n_dup, dup_frac rounded to 4) for
    every doc with at least one shingle, ordered by doc_id.

    Scale: one explode → one shingle-keyed agg (map-side combined;
    plain count, since the pair frame is already distinct) → one join
    back on the shingle key → one doc-keyed rollup. At 100 TB the
    shingle table is the big artifact — persist it bucketed by shingle
    hash and both the agg and the join co-locate; this is the same
    layout the incremental-dedup snapshot uses for band keys."""
    docs = read_table_spread(spark, sf_dir, "documents")
    s = (
        docs.select("doc_id", words_col(F.col("text")).alias("ws"))
        .select(
            "doc_id", F.explode(decon_shingle_arr("ws")).alias("sh")
        )
    )
    # s is already DISTINCT (doc_id, sh), so a plain count IS the
    # distinct-doc count — one map-side-combined hash agg instead of
    # countDistinct's two-phase expand
    d = s.groupBy("sh").agg(F.count("*").alias("nd"))
    return (
        s.join(d, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("nd") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_shingles"), 4).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


def corpus_dup_ngram_fraction_sql() -> str:
    parts = " || ' ' || ".join(f"w[i+{k}]" for k in range(DECON_NGRAM))
    return f"""
        WITH ws AS (
          SELECT doc_id, {WORDS_SQL} AS w FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, {parts} AS sh
          FROM ws, unnest(range(1, greatest(len(w) - {DECON_NGRAM - 2}, 1)))
               AS t(i)
        ), d AS (
          -- sh is SELECT DISTINCT (doc_id, sh): count(*) == distinct docs
          SELECT sh, count(*) AS nd FROM sh GROUP BY sh
        )
        SELECT s.doc_id, count(*)::BIGINT AS n_shingles,
               sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
               round(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS dup_frac
        FROM sh s JOIN d USING (sh)
        GROUP BY s.doc_id ORDER BY s.doc_id
    """


KMV_SET_K = 256  # KMV sketch size for the set-algebra estimates


def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set algebra across two corpus halves — the sketch-family
    member that answers 'how much does source group A overlap source
    group B' WITHOUT an exact distinct over either side: per-group
    K-minimum-values sketches over the distinct 5-gram shingle hashes,
    merged for |A∪B| (estimate = (K−1)·2^60 / h_K), intersection via
    the standard ρ rule (Beyer et al. 2007): ρ = |M ∩ A ∩ B| / |M|
    over the merged k-min set M, est_inter = floor(ρ · est_union).
    M is exactly the K smallest distinct hashes overall (each of its
    group-A members is necessarily in A's own k-min set, so the flags
    carried on the hash table give ρ with no per-sketch joins).

    Exact counts ride along (the oracle-side audit a production run
    samples, not scans): per-shingle group flags → one 4-way rollup.

    Output: one row — exact n_a/n_b/union/inter, sketch n_kept /
    kth_hash / rho, and the two estimates. Every step (md5 hash,
    DISTINCT, TakeOrdered top-K, integer division) is identical ANSI
    arithmetic in both engines, so even the ESTIMATES hash-match.

    Scale: the sketch path is one map-side hash + distinct on a
    well-spread 60-bit key + TakeOrdered(K) per group — no global
    sort, no vocabulary-sized state; sketches are K values, mergeable
    by union+re-top-K (shard sketches combine associatively). The
    rendition a production run actually deploys — sketch WITHOUT the
    exact full-universe audit — is kmv_overlap_sketch below (its own
    contract query + bench entry); this one keeps the audit so the
    oracle pins exact and estimate together."""
    docs = read_table(spark, sf_dir, "documents")
    # try_cast, not cast: under Spark 4 ANSI mode a plain cast THROWS
    # on a source not shaped 'src<digits>', making the isNotNull guard
    # unreachable — try_cast NULLs exactly like the oracle's TRY_CAST,
    # so both engines drop malformed sources identically.
    grp = (F.expr("try_cast(substring(source, 4) as int)") % 2).alias("g")
    # Sources not shaped 'src<digits>' parse to a NULL group: they
    # belong to neither half, so they must not inflate the union or
    # the sketch — drop them loudly here (and identically in the
    # oracle) instead of letting NULL-group shingles skew both engines
    # in the same invisible way.
    sh_g = (
        docs.select(grp, words_col(F.col("text")).alias("ws"))
        .filter(F.col("g").isNotNull())
        .select("g", F.explode(decon_shingle_arr("ws")).alias("sh"))
        .distinct()
    )
    per = sh_g.groupBy("sh").agg(
        F.max(F.when(F.col("g") == 0, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("g") == 1, 1).otherwise(0)).alias("in_b"),
    )
    exact = per.agg(
        F.sum("in_a").alias("n_a_exact"),
        F.sum("in_b").alias("n_b_exact"),
        F.count("*").alias("n_union_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter_exact"),
    )
    hs = (
        per.select(h60(F.col("sh")).alias("h"), "in_a", "in_b")
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    k = KMV_SET_K
    m = hs.orderBy("h").limit(k)
    sk = m.agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("rho"),
    ).select(
        "n_kept",
        "kth_hash",
        "rho",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1) * 2.0**60) / F.col("kth_hash")
            ).cast("bigint")
        )
        .alias("union_est"),
    )
    sk = sk.select(
        "n_kept",
        "kth_hash",
        "rho",
        "union_est",
        F.expr("(rho * union_est) div n_kept").alias("inter_est"),
    )
    return exact.crossJoin(sk).select(
        "n_a_exact",
        "n_b_exact",
        "n_union_exact",
        "n_inter_exact",
        "n_kept",
        "kth_hash",
        "rho",
        "union_est",
        "inter_est",
    )


def kmv_source_overlap_sql() -> str:
    parts = " || ' ' || ".join(f"w[i+{k}]" for k in range(DECON_NGRAM))
    k = KMV_SET_K
    return f"""
        WITH ws AS (
          SELECT (TRY_CAST(substr(source, 4) AS INT) % 2) AS g,
                 {WORDS_SQL} AS w
          FROM documents
        ), sh_g AS (
          SELECT DISTINCT g, {parts} AS sh
          FROM ws, unnest(range(1, greatest(len(w) - {DECON_NGRAM - 2}, 1)))
               AS t(i)
          WHERE g IS NOT NULL
        ), per AS (
          SELECT sh,
                 max(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS in_a,
                 max(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS in_b
          FROM sh_g GROUP BY sh
        ), exact AS (
          SELECT sum(in_a)::BIGINT AS n_a_exact,
                 sum(in_b)::BIGINT AS n_b_exact,
                 count(*)::BIGINT AS n_union_exact,
                 sum(in_a * in_b)::BIGINT AS n_inter_exact
          FROM per
        ), hs AS (
          SELECT {h60_sql('sh')} AS h,
                 max(in_a) AS in_a, max(in_b) AS in_b
          FROM per GROUP BY 1
        ), m AS (
          SELECT * FROM hs ORDER BY h LIMIT {k}
        ), sk0 AS (
          SELECT count(*)::BIGINT AS n_kept, max(h) AS kth_hash,
                 sum(in_a * in_b)::BIGINT AS rho
          FROM m
        ), sk AS (
          SELECT n_kept, kth_hash, rho,
                 CASE WHEN n_kept < {k} THEN n_kept
                      ELSE CAST(floor({float(k - 1) * 2.0**60!r} / kth_hash)
                                AS BIGINT) END AS union_est
          FROM sk0
        )
        SELECT e.n_a_exact, e.n_b_exact, e.n_union_exact, e.n_inter_exact,
               s.n_kept, s.kth_hash, s.rho, s.union_est,
               ((s.rho * s.union_est) // s.n_kept)::BIGINT AS inter_est
        FROM exact e, sk s
    """


MIX_WEIGHT_DP = 6      # sqrt fixed-point units / weight decimals


def mixture_temperature_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-smoothed source sampling weights — the standard
    multilingual/multi-source mix trick (sample source i with
    probability ∝ p_i^τ so small sources are upsampled): computed at
    τ = 0.5, i.e. sqrt smoothing, where cross-engine exactness is
    FREE — IEEE-754 sqrt is correctly rounded in both JVM and DuckDB,
    so sqrt(n) is the identical double everywhere, unlike pow(x, 0.7).

    Determinism discipline (fixedpoint.py pattern): quantize each
    sqrt to integer units u = floor(sqrt(n)·1e{MIX_WEIGHT_DP} + 0.5)
    FIRST, integer-sum the units (order-free, exact), then weight =
    floor(u/Σu · 1e{MIX_WEIGHT_DP} + 0.5) / 1e{MIX_WEIGHT_DP} — the
    explicit half-up quantization, NOT round(): Spark's round on
    doubles goes through BigDecimal(double) while DuckDB rounds the
    shortest decimal repr, and a ratio landing on a representational
     5e-7 tie would diverge (ADVICE r13). floor over pure IEEE
    arithmetic is bit-identical in both engines by construction.

    Output: (source, n_docs, sqrt_units, weight), one row per source,
    ordered. Scale: one count-by-source (map-side combined) and a
    broadcast-sized scalar — the A8 driverless form would also work,
    but |sources| rows is trivially collectable at any corpus size."""
    docs = read_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    u = F.floor(
        F.sqrt(F.col("n_docs")) * F.lit(float(10**MIX_WEIGHT_DP))
        + F.lit(0.5)
    ).cast("bigint")
    per = per.select("source", "n_docs", u.alias("sqrt_units"))
    tot = per.agg(F.sum("sqrt_units").alias("t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "sqrt_units",
            (
                F.floor(
                    F.col("sqrt_units") / F.col("t")
                    * F.lit(float(10**MIX_WEIGHT_DP))
                    + F.lit(0.5)
                )
                / F.lit(float(10**MIX_WEIGHT_DP))
            ).alias("weight"),
        )
        .orderBy("source")
    )


def mixture_temperature_weights_sql() -> str:
    dp = MIX_WEIGHT_DP
    return f"""
        WITH per AS (
          SELECT source, count(*)::BIGINT AS n_docs,
                 CAST(floor(sqrt(count(*)) * 1e{dp} + 0.5) AS BIGINT)
                   AS sqrt_units
          FROM documents GROUP BY source
        ), tot AS (
          SELECT sum(sqrt_units)::BIGINT AS t FROM per
        )
        SELECT p.source, p.n_docs, p.sqrt_units,
               floor(p.sqrt_units / t.t * 1e{dp} + 0.5) / 1e{dp} AS weight
        FROM per p, tot t ORDER BY p.source
    """


MIX_TOKEN_BUDGET = 1_000_000  # tokens to apportion across sources


def mixture_token_plan(
    spark: SparkSession, sf_dir: str, budget: int = MIX_TOKEN_BUDGET
) -> DataFrame:
    """Turn smoothed source weights into an INTEGER token-budget plan —
    the step after mixture_temperature_weights in a real mix: every
    source gets quota_i tokens with Σ quota == {MIX_TOKEN_BUDGET}
    EXACTLY, via Hamilton largest-remainder apportionment over the
    same sqrt-smoothed units (u = floor(sqrt(n_tokens)·1e6 + 0.5)):
    base_i = (B·u_i) div T, then the r = B − Σ base largest remainders
    (B·u_i mod T, ties → source asc) get +1. Every step is int64
    arithmetic, so the plan is bit-exact cross-engine — no float
    shares that "roughly" sum to the budget.

    Overflow note: B·u needs B·sqrt(n_tokens)·1e6 < 2^63 — fine to
    ~10^13-token sources at this budget; beyond that cast the product
    to decimal(38,0) (fixedpoint.py's scale note).

    The remainder ranking is a single-partition window OVER THE
    PER-SOURCE AGGREGATE — ≤ |sources| rows by construction, never
    corpus rows (allowlisted in tests/test_plan_hygiene.py with
    quality_deciles/mixture_sample).

    Output: (source, n_tokens, sqrt_units, quota), ordered."""
    b = budget
    docs = read_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    per = docs.groupBy("source").agg(
        F.sum(F.size(w)).alias("n_tokens")
    )
    u = F.floor(
        F.sqrt(F.col("n_tokens")) * F.lit(float(10**MIX_WEIGHT_DP))
        + F.lit(0.5)
    ).cast("bigint")
    # per (≤ |sources| rows) feeds the total scalar, the staged
    # apportionment and — via staged — the sum_base scalar, so the
    # explain-time plan shows the corpus tokenize 5×. Measured r18:
    # checkpointing it here REGRESSED the in-suite wall 0.79 → 4.3 s
    # (draw_plan) despite a faster fresh floor — the five subtrees are
    # IDENTICAL aggregates, so runtime exchange reuse already dedups
    # them to one execution, while an eager per-call checkpoint pays a
    # fresh job wave every build in a long-lived session. Left lazy.
    per = per.select("source", "n_tokens", u.alias("sqrt_units"))
    tot = per.agg(F.sum("sqrt_units").alias("t"))
    staged = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "sqrt_units",
        F.expr(f"({b}L * sqrt_units) div t").alias("base"),
        F.expr(f"({b}L * sqrt_units) % t").alias("rem"),
    )
    sb = staged.agg(F.sum("base").alias("sum_base"))
    wnd = Window.orderBy(F.desc("rem"), F.asc("source"))
    return (
        staged.crossJoin(F.broadcast(sb))
        .withColumn("rk", F.row_number().over(wnd))
        .select(
            "source",
            "n_tokens",
            "sqrt_units",
            (
                F.col("base")
                + (F.col("rk") <= F.lit(b) - F.col("sum_base")).cast("long")
            ).alias("quota"),
        )
        .orderBy("source")
    )


def mixture_token_plan_sql(budget: int = MIX_TOKEN_BUDGET) -> str:
    b = budget
    dp = MIX_WEIGHT_DP
    return f"""
        WITH per AS (
          SELECT source, sum(len({WORDS_SQL}))::BIGINT AS n_tokens
          FROM documents GROUP BY source
        ), units AS (
          SELECT source, n_tokens,
                 CAST(floor(sqrt(n_tokens) * 1e{dp} + 0.5) AS BIGINT)
                   AS sqrt_units
          FROM per
        ), tot AS (
          SELECT sum(sqrt_units)::BIGINT AS t FROM units
        ), staged AS (
          SELECT u.source, u.n_tokens, u.sqrt_units,
                 ({b} * u.sqrt_units) // t.t AS base,
                 ({b} * u.sqrt_units) % t.t AS rem
          FROM units u, tot t
        ), sb AS (
          SELECT sum(base)::BIGINT AS sum_base FROM staged
        )
        SELECT s.source, s.n_tokens, s.sqrt_units,
               (s.base + CASE WHEN row_number() OVER (
                    ORDER BY s.rem DESC, s.source ASC)
                  <= {b} - sb.sum_base THEN 1 ELSE 0 END)::BIGINT AS quota
        FROM staged s, sb
        ORDER BY s.source
    """


MIX_DRAW_BUDGET = 16_384  # draw budget: < corpus tokens at every SF,
# so the maximal-prefix truncation is actually exercised (the 1M plan
# budget exceeds the sf0.01 corpus and would select everything)


def mixture_draw_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DRAW that makes the mixture plan real (VERDICT r13 item 2):
    a quota-respecting deterministic sampler — per source, documents
    are taken in hash order (md5 of doc_id: a fixed, data-independent
    shuffle both engines compute identically) until the next document
    would push the running token sum past that source's Hamilton
    quota (mixture_token_plan at MIX_DRAW_BUDGET). The selected set is
    the MAXIMAL PREFIX under quota: Σ selected ≤ quota < Σ + next-doc
    (property-tested in tests/test_properties.py).

    Output: one row per SELECTED document — (source, doc_id, n_tokens,
    cum_tokens), ordered by (source, cum_tokens).

    Scale: the only window is a running sum PARTITIONED BY SOURCE over
    hash-ordered rows — corpus rows shuffle once on source (the same
    key the rollup already grouped on), never to a single partition;
    the quota table (|sources| rows) broadcasts. A skewed mega-source
    orders only within its own partition — at 100 TB that partition is
    range-splittable by the hash prefix with per-range offsets (the
    standard two-pass running-sum refinement) without changing the
    selected set."""
    docs = read_table(spark, sf_dir, "documents")
    quota = mixture_token_plan(spark, sf_dir, budget=MIX_DRAW_BUDGET).select(
        "source", "quota"
    )
    per = docs.select(
        "doc_id",
        "source",
        F.size(words_col(F.col("text"))).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    wnd = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per.withColumn("cum_tokens", F.sum("n_tokens").over(wnd))
        .join(F.broadcast(quota), "source")
        .filter(F.col("cum_tokens") <= F.col("quota"))
        .select("source", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("source", "cum_tokens")
    )


def mixture_draw_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mixture_draw_plan's 100 TB rendition — the two-pass range-split
    running sum the plain draw's docstring promises: a skewed
    mega-source would make `sum() OVER (PARTITION BY source ORDER BY
    h)` sort that entire source inside ONE window partition; here the
    hash prefix (first hex char of md5 → 16 ranges; production picks
    prefix length by skew) splits each source into buckets whose
    (bucket, h, doc_id) order IS the global (h, doc_id) order — md5 is
    lexicographic in its own prefix — so:

      pass 1: per-(source, bucket) token totals (map-side combine);
      pass 2: running OFFSETS across buckets — a window over the
              ≤16-row-per-source aggregate, never corpus rows;
      pass 3: within-bucket running sums (windows partitioned by
              (source, bucket): max partition = |largest source|/16)
              + broadcast offset join.

    The selected set is IDENTICAL to mixture_draw_plan — registered
    against the SAME oracle, so the driver's hash match is the
    independent proof that the refinement changes nothing. Output:
    (source, doc_id, n_tokens, cum_tokens), ordered."""
    docs = read_table(spark, sf_dir, "documents")
    quota = mixture_token_plan(spark, sf_dir, budget=MIX_DRAW_BUDGET).select(
        "source", "quota"
    )
    from gis_etl_spark.ops.scale import bucketed_running_sum

    # bucketed_running_sum consumes per twice (pass-1 bucket totals +
    # pass-3 within-bucket sums); left lazy — runtime exchange reuse
    # dedups the identical subtrees, and the r18 checkpoint experiment
    # regressed the in-suite wall (see mixture_token_plan's note).
    per = docs.select(
        "doc_id",
        "source",
        F.size(words_col(F.col("text"))).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    return (
        bucketed_running_sum(
            per, "source", "h", "doc_id", "n_tokens", "cum_tokens"
        )
        .join(F.broadcast(quota), "source")
        .filter(F.col("cum_tokens") <= F.col("quota"))
        .select("source", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("source", "cum_tokens")
    )


def mixture_draw_plan_sql() -> str:
    b = MIX_DRAW_BUDGET
    dp = MIX_WEIGHT_DP
    return f"""
        WITH per AS (
          SELECT source, sum(len({WORDS_SQL}))::BIGINT AS n_tokens
          FROM documents GROUP BY source
        ), units AS (
          SELECT source, n_tokens,
                 CAST(floor(sqrt(n_tokens) * 1e{dp} + 0.5) AS BIGINT)
                   AS sqrt_units
          FROM per
        ), tot AS (
          SELECT sum(sqrt_units)::BIGINT AS t FROM units
        ), staged AS (
          SELECT u.source, u.sqrt_units,
                 ({b} * u.sqrt_units) // t.t AS base,
                 ({b} * u.sqrt_units) % t.t AS rem
          FROM units u, tot t
        ), sb AS (
          SELECT sum(base)::BIGINT AS sum_base FROM staged
        ), quota AS (
          SELECT s.source,
                 (s.base + CASE WHEN row_number() OVER (
                      ORDER BY s.rem DESC, s.source ASC)
                    <= {b} - sb.sum_base THEN 1 ELSE 0 END)::BIGINT
                   AS quota
          FROM staged s, sb
        ), d AS (
          SELECT doc_id, source, len({WORDS_SQL})::BIGINT AS n_tokens,
                 md5(doc_id::VARCHAR) AS h
          FROM documents
        ), cum AS (
          SELECT doc_id, source, n_tokens,
                 sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM d
        )
        SELECT c.source, c.doc_id, c.n_tokens,
               c.cum_tokens::BIGINT AS cum_tokens
        FROM cum c JOIN quota q USING (source)
        WHERE c.cum_tokens <= q.quota
        ORDER BY c.source, c.cum_tokens
    """


_PII_REDACTIONS = (
    # (pattern, replacement) in REDACTION ORDER: card first (longest
    # digit-dash shape), then SSN before phone (both are digit-dash
    # shapes; the order is part of the contract), email, IPv4 last.
    # Patterns shared verbatim with pii_scan / pii_spans.
    ("card", "<CARD>"),
    ("ssn", "<SSN>"),
    ("phone", "<PHONE>"),
    ("email", "<EMAIL>"),
    ("ipv4", "<IP>"),
)

_PII_PATTERNS = {
    "card": _PII_CARD,
    "ssn": _PII_SSN,
    "phone": _PII_PHONE,
    "email": _PII_EMAIL,
    "ipv4": _PII_IPV4,
}

# Deterministic planted positives for the two r14 kinds: a fixed
# Luhn-VALID card (the canonical 4111… test number: digit sum 30) on
# every 17th doc, a Luhn-INVALID same-shape card on every 19th (sum
# 31 — caught by the shape count, rejected by the Luhn audit), and a
# valid-octet IPv4 derived from doc_id on every 13th.
_PII_CARD_VALID = "4111-1111-1111-1111"
_PII_CARD_INVALID = "4111-1111-1111-1112"


def pii_planted_txt() -> Column:
    """text + the deterministic planted positives (pii_scan's
    convention: contact line on every 10th doc, SSN-shaped token on
    every 21st, IPv4 on every 13th, Luhn-valid card on every 17th and
    Luhn-invalid card on every 19th) — shared by the scan, the batch
    redaction, the span audit, and the streaming redaction twin.
    Token-for-token mirrored by pii_planted_txt_sql()."""
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.lit(" mail user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com call 415-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 21 == 0, F.lit(" id 078-05-1120")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.lit(" ip 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 17 == 0,
            F.lit(f" card {_PII_CARD_VALID}"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 19 == 0,
            F.lit(f" card {_PII_CARD_INVALID}"),
        ).otherwise(F.lit("")),
    )


def pii_planted_txt_sql() -> str:
    """The ANSI twin of pii_planted_txt, shared by every PII oracle."""
    return (
        "text || (CASE WHEN doc_id % 10 = 0 THEN "
        "' mail user' || doc_id::VARCHAR || '@example.com call 415-555-' "
        "|| lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END) "
        "|| (CASE WHEN doc_id % 21 = 0 THEN ' id 078-05-1120' ELSE '' END) "
        "|| (CASE WHEN doc_id % 13 = 0 THEN "
        "' ip 10.' || (doc_id % 256)::VARCHAR || '.0.1' ELSE '' END) "
        f"|| (CASE WHEN doc_id % 17 = 0 THEN ' card {_PII_CARD_VALID}' "
        "ELSE '' END) "
        f"|| (CASE WHEN doc_id % 19 = 0 THEN ' card {_PII_CARD_INVALID}' "
        "ELSE '' END)"
    )


def _luhn_total(card: Column) -> Column:
    """Luhn digit sum of a 16-digit card candidate (separators
    stripped): doubling applies to odd 1-based positions from the left
    because the length is fixed at 16. Pure int arithmetic over ascii
    codes — identical in Spark and DuckDB (the SQL twin is
    _luhn_total_sql)."""
    d = F.translate(card, "- ", "")

    def term(i: Column) -> Column:
        v = F.ascii(F.substr(d, i, F.lit(1))) - F.lit(48)
        dbl = v * 2
        return F.when(
            i % 2 == 1, F.when(dbl > 9, dbl - 9).otherwise(dbl)
        ).otherwise(v)

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(16)),
        F.lit(0),
        lambda acc, i: acc + term(i),
    )


def _luhn_total_sql(card: str) -> str:
    """ANSI twin of _luhn_total over a candidate expression `card`."""
    v = f"(ascii(substr(replace(replace({card}, '-', ''), ' ', ''), i, 1)) - 48)"
    return (
        f"list_sum(list_transform(range(1, 17), i -> "
        f"CASE WHEN i % 2 = 1 THEN "
        f"CASE WHEN {v} * 2 > 9 THEN {v} * 2 - 9 ELSE {v} * 2 END "
        f"ELSE {v} END))"
    )


def pii_hits_col(txt: Column) -> Column:
    """Total PII matches across every detector kind — the single
    shared gate expression (batch funnel, streaming ingest twin, any
    zero-PII policy)."""
    total = F.lit(0)
    for pat in _PII_PATTERNS.values():
        total = total + F.regexp_count(txt, F.lit(pat))
    return total


def pii_redacted_col(txt: Column) -> Column:
    """The redacted text — every pattern replaced by its typed
    placeholder in the PINNED order (_PII_REDACTIONS). Single shared
    fold: the batch audit, the streaming twins, and any consumer
    hashing redacted bytes must apply the identical sequence."""
    red = txt
    for kind, repl in _PII_REDACTIONS:
        red = F.regexp_replace(red, _PII_PATTERNS[kind], repl)
    return red


def pii_redact_audit_cols(txt: Column) -> list[Column]:
    """The redaction audit projection over a planted-text column:
    per-type counts (incl. the Luhn-validity split of card-shaped
    candidates), md5 of the redacted text (pinned card → SSN → phone
    → email → IPv4 order, all occurrences), and the length delta."""
    red = pii_redacted_col(txt)
    cards = F.regexp_extract_all(txt, F.lit(_PII_CARD), F.lit(0))
    return [
        F.regexp_count(txt, F.lit(_PII_EMAIL)).alias("n_emails"),
        F.regexp_count(txt, F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count(txt, F.lit(_PII_SSN)).alias("n_ssns"),
        F.regexp_count(txt, F.lit(_PII_IPV4)).alias("n_ipv4"),
        F.size(cards).alias("n_cards"),
        F.size(
            F.filter(cards, lambda c: _luhn_total(c) % 10 == 0)
        ).alias("n_cards_luhn"),
        F.md5(red).alias("redacted_md5"),
        (F.length(red) - F.length(txt)).alias("len_delta"),
    ]


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII REDACTION — the transform behind pii_scan's gate: replace
    every card-shaped / email / phone-shaped / SSN-shaped / IPv4 token
    with a typed placeholder, in a pinned order (card → SSN → phone →
    email → IPv4, all occurrences). Uses pii_scan's planted-positive
    corpus and the SAME patterns, so the scan and the redaction stay
    in lockstep. Card redaction is shape-based (conservative); the
    audit splits shaped vs Luhn-valid counts (n_cards / n_cards_luhn)
    so downstream consumers see the false-positive rate.

    Output per doc: the per-type counts, the redacted text's md5 (the
    oracle hash-match pins BYTE equality of the full redacted text
    without shipping it), and the length delta. Scale: pure regexp
    map expressions — no shuffle beyond the final orderBy. The
    streaming twin (pipelines.streaming.streaming_pii_redact) runs the
    SAME shared expressions on ingest."""
    docs = read_table_spread(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", *pii_redact_audit_cols(pii_planted_txt()))
        .orderBy("doc_id")
    )


def pii_redact_sql() -> str:
    txt = pii_planted_txt_sql()
    red = f"({txt})"
    for kind, repl in _PII_REDACTIONS:
        red = f"regexp_replace({red}, '{_PII_PATTERNS[kind]}', '{repl}', 'g')"
    luhn = _luhn_total_sql("c")
    return f"""
        WITH t AS (SELECT doc_id, {txt} AS txt, {red} AS red
                   FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(txt, '{_PII_EMAIL}'))::BIGINT
                 AS n_emails,
               len(regexp_extract_all(txt, '{_PII_PHONE}'))::BIGINT
                 AS n_phones,
               len(regexp_extract_all(txt, '{_PII_SSN}'))::BIGINT
                 AS n_ssns,
               len(regexp_extract_all(txt, '{_PII_IPV4}'))::BIGINT
                 AS n_ipv4,
               len(regexp_extract_all(txt, '{_PII_CARD}'))::BIGINT
                 AS n_cards,
               len(list_filter(regexp_extract_all(txt, '{_PII_CARD}'),
                               c -> {luhn} % 10 = 0))::BIGINT
                 AS n_cards_luhn,
               md5(red) AS redacted_md5,
               (length(red) - length(txt))::BIGINT AS len_delta
        FROM t ORDER BY doc_id
    """


def _kind_spans(txt: Column, kind: str) -> Column:
    """array<struct<kind,start,len>> of every `kind` match in txt —
    (1-based start, length) computed WITHOUT position-returning regex
    (neither engine has one): start_i = 1 + Σ len(segment_1..i) +
    Σ len(match_1..i−1), where segments come from splitting on the
    same pattern. split keeps trailing empty segments (limit −1), so
    segment i exists for every match i."""
    pat = _PII_PATTERNS[kind]
    ms = F.regexp_extract_all(txt, F.lit(pat), F.lit(0))
    ss = F.split(txt, pat)

    def span(i: Column) -> Column:
        seg_len = F.aggregate(
            F.slice(ss, F.lit(1), i), F.lit(0), lambda a, s: a + F.length(s)
        )
        pre_len = F.aggregate(
            F.slice(ms, F.lit(1), i - F.lit(1)),
            F.lit(0),
            lambda a, s: a + F.length(s),
        )
        return F.struct(
            F.lit(kind).alias("kind"),
            (seg_len + pre_len + F.lit(1)).cast("long").alias("start"),
            F.length(F.element_at(ms, i)).cast("long").alias("len"),
        )

    empty = "array<struct<kind:string,start:bigint,len:bigint>>"
    return F.when(F.size(ms) == 0, F.expr(f"cast(array() as {empty})")).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(ms)), span)
    )


def pii_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level PII audit (VERDICT r13 item 5) — per document, the
    exact (kind, start, len) of every PII match on the planted text,
    one row per span, so redaction is verifiable offset-by-offset
    (slice the original text at [start, start+len) and you get the
    token the redactor replaced). Spans are computed PER KIND on the
    ORIGINAL text — the audit reports what each detector sees before
    any replacement, so overlapping kinds each report their own span.

    Start positions without a position-returning regex primitive:
    split the text on the pattern and prefix-sum segment and match
    lengths (both engines agree on split semantics including trailing
    empties). The per-doc span count is tiny, so the O(n²) prefix-sum
    inside transform() is constant work per row; the whole query is
    one map-side projection + explode, shuffle-free until the final
    ORDER BY.

    Output: (doc_id, kind, start, len), 1-based start, ordered by
    (doc_id, start, kind)."""
    docs = read_table_spread(spark, sf_dir, "documents")
    txt = pii_planted_txt()
    all_spans = F.concat(
        *[_kind_spans(txt, kind) for kind, _ in _PII_REDACTIONS]
    )
    return (
        docs.select("doc_id", F.explode(all_spans).alias("s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.start").alias("start"),
            F.col("s.len").alias("len"),
        )
        .orderBy("doc_id", "start", "kind")
    )


def pii_spans_sql() -> str:
    txt = pii_planted_txt_sql()
    kind_selects = []
    for kind, _ in _PII_REDACTIONS:
        pat = _PII_PATTERNS[kind]
        kind_selects.append(
            f"""
          SELECT doc_id, '{kind}' AS kind,
                 (coalesce(list_sum(list_transform(ss[1:i],
                     s -> length(s))), 0)
                  + coalesce(list_sum(list_transform(ms[1:i-1],
                     s -> length(s))), 0) + 1)::BIGINT AS start,
                 length(ms[i])::BIGINT AS len
          FROM (SELECT doc_id,
                       regexp_extract_all(txt, '{pat}') AS ms,
                       regexp_split_to_array(txt, '{pat}') AS ss
                FROM t),
               unnest(range(1, len(ms) + 1)) AS u(i)"""
        )
    union = "\n          UNION ALL".join(kind_selects)
    return f"""
        WITH t AS (SELECT doc_id, {txt} AS txt FROM documents)
        SELECT doc_id, kind, start, len FROM ({union})
        ORDER BY doc_id, start, kind
    """


def kmv_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEPLOYABLE rendition of kmv_source_overlap — sketch only,
    no exact audit (VERDICT r12 item 6): per-group K-minimum-values
    sketches built directly as TakeOrdered(K) over each group's
    distinct shingle hashes, then pure set algebra on the ≤2K merged
    values. The full-universe per-shingle rollup that rides along in
    kmv_source_overlap (the oracle-side audit) never runs here — the
    only shuffle over the corpus is the (g, hash) distinct; everything
    after it touches K rows per group.

    Output == the sketch columns of kmv_source_overlap, value for
    value (pinned in tests): the global k-min set M ⊆ (A's k-min ∪
    B's k-min) — any hash among the K smallest overall is necessarily
    among its own group's K smallest — so merging the two per-group
    sketches and re-taking the K smallest reproduces M and its
    membership flags exactly. That subset identity is also why shard
    sketches merge associatively at any fan-in: union + re-top-K.

    Scale: per-group sketches are TakeOrderedAndProject (map-side
    partial top-K, driver merges K·n_parts values) — no global sort,
    no vocabulary-sized state, and the sketch artifact is K int64s per
    group."""
    docs = read_table(spark, sf_dir, "documents")
    # try_cast (not cast): ANSI-safe NULLing of malformed sources,
    # matching the oracle's TRY_CAST — see kmv_source_overlap.
    grp = (F.expr("try_cast(substring(source, 4) as int)") % 2).alias("g")
    hg = (
        docs.select(grp, words_col(F.col("text")).alias("ws"))
        .filter(F.col("g").isNotNull())
        .select("g", F.explode(decon_shingle_arr("ws")).alias("sh"))
        .select("g", h60(F.col("sh")).alias("h"))
        .distinct()
    )
    k = KMV_SET_K
    ka = hg.filter(F.col("g") == 0).select("h").orderBy("h").limit(k)
    kb = hg.filter(F.col("g") == 1).select("h").orderBy("h").limit(k)
    merged = (
        ka.select("h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            kb.select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    m = merged.orderBy("h").limit(k)
    sk = m.agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("rho"),
    ).select(
        "n_kept",
        "kth_hash",
        "rho",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1) * 2.0**60) / F.col("kth_hash")
            ).cast("bigint")
        )
        .alias("union_est"),
    )
    return sk.select(
        "n_kept",
        "kth_hash",
        "rho",
        "union_est",
        F.expr("(rho * union_est) div n_kept").alias("inter_est"),
    )


def kmv_overlap_sketch_sql() -> str:
    parts = " || ' ' || ".join(f"w[i+{k}]" for k in range(DECON_NGRAM))
    k = KMV_SET_K
    return f"""
        WITH ws AS (
          SELECT (TRY_CAST(substr(source, 4) AS INT) % 2) AS g,
                 {WORDS_SQL} AS w
          FROM documents
        ), sh_g AS (
          SELECT DISTINCT g, {parts} AS sh
          FROM ws, unnest(range(1, greatest(len(w) - {DECON_NGRAM - 2}, 1)))
               AS t(i)
          WHERE g IS NOT NULL
        ), hg AS (
          SELECT DISTINCT g, {h60_sql('sh')} AS h FROM sh_g
        ), ka AS (
          SELECT h FROM hg WHERE g = 0 ORDER BY h LIMIT {k}
        ), kb AS (
          SELECT h FROM hg WHERE g = 1 ORDER BY h LIMIT {k}
        ), merged AS (
          SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
            SELECT h, 1 AS in_a, 0 AS in_b FROM ka
            UNION ALL
            SELECT h, 0 AS in_a, 1 AS in_b FROM kb
          ) GROUP BY h
        ), m AS (
          SELECT * FROM merged ORDER BY h LIMIT {k}
        ), sk0 AS (
          SELECT count(*)::BIGINT AS n_kept, max(h) AS kth_hash,
                 sum(in_a * in_b)::BIGINT AS rho
          FROM m
        ), sk AS (
          SELECT n_kept, kth_hash, rho,
                 CASE WHEN n_kept < {k} THEN n_kept
                      ELSE CAST(floor({float(k - 1) * 2.0**60!r} / kth_hash)
                                AS BIGINT) END AS union_est
          FROM sk0
        )
        SELECT n_kept, kth_hash, rho, union_est,
               ((rho * union_est) // n_kept)::BIGINT AS inter_est
        FROM sk
    """


def source_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset report card — the one-pass rollup a data
    curator reads before admitting a source into the training mix,
    composing already-verified signals: doc count, token volume,
    language spread, mean quality (fixedpoint-deterministic), and the
    exact-duplicate footprint (docs whose content hash occurs >= 2
    times anywhere in the corpus — cross-source aware, so a mirror
    site shows up in BOTH cards).

    Plan: one per-doc projection (tokens/quality/content hash), one
    hash-keyed agg + join-back for the dup flag (the dedup_exact
    chain's shape), one source-keyed rollup. Every ratio/mean goes
    through ops.fixedpoint so the card is bit-stable under any
    partitioning; at 100 TB each stage is a map-side-combined agg or
    a well-spread hash join — no window, no driver state."""
    from gis_etl_spark.ops.fixedpoint import fxavg

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = words_col(F.col("text"))
    per = docs.select(
        "source",
        "lang",
        F.md5("text").alias("fph"),
        F.size(w).alias("n"),
        F.size(F.array_distinct(w)).alias("nd"),
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).alias("nstop"),
    ).withColumn(
        "q",
        F.round(
            F.least(F.col("n") / F.lit(100.0), F.lit(1.0))
            * (F.col("nd") / F.col("n"))
            * (1.0 - F.col("nstop") / F.col("n")),
            4,
        ),
    )
    dup = (
        per.groupBy("fph")
        .agg(F.count("*").alias("n_copies"))
        .select("fph", (F.col("n_copies") >= 2).alias("is_dup"))
    )
    return (
        per.join(dup, "fph")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            fxavg("q", nd=4, out=4).alias("mean_quality"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias(
                "n_dup_docs"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_langs",
            "mean_quality",
            "n_dup_docs",
            F.round(F.col("n_dup_docs") / F.col("n_docs"), 4).alias(
                "dup_frac"
            ),
        )
        .orderBy("source")
    )


def source_data_card_sql() -> str:
    from gis_etl_spark.ops.fixedpoint import fxavg_sql

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
        WITH per AS (
          SELECT source, lang, md5(text) AS fph,
                 len(w) AS n,
                 len(list_distinct(w)) AS nd,
                 len(list_filter(w, x -> x IN ({stop_list}))) AS nstop
          FROM (
            SELECT source, lang, text, {WORDS_SQL} AS w
            FROM documents WHERE text IS NOT NULL
          )
        ), q AS (
          SELECT source, lang, fph, n,
                 round(least(n / 100.0, 1.0)
                       * (nd * 1.0 / n)
                       * (1.0 - nstop * 1.0 / n), 4) AS q
          FROM per
        ), dup AS (
          SELECT fph, count(*) >= 2 AS is_dup FROM q GROUP BY fph
        )
        SELECT q.source,
               count(*)::BIGINT AS n_docs,
               sum(q.n)::BIGINT AS n_tokens,
               count(DISTINCT q.lang)::BIGINT AS n_langs,
               {fxavg_sql('q.q', nd=4, out=4)} AS mean_quality,
               sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END)::BIGINT
                 AS n_dup_docs,
               round(sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS dup_frac
        FROM q JOIN dup d USING (fph)
        GROUP BY q.source ORDER BY q.source
    """
