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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_etl_spark.io import read_table

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
    return {
        "text_token_stats": f"""
            SELECT doc_id,
                   len({w}) AS n_tokens,
                   len(list_distinct({w})) AS n_distinct,
                   length(replace(trim(text), ' ', '')) AS n_letters,
                   round(length(replace(trim(text), ' ', ''))
                         / len({w}), 4) AS avg_token_len
            FROM documents
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
    }
