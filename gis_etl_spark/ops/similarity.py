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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_etl_spark.io import read_table
from gis_etl_spark.ops.text import h60_sql

TOPK = 5
N_QUERIES = 8          # query set = vec_id < 8
NEAR_T = 0.4           # near-pair cosine threshold
PAIR_SLICE = 1000      # exact near-pair gate: vec_id < 1000
# 32 planes, 8 bands × 4 bits — swept empirically: this corpus's true
# neighbors sit at cosine ≈ 0.5 (per-plane agreement ~0.63), a hard LSH
# regime; this config measures recall 0.80 at ~39% candidate rate
# (finer bands collapse recall, coarser ones degenerate to brute force).
N_PLANES = 32
N_SIG_BANDS = 8
BAND_BITS = N_PLANES // N_SIG_BANDS


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


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


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
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cos", 6).alias("sim"),
        )
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


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: hyperplane signature → 8-bit band buckets →
    candidates sharing any band with a query → exact cosine rerank →
    top-k. Recall < 1 by construction; the oracle runs the identical
    pipeline so results still hash-match."""
    emb = _emb(spark, sf_dir)
    sig = _signatures(emb, _planes(spark))
    bands = sig.select(
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
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select(
            "query_id", "neighbor_id", "rank",
            F.round("cos", 6).alias("sim"),
        )
        .orderBy("query_id", "rank")
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
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
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
