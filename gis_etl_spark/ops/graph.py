"""Graph analytics [beyond-reference]: fixed-iteration PageRank in
EXACT int64 arithmetic.

The reference engine has no graph surface (SURVEY §2); the engine
already ships one iterative graph algorithm — min-label propagation for
duplicate clusters (ops/dedup.py) — and this adds the other canonical
one. PageRank here is the canonical Spark ITERATIVE-algorithm shape
done right: each iteration is a join + one partial-aggregated groupBy
(never a collect, never a cross join), the rank vector stays
distributed, and the iteration count is fixed so the lazy plan is
bounded (at deeper iteration counts, checkpoint the rank frame each ~5
rounds to truncate lineage — same note as the dedup fixpoint loop).

Exactness contract (what makes the oracle a hash-match, not an
approximation): ranks are int64 fixed-point units summing to ~PR_SCALE.
- initial rank = PR_SCALE div N,
- contribution  = rank div degree       (integer division),
- new rank      = (15·base + 85·inbound) div 100   (damping 0.85).
Integer division is deterministic in every engine — no float sum ever
happens, so shuffle order cannot flip a single unit. The mass lost to
the divisions is itself deterministic. (Float PageRank would need the
fixedpoint.py quantize-per-iteration treatment instead.)

Graph: the customer↔supplier trade graph — distinct
(o_custkey, l_suppkey) pairs from orders⋈lineitem, undirected (both
directions materialized), node id = 2·custkey for customers and
2·suppkey+1 for suppliers. Undirected-from-edges means degree ≥ 1
everywhere: no dangling-mass redistribution term is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_etl_spark.io import read_table

PR_SCALE = 10**12
PR_ITERS = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected trade edges, both directions, distinct."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))


_EDGE_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _graph_key(spark: SparkSession, sf_dir: str) -> tuple:
    import os

    # applicationId, not id(spark): after a session is stopped and
    # garbage-collected, CPython can reuse the same id for a new
    # session, which would hand back DataFrames bound to a dead JVM.
    parts = [spark.sparkContext.applicationId]
    for t in ("orders", "lineitem"):
        st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
        parts += [st.st_mtime_ns, st.st_size]
    return tuple(parts)


def _edges_deg_cached(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Persisted (edges, degrees), memoized per (session, corpus
    fingerprint) — one cache entry per dataset, not per builder call."""
    key = _graph_key(spark, sf_dir)
    if key not in _EDGE_CACHE:
        edges = _edges(spark, sf_dir).persist()
        deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
        _EDGE_CACHE[key] = (edges, deg)
    return _EDGE_CACHE[key]


def pagerank_reference(
    edges: list[tuple[int, int]], iters: int = PR_ITERS
) -> dict[int, int]:
    """Sequential pure-Python twin of the distributed loop — the
    independent reference tests compare against (same role as
    kmeans_reference for the Lloyd trainer)."""
    from collections import defaultdict

    adj: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    n = len(adj)
    base = PR_SCALE // n
    rank = {u: base for u in adj}
    for _ in range(iters):
        inbound: dict[int, int] = defaultdict(int)
        for u, nbrs in adj.items():
            c = rank[u] // len(nbrs)
            for v in nbrs:
                inbound[v] += c
        rank = {u: (15 * base + 85 * inbound[u]) // 100 for u in adj}
    return rank


def pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the customer↔supplier trade graph.

    Per iteration: contributions = edges ⋈ ranks (equi-join on src),
    inbound = groupBy(dst).sum (int64, partial map-side), new ranks =
    closed-form integer update. N (node count) is the one driver scalar
    (the A8 aggregate-to-driver pattern); everything else stays
    distributed. At 100 TB-scale graphs, pre-partition edges and ranks
    on the node key once (bucketing) so the per-iteration join stops
    shuffling the edge table — the rank side is the only mover."""
    # materialize the edge list ONCE: without this, each iteration's
    # lazy plan re-runs the orders⋈lineitem distinct (3x the dominant
    # cost). At cluster scale this is the same move — write/bucket the
    # edge table once, iterate over it. The persisted frames are
    # memoized per (session, corpus fingerprint): the gate calls the
    # builder repeatedly and a fresh persist per call would leak a
    # cache entry each time.
    edges, deg = _edges_deg_cached(spark, sf_dir)
    n = deg.count()
    base = PR_SCALE // n
    # rank/inbound tables are O(nodes) — when the node population fits
    # an executor (≤ ~1M ids × 24 B), broadcasting them makes every
    # per-iteration join map-side and the edge table NEVER moves (the
    # bucketed-join recipe below stays the >1M-node path). Measured
    # 2.8 → 2.1 s at sf0.1 (r8); the n-guard keeps the plan honest at
    # graph scales where a broadcast would OOM.
    bcast = (lambda df: F.broadcast(df)) if n <= 1_000_000 else (
        lambda df: df
    )
    ranks = deg.select(
        F.col("src").alias("node"), "deg", F.lit(base).alias("rank")
    )
    for _ in range(PR_ITERS):
        contribs = edges.join(
            bcast(ranks), edges.src == ranks.node
        ).select(
            F.col("dst").alias("node"),
            F.expr("rank div deg").alias("c"),
        )
        inbound = contribs.groupBy("node").agg(F.sum("c").alias("inb"))
        ranks = (
            deg.select(F.col("src").alias("node"), "deg")
            .join(bcast(inbound), "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(15 * base)
                    + F.lit(85) * F.coalesce(F.col("inb"), F.lit(0))
                )
                .cast("long")
                .alias("num"),
            )
            .select("node", "deg", F.expr("num div 100").alias("rank"))
        )
    return ranks.select(
        F.col("node").alias("node_id"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.col("rank").alias("rank_units"),
    ).orderBy(F.desc("rank_units"), "node_id")


def pagerank_trade_sql() -> str:
    """The same 3 iterations unrolled as CTEs — integer division via
    DuckDB's `//` (floor division; all operands non-negative, so it
    agrees with Spark's `div`)."""
    steps = [
        f"""pairs AS (
          SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ), edges AS (
          SELECT c AS src, s AS dst FROM pairs
          UNION ALL
          SELECT s AS src, c AS dst FROM pairs
        ), deg AS (
          SELECT src AS node, count(*)::BIGINT AS deg
          FROM edges GROUP BY src
        ), params AS (
          SELECT {PR_SCALE}::BIGINT // count(*) AS base FROM deg
        ), r0 AS (
          SELECT node, deg, (SELECT base FROM params) AS rank FROM deg
        )"""
    ]
    for t in range(PR_ITERS):
        steps.append(
            f"""c{t} AS (
          SELECT e.dst AS node, sum(r.rank // r.deg)::BIGINT AS inb
          FROM edges e JOIN r{t} r ON e.src = r.node
          GROUP BY e.dst
        ), r{t + 1} AS (
          SELECT d.node, d.deg,
                 (15 * (SELECT base FROM params)
                  + 85 * COALESCE(c.inb, 0)) // 100 AS rank
          FROM deg d LEFT JOIN c{t} c USING (node)
        )"""
        )
    ctes = ",\n        ".join(steps)
    return f"""
        WITH {ctes}
        SELECT node AS node_id,
               CASE WHEN node % 2 = 0 THEN 'customer'
                    ELSE 'supplier' END AS kind,
               rank AS rank_units
        FROM r{PR_ITERS}
        ORDER BY rank_units DESC, node_id
    """
