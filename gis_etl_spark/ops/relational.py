"""Relational query pack — SURVEY.md §2.3/2.4/2.5/2.7/2.8 operator
coverage, expressed as lazy DataFrame builders over the driver's
TPC-H-ish tables (FIXTURES.md §A).

Design rules (scale-first):
- Declarative plans only; Catalyst owns pushdown/pruning/reordering.
- Small dimensions are broadcast explicitly (`F.broadcast`) so the
  plan never sort-merge-joins a 5-row region table at 100 TB.
- Every computed column is aliased; float SUM/AVG aggregates go through
  ops.fixedpoint (quantize → exact integer sum → one deterministic
  rounding) so results are bit-identical regardless of partial-
  aggregation order, both here and in the ANSI oracle. Plain
  round(sum(double)) is NOT order-stable — see fixedpoint.py.
- No collect(), no driver loops: every builder returns a DataFrame.

Each builder takes (spark, sf_dir) and pairs with an ANSI oracle in
`gis_etl_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_etl_spark.io import read_table
from gis_etl_spark.ops.fixedpoint import (
    fxavg,
    fxq,
    fxratio,
    fxsum,
    fxsum_over,
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (public spec): scan → filter → group → agg → sort.

    Flagship slice per SURVEY.md §7.3 — exercises S5/P3/A1/A2/O2 in one
    statement. The shipdate filter pushes into the parquet scan; the
    aggregation is a two-phase hash agg (partial map-side, final after
    a 2-key shuffle), replacing the reference's manual staging-table
    partial/final idiom (East-Asia-Building-Footprints.md:243-269).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fxsum("l_quantity").alias("sum_qty"),
            fxsum("l_extendedprice").alias("sum_base_price"),
            fxsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            fxsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            fxavg("l_quantity").alias("avg_qty"),
            fxavg("l_extendedprice").alias("avg_price"),
            fxavg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → group → top-10 by revenue.

    customer is small relative to lineitem → broadcast; orders⋈lineitem
    shuffles on the order key. Top-10 compiles to TakeOrderedAndProject
    (no global sort materialization).
    """
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            fxsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two broadcast dims → group by nation.

    region/nation/supplier are tiny → broadcast; the only shuffles are
    lineitem⋈orders and the final 1-key aggregation.
    """
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            fxsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            fxsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def count_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped COUNT(*) — A1 (east_asia.py:174-180). Column-pruned scan:
    reads only parquet row-group metadata, no data pages."""
    return read_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


def group_count_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) GROUP BY with named (not ordinal) key — A2
    (east_asia.py:336-340); ORDER BY count ascending — O2."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("cnt"), F.asc("o_orderpriority"))
    )


def count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — A3 distinct-source audit
    (East-Asia-Building-Footprints.md:171-174). Exact; at 100 TB scale
    swap to approx_count_distinct when a 2% error is acceptable."""
    return (
        read_table(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


def minmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over computed expressions — A4 global-bbox shape
    (East-Asia-Building-Footprints.md:231-237; segfaulted the reference's
    engine — ours must pass). Single partial/final agg, no shuffle of
    data rows."""
    o = read_table(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_date"),
        F.round(F.max(F.col("o_totalprice") * 0.1), 4).alias("max_price_tenth"),
    )


def orders_top15_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT k — O2/O3; physical plan is
    TakeOrderedAndProject (per-partition top-k + driver merge), never a
    global sort."""
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


def filter_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + equality predicates — P7 antimeridian-guard shape
    (East-Asia-Building-Footprints.md:267-268). Both predicates push to
    the parquet scan (PushedFilters)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("value") > 50.0)
        & (F.col("value") < 150.0)
        & (F.col("event_type") == "click")
    ).select("event_id", "user_id", "value")


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — J1 inputs-lacking-outputs set difference
    (East-Asia-Building-Footprints.md:127-141)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def suppliers_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join — existence check without duplication (J2 manifest
    lookup shape, east_asia.py:382-393)."""
    supp = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 45.0
    )
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


def union_all_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — §2.8; the reference's multi-file scan *is* its union
    (SURVEY.md §2.8)."""
    r = read_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"), F.lit("region").alias("src")
    )
    n = read_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.lit("nation").alias("src")
    )
    return r.unionByName(n)


def custkeys_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — §2.8 Python set-difference analog."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    recent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.subtract(recent)


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k — §2.6 (north-star similarity uses the same shape).
    row_number over (custkey, price desc); rank filter prunes to ≤3 rows
    per key before any downstream op."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )
    return (
        read_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def running_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window aggregate over event time — §2.6/§2.10 prep.
    Deterministic accumulation order (ts, event_id) so the rounded
    running sum is comparable to the ANSI oracle."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        read_table(spark, sf_dir, "events")
        .withColumn("running_value", fxsum_over("value", w))
        .select("user_id", "event_id", "running_value")
    )


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch rendition) — §2.10; the
    streaming twin lives in pipelines/streaming.py. date_trunc is a
    JVM-side expression; group keys (hour, type) shuffle once."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            fxsum("value").alias("total_value"),
        )
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization — classic stateful-stream op done in
    batch with windows: lag → gap flag → cumulative session id. The
    streaming twin (applyInPandasWithState) is in pipelines/streaming.py.
    30-minute gap threshold."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = read_table(spark, sf_dir, "events")
    with_gap = ev.withColumn(
        "new_session",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w_user)
            > 1_800_000_000
        ).cast("int"),
    ).withColumn(
        "session_seq",
        F.sum(F.coalesce(F.col("new_session"), F.lit(0))).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_gap.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            fxsum("value").alias("session_value"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    pushes to the parquet scan, zero joins, one partial/final agg.
    The canonical 'is pushdown working' query."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            fxsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast join
    (promo-type revenue share)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            fxsum(
                F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
            ).alias("promo_revenue"),
            fxsum(rev).alias("total_revenue"),
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregate (large-quantity orders)
    joined back to customers — aggregate-then-join keeps the shuffle
    on the small aggregated side."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(fxsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(30)
    )


def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — free Catalyst capability (SURVEY.md §2.5): counts of
    linestatus per returnflag, statuses as columns. Explicit pivot
    values keep the plan single-pass (no distinct-scan)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .withColumnRenamed("F", "status_f")
        .withColumnRenamed("O", "status_o")
        .na.fill(0)
        .orderBy("l_returnflag")
    )


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (status, priority)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            fxsum("o_totalprice").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "cnt",
            "total",
        )
    )


def orders_by_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + grouping (engine date-function surface)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.count("*").alias("cnt"),
            fxavg("o_totalprice").alias("avg_price"),
        )
        .orderBy("yr", "mo")
    )


def source_id_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: regexp extraction + split_part analog
    (F14, East-Asia-Building-Footprints.md:153) on document sources."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.regexp_extract("source", r"(\d+)", 1).cast("int").alias("src_num"),
            F.substring_index("source", "c", 1).alias("prefix"),
            F.length("text").alias("text_len"),
        )
        .filter(F.col("src_num") % 3 == 0)
    )


def orders_with_heavy_items_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery through the spark.sql surface —
    Catalyst decorrelates it into a semi-join (SURVEY.md §4.1 'free'
    rewrites; verify with explain: no per-row subquery execution)."""
    from gis_etl_spark.io import load_tables

    load_tables(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
        )
        """
    )


def orders_above_avg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery via spark.sql — one extra job for
    the scalar, then a pushed filter."""
    from gis_etl_spark.io import load_tables

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB form of A3 where
    exact COUNT(DISTINCT) would shuffle every key. rows-only contract
    entry (sketch internals differ per engine); pytest bounds the error
    vs the exact twin."""
    o = read_table(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers")
    )


KMV_K = 256  # sketch size: rel. std error ≈ 1/sqrt(K-1) ≈ 6.3%


def kmv_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002) — the
    deterministic, ENGINE-PORTABLE counterpart of
    approx_distinct_customers: estimate = (K-1)·2^60 / h_K where h_K is
    the K-th smallest distinct 60-bit md5-derived key hash. Unlike the
    built-in HLL (whose sketch internals differ per engine, forcing a
    rows-only check), every step here — md5, hex→int, DISTINCT, global
    top-K, one division — is identical ANSI arithmetic in Spark and
    DuckDB, so the estimate hash-matches exactly.

    Scale shape: the hash projects map-side; DISTINCT on the 60-bit
    hash is a well-distributed partial-agg shuffle (no key skew by
    construction); the top-K is TakeOrdered (per-partition K then
    driver merge of n_part·K values), never a global sort. When fewer
    than K distinct keys exist the sketch degrades to the exact count,
    per the standard KMV rule."""
    o = read_table(spark, sf_dir, "orders")
    k = KMV_K
    # NULL keys hash to NULL and must be excluded explicitly: Spark
    # sorts NULL first ascending, DuckDB last — a null reaching the
    # top-K would silently diverge the two engines
    hashes = (
        o.filter(F.col("o_custkey").isNotNull())
        .select(
            F.conv(
                F.substring(
                    F.md5(F.col("o_custkey").cast("string")), 1, 15
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h")
        )
        .distinct()
    )
    topk = hashes.orderBy("h").limit(k)
    return topk.agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_hash")
    ).select(
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1) * 2.0**60) / F.col("kth_hash")
            ).cast("bigint")
        )
        .alias("est_customers"),
    )


KMV_DISTINCT_SQL = f"""
WITH h AS (
  SELECT DISTINCT
         ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT AS h
  FROM orders WHERE o_custkey IS NOT NULL
), topk AS (
  SELECT h FROM h ORDER BY h LIMIT {KMV_K}
)
SELECT count(*) AS n_kept, max(h) AS kth_hash,
       CASE WHEN count(*) < {KMV_K} THEN count(*)
            ELSE CAST(floor({float(KMV_K - 1) * 2.0**60!r} / max(h))
                      AS BIGINT) END AS est_customers
FROM topk
"""


SAMPLE_MOD = 16  # deterministic 1/16 hash sample


def sampled_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-sampled exact-rank quantiles — the deterministic,
    ENGINE-PORTABLE counterpart of approx percentile sketches
    (t-digest / GK internals differ per engine, forcing rows-only
    checks; reference exposes quantile pragmas via its SQL engine).
    Sample lineitem at 1/SAMPLE_MOD by a 60-bit md5-derived row-key
    hash (stable across engines AND across runs — the same rows are
    always in the sample), then per return flag select the p25/p50/p75
    prices at INTEGER ranks floor((n-1)·p)+1 of the totally-ordered
    sample. No interpolation: every output is a value present in the
    data, so the cross-engine hash-match is bit-exact on doubles.

    Scale shape: the hash filter is map-side (a 100 TB scan keeps
    1/16 — raise SAMPLE_MOD to bound the sample absolutely); the only
    shuffle is the per-group sort of the SAMPLE, whose size the
    modulus controls, never the raw table. Rank selection via one
    window pass + partial agg — no second shuffle. The tie-break
    (price, orderkey, linenumber) makes the total order — and hence
    the selected quantile row — unique and deterministic."""
    li = read_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    s = (
        li.filter(
            F.col("l_orderkey").isNotNull()
            & F.col("l_linenumber").isNotNull()
            & F.col("l_extendedprice").isNotNull()
            & F.col("l_returnflag").isNotNull()
        )
        .filter(h % SAMPLE_MOD == 0)
        .select(
            "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = s.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def _at(p: float) -> F.Column:
        # quarters are exact in binary, so floor((n-1)*p) agrees
        # bit-for-bit with DuckDB's decimal arithmetic
        rank = F.floor((F.col("n") - 1) * F.lit(p)) + 1
        return F.min(
            F.when(F.col("rn") == rank, F.col("l_extendedprice"))
        )

    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n_sample"),
            _at(0.25).alias("p25"),
            _at(0.5).alias("p50"),
            _at(0.75).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


SAMPLED_QUANTILES_SQL = f"""
WITH s AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
             ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
    AND ('0x' || substr(md5(l_orderkey::VARCHAR || '|'
                            || l_linenumber::VARCHAR), 1, 15))::BIGINT
        % {SAMPLE_MOD} = 0
)
SELECT l_returnflag, max(n)::BIGINT AS n_sample,
       min(CASE WHEN rn = CAST(floor((n - 1) * 0.25) AS BIGINT) + 1
                THEN l_extendedprice END) AS p25,
       min(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
                THEN l_extendedprice END) AS p50,
       min(CASE WHEN rn = CAST(floor((n - 1) * 0.75) AS BIGINT) + 1
                THEN l_extendedprice END) AS p75
FROM s GROUP BY l_returnflag ORDER BY l_returnflag
"""


def sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via Spark's NATIVE session_window (30-min
    gap) — same semantics as the lag+cumsum formulation
    (sessionize_events) but executed by the built-in merging-window
    operator; the oracle derives sessions independently with window
    functions, so this cross-checks Spark's operator itself."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            fxsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSS").alias(
                "session_start"
            ),
            "n_events",
            "session_value",
        )
    )


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2h window, 1h slide): each event
    lands in two windows; the oracle reproduces the assignment by
    exploding each event into its two covering window starts."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            fxsum("value").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def rollup_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — free Catalyst capability noted in SURVEY.md
    §2.5; subtotal rows use COALESCE sentinel so the oracle comparison is
    null-free."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), fxsum("l_quantity").alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "cnt",
            "qty",
        )
    )


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag — the A-family
    distributional summary (SURVEY §2.5 extension). Spark's
    `percentile` is exact (sort-based within agg); at 100 TB swap for
    `percentile_approx` (t-digest, mergeable partials, no global sort)
    — same call shape, documented trade."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-gated priority census. The fixture lacks
    commit/receipt dates, so the correlated condition is "some item
    shipped >90 days after the order" — same plan class: a left-semi
    join whose condition mixes the equi key with a cross-table residual
    (l_shipdate > o_orderdate + 90d). Catalyst keeps the equi part as
    the shuffle key and evaluates the residual post-match, so the plan
    stays a hash/merge semi-join, never a nested loop."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation dimension joins TWICE under different roles
    (supplier side / customer side) — alias-disambiguated self-reuse of
    a broadcast dim. Only shuffles: lineitem⋈orders and the final agg."""
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            fxsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's volume in a part
    segment, per order year. Conditional-sum-over-sum ratio; rounded to
    6 dp so partial-agg summation order can't flip the hash (the ratio's
    FP noise is ~1e-9 at this magnitude)."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    n_supp = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("s_nation")
    )
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == region.r_regionkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            fxratio(
                F.when(F.col("s_nation") == "NATION_9", volume).otherwise(0.0),
                volume,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (sans partsupp, which the fixture lacks): revenue
    on a part-name substring segment, grouped by supplier nation × order
    year. LIKE '%gear%' cannot push below the join build side, but the
    part filter prunes the broadcast table before it ships."""
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            fxsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("profit")
        )
        .orderBy("nation", "o_year")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) hitting the max period revenue.
    The scalar max is a 1-row aggregate broadcast-cross-joined back —
    the distributed form of Q15's revenue-view + MAX subquery (no
    window over an unpartitioned frame, which would single-task at
    100 TB). Ties compare on the ROUNDED revenue, so the equality is
    deterministic cross-engine."""
    supp = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        fxsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    Catalyst factors the common l_partkey equi-condition out as the join
    key and leaves the disjunction as a residual filter; the per-branch
    part predicates also derive a pushed-down union filter on the
    broadcast side (brand IN (...))."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1.0, 11.0)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10.0, 20.0)
    ) | (
        (F.col("p_brand") == "Brand#24")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20.0, 30.0)
    )
    return j.filter(branch).agg(
        fxsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    rolled up by segment (the fixture has no phone column — segment
    plays the country-code role). Composition: scalar-subquery
    threshold (1-row broadcast) + anti-join + group."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            fxsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


def q2_top_acctbal_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-max idiom (the fixture lacks partsupp, so
    the correlation is per-nation best supplier balance). Spark form: a
    partitioned window max — one shuffle on the correlation key —
    versus the oracle's correlated scalar subquery, which DuckDB
    decorrelates into the same shape. Equality compares stored values
    (no arithmetic), so FP ties are exact."""
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        supp.withColumn("nation_max", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("nation_max"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (sans partsupp — lineitem revenue plays the
    ps_supplycost*ps_availqty inventory-value role): per-part value
    among one nation's suppliers, kept when above 0.1% of that
    nation's total. Q11's scalar-subquery threshold becomes a 1-row
    aggregate broadcast-cross-joined back — never a window over an
    unpartitioned frame, which would single-task at 100 TB.

    Determinism: the HAVING compares exact int64 fixed-point unit
    sums (order-free integer addition) against 0.001×total computed
    with one identical IEEE double multiply on both engines, so group
    membership can never flip with partitioning."""
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    li = read_table(spark, sf_dir, "lineitem")
    scoped_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    scoped = li.join(
        F.broadcast(scoped_supp), li.l_suppkey == F.col("s_suppkey")
    ).select(
        "l_partkey",
        fxq(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("q"),
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("q").alias("units"))
    total = per_part.agg(F.sum("units").alias("total_units"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("units") > F.lit(0.001) * F.col("total_units"))
        .select(
            "l_partkey",
            (F.col("units").cast("double") / F.lit(1e4)).alias("value"),
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (the fixture lacks l_shipmode — l_returnflag
    plays the mode role): orders joined to a one-year lineitem slice,
    CASE-summed into high/low-priority counts per flag. The shipdate
    range pushes into the parquet scan; the join shuffles on orderkey
    once and the CASE sums fold into the final hash agg."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_n"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_n"),
        )
        .orderBy("l_returnflag")
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over a LEFT join —
    per-customer order counts (zero-order customers kept by counting
    the nullable join key), then the distribution of those counts.
    The priority exclusion stands in for Q13's o_comment NOT LIKE
    filter and lives in the join condition, not a post-filter, so
    excluded orders still leave their customers in the left side.

    Scale: first agg shuffles on c_custkey (pre-aggregated map-side),
    second agg on the tiny c_count domain — the second shuffle moves
    |customers| pre-counted rows, not lineitems."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem is the part↔supplier bridge — the
    fixture lacks partsupp): distinct supplier counts per surviving
    (brand, type, size) cell, excluding a brand, a type, and the
    complaint-supplier set (negative acctbal stands in for the
    comment LIKE filter; spec's NOT IN becomes a left_anti join).
    Both the pruned part table and the excluded-supplier set are
    broadcast, so the only shuffle is the distinct-count agg."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity sits below
    20% of that part's average. The correlated AVG subquery becomes a
    per-part aggregate joined back; the candidate part set is pruned
    and broadcast FIRST, so the average is only computed for parts
    that can match (semantically identical — the spec's subquery
    correlates only on partkey).

    Determinism: "qty < 0.2 * avg(qty)" is evaluated as the
    all-integer cross-multiplication  5·q·n < S  (q, S exact
    fixed-point quantity units, n the line count), which no float
    rounding can flip. avg_yearly then divides the order-free
    fixed-point revenue sum by 7.0 — one identical IEEE op per
    engine."""
    part_keys = (
        read_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 20)
        )
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem")
    cand = li.join(
        F.broadcast(part_keys), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = cand.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(fxq("l_quantity", 2)).alias("qty_units"),
        F.count("*").alias("n_lines_part"),
    )
    return (
        cand.join(per_part, cand.l_partkey == F.col("pk"))
        .filter(
            fxq("l_quantity", 2) * F.col("n_lines_part") * F.lit(5)
            < F.col("qty_units")
        )
        .agg(
            (fxsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (lineitem shipments play the ps_availqty
    role): names of NATION_9 suppliers who shipped more than a
    threshold quantity of name-prefixed parts in 1996. The spec's
    nested IN subqueries become: broadcast pruned part keys into the
    date-sliced lineitem scan, a per-supplier fixed-point HAVING, and
    a left_semi join into the supplier table. One shuffle total (the
    per-supplier agg); the threshold compare is exact int64."""
    parts = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(fxq("l_quantity", 2)).alias("qty_units"))
        .filter(F.col("qty_units") > 100 * 100)
        .select("l_suppkey")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_9"
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier finalized order (lateness stand-in: shipped more
    than 60 days after the order date — the fixture lacks commit/
    receipt dates). The spec's EXISTS / NOT EXISTS pair decorrelates
    into per-order distinct counts: n_supp > 1 AND n_late_supp == 1,
    joined back to the late lines. Counting late LINES (not distinct
    supplier-order pairs) matches the spec's l1-row semantics.

    Scale: everything hashes on orderkey — the per-order agg's
    exchange and the late-lines⋈per-order join align on the same key,
    so no row moves twice for different keys; supplier and (at test
    scale) orders broadcast. The oracle states the same query in the
    spec's correlated EXISTS form — DuckDB decorrelates it itself,
    making the parity check a genuine two-formulation crosscheck."""
    orders_f = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).withColumn(
        "late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole_late = (
        lines.filter(F.col("late"))
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            F.col("l_orderkey") == F.col("ok"),
        )
    )
    supp = read_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(15)
    )


FUNNEL_WINDOW_US = 86_400_000_000  # 24 h per stage, exact microseconds


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel over the events stream — the MATCH_RECOGNIZE /
    sequential-pattern shape (view → click → purchase, each stage
    within 24 h of the previous one, earliest-event semantics per
    user). Returns one row per stage: (stage, n_users,
    avg_us_from_first_view).

    Plan: three per-user MIN aggregates chained by equi-joins on
    user_id — every shuffle is on the same key and carries one row per
    user, not per event; the event scans push their type filter into
    parquet. No window over the raw event stream is needed because
    each stage only wants the MIN qualifying timestamp.

    Determinism: all arithmetic is exact int64 microseconds
    (unix_micros ↔ epoch_us); the avg is an integer floor-division.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = FUNNEL_WINDOW_US
    # views and clicks each feed TWO consumers (the next stage's join
    # and the stages union), so the lazy plan re-ran every upstream
    # event scan per consumer — 6 scans of events for a 3-stage funnel
    # (r18 audit; guide §2.4). Checkpoint the per-user stage frames
    # (one row per user, two columns): each event type is now scanned
    # exactly once, with its type filter still pushed to parquet.
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("view_us"))
        .localCheckpoint()
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(
            (F.col("us") > F.col("view_us"))
            & (F.col("us") <= F.col("view_us") + w)
        )
        .groupBy("user_id", "view_us")
        .agg(F.min("us").alias("click_us"))
        .localCheckpoint()
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(
            (F.col("us") > F.col("click_us"))
            & (F.col("us") <= F.col("click_us") + w)
        )
        .groupBy("user_id", "view_us")
        .agg(F.min("us").alias("purch_us"))
    )
    stages = (
        views.select(
            F.lit("1_view").alias("stage"), F.lit(0).cast("long").alias("delta_us")
        )
        .unionAll(
            clicks.select(
                F.lit("2_click").alias("stage"),
                (F.col("click_us") - F.col("view_us")).alias("delta_us"),
            )
        )
        .unionAll(
            purchases.select(
                F.lit("3_purchase").alias("stage"),
                (F.col("purch_us") - F.col("view_us")).alias("delta_us"),
            )
        )
    )
    return (
        stages.groupBy("stage")
        .agg(
            F.count("*").alias("n_users"),
            F.expr("sum(delta_us) div count(*)").alias("avg_us_from_first_view"),
        )
        .orderBy("stage")
    )


ANOM_WINDOW = 20   # trailing events per user feeding the baseline
ANOM_MIN_N = 10    # minimum history before a point can be flagged
ANOM_Z = 3         # |z| threshold


def events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection over the events stream: a
    point is anomalous when it sits more than {ANOM_Z} sample standard
    deviations from the mean of the user's previous {ANOM_WINDOW}
    events. Returns the flagged (event_id, user_id, value, n_window)
    rows.

    The z-test runs entirely in exact int64 arithmetic — value
    quantizes to fixed-point units q, the trailing frame keeps
    S = Σq, SS = Σq², n, and |v−mean| > z·std becomes the
    cross-multiplied  (q·n − S)²·(n−1) > z²·n·(n·SS − S²)  — no
    float mean/variance, so the flag set is bit-deterministic under
    any partitioning and any engine. Magnitudes: q ≤ 10⁴ units,
    n ≤ {ANOM_WINDOW} → every term < 2⁴⁴, far inside int64.

    Scale: one shuffle on user_id; the frame is O(window) per row and
    incremental in Spark's window exec. The streaming rendition is the
    sessionizer shape — per-user ring-buffer state."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.unix_micros("ts").alias("us"),
        fxq("value", 2).alias("q"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    stats = ev.select(
        "event_id",
        "user_id",
        "value",
        "q",
        F.count("q").over(w).alias("n"),
        F.sum("q").over(w).alias("s"),
        F.sum(F.col("q") * F.col("q")).over(w).alias("ss"),
    )
    lhs = (F.col("q") * F.col("n") - F.col("s"))
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        stats.filter(F.col("n") >= ANOM_MIN_N)
        .filter(
            lhs * lhs * (F.col("n") - 1)
            > F.lit(ANOM_Z * ANOM_Z) * F.col("n") * var_num
        )
        .select(
            "event_id", "user_id", "value", F.col("n").alias("n_window")
        )
        .orderBy("event_id")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the second classic product-analytics shape
    beside the funnel: users cohort by first-activity week, and each
    (cohort_week, weeks_since) cell counts users active that many
    weeks later. Returns (cohort_week, weeks_since, n_active,
    cohort_size).

    Plan: per-user MIN aggregate (shuffle on user_id), broadcast the
    per-user cohort back onto the events (map-side), then one
    two-key aggregation of pre-deduplicated (user, week) pairs —
    the distinct runs inside the same user_id-keyed shuffle. Weeks
    are integer microsecond floor-divisions from a fixed epoch, so
    bucketing is exact in both engines.

    Scale: the per-user cohort frame is |users| rows; when users
    outgrow broadcast range, the join key is user_id on both sides —
    co-partitioned with the distinct that follows."""
    week_us = 7 * 24 * 3600 * 1_000_000
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / F.lit(1)).cast("long").alias("us")
    ).select("user_id", F.expr(f"us div {week_us}").alias("week"))
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    pairs = (
        ev.join(F.broadcast(first), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .distinct()
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        pairs.groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select("cohort_week", "weeks_since", "n_active", "cohort_size")
        .orderBy("cohort_week", "weeks_since")
    )


EVENT_CHARS = {
    "view": "V", "click": "C", "purchase": "P", "signup": "S",
    "error": "E",
}
PATTERN = "VC*P"  # view, any clicks, purchase — contiguous in type order


def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-shaped sequential pattern search WITHOUT a
    row-pattern engine: encode each user's event-type history as a
    character string (one char per event, (ts, event_id)-ordered) and
    count non-overlapping regex matches — 'view, then clicks only,
    then purchase'. The encode step is ONE groupBy(user) with an
    in-group array_sort (no window over the raw stream); the regex
    runs per user on a bounded string.

    Scale: state per user is its event-type string — fine for
    session-bounded histories; an unbounded history would first window
    the string by time (the same chunking dedup_spans uses). Both
    engines scan left-to-right greedy non-overlapping, so the count —
    not just the boolean — is comparable.

    Reference parity: the reference has no sequence operator at all
    (SURVEY §2.6); this is the [beyond-reference] generalization of
    funnel_events to arbitrary patterns."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_type"),
    )
    ch = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in EVENT_CHARS.items() for x in kv]
        ),
        F.col("event_type"),
    )
    seqs = (
        ev.select("user_id", F.struct("us", "event_id", ch.alias("ch")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["ch"]
                ),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").alias("n_events"),
        F.regexp_count("seq", F.lit(PATTERN)).alias("n_matches"),
    ).orderBy("user_id")


def event_pattern_match_sql() -> str:
    case = " ".join(
        f"WHEN event_type = '{k}' THEN '{v}'"
        for k, v in EVENT_CHARS.items()
    )
    return f"""
        WITH seqs AS (
          SELECT user_id,
                 -- coalesce: a user whose events ALL map outside
                 -- EVENT_CHARS aggregates to NULL here but to '' in
                 -- Spark (array_join drops nulls) — normalize to ''
                 coalesce(string_agg(CASE {case} END, ''
                            ORDER BY ts, event_id), '') AS seq
          FROM events GROUP BY user_id
        )
        SELECT user_id, length(seq)::BIGINT AS n_events,
               len(regexp_extract_all(seq, '{PATTERN}'))::BIGINT
                 AS n_matches
        FROM seqs ORDER BY user_id
    """


COPURCHASE_MIN_SHARED = 5
# Per-customer distinct-supplier cap (hub guard): the pair self-join
# fans out as k² per customer, so one 10⁵-item hub emits 10¹⁰ pairs
# and kills the stage — drop such customers entirely (a basket shared
# by everyone carries no co-occurrence signal; standard market-basket
# practice). TPC-H's observed max degree is 102 at sf0.1, so 512 never
# fires on the fixture shape; supplier_copurchase_audit reports what a
# real power-law corpus would lose. Same cap-and-audit discipline as
# EMB_LSH_BUCKET_CAP / dedup_embedding_lsh_audit.
COPURCHASE_HUB_CAP = 512


def _copurchase_edges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct (customer, supplier) bipartite edges with each
    customer's degree attached — shared by the pair query and its
    audit.

    Degree comes from a count window OVER THE SAME partitioning the
    distinct already established (r18, guide §2.4): the former
    groupBy+self-join re-derived the whole cs subtree per join side —
    and because the pair query consumes TWO copies of this frame, the
    physical plan paid the orders⋈lineitem scan + distinct FOUR times
    (plans/r18/supplier_copurchase_pairs_before.txt: 4 scans of each
    table, 10 Exchanges, 3 SortMergeJoins — the 'AQE reuses the
    exchange' assumption did not hold). The window buffers one
    customer's rows at a time in a spillable array, so a mega-hub
    cannot OOM the stage."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        # (r19 note: a single hash(c) repartition in place of this
        # distinct's hash(c, s) exchange was tried — it fuses the
        # distinct, the degree window and the downstream groupBy(c)
        # onto one exchange, but it also pushes the USER repartition
        # below the aggregate so the raw join output shuffles without
        # map-side partial deduplication. At corpus scale the partial
        # dedup cuts that exchange ~7×; two exchanges — the second one
        # moving only the deduped edge set — are the cheaper shape.)
        .distinct()
    )
    return cs.withColumn(
        "k", F.count("*").over(Window.partitionBy("c"))
    )


def copurchase_pairs_capped(
    edges: DataFrame, cap: int, min_shared: int
) -> DataFrame:
    """Bipartite projection over (c, s, k) edges with the hub cap
    ENFORCED in the plan: customers with degree > cap are dropped
    before any pair is formed, bounding per-customer fan-out at cap²
    regardless of corpus skew. Factored out so tests can run it on a
    synthetic hub frame with a tiny cap.

    Pair expansion is the `_bucket_pairs` shape (r18, guide §2.3/§2.4):
    group each kept customer's suppliers to a list (≤ cap elements — the
    filter runs BEFORE the collect) and expand pairs JVM-side with two
    nested explodes. The groupBy rides the partitioning the degree
    window already established, so the whole expansion adds ZERO
    exchanges; the former self-join shuffled both copies of the kept
    frame and recomputed its lineage per side (4 scans → 1). The
    explode×explode cross product is row-for-row the self-join's
    output, so counts are unchanged on any input, duplicates included."""
    kept = edges.filter(F.col("k") <= F.lit(cap))
    grouped = kept.groupBy("c").agg(F.collect_list("s").alias("ss"))
    # r19 (VERDICT r18 item 3): the list frame is a few MB, so AQE
    # coalesced its exchange to 1-5 partitions and the explode×explode
    # fan-out + the pair partial-aggregate ran nearly serial (8c/32c
    # scaling 0.66). Two respreads fix it without the agg-state
    # duplication that sank the r18 "naive respread" (widening the
    # fan-out alone gives EVERY task a pair-space hash map — ~500k
    # entries × 32 tasks blew past local execution memory and spilled):
    # 1. round-robin the capped lists to defaultParallelism (explicit
    #    repartition is exempt from AQE coalescing; width scales with
    #    the cluster) so the quadratic expansion is compute-parallel;
    # 2. hash-partition the expanded pairs on the pair key BEFORE the
    #    aggregate, so the per-task agg state is |distinct pairs| /
    #    parallelism instead of up to |distinct pairs| per task — the
    #    groupBy rides this exchange (same keys → no further shuffle).
    para = edges.sparkSession.sparkContext.defaultParallelism
    return (
        grouped.repartition(para)
        .select(F.explode("ss").alias("sa"), "ss")
        .select("sa", F.explode("ss").alias("sb"))
        .filter(F.col("sa") < F.col("sb"))
        .repartition("sa", "sb")
        .groupBy("sa", "sb")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy(F.desc("n_shared"), "sa", "sb")
    )


def supplier_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence (the recommender / market-basket
    primitive): supplier pairs ranked by how many distinct customers
    buy from both. One distinct bipartite edge list, one per-customer
    list, one JVM-side pair expansion, one count — the bipartite
    projection in ONE pass over the fact tables (r18; the former
    self-join rendition recomputed the edge subtree four times — see
    _copurchase_edges / copurchase_pairs_capped).

    Scale: the pair expansion fans out quadratically in the per-customer
    supplier count; COPURCHASE_HUB_CAP drops hub customers before any
    list is collected (enforced in-plan, not just documented), and
    supplier_copurchase_audit reports exactly what the cap discarded.
    The count shuffle is on the (a, b) pair key — well spread."""
    return copurchase_pairs_capped(
        _copurchase_edges(spark, sf_dir),
        COPURCHASE_HUB_CAP,
        COPURCHASE_MIN_SHARED,
    )


def supplier_copurchase_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honesty metric for the co-purchase hub cap: how many customers
    the cap dropped and how many pairs that discarded (k·(k−1)/2 per
    hub). On TPC-H shapes every column is zero-droppage; on a power-law
    corpus the dropped_pairs column is the difference between 'no
    co-occurrence there' and 'the cap ate it'. One row; one agg over
    the per-customer degree table — no self-join."""
    deg = (
        _copurchase_edges(spark, sf_dir)
        .select("c", "k")
        .distinct()
    )
    over = F.col("k") > COPURCHASE_HUB_CAP
    return deg.agg(
        F.count("*").alias("n_customers"),
        F.max("k").alias("max_degree"),
        F.sum(F.when(over, 1).otherwise(0)).alias("n_capped_customers"),
        # `div`: integer division keeps the arithmetic in int64 on
        # both engines (k·(k−1) is even, but / would go via double)
        F.sum(
            F.when(over, F.expr("k * (k - 1) div 2")).otherwise(0)
        )
        .cast("long")
        .alias("dropped_pairs"),
    )


_COPURCHASE_CS_SQL = """
          SELECT DISTINCT o_custkey AS c, l_suppkey AS s
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
"""


def supplier_copurchase_sql() -> str:
    return f"""
        WITH cs AS (
          {_COPURCHASE_CS_SQL}
        ), deg AS (
          SELECT c, count(*) AS k FROM cs GROUP BY c
        ), kept AS (
          SELECT cs.c, cs.s FROM cs JOIN deg USING (c)
          WHERE k <= {COPURCHASE_HUB_CAP}
        )
        SELECT a.s AS sa, b.s AS sb, count(*)::BIGINT AS n_shared
        FROM kept a JOIN kept b USING (c)
        WHERE a.s < b.s
        GROUP BY a.s, b.s
        HAVING count(*) >= {COPURCHASE_MIN_SHARED}
        ORDER BY n_shared DESC, sa, sb
    """


def supplier_copurchase_audit_sql() -> str:
    return f"""
        WITH cs AS (
          {_COPURCHASE_CS_SQL}
        ), deg AS (
          SELECT c, count(*) AS k FROM cs GROUP BY c
        )
        SELECT count(*)::BIGINT AS n_customers,
               max(k)::BIGINT AS max_degree,
               sum(CASE WHEN k > {COPURCHASE_HUB_CAP} THEN 1
                   ELSE 0 END)::BIGINT AS n_capped_customers,
               sum(CASE WHEN k > {COPURCHASE_HUB_CAP}
                   THEN k * (k - 1) // 2 ELSE 0 END)::BIGINT
                 AS dropped_pairs
        FROM deg
    """


def customer_spend_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist (the two relative-rank windows no other
    contract query exercises), partitioned by nation so no global
    single-partition window exists. Spend totals are exact int64
    fixed-point units (fxq sum), so the ORDER BY — and therefore every
    rank, and the rational (rank-1)/(n-1) both engines derive from the
    same integers — is cross-engine total and hash-stable."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(fxq("o_totalprice")).alias("spend_units")
    )
    w = Window.partitionBy("c_nationkey").orderBy("spend_units", "o_custkey")
    return (
        spend.join(cust, spend.o_custkey == cust.c_custkey)
        .select(
            "c_nationkey",
            "o_custkey",
            "spend_units",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .orderBy("c_nationkey", "o_custkey")
    )


def customer_spend_rank_sql() -> str:
    from gis_etl_spark.ops.fixedpoint import fxq_sql

    return f"""
        WITH spend AS (
          SELECT o_custkey,
                 CAST(sum({fxq_sql("o_totalprice")}) AS BIGINT)
                   AS spend_units
          FROM orders GROUP BY o_custkey
        )
        SELECT c_nationkey, o_custkey, spend_units,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd
        FROM spend JOIN customer ON o_custkey = c_custkey
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY spend_units, o_custkey)
        ORDER BY c_nationkey, o_custkey
    """


def bloom_semi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join behind an explicit split-block Bloom pre-prune
    (ops.scale.bloom_semi_join): revenue by priority of orders placed by
    AUTOMOBILE-segment customers. Result is bit-identical to the plain
    semi-join (the verify pass removes Bloom false positives) — what the
    Bloom buys at 100 TB is that the fact side pays the verify shuffle
    only for rows that pass a map-side 8·n_words-byte broadcast probe.
    Generalizes J2's manifest lookup (east_asia.py:382-393) to dims past
    broadcast size."""
    from gis_etl_spark.ops.scale import bloom_semi_join

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    kept = bloom_semi_join(orders, cust, "o_custkey", "c_custkey")
    return (
        kept.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            fxsum("o_totalprice").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


PRICE_BANDS = [
    ("nano", 0.0, 25_000.0),
    ("small", 25_000.0, 75_000.0),
    ("mid", 75_000.0, 150_000.0),
    ("large", 150_000.0, 300_000.0),
    ("jumbo", 300_000.0, 1_000_000_000.0),
]


def price_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-dim lookup via ops.joins.range_lookup_join: band every
    order's total price into a 5-row [lo, hi) tier dim and aggregate.
    The plan is a map-side HOF band-index compute + BroadcastHashJoin on
    the index — Spark's own non-equi broadcast join would plan the
    banned BroadcastNestedLoopJoin here."""
    from gis_etl_spark.ops.joins import range_lookup_join

    orders = read_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        PRICE_BANDS, schema=["band_label", "band_lo", "band_hi"]
    )
    joined = range_lookup_join(
        orders, "o_totalprice", bands, "band_lo", "band_hi"
    )
    return (
        joined.groupBy("band_label")
        .agg(
            F.count("*").alias("n_orders"),
            fxsum("o_totalprice").alias("revenue"),
        )
        .orderBy("band_label")
    )
