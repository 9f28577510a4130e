"""Temporal & spatial join operators: as-of join, point-in-interval
range join, radius near-pair self-join.

The reference runs zero SQL joins (SURVEY.md §2.4) — these are the
custom join shapes a training-data / telemetry pipeline layered on the
same engine needs, each expressed WITHOUT inequality join conditions,
which Spark can only execute as broadcast-nested-loop or cartesian —
the non-starter at 100 TB:

- as-of join          → union + sorted window (`last(..., ignorenulls)`
                        over the interleaved timeline). ONE hash
                        shuffle on the key, state is a single running
                        value per partition — the same plan shape
                        Flink/kdb use for temporal joins.
- interval range join → bucketize time, explode each interval into the
                        buckets it overlaps, hash equi-join on
                        (key, bucket), residual range filter. Each
                        point lives in exactly one bucket, so no
                        post-join dedup is needed.
- spatial near-pairs  → the same trick in 2-D: grid cells of width r,
                        one side exploded to its 3×3 cell
                        neighborhood, equi-join on the cell id,
                        residual euclidean filter, `id < id` to halve.
- point-in-polygon    → polygon bboxes explode to their grid cells,
                        points hash to one cell; native bbox filter,
                        then the exact even-odd kernel on candidates
                        only (the PostGIS `&&` + ST_Contains shape).

The first three verify against DuckDB (ASOF JOIN is native there, and
its IEJoin handles the inequality formulations the Spark plans avoid);
point-in-polygon has no DuckDB 1.0 twin → rows-only + brute-force
equivalence tests.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_etl_spark.io import read_table
from gis_etl_spark.ops.fixedpoint import fxsum, fxsum_sql

# --- generic operators ------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    `right_ts` <= `left_ts` ("backward"; "forward" = smallest >=) for
    the same key. Matched value columns come back as `asof_<col>`,
    plus `asof_ts` (the matched timestamp, epoch micros).

    Rows from both sides interleave into one timeline per key; a
    running `last(..., ignorenulls=True)` carries the latest reference
    values forward (backward direction: ascending scan; forward:
    descending). Reference rows sort BEFORE left rows at equal
    timestamps, so ties match, as in DuckDB/pandas ASOF semantics.
    Right side should be unique per (key, ts) — pre-aggregate if not,
    or the carried value at a tied timestamp is order-dependent.

    Scale: one shuffle on `on`; per-key state is one row regardless of
    history length. No range explosion, no nested-loop join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    value_cols = value_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]

    l2 = left.select(
        *on,
        F.unix_micros(F.col(left_ts)).alias("_ts_us"),
        F.lit(0).alias("_is_ref"),
        F.lit(None).cast("long").alias("_ref_ts_us"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_ref_{c}")
          for c in value_cols],
        *[F.col(c).alias(f"_l_{c}")
          for c in left.columns if c not in set(on)],
    )
    r2 = right.select(
        *on,
        F.unix_micros(F.col(right_ts)).alias("_ts_us"),
        F.lit(1).alias("_is_ref"),
        F.unix_micros(F.col(right_ts)).alias("_ref_ts_us"),
        *[F.col(c).alias(f"_ref_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns if c not in set(on)],
    )
    merged = l2.unionByName(r2)

    ts_order = (
        [F.col("_ts_us").asc(), F.col("_is_ref").desc()]
        if direction == "backward"
        else [F.col("_ts_us").desc(), F.col("_is_ref").desc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*ts_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *merged.columns,
        F.last("_ref_ts_us", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_ref_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_is_ref") == 0).select(
        *on,
        F.col("_ts_us").alias(f"{left_ts}_us"),
        *[F.col(f"_l_{c}").alias(c)
          for c in left.columns if c not in set(on)],
        "asof_ts",
        *[f"asof_{c}" for c in value_cols],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts_us: str,
    start_us: str,
    end_us: str,
    bucket_us: int,
) -> DataFrame:
    """Inner join of point rows to every interval row of the same key
    with `start_us < point_ts <= end_us` (half-open, label = end).

    Buckets of `bucket_us` micros: each interval explodes to the
    buckets it overlaps (⌈len/bucket⌉+1 rows — pick bucket_us ≈ the
    typical interval length so that's ≤2), points map to exactly ONE
    bucket, the join is a plain hash equi-join on (key, bucket), and
    the residual range predicate filters within matched buckets. A
    point matches an interval in exactly one bucket pair → no dedup.

    Precondition: start_us <= end_us per row. Inverted intervals are
    dropped (Spark's sequence(hi, lo) would otherwise yield a
    DESCENDING bucket range and resurrect them as phantom matches).
    """
    intervals = intervals.filter(F.col(start_us) <= F.col(end_us))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_us) / F.lit(bucket_us)),
                F.floor(F.col(end_us) / F.lit(bucket_us)),
            )
        ),
    )
    pt = points.withColumn(
        "_b", F.floor(F.col(point_ts_us) / F.lit(bucket_us))
    )
    return (
        pt.join(iv, on=on + ["_b"], how="inner")
        .filter(
            (F.col(point_ts_us) > F.col(start_us))
            & (F.col(point_ts_us) <= F.col(end_us))
        )
        .drop("_b")
    )


def near_pairs(
    pts: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All unordered pairs with euclidean distance <= radius:
    grid cells of width `radius`, side B exploded to its 3×3
    neighborhood, equi-join on the cell, residual distance filter,
    `a.id < b.id`. Each qualifying pair matches on exactly one
    (cell, offset) combination → no dedup. Shuffle key is the cell id;
    skew only where point density is pathological (salt there).
    """
    cx = F.floor(F.col(x_col) / F.lit(radius)).cast("long")
    cy = F.floor(F.col(y_col) / F.lit(radius)).cast("long")
    a = pts.select(
        F.col(id_col).alias("a_id"),
        F.col(x_col).alias("ax"),
        F.col(y_col).alias("ay"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    b = (
        pts.select(
            F.col(id_col).alias("b_id"),
            F.col(x_col).alias("bx"),
            F.col(y_col).alias("by"),
            cx.alias("_bcx"),
            cy.alias("_bcy"),
        )
        .withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "b_id", "bx", "by",
            (F.col("_bcx") + F.col("_dx")).alias("_cx"),
            (F.col("_bcy") + F.col("_dy")).alias("_cy"),
        )
    )
    d2 = (
        (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
        + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))
    )
    return (
        a.join(b, on=["_cx", "_cy"], how="inner")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(d2 <= F.lit(radius * radius))
        .select("a_id", "b_id", "ax", "ay", "bx", "by")
    )


def nearest_neighbor_join(
    pts: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """Radius-bounded 1-NN join: for each point, its nearest OTHER
    point within `radius` — the kNN-join primitive of spatial engines,
    in the bounded form that stays a grid equi-join (points with no
    neighbor in range drop out; unbounded exact kNN needs ring
    expansion, a different plan).

    Candidates come from the same cell/3×3-neighborhood equi-join as
    near_pairs but DIRECTED (a ≠ b, both orientations kept); the
    argmin is min(struct(d2, b_id)) — ONE partially-aggregated groupBy
    on the left id (map-side combine shrinks each partition to ≤ |a|
    rows before the shuffle), ties to the smaller neighbor id.
    Returns (a_id, b_id, d2)."""
    cx = F.floor(F.col(x_col) / F.lit(radius)).cast("long")
    cy = F.floor(F.col(y_col) / F.lit(radius)).cast("long")
    a = pts.select(
        F.col(id_col).alias("a_id"),
        F.col(x_col).alias("ax"),
        F.col(y_col).alias("ay"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    b = (
        pts.select(
            F.col(id_col).alias("b_id"),
            F.col(x_col).alias("bx"),
            F.col(y_col).alias("by"),
            cx.alias("_bcx"),
            cy.alias("_bcy"),
        )
        .withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "b_id", "bx", "by",
            (F.col("_bcx") + F.col("_dx")).alias("_cx"),
            (F.col("_bcy") + F.col("_dy")).alias("_cy"),
        )
    )
    d2 = (
        (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
        + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))
    )
    cand = (
        a.join(b, on=["_cx", "_cy"], how="inner")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(d2 <= F.lit(radius * radius))
        .select(
            "a_id",
            F.struct(d2.alias("d2"), F.col("b_id").alias("b_id")).alias("s"),
        )
    )
    return cand.groupBy("a_id").agg(F.min("s").alias("nn")).select(
        "a_id",
        F.col("nn.b_id").alias("b_id"),
        F.col("nn.d2").alias("d2"),
    )


# --- contract queries -------------------------------------------------------

_WINDOW_US = 24 * 3600 * 1_000_000  # interval_error_activity horizon


def asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the user's most recent view at-or-before
    it (classic as-of enrichment). Views are pre-aggregated to one row
    per (user, ts) so ties are deterministic in both engines."""
    ev = read_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        clicks, views, on=["user_id"], value_cols=["view_value"],
        direction="backward",
    )
    return j.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.col("asof_ts")).alias("gap_us"),
        F.round("asof_view_value", 2).alias("view_value"),
    ).orderBy("event_id")


ASOF_TOL_US = 600_000_000  # as-of tolerance horizon: 10 minutes


def asof_click_view_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """asof_click_view with a TOLERANCE horizon (pandas
    merge_asof(tolerance=...) semantics): a click only keeps its
    most-recent view if that view is within {ASOF_TOL_US} µs — staler
    context is as useless as none, the standard attribution-window
    rule. Out-of-horizon (or never-matched) clicks survive with NULL
    enrichment and matched = false, so downstream sees the full click
    set with an explicit match flag.

    Same single-shuffle union+window plan as the parent (tolerance is
    a post-filter on the carried match — no second join, no state
    growth); the oracle composes DuckDB's ASOF LEFT JOIN with the
    identical CASE."""
    ev = read_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        clicks, views, on=["user_id"], value_cols=["view_value"],
        direction="backward",
    )
    ok = F.col("asof_ts").isNotNull() & (
        (F.col("ts_us") - F.col("asof_ts")) <= ASOF_TOL_US
    )
    return j.select(
        "event_id",
        "user_id",
        F.when(ok, F.col("ts_us") - F.col("asof_ts")).alias("gap_us"),
        F.when(ok, F.round("asof_view_value", 2)).alias("view_value"),
        ok.alias("matched"),
    ).orderBy("event_id")


def interval_error_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: how much same-user activity follows within 24
    hours (incident blast-radius shape). Bucketed range join; errors
    with zero followers survive via the final left join."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + F.lit(_WINDOW_US)).alias("end_us"),
    )
    pts = ev.select("user_id", "ts_us", "value")
    matched = interval_join(
        pts, errors, on=["user_id"], point_ts_us="ts_us",
        start_us="start_us", end_us="end_us", bucket_us=_WINDOW_US,
    )
    per_err = matched.groupBy("err_id").agg(
        F.count("*").alias("n_follow"),
        fxsum("value").alias("follow_value"),
    )
    return (
        errors.join(per_err, on="err_id", how="left")
        .select(
            F.col("err_id").alias("event_id"),
            "user_id",
            F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
            F.coalesce("follow_value", F.lit(0.0)).alias("follow_value"),
        )
        .orderBy("event_id")
    )


NEAR_RADIUS_DEG = 0.03  # ~3 km at the fixture's latitudes


def spatial_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Building pairs with centroids within NEAR_RADIUS_DEG (euclidean
    in degrees — the fixture's raw frame; a production pipeline runs
    this after convert() in a projected CRS). UTM-meter and flipped
    sources are excluded by the geographic-range guard, matching the
    oracle's filter on the golden centroid table."""
    from gis_etl_spark.geom.functions import decode_centroid_points
    from gis_etl_spark.ops.geometry_queries import _read

    # checkpoint the decoded (id, cx, cy) frame: both join sides read
    # ONE mapInPandas WKB decode instead of one per side (r18, guide
    # §2.4 — the narrow-frame/expensive-subtree case where the
    # materialization wins; the staged-UDF formulation before that
    # re-decoded every geometry 4× per side)
    pts = decode_centroid_points(
        _read(spark).filter(F.col("geom").isNotNull())
    ).localCheckpoint()
    pairs = near_pairs(pts, "building_id", "cx", "cy", NEAR_RADIUS_DEG)
    d2 = (
        (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
        + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))
    )
    return pairs.select(
        "a_id",
        "b_id",
        F.round(F.sqrt(d2), 8).alias("dist_deg"),
    ).orderBy("a_id", "b_id")


def nearest_neighbor_join_unbounded(
    pts: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    r0: float,
    max_doublings: int = 24,
) -> DataFrame:
    """EXACT unbounded 1-NN via ring doubling — the plan the bounded
    join's docstring promises: every point gets its true nearest other
    point, no radius contract.

    Correctness: the bounded join only returns neighbors with
    d <= radius, and the 3x3 grid neighborhood at cell width = radius
    provably contains every such point — so any returned neighbor IS
    the global nearest (all unsearched points sit beyond radius >= d).
    Points with no neighbor in range stay unresolved and retry at
    double the radius; rounds = O(log(spread / r0)), each running the
    grid join ONLY over the still-unresolved residue (which shrinks
    geometrically for any non-adversarial density). The driver loop is
    the dedup_components discipline: localCheckpoint the residue per
    round so lineage stays flat, exit on an exact count.

    NB the candidate pool is always the FULL point set (a neighbor of
    an unresolved point is usually itself resolved), only the left
    side shrinks."""
    left = pts.select(
        F.col(id_col).alias(id_col),
        F.col(x_col).alias(x_col),
        F.col(y_col).alias(y_col),
    ).localCheckpoint()

    def _empty_out() -> DataFrame:
        from pyspark.sql import types as T

        idt = pts.schema[id_col].dataType
        return pts.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("a_id", idt),
                    T.StructField("b_id", idt),
                    T.StructField("d2", T.DoubleType()),
                ]
            ),
        )

    # <2 points: no pair can exist — empty result, not an unresolved-
    # residue error (the ring doubling would otherwise spin to
    # max_doublings and raise).
    if left.limit(2).count() < 2:
        return _empty_out()
    parts: list[DataFrame] = []
    r = float(r0)
    for _ in range(max_doublings):
        if left.isEmpty():
            break
        cand = pts.select(
            F.col(id_col).alias("_cid"),
            F.col(x_col).alias("_cx0"),
            F.col(y_col).alias("_cy0"),
        )
        # directed bounded 1-NN: left side = unresolved, right = all
        cx = F.floor(F.col(x_col) / F.lit(r)).cast("long")
        cy = F.floor(F.col(y_col) / F.lit(r)).cast("long")
        a = left.select(
            F.col(id_col).alias("a_id"),
            F.col(x_col).alias("ax"),
            F.col(y_col).alias("ay"),
            cx.alias("_gx"),
            cy.alias("_gy"),
        )
        b = (
            cand.select(
                F.col("_cid").alias("b_id"),
                F.col("_cx0").alias("bx"),
                F.col("_cy0").alias("by"),
                F.floor(F.col("_cx0") / F.lit(r)).cast("long").alias("_bgx"),
                F.floor(F.col("_cy0") / F.lit(r)).cast("long").alias("_bgy"),
            )
            .withColumn(
                "_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
            )
            .withColumn(
                "_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
            )
            .select(
                "b_id", "bx", "by",
                (F.col("_bgx") + F.col("_dx")).alias("_gx"),
                (F.col("_bgy") + F.col("_dy")).alias("_gy"),
            )
        )
        d2 = (
            (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
            + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))
        )
        found = (
            a.join(b, on=["_gx", "_gy"])
            .filter(F.col("a_id") != F.col("b_id"))
            .filter(d2 <= F.lit(r * r))
            .select(
                "a_id",
                F.struct(d2.alias("d2"), F.col("b_id").alias("b_id")).alias(
                    "s"
                ),
            )
            .groupBy("a_id")
            .agg(F.min("s").alias("nn"))
            .select(
                "a_id",
                F.col("nn.b_id").alias("b_id"),
                F.col("nn.d2").alias("d2"),
            )
            .localCheckpoint()
        )
        parts.append(found)
        left = left.join(
            found.select(F.col("a_id").alias(id_col)), id_col, "left_anti"
        ).localCheckpoint()
        r *= 2.0
    else:
        # loop exhausted max_doublings without draining the residue:
        # silently dropping those points would break the "every point
        # gets its true nearest" contract — fail loudly instead.
        n_left = left.count()
        if n_left:
            raise ValueError(
                f"nearest_neighbor_join_unbounded: {n_left} points still "
                f"unresolved after {max_doublings} doublings (final "
                f"radius {r!r}); raise max_doublings or r0"
            )
    if not parts:
        return _empty_out()  # max_doublings == 0 with an empty input
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def spatial_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every building's nearest other building within NEAR_RADIUS_DEG
    (centroid euclidean, same frame/guards as spatial_near_pairs) —
    the radius-bounded 1-NN join. Ties break to the smaller neighbor
    id in both engines (min(struct) vs ORDER BY d2, b_id)."""
    from gis_etl_spark.geom.functions import decode_centroid_points
    from gis_etl_spark.ops.geometry_queries import _read

    # one WKB decode for both join sides (see spatial_near_pairs)
    pts = decode_centroid_points(
        _read(spark).filter(F.col("geom").isNotNull())
    ).localCheckpoint()
    nn = nearest_neighbor_join(
        pts, "building_id", "cx", "cy", NEAR_RADIUS_DEG
    )
    return nn.select(
        "a_id",
        F.col("b_id").alias("nn_id"),
        F.round(F.sqrt(F.col("d2")), 8).alias("nn_dist"),
    ).orderBy("a_id")


def oracle_sqls() -> dict[str, str]:
    from gis_etl_spark.ops.geometry_queries import fixture_paths

    bpath, epath = fixture_paths()
    b = f"read_parquet('{bpath}')"
    e = f"read_parquet('{epath}')"
    r = repr(NEAR_RADIUS_DEG)
    return {
        "asof_click_view": """
            WITH views AS (
              SELECT user_id, ts, max(value) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY 1, 2
            ),
            clicks AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'
            )
            SELECT c.event_id, c.user_id,
                   epoch_us(c.ts) - epoch_us(v.ts) AS gap_us,
                   round(v.view_value, 2) AS view_value
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.ts
            ORDER BY c.event_id
        """,
        "asof_click_view_tolerance": f"""
            WITH views AS (
              SELECT user_id, ts, max(value) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY 1, 2
            ),
            clicks AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'
            ),
            j AS (
              SELECT c.event_id, c.user_id,
                     epoch_us(c.ts) - epoch_us(v.ts) AS gap0,
                     v.view_value,
                     v.ts IS NOT NULL
                       AND epoch_us(c.ts) - epoch_us(v.ts)
                           <= {ASOF_TOL_US} AS matched
              FROM clicks c ASOF LEFT JOIN views v
                ON c.user_id = v.user_id AND c.ts >= v.ts
            )
            SELECT event_id, user_id,
                   CASE WHEN matched THEN gap0 END AS gap_us,
                   CASE WHEN matched THEN round(view_value, 2) END
                     AS view_value,
                   matched
            FROM j ORDER BY event_id
        """,
        "interval_error_activity": f"""
            SELECT e.event_id, e.user_id,
                   count(p.event_id) AS n_follow,
                   coalesce({fxsum_sql("p.value")}, 0.0) AS follow_value
            FROM (SELECT * FROM events WHERE event_type = 'error') e
            LEFT JOIN events p
              ON p.user_id = e.user_id
             AND p.ts > e.ts
             AND epoch_us(p.ts) <= epoch_us(e.ts) + {_WINDOW_US}
            GROUP BY 1, 2 ORDER BY 1
        """,
        "spatial_near_pairs": f"""
            WITH pts AS (
              SELECT e.building_id, e.cx, e.cy
              FROM {b} bb JOIN {e} e USING (building_id)
              WHERE bb.geom IS NOT NULL
                AND abs(e.cx) <= 180.0 AND abs(e.cy) <= 90.0
            )
            SELECT a.building_id AS a_id, b.building_id AS b_id,
                   round(sqrt((b.cx - a.cx) * (b.cx - a.cx)
                            + (b.cy - a.cy) * (b.cy - a.cy)), 8) AS dist_deg
            FROM pts a JOIN pts b
              ON a.building_id < b.building_id
             AND b.cx BETWEEN a.cx - {r} AND a.cx + {r}
             AND b.cy BETWEEN a.cy - {r} AND a.cy + {r}
             AND (b.cx - a.cx) * (b.cx - a.cx)
               + (b.cy - a.cy) * (b.cy - a.cy) <= {r} * {r}
            ORDER BY a_id, b_id
        """,
        "spatial_nearest_neighbor": f"""
            WITH pts AS (
              SELECT e.building_id, e.cx, e.cy
              FROM {b} bb JOIN {e} e USING (building_id)
              WHERE bb.geom IS NOT NULL
                AND abs(e.cx) <= 180.0 AND abs(e.cy) <= 90.0
            ), cand AS (
              SELECT a.building_id AS a_id, b.building_id AS b_id,
                     (b.cx - a.cx) * (b.cx - a.cx)
                   + (b.cy - a.cy) * (b.cy - a.cy) AS d2
              FROM pts a JOIN pts b
                ON a.building_id <> b.building_id
               AND b.cx BETWEEN a.cx - {r} AND a.cx + {r}
               AND b.cy BETWEEN a.cy - {r} AND a.cy + {r}
               AND (b.cx - a.cx) * (b.cx - a.cx)
                 + (b.cy - a.cy) * (b.cy - a.cy) <= {r} * {r}
            ), ranked AS (
              SELECT a_id, b_id, d2,
                     row_number() OVER (PARTITION BY a_id
                                        ORDER BY d2, b_id) AS rk
              FROM cand
            )
            SELECT a_id, b_id AS nn_id, round(sqrt(d2), 8) AS nn_dist
            FROM ranked WHERE rk = 1 ORDER BY a_id
        """,
    }


# --- point-in-polygon join --------------------------------------------------

PIP_CELL_DEG = 0.05
PIP_MAX_CELLS_PER_AXIS = 10  # skew guard: drop degenerate giant bboxes


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    cell_deg: float = PIP_CELL_DEG,
) -> DataFrame:
    """Point-in-polygon join, the PostGIS `bbox && + ST_Contains`
    pattern as Spark ops: polygons explode to the grid cells their
    bbox overlaps, points hash to exactly ONE cell, the equi-join on
    the cell id yields candidates, then a native bbox filter and the
    exact even-odd kernel (st_contains_point) run on candidates only.

    points:  (point_id, cx, cy)   — e.g. decode_centroid_points
    polys:   (poly_id, geom, xmin, ymin, xmax, ymax)
    Returns (point_id, poly_id) containment pairs (each exactly once —
    a point lives in one cell, a polygon covers each cell once).

    Scale: candidate volume is density-bound (cell ≈ polygon size →
    ~1-4 cells per polygon); polygons spanning > PIP_MAX_CELLS_PER_AXIS
    cells per axis are dropped as degenerate (logged semantics: the
    fixture's UTM-meter rows; a production run would route them to a
    broadcast side)."""
    from gis_etl_spark.geom.functions import st_contains_point

    c = F.lit(cell_deg)
    span_ok = (
        (F.floor(F.col("xmax") / c) - F.floor(F.col("xmin") / c)
         < PIP_MAX_CELLS_PER_AXIS)
        & (F.floor(F.col("ymax") / c) - F.floor(F.col("ymin") / c)
           < PIP_MAX_CELLS_PER_AXIS)
    )
    pcells = (
        polys.filter(span_ok)
        .withColumn(
            "_cx",
            F.explode(
                F.sequence(F.floor(F.col("xmin") / c), F.floor(F.col("xmax") / c))
            ),
        )
        .withColumn(
            "_cy",
            F.explode(
                F.sequence(F.floor(F.col("ymin") / c), F.floor(F.col("ymax") / c))
            ),
        )
    )
    pts = points.withColumn("_cx", F.floor(F.col("cx") / c)).withColumn(
        "_cy", F.floor(F.col("cy") / c)
    )
    cand = (
        pts.join(pcells, ["_cx", "_cy"])
        .filter(
            (F.col("cx") >= F.col("xmin"))
            & (F.col("cx") <= F.col("xmax"))
            & (F.col("cy") >= F.col("ymin"))
            & (F.col("cy") <= F.col("ymax"))
        )
    )
    return cand.filter(
        st_contains_point(F.col("geom"), F.col("cx"), F.col("cy"))
    ).select("point_id", "poly_id")


def points_in_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment audit over the buildings fixture: every building
    centroid tested against every OTHER overlapping footprint — the
    spatial-join staple (which parcels contain which addresses).
    Rows-only: DuckDB 1.0.0 has no spatial predicate; the kernel and
    the join shape are independently tested (tests/test_joins.py brute
    force)."""
    from gis_etl_spark.geom.functions import decode_centroid_points
    from gis_etl_spark.ops.geometry_queries import _read

    src = _read(spark).filter(F.col("geom").isNotNull())
    pts = decode_centroid_points(src).withColumnRenamed(
        "building_id", "point_id"
    )
    polys = _decode_poly_bboxes(src)
    pairs = pip_join(pts, polys).filter(F.col("point_id") != F.col("poly_id"))
    per_poly = pairs.groupBy("poly_id").agg(F.count("*").alias("n_contained"))
    return (
        src.select(F.col("building_id").alias("poly_id"), "source")
        .join(per_poly, "poly_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_polys_with_hits"),
            F.sum("n_contained").cast("bigint").alias("n_pairs"),
        )
        .orderBy("source")
    )


def _decode_poly_bboxes(df: DataFrame) -> DataFrame:
    """(building_id, geom, xmin..ymax) in ONE mapInPandas pass, invalid
    and non-geographic rows dropped inside the kernel (same rationale
    as decode_centroid_points)."""
    import numpy as np
    import pandas as pd

    from gis_etl_spark.geom import wkb as K
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("poly_id", LongType()),
            StructField("geom", BinaryType()),
            StructField("xmin", DoubleType()),
            StructField("ymin", DoubleType()),
            StructField("xmax", DoubleType()),
            StructField("ymax", DoubleType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            bb = K.bbox_batch(list(pdf["geom"]))
            keep = ~np.isnan(bb[:, 0])
            keep &= (
                (bb[:, 0] >= -180.0)
                & (bb[:, 2] <= 180.0)
                & (bb[:, 1] >= -90.0)
                & (bb[:, 3] <= 90.0)
            )
            yield pd.DataFrame(
                {
                    "poly_id": pdf["building_id"].to_numpy()[keep],
                    "geom": pdf["geom"][keep],
                    "xmin": bb[keep, 0],
                    "ymin": bb[keep, 1],
                    "xmax": bb[keep, 2],
                    "ymax": bb[keep, 3],
                }
            )

    return df.select("building_id", "geom").mapInPandas(decode, schema)


# Band count above which the binary-search CASE tree yields to the
# grid-bucketed probe: at ~300 bands the tree's generated Java method
# crosses the JVM 64 KB codegen limit and Spark silently drops to
# interpreted per-row tree walks (measured r11: 128 bands compiles,
# 500 doesn't); the grid plan's expression size is band-count-free.
CASE_TREE_MAX_BANDS = 128


def range_lookup_join(
    fact: DataFrame,
    value_col: str,
    bands: DataFrame,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    max_bands: int = 10_000,
) -> DataFrame:
    """Broadcast interval-dim lookup (value ∈ [lo, hi) → band attributes)
    without a nested-loop join — the IP-to-geo / price-band / SLA-tier
    dimension shape.

    Spark plans a non-equi broadcast join as BroadcastNestedLoopJoin:
    every fact row compares against every band, and the plan-hygiene
    sweep in this repo rightly bans it. Instead:

      1. Collect the band dim to the driver (it is the BROADCAST side by
         contract — ≤ max_bands rows enforced) and validate the
         intervals are sorted and non-overlapping.
      2. Compute each fact row's band index MAP-SIDE, by one of two
         plans chosen on band count (both zero-shuffle, zero-Python):

         - n <= CASE_TREE_MAX_BANDS: a BINARY SEARCH built as ONE
           nested-CASE expression tree: internal nodes test
           `value >= lo[mid]`, leaves test `value < hi[leaf]`
           (intervals may have gaps). Every boundary literal appears
           EXACTLY ONCE — a single Project of O(n) expression nodes
           evaluating O(log n) native comparisons per row. (History:
           r8 used an `aggregate` HOF — O(n) *interpreted* lambda
           steps per row; r9 used ⌈log2 n⌉ chained self-referencing
           CASE columns — correct at 10 bands but Catalyst's
           project-collapse inlined the chain combinatorially and the
           driver OOM'd at 2,000 bands. The tree form has no
           self-reference, so there is nothing to inline.)
         - above that: a GRID-BUCKETED candidate lookup. The CASE
           tree's generated Java outgrows the JVM's 64 KB method
           limit at roughly 300 bands (codegen falls back to
           interpreted tree-walks per row) and at 2,000 bands the
           per-task codegen of the ~4k-node tree OOM'd a 2M-row probe
           outright (measured r11 — the perf cliff ADVICE r10
           predicted, plus a heap one). Instead: the driver overlays
           a uniform grid of 2n cells on [min lo, max hi), maps each
           cell to the (tiny, avg ≲2) array of bands overlapping it,
           broadcast-EQUI-joins fact rows on `floor((v-base)/step)`,
           and resolves the band with an exact `filter(cands,
           lo <= v < hi)` over the array — O(1) expression size at
           ANY band count, whole-stage-codegen-clean, fan-out-free
           (the candidates ride along as one array column). Cell
           membership is conservative (floor on both band endpoints,
           monotone in v) so the exact filter, not grid float math,
           decides the band. Degenerate width skew (many micro-bands
           inside one cell width) only grows that cell's array — the
           probe stays correct and degrades linearly, never quadratic.
      3. Broadcast-EQUI-join the band attributes on the index.

    At 100 TB the fact side never shuffles and never fans out, and the
    only join is a BroadcastHashJoin on a dense int key. `how='left'`
    keeps out-of-band fact rows with NULL band attributes.

    Numeric contract: bounds and value are compared as IEEE doubles
    (exact for integral types < 2^53). DecimalType bands or values are
    rejected — a decimal sitting exactly on a lo/hi boundary can land
    on the wrong side after a double cast, silently disagreeing with
    the non-equi join this operator replaces (ADVICE r8).

    Generalizes the reference's broadcast manifest lookup (J2,
    east_asia.py:382-393) from point keys to intervals.
    """
    from pyspark.sql.types import DecimalType

    for df_, col_, side in (
        (fact, value_col, "fact value"),
        (bands, lo_col, "band lo"),
        (bands, hi_col, "band hi"),
    ):
        if isinstance(df_.schema[col_].dataType, DecimalType):
            raise ValueError(
                f"range_lookup_join: {side} column {col_!r} is decimal-"
                "typed; the probe compares as double, which can mis-band "
                "exact boundary values — cast to double explicitly if "
                "that is acceptable"
            )
    reserved = {"_band_idx", "_cell", "_cands"}
    clash = (set(fact.columns) | set(bands.columns)) & reserved
    if clash:
        raise ValueError(
            f"range_lookup_join: input already has reserved internal "
            f"column(s) {sorted(clash)}; rename them before calling"
        )

    rows = bands.orderBy(lo_col).collect()
    if len(rows) > max_bands:
        raise ValueError(
            f"range_lookup_join: {len(rows)} bands exceeds max_bands="
            f"{max_bands}; an interval dim this size is not a broadcast "
            "lookup — use interval_join"
        )
    los, his = [], []
    for r in rows:
        lo, hi = r[lo_col], r[hi_col]
        if lo is None or hi is None or not lo < hi:
            raise ValueError(f"range_lookup_join: bad interval [{lo}, {hi})")
        if los and lo < his[-1]:
            raise ValueError(
                f"range_lookup_join: overlapping intervals at lo={lo}"
            )
        los.append(float(lo))
        his.append(float(hi))

    spark = bands.sparkSession
    bands_idx = spark.createDataFrame(
        [(i, *[r[c] for c in bands.columns]) for i, r in enumerate(rows)],
        schema=["_band_idx", *bands.columns],
    )
    n = len(los)
    v = F.col(value_col).cast("double")

    if n <= CASE_TREE_MAX_BANDS:
        # Nested-CASE binary-search tree. Invariant at node [a, b):
        # the caller established los[a] <= v, so the leaf only needs
        # the hi check — `when(v < his[a], a)` yields NULL for gap
        # values, and a NULL v falls through every `when` to the outer
        # NULL. Each of the 2n-1 nodes is built once; the tree is a
        # single expression in a single Project, so project-collapse
        # has nothing to duplicate.
        def _probe(a: int, b: int) -> Column:
            if b - a == 1:
                return F.when(v < F.lit(his[a]), F.lit(a))
            m = (a + b) // 2
            return F.when(v >= F.lit(los[m]), _probe(m, b)).otherwise(
                _probe(a, m)
            )

        probed = fact.withColumn(
            "_band_idx", F.when(v >= F.lit(los[0]), _probe(0, n))
        )
    else:
        # Grid-bucketed candidate lookup (see step 2 in the docstring).
        base = los[0]
        n_cells = 2 * n
        step = (max(his) - base) / n_cells
        cell_cands: dict[int, list[tuple[int, float, float]]] = {}
        for i, (lo, hi) in enumerate(zip(los, his)):
            c_lo = int(math.floor((lo - base) / step))
            c_hi = int(math.floor((hi - base) / step))
            for c in range(max(c_lo, 0), min(c_hi, n_cells - 1) + 1):
                cell_cands.setdefault(c, []).append((i, lo, hi))
        cells_df = spark.createDataFrame(
            list(cell_cands.items()),
            schema="_cell long, _cands array<struct<idx: int, "
            "lo: double, hi: double>>",
        )
        # Clamp the probe cell into [0, n_cells-1] — the candidate map
        # is clamped to that range, and IEEE rounding of step can push
        # floor((v-base)/step) to n_cells for an IN-RANGE v just under
        # max(hi) (the band would be silently lost: no _cands row, no
        # exact-filter chance). Clamping can only ADD candidates for
        # truly out-of-range v, which the exact lo<=v<hi filter
        # rejects; a NULL v lands in cell 0 (least/greatest SKIP null
        # arguments rather than propagate them) and is likewise
        # rejected by the exact filter, yielding a NULL _band_idx.
        cell_raw = F.floor((v - F.lit(base)) / F.lit(step))
        probed = (
            fact.withColumn(
                "_cell",
                F.least(
                    F.lit(n_cells - 1), F.greatest(F.lit(0), cell_raw)
                ).cast("long"),
            )
            .join(F.broadcast(cells_df), "_cell", "left")
            .withColumn(
                "_band_idx",
                # F.get, not element_at: ANSI mode (Spark 4 default)
                # makes element_at THROW on an empty array; get
                # returns NULL — which is the gap/out-of-range answer
                F.get(
                    F.filter(
                        F.col("_cands"),
                        lambda c: (v >= c["lo"]) & (v < c["hi"]),
                    ),
                    0,
                )["idx"].cast("long"),
            )
            .drop("_cell", "_cands")
        )
    joined = probed.join(F.broadcast(bands_idx), "_band_idx", how)
    return joined.drop("_band_idx")
