"""Temporal/spatial join operators (ops/joins.py): semantics against
naive in-memory reference computations, plus plan hygiene — the whole
point of these formulations is that NO plan contains a nested-loop or
cartesian join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from gis_etl_spark.ops.joins import asof_join, interval_join, near_pairs
from gis_etl_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def trades_quotes(spark):
    """Small irregular timelines with ties and gaps."""
    rng = np.random.default_rng(5)
    n_q, n_t = 400, 150
    quotes = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B", "C"], n_q),
            "ts": pd.to_datetime(
                rng.integers(0, 1_000_000, n_q), unit="s", utc=False
            ),
            "bid": np.round(rng.uniform(10, 20, n_q), 2),
        }
    ).drop_duplicates(["sym", "ts"])
    trades = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B", "C", "D"], n_t),  # D: no quotes
            "ts": pd.to_datetime(
                rng.integers(0, 1_000_000, n_t), unit="s", utc=False
            ),
            "qty": rng.integers(1, 100, n_t),
        }
    )
    # force a few exact timestamp ties (must match backward AND forward)
    trades.loc[:4, ["sym", "ts"]] = quotes.iloc[:5][["sym", "ts"]].values
    return trades, quotes


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(spark, trades_quotes, direction):
    trades, quotes = trades_quotes
    got = (
        asof_join(
            spark.createDataFrame(trades),
            spark.createDataFrame(quotes),
            on=["sym"],
            value_cols=["bid"],
            direction=direction,
        )
        .toPandas()
        .sort_values(["sym", "ts_us", "qty"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        trades.sort_values("ts"),
        quotes.sort_values("ts"),
        on="ts",
        by="sym",
        direction=direction,
    )
    exp["ts_us"] = exp["ts"].astype("int64") // 1000
    exp = exp.sort_values(["sym", "ts_us", "qty"]).reset_index(drop=True)
    assert len(got) == len(trades)
    pd.testing.assert_series_equal(
        got["asof_bid"].astype("float64"),
        exp["bid"].astype("float64"),
        check_names=False,
    )


def test_asof_join_tie_matches_same_timestamp(spark, trades_quotes):
    """A reference at exactly the left timestamp is a valid match in
    both directions (>= / <= semantics)."""
    trades, quotes = trades_quotes
    tied = trades.iloc[:5]
    for direction in ("backward", "forward"):
        got = asof_join(
            spark.createDataFrame(tied),
            spark.createDataFrame(quotes),
            on=["sym"],
            value_cols=["bid"],
            direction=direction,
        ).toPandas()
        merged = tied.merge(quotes, on=["sym", "ts"])
        merged["ts_us"] = merged["ts"].astype("int64") // 1000
        exp = merged.set_index(["sym", "ts_us"])["bid"]
        for _, row in got.iterrows():
            assert row["asof_ts"] == row["ts_us"]
            assert row["asof_bid"] == pytest.approx(
                exp.loc[(row["sym"], row["ts_us"])]
            )


def test_interval_join_matches_naive(spark):
    rng = np.random.default_rng(9)
    pts = pd.DataFrame(
        {
            "k": rng.choice(["x", "y"], 300),
            "t": rng.integers(0, 10_000, 300),
            "v": rng.uniform(0, 1, 300),
        }
    )
    iv = pd.DataFrame(
        {
            "k": rng.choice(["x", "y"], 40),
            "s": rng.integers(0, 9_000, 40),
        }
    )
    iv["e"] = iv["s"] + rng.integers(100, 2_000, 40)
    iv["iv_id"] = np.arange(len(iv))
    got = (
        interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            on=["k"],
            point_ts_us="t",
            start_us="s",
            end_us="e",
            bucket_us=1_000,
        )
        .groupBy("iv_id")
        .count()
        .toPandas()
        .set_index("iv_id")["count"]
    )
    naive = {
        row.iv_id: int(
            (
                (pts["k"] == row.k) & (pts["t"] > row.s) & (pts["t"] <= row.e)
            ).sum()
        )
        for row in iv.itertuples()
    }
    for iv_id, n in naive.items():
        assert got.get(iv_id, 0) == n


def test_near_pairs_matches_brute_force(spark):
    rng = np.random.default_rng(3)
    n = 500
    pts = pd.DataFrame(
        {
            "pid": np.arange(n),
            "x": rng.uniform(0, 1, n),
            "y": rng.uniform(0, 1, n),
        }
    )
    r = 0.03
    got = (
        near_pairs(spark.createDataFrame(pts), "pid", "x", "y", r)
        .select("a_id", "b_id")
        .toPandas()
    )
    got_set = set(zip(got["a_id"], got["b_id"]))
    xy = pts[["x", "y"]].to_numpy()
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    ii, jj = np.where(d2 <= r * r)
    exp = {(int(a), int(b)) for a, b in zip(ii, jj) if a < b}
    assert got_set == exp


@pytest.mark.parametrize(
    "name",
    ["asof_click_view", "interval_error_activity", "spatial_near_pairs"],
)
def test_join_plans_have_no_nested_loop(spark, sf_dir, name):
    plan = (
        REGISTRY[name][0](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_pip_join_matches_brute_force(spark):
    """pip_join (grid-bucket bbox prefilter + exact even-odd test) ==
    scalar brute force on a dense synthetic set of overlapping boxes."""
    import numpy as np
    import pandas as pd

    from gis_etl_spark.geom import wkb as K
    from gis_etl_spark.ops.joins import pip_join

    rng = np.random.default_rng(17)
    n_poly, n_pt = 150, 250
    x0 = rng.uniform(0.0, 0.8, n_poly)
    y0 = rng.uniform(0.0, 0.8, n_poly)
    wdt = rng.uniform(0.05, 0.2, n_poly)
    hgt = rng.uniform(0.05, 0.2, n_poly)
    polys = []
    for i in range(n_poly):
        a, b, w, h = x0[i], y0[i], wdt[i], hgt[i]
        wkt = (
            f"POLYGON (({a} {b}, {a + w} {b}, {a + w} {b + h}, "
            f"{a} {b + h}, {a} {b}))"
        )
        polys.append(
            (
                i,
                K.from_wkt(wkt),
                float(a),
                float(b),
                float(a + w),
                float(b + h),
            )
        )
    px = rng.uniform(0.0, 1.0, n_pt)
    py = rng.uniform(0.0, 1.0, n_pt)

    pts_df = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(n_pt), "cx": px, "cy": py})
    )
    polys_df = spark.createDataFrame(
        [(i, bytearray(g), xa, ya, xb, yb) for i, g, xa, ya, xb, yb in polys],
        "poly_id long, geom binary, xmin double, ymin double, "
        "xmax double, ymax double",
    )
    got = {
        (r.point_id, r.poly_id)
        for r in pip_join(pts_df, polys_df, cell_deg=0.1).collect()
    }
    exp = {
        (pi, i)
        for pi in range(n_pt)
        for i, g, *_ in polys
        if K.contains_point(g, float(px[pi]), float(py[pi]))
    }
    assert got == exp
    assert len(exp) > 100  # the synthetic set is genuinely dense


def test_nearest_neighbor_join_matches_brute_force(spark):
    """Radius-bounded 1-NN vs numpy brute force: same survivors (points
    with any in-range neighbor), same nearest id, exact d2; plus a
    hand-built tie — two equidistant neighbors resolve to the smaller
    id — and an isolated point that must drop out."""
    from gis_etl_spark.ops.joins import nearest_neighbor_join

    rng = np.random.default_rng(11)
    n = 400
    pts = pd.DataFrame(
        {
            "pid": np.arange(n),
            "x": rng.uniform(0, 1, n),
            "y": rng.uniform(0, 1, n),
        }
    )
    r = 0.04
    got = {
        int(row.a_id): (int(row.b_id), float(row.d2))
        for row in nearest_neighbor_join(
            spark.createDataFrame(pts), "pid", "x", "y", r
        ).collect()
    }
    xy = pts[["x", "y"]].to_numpy()
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    exp = {}
    for i in range(n):
        j = int(np.argmin(d2[i]))  # argmin ties → lowest index
        if d2[i, j] <= r * r:
            exp[i] = (j, float(d2[i, j]))
    assert got == exp

    tie = pd.DataFrame(
        {
            "pid": [0, 1, 2, 9],
            "x": [0.5, 0.4, 0.6, 5.0],  # 1 and 2 equidistant from 0
            "y": [0.5, 0.5, 0.5, 5.0],  # 9 isolated
        }
    )
    got_tie = {
        int(row.a_id): int(row.b_id)
        for row in nearest_neighbor_join(
            spark.createDataFrame(tie), "pid", "x", "y", 0.2
        ).collect()
    }
    assert got_tie == {0: 1, 1: 0, 2: 0}


def test_unbounded_nn_join_exact_for_all_points(spark):
    """Ring-doubling kNN: EVERY point (including far outliers that the
    bounded join drops) gets its true global nearest neighbor —
    verified against numpy brute force on a set with a deliberately
    isolated far cluster and a lone remote point."""
    from gis_etl_spark.ops.joins import nearest_neighbor_join_unbounded

    rng = np.random.default_rng(23)
    dense = np.column_stack(
        [rng.uniform(0, 1, 300), rng.uniform(0, 1, 300)]
    )
    far = np.column_stack(
        [rng.uniform(50, 50.5, 8), rng.uniform(50, 50.5, 8)]
    )
    lone = np.array([[200.0, 200.0]])
    xy = np.vstack([dense, far, lone])
    pts = pd.DataFrame(
        {"pid": np.arange(len(xy)), "x": xy[:, 0], "y": xy[:, 1]}
    )
    got = {
        int(r.a_id): (int(r.b_id), float(r.d2))
        for r in nearest_neighbor_join_unbounded(
            spark.createDataFrame(pts), "pid", "x", "y", 0.05
        ).collect()
    }
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    exp = {
        i: (int(np.argmin(d2[i])), float(d2[i].min()))
        for i in range(len(xy))
    }
    assert got == exp
    assert len(got) == len(xy)  # nobody unresolved, even the lone point


def test_unbounded_nn_join_partitioning_invariant(spark):
    """The ring-doubling 1-NN must return the identical answer under
    different input partitionings — min(struct) argmin and the
    residue loop are order-free."""
    from gis_etl_spark.ops.joins import nearest_neighbor_join_unbounded

    rng = np.random.default_rng(31)
    pts = pd.DataFrame(
        {
            "pid": np.arange(200),
            "x": rng.uniform(0, 1, 200),
            "y": rng.uniform(0, 1, 200),
        }
    )
    base = spark.createDataFrame(pts)
    a = {
        (r.a_id, r.b_id, r.d2)
        for r in nearest_neighbor_join_unbounded(
            base.repartition(1), "pid", "x", "y", 0.02
        ).collect()
    }
    b = {
        (r.a_id, r.b_id, r.d2)
        for r in nearest_neighbor_join_unbounded(
            base.repartition(7, "pid"), "pid", "x", "y", 0.02
        ).collect()
    }
    assert a == b and len(a) == 200


def test_unbounded_nn_join_degenerate_inputs(spark):
    """Contract hardening: 0- and 1-point inputs return an EMPTY frame
    with the output schema (no pairs exist) instead of IndexError-ing
    on parts[0]."""
    from gis_etl_spark.ops.joins import nearest_neighbor_join_unbounded

    empty = spark.createDataFrame(
        [], "pid long, x double, y double"
    )
    out = nearest_neighbor_join_unbounded(empty, "pid", "x", "y", 0.1)
    assert out.columns == ["a_id", "b_id", "d2"]
    assert out.count() == 0

    one = spark.createDataFrame(
        pd.DataFrame({"pid": [7], "x": [0.0], "y": [0.0]})
    )
    out1 = nearest_neighbor_join_unbounded(one, "pid", "x", "y", 0.1)
    assert out1.columns == ["a_id", "b_id", "d2"]
    assert out1.count() == 0


def test_unbounded_nn_join_raises_on_unresolved_residue(spark):
    """If max_doublings is exhausted with points still unresolved, the
    join must FAIL LOUDLY (the docstring promises every point its true
    nearest) rather than silently dropping the residue."""
    import pytest as _pytest

    from gis_etl_spark.ops.joins import nearest_neighbor_join_unbounded

    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [0, 1], "x": [0.0, 1000.0], "y": [0.0, 0.0]})
    )
    with _pytest.raises(ValueError, match="unresolved"):
        # r0=0.001 doubled twice reaches 0.004 — far short of 1000
        nearest_neighbor_join_unbounded(
            pts, "pid", "x", "y", 0.001, max_doublings=2
        )


# --- range_lookup_join ------------------------------------------------------


@pytest.fixture(scope="module")
def band_frames(spark):
    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [
            rng.uniform(-50, 450, 3000),
            np.array([0.0, 100.0, 200.0, 300.0, 399.999, 400.0, -0.001]),
        ]
    )
    fact = spark.createDataFrame(
        pd.DataFrame({"rid": np.arange(len(vals)), "v": vals})
    )
    bands = spark.createDataFrame(
        [
            ("a", 0.0, 100.0),
            ("b", 100.0, 200.0),
            # deliberate gap [200, 250)
            ("c", 250.0, 400.0),
        ],
        schema=["label", "lo", "hi"],
    )
    return fact, bands


def test_range_lookup_matches_nonequi_join(spark, band_frames):
    """Band-index compute + broadcast equi-join must equal the naive
    non-equi join on [lo, hi) — including boundary values sitting
    exactly on lo and hi and values in a gap between bands."""
    from gis_etl_spark.ops.joins import range_lookup_join

    fact, bands = band_frames
    got = (
        range_lookup_join(fact, "v", bands, "lo", "hi")
        .select("rid", "label").orderBy("rid").collect()
    )
    want = (
        fact.join(
            bands,
            (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")),
        )
        .select("rid", "label").orderBy("rid").collect()
    )
    assert got == want and len(got) > 0


def test_range_lookup_left_keeps_out_of_band(spark, band_frames):
    from gis_etl_spark.ops.joins import range_lookup_join

    fact, bands = band_frames
    out = range_lookup_join(fact, "v", bands, "lo", "hi", how="left")
    assert out.count() == fact.count()
    nulls = out.filter(F.col("label").isNull()).count()
    want_nulls = fact.count() - fact.join(
        bands, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    ).count()
    assert nulls == want_nulls > 0


def test_range_lookup_rejects_bad_dims(spark, band_frames):
    from gis_etl_spark.ops.joins import range_lookup_join

    fact, _ = band_frames
    overlapping = spark.createDataFrame(
        [("a", 0.0, 120.0), ("b", 100.0, 200.0)],
        schema=["label", "lo", "hi"],
    )
    with pytest.raises(ValueError, match="overlap"):
        range_lookup_join(fact, "v", overlapping, "lo", "hi")
    inverted = spark.createDataFrame(
        [("a", 10.0, 10.0)], schema=["label", "lo", "hi"]
    )
    with pytest.raises(ValueError, match="bad interval"):
        range_lookup_join(fact, "v", inverted, "lo", "hi")
    big = spark.range(0, 50).select(
        F.col("id").cast("string").alias("label"),
        (F.col("id") * 10.0).alias("lo"),
        (F.col("id") * 10.0 + 10.0).alias("hi"),
    )
    with pytest.raises(ValueError, match="max_bands"):
        range_lookup_join(fact, "v", big, "lo", "hi", max_bands=10)


def test_range_lookup_random_fractional_bands_match_nonequi(spark):
    """Randomized fractional boundaries at several band counts
    (including n=1 and a non-power-of-two): the tree probe must equal
    the naive non-equi join exactly, with fact values sampled ON the
    lo/hi boundaries as well as inside gaps and outside the range."""
    from gis_etl_spark.ops.joins import range_lookup_join

    rng = np.random.default_rng(23)
    # 37 exercises the CASE tree; 200 crosses CASE_TREE_MAX_BANDS into
    # the grid-bucketed probe — same exactness contract on both plans
    for n_bands in (1, 2, 37, 200):
        edges = np.sort(rng.uniform(-1e4, 1e4, 2 * n_bands))
        los, his = edges[0::2], edges[1::2]
        bands = spark.createDataFrame(
            pd.DataFrame(
                {"bid": np.arange(n_bands), "lo": los, "hi": his}
            )
        )
        vals = np.concatenate(
            [
                rng.uniform(-1.2e4, 1.2e4, 2000),
                los,  # exactly on every lo (inclusive)
                his,  # exactly on every hi (exclusive)
                # one ULP below every hi: IN-range top of each band —
                # the grid probe's IEEE edge (an unclamped probe cell
                # can land past the candidate map for the last band)
                np.nextafter(his, -np.inf),
            ]
        )
        fact = spark.createDataFrame(
            pd.DataFrame({"rid": np.arange(len(vals)), "v": vals})
        )
        got = (
            range_lookup_join(fact, "v", bands, "lo", "hi", how="left")
            .select("rid", "bid")
            .collect()
        )
        want = (
            fact.join(
                bands,
                (fact["v"] >= bands["lo"]) & (fact["v"] < bands["hi"]),
                "left",
            )
            .select("rid", "bid")
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), n_bands


def test_range_lookup_2000_bands_correct_and_codegen(spark):
    """The probe at REAL dimension size (2,000 bands): (a) band
    assignment equals the closed-form answer on every row including
    boundary/gap/out-of-range values; (b) the plan stays
    BroadcastHashJoin with no Python and no nested-loop fallback;
    (c) analysis+execution completes in bounded time — the r8
    O(|bands|)-interpreted-HOF probe took minutes at this size."""
    import time

    from gis_etl_spark.ops.joins import range_lookup_join

    n_bands = 2_000
    # bands [10i, 10i+8) with a 2-wide gap between consecutive bands
    bands = spark.createDataFrame(
        [(i, i * 10.0, i * 10.0 + 8.0) for i in range(n_bands)],
        schema=["band_id", "lo", "hi"],
    )
    # integer-valued doubles: fact value k → band k//10 iff k%10 < 8
    fact = spark.range(0, 100_000).select(
        F.col("id").alias("rid"),
        # spread over [-5000, 25000): below, inside, in-gap, above
        ((F.col("id") * 7919) % 30_000 - 5_000).cast("double").alias("v"),
    )
    t0 = time.time()
    out = range_lookup_join(fact, "v", bands, "lo", "hi", how="left")
    got = out.select(
        "rid",
        "v",
        "band_id",
    ).withColumn(
        "want",
        F.when(
            (F.col("v") >= 0)
            & (F.col("v") < n_bands * 10)
            & (F.col("v") % 10 < 8),
            (F.col("v") / 10).cast("int").cast("bigint"),
        ),
    )
    n_bad = got.filter(
        ~(
            F.col("band_id").eqNullSafe(F.col("want"))
        )
    ).count()
    wall = time.time() - t0
    assert n_bad == 0
    # loose ceiling: catches an O(n)-per-row or interpreted-fallback
    # regression (minutes), not host noise
    assert wall < 60, f"2000-band probe took {wall:.1f}s"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_range_lookup_plan_is_broadcast_hash(spark, band_frames):
    """The reason this operator exists: Spark plans the naive non-equi
    broadcast join as BroadcastNestedLoopJoin; the lookup must not."""
    from gis_etl_spark.ops.joins import range_lookup_join

    fact, bands = band_frames
    plan = (
        range_lookup_join(fact, "v", bands, "lo", "hi")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_range_lookup_10k_bands_grid_probe(spark):
    """The grid probe at the documented max_bands ceiling (10,000 —
    the scale where the r10-era CASE tree OOM'd executor heap on a
    wide fact): exact band assignment, BroadcastHashJoin-only plan,
    bounded wall."""
    import time

    from gis_etl_spark.ops.joins import range_lookup_join

    n_bands = 10_000
    bands = spark.createDataFrame(
        [(i, i * 10.0, i * 10.0 + 8.0) for i in range(n_bands)],
        schema=["band_id", "lo", "hi"],
    )
    fact = spark.range(0, 500_000).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 7919) % 120_000 - 10_000).cast("double").alias("v"),
    )
    t0 = time.time()
    out = range_lookup_join(fact, "v", bands, "lo", "hi", how="left")
    got = out.select("rid", "v", "band_id").withColumn(
        "want",
        F.when(
            (F.col("v") >= 0)
            & (F.col("v") < n_bands * 10)
            & (F.col("v") % 10 < 8),
            (F.col("v") / 10).cast("int").cast("bigint"),
        ),
    )
    n_bad = got.filter(
        ~F.col("band_id").eqNullSafe(F.col("want"))
    ).count()
    wall = time.time() - t0
    assert n_bad == 0
    assert wall < 30, f"10k-band grid probe took {wall:.1f}s"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
