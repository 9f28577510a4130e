"""Layout tests: Hilbert curve properties + frozen goldens, Morton and
grid-cell JVM expressions vs independent Python math (SURVEY.md §7.2.3:
golden vectors + locality property tests stand in for the absent lindel
oracle)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from gis_etl_spark.layout.sfc import (
    DEFAULT_ORDER,
    grid_cell,
    grid_pitch,
    hilbert_encode,
    hilbert_encode_np,
    hilbert_from_lattice,
    morton_encode,
)


@pytest.mark.parametrize("order", [3, 4, 5])
def test_hilbert_bijection_and_adjacency(order):
    """Defining Hilbert properties: bijective on the lattice and every
    consecutive pair of indexes maps to Manhattan-adjacent cells."""
    n = 1 << order
    ix, iy = np.meshgrid(np.arange(n), np.arange(n))
    keys = hilbert_from_lattice(iy.ravel(), ix.ravel(), order)
    assert sorted(keys.tolist()) == list(range(n * n))
    pos = {
        int(k): (int(a), int(b))
        for k, a, b in zip(keys, iy.ravel(), ix.ravel())
    }
    for k in range(n * n - 1):
        (y0, x0), (y1, x1) = pos[k], pos[k + 1]
        assert abs(y0 - y1) + abs(x0 - x1) == 1, f"break at index {k}"


def test_hilbert_golden_vectors():
    """Frozen engine outputs — any change to scaling or bit order is a
    breaking layout change and must show up here."""
    pts = [
        (0.0, 0.0),
        (35.6762, 139.6503),
        (39.9042, 116.4074),
        (-33.8688, 151.2093),
        (51.5074, -0.1278),
        (89.9, 179.9),
        (-89.9, -179.9),
    ]
    y = np.array([p[0] for p in pts])
    x = np.array([p[1] for p in pts])
    assert list(map(int, hilbert_encode_np(y, x))) == [
        715827882,
        2611180811,
        2624364483,
        1687851915,
        3474255552,
        2863310644,
        3508,
    ]


def test_hilbert_locality():
    """Sorting random points by Hilbert key must place spatial
    neighbors nearby: mean consecutive-point distance after the sort
    should crush the random-order baseline."""
    rng = np.random.default_rng(42)
    y = rng.uniform(18, 46, 5000)
    x = rng.uniform(73, 146, 5000)
    keys = hilbert_encode_np(y, x)
    idx = np.argsort(keys)
    d_sorted = np.hypot(np.diff(x[idx]), np.diff(y[idx])).mean()
    d_random = np.hypot(np.diff(x), np.diff(y)).mean()
    assert d_sorted < d_random / 20


def test_hilbert_udf_matches_numpy(spark):
    import pandas as pd

    pts = pd.DataFrame({"y": [10.0, -45.0, 89.0], "x": [100.0, -170.0, 5.0]})
    sdf = spark.createDataFrame(pts).withColumn(
        "hkey", hilbert_encode(F.col("y"), F.col("x"))
    )
    got = {(r.y, r.x): r.hkey for r in sdf.collect()}
    want = hilbert_encode_np(pts.y.to_numpy(), pts.x.to_numpy())
    for (yx, k), w in zip(sorted(got.items()), _sorted_by_input(pts, want)):
        assert k == w


def _sorted_by_input(pts, keys):
    pairs = sorted(zip(zip(pts.y, pts.x), map(int, keys)))
    return [k for _, k in pairs]


def test_morton_expression_matches_python(spark):
    import pandas as pd

    rng = np.random.default_rng(7)
    pts = pd.DataFrame(
        {"y": rng.uniform(-90, 90, 200), "x": rng.uniform(-180, 180, 200)}
    )
    sdf = spark.createDataFrame(pts).withColumn(
        "mkey", morton_encode(F.col("y"), F.col("x"))
    )
    rows = sdf.collect()

    def spread(v: int) -> int:
        v = (v | v << 8) & 0x00FF00FF
        v = (v | v << 4) & 0x0F0F0F0F
        v = (v | v << 2) & 0x33333333
        v = (v | v << 1) & 0x55555555
        return v

    scale = (1 << DEFAULT_ORDER) - 1
    for r in rows:
        iy = min(max(int((r.y + 90.0) / 180.0 * scale), 0), scale)
        ix = min(max(int((r.x + 180.0) / 360.0 * scale), 0), scale)
        assert r.mkey == (spread(iy) << 1) | spread(ix), (r.y, r.x)


def test_grid_cell_expression(spark):
    import pandas as pd

    pts = pd.DataFrame({"lat": [35.0, -10.0, 0.0], "lng": [139.0, 20.0, 0.0]})
    sdf = spark.createDataFrame(pts).withColumn(
        "cell", grid_cell(F.col("lat"), F.col("lng"), 7)
    )
    pitch = grid_pitch(7)
    for r in sdf.collect():
        ix = int(np.floor((r.lng + 180.0) / pitch))
        iy = int(np.floor((r.lat + 90.0) / pitch))
        assert r.cell == (7 << 58) + (ix << 29) + iy
    # res must be recoverable from the id
    assert all((r.cell >> 58) == 7 for r in sdf.collect())


def test_grid_pitch_ladder():
    assert grid_pitch(7) == pytest.approx(0.01)
    # √7 linear step per level → ×7 area per level, H3-style
    assert grid_pitch(6) / grid_pitch(7) == pytest.approx(7 ** 0.5)


# --- icosahedral hex grid (layout/geohex.py) -------------------------------


@pytest.fixture(scope="module")
def hex_pts(spark):
    import pandas as pd

    rng = np.random.default_rng(11)
    n = 8000
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lat": rng.uniform(-89.9, 89.9, n),
            "lng": rng.uniform(-180.0, 180.0, n),
        }
    )
    return spark.createDataFrame(pdf)


def test_hex_cell_covers_all_faces(spark, hex_pts):
    from gis_etl_spark.layout.geohex import hex_cell

    out = hex_pts.select(hex_cell(F.col("lat"), F.col("lng"), 7).alias("c"))
    faces = out.select(
        F.shiftright("c", 52).bitwiseAND(F.lit(63)).alias("f")
    ).distinct()
    assert faces.count() == 20
    # res is recoverable from the id and every id is positive
    bad = out.filter(
        (F.shiftright("c", 58) != 7) | (F.col("c") <= 0)
    ).count()
    assert bad == 0


def test_hex_center_round_trip(spark, hex_pts):
    """Re-bucketing a cell's own center must return the same cell for
    all but the face-edge cells (documented face-clipping deviation:
    a boundary hex's center can project onto the neighboring face)."""
    from gis_etl_spark.layout.geohex import hex_cell, hex_cell_center

    cells = hex_pts.select(
        hex_cell(F.col("lat"), F.col("lng"), 7).alias("cell")
    ).distinct()
    clat, clng = hex_cell_center(F.col("cell"), 7)
    ctr = cells.select("cell", clat.alias("clat"), clng.alias("clng"))
    rt = ctr.select(
        "cell", hex_cell(F.col("clat"), F.col("clng"), 7).alias("cell2")
    )
    n = rt.count()
    bad = rt.filter(F.col("cell") != F.col("cell2")).count()
    assert bad / n < 0.005, f"{bad}/{n} round-trip failures"


def test_hex_parent_mostly_contains(spark, hex_pts):
    """hex_parent(child(p)) vs direct parent(p): aperture-7 hexes don't
    nest perfectly (same as H3's truncation semantics) but must agree
    for the vast majority of points, and parent must be a pure function
    of the child id."""
    from gis_etl_spark.layout.geohex import hex_cell, hex_parent

    cells = hex_pts.select(
        "pid", hex_cell(F.col("lat"), F.col("lng"), 7).alias("c7")
    )
    direct = hex_pts.select(
        "pid", hex_cell(F.col("lat"), F.col("lng"), 5).alias("c5")
    )
    via = cells.select("pid", hex_parent(F.col("c7"), 7, 5).alias("c5v"))
    j = direct.join(via, "pid")
    agree = j.filter(F.col("c5") == F.col("c5v")).count()
    assert agree / j.count() > 0.85
    # parent res stamped in the id
    assert via.filter(F.shiftright("c5v", 58) != 5).count() == 0


def test_hex_area_uniformity_beats_lattice(spark):
    """The reason geohex exists: a fixed degree-window at lat 72 covers
    ~cos(72°) the physical area of one at lat 2, and hex cell counts
    must track that, while the equal-angle lattice's counts do not."""
    import pandas as pd

    from gis_etl_spark.layout.geohex import hex_cell

    counts = {}
    for lat0 in (2.0, 72.0):
        g = np.mgrid[0:1:100j, 0:5:400j]
        d = spark.createDataFrame(
            pd.DataFrame(
                {"lat": lat0 + g[0].ravel(), "lng": 100 + g[1].ravel()}
            )
        )
        counts[lat0] = (
            d.select(hex_cell(F.col("lat"), F.col("lng"), 7).alias("c"))
            .distinct()
            .count(),
            d.select(grid_cell(F.col("lat"), F.col("lng"), 7).alias("c"))
            .distinct()
            .count(),
        )
    hex_ratio = counts[72.0][0] / counts[2.0][0]
    lattice_ratio = counts[72.0][1] / counts[2.0][1]
    assert 0.2 < hex_ratio < 0.45  # ≈ cos(72°) = 0.31
    assert lattice_ratio > 0.9  # lattice blind to latitude


def test_hex_boundary_wkt_closed_hexagon(spark, hex_pts):
    from gis_etl_spark.layout.geohex import hex_boundary_wkt, hex_cell

    cells = hex_pts.limit(50).select(
        hex_cell(F.col("lat"), F.col("lng"), 7).alias("cell")
    )
    rows = cells.select(
        hex_boundary_wkt(F.col("cell"), 7).alias("wkt")
    ).collect()
    for r in rows:
        assert r.wkt.startswith("POLYGON ((") and r.wkt.endswith("))")
        pts = r.wkt[len("POLYGON (("):-2].split(", ")
        assert len(pts) == 7  # closed ring: 6 corners + repeat
        assert pts[0] == pts[-1]


def test_hex_cell_np_matches_column_exactly(spark, hex_pts):
    """The vectorized numpy twin and the Arrow-pass wrapper must be
    BIT-IDENTICAL to the let-bound Column rendition — the oracle gate
    hashes raw cell ids, so approximate agreement is not enough."""
    from gis_etl_spark.layout.geohex import (
        hex_cell,
        hex_cell_arrow,
        hex_cell_np,
    )

    pdf = hex_pts.toPandas()
    for res in (0, 3, 7, 12):
        native = (
            hex_pts.select(
                "pid", hex_cell(F.col("lat"), F.col("lng"), res).alias("c")
            )
            .toPandas()
            .sort_values("pid")["c"]
            .to_numpy()
        )
        vec = hex_cell_np(
            pdf.sort_values("pid")["lat"].to_numpy(),
            pdf.sort_values("pid")["lng"].to_numpy(),
            res,
        )
        assert (native == vec).all()
        arrow = (
            hex_pts.select(
                "pid",
                hex_cell_arrow(F.col("lat"), F.col("lng"), res).alias("c"),
            )
            .toPandas()
            .sort_values("pid")["c"]
            .to_numpy()
        )
        assert (native == arrow.astype("int64")).all()


def test_hex_export_arrow_matches_column_exactly(spark, hex_pts):
    """The fused Arrow export pass (center + boundary WKT) must be
    string/value-identical to the let-bound Column renditions —
    same constants, same operation order, same '%.7f' formatting."""
    from gis_etl_spark.layout.geohex import (
        hex_boundary_wkt,
        hex_cell,
        hex_cell_center,
        hex_export_arrow,
    )

    cells = hex_pts.limit(500).select(
        "pid", hex_cell(F.col("lat"), F.col("lng"), 7).alias("cell")
    )
    clat, clng = hex_cell_center(F.col("cell"), 7)
    col = {
        r.pid: (round(r.lat, 6), round(r.lng, 6), r.wkt)
        for r in cells.select(
            "pid",
            clat.alias("lat"),
            clng.alias("lng"),
            hex_boundary_wkt(F.col("cell"), 7).alias("wkt"),
        ).collect()
    }
    arrow = {
        r.pid: (round(r.exp.center_lat, 6), round(r.exp.center_lng, 6),
                r.exp.boundary)
        for r in cells.withColumn(
            "exp", hex_export_arrow(F.col("cell"), 7)
        ).collect()
    }
    assert col == arrow


def test_fused_centroid_hex_cell_matches_staged_path(spark):
    """st_centroid_hex_cell (one Arrow pass over WKB) == st_centroid
    staging + hex_cell Column over the struct fields, id-for-id, on the
    buildings fixture — the exact composition the hex_heatmap contract
    query replaced."""
    from gis_etl_spark.geom.functions import st_centroid_hex_cell
    from gis_etl_spark.layout.geohex import hex_cell
    from gis_etl_spark.ops.geometry_queries import _read
    from gis_etl_spark.pipelines import buildings as B

    src = _read(spark).filter(F.col("geom").isNotNull())
    fused = (
        src.select(
            "building_id",
            st_centroid_hex_cell(F.col("geom"), 7).alias("cell"),
        )
        .toPandas()
        .sort_values("building_id")
    )
    staged = (
        B.with_centroid(src)
        .select(
            "building_id",
            hex_cell(
                F.col("centroid").getField("y"),
                F.col("centroid").getField("x"),
                7,
            ).alias("cell"),
        )
        .toPandas()
        .sort_values("building_id")
    )
    assert (
        fused["cell"].to_numpy().astype("int64")
        == staged["cell"].to_numpy().astype("int64")
    ).all()


def test_hilbert_native_matches_numpy(spark):
    """with_hilbert_key_native (pure JVM bit arithmetic, staged
    projections) must be BIT-IDENTICAL to hilbert_encode_np — same
    lattice scaling, same Skilling rounds."""
    import pandas as pd

    from gis_etl_spark.layout.sfc import (
        hilbert_encode_np,
        with_hilbert_key_native,
    )

    rng = np.random.default_rng(23)
    n = 20_000
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lat": rng.uniform(-90.0, 90.0, n),
            "lng": rng.uniform(-180.0, 180.0, n),
        }
    )
    # include exact corners / clamp-edge inputs
    edges = pd.DataFrame(
        {
            "pid": np.arange(n, n + 8),
            "lat": [-90.0, 90.0, 0.0, 89.999999, -90.0, 90.0, 1e-9, -1e-9],
            "lng": [-180.0, 180.0, 0.0, 179.999999, 180.0, -180.0, 1e-9, -1e-9],
        }
    )
    pdf = pd.concat([pdf, edges], ignore_index=True)
    got = (
        with_hilbert_key_native(
            spark.createDataFrame(pdf), F.col("lat"), F.col("lng")
        )
        .select("pid", "hkey")
        .toPandas()
        .sort_values("pid")["hkey"]
        .to_numpy()
    )
    exp = hilbert_encode_np(
        pdf["lat"].to_numpy(), pdf["lng"].to_numpy()
    ).astype("int64")
    assert (got == exp).all()


def test_geohash_known_vectors(spark):
    """Classic published geohash vectors: (57.64911, 10.40744) →
    u4pruyd (p=7); (42.605, -5.603) → ezs42 (p=5)."""
    import pyspark.sql.functions as F

    from gis_etl_spark.layout.sfc import geohash_int, geohash_str

    df = spark.createDataFrame(
        [(57.64911, 10.40744), (42.605, -5.603)], "lat double, lng double"
    )
    rows = df.select(
        geohash_str(F.col("lat"), F.col("lng"), 7).alias("g7"),
        geohash_str(F.col("lat"), F.col("lng"), 5).alias("g5"),
        geohash_int(F.col("lat"), F.col("lng"), 5).alias("i5"),
    ).collect()
    assert rows[0].g7 == "u4pruyd"
    assert rows[1].g5 == "ezs42"
    # int form renders to the same string through the alphabet
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    s = "".join(alpha[(rows[1].i5 >> (5 * (4 - i))) & 31] for i in range(5))
    assert s == "ezs42"


def test_tile_and_geohash_decode_roundtrip(spark):
    """Every encoded point falls inside its decoded cell bbox (both
    codecs, random points)."""
    import numpy as np
    import pyspark.sql.functions as F

    from gis_etl_spark.layout.sfc import (
        geohash_bbox,
        geohash_str,
        tile_bbox,
        tile_xy,
    )

    rng = np.random.default_rng(11)
    pts = [
        (float(rng.uniform(-84.5, 84.5)), float(rng.uniform(-179.5, 179.5)))
        for _ in range(50)
    ]
    df = spark.createDataFrame(pts, "lat double, lng double")
    tx, ty = tile_xy(F.col("lat"), F.col("lng"), 10)
    rows = df.select(
        "lat", "lng",
        tx.alias("x"), ty.alias("y"),
        geohash_str(F.col("lat"), F.col("lng"), 6).alias("gh"),
    ).collect()
    for r in rows:
        w, s, e, n = tile_bbox(r.x, r.y, 10)
        assert w - 1e-9 <= r.lng <= e + 1e-9, (r.lng, w, e)
        assert s - 1e-9 <= r.lat <= n + 1e-9, (r.lat, s, n)
        w, s, e, n = geohash_bbox(r.gh)
        assert w - 1e-9 <= r.lng <= e + 1e-9
        assert s - 1e-9 <= r.lat <= n + 1e-9
