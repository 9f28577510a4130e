"""st_transform tests: published reference coordinates, roundtrip
precision properties, UTM invariants, and the Spark-level WKB path."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from gis_etl_spark.geom import transform as TR
from gis_etl_spark.geom import wkb as K


def test_utm_central_meridian_invariants():
    # points on the central meridian map to easting exactly 500000
    lon = np.array([117.0, 117.0, 117.0])  # zone 50 central meridian
    lat = np.array([0.0, 30.0, 60.0])
    e, n = TR.utm_forward(lon, lat, 50, south=False)
    assert np.allclose(e, 500_000.0, atol=1e-6)
    # equator maps to northing 0 (north hemisphere)
    assert abs(n[0]) < 1e-6
    # central-meridian scale factor ≈ k0
    e1, n1 = TR.utm_forward(np.array([117.0]), np.array([29.9999]), 50, False)
    e2, n2 = TR.utm_forward(np.array([117.0]), np.array([30.0001]), 50, False)
    # meridian arc per degree ≈ 110852.4 m at 30°N (WGS84)
    scale = (n2[0] - n1[0]) / (0.0002 * 110852.4)
    assert scale == pytest.approx(0.9996, abs=1e-3)


def test_utm_known_coordinate():
    """CN Tower (43.6426°N, 79.3871°W) — commonly published UTM 17N
    reference ≈ (630084 E, 4833439 N) at 43°38'33.24"N 79°23'13.7"W."""
    lat = 43 + 38 / 60 + 33.24 / 3600
    lon = -(79 + 23 / 60 + 13.7 / 3600)
    e, n = TR.utm_forward(np.array([lon]), np.array([lat]), 17, south=False)
    assert e[0] == pytest.approx(630_084, abs=2.0)
    assert n[0] == pytest.approx(4_833_439, abs=2.0)


def test_utm_roundtrip_precision():
    rng = np.random.default_rng(42)
    lon = rng.uniform(114.5, 119.5, 2000)  # inside zone 50
    lat = rng.uniform(-75, 75, 2000)
    e, n = TR.utm_forward(lon, lat, 50, south=False)
    lon2, lat2 = TR.utm_inverse(e, n, 50, south=False)
    # series truncation floor is ~7e-9 deg (≈0.8 mm) at high latitudes
    assert np.abs(lon2 - lon).max() < 5e-8
    assert np.abs(lat2 - lat).max() < 5e-8


def test_southern_hemisphere_false_northing():
    e, n = TR.utm_forward(np.array([117.0]), np.array([-20.0]), 50, True)
    assert n[0] > 7_000_000  # false northing applied
    lon2, lat2 = TR.utm_inverse(e, n, 50, True)
    assert lat2[0] == pytest.approx(-20.0, abs=1e-9)


def test_webmercator_roundtrip_and_known():
    # known: lon 180 → x = π·a ≈ 20037508.34
    x, y = TR.webmercator_forward(np.array([180.0]), np.array([0.0]))
    assert x[0] == pytest.approx(20_037_508.34, abs=0.01)
    assert abs(y[0]) < 1e-9
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-85, 85, 500)
    lon2, lat2 = TR.webmercator_inverse(*TR.webmercator_forward(lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_unsupported_epsg_rejects():
    with pytest.raises(ValueError, match="EPSG:2154 unsupported"):
        TR.transform_xy(np.zeros((1, 2)), 2154, 4326)


def test_st_transform_wkb_path(spark):
    """End-to-end over the UTM block of the buildings fixture: geoms
    declared EPSG:32650 land in zone-50 geographic bounds and roundtrip
    through the engine's own WKB kernels."""
    from gis_etl_spark.fixtures import ensure_buildings
    from gis_etl_spark.geom.functions import st_centroid
    from gis_etl_spark.geom.transform import st_transform

    bpath, _ = ensure_buildings(3_000)
    utm = (
        spark.read.parquet(bpath)
        .filter((F.col("epsg") == 32650) & F.col("geom").isNotNull())
    )
    n_utm = utm.count()
    assert n_utm > 10
    out = utm.withColumn(
        "geom4326", st_transform(F.col("geom"), F.col("epsg"), 4326)
    ).withColumn("c", st_centroid(F.col("geom4326")))
    rows = out.select("c.x", "c.y").collect()
    for r in rows:
        assert 114.0 < r.x < 120.0, "outside UTM zone 50 longitudes"
        assert -85.0 < r.y < 85.0
    # identity: same src/dst returns identical bytes
    same = utm.withColumn(
        "g2", st_transform(F.col("geom"), F.col("epsg"), 32650)
    ).select((F.col("g2") == F.col("geom")).alias("eq"))
    assert all(r.eq for r in same.collect())


def test_haversine_known_distance(spark):
    """ST_DISTANCE_SPHERE sanity on a published city pair: JFK->LHR
    great-circle distance is ~5,540-5,570 km depending on the radius
    model; with the IUGG mean radius the haversine value must sit in
    that band, agree with an independent math-module evaluation to
    sub-metre, and be zero for a degenerate pair."""
    import math

    from pyspark.sql import functions as F

    from gis_etl_spark.geom.functions import EARTH_R_M, st_distance_sphere

    jfk = (-73.7781, 40.6413)
    lhr = (-0.4543, 51.4700)
    row = (
        spark.range(1)
        .select(
            st_distance_sphere(
                repr(jfk[0]), repr(jfk[1]), repr(lhr[0]), repr(lhr[1])
            ).alias("d"),
            st_distance_sphere("0.0", "0.0", "0.0", "0.0").alias("z"),
        )
        .collect()[0]
    )
    k = math.pi / 180.0
    dlat = (lhr[1] - jfk[1]) * k
    dlon = (lhr[0] - jfk[0]) * k
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(jfk[1] * k) * math.cos(lhr[1] * k)
        * math.sin(dlon / 2) ** 2
    )
    want = 2 * EARTH_R_M * math.asin(math.sqrt(a))
    assert abs(row.d - want) < 1.0
    assert 5.50e6 < row.d < 5.60e6
    assert row.z == 0.0


def test_haversine_nan_propagates(spark):
    """NaN input coordinates must yield a NaN distance, not the
    antipodal maximum (~20,015 km) a bare least()-clamp produces when
    NaN orders above 1.0 — and the antipodal pair itself still clamps
    to the true maximum. Checked in BOTH engines off the one shared
    SQL text."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from gis_etl_spark.geom.functions import (
        EARTH_R_M,
        haversine_m_sql,
        st_distance_sphere,
    )

    nan = "CAST('NaN' AS DOUBLE)"
    row = (
        spark.range(1)
        .select(
            st_distance_sphere(nan, "40.0", "-0.45", "51.47").alias("d1"),
            st_distance_sphere("10.0", nan, "-0.45", "51.47").alias("d2"),
            st_distance_sphere("0.0", "0.0", "180.0", "0.0").alias("anti"),
        )
        .collect()[0]
    )
    assert math.isnan(row.d1) and math.isnan(row.d2)
    assert abs(row.anti - math.pi * EARTH_R_M) < 1.0
    got = duckdb.sql(
        "SELECT "
        + haversine_m_sql(nan, "40.0", "-0.45", "51.47")
        + " AS d, "
        + haversine_m_sql("0.0", "0.0", "180.0", "0.0")
        + " AS anti"
    ).fetchone()
    assert math.isnan(got[0])
    assert abs(got[1] - math.pi * EARTH_R_M) < 1.0


def test_utm_inverse_sql_twin_bit_parity():
    """The DuckDB unroll of the Snyder inverse series
    (utm_inverse_select_sql — the geo_convert_bbox oracle) must track
    the numpy kernel to a few ULPs (the only divergence source is
    numpy's vectorized sin/cos vs libm — all +,-,*,/ chains mirror
    the kernel's operation order and are IEEE-identical), far inside
    the 1e-6 rounding the contract query applies. Zone-50 north lon
    happens to be bit-exact; assert the magnitude bound that the
    contract actually needs."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(123)
    n = 20_000
    east = rng.uniform(150_000, 850_000, n)
    north = rng.uniform(1_500_000, 6_000_000, n)
    lon_np, lat_np = TR.utm_inverse(east, north, 50, False)

    src = pd.DataFrame(
        {"building_id": np.arange(n), "east": east, "north": north}
    )
    con = duckdb.connect()
    con.register("src", src)
    q = TR.utm_inverse_select_sql(
        "src", east="east", north="north", zone=50, keep="building_id"
    )
    res = con.sql(
        f"SELECT lon, lat FROM {q} t ORDER BY building_id"
    ).fetchnumpy()
    assert (res["lon"] == lon_np).all()
    assert np.abs(res["lat"] - lat_np).max() < 1e-13

    # southern-hemisphere false northing handled identically
    north_s = rng.uniform(4_000_000, 9_000_000, n)
    lon_s, lat_s = TR.utm_inverse(east, north_s, 33, True)
    src_s = pd.DataFrame(
        {"building_id": np.arange(n), "east": east, "north": north_s}
    )
    con.register("src_s", src_s)
    qs = TR.utm_inverse_select_sql(
        "src_s", east="east", north="north", zone=33, south=True,
        keep="building_id",
    )
    res_s = con.sql(
        f"SELECT lon, lat FROM {qs} t ORDER BY building_id"
    ).fetchnumpy()
    assert np.abs(res_s["lon"] - lon_s).max() < 1e-13
    assert np.abs(res_s["lat"] - lat_s).max() < 1e-13
