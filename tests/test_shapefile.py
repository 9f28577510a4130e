"""Shapefile source tests: spec-compliant writer → reader roundtrip,
geometry equivalence vs the originating WKB, malformed-input errors."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from gis_etl_spark.geom import wkb as K
from gis_etl_spark.sources.shapefile import parse_shp, read_shapefile, write_shp


def test_write_parse_roundtrip(tmp_path):
    square = np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], dtype="f8")
    line = np.array([(0, 0), (2, 0), (2, 2)], dtype="f8")
    path = str(tmp_path / "mix.shp")
    write_shp(path, [(5, square), (1, (7.0, -3.0)), (3, line)])
    with open(path, "rb") as fh:
        recs = list(parse_shp(fh.read()))
    assert [r[0] for r in recs] == [1, 2, 3]
    assert [r[1] for r in recs] == [5, 1, 3]
    # polygon: centroid preserved (ring may be re-oriented CW per spec)
    cx, cy = K.centroid(recs[0][2])
    assert (cx, cy) == (pytest.approx(0.5), pytest.approx(0.5))
    assert K.centroid(recs[1][2]) == (7.0, -3.0)
    assert K.shape_type(recs[2][2]) == 2


def test_parse_rejects_garbage():
    with pytest.raises(ValueError, match="bad magic|truncated"):
        list(parse_shp(b"\x00" * 50))
    with pytest.raises(ValueError, match="bad magic"):
        list(parse_shp(b"\x00" * 200))


def test_multipart_polygon_with_hole():
    """ESRI ordering: CW shell then CCW hole → one POLYGON, 2 rings,
    hole subtracted from the centroid."""
    shell = np.array(
        [(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)], dtype="<f8"
    )  # CW
    hole = np.array(
        [(0.5, 1.5), (1.5, 1.5), (1.5, 2.5), (0.5, 2.5), (0.5, 1.5)],
        dtype="<f8",
    )  # CCW
    pts = np.vstack([shell, hole])
    content = (
        struct.pack("<i", 5)
        + struct.pack("<4d", 0, 0, 4, 4)
        + struct.pack("<2i", 2, len(pts))
        + struct.pack("<2i", 0, len(shell))
        + pts.tobytes()
    )
    rec = struct.pack(">ii", 1, len(content) // 2) + content
    header = bytearray(100)
    struct.pack_into(">i", header, 0, 9994)
    struct.pack_into(">i", header, 24, (100 + len(rec)) // 2)
    recs = list(parse_shp(bytes(header) + rec))
    assert len(recs) == 1
    wkb = recs[0][2]
    base, parts = K.parse(wkb)
    assert base == K.POLYGON
    assert len(parts[0]) == 2
    cx, cy = K.centroid(wkb)
    # 4x4 shell (area 16, c=(2,2)) minus 1x1 hole at (1,2)
    assert cx == pytest.approx((16 * 2 - 1 * 1) / 15)
    assert cy == pytest.approx(2.0)


def test_distributed_scan_geometry_equivalence(spark):
    """read_shapefile over the fixture corpus: feature counts and
    centroid sums match the originating buildings table."""
    from gis_etl_spark.fixtures import ensure_buildings, ensure_shapefiles
    from gis_etl_spark.geom.functions import st_centroid

    shp_dir, twin = ensure_shapefiles()
    df = read_shapefile(spark, shp_dir)
    n = df.count()
    import pandas as pd

    assert n == len(pd.read_parquet(twin))
    # centroid mass balance vs original corpus (same slice rules as the
    # fixture writer: single-ring polygons, points, linestrings)
    got = (
        df.withColumn("c", st_centroid(F.col("geom")))
        .agg(F.sum("c.x"), F.sum("c.y"))
        .first()
    )
    bpath, _ = ensure_buildings(5_000)
    src = pd.read_parquet(bpath)
    want_x = want_y = 0.0
    for row in src.itertuples():
        if row.geom is None:
            continue
        try:
            base, parts = K.parse(bytes(row.geom))
        except ValueError:
            continue
        if (
            (base == K.POLYGON and len(parts[0]) == 1)
            or base in (K.POINT, K.LINESTRING)
        ):
            cx, cy = K.centroid(K.force_2d(bytes(row.geom)))
            want_x += cx
            want_y += cy
    assert got[0] == pytest.approx(want_x, abs=1e-6)
    assert got[1] == pytest.approx(want_y, abs=1e-6)


def test_chunked_scan_matches_whole_file(spark, tmp_path):
    """r8 intra-file parallelism via .shx: record-range chunks must
    reproduce the whole-file decode exactly (records, ids, types,
    bytes), one task per chunk."""
    square = np.array([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)], dtype="f8")
    shapes = []
    for i in range(7):
        if i % 3 == 0:
            shapes.append((1, (float(i), float(-i))))
        elif i % 3 == 1:
            shapes.append((5, square + i))
        else:
            shapes.append((3, (square + i)[:3]))
    path = str(tmp_path / "chunky.shp")
    write_shp(path, shapes)
    glob_ = str(tmp_path / "*.shp")
    many = read_shapefile(spark, glob_, chunk_records=2)
    one = read_shapefile(spark, glob_, chunk_records=0)
    assert many.rdd.getNumPartitions() == 4  # ceil(7 / 2)
    a = sorted(map(tuple, many.collect()))
    b = sorted(map(tuple, one.collect()))
    assert a == b and len(a) == 7
