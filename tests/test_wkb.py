"""WKB kernel unit tests — handcrafted geometries with known answers,
mirroring the reference's manual QA checklist (SURVEY.md §5)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from gis_etl_spark.geom import wkb as K


def poly(ring, z=None):
    dims = 2 if z is None else 3
    word = 3 if z is None else (1003 if z == "iso" else 3 | 0x80000000)
    out = bytearray(struct.pack("<BII", 1, word, 1))
    out += struct.pack("<I", len(ring))
    for pt in ring:
        out += struct.pack(f"<{dims}d", *pt[:dims])
    return bytes(out)


UNIT_SQUARE = poly([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])


def test_shape_type_codes():
    assert K.shape_type(UNIT_SQUARE) == 3
    assert K.shape_type(struct.pack("<BI2d", 1, 1, 5.0, 6.0)) == 1
    # ISO Z and EWKB Z both decode to base 3
    sq3d = [(0, 0, 9), (1, 0, 9), (1, 1, 9), (0, 1, 9), (0, 0, 9)]
    assert K.shape_type(poly(sq3d, z="iso")) == 3
    assert K.shape_type(poly(sq3d, z="ewkb")) == 3


def test_centroid_unit_square():
    cx, cy = K.centroid(UNIT_SQUARE)
    assert cx == pytest.approx(0.5)
    assert cy == pytest.approx(0.5)


def test_centroid_orientation_independent():
    cw = poly([(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)])
    cx, cy = K.centroid(cw)
    assert (cx, cy) == (pytest.approx(0.5), pytest.approx(0.5))


def test_centroid_polygon_with_hole():
    # 4x4 square with centered 2x2 hole: centroid stays at center
    shell = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    hole = [(1, 1), (1, 3), (3, 3), (3, 1), (1, 1)]  # CW = subtract
    out = bytearray(struct.pack("<BII", 1, 3, 2))
    for ring in (shell, hole):
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<2d", x, y)
    cx, cy = K.centroid(bytes(out))
    assert (cx, cy) == (pytest.approx(2.0), pytest.approx(2.0))


def test_centroid_asymmetric_hole():
    # shell 0..4, hole in the left half → centroid shifts right
    shell = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    hole = [(0.5, 1.5), (0.5, 2.5), (1.5, 2.5), (1.5, 1.5), (0.5, 1.5)]
    out = bytearray(struct.pack("<BII", 1, 3, 2))
    for ring in (shell, hole):
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<2d", x, y)
    cx, cy = K.centroid(bytes(out))
    # exact: (16*2 - 1*1) / 15 = 31/15
    assert cx == pytest.approx(31 / 15)
    assert cy == pytest.approx(2.0)


def test_centroid_point_line():
    assert K.centroid(struct.pack("<BI2d", 1, 1, 7.0, -3.0)) == (7.0, -3.0)
    line = bytearray(struct.pack("<BII", 1, 2, 3))
    for x, y in [(0, 0), (2, 0), (2, 2)]:
        line += struct.pack("<2d", float(x), float(y))
    cx, cy = K.centroid(bytes(line))
    # segments: (0,0)-(2,0) len 2 mid (1,0); (2,0)-(2,2) len 2 mid (2,1)
    assert (cx, cy) == (pytest.approx(1.5), pytest.approx(0.5))


def test_bbox_and_npoints():
    assert K.bbox(UNIT_SQUARE) == (0.0, 0.0, 1.0, 1.0)
    assert K.npoints(UNIT_SQUARE) == 5


def test_flip_roundtrip():
    flipped = K.flip(UNIT_SQUARE)
    assert K.centroid(flipped) == (pytest.approx(0.5), pytest.approx(0.5))
    assert K.flip(flipped) == UNIT_SQUARE
    rect = poly([(0, 0), (2, 0), (2, 1), (0, 1), (0, 0)])
    fx, fy = K.centroid(K.flip(rect))
    assert (fx, fy) == (pytest.approx(0.5), pytest.approx(1.0))


def test_force2d():
    sq3d = [(0, 0, 9), (1, 0, 9), (1, 1, 9), (0, 1, 9), (0, 0, 9)]
    for variant in ("iso", "ewkb"):
        out = K.force_2d(poly(sq3d, z=variant))
        assert out == UNIT_SQUARE
    # 2-D input is unchanged
    assert K.force_2d(UNIT_SQUARE) == UNIT_SQUARE


def test_big_endian_parse():
    be = bytearray(struct.pack(">BI", 0, 1)) # big-endian POINT
    be = bytes([0]) + struct.pack(">I", 1) + struct.pack(">2d", 3.0, 4.0)
    assert K.shape_type(be) == 1
    assert K.centroid(be) == (3.0, 4.0)
    # rebuild normalizes to little-endian
    assert K.flip(K.flip(be))[0] == 1


def test_wkt_roundtrip():
    for wkt in [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1, 2 0)",
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 3, 3 3, 3 1, 1 1))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
    ]:
        buf = K.from_wkt(wkt)
        assert K.to_wkt(buf).split(" ", 1)[0] == wkt.split(" ", 1)[0]
        assert K.from_wkt(K.to_wkt(buf)) == buf


def test_multipolygon_centroid_weighted():
    # two unit squares at (0,0) and (10,0) → centroid (5.5, 0.5)... equal
    # weights; make second 2x2 to check area weighting
    mp = bytearray(struct.pack("<BII", 1, 6, 2))
    for ring in (
        [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)],
        [(10, 0), (12, 0), (12, 2), (10, 2), (10, 0)],
    ):
        mp += struct.pack("<BII", 1, 3, 1)
        mp += struct.pack("<I", len(ring))
        for x, y in ring:
            mp += struct.pack("<2d", float(x), float(y))
    cx, cy = K.centroid(bytes(mp))
    # areas 1 and 4 → cx = (0.5*1 + 11*4)/5 = 8.9, cy = (0.5 + 1*4)/5 = 0.9
    assert cx == pytest.approx(8.9)
    assert cy == pytest.approx(0.9)


def test_degenerate_zero_area_fallback():
    degenerate = poly([(5, 6), (5, 6), (5, 6), (5, 6)])
    assert K.centroid(degenerate) == (pytest.approx(5.0), pytest.approx(6.0))


def test_fixture_goldens_match_kernels():
    """Engine kernels vs the independently-computed golden table
    (FIXTURES.md B1) — two implementations, one truth."""
    from gis_etl_spark.fixtures import make_buildings

    buildings, expected, _, _ = make_buildings(500, seed=42)
    merged = buildings.merge(expected, on="building_id")
    n_checked = 0
    for row in merged.itertuples():
        if row.geom is None:
            continue
        assert K.shape_type(row.geom) == row.shape_type, row.building_id
        cx, cy = K.centroid(row.geom)
        assert cx == pytest.approx(row.cx, abs=1e-9), row.building_id
        assert cy == pytest.approx(row.cy, abs=1e-9), row.building_id
        xmin, ymin, xmax, ymax = K.bbox(row.geom)
        assert xmin == pytest.approx(row.xmin, abs=1e-12)
        assert ymax == pytest.approx(row.ymax, abs=1e-12)
        n_checked += 1
    assert n_checked > 450


def test_contains_point_synthetic_cases():
    """Even-odd containment on hand-built geometries: square, square
    with hole, multipolygon, non-areal types."""
    import numpy as np

    from gis_etl_spark.geom import wkb as K

    sq = K.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    holed = K.from_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    )
    multi = K.from_wkt(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((5 5, 6 5, 6 6, 5 6, 5 5)))"
    )
    line = K.from_wkt("LINESTRING (0 0, 1 1)")
    pt = K.from_wkt("POINT (0.5 0.5)")
    cases = [
        (sq, 0.5, 0.5, True),
        (sq, 1.5, 0.5, False),
        (sq, -0.1, 0.5, False),
        (holed, 2.0, 2.0, False),   # inside the hole
        (holed, 0.5, 2.0, True),    # in the shell, outside the hole
        (holed, 5.0, 5.0, False),
        (multi, 0.5, 0.5, True),
        (multi, 5.5, 5.5, True),
        (multi, 2.5, 2.5, False),
        (line, 0.5, 0.5, False),
        (pt, 0.5, 0.5, False),
    ]
    for buf, x, y, want in cases:
        assert K.contains_point(buf, x, y) == want, (x, y, want)
    got = K.contains_point_batch(
        [c[0] for c in cases],
        np.array([c[1] for c in cases]),
        np.array([c[2] for c in cases]),
    )
    assert list(got) == [c[3] for c in cases]


def test_contains_point_batch_matches_scalar_on_fixture():
    """Whole-batch kernel == scalar reference, geometry-for-geometry,
    on real fixture polygons with their centroids as query points."""
    import duckdb
    import numpy as np

    from gis_etl_spark.geom import wkb as K
    from gis_etl_spark.ops.geometry_queries import fixture_paths

    bpath, _ = fixture_paths()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT geom FROM read_parquet('{bpath}') "
        "WHERE geom IS NOT NULL LIMIT 800"
    ).fetchall()
    con.close()
    bufs = [bytes(r[0]) for r in rows]
    xs, ys = K.centroid_batch(bufs)
    batch = K.contains_point_batch(bufs, xs, ys)
    for i, buf in enumerate(bufs):
        assert batch[i] == K.contains_point(buf, xs[i], ys[i]), i
    # plausibility: synthetic footprints are mostly convex-ish
    assert batch.mean() > 0.8


def test_area_perimeter_analytic_shapes():
    """area_perimeter against hand-computed shapes: unit square, square
    with a hole (area subtracts, boundary adds), open line, point."""
    import struct

    from gis_etl_spark.geom import wkb as K

    def poly(rings):
        out = bytearray(struct.pack("<BII", 1, 3, len(rings)))
        for ring in rings:
            out += struct.pack("<I", len(ring))
            for x, y in ring:
                out += struct.pack("<2d", x, y)
        return bytes(out)

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    a, p = K.area_perimeter(poly([sq]))
    assert a == 16.0 and p == 16.0

    hole = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]  # CW
    a, p = K.area_perimeter(poly([sq, hole]))
    assert a == 15.0 and p == 20.0

    line = struct.pack("<BII", 1, 2, 3) + struct.pack(
        "<6d", 0.0, 0.0, 3.0, 4.0, 3.0, 10.0
    )
    a, p = K.area_perimeter(line)
    assert a == 0.0 and p == 11.0  # 5 + 6, open path

    a, p = K.area_perimeter(struct.pack("<BI2d", 1, 1, 7.0, 8.0))
    assert a == 0.0 and p == 0.0


def test_simplify_douglas_peucker():
    """DP on analytic shapes: a near-collinear bump below tolerance
    drops; above tolerance survives; endpoints always kept; polygon
    rings never drop below 4 vertices."""
    import struct

    from gis_etl_spark.geom import wkb as K

    def line(pts):
        return struct.pack("<BII", 1, 2, len(pts)) + b"".join(
            struct.pack("<2d", x, y) for x, y in pts
        )

    wav = [(0.0, 0.0), (1.0, 0.01), (2.0, 0.0), (3.0, 1.0), (4.0, 0.0)]
    _, parts = K.parse(K.simplify(line(wav), 0.1))
    kept = [tuple(p) for p in parts[0][0]]
    assert kept == [(0.0, 0.0), (2.0, 0.0), (3.0, 1.0), (4.0, 0.0)]
    _, parts = K.parse(K.simplify(line(wav), 0.001))
    assert len(parts[0][0]) == 5  # bump above tol survives

    # square ring with a redundant midpoint on one edge
    ring = [(0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0),
            (0.0, 0.0)]
    poly = struct.pack("<BIII", 1, 3, 1, len(ring)) + b"".join(
        struct.pack("<2d", x, y) for x, y in ring
    )
    _, parts = K.parse(K.simplify(poly, 0.1))
    assert len(parts[0][0]) == 5  # midpoint gone, ring still closed
    a0, p0 = K.area_perimeter(poly)
    a1, p1 = K.area_perimeter(K.simplify(poly, 0.1))
    assert a1 == a0 and p1 == p0  # collinear removal is lossless here


def test_convex_hull_properties():
    """Hull on analytic + fixture shapes: contains every vertex, is
    convex (all CCW turns), area >= input area."""
    import struct

    import numpy as np

    from gis_etl_spark.fixtures import make_buildings
    from gis_etl_spark.geom import wkb as K

    # plus-sign polygon: hull must be larger and strictly convex
    plus = [(1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (3.0, 1.0), (3.0, 2.0),
            (2.0, 2.0), (2.0, 3.0), (1.0, 3.0), (1.0, 2.0), (0.0, 2.0),
            (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    poly = struct.pack("<BIII", 1, 3, 1, len(plus)) + b"".join(
        struct.pack("<2d", x, y) for x, y in plus
    )
    hulls = [K.convex_hull(poly)]
    buildings, _, _, _ = make_buildings(120, seed=7)
    for b in buildings.geom:
        if b is not None and K.shape_type(b) in (3, 6):
            hulls.append(K.convex_hull(b))
            src = b
    for src_buf, hull in zip([poly] + [
        b for b in buildings.geom if b is not None
        and K.shape_type(b) in (3, 6)
    ], hulls):
        btype, hparts = K.parse(hull)
        if btype != 3:
            continue  # degenerate input → line/point hull
        ring = hparts[0][0][:, :2]
        # convex: every consecutive turn is CCW (strictly, no collinear)
        r = ring[:-1]
        nxt = np.roll(r, -1, axis=0)
        nxt2 = np.roll(r, -2, axis=0)
        cross = (nxt[:, 0] - r[:, 0]) * (nxt2[:, 1] - nxt[:, 1]) - (
            nxt[:, 1] - r[:, 1]
        ) * (nxt2[:, 0] - nxt[:, 0])
        assert (cross > 0).all()
        # contains every input vertex
        _, sparts = K.parse(src_buf)
        pts = np.vstack([rg[:, :2] for rgs in sparts for rg in rgs])
        inside = K.contains_point_batch(
            [hull] * len(pts), pts[:, 0], pts[:, 1]
        )
        on_ring = np.array([
            any(abs(p[0] - v[0]) < 1e-12 and abs(p[1] - v[1]) < 1e-12
                for v in ring)
            for p in pts
        ])
        # boundary points may test outside under the half-open rule
        edge_tol = K.area_perimeter(hull)[1] * 1e-12
        assert all(
            bool(i) or o or _dist_to_ring(p, ring) < max(edge_tol, 1e-9)
            for i, o, p in zip(inside, on_ring, pts)
        )
        ha, _ = K.area_perimeter(hull)
        sa, _ = K.area_perimeter(src_buf)
        # relative tolerance: an already-convex ring re-enters the
        # shoelace in hull vertex order, shifting the sum by ~1 ulp
        assert ha >= sa - 1e-9 * max(1.0, abs(sa))


def _dist_to_ring(p, ring):
    import numpy as np

    best = float("inf")
    for a, b in zip(ring[:-1], ring[1:]):
        seg = b - a
        L2 = float(seg @ seg)
        t = 0.0 if L2 == 0 else max(0.0, min(1.0, float((p - a) @ seg) / L2))
        proj = a + t * seg
        best = min(best, float(np.hypot(*(p - proj))))
    return best


def test_geojson_geometry_roundtrip():
    """from_geojson_geometry ∘ to_geojson_geometry == identity on every
    supported type (bit-exact WKB, little-endian 2-D)."""
    import struct

    from gis_etl_spark.sources.geojson import (
        from_geojson_geometry,
        to_geojson_geometry,
    )

    geoms = [
        struct.pack("<BI2d", 1, 1, 1.5, -2.25),
        struct.pack("<BII", 1, 2, 3)
        + struct.pack("<6d", 0.0, 0.0, 1.0, 1.0, 2.5, -1.0),
        # polygon with hole
        struct.pack("<BIII", 1, 3, 2, 5)
        + struct.pack("<10d", 0, 0, 4, 0, 4, 4, 0, 4, 0, 0)
        + struct.pack("<I", 5)
        + struct.pack("<10d", 1, 1, 1, 2, 2, 2, 2, 1, 1, 1),
        # multipoint
        struct.pack("<BII", 1, 4, 2)
        + struct.pack("<BI2d", 1, 1, 0.0, 1.0)
        + struct.pack("<BI2d", 1, 1, 2.0, 3.0),
        # multilinestring
        struct.pack("<BII", 1, 5, 2)
        + struct.pack("<BII", 1, 2, 2) + struct.pack("<4d", 0, 0, 1, 1)
        + struct.pack("<BII", 1, 2, 2) + struct.pack("<4d", 2, 2, 3, 3),
        # multipolygon
        struct.pack("<BII", 1, 6, 1)
        + struct.pack("<BIII", 1, 3, 1, 4)
        + struct.pack("<8d", 0, 0, 1, 0, 1, 1, 0, 0),
    ]
    for g in geoms:
        assert from_geojson_geometry(to_geojson_geometry(g)) == g


def test_geojsonl_reader_failure_discipline(spark, tmp_path):
    """Malformed GeoJSONSeq lines: on_error='skip' yields auditable
    __corrupt__ rows; the default fails the read loudly."""
    import os

    import pytest as _pytest

    p = str(tmp_path / "mixed.geojsonl")
    good = (
        '{"type":"Feature","geometry":{"type":"Point",'
        '"coordinates":[1.0,2.0]},'
        '"properties":{"building_id":7,"source":"s"}}'
    )
    with open(p, "w") as fh:
        fh.write(good + "\n")
        fh.write("{not json at all\n")
        fh.write(
            '{"type":"Feature","geometry":{"type":"Nonagon",'
            '"coordinates":[]},"properties":{"building_id":8}}\n'
        )

    from gis_etl_spark.sources.geojson import read_geojsonl

    rows = read_geojsonl(spark, p, on_error="skip").collect()
    ok = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(ok) == 1 and ok[0].building_id == 7
    assert len(bad) == 2
    assert all(r.source == "__corrupt__" and r.geom is None for r in bad)

    with _pytest.raises(Exception):
        read_geojsonl(spark, p).collect()


def test_simplify_stats_oracle_per_building_parity():
    """The r10 geo_simplify_stats oracle (bounded-DP interval unroll
    + extreme-point hull census in DuckDB) must agree with the engine
    kernels PER BUILDING — the per-source registry hash only checks
    sums, which could mask cancelling errors."""
    import duckdb

    from gis_etl_spark.fixtures import (
        ensure_buildings,
        ensure_buildings_vertices,
    )
    from gis_etl_spark.ops.geometry_queries import (
        SIMPLIFY_TOL,
        _simplify_stats_sql,
    )

    n_rows = 2_000
    bpath, _ = ensure_buildings(n_rows)
    vpath = ensure_buildings_vertices(n_rows)
    sql = _simplify_stats_sql(
        f"read_parquet('{bpath}')",
        f"read_parquet('{vpath}')",
        per_building=True,
    )
    got = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]))
        for r in duckdb.sql(sql).fetchall()
    }

    import pandas as pd

    b = pd.read_parquet(bpath)
    checked = 0
    for bid, buf in zip(b.building_id, b.geom):
        if buf is None:
            assert int(bid) not in got
            continue
        buf = bytes(buf)
        exp = (
            K.npoints(buf),
            K.npoints(K.simplify(buf, SIMPLIFY_TOL)),
            K.npoints(K.convex_hull(buf)),
        )
        assert got[int(bid)] == exp, (bid, got[int(bid)], exp)
        checked += 1
    assert checked > 1_900
