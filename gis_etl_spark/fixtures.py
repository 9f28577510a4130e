"""Deterministic geometry fixtures (FIXTURES.md §B, seed=42).

Synthesizes the `buildings` table modeling the reference's converted
footprint corpus (east_asia.py:397-398): WKB geometry + provenance +
declared CRS, with the full slice mix from FIXTURES.md B1 — polygons in
the East-Asia envelope, multipolygons, points/linestrings, POLYGON Z in
both ISO and EWKB flag variants, a lat-lon-flipped source file, NULL and
degenerate geometries, and one antimeridian row.

A golden side-table (`buildings_expected`) carries shape_type/centroid/
bbox per row, computed here with plain-Python shoelace loops —
deliberately NOT the engine's numpy kernels — so tests compare two
independent implementations.

Everything is seeded and byte-stable (little-endian, float64), so the
parquet output is reproducible; `ensure_buildings` generates lazily and
is safe to call from both the Spark side and the DuckDB-oracle side.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

FIXTURE_ROOT = os.environ.get(
    "SPARK_GRAFT_FIXTURE_DIR", "/tmp/gis_etl_spark_fixtures"
)

SOURCES = [
    "regionA/city1.pq",
    "regionA/city2.pq",
    "regionB/city1.pq",
    "regionB/city2.pq",
    "regionC/metro.pq",
    "regionC/rural.pq",
    "regionD/coast.pq",
    "regionD/island.pq",
    "regionE/flipped.pq",  # the lat-lon-swapped file (east_asia.py:223-239)
    "regionF/utm.pq",      # epsg 32650 block for st_transform tests
]


def _poly_wkb(ring: list[tuple[float, ...]], z: str | None = None) -> bytes:
    """One-ring polygon WKB. z=None → 2-D; 'iso' → type 1003; 'ewkb' →
    flag 0x80000003 (both appear in the reference's corpus,
    east_asia.py:37)."""
    dims = 2 if z is None else 3
    if z is None:
        word = 3
    elif z == "iso":
        word = 1003
    else:
        word = 3 | 0x80000000
    out = bytearray(struct.pack("<BII", 1, word, 1))
    out += struct.pack("<I", len(ring))
    for pt in ring:
        out += struct.pack(f"<{dims}d", *pt[:dims])
    return bytes(out)


def _multipoly_wkb(rings: list[list[tuple[float, float]]]) -> bytes:
    out = bytearray(struct.pack("<BII", 1, 6, len(rings)))
    for ring in rings:
        out += struct.pack("<BII", 1, 3, 1)
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<2d", x, y)
    return bytes(out)


def _point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BI2d", 1, 1, x, y)


def _line_wkb(pts: list[tuple[float, float]]) -> bytes:
    out = bytearray(struct.pack("<BII", 1, 2, len(pts)))
    for x, y in pts:
        out += struct.pack("<2d", x, y)
    return bytes(out)


def _ring(rng: np.random.Generator, cx: float, cy: float, nv: int, r: float):
    """Closed CCW ring around (cx, cy) — star-convex, never degenerate."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
    radii = rng.uniform(0.4 * r, r, nv)
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    pts = [(float(x), float(y)) for x, y in zip(xs, ys)]
    pts.append(pts[0])
    return pts


# --- independent golden math (plain python, not the engine kernels) -------

def _shoelace(pts) -> tuple[float, float, float]:
    """Signed area + centroid of one ring, translated to the first
    vertex for conditioning (same well-conditioned formulation as the
    engine kernel, implemented independently as plain-Python loops).
    Returns (area, cx, cy); (cx, cy) NaN when area == 0."""
    ox, oy = pts[0][0], pts[0][1]
    a2 = cx6 = cy6 = 0.0
    n = len(pts)
    for i in range(n):
        x0, y0 = pts[i][0] - ox, pts[i][1] - oy
        x1, y1 = pts[(i + 1) % n][0] - ox, pts[(i + 1) % n][1] - oy
        cross = x0 * y1 - x1 * y0
        a2 += cross
        cx6 += (x0 + x1) * cross
        cy6 += (y0 + y1) * cross
    if a2 == 0.0:
        return 0.0, float("nan"), float("nan")
    return a2 / 2.0, ox + cx6 / (3.0 * a2), oy + cy6 / (3.0 * a2)


def _ring_length(pts) -> float:
    """Sequential closed-ring length (plain-Python golden twin of the
    engine's vectorized hypot sum)."""
    tl = 0.0
    n = len(pts)
    for i in range(n):
        x0, y0 = pts[i][0], pts[i][1]
        x1, y1 = pts[(i + 1) % n][0], pts[(i + 1) % n][1]
        tl += ((x1 - x0) ** 2 + (y1 - y0) ** 2) ** 0.5
    return tl


def _golden_poly(
    rings,
) -> tuple[float, float, float, float, float, float, float, float]:
    area = nx = ny = perim = 0.0
    xs, ys = [], []
    for ring in rings:
        a, gx, gy = _shoelace(ring)
        if a != 0.0:
            area += a
            nx += a * gx
            ny += a * gy
        perim += _ring_length(ring)
        xs += [p[0] for p in ring]
        ys += [p[1] for p in ring]
    if area == 0.0:
        cx, cy = sum(xs) / len(xs), sum(ys) / len(ys)
    else:
        cx, cy = nx / area, ny / area
    return cx, cy, min(xs), min(ys), max(xs), max(ys), abs(area), perim


def make_buildings(
    n: int, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """→ (buildings, buildings_expected, buildings_edges) pandas
    frames, FIXTURES.md B1. The edges frame (r8) lists every AREAL
    ring edge (building_id, x1, y1, x2, y2) straight from the
    pre-WKB ring arrays — an independent side-table that lets the
    DuckDB oracle run the even-odd crossing test itself (WKB float64
    coords roundtrip bit-exactly, so these are the same numbers the
    engine kernel sees)."""
    rng = np.random.default_rng(seed)
    rows = []
    golden = []
    edge_rows: list[tuple[int, float, float, float, float]] = []
    # r10: full ordered vertex side-table (every geometry kind, ring
    # closing duplicates included) — lets the DuckDB oracle run
    # vertex-walk algorithms (Douglas-Peucker, convex hull, per-vertex
    # reprojection) itself. Same independence argument as edges: these
    # are the pre-WKB float64s, bit-equal to what the engine decodes.
    vert_rows: list[tuple[int, int, int, float, float, bool]] = []

    def add(bid, geom, source, epsg, stype, cx, cy, bb, rings=None,
            verts=None):
        # bb = (xmin, ymin, xmax, ymax, area, perim) — _golden_poly
        # emits all six; point/line/degenerate branches append their
        # analytic area/length
        rows.append((bid, geom, source, epsg))
        golden.append(
            (bid, stype, cx, cy, *(bb if bb else (None,) * 6))
        )
        for ring in rings or ():
            for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
                edge_rows.append(
                    (bid, float(x1), float(y1), float(x2), float(y2))
                )
        for pi, ring in enumerate(rings or ()):
            for vi, (vx, vy) in enumerate(ring):
                vert_rows.append(
                    (bid, pi, vi, float(vx), float(vy), True)
                )
        for vi, (vx, vy) in enumerate(verts or ()):
            vert_rows.append((bid, 0, vi, float(vx), float(vy), False))

    for i in range(n):
        u = rng.uniform()
        lon = float(rng.uniform(73, 146))
        lat = float(rng.uniform(18, 46))
        src = SOURCES[int(rng.integers(0, 8))]
        if u < 0.85:  # core polygon
            ring = _ring(rng, lon, lat, int(rng.integers(4, 13)), 0.005)
            cx, cy, *bb = _golden_poly([ring])
            add(i, _poly_wkb(ring), src, 4326, 3, cx, cy, bb,
                rings=[ring])
        elif u < 0.90:  # multipolygon
            nparts = int(rng.integers(2, 4))
            rings = [
                _ring(
                    rng,
                    lon + float(rng.uniform(-0.05, 0.05)),
                    lat + float(rng.uniform(-0.05, 0.05)),
                    int(rng.integers(4, 9)),
                    0.004,
                )
                for _ in range(nparts)
            ]
            cx, cy, *bb = _golden_poly(rings)
            add(i, _multipoly_wkb(rings), src, 4326, 6, cx, cy, bb,
                rings=rings)
        elif u < 0.915:  # point
            add(i, _point_wkb(lon, lat), src, 4326, 1, lon, lat,
                (lon, lat, lon, lat, 0.0, 0.0), verts=[(lon, lat)])
        elif u < 0.93:  # linestring
            pts = [
                (lon + float(rng.uniform(-0.01, 0.01)),
                 lat + float(rng.uniform(-0.01, 0.01)))
                for _ in range(int(rng.integers(2, 6)))
            ]
            num_x = num_y = tl = 0.0
            for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
                ln = ((x1 - x0) ** 2 + (y1 - y0) ** 2) ** 0.5
                num_x += (x0 + x1) / 2 * ln
                num_y += (y0 + y1) / 2 * ln
                tl += ln
            cx = num_x / tl if tl else sum(p[0] for p in pts) / len(pts)
            cy = num_y / tl if tl else sum(p[1] for p in pts) / len(pts)
            add(i, _line_wkb(pts), src, 4326, 2, cx, cy,
                (min(p[0] for p in pts), min(p[1] for p in pts),
                 max(p[0] for p in pts), max(p[1] for p in pts),
                 0.0, tl), verts=pts)
        elif u < 0.96:  # POLYGON Z — ISO and EWKB variants, filtered by P4
            ring2d = _ring(rng, lon, lat, 5, 0.004)
            ring3d = [(x, y, float(rng.uniform(0, 50))) for x, y in ring2d]
            variant = "iso" if rng.uniform() < 0.5 else "ewkb"
            cx, cy, *bb = _golden_poly([[(p[0], p[1]) for p in ring3d]])
            add(i, _poly_wkb(ring3d, z=variant), src, 4326, 3, cx, cy, bb,
                rings=[[(p[0], p[1]) for p in ring3d]])
        elif u < 0.98:  # flipped source file: x↔y swapped at rest
            ring = _ring(rng, lon, lat, 6, 0.005)
            flipped = [(y, x) for x, y in ring]
            cx, cy, *bb = _golden_poly([flipped])
            add(i, _poly_wkb(flipped), "regionE/flipped.pq", 4326, 3,
                cx, cy, bb, rings=[flipped])
        elif u < 0.99:  # NULL / degenerate
            if rng.uniform() < 0.5:
                add(i, None, src, 4326, None, None, None, None)
            else:
                ring = [(lon, lat), (lon, lat), (lon, lat), (lon, lat)]
                add(i, _poly_wkb(ring), src, 4326, 3, lon, lat,
                    (lon, lat, lon, lat, 0.0, 0.0), rings=[ring])
        else:  # UTM-declared block (epsg 32650, regionF)
            e = float(rng.uniform(200_000, 800_000))
            nn = float(rng.uniform(2_000_000, 5_000_000))
            ring = _ring(rng, e, nn, 6, 500.0)
            cx, cy, *bb = _golden_poly([ring])
            add(i, _poly_wkb(ring), "regionF/utm.pq", 32650, 3, cx, cy, bb,
                rings=[ring])

    # one antimeridian straddler (FIXTURES B1 last slice)
    ring = [(179.9, 30.0), (180.1, 30.0), (180.1, 30.1), (179.9, 30.1),
            (179.9, 30.0)]
    cx, cy, *bb = _golden_poly([ring])
    add(n, _poly_wkb(ring), "regionD/island.pq", 4326, 3, cx, cy, bb,
        rings=[ring])

    buildings = pd.DataFrame(
        rows, columns=["building_id", "geom", "source", "epsg"]
    ).astype({"building_id": "int64"})
    expected = pd.DataFrame(
        golden,
        columns=["building_id", "shape_type", "cx", "cy",
                 "xmin", "ymin", "xmax", "ymax", "area", "perim"],
    ).astype({"building_id": "int64"})
    edges = pd.DataFrame(
        edge_rows, columns=["building_id", "x1", "y1", "x2", "y2"]
    ).astype({"building_id": "int64"})
    vertices = pd.DataFrame(
        vert_rows, columns=["building_id", "part", "idx", "x", "y",
                            "closed"]
    ).astype({"building_id": "int64", "part": "int32", "idx": "int32"})
    return buildings, expected, edges, vertices


def rows_for_sf(sf_dir: str) -> int:
    """FIXTURES.md B1 scale ladder keyed off the driver's sf dir name."""
    base = os.path.basename(sf_dir.rstrip("/"))
    table = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}
    return table.get(base, 20_000)


# bump when generation logic changes: a stale on-disk fixture from an
# older algorithm must never be reused against new oracle SQL
_BUILDINGS_VERSION = 3


def buildings_path(n_rows: int) -> str:
    return os.path.join(
        FIXTURE_ROOT, f"buildings_v{_BUILDINGS_VERSION}_{n_rows}"
    )


def ensure_documents_aug(seed: int = 42) -> str:
    """Documents table with injected duplicates for the dedup operators.

    The driver's `documents` table has no exact duplicates, so dedup
    queries over it would be vacuously empty. This fixture = the sf0.01
    documents (fixed source — the oracle SQL embeds the path) plus:
      - 60 exact duplicates   (doc_id 100000+i, source 'dup_exact')
      - 60 near duplicates    (doc_id 200000+i, ~12% of word positions
                               replaced with seeded vocabulary picks,
                               source 'dup_near')
    Deterministic (seed 42); lang copied from the original, n_chars
    recomputed.
    """
    out = os.path.join(FIXTURE_ROOT, "documents_aug", "documents_aug.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    src = pd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    rng = np.random.default_rng(seed)
    vocab = sorted({w for t in src.text for w in t.split()})
    rows = [src]

    exact = src.iloc[[(i * 7) % len(src) for i in range(60)]].copy()
    exact["doc_id"] = [100000 + i for i in range(60)]
    exact["source"] = "dup_exact"
    rows.append(exact)

    near_rows = []
    for i in range(60):
        base = src.iloc[(i * 11) % len(src)]
        words = base.text.split()
        n_swap = max(1, int(0.12 * len(words)))
        idx = rng.choice(len(words), size=n_swap, replace=False)
        for j in idx:
            words[j] = vocab[int(rng.integers(0, len(vocab)))]
        text = " ".join(words)
        near_rows.append(
            (200000 + i, text, base.lang, "dup_near", len(text))
        )
    rows.append(
        pd.DataFrame(
            near_rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
    )
    aug = pd.concat(rows, ignore_index=True)
    tmp = out + ".tmp"
    aug.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return out


def ensure_buildings_attrs(n_rows: int = 20_000, seed: int = 42) -> str:
    """ORNL-style wide table (FIXTURES.md B2): buildings plus ~6
    attribute columns, modeling the `SELECT * EXCLUDE(Shape), Shape
    geom` projection input (ORNL-FEMA-Buildings.md:80-81)."""
    out = os.path.join(
        FIXTURE_ROOT, f"buildings_attrs_{n_rows}", "buildings_attrs.parquet"
    )
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    bpath, _ = ensure_buildings(n_rows, seed)
    base = pd.read_parquet(bpath)
    rng = np.random.default_rng(seed + 1)
    n = len(base)
    occ = np.array(["RES", "COM", "IND", "AGR", "GOV"])
    attrs = pd.DataFrame(
        {
            "occ_cls": occ[rng.integers(0, len(occ), n)],
            "prim_occ": rng.integers(1, 20, n).astype("int32"),
            "height": np.round(rng.uniform(2.5, 120.0, n), 2),
            "sqmeters": np.round(rng.uniform(20.0, 5000.0, n), 2),
            "prop_st": np.array(["ST%02d" % s for s in rng.integers(1, 57, n)]),
            "fips": np.array(["%05d" % f for f in rng.integers(1000, 99999, n)]),
        }
    )
    wide = pd.concat(
        [base.rename(columns={"geom": "Shape"}), attrs], axis=1
    )
    tmp = out + ".tmp"
    wide.to_parquet(tmp, index=False, row_group_size=15_000)
    os.replace(tmp, out)
    return out


def ensure_filegdb(n_rows: int = 20_000, seed: int = 42) -> tuple[str, str]:
    """FileGDB fixture (S3, ORNL-FEMA-Buildings.md:76-81): the wide
    attrs table written as a real spec-subset .gdbtable layer inside a
    .gdb directory, alongside two small decoy members so the
    reference's largest-member selection (`ls -S | head -1`) has
    something to choose FROM, plus a parquet twin (attributes only —
    geometry is quantized by the format's scaled-int encoding and is
    pytest-checked approximately instead). Returns (gdb_dir, twin)."""
    root = os.path.join(FIXTURE_ROOT, f"filegdb_{n_rows}", "buildings.gdb")
    twin = os.path.join(os.path.dirname(root), "twin.parquet")
    if os.path.exists(twin):
        return root, twin
    os.makedirs(root, exist_ok=True)
    from gis_etl_spark.geom import wkb as K
    from gis_etl_spark.sources import filegdb as FG

    wide = pd.read_parquet(ensure_buildings_attrs(n_rows, seed))
    fields = [
        FG.Field("OBJECTID", FG.T_OBJECTID),
        FG.Field("occ_cls", FG.T_STRING),
        FG.Field("prim_occ", FG.T_INT32),
        FG.Field("height", FG.T_FLOAT64),
        FG.Field("sqmeters", FG.T_FLOAT64),
        FG.Field("prop_st", FG.T_STRING),
        FG.Field("fips", FG.T_STRING),
        FG.Field("Shape", FG.T_GEOMETRY),
    ]
    rows, twin_rows = [], []
    for r in wide.itertuples():
        if r.Shape is None:
            continue
        try:
            base, parts = K.parse(bytes(r.Shape))
        except ValueError:
            continue
        if base == K.POLYGON:
            geom = (5, [ring[:, :2] for ring in parts[0]])
        elif base == K.POINT:
            geom = (1, tuple(parts[0][0][0, :2]))
        else:
            continue
        rows.append(
            (r.occ_cls, int(r.prim_occ), float(r.height),
             float(r.sqmeters), r.prop_st, r.fips, geom)
        )
        twin_rows.append(
            (len(rows), r.occ_cls, int(r.prim_occ), float(r.height),
             float(r.sqmeters), r.prop_st, r.fips, bytes(r.Shape))
        )
    FG.write_gdbtable(
        os.path.join(root, "a00000009.gdbtable"), fields, rows,
        FG.GEOM_POLYGON,
    )
    # decoy system members (smaller, so never the largest)
    meta = [FG.Field("OBJECTID", FG.T_OBJECTID),
            FG.Field("name", FG.T_STRING)]
    FG.write_gdbtable(
        os.path.join(root, "a00000001.gdbtable"), meta,
        [("GDB_SystemCatalog",)], FG.GEOM_NONE,
    )
    FG.write_gdbtable(
        os.path.join(root, "a00000004.gdbtable"), meta,
        [("GDB_Items",)], FG.GEOM_NONE,
    )
    twin_df = pd.DataFrame(
        twin_rows,
        columns=["objectid", "occ_cls", "prim_occ", "height",
                 "sqmeters", "prop_st", "fips", "orig_wkb"],
    )
    twin_df.to_parquet(twin + ".tmp", index=False)
    os.replace(twin + ".tmp", twin)
    return root, twin


def ensure_shape_stats_ndjson(n_rows: int = 20_000, seed: int = 42) -> str:
    """NDJSON diagnostic fixture (FIXTURES.md B3, shape_stats.json —
    east_asia.py:369-372): per-(shape_type, filename) record counts,
    one JSON object per line, computed with plain Python byte peeks
    (independent of the engine's census pipeline)."""
    out = os.path.join(FIXTURE_ROOT, f"shape_stats_{n_rows}", "shape_stats.json")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    bpath, _ = ensure_buildings(n_rows, seed)
    df = pd.read_parquet(bpath, columns=["geom", "source"])
    counts: dict[tuple[int, str], int] = {}
    for g, s in zip(df.geom, df.source):
        if g is None:
            continue
        key = (int(g[1]), s)
        counts[key] = counts.get(key, 0) + 1
    import json as _json

    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        for (st, fn), c in sorted(counts.items()):
            fh.write(
                _json.dumps(
                    {"shape_type": st, "filename": fn, "num_recs": c}
                )
                + "\n"
            )
    os.replace(tmp, out)
    return out


def ensure_wkt_csv(n_rows: int = 2_000, seed: int = 42) -> str:
    """CSV-with-header fixture (S4/K5, east_asia.py:57-74): WKT text
    rows as the reference's temp-CSV re-ingestion path produces."""
    out = os.path.join(FIXTURE_ROOT, f"wkt_csv_{n_rows}", "geoms.csv")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    bpath, _ = ensure_buildings(n_rows, seed)
    df = pd.read_parquet(bpath, columns=["building_id", "geom"])
    from gis_etl_spark.geom import wkb as K

    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("building_id,wkt\n")
        for bid, g in zip(df.building_id, df.geom):
            if g is None:
                continue
            try:
                wkt = K.to_wkt(K.force_2d(bytes(g)))
            except ValueError:
                continue
            fh.write(f'{bid},"{wkt}"\n')
    os.replace(tmp, out)
    return out


def ensure_shapefiles(n_rows: int = 5_000, seed: int = 42) -> tuple[str, str]:
    """Shapefile corpus fixture: the buildings geometries written as
    real .shp/.shx files (one per source, like the reference's
    358-file corpus) plus a parquet twin carrying the same features so
    the DuckDB oracle can check the shapefile SCAN without parsing
    shapefiles. Returns (shp_dir, twin_parquet_path)."""
    root = os.path.join(FIXTURE_ROOT, f"shapefiles_{n_rows}")
    twin = os.path.join(root, "twin.parquet")
    if os.path.exists(twin):
        return root, twin
    os.makedirs(root, exist_ok=True)
    from gis_etl_spark.geom import wkb as K
    from gis_etl_spark.sources.shapefile import write_shp

    bpath, _ = ensure_buildings(n_rows, seed)
    df = pd.read_parquet(bpath)
    twin_rows = []
    by_source: dict[str, list] = {}
    for row in df.itertuples():
        if row.geom is None:
            continue
        base, parts = None, None
        try:
            base, parts = K.parse(bytes(row.geom))
        except ValueError:
            continue
        # writer handles single-part shapes; keep polygons with one
        # ring, points, and linestrings (the corpus majority)
        if base == K.POLYGON and len(parts[0]) == 1:
            shp = (5, parts[0][0][:, :2])
        elif base == K.POINT:
            shp = (1, parts[0][0][0, :2])
        elif base == K.LINESTRING:
            shp = (3, parts[0][0][:, :2])
        else:
            continue
        by_source.setdefault(row.source, []).append(shp)
        twin_rows.append((row.source, shp[0]))
    for src, shapes in by_source.items():
        fname = src.replace("/", "_").replace(".pq", "") + ".shp"
        write_shp(os.path.join(root, fname), shapes)
    twin_df = pd.DataFrame(twin_rows, columns=["source", "esri_type"])
    twin_df.to_parquet(twin + ".tmp", index=False)
    os.replace(twin + ".tmp", twin)
    return root, twin


def ensure_shapefile_single(n_rows: int = 100_000, seed: int = 42) -> str:
    """ONE big .shp (+ .shx) carrying the whole buildings corpus — the
    single-nationwide-file shape that exercises read_shapefile's
    intra-file chunked scan (r8): without chunking this file is one
    serial task no matter the cluster. Returns the .shp path."""
    root = os.path.join(FIXTURE_ROOT, f"shp_single_{n_rows}")
    single = os.path.join(root, "all.shp")
    if os.path.exists(single):
        return single
    os.makedirs(root, exist_ok=True)
    from gis_etl_spark.geom import wkb as K
    from gis_etl_spark.sources.shapefile import write_shp

    bpath, _ = ensure_buildings(n_rows, seed)
    df = pd.read_parquet(bpath)
    shapes = []
    for row in df.itertuples():
        if row.geom is None:
            continue
        try:
            base, parts = K.parse(bytes(row.geom))
        except ValueError:
            continue
        if base == K.POLYGON and len(parts[0]) == 1:
            shapes.append((5, parts[0][0][:, :2]))
        elif base == K.POINT:
            shapes.append((1, parts[0][0][0, :2]))
        elif base == K.LINESTRING:
            shapes.append((3, parts[0][0][:, :2]))
    # write_shp(X) drops the index at X[:-4] + ".shx": with
    # X = "all.shp.tmp" that is "all.shp.shx" — move both into place,
    # index FIRST so the .shp's existence (the ensure guard) implies a
    # complete pair
    write_shp(single + ".tmp", shapes)
    os.replace(single + ".shx", single[:-4] + ".shx")
    os.replace(single + ".tmp", single)
    return single


MEDIA_MAGIC = b"FAKE"


def _encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP, per the
    public layout. Written with struct only — deliberately independent
    of ops.multimodal.decode_bmp so the fixture is a positive control
    for the decoder, not its mirror."""
    h, w, _ = px.shape
    row_size = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_size - w * 3)
    body = b"".join(
        px[r, :, ::-1].tobytes() + pad for r in range(h - 1, -1, -1)
    )
    data_off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0,
                           data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


def _encode_png(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 8-bit truecolor non-interlaced PNG, per
    the public layout (RFC 2083). The FORWARD direction of the spec —
    filters applied per scanline, cycling through all five filter
    types (row r uses type r % 5) so a decoder must invert every one —
    deliberately independent of ops.multimodal.decode_png, which
    implements the reverse direction."""
    import zlib as _zlib

    h, w, _ = px.shape
    stride = w * 3
    flat = px.reshape(h, stride).astype(np.int32)
    lines = []
    for r in range(h):
        ft = r % 5
        cur = flat[r]
        prev = flat[r - 1] if r > 0 else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([[0, 0, 0], cur[:-3]])
        ul = np.concatenate([[0, 0, 0], prev[:-3]])
        if ft == 0:
            filt = cur
        elif ft == 1:  # Sub
            filt = (cur - left) & 255
        elif ft == 2:  # Up
            filt = (cur - prev) & 255
        elif ft == 3:  # Average
            filt = (cur - ((left + prev) >> 1)) & 255
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = (cur - pred) & 255
        lines.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
    idat = _zlib.compress(b"".join(lines), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, ch) int16 → PCM16 RIFF/WAVE bytes (canonical 44-byte
    header), independent of ops.multimodal.decode_wav."""
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


# --- independent baseline JPEG encoder (ITU-T T.81, forward direction) ----
#
# The FORWARD half of the public JPEG spec — float FDCT, quantization,
# canonical-Huffman entropy coding, optional restart intervals — written
# here so the engine's decoder (ops/jpeg.py, the REVERSE direction) has a
# positive control it shares no code with. JPEG is lossy, so unlike the
# PNG/BMP fixtures the content goldens cannot be the pre-encode pixels:
# the encoder keeps its quantized coefficients and derives the golden
# from them via _jpeg_reconstruct, a LOOP-WRITTEN implementation of the
# integer-exact reconstruction spec documented in ops/jpeg.py (fixed-
# point IDCT, replication upsample, BT.601 fixed point). decode_jpeg
# must reproduce that array byte-for-byte.

# quantization tables in the shape of ITU T.81 Annex K.1 (the exact
# values are an encoder choice — whatever is written in DQT is what the
# decoder must use; these keep quality visually reasonable)
_JQ_LUMA = [
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
]
_JQ_CHROMA = [
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
]

# canonical Huffman table definitions (bits[1..16], values) — custom
# tables covering every symbol the baseline scan can emit, constructed
# so no code is all ones (T.81 convention). DC: 12 category symbols over
# lengths 3-5; AC: all 162 run/size symbols over lengths 8-9.
_JH_DC_BITS = [0, 0, 4, 6, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JH_DC_VALS = bytes(range(12))
_JH_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 34, 0, 0, 0, 0, 0, 0, 0]
_JH_AC_VALS = bytes(
    [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0]
)


def _jpeg_zigzag_positions() -> list:
    """(row, col) of the k-th zigzag coefficient, derived from the
    diagonal-walk definition (independent of ops.jpeg.ZIGZAG)."""
    out = []
    for s in range(15):
        diag = [(r, s - r) for r in range(s + 1)]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        out.extend((r, c) for r, c in diag if r < 8 and c < 8)
    return out


def _jpeg_huff_codes(bits: list, vals: bytes) -> dict:
    """symbol -> (code, length) per the T.81 annex-C canonical
    construction."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF -> 0xFF 0x00 byte stuffing;
    pads with 1-bits to a byte boundary (scan end / before RSTn)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _jpeg_subsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Box-filter chroma downsample by integer factors with edge
    padding; rounded to int."""
    if fx == 1 and fy == 1:
        return np.rint(plane).astype(np.int32)
    H, W = plane.shape
    p = np.pad(plane, ((0, -H % fy), (0, -W % fx)), mode="edge")
    q = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
        axis=(1, 3)
    )
    return np.rint(q).astype(np.int32)


def _encode_jpeg(
    px: np.ndarray, mode: str = "444", restart: int = 0
) -> tuple[bytes, np.ndarray]:
    """(h, w, 3) uint8 RGB -> (baseline JPEG bytes, reconstruction
    golden). mode: 'gray' (1 component) | '444' | '422' | '420';
    restart > 0 writes a DRI segment and RSTn markers every `restart`
    MCUs. The golden is the byte-exact array decode_jpeg must return,
    computed by the loop-based _jpeg_reconstruct from the quantized
    coefficients this encoder transmits."""
    import math

    h, w, _ = px.shape
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if mode == "gray":
        comps = [(1, 1, 1, 0)]  # (cid, hs, vs, qtab)
        full = [yy]
    else:
        sub = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[mode]
        comps = [(1, sub[0], sub[1], 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        full = [yy, cb, cr]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # float DCT-II basis (forward side only — the decoder never sees it)
    cosm = np.array(
        [
            [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
            for u in range(8)
        ]
    )
    cu = np.array([1 / math.sqrt(2)] + [1.0] * 7)
    qts = [_JQ_LUMA, _JQ_CHROMA]
    zzpos = _jpeg_zigzag_positions()

    comp_zz: list[list[list[int]]] = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        plane = _jpeg_subsample(full[ci], hmax // hs, vmax // vs)
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        plane = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        ).astype(np.float64) - 128.0
        q = np.array(qts[tq], dtype=np.float64)
        zzs: list[list[int]] = []
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(vs):
                    for bx in range(hs):
                        blk = plane[
                            (my * vs + by) * 8 : (my * vs + by) * 8 + 8,
                            (mx * hs + bx) * 8 : (mx * hs + bx) * 8 + 8,
                        ]
                        S = 0.25 * (cu[:, None] * cu[None, :]) * (
                            cosm @ blk @ cosm.T
                        )
                        # cosm @ blk contracts over x; the outer product
                        # with cosm.T over y — S[u, v] per the spec
                        qz = np.rint(S / q).astype(np.int64)
                        zzs.append([int(qz[r_, c_]) for r_, c_ in zzpos])
        comp_zz.append(zzs)

    # --- entropy coding -----------------------------------------------------
    dc_codes = _jpeg_huff_codes(_JH_DC_BITS, _JH_DC_VALS)
    ac_codes = _jpeg_huff_codes(_JH_AC_BITS, _JH_AC_VALS)
    jw = _JpegBitWriter()
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    per_mcu = [c[1] * c[2] for c in comps]
    rst = 0
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            jw.pad()
            jw.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = [0] * len(comps)
        for ci in range(len(comps)):
            for bi in range(per_mcu[ci]):
                zz = comp_zz[ci][m * per_mcu[ci] + bi]
                diff = zz[0] - pred[ci]
                pred[ci] = zz[0]
                t = abs(diff).bit_length()
                code, ln = dc_codes[t]
                jw.put(code, ln)
                if t:
                    jw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
                last = 0
                for k in range(1, 64):
                    if zz[k]:
                        last = k
                run = 0
                for k in range(1, last + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        jw.put(code, ln)
                        run -= 16
                    s = abs(zz[k]).bit_length()
                    code, ln = ac_codes[(run << 4) | s]
                    jw.put(code, ln)
                    v = zz[k]
                    jw.put(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, ln = ac_codes[0x00]
                    jw.put(code, ln)
    jw.pad()

    # --- marker assembly ----------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_luma = bytes(_JQ_LUMA[r_][c_] for r_, c_ in zzpos)
    zz_chroma = bytes(_JQ_CHROMA[r_][c_] for r_, c_ in zzpos)
    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += seg(0xDB, bytes([0x00]) + zz_luma)
    if mode != "gray":
        out += seg(0xDB, bytes([0x01]) + zz_chroma)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(_JH_DC_BITS) + _JH_DC_VALS
    dht += bytes([0x10]) + bytes(_JH_AC_BITS) + _JH_AC_VALS
    if mode != "gray":
        # chroma gets its own table ids (same layout) so the decoder's
        # per-component table selection is actually exercised
        dht += bytes([0x01]) + bytes(_JH_DC_BITS) + _JH_DC_VALS
        dht += bytes([0x11]) + bytes(_JH_AC_BITS) + _JH_AC_VALS
    out += seg(0xC4, dht)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for ci, (cid, _hs, _vs, _tq) in enumerate(comps):
        tid = 0 if ci == 0 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += jw.out
    out += b"\xff\xd9"

    recon = _jpeg_reconstruct(comp_zz, comps, qts, mcux, mcuy, h, w)
    return bytes(out), recon


def _jpeg_reconstruct(
    comp_zz, comps, qts, mcux: int, mcuy: int, h: int, w: int
) -> np.ndarray:
    """LOOP-WRITTEN reconstruction of the integer-exact spec documented
    in ops/jpeg.py — dequantize, fixed-point IDCT ((raw + 2^37) >> 38,
    +128, clip), replication upsample, BT.601 fixed-point upconvert —
    deliberately sharing no code with the engine's vectorized decoder.
    decode_jpeg(payload) must equal this array byte-for-byte."""
    import math

    K = [
        [
            round(
                (1 / math.sqrt(2) if u == 0 else 1.0)
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * (1 << 18)
            )
            for x in range(8)
        ]
        for u in range(8)
    ]
    zzpos = _jpeg_zigzag_positions()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        q = qts[tq]
        plane = [[0] * (mcux * hs * 8) for _ in range(mcuy * vs * 8)]
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_zz[ci][i]
                        i += 1
                        S = [[0] * 8 for _ in range(8)]
                        for k in range(64):
                            r_, c_ = zzpos[k]
                            S[r_][c_] = zz[k] * q[r_][c_]
                        tmp = [
                            [
                                sum(S[u][v] * K[v][y] for v in range(8))
                                for y in range(8)
                            ]
                            for u in range(8)
                        ]
                        for x in range(8):
                            row = plane[(my * vs + by) * 8 + x]
                            for y in range(8):
                                raw = sum(
                                    K[u][x] * tmp[u][y] for u in range(8)
                                )
                                val = ((raw + (1 << 37)) >> 38) + 128
                                row[(mx * hs + bx) * 8 + y] = min(
                                    255, max(0, val)
                                )
        fy, fx = vmax // vs, hmax // hs
        planes.append(
            [
                [plane[yy // fy][xx // fx] for xx in range(w)]
                for yy in range(h)
            ]
        )
    out = [[[0, 0, 0] for _ in range(w)] for _ in range(h)]
    if len(planes) == 1:
        for yy in range(h):
            for xx in range(w):
                v = planes[0][yy][xx]
                out[yy][xx] = [v, v, v]
        return np.array(out, dtype=np.uint8)
    for yy in range(h):
        for xx in range(w):
            Y = planes[0][yy][xx]
            Cb = planes[1][yy][xx] - 128
            Cr = planes[2][yy][xx] - 128
            r_ = Y + ((91881 * Cr + 32768) >> 16)
            g_ = Y - ((22554 * Cb + 46802 * Cr + 32768) >> 16)
            b_ = Y + ((116130 * Cb + 32768) >> 16)
            out[yy][xx] = [
                min(255, max(0, r_)),
                min(255, max(0, g_)),
                min(255, max(0, b_)),
            ]
    return np.array(out, dtype=np.uint8)


def _ahash64_reference(px) -> int:
    """Independent (pure-Python, loop-based) average-hash: sum-gray the
    pixels, 8x8 block means vs the global mean by exact integer
    cross-multiplication, one bit per block, packed little-endian into
    a signed 64-bit value. Kept deliberately loop-written so the
    engine's vectorized twin (ops.multimodal.ahash64) is verified
    against a different code path of the same public aHash spec.

    The cross-multiplied compare makes the hash EXACTLY invariant to a
    uniform brightness shift c (no clipping): both sides of
    blocksum*total_cnt > totalsum*block_cnt gain the identical
    c*block_cnt*total_cnt term."""
    h = len(px)
    w = len(px[0])
    bs = [0] * 64
    bc = [0] * 64
    total = 0
    for y in range(h):
        by = y * 8 // h
        for x in range(w):
            g = int(px[y][x][0]) + int(px[y][x][1]) + int(px[y][x][2])
            k = by * 8 + (x * 8 // w)
            bs[k] += g
            bc[k] += 1
            total += g
    tc = h * w
    out = 0
    for k in range(64):
        if bs[k] * tc > total * bc[k]:
            out |= 1 << k
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def ensure_media(n_rows: int = 2_000, seed: int = 42) -> str:
    """Multimodal fixture (SURVEY.md §2.11): REAL binary payloads +
    typed metadata + content goldens.

    - image: 16-64 px per side, format cycling by media_id % 3 —
      uncompressed 24-bit BMP, 8-bit truecolor PNG (all five scanline
      filter types), and v6: baseline JPEG (ITU T.81) cycling through
      grayscale / 4:4:4 / 4:2:2 / 4:2:0 sampling with restart
      intervals on half the images. JPEG is lossy, so its goldens
      (content/ds2/ahash) are computed on the RECONSTRUCTED pixels —
      the loop-based _jpeg_reconstruct output the decoder must
      reproduce byte-exactly — not the pre-encode array;
    - audio: PCM16 RIFF/WAVE (public spec), 1-2 ch, 256-2048 samples,
      sample_rate a multiple of 100 (stored width = rate // 100);
    - video: the 13-byte 'FAKE' container (real video needs codec
      libraries — documented deviation), random body bytes.

    Besides header metadata (width/height/channels/n_frames/n_bytes),
    each row stores `fmt` (container format string, the oracle's
    format-diversity column), `content_units` and `content_sum` — the
    pixel count + RGB byte sum (image), sample count + |amplitude| sum
    (audio), or body byte count + sum (video) — computed HERE by the
    encoder, so the engine's numpy decoders are verified content-exact
    by the DuckDB oracle, not just header-exact.
    """
    # v7: also writes media_audio_samples.parquet — the per-index
    # channel-summed PCM amplitudes straight from the pre-encode
    # arrays (PCM16 is lossless, so these are bit-equal to what the
    # engine's decode_wav + channel mix produces) — the DuckDB
    # oracle's input for the direct-DFT spectral twin.
    root = os.path.join(FIXTURE_ROOT, f"media_{n_rows}_v7")
    out = os.path.join(root, "media.parquet")
    spath = os.path.join(root, "media_audio_samples.parquet")
    if os.path.exists(out) and os.path.exists(spath):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    sample_rows: list[tuple[int, int, int]] = []
    img_bank: list[np.ndarray] = []  # originals eligible for duplication
    for i in range(n_rows):
        kind = kinds[int(rng.integers(0, 3))]
        ahash = None
        fmt = "fake"
        if kind == "image":
            # v5+: ~20% of images duplicate an earlier one — half as an
            # exact pixel copy (format still follows the id's cycle, so
            # a BMP image can recur as a PNG or JPEG: cross-format dups
            # are real), half uniformly brightness-shifted (aHash-equal
            # by the cross-multiplication invariance for the lossless
            # formats, content-sum-different). Originals draw pixels in
            # [0, 200) to leave shift headroom without clipping.
            mode = int(rng.integers(0, 100))
            if img_bank and mode < 20:
                src = img_bank[int(rng.integers(0, len(img_bank)))]
                if mode < 10:
                    px = src.copy()
                else:
                    c = int(rng.integers(1, 256 - int(src.max())))
                    px = (src.astype(np.int16) + c).astype(np.uint8)
                h, w = px.shape[:2]
            else:
                w, h = int(rng.integers(16, 65)), int(rng.integers(16, 65))
                px = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
                img_bank.append(px)
            # three real public image formats, each decoded
            # content-exactly by the engine's numpy decoders
            fmt = ("bmp", "png", "jpg")[i % 3]
            if fmt == "png":
                payload = _encode_png(px)
                gold = px
            elif fmt == "bmp":
                payload = _encode_bmp(px)
                gold = px
            else:
                jmode = ("gray", "444", "422", "420")[(i // 3) % 4]
                jrst = 2 if (i // 3) % 2 == 0 else 0
                payload, gold = _encode_jpeg(px, jmode, jrst)
            ch, nf = 3, 1
            units, csum = gold.size, int(gold.sum(dtype=np.int64))
            ahash = _ahash64_reference(gold.tolist())
            # 2× nearest-neighbor downsample golden, computed on the
            # DECODED-reference array (pre-encode for the lossless
            # formats, loop-reconstruction for JPEG): verifying it
            # forces decode → resize to reproduce every sampled byte
            ds = gold[::2, ::2]
            ds_units, ds_sum = ds.size, int(ds.sum(dtype=np.int64))
        elif kind == "audio":
            rate = int(rng.integers(80, 481)) * 100
            ch = int(rng.integers(1, 3))
            n = int(rng.integers(256, 2049))
            samples = rng.integers(
                -32768, 32768, size=(n, ch), dtype=np.int16
            )
            payload = _encode_wav(samples, rate)
            fmt = "wav"
            mono = samples.astype(np.int64).sum(axis=1)
            for j, mv in enumerate(mono):
                sample_rows.append((i, j, int(mv)))
            w, h, nf = rate // 100, 0, n
            units = samples.size
            csum = int(np.abs(samples.astype(np.int64)).sum())
            ds = samples[::2]
            ds_units = ds.size
            ds_sum = int(np.abs(ds.astype(np.int64)).sum())
        else:
            w, h, ch, nf = (
                int(rng.integers(160, 1920)), int(rng.integers(90, 1080)),
                3, int(rng.integers(24, 2400)),
            )
            body = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                dtype=np.uint8)
            payload = (
                MEDIA_MAGIC + struct.pack("<HHBI", w, h, ch, nf)
                + body.tobytes()
            )
            units, csum = body.size, int(body.sum(dtype=np.int64))
            ds = body[::2]
            ds_units, ds_sum = ds.size, int(ds.sum(dtype=np.int64))
        rows.append(
            (i, kind, fmt, payload, w, h, ch, nf, len(payload), units,
             csum, ds_units, ds_sum, ahash)
        )
    df = pd.DataFrame(
        [r[:-1] for r in rows],
        columns=["media_id", "kind", "fmt", "payload", "width", "height",
                 "channels", "n_frames", "n_bytes", "content_units",
                 "content_sum", "ds2_units", "ds2_sum"],
    ).astype({"media_id": "int64"})
    # assign the hash column from python ints directly: letting the
    # row-tuple constructor infer it would round-trip the 2^63-scale
    # values through float64 and shave the low ~10 bits
    df["ahash64"] = pd.array([r[-1] for r in rows], dtype="Int64")
    samples_df = pd.DataFrame(
        sample_rows, columns=["media_id", "idx", "mono"]
    ).astype({"media_id": "int64", "idx": "int32", "mono": "int64"})
    samples_df.to_parquet(spath + ".tmp", index=False)
    tmp = out + ".tmp"
    df.to_parquet(tmp, index=False)
    os.replace(spath + ".tmp", spath)
    os.replace(tmp, out)
    return out


def ensure_media_audio_samples(n_rows: int = 2_000, seed: int = 42) -> str:
    """Path of the audio mono-sample side-table (r10 — the spectral
    oracle's DFT input)."""
    out = ensure_media(n_rows, seed)
    return os.path.join(
        os.path.dirname(out), "media_audio_samples.parquet"
    )


def ensure_buildings(n_rows: int, seed: int = 42) -> tuple[str, str]:
    """Generate (once) and return (buildings_path, expected_path) —
    parquet files readable by both Spark and the DuckDB oracle."""
    root = buildings_path(n_rows)
    bpath = os.path.join(root, "buildings.parquet")
    epath = os.path.join(root, "buildings_expected.parquet")
    gpath = os.path.join(root, "buildings_edges.parquet")
    vpath = os.path.join(root, "buildings_vertices.parquet")
    if all(os.path.exists(pp) for pp in (bpath, epath, gpath, vpath)):
        return bpath, epath
    os.makedirs(root, exist_ok=True)
    buildings, expected, edges, vertices = make_buildings(n_rows, seed)
    tmp_b, tmp_e = bpath + ".tmp", epath + ".tmp"
    # small row groups: Spark parallelizes parquet scans at row-group
    # granularity — a single-row-group file reads on ONE core no matter
    # how many splits the scheduler makes (measured 2.4x on the
    # 200k bench). Mirrors the reference's ROW_GROUP_SIZE 15000.
    buildings.to_parquet(tmp_b, index=False, row_group_size=15_000)
    expected.to_parquet(tmp_e, index=False, row_group_size=15_000)
    edges.to_parquet(gpath + ".tmp", index=False, row_group_size=100_000)
    vertices.to_parquet(vpath + ".tmp", index=False,
                        row_group_size=100_000)
    os.replace(tmp_b, bpath)
    os.replace(tmp_e, epath)
    os.replace(gpath + ".tmp", gpath)
    os.replace(vpath + ".tmp", vpath)
    return bpath, epath


def ensure_buildings_edges(n_rows: int, seed: int = 42) -> str:
    """Path of the areal ring-edge side-table (r8 — the oracle's input
    for the even-odd containment twins)."""
    ensure_buildings(n_rows, seed)
    return os.path.join(buildings_path(n_rows), "buildings_edges.parquet")


def ensure_buildings_vertices(n_rows: int, seed: int = 42) -> str:
    """Path of the ordered full-vertex side-table (r10 — the oracle's
    input for vertex-walk twins: Douglas-Peucker, convex hull). An
    on-disk fixture from before this table existed regenerates in
    place — generation is deterministic (seed), so the other three
    files rewrite byte-identically."""
    root = buildings_path(n_rows)
    vpath = os.path.join(root, "buildings_vertices.parquet")
    if not os.path.exists(vpath):
        # force full regeneration (same seed → same data + new file)
        ensure_buildings(n_rows, seed)
    return vpath


def ensure_geojsonl(n_rows: int = 5_000, seed: int = 42) -> str:
    """GeoJSONSeq corpus fixture: the buildings rows re-serialized as
    newline-delimited GeoJSON features, one file per source (like the
    reference's per-region exports). Floats serialize via json/repr —
    shortest round-trip decimals — so the reader's WKB is bit-equal to
    the parquet original and centroid hashes match the golden table."""
    root = os.path.join(FIXTURE_ROOT, f"geojsonl_{n_rows}")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    import json

    from gis_etl_spark.sources.geojson import to_geojson_geometry

    bpath, _ = ensure_buildings(n_rows, seed)
    df = pd.read_parquet(bpath)
    handles: dict[str, list[str]] = {}
    for row in df.itertuples():
        geom = (
            None
            if row.geom is None
            else to_geojson_geometry(bytes(row.geom))
        )
        feat = {
            "type": "Feature",
            "geometry": geom,
            "properties": {
                "building_id": int(row.building_id),
                "source": row.source,
            },
        }
        handles.setdefault(row.source, []).append(
            json.dumps(feat, separators=(",", ":"))
        )
    for src, lines in handles.items():
        fname = src.replace("/", "_").replace(".pq", "") + ".geojsonl"
        with open(os.path.join(root, fname), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    with open(done, "w") as fh:
        fh.write("ok")
    return root
