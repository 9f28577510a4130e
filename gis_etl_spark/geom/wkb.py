"""OGC WKB kernels — pure numpy, no GEOS/shapely (SURVEY.md §7.2.1).

WKB is a small public format: byte 0 is endianness (1 = little),
bytes 1-4 a uint32 geometry-type word, then counts and float64
coordinates. Z/M variants appear either as ISO offsets (+1000 Z,
+2000 M, +3000 ZM) or as EWKB flag bits (0x80000000 Z, 0x40000000 M,
0x20000000 SRID-present). The reference's corpus is exactly this
surface: core types 1-7 plus POLYGON Z outliers it filters away
(east_asia.py:37, :248).

Semantics matched to the reference's engine functions:
- centroid  — area-weighted shoelace over rings (holes opposite
  orientation subtract); zero-area polygons fall back to the vertex
  mean; linestrings are length-weighted; multi-geoms weight by part
  measure. (ST_CENTROID, east_asia.py:76-77)
- bbox      — min/max over every vertex (ST_XMIN.., east_asia.py:204)
- flip      — swap x/y of every vertex (ST_FlipCoordinates,
  east_asia.py:261)
- force_2d  — drop Z/M doubles and flags (wkt.dumps output_dimension=2,
  east_asia.py:67-68)

Every kernel takes/returns plain Python objects per geometry and is
driven in batches by the pandas UDFs in geom/functions.py.
"""

from __future__ import annotations

import struct

import numpy as np

# geometry-type word base codes (OGC)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

_TYPE_NAMES = {
    POINT: "POINT",
    LINESTRING: "LINESTRING",
    POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT",
    MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
    GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}


def decode_type_word(word: int) -> tuple[int, bool, bool, bool]:
    """→ (base_type, has_z, has_m, has_srid) for ISO and EWKB variants."""
    has_srid = bool(word & _EWKB_SRID)
    has_z = bool(word & _EWKB_Z)
    has_m = bool(word & _EWKB_M)
    base = word & 0x1FFFFFFF
    if base >= 3000:
        base -= 3000
        has_z = has_m = True
    elif base >= 2000:
        base -= 2000
        has_m = True
    elif base >= 1000:
        base -= 1000
        has_z = True
    return base, has_z, has_m, has_srid


class _Reader:
    """Sequential WKB reader honoring per-geometry endianness."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def header(self) -> tuple[int, bool, bool, str]:
        little = self.buf[self.pos] == 1
        bo = "<" if little else ">"
        (word,) = struct.unpack_from(bo + "I", self.buf, self.pos + 1)
        self.pos += 5
        base, has_z, has_m, has_srid = decode_type_word(word)
        if has_srid:
            self.pos += 4  # skip SRID
        return base, has_z, has_m, bo

    def u32(self, bo: str) -> int:
        (v,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        return v

    def coords(self, n: int, dims: int, bo: str) -> np.ndarray:
        nb = n * dims * 8
        arr = np.frombuffer(self.buf, dtype=bo + "f8", count=n * dims, offset=self.pos)
        self.pos += nb
        return arr.reshape(n, dims)


def parse(buf: bytes) -> tuple[int, list[list[np.ndarray]]]:
    """Parse WKB → (base_type, parts) where parts is a list of rings,
    each ring an (n, dims) float64 array. Structure by type:

      POINT/LINESTRING          → [[coords]]
      POLYGON                   → [[ring0, ring1, ...]]
      MULTI*/GEOMETRYCOLLECTION → one entry per member part
    """
    r = _Reader(buf)
    return _parse_geom(r)


def _parse_geom(r: _Reader) -> tuple[int, list[list[np.ndarray]]]:
    base, has_z, has_m, bo = r.header()
    dims = 2 + has_z + has_m
    if base == POINT:
        return base, [[r.coords(1, dims, bo)]]
    if base == LINESTRING:
        n = r.u32(bo)
        return base, [[r.coords(n, dims, bo)]]
    if base == POLYGON:
        nrings = r.u32(bo)
        rings = [r.coords(r.u32(bo), dims, bo) for _ in range(nrings)]
        return base, [rings]
    if base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        nparts = r.u32(bo)
        parts: list[list[np.ndarray]] = []
        for _ in range(nparts):
            _, sub = _parse_geom(r)
            parts.extend(sub)
        return base, parts
    raise ValueError(f"unsupported WKB geometry type {base}")


def shape_type(buf: bytes) -> int:
    """Base geometry-type code, flags decoded (cf. the reference's raw
    byte-2 peek, east_asia.py:176 — that byte is exposed JVM-side by
    st_shape_type_byte; this helper gives the *semantic* type)."""
    little = buf[0] == 1
    (word,) = struct.unpack_from("<I" if little else ">I", buf, 1)
    return decode_type_word(word)[0]


def _ring_area_centroid(ring: np.ndarray) -> tuple[float, float, float]:
    """Signed shoelace area + centroid of one ring (x,y only),
    translated to the first vertex before the cross products: raw
    lon/lat shoelace loses ~1e-5 deg to catastrophic cancellation
    (x·y ≈ 5600 vs area ≈ 1e-4); centering makes every term O(size²).
    Returns (signed_area, cx, cy); (cx, cy) are NaN for zero area."""
    x0, y0 = float(ring[0, 0]), float(ring[0, 1])
    x = ring[:, 0] - x0
    y = ring[:, 1] - y0
    # manual shift-by-one: the SAME array np.roll(·, -1) builds (so
    # every sum is bit-identical and the goldens stand), minus roll's
    # generic-axis machinery (~3× on small rings, r8 profile)
    xr = np.empty_like(x)
    xr[:-1] = x[1:]
    xr[-1] = x[0]
    yr = np.empty_like(y)
    yr[:-1] = y[1:]
    yr[-1] = y[0]
    cross = x * yr - xr * y
    a2 = cross.sum()  # 2 * signed area
    if a2 == 0.0:
        return 0.0, float("nan"), float("nan")
    cx = ((x + xr) * cross).sum() / (3.0 * a2)
    cy = ((y + yr) * cross).sum() / (3.0 * a2)
    return a2 / 2.0, x0 + cx, y0 + cy


def centroid(buf: bytes) -> tuple[float, float]:
    """Geometric centroid, GEOS-convention fallbacks for degenerate
    input (zero-area polygon → vertex mean; zero-length line → vertex
    mean)."""
    base, parts = parse(buf)
    if base == POINT:
        p = parts[0][0][0]
        return float(p[0]), float(p[1])
    if base == MULTIPOINT:
        allp = np.vstack([rings[0] for rings in parts])
        return float(allp[:, 0].mean()), float(allp[:, 1].mean())
    if base in (LINESTRING, MULTILINESTRING):
        num_x = num_y = total_len = 0.0
        for rings in parts:
            line = rings[0]
            seg = np.diff(line[:, :2], axis=0)
            lens = np.hypot(seg[:, 0], seg[:, 1])
            mids = (line[:-1, :2] + line[1:, :2]) / 2.0
            num_x += float((mids[:, 0] * lens).sum())
            num_y += float((mids[:, 1] * lens).sum())
            total_len += float(lens.sum())
        if total_len == 0.0:
            allp = np.vstack([rings[0][:, :2] for rings in parts])
            return float(allp[:, 0].mean()), float(allp[:, 1].mean())
        return num_x / total_len, num_y / total_len
    if base in (POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION):
        area = num_x = num_y = 0.0
        for rings in parts:
            for ring in rings:
                a, rcx, rcy = _ring_area_centroid(ring[:, :2])
                if a != 0.0:
                    area += a
                    num_x += a * rcx
                    num_y += a * rcy
        if area == 0.0:
            allp = np.vstack([ring[:, :2] for rings in parts for ring in rings])
            return float(allp[:, 0].mean()), float(allp[:, 1].mean())
        return num_x / area, num_y / area
    raise ValueError(f"unsupported geometry type {base}")


def area_perimeter(buf: bytes) -> tuple[float, float]:
    """(planar_area, boundary_length) in coordinate units — ST_AREA /
    ST_PERIMETER / ST_LENGTH semantics folded into one parse:
    points → (0, 0); (multi)linestrings → (0, open path length);
    (multi)polygons → (|Σ signed ring areas| — holes carry opposite
    orientation and subtract, same shoelace as `centroid` —, Σ closed
    ring lengths). Rings store the closing vertex per the WKB spec, so
    the wrap segment is zero-length; unclosed rings still close via
    the wrap term."""
    base, parts = parse(buf)
    if base in (POINT, MULTIPOINT):
        return 0.0, 0.0
    if base in (LINESTRING, MULTILINESTRING):
        total = 0.0
        for rings in parts:
            seg = np.diff(rings[0][:, :2], axis=0)
            total += float(np.hypot(seg[:, 0], seg[:, 1]).sum())
        return 0.0, total
    if base in (POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION):
        area = perim = 0.0
        for rings in parts:
            for ring in rings:
                a, _, _ = _ring_area_centroid(ring[:, :2])
                area += a
                closed = np.vstack([ring[:, :2], ring[:1, :2]])
                seg = np.diff(closed, axis=0)
                perim += float(np.hypot(seg[:, 0], seg[:, 1]).sum())
        return abs(area), perim
    raise ValueError(f"unsupported geometry type {base}")


def bbox(buf: bytes) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) over every vertex."""
    _, parts = parse(buf)
    xmin = ymin = np.inf
    xmax = ymax = -np.inf
    for rings in parts:
        for ring in rings:
            xmin = min(xmin, float(ring[:, 0].min()))
            xmax = max(xmax, float(ring[:, 0].max()))
            ymin = min(ymin, float(ring[:, 1].min()))
            ymax = max(ymax, float(ring[:, 1].max()))
    return xmin, ymin, xmax, ymax


def npoints(buf: bytes) -> int:
    _, parts = parse(buf)
    return int(sum(ring.shape[0] for rings in parts for ring in rings))


def _rebuild(
    buf: bytes, coord_fn, drop_zm: bool = False
) -> bytes:
    """Re-emit a WKB buffer with transformed coordinates.

    coord_fn receives and returns an (n, dims_out) array. Output is
    always little-endian with plain OGC type codes (Z kept as ISO
    +1000 unless drop_zm).
    """
    r = _Reader(buf)
    out = bytearray()
    _rebuild_geom(r, out, coord_fn, drop_zm)
    return bytes(out)


def _rebuild_geom(r: _Reader, out: bytearray, coord_fn, drop_zm: bool) -> None:
    base, has_z, has_m, bo = r.header()
    dims = 2 + has_z + has_m
    out_z = has_z and not drop_zm
    out_m = has_m and not drop_zm
    out_dims = 2 + out_z + out_m
    word = base + (1000 if out_z else 0) + (2000 if out_m else 0)
    out += struct.pack("<BI", 1, word)

    def emit(arr: np.ndarray) -> None:
        kept = arr[:, :out_dims].astype("<f8", copy=False)
        out.extend(coord_fn(kept).astype("<f8", copy=False).tobytes())

    if base == POINT:
        emit(r.coords(1, dims, bo))
    elif base == LINESTRING:
        n = r.u32(bo)
        out += struct.pack("<I", n)
        emit(r.coords(n, dims, bo))
    elif base == POLYGON:
        nrings = r.u32(bo)
        out += struct.pack("<I", nrings)
        for _ in range(nrings):
            n = r.u32(bo)
            out += struct.pack("<I", n)
            emit(r.coords(n, dims, bo))
    elif base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        nparts = r.u32(bo)
        out += struct.pack("<I", nparts)
        for _ in range(nparts):
            _rebuild_geom(r, out, coord_fn, drop_zm)
    else:
        raise ValueError(f"unsupported geometry type {base}")


def flip(buf: bytes) -> bytes:
    """Swap x↔y of every vertex (ST_FlipCoordinates, east_asia.py:261)."""

    def _swap(arr: np.ndarray) -> np.ndarray:
        arr = arr.copy()
        arr[:, [0, 1]] = arr[:, [1, 0]]
        return arr

    return _rebuild(buf, _swap)


def force_2d(buf: bytes) -> bytes:
    """Drop Z/M dimensions (reference Z-drop via shapely wkt.dumps
    output_dimension=2, east_asia.py:67-68).

    Fast path: an already-2-D little-endian POINT/LINESTRING/POLYGON
    has no nested headers and nothing to drop — return the buffer
    untouched (the overwhelmingly common case; rebuilding every
    geometry cost ~60 µs/row at bench scale)."""
    if buf[0] == 1:
        (word,) = struct.unpack_from("<I", buf, 1)
        if word in (POINT, LINESTRING, POLYGON):
            return buf
    return _rebuild(buf, lambda a: a, drop_zm=True)


def transform_coords(buf: bytes, fn) -> bytes:
    """Apply fn((n,2) xy array) -> (n,2) to every vertex — the vehicle
    for st_transform (geom/transform.py)."""

    def _apply(arr: np.ndarray) -> np.ndarray:
        out = arr.copy()
        out[:, :2] = fn(arr[:, :2])
        return out

    return _rebuild(buf, _apply)


# --- batch kernels ---------------------------------------------------------
#
# The Arrow batch is the unit of work; per-row Python costs ~60 µs/geom
# (measured 16.5k rows/s), which at 100 TB is the whole job. The batch
# kernels below vectorize the dominant shape — single-ring 2-D
# little-endian polygons (85-95% of real footprint corpora, FIXTURES.md
# B1) — across the WHOLE batch with np.add.reduceat per-ring shoelace;
# everything else falls back to the general per-row parser.

_FAST_HDR = struct.pack("<BII", 1, POLYGON, 1)  # 1-ring 2-D LE polygon


def _extract_rings(buf, geom_id, rings):
    """Light-weight ring extraction for LE 2-D POLYGON/MULTIPOLYGON
    buffers: appends (geom_id, flat coords view) per ring. Returns
    False if the buffer needs the general parser (Z/M, big-endian,
    other types, collections)."""
    (word,) = struct.unpack_from("<I", buf, 1)
    if word == POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, 5)
        pos = 9
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<I", buf, pos)
            rings.append(
                (geom_id, np.frombuffer(buf, "<f8", 2 * npts, pos + 4))
            )
            pos += 4 + 16 * npts
        return True
    if word == MULTIPOLYGON:
        (nparts,) = struct.unpack_from("<I", buf, 5)
        pos = 9
        for _ in range(nparts):
            if buf[pos] != 1:
                return False
            (w2,) = struct.unpack_from("<I", buf, pos + 1)
            if w2 != POLYGON:
                return False
            (nrings,) = struct.unpack_from("<I", buf, pos + 5)
            pos += 9
            for _ in range(nrings):
                (npts,) = struct.unpack_from("<I", buf, pos)
                rings.append(
                    (geom_id, np.frombuffer(buf, "<f8", 2 * npts, pos + 4))
                )
                pos += 4 + 16 * npts
        return True
    return False


def _classify_batch(bufs, xs_point, ys_point):
    """Split a batch into vectorizable rings vs slow rows. Fills point
    coords directly into (xs_point, ys_point); returns
    (rings, poly_row_ids, slow_row_ids)."""
    rings: list = []
    poly_ids: list[int] = []
    slow: list[int] = []
    for i, b in enumerate(bufs):
        if b is None:
            continue
        b = bytes(b)
        if (
            len(b) >= 9
            and b[0] == 1
            and b[1] == 1
            and b[2:5] == b"\x00\x00\x00"
        ):
            # LE 2-D POINT: coords inline, no ring machinery
            xs_point[i], ys_point[i] = struct.unpack_from("<2d", b, 5)
            continue
        mark = len(rings)
        ok = False
        if len(b) >= 9 and b[0] == 1:
            try:
                ok = _extract_rings(b, len(poly_ids), rings)
            except (struct.error, ValueError):
                # truncated/corrupt buffers → slow path, whose parser
                # raises a per-row attributable error
                ok = False
        if ok:
            poly_ids.append(i)
        else:
            del rings[mark:]
            slow.append(i)
    return rings, poly_ids, slow


def _ring_table(rings):
    counts = np.array([len(c) // 2 for _, c in rings], dtype=np.int64)
    gids = np.array([g for g, _ in rings], dtype=np.int64)
    pts = np.concatenate([c for _, c in rings]).reshape(-1, 2)
    starts = np.zeros(len(rings), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return pts, starts, counts, gids


def centroid_batch(bufs: list) -> tuple[np.ndarray, np.ndarray]:
    """Centroids for a batch of WKB buffers → (xs, ys) float64 arrays
    (NaN for None rows). Fast path — little-endian 2-D points,
    polygons, and multipolygons, i.e. ~97% of a footprint corpus —
    is fully vectorized (per-ring conditioned shoelace via reduceat,
    area-weighted combine per geometry); the rest fall back per-row."""
    n = len(bufs)
    xs = np.full(n, np.nan)
    ys = np.full(n, np.nan)
    rings, poly_ids, slow = _classify_batch(bufs, xs, ys)
    if rings:
        pts, starts, counts, gids = _ring_table(rings)
        ng = len(poly_ids)
        # translate each ring to its first vertex (conditioning — see
        # _ring_area_centroid) before the cross products
        x0 = pts[starts, 0]
        y0 = pts[starts, 1]
        x = pts[:, 0] - np.repeat(x0, counts)
        y = pts[:, 1] - np.repeat(y0, counts)
        ends = starts + counts
        nxt = np.arange(len(pts), dtype=np.int64) + 1
        nxt[ends - 1] = starts
        cross = x * y[nxt] - x[nxt] * y
        a2 = np.add.reduceat(cross, starts)
        cx6 = np.add.reduceat((x + x[nxt]) * cross, starts)
        cy6 = np.add.reduceat((y + y[nxt]) * cross, starts)
        with np.errstate(divide="ignore", invalid="ignore"):
            ring_cx = x0 + cx6 / (3.0 * a2)
            ring_cy = y0 + cy6 / (3.0 * a2)
        area = a2 / 2.0
        # zero-area rings contribute nothing (matches centroid())
        contrib = np.where(area != 0.0, area, 0.0)
        g_area = np.zeros(ng)
        g_num_x = np.zeros(ng)
        g_num_y = np.zeros(ng)
        np.add.at(g_area, gids, contrib)
        np.add.at(g_num_x, gids, np.where(area != 0.0, contrib * ring_cx, 0.0))
        np.add.at(g_num_y, gids, np.where(area != 0.0, contrib * ring_cy, 0.0))
        # vertex means for the all-degenerate fallback
        g_px = np.zeros(ng)
        g_py = np.zeros(ng)
        g_np = np.zeros(ng)
        np.add.at(g_px, gids, np.add.reduceat(pts[:, 0], starts))
        np.add.at(g_py, gids, np.add.reduceat(pts[:, 1], starts))
        np.add.at(g_np, gids, counts.astype("f8"))
        with np.errstate(divide="ignore", invalid="ignore"):
            xs_g = np.where(g_area != 0.0, g_num_x / g_area, g_px / g_np)
            ys_g = np.where(g_area != 0.0, g_num_y / g_area, g_py / g_np)
        xs[poly_ids] = xs_g
        ys[poly_ids] = ys_g
    for i in slow:
        xs[i], ys[i] = centroid(bytes(bufs[i]))
    return xs, ys


def bbox_batch(bufs: list) -> np.ndarray:
    """Bboxes for a batch → (n, 4) array [xmin ymin xmax ymax], NaN rows
    for None. Same fast/slow split as centroid_batch."""
    n = len(bufs)
    out = np.full((n, 4), np.nan)
    px = np.full(n, np.nan)
    py = np.full(n, np.nan)
    rings, poly_ids, slow = _classify_batch(bufs, px, py)
    pmask = ~np.isnan(px)
    out[pmask, 0] = out[pmask, 2] = px[pmask]
    out[pmask, 1] = out[pmask, 3] = py[pmask]
    if rings:
        pts, starts, counts, gids = _ring_table(rings)
        ng = len(poly_ids)
        gxmin = np.full(ng, np.inf)
        gymin = np.full(ng, np.inf)
        gxmax = np.full(ng, -np.inf)
        gymax = np.full(ng, -np.inf)
        np.minimum.at(gxmin, gids, np.minimum.reduceat(pts[:, 0], starts))
        np.minimum.at(gymin, gids, np.minimum.reduceat(pts[:, 1], starts))
        np.maximum.at(gxmax, gids, np.maximum.reduceat(pts[:, 0], starts))
        np.maximum.at(gymax, gids, np.maximum.reduceat(pts[:, 1], starts))
        out[poly_ids, 0] = gxmin
        out[poly_ids, 1] = gymin
        out[poly_ids, 2] = gxmax
        out[poly_ids, 3] = gymax
    for i in slow:
        out[i] = bbox(bytes(bufs[i]))
    return out



def contains_point(buf: bytes, px: float, py: float) -> bool:
    """Even-odd (ray crossing) point-in-polygon for one WKB geometry —
    the scalar reference/slow path. Holes fall out of the even-odd
    rule; multipolygon = any part containing the point. Boundary
    points are half-open (standard crossing-rule behavior)."""
    base, parts = parse(buf)
    if base not in (POLYGON, MULTIPOLYGON):  # only areal types contain
        return False
    crossings = 0
    for rings_ in parts:
        for ring in rings_:
            xs_ = ring[:, 0]
            ys_ = ring[:, 1]
            n = len(xs_)
            for a in range(n):
                b = (a + 1) % n
                y1, y2 = ys_[a], ys_[b]
                if (y1 > py) != (y2 > py):
                    xint = (xs_[b] - xs_[a]) * (py - y1) / (y2 - y1) + xs_[a]
                    if px < xint:
                        crossings += 1
    return crossings % 2 == 1


def contains_point_batch(
    bufs: list, qx: np.ndarray, qy: np.ndarray
) -> np.ndarray:
    """Vectorized even-odd containment: geometry i vs point (qx[i],
    qy[i]) → bool array (False for None/point geoms). Same fast/slow
    split as centroid_batch — all edges of all fast-path rings test
    their geometry's query point in a handful of whole-batch numpy
    ops; crossings sum per geometry via bincount, odd → inside."""
    n = len(bufs)
    out = np.zeros(n, dtype=bool)
    px_sink = np.full(n, np.nan)
    py_sink = np.full(n, np.nan)
    rings, poly_ids, slow = _classify_batch(bufs, px_sink, py_sink)
    if rings:
        pts, starts, counts, gids = _ring_table(rings)
        ng = len(poly_ids)
        ends = starts + counts
        nxt = np.arange(len(pts), dtype=np.int64) + 1
        nxt[ends - 1] = starts
        gid_pp = np.repeat(gids, counts)  # geom index per edge start
        rows = np.asarray(poly_ids, dtype=np.int64)
        ppx = np.asarray(qx, dtype="f8")[rows][gid_pp]
        ppy = np.asarray(qy, dtype="f8")[rows][gid_pp]
        y1 = pts[:, 1]
        y2 = pts[nxt, 1]
        straddle = (y1 > ppy) != (y2 > ppy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (
                (pts[nxt, 0] - pts[:, 0]) * (ppy - y1) / (y2 - y1)
                + pts[:, 0]
            )
        hit = straddle & (ppx < xint)
        crossings = np.bincount(gid_pp[hit], minlength=ng)
        out[rows] = (crossings % 2) == 1
    for i in slow:
        if bufs[i] is not None and not (
            np.isnan(qx[i]) or np.isnan(qy[i])
        ):
            out[i] = contains_point(bytes(bufs[i]), float(qx[i]), float(qy[i]))
    return out


# --- WKT ------------------------------------------------------------------

def _fmt_coord(p: np.ndarray) -> str:
    return " ".join(format(float(v), ".17g") for v in p)


def to_wkt(buf: bytes) -> str:
    """Render WKB → WKT (ST_AsText / geom::TEXT,
    East-Asia-Building-Footprints.md:153)."""
    base, parts = parse(buf)
    name = _TYPE_NAMES[base]
    if base == POINT:
        return f"{name} ({_fmt_coord(parts[0][0][0])})"
    if base in (LINESTRING, MULTIPOINT):
        pts = parts[0][0] if base == LINESTRING else np.vstack(
            [rings[0] for rings in parts]
        )
        inner = ", ".join(_fmt_coord(p) for p in pts)
        return f"{name} ({inner})"
    if base == POLYGON:
        rings = parts[0]
        inner = ", ".join(
            "(" + ", ".join(_fmt_coord(p) for p in ring) + ")" for ring in rings
        )
        return f"{name} ({inner})"
    if base == MULTIPOLYGON:
        polys = []
        for rings in parts:
            inner = ", ".join(
                "(" + ", ".join(_fmt_coord(p) for p in ring) + ")" for ring in rings
            )
            polys.append(f"({inner})")
        return f"{name} ({', '.join(polys)})"
    raise ValueError(f"to_wkt unsupported for type {base}")


def _pack_coords(pts: list[list[float]]) -> bytes:
    return np.asarray(pts, dtype="<f8").tobytes()


def from_wkt(text: str) -> bytes:
    """Parse WKT → WKB for POINT/LINESTRING/POLYGON/MULTIPOLYGON — the
    slice the corpus needs (SURVEY.md F7)."""
    s = text.strip()
    upper = s.upper()

    def _nums(chunk: str) -> list[list[float]]:
        return [
            [float(t) for t in pt.split()]
            for pt in chunk.split(",")
            if pt.strip()
        ]

    if upper.startswith("POINT"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        pts = _nums(body)
        return struct.pack("<BI", 1, POINT) + _pack_coords(pts)
    if upper.startswith("LINESTRING"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        pts = _nums(body)
        return (
            struct.pack("<BII", 1, LINESTRING, len(pts)) + _pack_coords(pts)
        )
    if upper.startswith("MULTIPOLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        out = bytearray()
        polys = _split_nested(body)
        out += struct.pack("<BII", 1, MULTIPOLYGON, len(polys))
        for poly in polys:
            out += _polygon_wkb(_split_nested(poly))
        return bytes(out)
    if upper.startswith("POLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return _polygon_wkb(_split_nested(body))
    raise ValueError(f"from_wkt unsupported: {s[:40]}")


def _polygon_wkb(ring_chunks: list[str]) -> bytes:
    out = bytearray(struct.pack("<BII", 1, POLYGON, len(ring_chunks)))
    for chunk in ring_chunks:
        pts = [
            [float(t) for t in pt.split()]
            for pt in chunk.split(",")
            if pt.strip()
        ]
        out += struct.pack("<I", len(pts))
        out += _pack_coords(pts)
    return bytes(out)


def _split_nested(body: str) -> list[str]:
    """Split 'a),(b' style WKT bodies at depth-0 commas, stripping one
    paren level from each chunk."""
    chunks = []
    depth = 0
    start = None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                chunks.append(body[start:i])
    return chunks


# --- simplification / hull [beyond-reference] ------------------------------


def _dp_keep_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask over an open polyline (endpoints always
    kept) — iterative stack. Distance is TRUE point-to-SEGMENT (t
    clamped to [0,1]), not perpendicular-to-infinite-line: the naive
    cross-product form rates a point beyond the chord's span as near
    (e.g. (3,0) against chord (0,0)→(1,0) scores 0), silently
    violating the deviation bound — caught by the hypothesis property
    test; segment distance makes 'every dropped vertex lies within
    tol of the simplified chain' actually hold."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        rel = pts[i + 1 : j] - pts[i]
        L2 = float(seg[0] * seg[0] + seg[1] * seg[1])
        if L2 == 0.0:
            d = np.hypot(rel[:, 0], rel[:, 1])
        else:
            t = np.clip((rel[:, 0] * seg[0] + rel[:, 1] * seg[1]) / L2, 0.0, 1.0)
            dx = rel[:, 0] - t * seg[0]
            dy = rel[:, 1] - t * seg[1]
            d = np.hypot(dx, dy)
        k = int(np.argmax(d))
        if float(d[k]) > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify(buf: bytes, tol: float) -> bytes:
    """ST_SIMPLIFY (Douglas-Peucker, PRESERVING structure): lines keep
    their endpoints; polygon rings simplify as the closed path from the
    first vertex around to its duplicate, and a ring that would drop
    below 4 points (degenerate) keeps its original vertices. Points
    pass through. Output is 2-D WKB (Z/M dropped, like force_2d)."""
    base, parts = parse(buf)
    if base in (POINT, MULTIPOINT):
        return force_2d(buf)

    def simp(arr: np.ndarray, closed: bool) -> np.ndarray:
        pts = arr[:, :2]
        if len(pts) <= (4 if closed else 2):
            return pts
        mask = _dp_keep_mask(pts, tol)
        out = pts[mask]
        if closed and len(out) < 4:
            return pts
        return out

    out = bytearray()
    if base == LINESTRING:
        line = simp(parts[0][0], False)
        out += struct.pack("<BII", 1, 2, len(line))
        out += line.astype("<f8").tobytes()
    elif base == MULTILINESTRING:
        out += struct.pack("<BII", 1, 5, len(parts))
        for rings in parts:
            line = simp(rings[0], False)
            out += struct.pack("<BII", 1, 2, len(line))
            out += line.astype("<f8").tobytes()
    elif base in (POLYGON, MULTIPOLYGON):
        if base == MULTIPOLYGON:
            out += struct.pack("<BII", 1, 6, len(parts))
        for rings in parts:
            out += struct.pack("<BII", 1, 3, len(rings))
            for ring in rings:
                r = simp(ring, True)
                out += struct.pack("<I", len(r))
                out += r.astype("<f8").tobytes()
    else:
        raise ValueError(f"unsupported geometry type {base}")
    return bytes(out)


def convex_hull(buf: bytes) -> bytes:
    """ST_CONVEXHULL — Andrew monotone chain over every vertex.
    Returns POLYGON WKB (CCW, closed) for ≥3 non-collinear points,
    LINESTRING of the two extremes for collinear input, POINT when all
    vertices coincide. Strictly convex output (collinear hull vertices
    dropped)."""
    _, parts = parse(buf)
    pts = np.vstack([ring[:, :2] for rings in parts for ring in rings])
    uniq = np.unique(pts, axis=0)  # sorted lexicographically (x, then y)
    if len(uniq) == 1:
        return struct.pack("<BI2d", 1, 1, float(uniq[0, 0]), float(uniq[0, 1]))

    def cross(o, a, b) -> float:
        return float(
            (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
        )

    lower: list[np.ndarray] = []
    for p in uniq:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in uniq[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:  # collinear
        a, b = uniq[0], uniq[-1]
        return struct.pack(
            "<BII", 1, 2, 2
        ) + np.array([a, b]).astype("<f8").tobytes()
    ring = np.vstack(hull + [hull[0]])
    out = bytearray(struct.pack("<BII", 1, 3, 1))
    out += struct.pack("<I", len(ring))
    out += ring.astype("<f8").tobytes()
    return bytes(out)
