"""Icosahedral aperture-7 hexagonal grid — the exact-math upgrade of
the equal-angle `grid_cell` stand-in (SURVEY.md §7.2.4 flagged H3
exactness as future work; this module delivers the icosahedral
geometry while keeping engine-specific cell ids).

Math (all public: Snyder 1992 icosahedral gnomonic DGGS; Uber's H3
design docs describe the same construction):

1. (lat, lng) → unit sphere vector v.
2. Face = argmax over the 20 icosahedron face centers of ``v·c`` —
   the face whose gnomonic projection the point falls in.
3. Gnomonic projection onto the face's tangent plane:
   ``u = (v·e1)/(v·c)``, ``w = (v·e2)/(v·c)`` with (e1, e2) an
   orthonormal tangent basis at c.
4. Aperture-7 hex lattice at resolution ρ: hexagons of circumradius
   ``s0/√7^ρ``, the lattice rotated by ``ρ·atan(√3/5)`` (the
   aperture-7 child rotation — |2a+b| = √7 in a unit hex lattice),
   mirroring H3's Class II/III alternation. Continuous axial coords
   are cube-rounded to the containing hexagon.
5. Cell id packs (res, face, i, j) into a positive int64:
   ``res<<58 | face<<52 | (i+2^25)<<26 | (j+2^25)``.

What this matches vs real H3: cell areas are near-uniform over the
globe (gnomonic distortion only, max ≈1.6× within a face — the
equal-angle lattice's 1/cos(lat) blow-up is gone), the √7 area
hierarchy, hexagonal neighborhoods, and the res-7 ≈1.22 km edge
length. What it does not match: H3's 122-base-cell numbering (no h3
library exists in this environment to validate bit parity against, so
we refuse to ship an unverifiable table) — cells that straddle a face
edge are face-clipped instead of stitched. Documented deviation,
property-tested invariants (tests/test_layout.py).

Join-compat boundary, precisely: ids from THIS module never join
against real H3 data. For corpora already carrying H3 ids, use
layout/h3compat.py — the published bit-layout algebra (resolution /
base-cell extraction, parent truncation, validity, hex-string codec)
operates on real H3 ids bit-exactly, and h3compat.h3_latlng_to_cell
delegates to the h3 package when installed for exact id generation.

Implementation notes: everything is NATIVE Spark column arithmetic —
face argmax via a 20-element literal array + ``array_max`` over
(dot, fid) structs, per-face basis lookup via ``element_at`` on
literal arrays — so heatmaps aggregate fully JVM-side with two-phase
hash aggregation, no Python in the hot path. The DuckDB oracle SQL is
generated from the SAME constants with the SAME operation order
(repr(float) round-trips exactly), so cell ids hash-match across
engines; trig literals (π/180 etc.) are spelled as explicit doubles
in both engines rather than trusting radians()/degrees() parity.

Reference parity targets: H3_LATLNG_TO_CELL / H3_CELL_TO_PARENT /
H3_CELL_TO_BOUNDARY_WKT shapes (East-Asia-Building-Footprints.md:
250-252, 264-268).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# --- constants (single source for Spark AND oracle SQL) --------------------

DEG2RAD = 0.017453292519943295  # pi/180 as an exact double literal
RAD2DEG = 57.29577951308232

# hex circumradius (== edge length) at res 7 ≈ H3 res-7 mean edge
_EDGE7_RAD = 1.2195 / 6371.0088
_SQRT7 = math.sqrt(7.0)
SIZE0 = _EDGE7_RAD * _SQRT7 ** 7
# aperture-7 lattice rotation per res: angle of 2a+b in a unit hex
# lattice (tan = sqrt(3)/5)
THETA = math.atan(math.sqrt(3.0) / 5.0)

MAX_RES = 15
_IJ_OFF = 1 << 25  # i/j offset → non-negative packing
_IJ_SPAN = 1 << 26


def _build_faces() -> list[dict]:
    phi = (1.0 + math.sqrt(5.0)) / 2.0
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    V = np.array(verts)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    edge = np.min(
        [np.linalg.norm(V[i] - V[j]) for i in range(12) for j in range(i + 1, 12)]
    )
    tris = []
    for i in range(12):
        for j in range(i + 1, 12):
            if abs(np.linalg.norm(V[i] - V[j]) - edge) > 1e-9:
                continue
            for k in range(j + 1, 12):
                if (
                    abs(np.linalg.norm(V[i] - V[k]) - edge) < 1e-9
                    and abs(np.linalg.norm(V[j] - V[k]) - edge) < 1e-9
                ):
                    tris.append((i, j, k))
    assert len(tris) == 20, len(tris)
    faces = []
    for (i, j, k) in tris:
        c = V[i] + V[j] + V[k]
        c /= np.linalg.norm(c)
        # tangent basis anchored at the lowest-index vertex (deterministic)
        e1 = V[i] - np.dot(V[i], c) * c
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(c, e1)
        faces.append(
            {
                "c": (float(c[0]), float(c[1]), float(c[2])),
                "e1": (float(e1[0]), float(e1[1]), float(e1[2])),
                "e2": (float(e2[0]), float(e2[1]), float(e2[2])),
                "cv": float(np.dot(V[i], c)),  # cos(center→vertex angle)
            }
        )
    # deterministic face ordering: by center (z desc, atan2(y, x))
    faces.sort(
        key=lambda f: (-round(f["c"][2], 9), math.atan2(f["c"][1], f["c"][0]))
    )
    return faces


FACES = _build_faces()

# angular radius of a face (center→vertex ≈ 37.377°); gnomonic coords
# within a face are bounded by tan of this (~0.764)
FACE_RADIUS_GNOMONIC = math.tan(math.acos(FACES[0]["cv"]))


def hex_size(res: int) -> float:
    """Hex circumradius in gnomonic-plane units (≈ radians near the
    face center) at a resolution."""
    return SIZE0 / _SQRT7 ** res


def _axial_fwd(res: int) -> tuple[float, float, float, float]:
    """2x2 matrix A: face-plane (u, w) → continuous axial (q, r)."""
    s = hex_size(res)
    phi = res * THETA
    rot = np.array(
        [[math.cos(-phi), -math.sin(-phi)], [math.sin(-phi), math.cos(-phi)]]
    )
    ax = np.array([[math.sqrt(3.0) / 3.0, -1.0 / 3.0], [0.0, 2.0 / 3.0]]) / s
    A = ax @ rot
    return float(A[0, 0]), float(A[0, 1]), float(A[1, 0]), float(A[1, 1])


def _axial_inv(res: int) -> tuple[float, float, float, float]:
    """2x2 matrix B: axial (q, r) → face-plane (u, w) of the hex center."""
    a00, a01, a10, a11 = _axial_fwd(res)
    B = np.linalg.inv(np.array([[a00, a01], [a10, a11]]))
    return float(B[0, 0]), float(B[0, 1]), float(B[1, 0]), float(B[1, 1])


def _corners(res: int) -> list[tuple[float, float]]:
    """Six hex-corner offsets (du, dw) in the face plane at a res:
    pointy-top corners at 30°+60k, rotated with the lattice."""
    s = hex_size(res)
    phi = res * THETA
    out = []
    for k in range(6):
        ang = phi + math.pi / 6.0 + k * math.pi / 3.0
        out.append((s * math.cos(ang), s * math.sin(ang)))
    return out


# --- Spark native expressions ---------------------------------------------
#
# Column trees have no sharing: a subexpression used k times appears k
# times, and staged composition multiplies (a naive hex_cell tree is
# ~65k nodes and OOMs the driver when composed over computed inputs).
# `_let` gives true single-evaluation bindings — map a lambda over a
# one-element array of a struct — so every stage's values are bound
# once and the tree stays LINEAR in the number of stages. Higher-order
# functions evaluate JVM-side (CodegenFallback, no Python); the
# per-row cost is a handful of tiny struct allocations, which the
# bench shows is dwarfed by the trig either way.


def _let(fields: dict[str, Column], fn) -> Column:
    """let {name: expr, …} in fn(row) — row.getField(name) references
    evaluate each expr exactly once."""
    packed = F.struct(*[c.alias(k) for k, c in fields.items()])
    return F.element_at(F.transform(F.array(packed), fn), 1)


def _face_uv_struct(lat: Column, lng: Column) -> Column:
    """→ struct(face, u, w): argmax face + gnomonic coords, native.

    Ties on the face dot product resolve to the larger fid (the SQL
    twin mirrors with ORDER BY dot DESC, fid DESC)."""

    def from_v(v: Column) -> Column:
        vx, vy, vz = v["vx"], v["vy"], v["vz"]
        best = F.array_max(
            F.array(
                *[
                    F.struct(
                        (
                            vx * F.lit(f["c"][0])
                            + vy * F.lit(f["c"][1])
                            + vz * F.lit(f["c"][2])
                        ).alias("dot"),
                        F.lit(k).alias("fid"),
                    )
                    for k, f in enumerate(FACES)
                ]
            )
        )

        def from_best(b: Column) -> Column:
            face, dot = b["fid"], b["dot"]
            e1n = F.element_at(
                F.array(
                    *[
                        vx * F.lit(f["e1"][0])
                        + vy * F.lit(f["e1"][1])
                        + vz * F.lit(f["e1"][2])
                        for f in FACES
                    ]
                ),
                face + F.lit(1),
            )
            e2n = F.element_at(
                F.array(
                    *[
                        vx * F.lit(f["e2"][0])
                        + vy * F.lit(f["e2"][1])
                        + vz * F.lit(f["e2"][2])
                        for f in FACES
                    ]
                ),
                face + F.lit(1),
            )
            return F.struct(
                face.alias("face"),
                (e1n / dot).alias("u"),
                (e2n / dot).alias("w"),
            )

        return _let({"best": best}, lambda r: from_best(r["best"]))

    def from_p(p: Column) -> Column:
        latr = p["lat"] * F.lit(DEG2RAD)
        lngr = p["lng"] * F.lit(DEG2RAD)
        return _let(
            {
                "vx": F.cos(latr) * F.cos(lngr),
                "vy": F.cos(latr) * F.sin(lngr),
                "vz": F.sin(latr),
            },
            from_v,
        )

    return _let({"lat": lat, "lng": lng}, from_p)


def _cube_round_pack(
    res: int, face: Column, qf: Column, rf: Column
) -> Column:
    """Continuous axial → containing hexagon → packed id.
    floor(x+0.5) rounding (identical formula in the oracle SQL)."""

    def rounded(s: Column) -> Column:
        q, r, y, fc = s["qf"], s["rf"], s["yf"], s["face"]
        return _let(
            {
                "face": fc,
                "rq": F.floor(q + F.lit(0.5)),
                "ry": F.floor(y + F.lit(0.5)),
                "rr": F.floor(r + F.lit(0.5)),
                "dq": F.abs(F.floor(q + F.lit(0.5)).cast("double") - q),
                "dy": F.abs(F.floor(y + F.lit(0.5)).cast("double") - y),
                "dr": F.abs(F.floor(r + F.lit(0.5)).cast("double") - r),
            },
            pick,
        )

    def pick(s: Column) -> Column:
        rq, ry, rr = s["rq"], s["ry"], s["rr"]
        q_bad = (s["dq"] > s["dy"]) & (s["dq"] > s["dr"])
        i = F.when(q_bad, -ry - rr).otherwise(rq)
        j = F.when(~q_bad & ~(s["dy"] > s["dr"]), -rq - ry).otherwise(rr)
        return (
            F.lit(int(res) << 58).cast("long")
            + s["face"].cast("long") * F.lit(1 << 52)
            + (i + F.lit(_IJ_OFF)) * F.lit(_IJ_SPAN)
            + (j + F.lit(_IJ_OFF))
        ).cast("long")

    return _let(
        {"face": face, "qf": qf, "rf": rf, "yf": -qf - rf}, rounded
    )


def hex_cell(lat: Column, lng: Column, res: int = 7) -> Column:
    """(lat, lng) degrees → icosahedral aperture-7 hex cell id
    (H3_LATLNG_TO_CELL shape, East-Asia-Building-Footprints.md:250)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res out of range: {res}")
    a00, a01, a10, a11 = _axial_fwd(res)

    def from_fuw(s: Column) -> Column:
        u, w = s["u"], s["w"]
        return _cube_round_pack(
            res,
            s["face"],
            u * F.lit(a00) + w * F.lit(a01),
            u * F.lit(a10) + w * F.lit(a11),
        )

    return _let({"s": _face_uv_struct(lat, lng)}, lambda r: from_fuw(r["s"]))


def _decode_uv(cell: Column, res: int) -> Column:
    """cell → struct(face, u, w) of the hex CENTER in the face plane;
    res is the caller's static knowledge (also packed in bits 58+)."""
    b00, b01, b10, b11 = _axial_inv(res)

    def from_ij(s: Column) -> Column:
        i, j = s["i"].cast("double"), s["j"].cast("double")
        return F.struct(
            s["face"].alias("face"),
            (i * F.lit(b00) + j * F.lit(b01)).alias("u"),
            (i * F.lit(b10) + j * F.lit(b11)).alias("w"),
        )

    return _let(
        {
            "face": F.shiftright(cell, 52).bitwiseAND(F.lit(63)),
            "i": F.shiftright(cell, 26).bitwiseAND(F.lit(_IJ_SPAN - 1))
            - F.lit(_IJ_OFF),
            "j": cell.bitwiseAND(F.lit(_IJ_SPAN - 1)) - F.lit(_IJ_OFF),
        },
        from_ij,
    )


def _uv_to_sphere_struct(face: Column, u: Column, w: Column) -> Column:
    """Face-plane (u, w) → struct(lat, lng) degrees (inverse
    gnomonic): p = c + u·e1 + w·e2, normalized back to the sphere."""

    def lookup(key: str, comp: int) -> Column:
        return F.element_at(
            F.array(*[F.lit(f[key][comp]) for f in FACES]),
            face.cast("int") + F.lit(1),
        )

    def from_p(s: Column) -> Column:
        px, py, pz = s["px"], s["py"], s["pz"]
        norm = F.sqrt(px * px + py * py + pz * pz)
        return F.struct(
            (F.asin(pz / norm) * F.lit(RAD2DEG)).alias("lat"),
            (F.atan2(py, px) * F.lit(RAD2DEG)).alias("lng"),
        )

    return _let(
        {
            "px": lookup("c", 0) + u * lookup("e1", 0) + w * lookup("e2", 0),
            "py": lookup("c", 1) + u * lookup("e1", 1) + w * lookup("e2", 1),
            "pz": lookup("c", 2) + u * lookup("e1", 2) + w * lookup("e2", 2),
        },
        from_p,
    )


def hex_cell_center(cell: Column, res: int) -> tuple[Column, Column]:
    """Cell id → (lat, lng) center degrees."""
    ll = _let(
        {"s": _decode_uv(cell, res)},
        lambda r: _uv_to_sphere_struct(r["s"]["face"], r["s"]["u"], r["s"]["w"]),
    )
    return ll.getField("lat"), ll.getField("lng")


def hex_parent(cell: Column, child_res: int, parent_res: int) -> Column:
    """Cell → ancestor at a coarser res (H3_CELL_TO_PARENT shape):
    child center in the face plane, re-bucketed on the parent lattice.
    Pure arithmetic — no trig, no face reassignment (the child's face
    is the parent's face by construction)."""
    if parent_res >= child_res:
        raise ValueError("parent_res must be coarser than child_res")
    a00, a01, a10, a11 = _axial_fwd(parent_res)

    def from_uv(s: Column) -> Column:
        u, w = s["u"], s["w"]
        return _cube_round_pack(
            parent_res,
            s["face"],
            u * F.lit(a00) + w * F.lit(a01),
            u * F.lit(a10) + w * F.lit(a11),
        )

    return _let(
        {"s": _decode_uv(cell, child_res)}, lambda r: from_uv(r["s"])
    )


def hex_boundary_wkt(cell: Column, res: int) -> Column:
    """Cell id → closed hexagon boundary WKT
    (H3_CELL_TO_BOUNDARY_WKT shape, East-Asia-…md:264-268)."""
    corners = _corners(res)

    def from_uv(s: Column) -> Column:
        face, u, w = s["face"], s["u"], s["w"]
        pieces: list[Column] = [F.lit("POLYGON ((")]
        for k in range(7):
            du, dw = corners[k % 6]
            ll = _uv_to_sphere_struct(face, u + F.lit(du), w + F.lit(dw))
            if k:
                pieces.append(F.lit(", "))
            pieces += [
                F.format_string(
                    "%.7f %.7f", ll.getField("lng"), ll.getField("lat")
                )
            ]
        pieces.append(F.lit("))"))
        return F.concat(*pieces)

    return _let({"s": _decode_uv(cell, res)}, lambda r: from_uv(r["s"]))


# --- vectorized numpy twin (same constants, same operation order) ----------
#
# The native Column version above evaluates ~60 let-bound expressions
# per row through CodegenFallback higher-order functions (~10 µs/row —
# measured 1.8 s of a 2.6 s 200k-row heatmap). This twin does the
# identical arithmetic over whole numpy arrays inside one Arrow batch
# (~0.05 µs/row), for hot aggregation paths. Bit parity with the
# Column/SQL versions holds because every +,*,/ is IEEE-754 double in
# the SAME association order, and cos/sin resolve to the platform libm
# in both numpy and DuckDB (tests/test_layout.py asserts exact id
# equality against the Column version on fixture + random points).


def hex_cell_np(
    lat: np.ndarray, lng: np.ndarray, res: int = 7
) -> np.ndarray:
    """(lat, lng) degree arrays → packed cell ids (int64), vectorized.

    Operation-order clone of hex_cell()/hex_cell_select_sql: chained
    left-associated dot products, floor(x+0.5) cube rounding, dot ties
    → larger fid."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res out of range: {res}")
    lat = np.asarray(lat, dtype="f8")
    lng = np.asarray(lng, dtype="f8")
    latr = lat * DEG2RAD
    lngr = lng * DEG2RAD
    vx = np.cos(latr) * np.cos(lngr)
    vy = np.cos(latr) * np.sin(lngr)
    vz = np.sin(latr)

    # argmax face, ties → larger fid (ascending scan with >=)
    best_dot = np.full(lat.shape, -np.inf)
    face = np.zeros(lat.shape, dtype=np.int64)
    dots = []
    for k, f in enumerate(FACES):
        d = vx * f["c"][0] + vy * f["c"][1] + vz * f["c"][2]
        dots.append(d)
        take = d >= best_dot
        best_dot = np.where(take, d, best_dot)
        face = np.where(take, k, face)

    e1n = np.zeros_like(vx)
    e2n = np.zeros_like(vx)
    dot = np.zeros_like(vx)
    for k, f in enumerate(FACES):
        sel = face == k
        if not sel.any():
            continue
        e1n = np.where(
            sel, vx * f["e1"][0] + vy * f["e1"][1] + vz * f["e1"][2], e1n
        )
        e2n = np.where(
            sel, vx * f["e2"][0] + vy * f["e2"][1] + vz * f["e2"][2], e2n
        )
        dot = np.where(sel, dots[k], dot)
    u = e1n / dot
    w = e2n / dot

    a00, a01, a10, a11 = _axial_fwd(res)
    qf = u * a00 + w * a01
    rf = u * a10 + w * a11
    yf = -qf - rf
    rq = np.floor(qf + 0.5).astype(np.int64)
    ry = np.floor(yf + 0.5).astype(np.int64)
    rr = np.floor(rf + 0.5).astype(np.int64)
    dq = np.abs(rq.astype("f8") - qf)
    dy = np.abs(ry.astype("f8") - yf)
    dr = np.abs(rr.astype("f8") - rf)
    q_bad = (dq > dy) & (dq > dr)
    i = np.where(q_bad, -ry - rr, rq)
    j = np.where(~q_bad & ~(dy > dr), -rq - ry, rr)
    return (
        np.int64(int(res) << 58)
        + face * np.int64(1 << 52)
        + (i + _IJ_OFF) * np.int64(_IJ_SPAN)
        + (j + _IJ_OFF)
    )


def hex_boundary_wkt_np(cells: np.ndarray, res: int) -> list:
    """Cell id array → closed hexagon boundary WKT strings, vectorized.

    Operation-order clone of hex_boundary_wkt(): decode (face, i, j) →
    center (u, w) via the axial-inverse matrix, then for each of the 7
    ring points (k % 6 corner offsets) the inverse gnomonic
    p = c + u·e1 + w·e2 normalized to the sphere, formatted '%.7f %.7f'
    (lng lat). All trig resolves to the same libm the Column version's
    JVM intrinsics match on this platform (tests assert string
    equality against the Column rendition on the fixture)."""
    cells = np.asarray(cells, dtype=np.int64)
    face = ((cells >> 52) & 63).astype(np.int64)
    i = (((cells >> 26) & (_IJ_SPAN - 1)) - _IJ_OFF).astype("f8")
    j = ((cells & (_IJ_SPAN - 1)) - _IJ_OFF).astype("f8")
    b00, b01, b10, b11 = _axial_inv(res)
    u = i * b00 + j * b01
    w = i * b10 + j * b11

    C = np.array([f["c"] for f in FACES])    # (20, 3)
    E1 = np.array([f["e1"] for f in FACES])
    E2 = np.array([f["e2"] for f in FACES])
    c_f, e1_f, e2_f = C[face], E1[face], E2[face]   # (n, 3)

    corners = _corners(res)
    lngs, lats = [], []
    for k in range(7):
        du, dw = corners[k % 6]
        uu = u + du
        ww = w + dw
        px = c_f[:, 0] + uu * e1_f[:, 0] + ww * e2_f[:, 0]
        py = c_f[:, 1] + uu * e1_f[:, 1] + ww * e2_f[:, 1]
        pz = c_f[:, 2] + uu * e1_f[:, 2] + ww * e2_f[:, 2]
        norm = np.sqrt(px * px + py * py + pz * pz)
        lats.append(np.arcsin(pz / norm) * RAD2DEG)
        lngs.append(np.arctan2(py, px) * RAD2DEG)
    return [
        "POLYGON (("
        + ", ".join(
            "%.7f %.7f" % (lngs[k][n], lats[k][n]) for k in range(7)
        )
        + "))"
        for n in range(len(cells))
    ]


def hex_center_np(
    cells: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray]:
    """Cell id array → (lat, lng) center degrees, vectorized — the
    numpy twin of hex_cell_center() (same decode + inverse gnomonic
    with zero corner offset)."""
    cells = np.asarray(cells, dtype=np.int64)
    face = ((cells >> 52) & 63).astype(np.int64)
    i = (((cells >> 26) & (_IJ_SPAN - 1)) - _IJ_OFF).astype("f8")
    j = ((cells & (_IJ_SPAN - 1)) - _IJ_OFF).astype("f8")
    b00, b01, b10, b11 = _axial_inv(res)
    u = i * b00 + j * b01
    w = i * b10 + j * b11
    C = np.array([f["c"] for f in FACES])
    E1 = np.array([f["e1"] for f in FACES])
    E2 = np.array([f["e2"] for f in FACES])
    c_f, e1_f, e2_f = C[face], E1[face], E2[face]
    px = c_f[:, 0] + u * e1_f[:, 0] + w * e2_f[:, 0]
    py = c_f[:, 1] + u * e1_f[:, 1] + w * e2_f[:, 1]
    pz = c_f[:, 2] + u * e1_f[:, 2] + w * e2_f[:, 2]
    norm = np.sqrt(px * px + py * py + pz * pz)
    return np.arcsin(pz / norm) * RAD2DEG, np.arctan2(py, px) * RAD2DEG


def hex_export_arrow(cell: Column, res: int) -> Column:
    """Center (lat, lng) + boundary WKT in ONE vectorized Arrow pass —
    struct(center_lat, center_lng, boundary). The export hot path:
    replaces a per-row let-bound chain (~60 CodegenFallback struct
    evaluations for the center plus 7 inverse projections for the
    boundary) with two numpy sweeps over the whole batch."""
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField as SF,
        StructType as ST,
    )

    out_t = ST([
        SF("center_lat", DoubleType()),
        SF("center_lng", DoubleType()),
        SF("boundary", StringType()),
    ])

    @F.pandas_udf(out_t)
    def _udf(cell_s: pd.Series) -> pd.DataFrame:
        ids = cell_s.to_numpy(dtype=np.int64)
        lat, lng = hex_center_np(ids, res)
        wkt = hex_boundary_wkt_np(ids, res)
        return pd.DataFrame(
            {"center_lat": lat, "center_lng": lng, "boundary": wkt}
        )

    return _udf(cell)


def hex_boundary_wkt_arrow(cell: Column, res: int) -> Column:
    """hex_boundary_wkt as ONE vectorized Arrow pass — same strings as
    the Column rendition at a fraction of the per-row cost (the
    let-bound HOF chain is CodegenFallback and pays ~60 struct
    evaluations per row; the numpy twin runs whole-batch). Use in
    export hot paths; the Column version remains for spark.sql
    registration."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _udf(cell_s: pd.Series) -> pd.Series:
        valid = cell_s.notna()
        out = pd.Series([None] * len(cell_s), index=cell_s.index, dtype=object)
        if valid.any():
            out[valid] = hex_boundary_wkt_np(
                cell_s[valid].to_numpy(dtype=np.int64), res
            )
        return out

    return _udf(cell)


def hex_cell_arrow(lat: Column, lng: Column, res: int = 7) -> Column:
    """hex_cell as ONE vectorized Arrow pass (pandas UDF over
    hex_cell_np) — same ids as hex_cell(), ~200× less per-row cost.
    Use in aggregation hot paths; the Column version remains for
    contexts that must stay UDF-free (spark.sql registration,
    streaming state expressions)."""
    @F.pandas_udf(LongType())
    def _udf(lat_s: pd.Series, lng_s: pd.Series) -> pd.Series:
        valid = lat_s.notna() & lng_s.notna()
        out = pd.Series([None] * len(lat_s), index=lat_s.index, dtype="Int64")
        if valid.any():
            ids = hex_cell_np(
                lat_s[valid].to_numpy(dtype="f8"),
                lng_s[valid].to_numpy(dtype="f8"),
                res,
            )
            out[valid] = ids
        return out

    return _udf(lat, lng)


# --- DuckDB oracle SQL (same constants, same operation order) --------------


def faces_cte_sql() -> str:
    """`faces(fid, cx, cy, cz, e1x, e1y, e1z, e2x, e2y, e2z)` VALUES
    table from the module constants."""
    rows = ",\n              ".join(
        f"({k}, {f['c'][0]!r}, {f['c'][1]!r}, {f['c'][2]!r}, "
        f"{f['e1'][0]!r}, {f['e1'][1]!r}, {f['e1'][2]!r}, "
        f"{f['e2'][0]!r}, {f['e2'][1]!r}, {f['e2'][2]!r})"
        for k, f in enumerate(FACES)
    )
    return (
        "faces(fid, cx, cy, cz, e1x, e1y, e1z, e2x, e2y, e2z) AS (\n"
        f"            VALUES {rows}\n          )"
    )


def _cube_round_sql(qf: str, rf: str) -> tuple[str, str]:
    yf = f"(-({qf}) - ({rf}))"
    rq = f"floor(({qf}) + 0.5)::BIGINT"
    ry = f"floor(({yf}) + 0.5)::BIGINT"
    rr = f"floor(({rf}) + 0.5)::BIGINT"
    dq = f"abs({rq}::DOUBLE - ({qf}))"
    dy = f"abs({ry}::DOUBLE - ({yf}))"
    dr = f"abs({rr}::DOUBLE - ({rf}))"
    q_bad = f"(({dq} > {dy}) AND ({dq} > {dr}))"
    i = f"(CASE WHEN {q_bad} THEN -{ry} - {rr} ELSE {rq} END)"
    j = (
        f"(CASE WHEN NOT {q_bad} AND NOT ({dy} > {dr}) "
        f"THEN -{rq} - {ry} ELSE {rr} END)"
    )
    return i, j


def _pack_sql(res: int, face: str, i: str, j: str) -> str:
    return (
        f"({int(res) << 58} + ({face})::BIGINT * {1 << 52} + "
        f"(({i}) + {_IJ_OFF}) * {_IJ_SPAN} + (({j}) + {_IJ_OFF}))"
    )


def hex_cell_select_sql(
    src_sql: str, id_cols: str, lat_expr: str, lng_expr: str, res: int = 7
) -> str:
    """Full SELECT producing (id_cols…, cell) from `src_sql` — the
    argmax over 20 faces needs a CTE join + window, so unlike
    grid_cell_sql this is a subquery factory, not an inline expression.

    The arithmetic ORDER matches hex_cell exactly: same literals, same
    association, floor(x+0.5) rounding, ties on dot → larger fid."""
    a00, a01, a10, a11 = _axial_fwd(res)
    qf = f"(u * {a00!r} + w * {a01!r})"
    rf = f"(u * {a10!r} + w * {a11!r})"
    i, j = _cube_round_sql(qf, rf)
    cell = _pack_sql(res, "fid", i, j)
    return f"""
        WITH {faces_cte_sql()},
        pts AS (SELECT {id_cols}, ({lat_expr}) AS lat, ({lng_expr}) AS lng
                FROM {src_sql}),
        vecs AS (
          SELECT *,
                 cos(lat * {DEG2RAD!r}) * cos(lng * {DEG2RAD!r}) AS vx,
                 cos(lat * {DEG2RAD!r}) * sin(lng * {DEG2RAD!r}) AS vy,
                 sin(lat * {DEG2RAD!r}) AS vz
          FROM pts
        ),
        cand AS (
          SELECT vecs.*, f.fid, f.e1x, f.e1y, f.e1z, f.e2x, f.e2y, f.e2z,
                 (vx * f.cx + vy * f.cy + vz * f.cz) AS dot,
                 row_number() OVER (
                   PARTITION BY {id_cols}
                   ORDER BY (vx * f.cx + vy * f.cy + vz * f.cz) DESC,
                            f.fid DESC
                 ) AS rk
          FROM vecs CROSS JOIN faces f
        ),
        uv AS (
          SELECT {id_cols}, fid,
                 (vx * e1x + vy * e1y + vz * e1z) / dot AS u,
                 (vx * e2x + vy * e2y + vz * e2z) / dot AS w
          FROM cand WHERE rk = 1
        )
        SELECT {id_cols}, {cell} AS cell FROM uv
    """


def hex_export_select_sql(fine_sql: str, res: int) -> str:
    """DuckDB twin of the hex_export_arrow stage over a subquery
    producing (cell, num_recs): SELECT cell, num_recs,
    round(center_lat, 6), round(center_lng, 6), boundary WKT.

    Operation-order clone of hex_center_np / hex_boundary_wkt_np:
    decode (face, i, j) → center (u, w) via the axial-inverse matrix,
    per-face constants from the faces VALUES CTE, inverse gnomonic
    p = c + (u+du)·e1 + (w+dw)·e2 normalized to the sphere, corners
    rendered printf('%.7f %.7f') lng-lat with corner 6 = corner 0.
    asin/atan2/sqrt resolve to the same correctly-rounded libm results
    the numpy kernel produces on this platform (the existing
    hex_cell_select_sql precedent already pins cos/sin parity), and
    the 7-decimal rendering absorbs any residual ulp."""
    b00, b01, b10, b11 = _axial_inv(res)
    corners = _corners(res)

    # per-corner p-vector columns (corner index 6 reuses 0); 'c' is the
    # zero-offset center for center_lat/lng
    def pcols() -> str:
        cols = []
        for tag, du, dw in [("c", 0.0, 0.0)] + [
            (str(k), du, dw) for k, (du, dw) in enumerate(corners)
        ]:
            uu = "u" if du == 0.0 else f"(u + {du!r})"
            ww = "w" if dw == 0.0 else f"(w + {dw!r})"
            for comp in ("x", "y", "z"):
                cols.append(
                    f"(c{comp} + {uu} * e1{comp} + {ww} * e2{comp}) "
                    f"AS p{tag}{comp}"
                )
        return ",\n                 ".join(cols)

    def ll(tag: str) -> tuple[str, str]:
        norm = (
            f"sqrt(p{tag}x * p{tag}x + p{tag}y * p{tag}y "
            f"+ p{tag}z * p{tag}z)"
        )
        lat = f"(asin(p{tag}z / {norm}) * {RAD2DEG!r})"
        lng = f"(atan2(p{tag}y, p{tag}x) * {RAD2DEG!r})"
        return lat, lng

    corner_strs = []
    for k in list(range(6)) + [0]:
        lat, lng = ll(str(k))
        corner_strs.append(f"printf('%.7f %.7f', {lng}, {lat})")
    ring = " || ', ' || ".join(corner_strs)
    clat, clng = ll("c")
    return f"""
        WITH {faces_cte_sql()},
        fine AS ({fine_sql}),
        dec AS (
          SELECT cell, num_recs,
                 ((cell >> 52) & 63) AS fid,
                 (((cell >> 26) & {_IJ_SPAN - 1}) - {_IJ_OFF})::DOUBLE AS i,
                 ((cell & {_IJ_SPAN - 1}) - {_IJ_OFF})::DOUBLE AS j
          FROM fine
        ),
        uvw AS (
          SELECT cell, num_recs, fid,
                 (i * {b00!r} + j * {b01!r}) AS u,
                 (i * {b10!r} + j * {b11!r}) AS w
          FROM dec
        ),
        pv AS (
          SELECT cell, num_recs,
                 {pcols()}
          FROM uvw JOIN faces f ON f.fid = uvw.fid
        )
        SELECT cell, num_recs,
               round({clat}, 6) AS center_lat,
               round({clng}, 6) AS center_lng,
               ('POLYGON ((' || {ring} || '))') AS boundary
        FROM pv ORDER BY cell
    """


def hex_parent_sql(cell_expr: str, child_res: int, parent_res: int) -> str:
    """Inline ANSI twin of hex_parent (no face join needed — pure
    arithmetic on the packed id)."""
    face = f"((({cell_expr}) >> 52) & 63)"
    i = f"(((({cell_expr}) >> 26) & {_IJ_SPAN - 1}) - {_IJ_OFF})"
    j = f"((({cell_expr}) & {_IJ_SPAN - 1}) - {_IJ_OFF})"
    b00, b01, b10, b11 = _axial_inv(child_res)
    u = f"(({i})::DOUBLE * {b00!r} + ({j})::DOUBLE * {b01!r})"
    w = f"(({i})::DOUBLE * {b10!r} + ({j})::DOUBLE * {b11!r})"
    a00, a01, a10, a11 = _axial_fwd(parent_res)
    qf = f"(({u}) * {a00!r} + ({w}) * {a01!r})"
    rf = f"(({u}) * {a10!r} + ({w}) * {a11!r})"
    pi, pj = _cube_round_sql(qf, rf)
    return _pack_sql(parent_res, face, pi, pj)


# --- k-ring neighbors (H3 grid_disk shape) ---------------------------------

# axial 1-ring offsets (pointy-top axial coords), fixed order
HEX_RING1 = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def hex_disk(cell: Column) -> Column:
    """Cell id → array of 7 ids (self + 6 axial neighbors) — the
    H3 grid_disk(k=1) shape, pure integer bit arithmetic on the packed
    (res, face, i, j) id: neighbors stay on the cell's face (the
    face-clip deviation documented in the module header), so the op is
    exact and engine-portable. Used for focal (neighborhood) sums over
    heatmaps."""
    ids = [cell]
    for di, dj in HEX_RING1:
        ids.append(cell + F.lit(di * _IJ_SPAN + dj).cast("long"))
    return F.array(*ids)


def hex_disk_sql(cell_expr: str) -> str:
    """DuckDB twin: list literal of the same 7 packed-id offsets."""
    parts = [f"({cell_expr})"]
    for di, dj in HEX_RING1:
        parts.append(f"(({cell_expr}) + {di * _IJ_SPAN + dj})")
    return "[" + ", ".join(parts) + "]"
