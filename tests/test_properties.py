"""Property-based tests (hypothesis): algebraic invariants of the WKB
kernels and layout codes over randomized geometry — the structured
complement to the fixed golden fixtures."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gis_etl_spark.geom import wkb as K
from gis_etl_spark.layout.sfc import hilbert_encode_np, hilbert_from_lattice


def _poly(ring):
    out = bytearray(struct.pack("<BII", 1, 3, 1))
    out += struct.pack("<I", len(ring))
    for x, y in ring:
        out += struct.pack("<2d", x, y)
    return bytes(out)


coords = st.floats(
    min_value=-179.0, max_value=179.0, allow_nan=False, allow_infinity=False
)


@st.composite
def rings(draw):
    """Provably-simple closed rings: affine images of convex polygons
    inscribed in the unit circle. (Sorted-angle + random-radius
    'star' construction is NOT sufficient — extreme radius ratios
    produce self-intersections, found by this very suite.)"""
    cx = draw(coords)
    cy = draw(st.floats(min_value=-89.0, max_value=89.0, allow_nan=False))
    n = draw(st.integers(min_value=3, max_value=12))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    # strictly increasing angles on the circle → convex → simple
    gaps = rng.uniform(0.1, 1.0, n)
    angles = 2 * np.pi * np.cumsum(gaps) / gaps.sum()
    unit = np.column_stack([np.cos(angles), np.sin(angles)])
    theta = rng.uniform(0, 2 * np.pi)
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    scale = np.diag(rng.uniform(0.01, 0.5, 2))
    pts_arr = unit @ (rot @ scale).T + np.array([cx, cy])
    pts = [(float(x), float(y)) for x, y in pts_arr]
    pts.append(pts[0])
    return pts


@settings(max_examples=200, deadline=None)
@given(rings())
def test_flip_involution(ring):
    buf = _poly(ring)
    assert K.flip(K.flip(buf)) == buf


@settings(max_examples=200, deadline=None)
@given(rings())
def test_centroid_inside_bbox(ring):
    buf = _poly(ring)
    cx, cy = K.centroid(buf)
    xmin, ymin, xmax, ymax = K.bbox(buf)
    assert xmin - 1e-9 <= cx <= xmax + 1e-9
    assert ymin - 1e-9 <= cy <= ymax + 1e-9


@settings(max_examples=200, deadline=None)
@given(rings())
def test_flip_swaps_centroid_and_bbox(ring):
    buf = _poly(ring)
    cx, cy = K.centroid(buf)
    fx, fy = K.centroid(K.flip(buf))
    assert abs(fx - cy) < 1e-9 and abs(fy - cx) < 1e-9
    xmin, ymin, xmax, ymax = K.bbox(buf)
    fxmin, fymin, fxmax, fymax = K.bbox(K.flip(buf))
    assert (fxmin, fymin, fxmax, fymax) == (ymin, xmin, ymax, xmax)


@settings(max_examples=200, deadline=None)
@given(rings())
def test_wkt_roundtrip_preserves_geometry(ring):
    buf = _poly(ring)
    back = K.from_wkt(K.to_wkt(buf))
    c1, c2 = K.centroid(buf), K.centroid(back)
    assert abs(c1[0] - c2[0]) < 1e-9 and abs(c1[1] - c2[1]) < 1e-9


@settings(max_examples=200, deadline=None)
@given(rings())
def test_batch_kernel_agrees_with_scalar(ring):
    buf = _poly(ring)
    bx, by = K.centroid_batch([buf])
    sx, sy = K.centroid(buf)
    assert abs(bx[0] - sx) < 1e-9 and abs(by[0] - sy) < 1e-9


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**16 - 1),
    st.integers(min_value=0, max_value=2**16 - 1),
)
def test_hilbert_neighbors_are_close(iy, ix):
    """Moving one lattice step changes the Hilbert index, and the
    curve position of spatial neighbors differs far less than random
    pairs on average — spot form: identical points share a key."""
    k1 = hilbert_from_lattice(
        np.array([iy], dtype=np.uint64), np.array([ix], dtype=np.uint64)
    )[0]
    k2 = hilbert_from_lattice(
        np.array([iy], dtype=np.uint64), np.array([ix], dtype=np.uint64)
    )[0]
    assert k1 == k2  # deterministic
    if ix + 1 < 2**16:
        k3 = hilbert_from_lattice(
            np.array([iy], dtype=np.uint64),
            np.array([ix + 1], dtype=np.uint64),
        )[0]
        assert k3 != k1


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
)
def test_hilbert_degree_encoding_total(lat, lon):
    k = hilbert_encode_np(np.array([lat]), np.array([lon]))[0]
    assert 0 <= int(k) < 2**32


@given(
    st.lists(
        st.tuples(
            st.floats(-100, 100, allow_nan=False, width=32),
            st.floats(-100, 100, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=40,
    ),
    st.floats(0.01, 10.0, allow_nan=False),
)
@settings(max_examples=60, deadline=None)
def test_simplify_deviation_bound(pts, tol):
    """THE Douglas-Peucker contract: every dropped vertex lies within
    `tol` of the simplified polyline; endpoints always survive."""
    import struct

    import numpy as np

    from gis_etl_spark.geom import wkb as K

    line = struct.pack("<BII", 1, 2, len(pts)) + b"".join(
        struct.pack("<2d", float(x), float(y)) for x, y in pts
    )
    _, parts = K.parse(K.simplify(line, tol))
    simp = parts[0][0][:, :2]
    assert tuple(simp[0]) == tuple(map(float, pts[0]))
    assert tuple(simp[-1]) == tuple(map(float, pts[-1]))

    def dist_to_chain(p):
        best = float("inf")
        for a, b in zip(simp[:-1], simp[1:]):
            seg = b - a
            L2 = float(seg @ seg)
            t = (
                0.0
                if L2 == 0
                else max(0.0, min(1.0, float((p - a) @ seg) / L2))
            )
            proj = a + t * seg
            best = min(best, float(np.hypot(*(p - proj))))
        return best

    for x, y in pts:
        assert dist_to_chain(np.array([float(x), float(y)])) <= tol + 1e-9
