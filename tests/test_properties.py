"""Property-based tests (hypothesis): algebraic invariants of the WKB
kernels and layout codes over randomized geometry — the structured
complement to the fixed golden fixtures."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F
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


@given(
    st.floats(-84.9, 84.9, allow_nan=False),
    st.floats(-179.9, 179.9, allow_nan=False),
)
@settings(max_examples=80, deadline=None)
def test_geohash_and_quadkey_hierarchy(lat, lng):
    """Key-family nesting laws on random points: the p−1-char geohash
    prefix names the containing parent cell, the parent cell's bbox
    contains the child's, and the z−1 quadkey is exactly the z quadkey
    div 4 (digit-aligned integer interleave)."""
    ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"

    from gis_etl_spark.layout.sfc import geohash_bbox, tile_bbox

    def gh(lat, lng, p):
        bits = 5 * p
        lon_bits = (bits + 1) // 2
        lat_bits = bits // 2
        x = min((1 << lon_bits) - 1,
                max(0, int((lng + 180.0) / 360.0 * (1 << lon_bits))))
        y = min((1 << lat_bits) - 1,
                max(0, int((lat + 90.0) / 180.0 * (1 << lat_bits))))
        gi = 0
        for i in range(bits):
            b = (
                (x >> (lon_bits - 1 - i // 2)) & 1
                if i % 2 == 0
                else (y >> (lat_bits - 1 - i // 2)) & 1
            )
            gi |= b << (bits - 1 - i)
        return "".join(
            ALPHA[(gi >> (5 * (p - 1 - i))) & 31] for i in range(p)
        )

    child, parent = gh(lat, lng, 6), gh(lat, lng, 5)
    assert child[:5] == parent
    cw, cs, ce, cn = geohash_bbox(child)
    pw, ps, pe, pn = geohash_bbox(parent)
    assert pw <= cw and ps <= cs and ce <= pe and cn <= pn
    assert cw - 1e-9 <= lng <= ce + 1e-9
    assert cs - 1e-9 <= lat <= cn + 1e-9

    import math

    def txy(lat, lng, z):
        n = 1 << z
        x = int((lng + 180.0) / 360.0 * n)
        y = int(
            (1.0 - math.log(math.tan(math.radians(lat))
                            + 1.0 / math.cos(math.radians(lat)))
             / math.pi) / 2.0 * n
        )
        return (min(n - 1, max(0, x)), min(n - 1, max(0, y)))

    def qk(x, y, z):
        return sum(
            (((y >> i) & 1) * 2 + ((x >> i) & 1)) << (2 * i)
            for i in range(z)
        )

    x, y = txy(lat, lng, 10)
    px, py = txy(lat, lng, 9)
    assert (px, py) == (x // 2, y // 2)
    assert qk(px, py, 9) == qk(x, y, 10) // 4
    w, s_, e, n_ = tile_bbox(x, y, 10)
    assert w - 1e-9 <= lng <= e + 1e-9
    assert s_ - 1e-7 <= lat <= n_ + 1e-7


@given(
    st.lists(
        st.tuples(
            st.floats(-50, 50, allow_nan=False, width=16),
            st.floats(-50, 50, allow_nan=False, width=16),
        ),
        min_size=4,
        max_size=25,
    )
)
@settings(max_examples=60, deadline=None)
def test_convex_hull_random_rings(pts):
    """Hull properties on random closed rings: strictly convex CCW
    boundary and every input vertex inside-or-on the hull."""
    import struct

    import numpy as np

    from gis_etl_spark.geom import wkb as K

    ring = pts + [pts[0]]
    poly = struct.pack("<BIII", 1, 3, 1, len(ring)) + b"".join(
        struct.pack("<2d", float(x), float(y)) for x, y in ring
    )
    hull = K.convex_hull(poly)
    btype, hparts = K.parse(hull)
    uniq = {p for p in pts}
    if btype != 3:
        # collinear/coincident degenerate inputs
        assert btype in (1, 2)
        return
    hring = hparts[0][0][:, :2]
    r = hring[:-1]
    nxt = np.roll(r, -1, axis=0)
    nxt2 = np.roll(r, -2, axis=0)
    cross = (nxt[:, 0] - r[:, 0]) * (nxt2[:, 1] - nxt[:, 1]) - (
        nxt[:, 1] - r[:, 1]
    ) * (nxt2[:, 0] - nxt[:, 0])
    assert (cross > 0).all()
    # every vertex within the hull (allow boundary-rule slack)
    xs = np.array([p[0] for p in uniq])
    ys = np.array([p[1] for p in uniq])
    inside = K.contains_point_batch([hull] * len(xs), xs, ys)
    for ok, x, y in zip(inside, xs, ys):
        if ok:
            continue
        d = min(
            _seg_dist(np.array([x, y]), a, b)
            for a, b in zip(hring[:-1], hring[1:])
        )
        assert d < 1e-7, (x, y, d)


def _seg_dist(p, a, b):
    import numpy as np

    seg = b - a
    L2 = float(seg @ seg)
    t = 0.0 if L2 == 0 else max(0.0, min(1.0, float((p - a) @ seg) / L2))
    return float(np.hypot(*(p - (a + t * seg))))


@given(
    st.lists(
        st.tuples(
            st.floats(-179, 179, allow_nan=False, width=16),
            st.floats(-89, 89, allow_nan=False, width=16),
        ),
        min_size=3,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_wkb_text_codecs_roundtrip(pts):
    """Both text codecs are lossless over random polygons: WKB → WKT →
    WKB and WKB → GeoJSON dict → WKB reproduce the input bytes
    (float16-grid coordinates print exactly in both renderings)."""
    import struct

    from gis_etl_spark.geom import wkb as K
    from gis_etl_spark.sources.geojson import (
        from_geojson_geometry,
        to_geojson_geometry,
    )

    ring = pts + [pts[0]]
    poly = struct.pack("<BIII", 1, 3, 1, len(ring)) + b"".join(
        struct.pack("<2d", float(x), float(y)) for x, y in ring
    )
    assert K.from_wkt(K.to_wkt(poly)) == poly
    assert from_geojson_geometry(to_geojson_geometry(poly)) == poly


# --- session-3 operator laws (pure-python twins, no Spark) -----------------


def _ntile_reference(rank: int, n: int, b: int) -> int:
    """Textbook NTILE: first (n mod b) buckets take ceil(n/b) rows."""
    big = n // b + 1
    small = n // b
    rem = n % b
    cut = rem * big
    if rank <= cut:
        return (rank - 1) // big + 1
    return rem + (rank - cut - 1) // small + 1


def _ntile_closed_form(rank: int, n: int, b: int) -> int:
    """The exact expression ops.text.quality_deciles builds in Spark
    (kept in lockstep — the query's decile column is this formula with
    n/b folded in as literals)."""
    size_small = n // b
    size_big = size_small + 1
    cut = (n % b) * size_big
    if rank <= cut:
        return (rank - 1) // size_big + 1
    return (rank - cut - 1) // size_small + (n % b) + 1


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=1_000_000),
    st.integers(min_value=1, max_value=100),
    st.data(),
)
def test_ntile_closed_form_is_ntile(n, b, data):
    if n < b:
        return  # degenerate: size_small = 0; guarded by corpus >> 10
    rank = data.draw(st.integers(min_value=1, max_value=n))
    assert _ntile_closed_form(rank, n, b) == _ntile_reference(rank, n, b)
    # bucket sizes: monotone in rank, every bucket in [1, b]
    d = _ntile_closed_form(rank, n, b)
    assert 1 <= d <= b


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=2, max_value=8),
)
def test_pagerank_symmetry_on_complete_bipartite(m, n):
    """On K(m,n) every same-side node is structurally identical, so the
    integer PageRank must give them identical ranks — and the total
    mass stays within the div-floor loss bound of the scale."""
    from gis_etl_spark.ops.graph import PR_SCALE, pagerank_reference

    edges = []
    for i in range(m):
        for j in range(n):
            edges.append((2 * i, 2 * j + 1))
            edges.append((2 * j + 1, 2 * i))
    rank = pagerank_reference(edges)
    left = {rank[2 * i] for i in range(m)}
    right = {rank[2 * j + 1] for j in range(n)}
    assert len(left) == 1 and len(right) == 1
    assert PR_SCALE * 0.9 <= sum(rank.values()) <= PR_SCALE


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=0, max_value=4_000_000_000),
)
def test_ahash_uniform_shift_invariance(h, w, seed):
    """aHash law: any uniform brightness shift that avoids clipping
    leaves the hash bit-identical (the cross-multiplied compare)."""
    from gis_etl_spark.ops.multimodal import ahash64

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
    c = int(rng.integers(1, 256 - int(px.max())))
    shifted = (px.astype(np.int16) + c).astype(np.uint8)
    assert ahash64(px) == ahash64(shifted)


@settings(max_examples=150, deadline=None)
@given(
    st.floats(min_value=-179.9, max_value=179.9),
    st.floats(min_value=-89.0, max_value=89.0),
    st.floats(min_value=-179.9, max_value=179.9),
    st.floats(min_value=-89.0, max_value=89.0),
)
def test_haversine_metric_laws(lon1, lat1, lon2, lat2):
    """Great-circle distance laws on the python twin of the shared SQL
    text: non-negative, zero iff same point (up to formula rounding),
    symmetric to the last bit (every operation in the formula is
    commutative or odd-symmetric), and bounded by half the great
    circle."""
    import math

    from gis_etl_spark.geom.functions import EARTH_R_M

    k = math.pi / 180.0

    def hav(a, b, c, d):
        sdlat = math.sin(((d - b) * k) / 2)
        sdlon = math.sin(((c - a) * k) / 2)
        x = sdlat * sdlat + math.cos(b * k) * math.cos(d * k) * sdlon * sdlon
        return 2.0 * EARTH_R_M * math.asin(math.sqrt(min(1.0, x)))

    d = hav(lon1, lat1, lon2, lat2)
    assert d >= 0.0
    assert d <= math.pi * EARTH_R_M * 1.0000001
    assert hav(lon2, lat2, lon1, lat1) == d
    assert hav(lon1, lat1, lon1, lat1) == 0.0


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**60), min_size=0,
                 max_size=40),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=1, max_value=16),
)
@settings(max_examples=200, deadline=None)
def test_kmv_shard_merge_associative(shards, k):
    """The KMV mergeability law kmv_overlap_sketch relies on (and its
    docstring states): the k smallest of a union == the k smallest of
    the union of per-shard k-min sketches, for ANY sharding — because
    any global k-min member is necessarily among its own shard's k
    smallest. Pure-python model of the engine's TakeOrdered(K) +
    re-top-K combine."""
    def kmin(values, k):
        return sorted(set(values))[:k]

    global_kmin = kmin([h for s in shards for h in s], k)
    merged = kmin([h for s in shards for h in kmin(s, k)], k)
    assert merged == global_kmin


def test_mixture_weights_sum_and_monotonicity(spark, sf_dir):
    """mixture_temperature_weights invariants: weights sum to 1 within
    rounding (each of the ≤|sources| weights is rounded to 1e-6), are
    strictly positive, and preserve the source-count ORDER while
    compressing its RANGE (the point of temperature smoothing: the
    max/min weight ratio must be strictly below the raw count ratio)."""
    from gis_etl_spark.ops.text import mixture_temperature_weights

    rows = mixture_temperature_weights(spark, sf_dir).collect()
    assert len(rows) >= 2
    tot = sum(r["weight"] for r in rows)
    assert abs(tot - 1.0) <= len(rows) * 1e-6
    assert all(r["weight"] > 0 for r in rows)
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    w = [r["weight"] for r in by_n]
    assert w == sorted(w), "weights must be monotone in counts"
    n_lo, n_hi = by_n[0]["n_docs"], by_n[-1]["n_docs"]
    if n_hi > n_lo:  # smoothing compresses the spread
        assert w[-1] / w[0] < n_hi / n_lo


def test_mixture_token_plan_apportionment(spark, sf_dir):
    """Hamilton apportionment invariants: quotas are nonnegative
    int64s that sum to the budget EXACTLY; each quota is within 1 of
    its exact fractional share (the largest-remainder guarantee); and
    quotas are monotone in units up to the ±1 remainder wiggle."""
    from gis_etl_spark.ops.text import MIX_TOKEN_BUDGET, mixture_token_plan

    rows = mixture_token_plan(spark, sf_dir).collect()
    assert sum(r["quota"] for r in rows) == MIX_TOKEN_BUDGET
    t = sum(r["sqrt_units"] for r in rows)
    for r in rows:
        share = MIX_TOKEN_BUDGET * r["sqrt_units"] / t
        assert r["quota"] >= 0
        assert abs(r["quota"] - share) < 1.0, (r, share)
    by_u = sorted(rows, key=lambda r: (r["sqrt_units"], r["source"]))
    for a, b in zip(by_u, by_u[1:]):
        assert b["quota"] >= a["quota"] - 1


def test_mixture_draw_maximal_prefix(spark, sf_dir):
    """mixture_draw_plan invariant (VERDICT r13 item 2): per source
    the selected set is the MAXIMAL hash-ordered prefix under quota —
    Σ selected tokens ≤ quota, and if any doc was excluded, the FIRST
    excluded doc (in the same hash order) would overflow:
    quota < Σ selected + next-doc tokens. Verified against an
    independent pure-python replay of the hash ordering."""
    import hashlib
    import re

    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.text import (
        MIX_DRAW_BUDGET,
        mixture_draw_plan,
        mixture_token_plan,
    )

    quotas = {
        r["source"]: r["quota"]
        for r in mixture_token_plan(
            spark, sf_dir, budget=MIX_DRAW_BUDGET
        ).collect()
    }
    sel = mixture_draw_plan(spark, sf_dir).collect()
    selected = {}
    for r in sel:
        selected.setdefault(r["source"], set()).add(r["doc_id"])

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    per_source = {}
    for d in docs:
        h = hashlib.md5(str(d["doc_id"]).encode()).hexdigest()
        n = len(re.split(r" +", d["text"].strip()))
        per_source.setdefault(d["source"], []).append((h, d["doc_id"], n))

    truncated = 0
    for src, items in per_source.items():
        items.sort()
        q = quotas[src]
        got = selected.get(src, set())
        cum = 0
        expect = set()
        for h, doc_id, n in items:
            if cum + n > q:
                # first excluded doc must overflow the quota
                assert q < cum + n
                truncated += 1
                break
            cum += n
            expect.add(doc_id)
        assert got == expect, f"{src}: {got ^ expect}"
        assert cum <= q
    assert truncated > 0, "budget must actually truncate at test SF"


def test_pii_spans_offsets_verify_redaction(spark, sf_dir):
    """pii_spans is the offset-level receipt for pii_redact: slicing
    the planted text at every reported (start, len) must reproduce a
    token the corresponding pattern matches, spans of one kind must
    not overlap each other, and replaying the replacement at span
    offsets (card→ssn→phone→email→ipv4, non-overlapping spans only)
    must agree with an independent python re replay."""
    import re

    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.text import (
        _PII_PATTERNS,
        pii_planted_txt,
        pii_spans,
    )

    docs = read_table(spark, sf_dir, "documents")
    planted = {
        r["doc_id"]: r["t"]
        for r in docs.select("doc_id", pii_planted_txt().alias("t")).collect()
    }
    spans = pii_spans(spark, sf_dir).collect()
    assert spans, "planted corpus must produce spans"
    by_doc_kind = {}
    for s in spans:
        txt = planted[s["doc_id"]]
        piece = txt[s["start"] - 1 : s["start"] - 1 + s["len"]]
        assert re.fullmatch(_PII_PATTERNS[s["kind"]], piece), (s, piece)
        by_doc_kind.setdefault((s["doc_id"], s["kind"]), []).append(
            (s["start"], s["len"])
        )
    kinds_seen = {k for (_, k) in by_doc_kind}
    assert kinds_seen == set(_PII_PATTERNS), kinds_seen
    for (doc_id, kind), ss in by_doc_kind.items():
        ss.sort()
        # same-kind spans never overlap, and match python's re scan
        for (a, al), (b, _bl) in zip(ss, ss[1:]):
            assert a + al <= b
        txt = planted[doc_id]
        ref = [
            (m.start() + 1, m.end() - m.start())
            for m in re.finditer(_PII_PATTERNS[kind], txt)
        ]
        assert ss == ref, (doc_id, kind, ss, ref)


def test_pii_luhn_split(spark, sf_dir):
    """The Luhn audit distinguishes the planted valid (every 17th doc)
    from the planted invalid (every 19th) card: n_cards counts both
    shapes, n_cards_luhn only the valid one."""
    from gis_etl_spark.ops.text import pii_redact

    rows = {r["doc_id"]: r for r in pii_redact(spark, sf_dir).collect()}
    checked_valid = checked_invalid = 0
    for doc_id, r in rows.items():
        v = 1 if doc_id % 17 == 0 else 0
        i = 1 if doc_id % 19 == 0 else 0
        assert r["n_cards"] == v + i, (doc_id, r)
        assert r["n_cards_luhn"] == v, (doc_id, r)
        checked_valid += v
        checked_invalid += i
    assert checked_valid and checked_invalid


def test_corpus_funnel_monotone_and_consistent(spark, sf_dir):
    """corpus_build_funnel invariants: every source reports all 5
    stages; per source the funnel is monotone non-increasing in both
    docs and tokens; and the near_dedup stage equals the standalone
    dedup_apply_keepers after-columns exactly (the composition reuses
    the keeper policy verbatim, so the two contract queries must
    agree row-for-row)."""
    from gis_etl_spark.ops.corpus import _STAGES, corpus_build_funnel
    from gis_etl_spark.ops.dedup import dedup_apply_keepers

    rows = corpus_build_funnel(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r["source"], {})[r["stage_id"]] = (
            r["n_docs"], r["n_tokens"],
        )
    assert per, "funnel produced no sources"
    for src, stages in per.items():
        assert sorted(stages) == list(range(len(_STAGES))), (src, stages)
        seq = [stages[i] for i in range(len(_STAGES))]
        for a, b in zip(seq, seq[1:]):
            assert a[0] >= b[0] and a[1] >= b[1], (src, seq)
    applied = {
        r["source"]: (r["n_docs_after"], r["n_tokens_after"])
        for r in dedup_apply_keepers(spark, sf_dir).collect()
    }
    for src, stages in per.items():
        assert stages[1] == applied[src], (src, stages[1], applied[src])


def test_corpus_funnel_draw_respects_quota(spark, sf_dir):
    """The funnel's stage-4 totals obey the Hamilton budget: drawn
    tokens ≤ FUNNEL_DRAW_BUDGET globally, and the draw actually
    truncates (drawn < pii_clean survivors) so the maximal-prefix
    path is exercised at this SF."""
    from gis_etl_spark.ops.corpus import (
        FUNNEL_DRAW_BUDGET,
        corpus_build_funnel,
    )

    rows = corpus_build_funnel(spark, sf_dir).collect()
    drawn_t = sum(r["n_tokens"] for r in rows if r["stage_id"] == 4)
    surv_t = sum(r["n_tokens"] for r in rows if r["stage_id"] == 3)
    assert 0 < drawn_t <= FUNNEL_DRAW_BUDGET
    assert drawn_t < surv_t, "budget must truncate at every SF"


def test_ann_drift_stat_flags_the_shifted_batch(spark, sf_dir):
    """ann_drift_stat invariants: one row per coarse list; both
    rollups cover the whole corpus (Σ n == |embeddings|); every list
    the drifted batch lands in reads materially worse than baseline
    (drift_x1000 > 1000 — the monitor must actually fire on a
    +0.5/dim mean shift); empty lists report zeros and NULL
    averages."""
    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.similarity import K_KMEANS, ann_drift_stat

    rows = ann_drift_stat(spark, sf_dir).collect()
    assert [r["list_id"] for r in rows] == list(range(K_KMEANS))
    n_emb = read_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_train"] for r in rows) == n_emb
    assert sum(r["n_inc"] for r in rows) == n_emb
    fired = [r for r in rows if r["n_inc"] > 0 and r["n_train"] > 0]
    assert fired, "the shifted batch must land in some trained list"
    for r in fired:
        assert r["drift_x1000"] > 1000, dict(r.asDict())
    for r in rows:
        if r["n_inc"] == 0:
            assert r["err_units_inc"] == 0
            assert r["avg_units_inc"] is None


def test_training_corpus_matches_funnel_card(spark, sf_dir):
    """build_training_corpus is EXACTLY the corpus the funnel card's
    mixture_draw stage describes: per-source doc counts and token
    sums agree, and every written doc passed every gate (it appears
    in the pii_clean survivor set)."""
    from pyspark.sql import functions as F

    from gis_etl_spark.ops.corpus import (
        build_training_corpus,
        corpus_build_funnel,
    )
    from gis_etl_spark.ops.text import words_col

    corpus = build_training_corpus(spark, sf_dir)
    per = {
        r["source"]: (r["n"], r["t"])
        for r in corpus.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.size(words_col(F.col("text")))).alias("t"),
        )
        .collect()
    }
    card = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in corpus_build_funnel(spark, sf_dir).collect()
        if r["stage"] == "mixture_draw" and r["n_docs"] > 0
    }
    assert per == card


def test_mixture_draw_split_equals_plain_and_stays_bucketed(spark, sf_dir):
    """The two-pass range-split draw selects the IDENTICAL set as the
    plain per-source window draw (the refinement must change nothing),
    and its corpus-row windows partition by (source, bucket) — the
    whole point is that no whole-source window partition exists."""
    from gis_etl_spark.ops.text import mixture_draw_plan, mixture_draw_split

    plain = [tuple(r) for r in mixture_draw_plan(spark, sf_dir).collect()]
    split = [tuple(r) for r in mixture_draw_split(spark, sf_dir).collect()]
    assert plain == split and plain

    plan = (
        mixture_draw_split(spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    # every window over corpus rows names the bucket column in its
    # partition spec; only the quota subplan's tiny aggregate windows
    # may single-partition (allowlisted shape)
    import re

    corpus_windows = [
        w for w in re.findall(r"Arguments: \[sum\(n_tokens.*?\]", plan)
    ]
    # the disjunct ADVICE r14 flagged as vacuous is gone: formatted
    # plans never contain the literal "partitionBy", so the only real
    # check is the direct one — corpus-row running-sum windows exist
    # and EVERY one names the _rsb bucket column in its partition spec
    assert corpus_windows
    assert all("_rsb#" in w for w in corpus_windows), corpus_windows


def test_bm25_topk_ranking_invariants(spark, sf_dir):
    """BM25 contract invariants: BM25_NTERMS/2 queries, ranks are a
    contiguous 1..k prefix per query with non-increasing score units,
    query terms are non-stopwords, and every returned doc actually
    contains at least one of its query's terms."""
    import re

    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.text import BM25_NTERMS, BM25_TOPK, STOPWORDS, bm25_topk

    rows = bm25_topk(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == BM25_NTERMS // 2
    texts = {
        r["doc_id"]: set(re.split(r" +", r["text"].strip()))
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOPK
        units = [r["score_units"] for r in rs]
        assert units == sorted(units, reverse=True)
        terms = set(rs[0]["q_terms"].split(" "))
        assert terms and not (terms & set(STOPWORDS))
        for r in rs:
            assert terms & texts[r["doc_id"]], (q, r["doc_id"])


def test_funnel_flags_table_path_equal_and_single_scan(spark, sf_dir):
    """The materialized-flags rendition (VERDICT r14 item 2) is
    output-identical to the in-plan funnel AND collapses the corpus
    scans: with `flags_table`, the funnel card reads ZERO corpus
    files and build_training_corpus reads the corpus exactly once
    (the final drawn-id semi-join projection)."""
    import re

    from gis_etl_spark.ops.corpus import (
        build_training_corpus,
        corpus_build_funnel,
        curation_flags_table,
        materialize_curation_flags,
    )
    from gis_etl_spark.ops.dedup import ensure_documents_aug

    ft = materialize_curation_flags(spark, sf_dir)
    assert ft == curation_flags_table()
    # idempotent while the corpus fingerprint is unchanged
    assert materialize_curation_flags(spark, sf_dir) == ft

    card_plain = [
        tuple(r) for r in corpus_build_funnel(spark, sf_dir).collect()
    ]
    card_flags = [
        tuple(r)
        for r in corpus_build_funnel(
            spark, sf_dir, flags_table=ft
        ).collect()
    ]
    assert card_plain == card_flags and card_plain

    corp_plain = sorted(
        tuple(r) for r in build_training_corpus(spark, sf_dir).collect()
    )
    corp_flags = sorted(
        tuple(r)
        for r in build_training_corpus(
            spark, sf_dir, flags_table=ft
        ).collect()
    )
    assert corp_plain == corp_flags and corp_plain

    def corpus_scans(df):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # detail-section form only ("(N) Scan parquet <table>") — the
        # tree header repeats each scan as "Scan parquet <table> (N)"
        scans = re.findall(r"\(\d+\) Scan parquet ?\S*", plan)
        return [s for s in scans if "curation_flags" not in s]

    aug = ensure_documents_aug()
    assert aug  # the corpus the scans below would name
    assert len(corpus_scans(corpus_build_funnel(spark, sf_dir, flags_table=ft))) == 0
    assert len(corpus_scans(build_training_corpus(spark, sf_dir, flags_table=ft))) == 1


def test_bm25_pruned_equals_plain_and_actually_prunes(spark, sf_dir):
    """The champion-list rung is exact (row-for-row equal to the full
    scorer — also pinned by sharing bm25_topk's oracle in the
    contract) AND non-vacuous: the θ>UB bound must discharge for at
    least one query at this SF, else 'pruned' is all fallback and the
    equality proof proves nothing. Touched share must be a real
    reduction."""
    from gis_etl_spark.ops.text import (
        bm25_prune_stats,
        bm25_topk,
        bm25_topk_pruned,
    )

    plain = [tuple(r) for r in bm25_topk(spark, sf_dir).collect()]
    pruned = [tuple(r) for r in bm25_topk_pruned(spark, sf_dir).collect()]
    assert plain == pruned and plain

    stats = bm25_prune_stats(spark, sf_dir)
    assert stats["safe_query_ids"], stats
    assert stats["touched_pct"] < 50.0, stats
    assert 0 < stats["champion_postings"] < stats["total_postings"]


def test_bm25_stored_serves_without_windowing_postings(
    spark, sf_dir, monkeypatch
):
    """The stored-index serve path is (a) row-identical to the plain
    scorer, (b) structurally cheap: its plan has NO window partitioned
    by (query, token) — the champion rank is a stored column — and (c)
    served ENTIRELY from the catalog tables: with the corpus reader
    monkeypatched to raise, the query still builds and returns
    identical rows. (Until r18 property (c) was pinned by grepping the
    plan text for the postings table name; the r18 shared-probe
    checkpoint in _bm25_serve_from collapses the final plan's leaves
    to ExistingRDD, so the stored-serving receipt is now the
    monkeypatch-to-raise discipline the corpus monitors use — a
    stronger pin than plan text.)"""
    import re

    from gis_etl_spark.ops import text as text_ops
    from gis_etl_spark.ops.text import bm25_topk, bm25_topk_stored

    plain = [tuple(r) for r in bm25_topk(spark, sf_dir).collect()]
    stored = [tuple(r) for r in bm25_topk_stored(spark, sf_dir).collect()]
    assert plain == stored and plain

    df = bm25_topk_stored(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # no window is ordered by the per-posting score — the champion
    # rank (the only sc-ordered window in the in-plan rung) is a
    # stored column here. Remaining windows: the 8-row qterms ranking
    # (corpus_tf) and the per-query candidate rank (score_units).
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "sc#" not in spec, spec

    # (c) stored-serving: the index tables exist now, so a re-serve
    # must never touch the corpus parquet — raise if it tries.
    def _boom(*a, **k):  # noqa: ANN002, ANN003
        raise AssertionError(
            "bm25_topk_stored read the corpus — stored serve must come "
            "from the catalog tables only"
        )

    monkeypatch.setattr(text_ops, "read_table", _boom)
    again = [
        tuple(r) for r in bm25_topk_stored(spark, sf_dir).collect()
    ]
    assert again == stored


def test_bm25_build_champion_ranks_bounded_and_exact(spark, sf_dir):
    """De-skew receipt for the index BUILD (VERDICT r15 item 1):

    (a) semantics — against a naive full ranking of every posting
    list (driver-side, on the fixture): every posting in its token's
    true top-max(k,⌈α·√df⌉) by (sc DESC, doc_id ASC) carries its
    EXACT global rank; every other posting carries the non-champion
    sentinel; stopword postings are dropped entirely (they can never
    be query terms);
    (b) plan — no window partitions by token alone over a raw posting
    list: the full-list pass is salted (token, salt), and the only
    token-partitioned window sits above the bounded survivor filter
    (lrk ≤ depth), so the Zipf-hot token can no longer land its whole
    list in one task."""
    import math
    import re
    from collections import defaultdict

    from gis_etl_spark.ops.text import (
        BM25_CHAMP_ALPHA,
        BM25_NONCHAMP_CRK,
        BM25_TOPK,
        STOPWORDS,
        _bm25_build_frames,
    )

    ranked, _, stats, _ = _bm25_build_frames(
        spark, sf_dir, materialize=False
    )
    dfs = {r["token"]: r["df"] for r in stats.collect()}
    by_tok = defaultdict(list)
    for r in ranked.collect():
        assert r["token"] not in STOPWORDS, r
        by_tok[r["token"]].append(r)
    assert by_tok
    saw_nonchamp = False
    for tok, rs in by_tok.items():
        depth = max(
            BM25_TOPK, math.ceil(BM25_CHAMP_ALPHA * math.sqrt(dfs[tok]))
        )
        rs.sort(key=lambda r: (-r["sc"], r["doc_id"]))
        for i, r in enumerate(rs, 1):
            want = i if i <= depth else BM25_NONCHAMP_CRK
            assert r["crk"] == want, (tok, r["doc_id"], i, depth, r["crk"])
            saw_nonchamp = saw_nonchamp or i > depth
    assert saw_nonchamp, "fixture never exceeded champion depth"

    plan = ranked._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:1500]
    for spec in specs:
        assert re.match(r"token#\d+, (salt|sc)#", spec), spec
    # the token-only (stage 2) window exists and its subtree — printed
    # below it — contains the bounded-survivor filter
    m = re.search(r"windowspecdefinition\(token#\d+, sc#", plan)
    assert m, plan[:1500]
    assert re.search(
        r"lrk#\d+( as bigint\))? <= ", plan[m.start():]
    ), plan[m.start():][:1500]
    # and the salted full-list (stage 1) window exists
    assert re.search(r"windowspecdefinition\(token#\d+, salt#\d+", plan)


def test_incremental_flags_append_matches_full_rebuild(spark, sf_dir, tmp_path):
    """VERDICT r15 item 5, the composition receipt: append the
    deterministic increment's flags (frozen-history probes) to the
    materialized base flags table, and the funnel card read through
    the flags table must equal the card of a FULL in-plan re-derive
    over base ∪ increment written as a corpus — flags, Hamilton
    quotas, and the draw all included. (Row-level equality of the
    increment's flags vs the full re-derive is the
    corpus_flags_increment oracle contract.)"""
    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.dedup import _docs

    docs = _docs(spark)
    inc = CB.increment_docs(docs)
    aug_path = str(tmp_path / "docs_aug2.parquet")
    docs.unionByName(inc).coalesce(1).write.mode("overwrite").parquet(
        aug_path
    )
    want = [
        tuple(r)
        for r in CB.corpus_build_funnel(
            spark, sf_dir, docs_path=aug_path
        ).collect()
    ]
    name = CB.append_curation_flags(spark, sf_dir, inc)
    try:
        got = [
            tuple(r)
            for r in CB.corpus_build_funnel(
                spark, sf_dir, flags_table=name
            ).collect()
        ]
        assert got == want and got
        # the increment genuinely moved the card: raw counts grew
        raw_before = {
            (r["source"], r["n_docs"])
            for r in CB.corpus_build_funnel(spark, sf_dir).collect()
            if r["stage"] == "raw"
        }
        raw_after = {
            (t[2], t[3]) for t in got if t[1] == "raw"
        }
        assert raw_after != raw_before
    finally:
        # the shared flags table now carries increment rows — drop it
        # so other consumers rebuild the base-only artifact on demand
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_flags_increment_risk_marks_real_divergence(spark, sf_dir, tmp_path):
    """The displacement-risk monitor is load-bearing, not decorative:
    on the RISKY increment fixture (the +7M appended-token arm whose
    quality out-ranks its originals) the frozen-history flags GENUINELY
    diverge from a full re-derive — and every diverging increment doc
    is one the monitor marked risky (diverging ⊆ risky), so 'risky ==
    0' is a sound exactness certificate for the keeper channel."""
    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.corpus import (
        _flagged_docs,
        _increment_risk_pairs,
    )
    from gis_etl_spark.ops.dedup import _docs

    docs = _docs(spark)
    inc = CB.increment_docs_risky(docs)
    aug_path = str(tmp_path / "docs_risky.parquet")
    docs.unionByName(inc).coalesce(1).write.mode("overwrite").parquet(
        aug_path
    )
    full = {
        r["doc_id"]: (r["s1"], r["s2"], r["s3"])
        for r in _flagged_docs(spark, sf_dir, aug_path).collect()
        if r["doc_id"] >= 5_000_000
    }
    incr = {
        r["doc_id"]: (r["s1"], r["s2"], r["s3"])
        for r in CB.increment_curation_flags(
            spark, sf_dir, inc
        ).collect()
    }
    assert set(full) == set(incr)
    diverging = {d for d in incr if incr[d] != full[d]}
    assert diverging, "the risky fixture must actually break the approximation"
    risky = {
        r["new_id"]
        for r in _increment_risk_pairs(spark, sf_dir).collect()
        if r["risky"]
    }
    assert risky
    assert diverging <= risky, sorted(diverging - risky)[:10]


def test_risk_monitor_serves_from_stored_snapshot(spark, sf_dir):
    """r17 (the r16 weak): the displacement-risk monitor must PROBE
    stored history, not re-derive it — a monitor that re-runs the
    corpus-wide pair graph + component fixpoint nightly costs what the
    full re-derive it guards costs. Receipt: with the snapshot built,
    the monitor returns its exact census even when every in-plan
    history-derivation path (_member_keepers, label_components,
    _verified_pair_edges) is monkeypatched to raise — so none of them
    can be in its plan — and the optimized plan reads the stored
    quality + members tables."""
    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops import dedup as D

    names = D.build_dedup_snapshot(spark, sf_dir, None, "full")
    want = CB.flags_increment_risk(spark, sf_dir).collect()

    def boom(*a, **k):  # noqa: ANN002, ANN003
        raise AssertionError("monitor re-derived history in-plan")

    import pytest as _pytest

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(D, "_member_keepers", boom)
        mp.setattr(D, "label_components", boom)
        mp.setattr(D, "_verified_pair_edges", boom)
        got = CB.flags_increment_risk(spark, sf_dir).collect()
        # the census localCheckpoints its pair frame (two consumers),
        # which truncates lineage — assert the stored-table reads on
        # the UN-checkpointed per-pair plan
        pair_plan = (
            CB._increment_risk_pairs(spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
            .lower()
        )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert want[0]["n_risky_docs"] > 0  # the canary genuinely fires
    assert names["quality"].lower() in pair_plan
    assert names["members"].lower() in pair_plan


def test_rederive_serves_base_attrs_from_stored_snapshot(spark, sf_dir):
    """r18 (ADVICE r17 high + guide §2.3/§6): the targeted re-derive's
    base-side attributes must come from the STORED snapshot attrs +
    quality tables, not a corpus text scan — the scan was the
    remediation's one history-proportional term AND silently dropped
    scope members whose text lives only in prior increments. Receipt:
    with the snapshot built and the increment frame materialized, the
    remediation returns its exact rows even with every corpus-read
    path (_docs, _member_keepers, _verified_pair_edges) monkeypatched
    to raise, and its optimized plan reads the stored attrs table."""
    import pytest as _pytest

    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops import dedup as D

    names = D.build_dedup_snapshot(spark, sf_dir, None, "full")
    inc = CB.increment_docs_risky(D._docs(spark)).localCheckpoint()
    want = sorted(
        tuple(r)
        for r in CB.rederive_risky_component_flags(
            spark, sf_dir, inc
        ).collect()
    )
    assert want  # the risky canary genuinely produces corrections

    def boom(*a, **k):  # noqa: ANN002, ANN003
        raise AssertionError("remediation re-scanned the corpus")

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(D, "_docs", boom)
        mp.setattr(D, "_member_keepers", boom)
        mp.setattr(D, "_verified_pair_edges", boom)
        fix = CB.rederive_risky_component_flags(spark, sf_dir, inc)
        got = sorted(tuple(r) for r in fix.collect())
        plan = (
            fix._jdf.queryExecution().optimizedPlan().toString().lower()
        )
    assert got == want
    assert names["attrs"].lower() in plan
    assert names["quality"].lower() in plan


def test_rederive_patch_equals_full_rederive(spark, sf_dir, tmp_path):
    """The targeted remediation is EXACT, not approximate: frozen
    flags patched with rederive_risky_component_flags equal a full
    from-scratch re-derive over base ∪ risky increment for EVERY doc
    (base and increment) — while touching only an affected-sized
    subset. The three trigger channels (risky, bridging, chained)
    cover every way a merged component can diverge from the
    frozen-history approximation."""
    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.corpus import _flagged_docs
    from gis_etl_spark.ops.dedup import _docs

    docs = _docs(spark)
    inc = CB.increment_docs_risky(docs)
    aug_path = str(tmp_path / "docs_risky_full.parquet")
    docs.unionByName(inc).coalesce(1).write.mode("overwrite").parquet(
        aug_path
    )

    def flags(df):
        return {
            r["doc_id"]: (r["s1"], r["s2"], r["s3"]) for r in df.collect()
        }

    full = flags(_flagged_docs(spark, sf_dir, aug_path))
    base = flags(_flagged_docs(spark, sf_dir))
    frozen = flags(
        CB.increment_curation_flags(
            spark, sf_dir, inc, use_stored_snapshot=True
        )
    )
    fix = flags(CB.rederive_risky_component_flags(spark, sf_dir, inc))

    unpatched = {**base, **frozen}
    assert set(unpatched) == set(full)
    assert unpatched != full, "risky fixture must genuinely diverge"
    patched = {**unpatched, **fix}
    assert patched == full
    # targeted: the patch is a small, affected-sized subset, yet it
    # includes base-side corrections (a re-crowned keeper's old docs)
    assert fix and len(fix) < 0.5 * len(full)
    assert any(d < 5_000_000 for d in fix), "no base-side corrections"


def test_rederive_serves_from_stored_snapshot(spark, sf_dir):
    """The remediation shares the monitor's stored-serving discipline:
    with the snapshot built, rederive_risky_component_flags returns
    identical rows with every in-plan history-derivation path
    monkeypatched to raise — its closure fixpoint runs only over the
    affected subgraph's edges, never history's."""
    import pytest as _pytest

    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops import dedup as D

    D.build_dedup_snapshot(spark, sf_dir, None, "full")
    docs = D._docs(spark)
    inc = CB.increment_docs_risky(docs)
    want = sorted(
        tuple(r)
        for r in CB.rederive_risky_component_flags(
            spark, sf_dir, inc
        ).collect()
    )

    def boom(*a, **k):  # noqa: ANN002, ANN003
        raise AssertionError("rederive re-derived history in-plan")

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(D, "_member_keepers", boom)
        mp.setattr(D, "_verified_pair_edges", boom)
        got = sorted(
            tuple(r)
            for r in CB.rederive_risky_component_flags(
                spark, sf_dir, inc
            ).collect()
        )
    assert got == want and got


def test_apply_rederive_patches_table_to_full_equality(
    spark, sf_dir, tmp_path
):
    """The monitor→remediation loop's LAST link: after a risky batch
    is appended under the frozen-history approximation,
    apply_rederive_to_flags rewrites the materialized flags TABLE so
    it equals a from-scratch re-derive over base ∪ increment for
    EVERY doc — and refuses to patch (append-then-patch guard) when
    the batch was never appended."""
    import pytest as _pytest

    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.corpus import _flagged_docs
    from gis_etl_spark.ops.dedup import _docs

    docs = _docs(spark)
    inc = CB.increment_docs_risky(docs)
    name = CB.curation_flags_table(None)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    CB.materialize_curation_flags(spark, sf_dir)
    try:
        # patching before the append is a loud error, not a partial
        # table
        with _pytest.raises(ValueError, match="append-then-patch"):
            CB.apply_rederive_to_flags(spark, sf_dir, inc)

        CB.append_curation_flags(spark, sf_dir, inc)
        got_name, n_patched = CB.apply_rederive_to_flags(
            spark, sf_dir, inc
        )
        assert got_name == name and n_patched > 0

        aug_path = str(tmp_path / "docs_risky_tbl.parquet")
        docs.unionByName(inc).coalesce(1).write.mode(
            "overwrite"
        ).parquet(aug_path)
        full = {
            r["doc_id"]: (r["s1"], r["s2"], r["s3"])
            for r in _flagged_docs(spark, sf_dir, aug_path).collect()
        }
        table = {
            r["doc_id"]: (r["s1"], r["s2"], r["s3"])
            for r in spark.table(name).collect()
        }
        assert table == full
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_shared_frames_equal_probe_paths(spark, sf_dir):
    """r17 composition discipline: corpus_flags_rederive materializes
    the stored-probe pair frame and the intra edge set ONCE and shares
    them with the frozen pass and the remediation. The shared paths
    must be row-identical to the independent probe paths — displaced
    ids are the pair frame's distinct new_ids, and clean-intra edges
    are the all-docs edge set filtered to undisplaced endpoints (both
    pairwise properties)."""
    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops import dedup as D
    from pyspark.sql import functions as SF

    names = D.build_dedup_snapshot(spark, sf_dir, None, "full")
    docs = D._docs(spark)
    inc = CB.increment_docs_risky(docs)
    per_pair = CB._risk_pairs_for(spark, names, inc).localCheckpoint()
    intra = (
        D._exact_jaccard(
            inc.select("doc_id", "text"),
            D.minhash_candidates(inc.select("doc_id", "text")),
        )
        .filter(SF.col("jaccard") >= D.MINHASH_JACCARD_T)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    frozen_probe = rows(
        CB.increment_curation_flags(
            spark, sf_dir, inc, use_stored_snapshot=True
        )
    )
    frozen_shared = rows(
        CB.increment_curation_flags(
            spark,
            sf_dir,
            inc,
            use_stored_snapshot=True,
            shared_pairs=per_pair,
            shared_intra=intra,
        )
    )
    assert frozen_probe == frozen_shared and frozen_probe

    fix_probe = rows(
        CB.rederive_risky_component_flags(spark, sf_dir, inc)
    )
    fix_shared = rows(
        CB.rederive_risky_component_flags(
            spark,
            sf_dir,
            inc,
            shared_pairs=per_pair,
            shared_intra=intra,
        )
    )
    assert fix_probe == fix_shared and fix_probe


def test_increment_flags_stored_probe_equals_inplan(spark, sf_dir):
    """The stored-snapshot probe (build_dedup_snapshot scope='full' —
    the production posture corpus_flags_increment serves) is
    row-identical to the in-plan probe over the same increment: the
    snapshot artifacts are per-doc and round-trip parquet exactly, so
    storing them changes nothing but the cost."""
    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.dedup import _docs

    docs = _docs(spark)
    inc = CB.increment_docs(docs)
    inplan = sorted(
        tuple(r)
        for r in CB.increment_curation_flags(spark, sf_dir, inc).collect()
    )
    stored = sorted(
        tuple(r)
        for r in CB.increment_curation_flags(
            spark, sf_dir, inc, use_stored_snapshot=True
        ).collect()
    )
    assert inplan == stored and inplan


def test_compact_curation_flags_preserves_rows_and_shrinks(
    spark, sf_dir
):
    """VERDICT r16 item 8: appends accumulate one parquet file batch
    per increment forever; minor compaction rewrites the flags table
    BYTE-IDENTICALLY (row set unchanged — every consumer provably
    unaffected) while the data-file census shrinks."""
    import glob as _glob
    import os as _os
    from urllib.parse import urlparse

    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.dedup import _docs

    docs = _docs(spark)
    name = CB.curation_flags_table(None)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    CB.materialize_curation_flags(spark, sf_dir)
    try:
        for off in (9_910_000, 9_920_000):
            batch = docs.limit(3).select(
                (F.col("doc_id") + off).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            CB.append_curation_flags(spark, sf_dir, batch)
        before = sorted(
            tuple(r) for r in spark.table(name).collect()
        )
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = _os.path.join(wh, name.lower())
        files_before = len(_glob.glob(_os.path.join(loc, "*.parquet")))
        CB.compact_curation_flags(spark, sf_dir)
        after = sorted(tuple(r) for r in spark.table(name).collect())
        files_after = len(_glob.glob(_os.path.join(loc, "*.parquet")))
        assert after == before and after
        assert files_after < files_before, (files_after, files_before)
        assert files_after == 1  # fixture-sized table → one file
    finally:
        # the shared table now carries test increments — drop so other
        # consumers rebuild the base-only artifact on demand
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_increment_flags_rejects_snapshot_extended_first(spark, sf_dir):
    """VERDICT r16 item 6 / ADVICE r16 (medium): the nightly contract
    is probe-then-extend. An operator who extended the stored snapshot
    with tonight's batch BEFORE flagging it used to make every batch
    doc its own stored duplicate — silently displacing the whole batch
    (s1=False across the board) with no error. The flags path now
    refuses such batches loudly."""
    import pytest as _pytest

    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.dedup import (
        _docs,
        append_to_dedup_snapshot,
        build_dedup_snapshot,
        dedup_snapshot_tables,
    )

    docs = _docs(spark)
    batch = docs.limit(2).select(
        (F.col("doc_id") + 9_500_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    names = build_dedup_snapshot(spark, sf_dir, None, "full")
    append_to_dedup_snapshot(spark, sf_dir, batch, None, "full")
    try:
        with _pytest.raises(ValueError, match="probe-then-extend"):
            CB.increment_curation_flags(
                spark, sf_dir, batch, use_stored_snapshot=True
            )
    finally:
        # the shared full-scope snapshot now carries the test batch —
        # drop + rebuild so later consumers probe clean history
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        build_dedup_snapshot(spark, sf_dir, None, "full")
    assert names == dedup_snapshot_tables(None, "full")


def test_build_dedup_snapshot_refuses_partial_table_set(spark, sf_dir):
    """r18 (ADVICE r17 medium): a durable warehouse built by an older
    engine version has the old snapshot roles but not newly added ones
    (r17 added quality/members, r18 adds attrs). The old short-circuit
    only fired when ALL tables existed, so the first post-upgrade
    invocation silently dropped and rebuilt EVERY table from the base
    corpus — destroying all previously appended increments' artifacts
    while reporting success. Partial existence must refuse loudly."""
    import pytest as _pytest

    from gis_etl_spark.ops.dedup import build_dedup_snapshot

    names = build_dedup_snapshot(spark, sf_dir, None, "full")
    spark.sql(f"DROP TABLE {names['attrs']}")
    try:
        with _pytest.raises(ValueError, match="PARTIAL"):
            build_dedup_snapshot(spark, sf_dir, None, "full")
    finally:
        # restore the shared snapshot for later consumers
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        build_dedup_snapshot(spark, sf_dir, None, "full")


def test_append_snapshot_rejects_non_monotonic_ids(spark, sf_dir):
    """r18 (ADVICE r17 low): the keeper argmax breaks quality ties by
    SMALLER doc_id while the risk monitor's risky channel fires only
    on strictly-higher quality — a tie-quality recrawl ingested under
    a smaller id would win a full re-derive without firing any
    channel. The fixture increments are id-monotone structurally; CLI
    batches are now enforced so at append time."""
    import pytest as _pytest

    from gis_etl_spark.ops.dedup import _docs, append_to_dedup_snapshot

    docs = _docs(spark)
    # fresh id below the stored max (fixture ids reach ~200k) and not
    # already present (corpus ids are 0..499 and 100000+/200000+)
    low = docs.limit(1).select(
        F.lit(9_999).cast("long").alias("doc_id"),
        F.concat(F.lit("unseen low-id text "), "text").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    with _pytest.raises(ValueError, match="monotonically larger"):
        append_to_dedup_snapshot(spark, sf_dir, low)


def test_append_rungs_reject_intra_batch_duplicate_ids(spark, sf_dir):
    """ADVICE r16 (low): the stored-id guards compare the batch against
    the STORED tables only — a batch carrying the same doc_id twice
    passed them and appended duplicated shingle/posting/flag rows, the
    exact double-count corruption class the guards block. All three
    append rungs now also enforce intra-batch uniqueness."""
    import pytest as _pytest

    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.dedup import _docs, append_to_dedup_snapshot
    from gis_etl_spark.ops.text import (
        append_to_bm25_index,
        build_bm25_index,
    )

    build_bm25_index(spark, sf_dir)  # idempotent; guard needs the table
    docs = _docs(spark)
    one = docs.limit(1).select(
        (F.col("doc_id") + 9_600_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    dup_batch = one.unionByName(one)
    with _pytest.raises(ValueError, match="distinct doc_id"):
        append_to_dedup_snapshot(spark, sf_dir, dup_batch)
    with _pytest.raises(ValueError, match="distinct doc_id"):
        append_to_bm25_index(
            spark, sf_dir, dup_batch.select("doc_id", "text")
        )
    with _pytest.raises(ValueError, match="distinct doc_id"):
        CB.append_curation_flags(spark, sf_dir, dup_batch)


def test_append_curation_flags_rejects_existing_doc_ids(spark, sf_dir):
    """r16 review: the flags append rung enforces NEW doc_ids — a
    re-appended batch would double-count those docs in every funnel
    stage. The flags table is left untouched on rejection."""
    import pytest as _pytest

    from gis_etl_spark.ops import corpus as CB
    from gis_etl_spark.ops.dedup import _docs

    docs = _docs(spark)
    name = CB.materialize_curation_flags(spark, sf_dir)
    base = spark.table(name).count()
    existing = docs.limit(3)  # base-corpus ids already flagged
    with _pytest.raises(ValueError, match="already have flag rows"):
        CB.append_curation_flags(spark, sf_dir, existing)
    assert spark.table(name).count() == base
