"""Space-filling curves + grid cells.

hilbert_encode — Skilling's public-domain algorithm ("Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004): axes → transpose form,
Gray-decode, interleave. Vectorized numpy over the whole Arrow batch
(the bit loop runs 2×order times over arrays, not per row). Replaces
the reference's lindel `HILBERT_ENCODE([y,x]::DOUBLE[2])`
(east_asia.py:75); bit-exact lindel parity is a declared non-goal
(SURVEY.md §7.2.3) — any locality-preserving curve serves the layout
purpose, and golden vectors below are frozen in tests.

morton_encode — Z-order alternative, pure JVM bit expressions (no
Python): usable directly in `repartitionByRange` at 100 TB without an
Arrow hop.

grid_cell — the H3 stand-in (SURVEY.md §7.2.4): equal-angle lattice
whose res-7 pitch (~0.01°≈1.1 km) matches H3 res-7 edge length, with
the H3-like √7 area step per resolution. Implemented as NATIVE Spark
expressions (floor/shift arithmetic) so the heatmap aggregation
(East-Asia-Building-Footprints.md:249-256) runs fully inside
whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

DEFAULT_ORDER = 16  # bits per dimension → 32-bit keys, 65k×65k lattice


def hilbert_from_lattice(
    ax0: np.ndarray, ax1: np.ndarray, order: int = DEFAULT_ORDER
) -> np.ndarray:
    """Integer lattice coords (each < 2^order) → uint64 Hilbert keys."""
    n = len(ax0)
    X = np.empty((2, n), dtype=np.uint64)
    X[0] = np.asarray(ax0, dtype=np.uint64)
    X[1] = np.asarray(ax1, dtype=np.uint64)

    # Skilling 2004 AxestoTranspose, vectorized over rows.
    Q = np.uint64(1 << (order - 1))
    one = np.uint64(1)
    while Q > one:
        P = np.uint64(Q - one)
        for i in range(2):
            hi = (X[i] & Q) != 0
            # invert low bits of X[0] where bit set
            X[0] = np.where(hi, X[0] ^ P, X[0])
            # exchange low bits of X[0] and X[i] where bit clear
            t = np.where(hi, np.uint64(0), (X[0] ^ X[i]) & P)
            X[0] ^= t
            X[i] ^= t
        Q >>= one

    # Gray decode
    X[1] ^= X[0]
    t = np.zeros(n, dtype=np.uint64)
    Q = np.uint64(1 << (order - 1))
    while Q > one:
        mask = (X[1] & Q) != 0
        t = np.where(mask, t ^ np.uint64(Q - one), t)
        Q >>= one
    X[0] ^= t
    X[1] ^= t

    # interleave transpose form → single key; X[0] contributes the
    # higher bit at each level.
    key = np.zeros(n, dtype=np.uint64)
    for b in range(order):
        bb = np.uint64(b)
        key |= ((X[0] >> bb) & one) << np.uint64(2 * b + 1)
        key |= ((X[1] >> bb) & one) << np.uint64(2 * b)
    return key


def hilbert_encode_np(
    y: np.ndarray, x: np.ndarray, order: int = DEFAULT_ORDER
) -> np.ndarray:
    """(lat, lon) degree arrays → uint64 Hilbert keys, vectorized.

    Coordinates scale from [-90,90]×[-180,180] to the 2^order lattice
    (the reference feeds [y, x] in that order too, east_asia.py:75-77).
    """
    scale = (1 << order) - 1
    ax0 = np.clip((np.asarray(y, dtype="f8") + 90.0) / 180.0 * scale, 0, scale)
    ax1 = np.clip((np.asarray(x, dtype="f8") + 180.0) / 360.0 * scale, 0, scale)
    return hilbert_from_lattice(
        ax0.astype(np.uint64), ax1.astype(np.uint64), order
    )


@F.pandas_udf(LongType())
def _hilbert_udf(y: pd.Series, x: pd.Series) -> pd.Series:
    valid = y.notna() & x.notna()
    out = pd.Series(np.zeros(len(y), dtype="int64"), index=y.index, dtype="Int64")
    if valid.any():
        keys = hilbert_encode_np(
            y[valid].to_numpy(dtype="f8"), x[valid].to_numpy(dtype="f8")
        )
        out[valid] = keys.astype("int64")  # ≤2*order=32 bits, sign-safe
    out[~valid] = None
    return out


def hilbert_encode(y: Column, x: Column) -> Column:
    """Engine rendition of `HILBERT_ENCODE([y,x]::DOUBLE[2])`
    (east_asia.py:75). 32-bit keys in a LongType column."""
    return _hilbert_udf(y, x)


def with_hilbert_key_native(
    df,
    y: Column,
    x: Column,
    key_col: str = "hkey",
    order: int = DEFAULT_ORDER,
):
    """Skilling's AxesToTranspose as PURE JVM column arithmetic — no
    Python hop, so a 100 TB merge_compact can compute its sort key
    inside whole-stage codegen (the pandas-UDF rendition
    `hilbert_encode` remains the default where an Arrow pass is
    already being paid).

    The loop state (a, b, t) lives in staged temp COLUMNS across
    chained projections, not one Column tree: expression trees have
    no subexpression sharing, so a loop-carried Column referenced k
    times per round goes exponential in loop depth (measured: driver
    OOM at order=16), and nesting higher-order-function let-bindings
    instead exceeds the analyzer's fixed-point iteration cap. Attribute
    references are shared by name across Project nodes, and
    CollapseProject keeps multiply-referenced non-cheap aliases
    staged, so the plan stays LINEAR: ~3·order narrow projections.
    Integer bit ops are exact — tests assert bit equality with
    hilbert_encode_np on goldens + random lattices. Returns df with
    `key_col` appended (temp columns dropped).

    r18 (guide §1.2 step 2 — per-task work was fine, the BUILD was
    not): the ~3·order projections are assembled with `selectExpr`
    over f-string SQL instead of chained Column operators. The Column
    rendition paid thousands of py4j round-trips per call — profiled
    3.5-6.3 s of DRIVER time per build at order=16 vs 0.4 s planning
    and ~30 ms execution on 200k rows — and the bench/merge paths
    rebuild the chain every run. The parsed expression trees are the
    same bit arithmetic round-for-round, so plans and keys are
    unchanged (the golden/lattice equality tests still pin them).
    """
    scale = (1 << order) - 1
    A, B, T = "_hil_a", "_hil_b", "_hil_t"

    def clamp(c: Column) -> Column:
        return F.least(F.greatest(c.cast("long"), F.lit(0)), F.lit(scale))

    out = df.withColumn(
        A, clamp((y + F.lit(90.0)) / F.lit(180.0) * F.lit(float(scale)))
    ).withColumn(
        B, clamp((x + F.lit(180.0)) / F.lit(360.0) * F.lit(float(scale)))
    )

    # quoted pass-through list: selectExpr parses bare strings, so
    # input column names must be escaped as identifiers
    others = [f"`{c}`" for c in df.columns]

    # AxesToTranspose: Q rounds of conditional invert/exchange. ONE
    # select per round: within a round, expressions duplicate only
    # LEAF attribute refs (a, b), so per-round expression size is
    # constant and total plan size linear in `order`.
    for sh in range(order - 1, 0, -1):
        q, p = 1 << sh, (1 << sh) - 1
        # i = 0: hi = a & q → invert a (exchange with self is a no-op)
        a = f"(CASE WHEN ({A} & {q}) != 0 THEN ({A} ^ {p}) ELSE {A} END)"
        # i = 1: hi = b & q → invert a; else exchange a↔b low bits
        hi = f"({B} & {q}) != 0"
        t = f"(CASE WHEN {hi} THEN 0 ELSE (({a} ^ {B}) & {p}) END)"
        out = out.selectExpr(
            *others,
            f"CASE WHEN {hi} THEN ({a} ^ {p}) ELSE ({a} ^ {t}) END"
            f" AS {A}",
            f"({B} ^ {t}) AS {B}",
        )

    # Gray decode: b ^= a; t = XOR of (q-1) over set bits of b
    out = out.selectExpr(
        *others,
        A,
        f"({B} ^ {A}) AS {B}",
        f"CAST(0 AS BIGINT) AS {T}",
    )
    for sh in range(order - 1, 0, -1):
        q = 1 << sh
        out = out.selectExpr(
            *others,
            A,
            B,
            f"CASE WHEN ({B} & {q}) != 0 THEN ({T} ^ {q - 1})"
            f" ELSE {T} END AS {T}",
        )
    out = out.selectExpr(
        *others,
        f"({A} ^ {T}) AS {A}",
        f"({B} ^ {T}) AS {B}",
    )

    # interleave transpose form → key (a = higher bit per level)
    key = "CAST(0 AS BIGINT)"
    for bit in range(order):
        key = (
            f"({key} | shiftleft((shiftright({A}, {bit}) & 1), "
            f"{2 * bit + 1}))"
        )
        key = (
            f"({key} | shiftleft((shiftright({B}, {bit}) & 1), "
            f"{2 * bit}))"
        )
    return out.selectExpr(
        *others, f"CAST({key} AS BIGINT) AS `{key_col}`"
    )


def morton_encode(y: Column, x: Column, order: int = DEFAULT_ORDER) -> Column:
    """Z-order key as pure JVM expressions — bit-spread via shift/mask
    stages (public bit-twiddling identity), no Python round-trip.
    Locality is slightly worse than Hilbert's but the plan stays in
    whole-stage codegen end-to-end."""
    scale = (1 << order) - 1
    iy = F.least(
        F.greatest(((y + 90.0) / 180.0 * scale).cast("long"), F.lit(0)),
        F.lit(scale),
    )
    ix = F.least(
        F.greatest(((x + 180.0) / 360.0 * scale).cast("long"), F.lit(0)),
        F.lit(scale),
    )

    def spread(c: Column) -> Column:
        # spread 16 bits to even positions; Column.bitwiseOR, not `|`
        # (which PySpark resolves to boolean OR)
        c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
        c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
        c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
        return c

    return F.shiftleft(spread(iy), 1).bitwiseOR(spread(ix)).cast("long")


# --- equal-angle grid (H3 stand-in, SURVEY.md §7.2.4) ----------------------

BASE_PITCH_RES7 = 0.01  # degrees at res 7 ≈ H3 res-7 mean edge (~1.1 km)
_SQRT7 = 7.0 ** 0.5


def grid_pitch(res: int) -> float:
    """Cell pitch in degrees at a given resolution; √7 linear step per
    res level mirrors H3's sevenfold area subdivision."""
    return BASE_PITCH_RES7 * (_SQRT7 ** (7 - res))


def grid_cell(lat: Column, lng: Column, res: int = 7) -> Column:
    """(lat, lng) → lattice cell id, NATIVE expressions only.

    Engine stand-in for `H3_LATLNG_TO_CELL(lat, lng, res)`
    (East-Asia-Building-Footprints.md:250-252). Packing:
    id = res<<58 | ix<<29 | iy  (ix, iy < 2^29 for res ≤ 15; id is a
    positive int64 like H3's 63-bit indexes).
    """
    pitch = grid_pitch(res)
    ix = F.floor((lng + F.lit(180.0)) / F.lit(pitch)).cast("long")
    iy = F.floor((lat + F.lit(90.0)) / F.lit(pitch)).cast("long")
    return (
        F.lit(int(res) << 58).cast("long")
        + F.shiftleft(ix, 29)
        + iy
    ).cast("long")


def grid_cell_sql(lat_expr: str, lng_expr: str, res: int = 7) -> str:
    """ANSI-SQL rendition of grid_cell for the DuckDB oracle — same
    arithmetic, so cell ids hash-match."""
    pitch = grid_pitch(res)
    return (
        f"({int(res) << 58} + "
        f"(floor(({lng_expr} + 180.0) / {pitch!r})::BIGINT * {1 << 29}) + "
        f"floor(({lat_expr} + 90.0) / {pitch!r})::BIGINT)"
    )


def grid_cell_center(cell: Column) -> tuple[Column, Column]:
    """Cell id → (lat, lng) center, native arithmetic — the inverse of
    grid_cell at the cell's own resolution."""
    res = F.shiftright(cell, 58).cast("int")
    pitch = F.lit(BASE_PITCH_RES7) * F.pow(F.lit(_SQRT7), F.lit(7) - res)
    ix = F.shiftright(cell, 29).bitwiseAND(F.lit((1 << 29) - 1))
    iy = cell.bitwiseAND(F.lit((1 << 29) - 1))
    lng = (ix.cast("double") + 0.5) * pitch - F.lit(180.0)
    lat = (iy.cast("double") + 0.5) * pitch - F.lit(90.0)
    return lat, lng


def grid_parent(cell: Column, parent_res: int) -> Column:
    """Cell id → ancestor cell at a coarser resolution (the
    H3_CELL_TO_PARENT shape): reconstruct the cell center, re-bucket at
    the parent pitch. Native expressions; used for multi-resolution
    heatmap pyramids."""
    lat, lng = grid_cell_center(cell)
    return grid_cell(lat, lng, parent_res)


def grid_parent_sql(cell_expr: str, parent_res: int) -> str:
    """ANSI twin of grid_parent for the oracle."""
    res = f"(({cell_expr}) >> 58)"
    pitch = f"({BASE_PITCH_RES7!r} * pow({_SQRT7!r}, 7 - {res}))"
    ix = f"((({cell_expr}) >> 29) & {(1 << 29) - 1})"
    iy = f"(({cell_expr}) & {(1 << 29) - 1})"
    lng = f"(({ix} + 0.5) * {pitch} - 180.0)"
    lat = f"(({iy} + 0.5) * {pitch} - 90.0)"
    return grid_cell_sql(lat, lng, parent_res)


def grid_cell_boundary_wkt_sql(cell_expr: str) -> str:
    """ANSI/DuckDB twin of grid_cell_boundary_wkt — same arithmetic in
    the same association order (BIGINT ix/iy · DOUBLE pitch, x1/y1 as
    x0/y0 + pitch), rendered with printf('%.7f'). Exact decimal ties
    at the 8th digit are impossible for binary doubles (5·10⁻⁸ is not
    dyadic), so HALF_UP (JVM) and round-half-even (printf) agree."""
    res = f"(({cell_expr}) >> 58)"
    pitch = f"({BASE_PITCH_RES7!r} * pow({_SQRT7!r}, 7 - {res}))"
    ix = f"((({cell_expr}) >> 29) & {(1 << 29) - 1})"
    iy = f"(({cell_expr}) & {(1 << 29) - 1})"
    x0 = f"(({ix}) * {pitch} - 180.0)"
    y0 = f"(({iy}) * {pitch} - 90.0)"
    x1 = f"(({x0}) + {pitch})"
    y1 = f"(({y0}) + {pitch})"

    def pt(x: str, y: str) -> str:
        return f"printf('%.7f', {x}) || ' ' || printf('%.7f', {y})"

    ring = " || ', ' || ".join(
        [pt(x0, y0), pt(x1, y0), pt(x1, y1), pt(x0, y1), pt(x0, y0)]
    )
    return f"('POLYGON ((' || {ring} || '))')"


def grid_cell_boundary_wkt(cell: Column) -> Column:
    """Cell id → boundary polygon WKT, native string expressions
    (H3_CELL_TO_BOUNDARY_WKT, East-Asia-Building-Footprints.md:264).

    Resolution is recovered from the id's high bits, but pitch needs a
    numeric value per row; since res is constant within a heatmap
    table, we decode it arithmetically via pow(√7, 7-res).
    """
    res = F.shiftright(cell, 58).cast("int")
    pitch = F.lit(BASE_PITCH_RES7) * F.pow(F.lit(_SQRT7), F.lit(7) - res)
    ix = F.shiftright(cell, 29).bitwiseAND(F.lit((1 << 29) - 1))
    iy = cell.bitwiseAND(F.lit((1 << 29) - 1))
    x0 = ix * pitch - F.lit(180.0)
    y0 = iy * pitch - F.lit(90.0)
    x1 = x0 + pitch
    y1 = y0 + pitch

    def fmt(c: Column) -> Column:
        # printf-style rendering (no locale separators); matches
        # DuckDB's printf('%.7f', v) for oracle parity
        return F.format_string("%.7f", c)

    return F.concat(
        F.lit("POLYGON (("),
        fmt(x0), F.lit(" "), fmt(y0), F.lit(", "),
        fmt(x1), F.lit(" "), fmt(y0), F.lit(", "),
        fmt(x1), F.lit(" "), fmt(y1), F.lit(", "),
        fmt(x0), F.lit(" "), fmt(y1), F.lit(", "),
        fmt(x0), F.lit(" "), fmt(y0),
        F.lit("))"),
    )


# --- slippy-map tiles (z/x/y + quadkey) ------------------------------------
# The web-map export analog of the reference's heatmap rollups: the
# standard OSM/Bing tiling (Web-Mercator subdivision). Tile math is two
# trig calls + floor; the quadkey is pure bit interleaving (Bing Maps
# addressing: digit i = 2·y_bit + x_bit from the MSB), so it doubles as
# a spatial sort/partition key with the same prefix-locality property
# the Hilbert/Morton keys have.

TILE_Z = 10
_MERC_LAT_MAX = 85.05112878  # Web-Mercator clip latitude


def tile_xy(lat: Column, lng: Column, z: int = TILE_Z) -> tuple[Column, Column]:
    """(tile_x, tile_y) at zoom z — JVM-native (radians/tan/asinh are
    Spark built-ins; whole plan stays in codegen). Output clamped to
    [0, 2^z-1] exactly as the SQL twin clamps."""
    import math

    n = float(1 << z)
    x = F.floor((lng + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    # ln(tan φ + sec φ) rather than asinh(tan φ): DuckDB has no asinh,
    # and parity requires the IDENTICAL operation sequence both sides
    r = F.radians(lat)
    y = F.floor(
        (
            F.lit(1.0)
            - F.log(F.tan(r) + F.lit(1.0) / F.cos(r)) / F.lit(math.pi)
        )
        / F.lit(2.0)
        * F.lit(n)
    )
    clampx = F.greatest(F.lit(0.0), F.least(F.lit(n - 1.0), x)).cast("long")
    clampy = F.greatest(F.lit(0.0), F.least(F.lit(n - 1.0), y)).cast("long")
    return clampx, clampy


def tile_quadkey(x: Column, y: Column, z: int = TILE_Z) -> Column:
    """Integer quadkey: Σ (2·y_bit(i) + x_bit(i)) · 4^i — the Bing
    quadkey string read as a base-4 number (MSB = coarsest). Pure
    int64 bit arithmetic, bit-identical in any engine."""
    terms = [
        (
            (F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)) * F.lit(2))
            + F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1))
        )
        * F.lit(1 << (2 * i))
        for i in range(z)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def tile_xy_sql(lat_expr: str, lng_expr: str, z: int = TILE_Z) -> tuple[str, str]:
    """ANSI twins of tile_xy — same expression tree, same clamp."""
    import math

    n = float(1 << z)
    x = f"floor(({lng_expr} + 180.0) / 360.0 * {n!r})"
    y = (
        f"floor((1.0 - ln(tan(radians({lat_expr}))"
        f" + 1.0 / cos(radians({lat_expr}))) / {math.pi!r})"
        f" / 2.0 * {n!r})"
    )
    return (
        f"CAST(greatest(0.0, least({n - 1.0!r}, {x})) AS BIGINT)",
        f"CAST(greatest(0.0, least({n - 1.0!r}, {y})) AS BIGINT)",
    )


def tile_quadkey_sql(x_expr: str, y_expr: str, z: int = TILE_Z) -> str:
    terms = [
        f"(((({y_expr}) >> {i}) & 1) * 2 + ((({x_expr}) >> {i}) & 1))"
        f" * {1 << (2 * i)}"
        for i in range(z)
    ]
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


# --- geohash (public base-32 geocode) --------------------------------------
# The third interop key family beside quadkey and H3-compat: geohashes
# are how lat/lng keys travel between systems that share no code (the
# alphabet and bit order are a public standard). A geohash is just the
# bit-interleave of the binary expansions of lon/lat over their ranges
# — so the classic successive-halving algorithm collapses to two
# fixed-point scalings plus the same bit algebra the Morton key uses.

GEOHASH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_P = 6  # characters → 30 bits (15 lon + 15 lat), ~±0.61 km


def geohash_int(lat: Column, lng: Column, p: int = GEOHASH_P) -> Column:
    """The geohash's 5p-bit integer value (MSB-first interleave,
    even bit positions = longitude). Pure int64 arithmetic after two
    floor scalings — identical in any engine."""
    bits = 5 * p
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    x = F.floor(
        (lng + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))
    ).cast("long")
    y = F.floor(
        (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))
    ).cast("long")
    x = F.least(F.lit((1 << lon_bits) - 1), F.greatest(F.lit(0), x))
    y = F.least(F.lit((1 << lat_bits) - 1), F.greatest(F.lit(0), y))
    terms = []
    for i in range(bits):  # i = 0 is the MSB of the geohash
        shift = bits - 1 - i
        if i % 2 == 0:  # longitude bit, MSB-first
            src, srcbit = x, lon_bits - 1 - i // 2
        else:
            src, srcbit = y, lat_bits - 1 - i // 2
        terms.append(
            F.shiftrightunsigned(src, srcbit).bitwiseAND(F.lit(1))
            * F.lit(1 << shift)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def geohash_str(lat: Column, lng: Column, p: int = GEOHASH_P) -> Column:
    """The standard base-32 geohash string (p characters)."""
    col = geohash_int(lat, lng, p)
    parts = []
    for i in range(p):
        shift = 5 * (p - 1 - i)
        idx = F.shiftrightunsigned(col, shift).bitwiseAND(F.lit(31)).cast(
            "int"
        )
        parts.append(
            F.element_at(
                F.split(F.lit(" ".join(GEOHASH_ALPHA)), " "), idx + 1
            )
        )
    return F.concat(*parts)


def geohash_xy_sql(
    lat_expr: str, lng_expr: str, p: int = GEOHASH_P
) -> tuple[str, str]:
    """ANSI twins of the two fixed-point scalings (stage these as CTE
    columns; the interleave references them by alias)."""
    bits = 5 * p
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    x = (
        f"least({(1 << lon_bits) - 1}, greatest(0, "
        f"CAST(floor(({lng_expr} + 180.0) / 360.0 *"
        f" {float(1 << lon_bits)!r}) AS BIGINT)))"
    )
    y = (
        f"least({(1 << lat_bits) - 1}, greatest(0, "
        f"CAST(floor(({lat_expr} + 90.0) / 180.0 *"
        f" {float(1 << lat_bits)!r}) AS BIGINT)))"
    )
    return x, y


def geohash_interleave_sql(gx: str, gy: str, p: int = GEOHASH_P) -> str:
    """MSB-first interleave of staged gx/gy columns → 5p-bit BIGINT."""
    bits = 5 * p
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    terms = []
    for i in range(bits):
        shift = bits - 1 - i
        if i % 2 == 0:
            src, srcbit = gx, lon_bits - 1 - i // 2
        else:
            src, srcbit = gy, lat_bits - 1 - i // 2
        terms.append(f"(((({src}) >> {srcbit}) & 1) << {shift})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def geohash_chars_sql(gi: str, p: int = GEOHASH_P) -> str:
    """Base-32 rendering of a staged geohash-int column."""
    return " || ".join(
        f"substr('{GEOHASH_ALPHA}', "
        f"CAST(((({gi}) >> {5 * (p - 1 - i)}) & 31) AS INT) + 1, 1)"
        for i in range(p)
    )


def tile_bbox(x: int, y: int, z: int = TILE_Z) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of tile z/x/y — the decode
    side of tile_xy, for translating tile keys back into scan-pruning
    predicates (row-group min/max on cx/cy)."""
    import math

    n = float(1 << z)

    def lon(i: float) -> float:
        return i / n * 360.0 - 180.0

    def lat(i: float) -> float:
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * i / n))))

    return lon(x), lat(y + 1), lon(x + 1), lat(y)


def geohash_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of a geohash cell — decode
    side of geohash_str (any precision)."""
    p = len(gh)
    bits = 5 * p
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    gi = 0
    for ch in gh:
        gi = (gi << 5) | GEOHASH_ALPHA.index(ch)
    x = y = 0
    for i in range(bits):
        b = (gi >> (bits - 1 - i)) & 1
        if i % 2 == 0:
            x = (x << 1) | b
        else:
            y = (y << 1) | b
    lon_span = 360.0 / (1 << lon_bits)
    lat_span = 180.0 / (1 << lat_bits)
    return (
        -180.0 + x * lon_span,
        -90.0 + y * lat_span,
        -180.0 + (x + 1) * lon_span,
        -90.0 + (y + 1) * lat_span,
    )
