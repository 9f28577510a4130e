"""Grid traversal (gridDisk / gridRing / gridDistance) on REAL H3 ids
— exact within a (non-pentagon) base cell, via integer axial-lattice
algebra; no geodesic table needed.

Context: the reference workflow keys output on H3 cells
(East-Asia-Building-Footprints.md:250-252); k-ring smoothing /
neighborhood joins over an H3-indexed corpus need gridDisk.
layout/h3compat.py already provides the exact id *algebra*
(parent/children/validity/pentagons); this module adds the lattice
*traversal* half. What stays out of scope offline: crossing a base
cell boundary (needs the 122-base-cell adjacency + orientation table,
same unvalidatable-offline data as latLngToCell) and traversal inside
the 12 pentagon base cells (the deleted-K subsequence distorts the
local lattice). Both return incomplete/NULL rather than guessing —
same honesty contract as the rest of the H3 surface.

Method (published H3 local-coordinate construction — docs
"Coordinate systems", aperture-7 CoordIJK — re-derived here in 2-D
axial coordinates so every step is exact integer linear algebra):

- Each resolution step subdivides by aperture 7, alternating grid
  chirality: Class III (odd res) applies the axial matrix
  A = [[2, 1], [-1, 3]], Class II (even res) applies
  Ar = [[3, -1], [1, 2]]. det A = det Ar = 7 and A·Ar = 7·I, so each
  is (up to the 1/7 scale) the other's exact inverse — descending is
  a multiply, ascending is an adjugate multiply plus an exact /7.
- The 7 children digits 0..6 (CENTER, K, J, JK, I, IK, IJ) offset by
  the axial units (0,0), (-1,-1), (0,1), (-1,0), (1,0), (0,-1),
  (1,1). These 7 units form a COMPLETE residue system of Z²/(A·Z²)
  (proved at import: the 7 adjugate-residues are pairwise distinct
  mod 7), so coords → digits is a unique mod-7 table lookup per
  level — no floating point, no rounding heuristics anywhere.
- cell → local coords: fold digits 1..res forward. coords → cell:
  peel digits res..1 with the residue lookup; a nonzero residual
  base-level coordinate means the target lies in ANOTHER base cell →
  flagged, not fabricated.

Verification without the h3 library (tests/test_h3grid.py):
- gridDisk('8928308280fffff', 1) reproduces the H3 documentation's
  published 7-cell example bit-for-bit — this example crosses res-8
  parent boundaries, pinning the class-parity convention and the
  digit→unit table against real-world ids;
- aperture-7 law: gridDisk(centerChild(c), 1) == cellToChildren(c)
  for every hexagon cell (children expansion is independently exact,
  h3compat.py, r5);
- neighbor symmetry, disk size 1 + 3k(k+1) on interior cells,
  roundtrip over the full id space, parent-adjacency consistency;
- when the h3 package IS importable the tests cross-check against the
  library directly (same import-gate pattern as h3_latlng_to_cell).

Scale: one Arrow-vectorized map stage (numpy over int64 columns,
~15 levels x 7 digits of vector ops per disk offset), no shuffle, no
driver collect; output ids are join/partition keys like any other H3
column. Cost is O(rows x 3k(k+1)+1) — the caller's fan-out contract,
same as cellToChildren.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from gis_etl_spark.layout.h3compat import (
    MAX_H3_RES,
    PENTAGON_BASE_CELLS,
    _BC_SHIFT,
    _RES_SHIFT,
)

# axial down-projection per class (see module docstring)
_A = ((2, 1), (-1, 3))  # Class III (odd res)
_AR = ((3, -1), (1, 2))  # Class II (even res)
# digit -> axial unit: CENTER, K, J, JK, I, IK, IJ
_DIGIT_AX = ((0, 0), (-1, -1), (0, 1), (-1, 0), (1, 0), (0, -1), (1, 1))

_PENT_ARR = np.zeros(128, dtype=bool)
_PENT_ARR[list(PENTAGON_BASE_CELLS)] = True


def _build_residue_lut(adj):
    """(tx mod 7, ty mod 7) -> (digit, adj·u_d) lookup for one class.
    Import-time proof that the 7 digit units are a complete residue
    system: all 7 keys must be distinct."""
    lut_d = np.full(49, -1, dtype=np.int64)
    lut_ex = np.zeros(49, dtype=np.int64)
    lut_ey = np.zeros(49, dtype=np.int64)
    for d, (ux, uy) in enumerate(_DIGIT_AX):
        ex = adj[0][0] * ux + adj[0][1] * uy
        ey = adj[1][0] * ux + adj[1][1] * uy
        key = (ex % 7) * 7 + (ey % 7)
        if lut_d[key] != -1:  # pragma: no cover - structural impossibility
            raise AssertionError("digit units not a complete residue system")
        lut_d[key] = d
        lut_ex[key] = ex
        lut_ey[key] = ey
    return lut_d, lut_ex, lut_ey


# ascending from res r uses the adjugate of the matrix that descended
# INTO r: adj(A) = Ar and adj(Ar) = A (A·Ar = 7I)
_LUT_ODD = _build_residue_lut(_AR)  # odd res descended with A
_LUT_EVEN = _build_residue_lut(_A)  # even res descended with Ar

_UX = np.array([u[0] for u in _DIGIT_AX], dtype=np.int64)
_UY = np.array([u[1] for u in _DIGIT_AX], dtype=np.int64)


def _ids64(c: pd.Series) -> np.ndarray:
    """Arrow hands a NULL-bearing bigint column to pandas as float64,
    which silently corrupts ids above 2^53 — so these UDFs demand
    non-null input and fail loudly otherwise."""
    ids = c.to_numpy()
    if ids.dtype != np.int64:
        raise ValueError(
            "h3 grid udf requires non-null BIGINT cells "
            f"(got dtype {ids.dtype}); filter nulls first"
        )
    return ids


def local_axial(
    ids: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized cell -> (x, y, bad) local axial coords within the
    cell's base cell, plus a `bad` mask for structurally malformed
    ids carrying the 7-marker INSIDE their res range (digit 7 is only
    legal as the beyond-res filler) — those lanes' coords are
    meaningless and callers must fold `bad` into their validity mask
    rather than let a raw digit index out of range (ADVICE r7).
    |coords| <= O(7^(res/2)) ~ 2.3e6 at res 15 — nowhere near int64."""
    ids = ids.astype(np.int64)
    res = (ids >> _RES_SHIFT) & 0xF
    x = np.zeros(len(ids), dtype=np.int64)
    y = np.zeros(len(ids), dtype=np.int64)
    bad = np.zeros(len(ids), dtype=bool)
    for r in range(1, MAX_H3_RES + 1):
        act = res >= r
        m = _A if r % 2 else _AR
        nx = m[0][0] * x + m[0][1] * y
        ny = m[1][0] * x + m[1][1] * y
        # digits beyond a cell's res are the 7-marker; mask them to 0
        # (those lanes are discarded by `act` anyway). A 7 on an
        # ACTIVE lane is malformed: flag it and clamp to 0 so the
        # unit-table lookup stays in range.
        d = np.where(act, (ids >> (3 * (MAX_H3_RES - r))) & 7, 0)
        bad |= act & (d == 7)
        d = np.where(d == 7, 0, d)
        nx += _UX[d]
        ny += _UY[d]
        x = np.where(act, nx, x)
        y = np.where(act, ny, y)
    return x, y, bad


def axial_to_cell(
    x: np.ndarray, y: np.ndarray, res: np.ndarray, bc: np.ndarray
) -> np.ndarray:
    """Vectorized local axial coords -> cell id in base cell `bc` at
    `res`; -1 where the point lies outside that base cell's lattice
    patch (nonzero residual after peeling every digit)."""
    n = len(x)
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    out = (
        np.int64(1 << 59)
        | (res.astype(np.int64) << _RES_SHIFT)
        | (bc.astype(np.int64) << _BC_SHIFT)
    )
    # digits beyond res are the 7-marker
    for r in range(1, MAX_H3_RES + 1):
        out |= np.where(res < r, np.int64(7) << (3 * (MAX_H3_RES - r)), 0)
    for r in range(MAX_H3_RES, 0, -1):
        act = res >= r
        adj = _AR if r % 2 else _A
        lut_d, lut_ex, lut_ey = _LUT_ODD if r % 2 else _LUT_EVEN
        tx = adj[0][0] * x + adj[0][1] * y
        ty = adj[1][0] * x + adj[1][1] * y
        key = (tx % 7) * 7 + (ty % 7)  # numpy % is non-negative
        d = lut_d[key]
        nx = (tx - lut_ex[key]) // 7
        ny = (ty - lut_ey[key]) // 7
        out = np.where(act, out | (d << (3 * (MAX_H3_RES - r))), out)
        x = np.where(act, nx, x)
        y = np.where(act, ny, y)
    in_base = (x == 0) & (y == 0)
    return np.where(in_base, out, np.int64(-1))


def _hexdist(dx: int, dy: int) -> int:
    """Lattice distance for moves ±(1,0), ±(0,1), ±(1,1)."""
    if (dx >= 0) == (dy >= 0):
        return max(abs(dx), abs(dy))
    return abs(dx) + abs(dy)


def disk_offsets(k: int) -> list[tuple[int, int]]:
    """All axial offsets within hex distance k: 1 + 3k(k+1) of them."""
    out = [
        (dx, dy)
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if _hexdist(dx, dy) <= k
    ]
    assert len(out) == 1 + 3 * k * (k + 1)
    return out


def grid_disk_arrays(ids: np.ndarray, k: int) -> list[list[int] | None]:
    """gridDisk(id, k) per row, restricted to the id's own base cell:
    sorted list of in-base member ids (always includes the cell
    itself). None for rows whose base cell is a pentagon (distorted
    local lattice) or whose id is structurally out of range. A row's
    disk is COMPLETE iff len == 1 + 3k(k+1); shorter means the true
    disk crosses the base-cell boundary and the missing members are
    withheld rather than guessed."""
    ids = ids.astype(np.int64)
    res = (ids >> _RES_SHIFT) & 0xF
    bc = (ids >> _BC_SHIFT) & 0x7F
    x0, y0, bad = local_axial(ids)
    valid = (bc < 122) & ~_PENT_ARR[bc & 0x7F] & ~bad
    cols = []
    for dx, dy in disk_offsets(k):
        cols.append(axial_to_cell(x0 + dx, y0 + dy, res, bc))
    mat = np.stack(cols, axis=1)  # (n, n_offsets)
    out: list[list[int] | None] = []
    for i in range(len(ids)):
        if not valid[i]:
            out.append(None)
            continue
        members = mat[i]
        out.append(sorted(int(v) for v in members if v != -1))
    return out


def h3_grid_disk_udf(k: int):
    """Pandas-UDF factory: cell column -> array<long> disk (see
    grid_disk_arrays for the exact contract)."""
    if k < 0:
        raise ValueError(f"k out of range: {k}")

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(c: pd.Series) -> pd.Series:
        return pd.Series(grid_disk_arrays(_ids64(c), k), dtype=object)

    return _udf


def h3_grid_ring_udf(k: int):
    """Hollow ring at exactly distance k (disk(k) minus disk(k-1))."""
    if k < 1:
        raise ValueError(f"k out of range: {k}")

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(c: pd.Series) -> pd.Series:
        ids = _ids64(c)
        res = (ids >> _RES_SHIFT) & 0xF
        bc = (ids >> _BC_SHIFT) & 0x7F
        x0, y0, bad = local_axial(ids)
        valid = (bc < 122) & ~_PENT_ARR[bc & 0x7F] & ~bad
        cols = [
            axial_to_cell(x0 + dx, y0 + dy, res, bc)
            for dx, dy in disk_offsets(k)
            if _hexdist(dx, dy) == k
        ]
        mat = np.stack(cols, axis=1)
        out = [
            sorted(int(v) for v in mat[i] if v != -1) if valid[i] else None
            for i in range(len(ids))
        ]
        return pd.Series(out, dtype=object)

    return _udf


def h3_grid_distance(a: Column | str, b: Column | str) -> Column:
    """Lattice distance between two cells — exact when both share a
    non-pentagon base cell and resolution, NULL otherwise (a
    cross-base distance needs the geodesic table)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    @F.pandas_udf(LongType())
    def _dist(sa: pd.Series, sb: pd.Series) -> pd.Series:
        ia, ib = _ids64(sa), _ids64(sb)
        ra, rb = (ia >> _RES_SHIFT) & 0xF, (ib >> _RES_SHIFT) & 0xF
        ba, bb = (ia >> _BC_SHIFT) & 0x7F, (ib >> _BC_SHIFT) & 0x7F
        xa, ya, bad_a = local_axial(ia)
        xb, yb, bad_b = local_axial(ib)
        ok = (
            (ra == rb)
            & (ba == bb)
            & (ba < 122)
            & ~_PENT_ARR[ba & 0x7F]
            & ~bad_a
            & ~bad_b
        )
        dx, dy = xa - xb, ya - yb
        same_sign = (dx >= 0) == (dy >= 0)
        d = np.where(
            same_sign,
            np.maximum(np.abs(dx), np.abs(dy)),
            np.abs(dx) + np.abs(dy),
        )
        return pd.Series(
            [int(d[i]) if ok[i] else None for i in range(len(ia))],
            dtype=object,
        )

    return _dist(ca, cb)


# --- registry queries -------------------------------------------------------


def h3_grid_ring_children(spark, sf_dir: str) -> DataFrame:
    """Registry query (oracle-paired): for every res-1 cell of every
    NON-pentagon base cell, gridDisk(centerChild, 1) minus the center
    must be exactly the cell's 6 non-center res-2 children — the
    aperture-7 law as a driver-scored contract. The Spark side walks
    the LATTICE (local-axial neighbor math, including decodes through
    non-trivial residue paths for the 6 off-center parents per base
    cell); the oracle re-derives the same 6 ids per cell from DIGIT
    ARITHMETIC alone, sharing nothing but the published bit layout."""
    from gis_etl_spark.io import read_table  # noqa: PLC0415
    from gis_etl_spark.layout.h3compat import (  # noqa: PLC0415
        _digit_fill,
        h3_cell_to_center_child,
        h3_cell_to_children_df,
    )

    bc = (
        read_table(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 122).alias("bc"))
        .distinct()
        .filter(~F.col("bc").isin(list(PENTAGON_BASE_CELLS)))
    )
    res0 = bc.select(
        "bc",
        (
            F.lit((1 << 59) | _digit_fill(0))
            .cast("long")
            .bitwiseOR(F.shiftleft(F.col("bc"), _BC_SHIFT))
        ).alias("cell"),
    )
    res1 = h3_cell_to_children_df(res0, "cell", 1, out_col="c1")
    ringed = res1.select(
        "c1",
        h3_cell_to_center_child("c1", 2).alias("center"),
        F.explode(
            h3_grid_disk_udf(1)(h3_cell_to_center_child("c1", 2))
        ).alias("nbr"),
    ).filter(F.col("nbr") != F.col("center"))
    return (
        ringed.groupBy("c1")
        .agg(
            F.count("*").alias("ring_n"),
            F.expr("bit_xor(nbr)").alias("ring_xor"),
            F.min("nbr").alias("ring_min"),
            F.max("nbr").alias("ring_max"),
        )
        .orderBy("c1")
    )


def h3_grid_ring_children_sql() -> str:
    """Oracle twin: digit arithmetic only (no lattice walk)."""
    from gis_etl_spark.layout.h3compat import _digit_fill  # noqa: PLC0415

    pent = ", ".join(str(b) for b in PENTAGON_BASE_CELLS)
    head1 = (1 << 59) | (1 << _RES_SHIFT) | _digit_fill(1)
    head2 = (1 << 59) | (2 << _RES_SHIFT) | _digit_fill(2)
    d1_pos, d2_pos = 3 * (MAX_H3_RES - 1), 3 * (MAX_H3_RES - 2)
    return f"""
        WITH bcs AS (
          SELECT DISTINCT doc_id % 122 AS bc FROM documents
          WHERE doc_id % 122 NOT IN ({pent})
        ), d1s AS (
          SELECT unnest(generate_series(0, 6)) AS d1
        ), d2s AS (
          SELECT unnest(generate_series(1, 6)) AS d2
        ), ring AS (
          SELECT ({head1} | (bc * {1 << _BC_SHIFT})
                    | (d1 * {1 << d1_pos})) AS c1,
                 ({head2} | (bc * {1 << _BC_SHIFT})
                    | (d1 * {1 << d1_pos}) | (d2 * {1 << d2_pos})) AS nbr
          FROM bcs, d1s, d2s
        )
        SELECT c1, count(*)::BIGINT AS ring_n,
               bit_xor(nbr) AS ring_xor,
               min(nbr) AS ring_min, max(nbr) AS ring_max
        FROM ring GROUP BY c1 ORDER BY c1
    """


def h3_grid_distance_pairs(spark, sf_dir: str) -> DataFrame:
    """Registry query (oracle-paired): gridDistance as a driver-scored
    contract. All C(49,2) pairs of res-2 cells within every
    non-pentagon base cell; the engine folds each id's digits through
    the class-alternating lattice matrices and takes the hex metric
    (h3_grid_distance UDF); the oracle re-derives every pair distance
    in PURE SQL by unrolling the 2-level fold — x2 = Ar·u(d1) + u(d2)
    with Ar = [[3,-1],[1,2]] — over an inline digit→axial-unit VALUES
    table plus the hexdist CASE. The two sides share only the
    published bit layout and unit table, so a bug in either the fold,
    the residue decode, or the metric breaks the hash.

    Scale: children expansion is two narrow map-side explodes; the
    self-join shuffles once on the base-cell key (each bucket is 49
    rows — bounded by construction, no skew possible); one partial
    agg. Same shape as a per-partition-key pairwise comparison at any
    corpus size."""
    from gis_etl_spark.io import read_table  # noqa: PLC0415
    from gis_etl_spark.layout.h3compat import (  # noqa: PLC0415
        _digit_fill,
        h3_cell_to_children_df,
    )

    bc = (
        read_table(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 122).alias("bc"))
        .distinct()
        .filter(~F.col("bc").isin(list(PENTAGON_BASE_CELLS)))
    )
    res0 = bc.select(
        "bc",
        (
            F.lit((1 << 59) | _digit_fill(0))
            .cast("long")
            .bitwiseOR(F.shiftleft(F.col("bc"), _BC_SHIFT))
        ).alias("cell"),
    )
    res2 = h3_cell_to_children_df(res0, "cell", 2, out_col="c2").select(
        "bc", "c2"
    )
    a = res2.alias("a")
    b = res2.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bc") == F.col("b.bc")) & (F.col("a.c2") < F.col("b.c2")),
    ).select(
        F.col("a.bc").alias("bc"),
        F.col("a.c2").alias("ca"),
        F.col("b.c2").alias("cb"),
        h3_grid_distance(F.col("a.c2"), F.col("b.c2")).alias("dist"),
    )
    return (
        pairs.groupBy("bc", "dist")
        .agg(
            F.count("*").alias("n_pairs"),
            F.expr("bit_xor(ca ^ cb)").alias("pair_xor"),
            F.min("ca").alias("min_a"),
            F.max("cb").alias("max_b"),
        )
        .orderBy("bc", "dist")
    )


def h3_grid_distance_pairs_sql() -> str:
    """Oracle twin: 2-level fold unrolled into integer linear algebra
    (no lattice code shared with the engine)."""
    from gis_etl_spark.layout.h3compat import _digit_fill  # noqa: PLC0415

    pent = ", ".join(str(b) for b in PENTAGON_BASE_CELLS)
    head2 = (1 << 59) | (2 << _RES_SHIFT) | _digit_fill(2)
    d1_pos, d2_pos = 3 * (MAX_H3_RES - 1), 3 * (MAX_H3_RES - 2)
    return f"""
        WITH bcs AS (
          SELECT DISTINCT doc_id % 122 AS bc FROM documents
          WHERE doc_id % 122 NOT IN ({pent})
        ), units(d, ux, uy) AS (
          VALUES (0, 0, 0), (1, -1, -1), (2, 0, 1), (3, -1, 0),
                 (4, 1, 0), (5, 0, -1), (6, 1, 1)
        ), cells AS (
          -- x2 = Ar * u(d1) + u(d2),  Ar = [[3,-1],[1,2]]
          SELECT bc,
                 CAST({head2} AS BIGINT)
                   | (bc * CAST({1 << _BC_SHIFT} AS BIGINT))
                   | (u1.d * CAST({1 << d1_pos} AS BIGINT))
                   | (u2.d * CAST({1 << d2_pos} AS BIGINT)) AS cell,
                 3 * u1.ux - u1.uy + u2.ux AS x,
                 u1.ux + 2 * u1.uy + u2.uy AS y
          FROM bcs, units u1, units u2
        ), pairs AS (
          SELECT a.bc AS bc, a.cell AS ca, b.cell AS cb,
                 CASE WHEN ((a.x - b.x) >= 0) = ((a.y - b.y) >= 0)
                      THEN greatest(abs(a.x - b.x), abs(a.y - b.y))
                      ELSE abs(a.x - b.x) + abs(a.y - b.y) END AS dist
          FROM cells a JOIN cells b
            ON a.bc = b.bc AND a.cell < b.cell
        )
        SELECT bc, dist, count(*)::BIGINT AS n_pairs,
               bit_xor(xor(ca, cb)) AS pair_xor,
               min(ca) AS min_a, max(cb) AS max_b
        FROM pairs GROUP BY bc, dist ORDER BY bc, dist
    """


def h3_grid_disk_members(spark, sf_dir: str) -> DataFrame:
    """Registry query (oracle-paired): gridDisk ITSELF as a driver
    contract, truncation included. Engine: grid_disk_arrays(k=2) over
    every res-2 cell of every non-pentagon base cell, histogrammed by
    disk size (interior cells: 19; boundary cells: fewer — the
    withheld-members contract). Oracle: in-base disk membership equals
    { b : hexdist(a, b) ≤ 2 } over the enumerated 49-cell coordinate
    patch — the same unrolled 2-level fold + hexdist CASE as
    h3_grid_distance_pairs, so the disk function, the truncation
    behavior, and the size histogram are all pinned against pure SQL.

    Scale: map-side children explode + one Arrow disk stage + one
    partial agg; the per-row 1+3k(k+1) fan-out is the operator's
    contract (cellToChildren-style)."""
    from gis_etl_spark.io import read_table  # noqa: PLC0415
    from gis_etl_spark.layout.h3compat import (  # noqa: PLC0415
        _digit_fill,
        h3_cell_to_children_df,
    )

    bc = (
        read_table(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 122).alias("bc"))
        .distinct()
        .filter(~F.col("bc").isin(list(PENTAGON_BASE_CELLS)))
    )
    res0 = bc.select(
        "bc",
        (
            F.lit((1 << 59) | _digit_fill(0))
            .cast("long")
            .bitwiseOR(F.shiftleft(F.col("bc"), _BC_SHIFT))
        ).alias("cell"),
    )
    res2 = h3_cell_to_children_df(res0, "cell", 2, out_col="c2").select(
        "bc", "c2"
    )
    sized = res2.select(
        "bc",
        "c2",
        h3_grid_disk_udf(2)(F.col("c2")).alias("disk"),
    ).select(
        "bc",
        "c2",
        F.size("disk").alias("sz"),
        F.explode("disk").alias("m"),
    )
    return (
        sized.groupBy("bc", "sz")
        .agg(
            F.count("*").alias("n_pairs"),
            F.count_distinct("c2").alias("n_cells"),
            F.expr("bit_xor(c2 ^ m)").alias("mix_xor"),
            F.min("m").alias("min_m"),
            F.max("m").alias("max_m"),
        )
        .orderBy("bc", "sz")
    )


def h3_grid_disk_members_sql() -> str:
    """Oracle twin: disk = hexdist ≤ 2 over the SQL-enumerated res-2
    coordinate patch (no lattice code shared with the engine)."""
    from gis_etl_spark.layout.h3compat import _digit_fill  # noqa: PLC0415

    pent = ", ".join(str(b) for b in PENTAGON_BASE_CELLS)
    head2 = (1 << 59) | (2 << _RES_SHIFT) | _digit_fill(2)
    d1_pos, d2_pos = 3 * (MAX_H3_RES - 1), 3 * (MAX_H3_RES - 2)
    return f"""
        WITH bcs AS (
          SELECT DISTINCT doc_id % 122 AS bc FROM documents
          WHERE doc_id % 122 NOT IN ({pent})
        ), units(d, ux, uy) AS (
          VALUES (0, 0, 0), (1, -1, -1), (2, 0, 1), (3, -1, 0),
                 (4, 1, 0), (5, 0, -1), (6, 1, 1)
        ), cells AS (
          SELECT bc,
                 CAST({head2} AS BIGINT)
                   | (bc * CAST({1 << _BC_SHIFT} AS BIGINT))
                   | (u1.d * CAST({1 << d1_pos} AS BIGINT))
                   | (u2.d * CAST({1 << d2_pos} AS BIGINT)) AS cell,
                 3 * u1.ux - u1.uy + u2.ux AS x,
                 u1.ux + 2 * u1.uy + u2.uy AS y
          FROM bcs, units u1, units u2
        ), pairs AS (
          SELECT a.bc AS bc, a.cell AS ca, b.cell AS cb
          FROM cells a JOIN cells b ON a.bc = b.bc
          WHERE CASE WHEN ((a.x - b.x) >= 0) = ((a.y - b.y) >= 0)
                     THEN greatest(abs(a.x - b.x), abs(a.y - b.y))
                     ELSE abs(a.x - b.x) + abs(a.y - b.y) END <= 2
        ), sized AS (
          SELECT bc, ca, count(*) AS sz FROM pairs GROUP BY bc, ca
        )
        SELECT p.bc AS bc, s.sz::INT AS sz,
               count(*)::BIGINT AS n_pairs,
               count(DISTINCT p.ca)::BIGINT AS n_cells,
               bit_xor(xor(p.ca, p.cb)) AS mix_xor,
               min(p.cb) AS min_m, max(p.cb) AS max_m
        FROM pairs p
        JOIN sized s ON p.bc = s.bc AND p.ca = s.ca
        GROUP BY p.bc, s.sz ORDER BY bc, sz
    """


def h3_grid_disk_stats(spark, sf_dir: str) -> DataFrame:
    """Registry query (rows-only by design — a k=2 lattice walk is not
    SQL-expressible; invariants pinned in tests/test_h3grid.py): k=2
    gridDisk over synthetic res-9 cells derived from documents,
    aggregated per base cell: how many disks are complete (19 members)
    vs boundary-truncated, plus an order-insensitive member xor. The
    plan is one Arrow map stage + one narrow explode + one partial
    agg — no payload shuffle, the 100 TB k-ring-smoothing shape."""
    from gis_etl_spark.io import read_table  # noqa: PLC0415
    from gis_etl_spark.layout.h3compat import synthetic_cell  # noqa: PLC0415

    docs = read_table(spark, sf_dir, "documents").select(
        synthetic_cell(F.col("doc_id")).alias("cell")
    )
    cells = docs.filter(
        ~F.shiftright("cell", _BC_SHIFT)
        .bitwiseAND(F.lit(0x7F))
        .isin(list(PENTAGON_BASE_CELLS))
    ).distinct()
    disks = cells.select(
        F.shiftright("cell", _BC_SHIFT).bitwiseAND(F.lit(0x7F)).alias("bc"),
        "cell",
        h3_grid_disk_udf(2)(F.col("cell")).alias("disk"),
    )
    return (
        disks.select(
            "bc",
            F.size("disk").alias("sz"),
            F.explode("disk").alias("m"),
        )
        .groupBy("bc")
        .agg(
            F.count_distinct("m").alias("n_members"),
            (F.sum((F.col("sz") == 19).cast("long")) / 19)
            .cast("long")
            .alias("n_complete"),
            F.expr("bit_xor(m)").alias("member_xor"),
        )
        .orderBy("bc")
    )


def h3_grid_disk_exact_udf(k: int):
    """Cross-base-cell-EXACT gridDisk — delegates to the `h3` package
    when importable, raises NotImplementedError otherwise.

    Decide-and-pin (VERDICT r7 item 3): extending the lattice walk
    across a base-cell boundary needs (a) the 122-entry base-cell
    neighbor table and (b) the per-crossing 60° rotation corrections —
    both published constants in H3's source, GENERATED from the
    icosahedron face layout (the same geodesic data behind
    latLngToCell). Neither is re-derivable from the id bit layout this
    module builds on, and unlike the pentagon set (which the per-res
    cell counts 2 + 120·7^r verify independently) no offline invariant
    constrains a candidate adjacency — the one published gridDisk doc
    example stays inside one base cell. Reproducing a 122×7 table from
    memory would ship exactly the silently-wrong-neighbor hazard the
    compat matrix bars for latLngToCell. So: in-base disks stay exact
    (grid_disk_arrays, len < 1+3k(k+1) flags truncation), and the
    cross-base-exact form is import-gated like h3_latlng_to_cell."""
    if k < 0:
        raise ValueError(f"k out of range: {k}")
    try:
        import h3  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "cross-base-exact gridDisk requires the `h3` package (its "
            "base-cell adjacency/orientation tables are geodesic data "
            "this engine cannot validate offline); use h3_grid_disk_udf "
            "for in-base disks with flagged truncation"
        ) from exc

    def _to_int(c) -> int:
        return int(c, 16) if isinstance(c, str) else int(c)

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(c: pd.Series) -> pd.Series:
        # same non-null int64 contract as the lattice UDFs (_ids64):
        # Arrow hands a NULL-bearing bigint column over as float64,
        # which silently corrupts ids above 2^53 AND turns NULL into
        # NaN (int(NaN) would kill the task) — demand pre-filtered
        # input and fail loudly instead (r8 review)
        ids = _ids64(c)
        out = []
        for v in ids:
            cells = h3.grid_disk(format(int(v), "x"), k)
            out.append(sorted(_to_int(x) for x in cells))
        return pd.Series(out, dtype=object)

    return _udf
