"""Operations on REAL H3 cell ids via the published bit layout —
exact join compatibility for users who already hold H3-indexed data.

Context (East-Asia-Building-Footprints.md:250-252): the reference
calls `H3_LATLNG_TO_CELL`. This engine's own hexing
(layout/geohex.py) uses engine-specific ids — producing true H3 ids
from coordinates requires H3's 122-base-cell table and CoordIJK
normalization, which cannot be validated offline (no h3 library in
this environment; shipping an unverifiable table is worse than an
honest deviation). What CAN be delivered exactly, and is verified
against publicly documented example indexes, is the id *algebra*: H3's
cell-index bit layout is published (H3 docs, "H3 Index Representations"):

    bit  63     reserved (0)
    bits 59-62  mode (1 = cell)
    bits 56-58  reserved (0)
    bits 52-55  resolution (0-15)
    bits 45-51  base cell (0-121)
    bits 0-44   15 resolution digits, 3 bits each (digit r at bits
                3*(15-r) .. 3*(15-r)+2); digits beyond the cell's
                resolution are 7 (invalid marker)

Everything below is pure bit arithmetic on that layout, as NATIVE
Spark expressions (whole-stage codegen; usable as join/partition
keys at 100 TB with zero Python):

- h3_get_resolution / h3_get_base_cell / h3_is_valid_cell
- h3_cell_to_parent — digit truncation; THE coarsening join key:
  rolling a user's res-9 corpus up to res-6 for a join needs no
  geometry at all, so existing H3 data joins/aggregates in-engine
  with exact H3 semantics
- h3_str_to_cell / h3_cell_to_str — hex-string ↔ int64 (H3 data
  interchange is usually the 15-char hex form)
- h3_is_pentagon / h3_cell_to_children / h3_cell_to_children_df —
  exact pentagon-aware children expansion: the only table it needs is
  the 12 documented pentagon base cells, offline-verified by
  re-deriving H3's published per-resolution cell counts (2 + 120·7^r)

For *generating* H3 ids from coordinates, `h3_latlng_to_cell`
delegates to the real `h3` python package when importable (exact
compat on any cluster that installs it) and raises a clear
NotImplementedError here — the engine-id alternative is
layout/geohex.py. tests/test_h3compat.py pins the documented example
indexes and, when `h3` is importable, cross-checks against the
library itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MODE_CELL = 1
_RES_SHIFT = 52
_BC_SHIFT = 45
MAX_H3_RES = 15


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def h3_get_resolution(cell: Column | str) -> Column:
    """Resolution (0-15) from a cell id — `(id >> 52) & 0xF`."""
    return F.shiftright(_c(cell), _RES_SHIFT).bitwiseAND(F.lit(0xF))


def h3_get_base_cell(cell: Column | str) -> Column:
    """Base cell number (0-121) — `(id >> 45) & 0x7F`. The natural
    coarse partition key for globally-distributed H3 data."""
    return F.shiftright(_c(cell), _BC_SHIFT).bitwiseAND(F.lit(0x7F))


def h3_is_valid_cell(cell: Column | str) -> Column:
    """Structural validity: mode 1, reserved bits clear, base cell
    < 122, digits ≤ 6 up to the resolution and exactly 7 beyond it.
    (Pentagon digit-sequence constraints need the base-cell table and
    are not checked — this accepts every real H3 cell and rejects
    malformed bit patterns.)"""
    v = _c(cell)
    res = h3_get_resolution(v)
    ok = (
        (F.shiftright(v, 63).bitwiseAND(F.lit(1)) == 0)
        & (F.shiftright(v, 59).bitwiseAND(F.lit(0xF)) == _MODE_CELL)
        & (F.shiftright(v, 56).bitwiseAND(F.lit(0x7)) == 0)
        & (h3_get_base_cell(v) < 122)
    )
    for r in range(1, MAX_H3_RES + 1):
        digit = F.shiftright(v, 3 * (MAX_H3_RES - r)).bitwiseAND(F.lit(7))
        ok = ok & F.when(F.lit(r) <= res, digit <= 6).otherwise(digit == 7)
    return ok


def h3_cell_to_parent(cell: Column | str, parent_res: int) -> Column:
    """Ancestor cell at `parent_res`: rewrite the resolution field and
    set every digit beyond parent_res to 7 — H3's own parent
    operation, bit-for-bit, so results join against ids produced by
    the h3 library. Rows already coarser than parent_res pass through
    unchanged (matching h3's error-free truncation contract for
    res == parent_res; coarser input is left to the caller to filter).
    """
    if not 0 <= parent_res <= MAX_H3_RES:
        raise ValueError(f"parent_res out of range: {parent_res}")
    v = _c(cell)
    res_cleared = v.bitwiseAND(F.lit(~(0xF << _RES_SHIFT)))
    with_res = res_cleared.bitwiseOR(F.lit(parent_res << _RES_SHIFT))
    # digits parent_res+1 .. 15 → 7
    fill = 0
    for r in range(parent_res + 1, MAX_H3_RES + 1):
        fill |= 7 << (3 * (MAX_H3_RES - r))
    return F.when(
        h3_get_resolution(v) <= F.lit(parent_res), v
    ).otherwise(with_res.bitwiseOR(F.lit(fill)))


def h3_cell_to_center_child(cell: Column | str, child_res: int) -> Column:
    """Center child at `child_res`: rewrite the resolution field and
    set every digit beyond the cell's current resolution to 0 — H3's
    own centerChild operation, bit-for-bit. Unlike full children
    expansion (which needs the pentagon base-cell list to skip digit 1
    under pentagons — a table this environment cannot validate), the
    center child ALWAYS exists with digit 0, for every cell including
    pentagons, so this is exact for the whole id space.

    The fine-grained twin of h3_cell_to_parent: together they align
    two H3 corpora indexed at different resolutions onto one join key
    in either direction. Rows already finer than child_res pass
    through unchanged (mirror of the parent contract)."""
    if not 0 <= child_res <= MAX_H3_RES:
        raise ValueError(f"child_res out of range: {child_res}")
    v = _c(cell)
    res = h3_get_resolution(v)
    res_cleared = v.bitwiseAND(F.lit(~(0xF << _RES_SHIFT)))
    with_res = res_cleared.bitwiseOR(F.lit(child_res << _RES_SHIFT))
    # digits res+1 .. child_res → 0; beyond child_res stay 7. The 7s
    # to clear depend on the ROW's resolution, so build the clear mask
    # per row: all digits strictly beyond `res` down to child_res.
    # mask_for(res) = Σ_{r=res+1..child_res} 7 << 3*(15-r); express as
    # a CASE over the 16 possible res values (constant-folded literals,
    # whole-stage codegen).
    cleared = with_res
    for rcur in range(0, child_res):
        mask = 0
        for r in range(rcur + 1, child_res + 1):
            mask |= 7 << (3 * (MAX_H3_RES - r))
        cleared = F.when(
            res == rcur, with_res.bitwiseAND(F.lit(~mask))
        ).otherwise(cleared)
    return F.when(res >= F.lit(child_res), v).otherwise(cleared)


# The 12 pentagon base cells — a publicly documented H3 constant (H3
# docs, "Base cells"; res-0 pentagons). This is the ONLY piece of the
# 122-base-cell table that children expansion needs, and unlike the
# geodesic face/ijk data it IS offline-verifiable: with exactly 12
# pentagons losing one child digit per level, the published per-res
# cell counts must come out as 122, 842, 5882, 41162, ... (= 2 + 120·7^r
# exactly), which tests/test_h3compat.py pins for res 0-15.
PENTAGON_BASE_CELLS = (4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)


def _digit_fill(res: int) -> int:
    """The 7-marker bits for digits beyond `res` (digit field of a
    valid cell at resolution res with all real digits zero)."""
    fill = 0
    for r in range(res + 1, MAX_H3_RES + 1):
        fill |= 7 << (3 * (MAX_H3_RES - r))
    return fill


def h3_is_pentagon(cell: Column | str) -> Column:
    """True iff the cell is a pentagon: its base cell is one of the 12
    pentagon base cells AND every digit up to its resolution is 0 (the
    pentagon lineage is exactly the center-child chain — H3 docs,
    'Indexing': digit 1 is the deleted K subsequence under pentagons,
    so only the digit-0 child of a pentagon is itself a pentagon)."""
    v = _c(cell)
    res = h3_get_resolution(v)
    digit_bits = v.bitwiseAND(F.lit((1 << 45) - 1))
    zerod = F.lit(False)
    for r in range(MAX_H3_RES + 1):
        zerod = F.when(
            res == r, digit_bits == F.lit(_digit_fill(r))
        ).otherwise(zerod)
    return h3_get_base_cell(v).isin(list(PENTAGON_BASE_CELLS)) & zerod


def h3_cell_to_children(cell: Column | str) -> Column:
    """Direct (res+1) children of a cell as array<long> — H3's
    cellToChildren one level down, bit-for-bit: append each digit
    0..6, EXCEPT digit 1 under a pentagon parent (the deleted K
    subsequence), so hexagons yield 7 children and pentagons 6.
    Resolution-15 input yields NULL (no finer cells exist).

    Pure bit arithmetic over the published layout — native
    expressions, whole-stage codegen, no Python; the per-row
    resolution is handled as a constant-folded CASE over the 15
    possible parent resolutions."""
    v = _c(cell)
    res = h3_get_resolution(v)
    pent = h3_is_pentagon(v)
    out = F.lit(None).cast("array<long>")
    for r in range(MAX_H3_RES):  # parent res r -> children res r+1
        pos = 3 * (MAX_H3_RES - (r + 1))
        base = (
            v.bitwiseAND(F.lit(~(0xF << _RES_SHIFT)))
            .bitwiseOR(F.lit((r + 1) << _RES_SHIFT))
            .bitwiseAND(F.lit(~(7 << pos)))
        )
        hex7 = F.array(
            *[base.bitwiseOR(F.lit(d << pos)) for d in range(7)]
        )
        pent6 = F.array(
            *[base.bitwiseOR(F.lit(d << pos)) for d in (0, 2, 3, 4, 5, 6)]
        )
        out = F.when(
            res == r, F.when(pent, pent6).otherwise(hex7)
        ).otherwise(out)
    return out


def h3_cell_to_children_df(df, cell_col: str, child_res: int, out_col="child"):
    """Full descendant expansion to `child_res` — H3's cellToChildren
    for arbitrary (even mixed) input resolutions, as a DataFrame
    transform: one row per descendant. Rows already AT child_res pass
    through; rows FINER than child_res are dropped (h3 errors there;
    a dropped row is the relational rendition). Exact for pentagons:
    each level excludes digit 1 under the (unique, center-child)
    pentagon lineage, so a res-0 pentagon yields 6, 41, 286, ...
    descendants while a hexagon yields 7, 49, 343, ...

    Scale: each level is ONE narrow explode (map-side 7x fan-out, no
    shuffle) — the uncompact plan a 100 TB H3 corpus wants; total
    output is 7^(child_res-res) per row, the caller's contract."""
    if not 0 <= child_res <= MAX_H3_RES:
        raise ValueError(f"child_res out of range: {child_res}")
    cur = df.withColumn(out_col, _c(cell_col)).filter(
        h3_get_resolution(F.col(out_col)) <= child_res
    )
    for _ in range(child_res):
        c = F.col(out_col)
        cur = cur.withColumn(
            out_col,
            F.explode(
                F.when(
                    h3_get_resolution(c) < child_res,
                    h3_cell_to_children(c),
                ).otherwise(F.array(c))
            ),
        )
    return cur


def h3_str_to_cell(s: Column | str) -> Column:
    """15-char hex form → int64 id (`conv` base 16)."""
    return F.conv(_c(s), 16, 10).cast("long")


def h3_cell_to_str(cell: Column | str) -> Column:
    """int64 id → lowercase hex form (no leading zeros, as h3 prints)."""
    return F.lower(F.hex(_c(cell)))


def synthetic_cell(doc_id: Column | str, res: int = 9) -> Column:
    """Deterministic VALID H3-layout cell id from an integer id —
    exercises the id algebra over driver tables without real H3 data:
    base cell = id % 122, digit r = (id·(r+7)) % 7 (0-6), trailing
    digits 7. Pure integer arithmetic, mirrored token-for-token by
    synthetic_cell_sql so the oracle hash-matches."""
    v = _c(doc_id)
    cell = F.lit((_MODE_CELL << 59) | (res << _RES_SHIFT)).cast("long")
    cell = cell.bitwiseOR(F.shiftleft(v % 122, _BC_SHIFT))
    for r in range(1, res + 1):
        cell = cell.bitwiseOR(
            F.shiftleft((v * (r + 7)) % 7, 3 * (MAX_H3_RES - r))
        )
    fill = 0
    for r in range(res + 1, MAX_H3_RES + 1):
        fill |= 7 << (3 * (MAX_H3_RES - r))
    return cell.bitwiseOR(F.lit(fill))


def synthetic_cell_sql(id_expr: str, res: int = 9) -> str:
    """ANSI twin of synthetic_cell."""
    parts = [str((_MODE_CELL << 59) | (res << _RES_SHIFT))]
    parts.append(f"((({id_expr}) % 122) << {_BC_SHIFT})")
    for r in range(1, res + 1):
        parts.append(
            f"(((({id_expr}) * {r + 7}) % 7) << {3 * (MAX_H3_RES - r)})"
        )
    fill = 0
    for r in range(res + 1, MAX_H3_RES + 1):
        fill |= 7 << (3 * (MAX_H3_RES - r))
    parts.append(str(fill))
    return "(" + " | ".join(parts) + ")"


def h3_parent_rollup(spark, sf_dir: str):
    """Registry query: synthesize res-9 H3-layout ids from documents,
    roll up to res-5 parents with the bit-exact truncation, and report
    per-base-cell stats — proving the published-layout algebra
    (extraction, parent, validity) end-to-end against the oracle."""
    from gis_etl_spark.io import read_table  # noqa: PLC0415

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    cells = docs.select(synthetic_cell("doc_id").alias("cell"))
    p5 = h3_cell_to_parent("cell", 5)
    return (
        cells.select(
            h3_get_base_cell("cell").alias("base_cell"),
            p5.alias("p5"),
            h3_is_valid_cell("cell").cast("int").alias("ok"),
        )
        .groupBy("base_cell")
        .agg(
            F.count("*").alias("n"),
            F.min("p5").alias("min_parent5"),
            F.max("p5").alias("max_parent5"),
            F.sum("ok").alias("n_valid"),
        )
        .orderBy("base_cell")
    )


def h3_parent_rollup_sql() -> str:
    cell = synthetic_cell_sql("doc_id")
    res_shift, bc_shift = _RES_SHIFT, _BC_SHIFT
    fill5 = 0
    for r in range(6, MAX_H3_RES + 1):
        fill5 |= 7 << (3 * (MAX_H3_RES - r))
    # precomputed literals: DuckDB evaluates small-int << in INT32 and
    # overflows at shift 52
    res_mask = ~(0xF << res_shift)  # negative two's-complement literal
    parent5 = (
        f"((({cell}) & ({res_mask})) | {5 << res_shift} | {fill5})"
    )
    # synthetic cells are valid by construction (digits ≤ 6, bc < 122)
    return f"""
        WITH c AS (
          SELECT ({cell}) AS cell, ({parent5}) AS p5,
                 ((({cell}) >> {bc_shift}) & 127) AS base_cell
          FROM documents
        )
        SELECT base_cell, count(*) AS n,
               min(p5) AS min_parent5, max(p5) AS max_parent5,
               count(*)::BIGINT AS n_valid
        FROM c GROUP BY base_cell ORDER BY base_cell
    """


def h3_children_rollup(spark, sf_dir: str):
    """Registry query: expand ALL 122 res-0 base cells (derived from
    documents so the oracle sees the same table) to their res-2
    descendants with the exact pentagon-aware children expansion, and
    report per-base-cell counts + id extrema. The counts themselves
    re-derive the published H3 cell-count table: 12 pentagon base
    cells x 41 + 110 hexagons x 49 = 5882 res-2 cells (H3 docs,
    'Tables of Cell Statistics')."""
    from gis_etl_spark.io import read_table  # noqa: PLC0415

    bc = (
        read_table(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 122).alias("bc"))
        .distinct()
    )
    res0 = bc.select(
        "bc",
        (
            F.lit((_MODE_CELL << 59) | _digit_fill(0)).cast("long")
            .bitwiseOR(F.shiftleft(F.col("bc"), _BC_SHIFT))
        ).alias("cell"),
    )
    kids = h3_cell_to_children_df(res0, "cell", 2)
    return (
        kids.groupBy("bc")
        .agg(
            F.count("*").alias("n_res2"),
            F.min("child").alias("min_child"),
            F.max("child").alias("max_child"),
            F.sum(h3_is_pentagon("child").cast("int")).alias("n_pent"),
        )
        .orderBy("bc")
    )


def h3_children_rollup_sql() -> str:
    """Independent oracle twin: re-derives every res-2 descendant id
    from digit arithmetic alone (no shared code with the Spark
    expansion beyond the published layout constants)."""
    pent = ", ".join(str(b) for b in PENTAGON_BASE_CELLS)
    head = (_MODE_CELL << 59) | (2 << _RES_SHIFT) | _digit_fill(2)
    d1_pos, d2_pos = 3 * (MAX_H3_RES - 1), 3 * (MAX_H3_RES - 2)
    return f"""
        WITH bcs AS (
          SELECT DISTINCT doc_id % 122 AS bc FROM documents
        ), digits AS (
          SELECT unnest(generate_series(0, 6)) AS d
        ), c1 AS (
          SELECT bc, d AS d1 FROM bcs, digits
          WHERE NOT (bc IN ({pent}) AND d = 1)
        ), c2 AS (
          SELECT bc, d1, d AS d2 FROM c1, digits
          WHERE NOT (bc IN ({pent}) AND d1 = 0 AND d = 1)
        ), cells AS (
          SELECT bc,
                 ({head} | (bc * {1 << _BC_SHIFT})
                   | (d1 * {1 << d1_pos}) | (d2 * {1 << d2_pos}))
                   AS child,
                 (bc IN ({pent}) AND d1 = 0 AND d2 = 0)::INT AS is_pent
          FROM c2
        )
        SELECT bc, count(*)::BIGINT AS n_res2,
               min(child) AS min_child, max(child) AS max_child,
               sum(is_pent)::BIGINT AS n_pent
        FROM cells GROUP BY bc ORDER BY bc
    """


def h3_latlng_to_cell(lat: Column, lng: Column, res: int) -> Column:
    """True H3 id generation — delegates to the `h3` package (Arrow
    UDF) when importable; this environment ships none, and generating
    ids from an unvalidated 122-base-cell table would silently corrupt
    joins against real H3 data, so without the library this raises.
    Engine-id hexing (same math, different ids) is
    layout/geohex.hex_cell."""
    try:
        import h3  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "true H3 id generation requires the `h3` package; use "
            "layout.geohex.hex_cell for engine-id hexing or install h3 "
            "for exact join compatibility"
        ) from exc

    import pandas as pd  # noqa: PLC0415

    def _to_int(c) -> int:
        return int(c, 16) if isinstance(c, str) else int(c)

    @F.pandas_udf("long")
    def _udf(la: pd.Series, ln: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _to_int(h3.latlng_to_cell(a, b, res))
                if a is not None and b is not None
                else None
                for a, b in zip(la, ln)
            ],
            dtype="Int64",
        )

    return _udf(lat, lng)


def h3_cell_to_latlng(cell: Column | str) -> Column:
    """Cell id → (lat, lng) center decode — like h3_latlng_to_cell,
    this needs H3's 122-base-cell geodesic table (face centers +
    CoordIJK unprojection), which cannot be validated offline, so it
    delegates to the `h3` package when importable and raises a clear
    NotImplementedError here. The supported offline spatial path for
    H3 corpora is the id algebra: parent/center-child alignment to a
    common resolution, then base-cell/parent containment joins."""
    try:
        import h3  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "H3 cell decode requires the `h3` package; offline, use the "
            "id algebra (h3_cell_to_parent / h3_cell_to_center_child) "
            "for resolution alignment and containment joins"
        ) from exc

    import pandas as pd  # noqa: PLC0415

    def _dec(v):
        if v is None:
            return (None, None)
        try:  # h3-py v4 string-id API
            return h3.cell_to_latlng(format(int(v), "x"))
        except (TypeError, ValueError):  # int-id builds
            return h3.cell_to_latlng(int(v))

    @F.pandas_udf("struct<lat:double,lng:double>")
    def _udf(c: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([_dec(v) for v in c], columns=["lat", "lng"])

    return _udf(_c(cell))
