"""FileGDB positive control: a .gdbtable assembled BYTE BY BYTE from
the public format description (Even Rouault's FGDB spec — the layout
restated in sources/filegdb.py's module docstring), deliberately NOT
via this repo's write_gdbtable. Round 2 flagged that the reader was
only ever validated against its own writer; this fixture breaks that
loop: a reader bug that write_gdbtable happens to mirror (field-tail
layout, null-bitmap bit order, varuint framing, scaled-coordinate
+1 offsets) now fails here instead of passing silently.

(An Esri-produced .gdbtable remains unavailable in this offline
environment — that residual gap is documented in COVERAGE.md.)
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from gis_etl_spark.sources.filegdb import (
    parse_gdbtable,
    parse_gdbtablx,
    read_filegdb,
)


def _varuint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _utf16(s: str) -> bytes:
    return bytes([len(s)]) + s.encode("utf-16-le")


XO = YO = -10.0
SCALE = 1000.0


def build_control_table() -> bytes:
    """OBJECTID + name(string) + height(float64) + Shape(point), 3 rows
    incl. NULL string/float and a NULL geometry."""
    # --- field section ------------------------------------------------
    f = bytearray()
    f += struct.pack("<i", 4)           # version
    f += bytes([1, 0, 0, 0])            # geom type (point) + 3 flags
    f += struct.pack("<h", 4)           # n_fields
    # OBJECTID: no stored value; tail = width byte + flags byte
    f += _utf16("OBJECTID") + _utf16("") + bytes([6, 4, 2])
    # name: string; tail = int32 max_len + flags (bit0 = nullable)
    f += _utf16("name") + _utf16("") + bytes([4]) + struct.pack("<i", 100)
    f += bytes([1])
    # height: float64; tail = width + flags
    f += _utf16("height") + _utf16("") + bytes([3, 8, 1])
    # Shape: geometry; tail = unknown + flags, int16 srs_len + utf16 srs,
    # z/m flag byte, xorigin/yorigin/xyscale doubles
    f += _utf16("Shape") + _utf16("") + bytes([7, 0, 1])
    srs = "WGS84"
    f += struct.pack("<h", len(srs)) + srs.encode("utf-16-le")
    f += bytes([0])
    f += struct.pack("<3d", XO, YO, SCALE)

    # --- rows ---------------------------------------------------------
    def point_blob(x: float, y: float) -> bytes:
        sx = round((x - XO) * SCALE) + 1
        sy = round((y - YO) * SCALE) + 1
        return _varuint(1) + _varuint(sx) + _varuint(sy)

    rows = []
    # row 1: all present
    body = bytearray([0b000])                      # bitmap: none NULL
    body += _varuint(5) + b"Alpha"
    body += struct.pack("<d", 12.5)
    g = point_blob(1.25, 2.5)
    body += _varuint(len(g)) + g
    rows.append(bytes(body))
    # row 2: name + height NULL (bits 0 and 1), geometry present
    body = bytearray([0b011])
    g = point_blob(0.0, 0.0)
    body += _varuint(len(g)) + g
    rows.append(bytes(body))
    # row 3: geometry NULL (bit 2)
    body = bytearray([0b100])
    body += _varuint(len("Béta".encode())) + "Béta".encode()
    body += struct.pack("<d", -3.25)
    rows.append(bytes(body))

    row_section = b"".join(
        struct.pack("<i", len(r)) + r for r in rows
    )
    table = bytearray()
    table += struct.pack("<ii", 3, len(rows))      # magic, n_rows
    table += b"\x00" * 16
    fsec = struct.pack("<i", len(f)) + bytes(f)
    total = 40 + len(fsec) + len(row_section)
    table += struct.pack("<q", total)              # file size @24
    table += struct.pack("<q", 40)                 # field section @32
    table += fsec + row_section
    assert len(table) == total
    return bytes(table)


EXPECT_WKB = [
    struct.pack("<BI2d", 1, 1, 1.25, 2.5),
    struct.pack("<BI2d", 1, 1, 0.0, 0.0),
    None,
]


def test_control_table_decodes_exactly():
    pdf = parse_gdbtable(build_control_table())
    assert list(pdf.columns) == ["OBJECTID", "name", "height", "Shape"]
    assert pdf["OBJECTID"].tolist() == [1, 2, 3]
    assert pdf["name"].tolist() == ["Alpha", None, "Béta"]
    h = pdf["height"].tolist()
    assert h[0] == 12.5 and np.isnan(h[1]) and h[2] == -3.25
    assert list(pdf["Shape"]) == EXPECT_WKB


def test_control_table_projection_skips_geometry():
    pdf = parse_gdbtable(build_control_table(), columns=["OBJECTID", "name"])
    assert list(pdf.columns) == ["OBJECTID", "name"]
    assert pdf["name"].tolist() == ["Alpha", None, "Béta"]


def _row_offsets(content: bytes, n: int) -> list[int]:
    """Size-prefix offsets of the n live rows, walked from the field
    section end — independent recomputation for index assembly."""
    fsec_size = struct.unpack_from("<i", content, 40)[0]
    pos, out = 40 + 4 + fsec_size, []
    while len(out) < n:
        (size,) = struct.unpack_from("<i", content, pos)
        if size >= 0:
            out.append(pos)
            pos += 4 + size
        else:
            pos += 4 - size
    return out


def _tablx_for(offsets: list[int], slots: list[int | None]) -> bytes:
    """Assemble a spec-shaped .gdbtablx: `slots` maps slot index →
    offsets-list position (None = hole), padded to 1024-slot blocks."""
    n_valid = sum(1 for s in slots if s is not None)
    n_blocks = (len(slots) + 1023) // 1024
    buf = bytearray(struct.pack("<4i", 3, n_blocks, n_valid, 5))
    for s in slots:
        buf += (0 if s is None else offsets[s]).to_bytes(5, "little")
    buf += b"\x00" * (5 * (n_blocks * 1024 - len(slots)))
    return bytes(buf)


def test_control_table_through_spark(spark, tmp_path):
    gdb = tmp_path / "control.gdb"
    os.makedirs(gdb)
    content = build_control_table()
    (gdb / "a00000001.gdbtable").write_bytes(content)
    offs = _row_offsets(content, 3)
    (gdb / "a00000001.gdbtablx").write_bytes(_tablx_for(offs, [0, 1, 2]))
    df = read_filegdb(spark, str(gdb / "a00000001.gdbtable"))
    rows = {r["OBJECTID"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[1]["name"] == "Alpha" and rows[3]["name"] == "Béta"
    assert rows[2]["name"] is None
    assert bytes(rows[1]["Shape"]) == EXPECT_WKB[0]
    assert rows[3]["Shape"] is None


def build_holed_table() -> bytes:
    """The 3-row control table with a DELETED-ROW HOLE spliced between
    rows 1 and 2: a negative-size record (the tombstone shape Esri
    leaves behind) whose dead bytes must be skipped and whose OID must
    stay consumed — live OIDs become 1, 3, 4."""
    content = bytearray(build_control_table())
    offs = _row_offsets(bytes(content), 3)
    # splice a 9-byte hole before row 2's record
    hole = struct.pack("<i", -9) + b"\xde\xad" * 4 + b"\x00"
    at = offs[1]
    content[at:at] = hole
    # header n_rows stays 3 (live rows); file size grows
    total = struct.unpack_from("<q", content, 24)[0] + len(hole)
    struct.pack_into("<q", content, 24, total)
    return bytes(content)


def test_sequential_walk_skips_deleted_hole():
    pdf = parse_gdbtable(build_holed_table())
    assert pdf["OBJECTID"].tolist() == [1, 3, 4]
    assert pdf["name"].tolist() == ["Alpha", None, "Béta"]
    assert list(pdf["Shape"]) == EXPECT_WKB


def test_tablx_drives_holes_and_oids():
    content = build_holed_table()
    offs = _row_offsets(content, 3)
    # slot layout: row0 → OID 1, hole at OID 2, row1 → OID 3,
    # row2 → OID 4, trailing hole at OID 5
    tablx = _tablx_for(offs, [0, None, 1, 2, None])
    assert parse_gdbtablx(tablx)[1] == 0
    pdf = parse_gdbtable(content, tablx=tablx)
    assert pdf["OBJECTID"].tolist() == [1, 3, 4]
    assert pdf["name"].tolist() == ["Alpha", None, "Béta"]
    assert list(pdf["Shape"]) == EXPECT_WKB


def test_tablx_row_count_mismatch_rejected():
    content = build_control_table()
    offs = _row_offsets(content, 3)
    short = _tablx_for(offs, [0, 1])  # claims 2 rows, header says 3
    try:
        parse_gdbtable(content, tablx=short)
    except ValueError as e:
        assert "counts 3" in str(e)
    else:  # pragma: no cover
        raise AssertionError("mismatched tablx accepted")


def test_multipage_tablx_through_spark(spark, tmp_path):
    """>1 data page in the index: 1500 live rows → two 1024-slot
    blocks with a zero-padded tail, plus 50 interior holes — the two
    layout features most likely to differ in Esri-authored files.
    Assembled from the spec here (write_gdbtable is NOT used for the
    index), decoded distributed through binaryFile + mapInPandas."""
    n_live, holes = 1500, {i * 30 for i in range(50)}
    f = bytearray()
    f += struct.pack("<i", 4)
    f += bytes([1, 0, 0, 0])
    f += struct.pack("<h", 2)
    f += _utf16("OBJECTID") + _utf16("") + bytes([6, 4, 2])
    f += _utf16("val") + _utf16("") + bytes([3, 8, 1])

    rows, expected = [], []
    oid = 1
    slot_positions: list[int | None] = []
    li = 0
    while len(expected) < n_live:
        if (oid - 1) in holes:
            slot_positions.append(None)           # deleted slot
            rows.append(None)
        else:
            body = bytearray([0b0])               # val present
            v = float(oid) * 0.5
            body += struct.pack("<d", v)
            rows.append(bytes(body))
            expected.append((oid, v))
            slot_positions.append(li)
            li += 1
        oid += 1

    fsec = struct.pack("<i", len(f)) + bytes(f)
    row_section = bytearray()
    offsets = []
    base = 40 + len(fsec)
    for r in rows:
        if r is None:                             # tombstone in the file
            row_section += struct.pack("<i", -6) + b"\x00" * 6
        else:
            offsets.append(base + len(row_section))
            row_section += struct.pack("<i", len(r)) + r
    table = bytearray()
    table += struct.pack("<ii", 3, n_live)
    table += b"\x00" * 16
    total = 40 + len(fsec) + len(row_section)
    table += struct.pack("<q", total)
    table += struct.pack("<q", 40)
    table += fsec + row_section
    assert len(table) == total

    tablx = _tablx_for(offsets, slot_positions)
    assert len(parse_gdbtablx(tablx)) == 2 * 1024  # two blocks

    gdb = tmp_path / "big.gdb"
    os.makedirs(gdb)
    (gdb / "a00000001.gdbtable").write_bytes(bytes(table))
    (gdb / "a00000001.gdbtablx").write_bytes(tablx)
    got = {
        r["OBJECTID"]: r["val"]
        for r in read_filegdb(spark, str(gdb / "a00000001.gdbtable")).collect()
    }
    assert len(got) == n_live
    for oid, v in expected[:5] + expected[-5:]:
        assert got[oid] == v
    # every hole OID absent
    assert all((h + 1) not in got for h in holes)


def _sparse_tablx(
    offsets: list[int],
    block_slots: dict[int, list[int | None]],
    n_total_blocks: int,
    bitmap_override: bytes | None = None,
    n_present_override: int | None = None,
) -> bytes:
    """Assemble a SPARSE spec-shaped .gdbtablx: only the blocks in
    `block_slots` are stored; the trailer carries the block bitmap
    (bit j set ⇒ block j present, LSB-first within each byte) per the
    public reverse-engineered spec. Built here from the spec text —
    independent of the parser under test."""
    present = sorted(block_slots)
    n_valid = sum(
        1 for b in present for s in block_slots[b] if s is not None
    )
    buf = bytearray(struct.pack("<4i", 3, len(present), n_valid, 5))
    for b in present:
        slots = block_slots[b]
        assert len(slots) <= 1024
        for s in slots:
            buf += (0 if s is None else offsets[s]).to_bytes(5, "little")
        buf += b"\x00" * (5 * (1024 - len(slots)))
    n_bitmap_words = (n_total_blocks + 31) // 32
    bitmap = bytearray(4 * n_bitmap_words)
    for b in present:
        bitmap[b >> 3] |= 1 << (b & 7)
    if bitmap_override is not None:
        bitmap = bitmap_override
        n_bitmap_words = len(bitmap) // 4
    buf += struct.pack(
        "<4i",
        n_bitmap_words,
        n_total_blocks,
        len(present) if n_present_override is None else n_present_override,
        n_bitmap_words,
    )
    buf += bitmap
    return bytes(buf)


def test_sparse_tablx_block_bitmap_expands_absent_blocks():
    """Spec-vector control: 3 total blocks with the middle one absent.
    The parser must expand the bitmap to 3072 slots — block 1 all
    holes — so OBJECTID = slot + 1 survives the gap: live rows land at
    OIDs 1, 2 and (block 2) 2049, 2050."""
    content = build_control_table()
    offs = _row_offsets(content, 3)
    tablx = _sparse_tablx(
        offs, {0: [0, 1], 2: [2, None]}, n_total_blocks=3
    )
    slots = parse_gdbtablx(tablx)
    assert len(slots) == 3 * 1024
    assert slots[0] == offs[0] and slots[1] == offs[1]
    assert all(s == 0 for s in slots[2:2048])
    assert slots[2048] == offs[2]
    assert all(s == 0 for s in slots[2049:])
    pdf = parse_gdbtable(content, tablx=tablx)
    assert pdf["OBJECTID"].tolist() == [1, 2, 2049]
    assert pdf["name"].tolist() == ["Alpha", None, "Béta"]


def test_sparse_tablx_through_spark(spark, tmp_path):
    gdb = tmp_path / "sparse.gdb"
    os.makedirs(gdb)
    content = build_control_table()
    (gdb / "a00000001.gdbtable").write_bytes(content)
    offs = _row_offsets(content, 3)
    (gdb / "a00000001.gdbtablx").write_bytes(
        _sparse_tablx(offs, {0: [0], 4: [1, 2]}, n_total_blocks=5)
    )
    df = read_filegdb(spark, str(gdb / "a00000001.gdbtable"))
    rows = {r["OBJECTID"]: r for r in df.collect()}
    assert sorted(rows) == [1, 4097, 4098]
    assert rows[1]["name"] == "Alpha"
    assert rows[4098]["name"] == "Béta"


def test_sparse_tablx_error_contract():
    """Out-of-spec sparse trailers fail LOUDLY (the pinned contract
    carried from the round-4 brief): truncated bitmap, popcount vs
    present-count disagreement, and trailer vs header block-count
    disagreement each raise ValueError — never a silent misread."""
    content = build_control_table()
    offs = _row_offsets(content, 3)
    good = _sparse_tablx(offs, {0: [0, 1], 2: [2]}, n_total_blocks=3)
    parse_gdbtablx(good)  # sanity: the good vector decodes
    with pytest.raises(ValueError, match="bitmap truncated"):
        parse_gdbtablx(good[:-2])
    # bitmap claims a 4th present block → popcount disagrees
    bad_pop = _sparse_tablx(
        offs,
        {0: [0, 1], 2: [2]},
        n_total_blocks=3,
        bitmap_override=bytes([0b1111, 0, 0, 0]),
    )
    with pytest.raises(ValueError, match="popcount"):
        parse_gdbtablx(bad_pop)
    # trailer's present-block count disagrees with the header
    bad_hdr = _sparse_tablx(
        offs, {0: [0, 1], 2: [2]}, n_total_blocks=3, n_present_override=7
    )
    with pytest.raises(ValueError, match="present blocks"):
        parse_gdbtablx(bad_hdr)
    # bitmap words too few for the declared total block count (a
    # zero-word bitmap is NOT this case — that's the dense form)
    with pytest.raises(ValueError, match="too small"):
        parse_gdbtablx(
            _sparse_tablx(
                offs,
                {0: [0, 1], 2: [2]},
                n_total_blocks=40,
                bitmap_override=bytes([0b101, 0, 0, 0]),
            )
        )
    # and a zero-word bitmap trailer decodes as the dense layout
    dense = _sparse_tablx(
        offs, {0: [0, 1, 2]}, n_total_blocks=1, bitmap_override=b""
    )
    assert [s for s in parse_gdbtablx(dense) if s] == [
        offs[0], offs[1], offs[2]
    ]


def test_chunked_scan_matches_single_task(spark, tmp_path):
    """r8 intra-file parallelism: chunk_rows=1 forces one task per row
    (ranged .gdbtablx reads); the result must equal the single-task
    whole-file decode, including NULLs, holes, and OID reconstruction."""
    gdb = tmp_path / "chunky.gdb"
    os.makedirs(gdb)
    content = build_control_table()
    (gdb / "a00000001.gdbtable").write_bytes(content)
    offs = _row_offsets(content, 3)
    (gdb / "a00000001.gdbtablx").write_bytes(_tablx_for(offs, [0, 1, 2]))
    path = str(gdb / "a00000001.gdbtable")
    many = read_filegdb(spark, path, chunk_rows=1)
    one = read_filegdb(spark, path, chunk_rows=0)
    assert many.rdd.getNumPartitions() == 3
    a = sorted(map(tuple, many.drop("source").collect()))
    b = sorted(map(tuple, one.drop("source").collect()))
    assert a == b


def test_batch_geometry_decode_matches_scalar():
    """The r8 whole-file vectorized varint pass must be bit-identical
    to the scalar per-blob decoder on every control geometry, and the
    batch path must route malformed blobs through the scalar decoder
    so the pinned ValueError contract survives."""
    from gis_etl_spark.sources import filegdb as FG

    content = build_control_table()
    pdf = parse_gdbtable(content)
    import unittest.mock as mock

    with mock.patch.object(
        FG,
        "_decode_geometries_batch",
        lambda c, spans, f: [
            FG._decode_geometry(c[s : s + ln], f) for s, ln in spans
        ],
    ):
        pdf_scalar = parse_gdbtable(content)
    assert list(pdf["Shape"]) == list(pdf_scalar["Shape"])
    assert pdf.equals(pdf_scalar)
    # malformed blob → scalar fallback raises the pinned contract
    f = FG.Field("Shape", FG.T_GEOMETRY, True, XO, YO, SCALE)
    bad = bytes([0x85])  # lone continuation byte: truncated varuint
    with pytest.raises(ValueError):
        FG._decode_geometries_batch(bad, [(0, 1)], f)


def test_wide_varuint_delta_decodes_not_overflows():
    """r8 review: a legal 10-byte zigzag varuint (delta -2^63) must
    decode — the int64-array fallback raised OverflowError, which
    escaped the ValueError-only contract and killed on_error='skip'
    scans."""
    from gis_etl_spark.sources import filegdb as FG

    blob = bytearray()
    FG._write_varuint(blob, 5)  # polygon
    FG._write_varuint(blob, 2)  # n_points
    FG._write_varuint(blob, 1)  # n_parts
    for _ in range(4):
        FG._write_varuint(blob, 0)  # bbox
    FG._write_varuint(blob, FG._zigzag(10))  # x0
    FG._write_varuint(blob, 2**64 - 1)  # x-delta zigzag -> -2^63
    FG._write_varuint(blob, FG._zigzag(3))  # y0
    FG._write_varuint(blob, FG._zigzag(1))  # y-delta
    f = FG.Field("Shape", FG.T_GEOMETRY, True, 0.0, 0.0, 1.0)
    wkb = FG._decode_geometry(bytes(blob), f)
    assert wkb is not None and len(wkb) == 45
    (batch,) = FG._decode_geometries_batch(bytes(blob), [(0, len(blob))], f)
    assert batch == wkb
