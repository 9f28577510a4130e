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

from gis_etl_spark.sources.filegdb import parse_gdbtable, read_filegdb


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


def test_control_table_through_spark(spark, tmp_path):
    gdb = tmp_path / "control.gdb"
    os.makedirs(gdb)
    content = build_control_table()
    (gdb / "a00000001.gdbtable").write_bytes(content)
    # matching .gdbtablx: 16-byte header + 5-byte LE row offsets
    tablx = struct.pack("<iiii", 3, 0, 3, 5) + b"".join(
        int(0).to_bytes(5, "little") for _ in range(3)
    )
    (gdb / "a00000001.gdbtablx").write_bytes(tablx)
    df = read_filegdb(spark, str(gdb / "a00000001.gdbtable"))
    rows = {r["OBJECTID"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[1]["name"] == "Alpha" and rows[3]["name"] == "Béta"
    assert rows[2]["name"] is None
    assert bytes(rows[1]["Shape"]) == EXPECT_WKB[0]
    assert rows[3]["Shape"] is None
