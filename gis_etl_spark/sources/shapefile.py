"""ESRI Shapefile source — the reference's primary input format
(`ST_READ(file, keep_wkb=TRUE)`, east_asia.py:145; 358 Shapefiles in
the East-Asia corpus). No GDAL/GeoPandas here: the .shp main-file
format is a small public spec (ESRI Shapefile Technical Description,
July 1998) — 100-byte header, then records of big-endian (number,
content-length) headers around little-endian shape structs.

Spark integration: `binaryFile` source (one row per file, content as
bytes) → `mapInPandas` batch decoder → one row per feature with OGC
WKB geometry + provenance, i.e. exactly the (geom, source) shape the
reference's converted corpus has (east_asia.py:397-398).

Scale notes: shapefiles are indivisible (no intra-file splits — the
format has no sync markers), so parallelism is per-file, matching the
reference's per-file pool. maxPartitionBytes groups small files per
task; a 358-file corpus fills 358 task slots. Supported shapes: Point
(1), PolyLine (3), Polygon (5) + their Z variants (11/13/15, Z
dropped on request) — the types present in the reference corpus
(east_asia.py:37: types 1-7 plus POLYGON Z outliers).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

SHP_MAGIC = 9994
_SHAPE_NULL = 0
_SHAPE_POINT = 1
_SHAPE_POLYLINE = 3
_SHAPE_POLYGON = 5
_SHAPE_POINT_Z = 11
_SHAPE_POLYLINE_Z = 13
_SHAPE_POLYGON_Z = 15

OUT_SCHEMA = (
    "source string, record_id int, shape_type int, geom binary"
)


def _ring_signed_area(pts: np.ndarray) -> float:
    # shoelace via two dots + explicit wrap term — np.roll here cost
    # 53% of the whole decoder's profile at 100k features (r8 bench).
    # Summation order differs from the pre-r8 roll formulation, so an
    # epsilon-area sliver ring's SIGN (shell vs hole) is numerically
    # ambiguous across versions — inherent to any float shoelace (GEOS
    # orders differently again); only degenerate rings are affected,
    # and only their ring GROUPING, never their coordinates.
    if len(pts) == 0:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return float(
        x[:-1] @ y[1:] - x[1:] @ y[:-1] + x[-1] * y[0] - x[0] * y[-1]
    ) / 2.0


def _wkb_polygon(rings: list[np.ndarray]) -> bytes:
    out = bytearray(struct.pack("<BII", 1, 3, len(rings)))
    for r in rings:
        out += struct.pack("<I", len(r))
        out += r.astype("<f8").tobytes()
    return bytes(out)


def _polygon_wkb_from_parts(parts: list[np.ndarray]) -> bytes:
    """ESRI polygon parts → WKB POLYGON/MULTIPOLYGON. ESRI convention:
    shells are clockwise (negative shoelace area), holes counter-
    clockwise, holes follow their shell. Unknown orientation (all-CCW
    writers exist) → first ring is the shell."""
    if len(parts) == 1:  # one ring = the shell; orientation irrelevant
        return _wkb_polygon(parts)
    shells: list[list[np.ndarray]] = []
    for pts in parts:
        if _ring_signed_area(pts) < 0 or not shells:
            shells.append([pts])
        else:
            shells[-1].append(pts)
    if len(shells) == 1:
        return _wkb_polygon(shells[0])
    out = bytearray(struct.pack("<BII", 1, 6, len(shells)))
    for rings in shells:
        out += _wkb_polygon(rings)
    return bytes(out)


def _line_wkb_from_parts(parts: list[np.ndarray]) -> bytes:
    if len(parts) == 1:
        pts = parts[0]
        return (
            struct.pack("<BII", 1, 2, len(pts))
            + pts.astype("<f8").tobytes()
        )
    out = bytearray(struct.pack("<BII", 1, 5, len(parts)))
    for pts in parts:
        out += struct.pack("<BII", 1, 2, len(pts))
        out += pts.astype("<f8").tobytes()
    return bytes(out)


def _read_parts(content: bytes, off: int, n_parts: int, n_points: int):
    part_idx = np.frombuffer(content, "<i4", n_parts, off)
    pts = np.frombuffer(
        content, "<f8", n_points * 2, off + 4 * n_parts
    ).reshape(n_points, 2)
    bounds = list(part_idx) + [n_points]
    return [
        pts[bounds[i] : bounds[i + 1]] for i in range(n_parts)
    ]


def _check_shp_header(content) -> int:
    """Validate the 100-byte header; return the data end offset."""
    if len(content) < 100:
        raise ValueError("not a shapefile: truncated header")
    (magic,) = struct.unpack_from(">i", content, 0)
    if magic != SHP_MAGIC:
        raise ValueError(f"not a shapefile: bad magic {magic}")
    (file_len_words,) = struct.unpack_from(">i", content, 24)
    return min(file_len_words * 2, len(content))


def _decode_record_at(content, pos: int):
    """Decode one record whose 8-byte header sits at `pos`; returns
    (recno, shape_type, wkb|None, record_end_offset)."""
    recno, content_words = struct.unpack_from(">ii", content, pos)
    pos += 8
    rec_end = pos + content_words * 2
    (stype,) = struct.unpack_from("<i", content, pos)
    base = stype % 10 if stype in (11, 13, 15) else stype
    if stype == _SHAPE_NULL:
        return recno, stype, None, rec_end
    if base == _SHAPE_POINT:
        x, y = struct.unpack_from("<2d", content, pos + 4)
        return recno, stype, struct.pack("<BI2d", 1, 1, x, y), rec_end
    if base in (_SHAPE_POLYLINE, _SHAPE_POLYGON):
        n_parts, n_points = struct.unpack_from("<2i", content, pos + 4 + 32)
        parts = _read_parts(content, pos + 4 + 32 + 8, n_parts, n_points)
        if base == _SHAPE_POLYGON:
            wkb = _polygon_wkb_from_parts(parts)
        else:
            wkb = _line_wkb_from_parts(parts)
        return recno, stype, wkb, rec_end
    raise ValueError(f"unsupported shape type {stype}")


def parse_shp(content: bytes) -> Iterator[tuple[int, int, bytes | None]]:
    """Yield (record_number, shape_type, wkb|None) from .shp bytes.

    Z/M payloads after the XY block are ignored (the engine's Z-drop
    convention, east_asia.py:67-68); NULL shapes yield geom=None.
    """
    end = _check_shp_header(content)
    pos = 100
    while pos + 8 <= end:
        recno, stype, wkb, pos = _decode_record_at(content, pos)
        yield recno, stype, wkb


def parse_shx_offsets(shx: bytes, lo: int, hi: int) -> list[int]:
    """Byte offsets of records [lo, hi) from a .shx index slice. The
    index is the format's random-access/sync structure: 100-byte
    header, then one (>ii) = (offset in 16-bit words, content words)
    pair per record."""
    n = (len(shx) - 100) // 8
    if not 0 <= lo <= hi <= n:
        raise ValueError(f".shx slice [{lo}, {hi}) out of range ({n})")
    out = []
    for i in range(lo, hi):
        off_words, _ = struct.unpack_from(">ii", shx, 100 + 8 * i)
        out.append(off_words * 2)
    return out


def read_shapefile(
    spark: SparkSession, path_glob: str, chunk_records: int = 65_536
) -> DataFrame:
    """Distributed shapefile scan: batch decode to (source, record_id,
    shape_type, geom WKB). The engine rendition of
    `ST_READ(..., keep_wkb=TRUE)` (east_asia.py:145).

    Parallelism (r8): .shp has no sync markers, but the .shx sibling
    IS the sync structure — a file with more than `chunk_records`
    records and a .shx splits into record-range chunks, one task each,
    so ONE nationwide .shp no longer decodes as one serial task; every
    task mmaps the file and touches only its records' byte spans.
    LOCALITY CONTRACT (same as read_filegdb's chunked mode): chunked
    tasks open() the path directly, so it must be executor-visible
    (local mode / shared FS); non-local globs, index-less files, and
    small files keep the binaryFile whole-file route that ships bytes
    through Spark. chunk_records=0 disables chunking."""
    import glob as _glob  # noqa: PLC0415

    local = (
        sorted(_glob.glob(path_glob)) if "://" not in path_glob else []
    )
    local = [f for f in local if f.endswith(".shp")]
    chunks: list[tuple[str, int, int]] = []
    if chunk_records and local:
        for f in local:
            shx = f[:-4] + ".shx"
            try:
                nrec = (os.path.getsize(shx) - 100) // 8
            except OSError:
                nrec = 0
            if nrec > chunk_records:
                chunks.extend(
                    (f, lo, min(lo + chunk_records, nrec))
                    for lo in range(0, nrec, chunk_records)
                )
            else:
                chunks.append((f, -1, -1))  # whole-file in one task
    if chunks and any(lo >= 0 for _, lo, _ in chunks):
        cdf = spark.createDataFrame(
            chunks, "f string, lo long, hi long"
        ).repartition(len(chunks))

        def decode_chunks(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import mmap as _mmap  # noqa: PLC0415

            for pdf in batches:
                for f, lo, hi in zip(pdf["f"], pdf["lo"], pdf["hi"]):
                    lo, hi = int(lo), int(hi)
                    src = "file:" + os.path.abspath(f)
                    rows = []
                    with open(f, "rb") as fh, _mmap.mmap(
                        fh.fileno(), 0, access=_mmap.ACCESS_READ
                    ) as mm:
                        if lo < 0:
                            for recno, stype, wkb in parse_shp(mm):
                                rows.append((src, recno, stype, wkb))
                        else:
                            _check_shp_header(mm)
                            with open(f[:-4] + ".shx", "rb") as xf:
                                shx = xf.read()
                            for pos in parse_shx_offsets(shx, lo, hi):
                                if pos + 8 > len(mm):
                                    raise ValueError(
                                        f".shx offset {pos} past EOF"
                                    )
                                recno, stype, wkb, _ = _decode_record_at(
                                    mm, pos
                                )
                                rows.append((src, recno, stype, wkb))
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "source", "record_id", "shape_type", "geom",
                        ],
                    )

        return cdf.mapInPandas(decode_chunks, schema=OUT_SCHEMA)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.shp")
        .load(path_glob)
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for recno, stype, wkb in parse_shp(bytes(content)):
                    rows.append((path, recno, stype, wkb))
            yield pd.DataFrame(
                rows,
                columns=["source", "record_id", "shape_type", "geom"],
            )

    return files.mapInPandas(decode, schema=OUT_SCHEMA)


# --- writer (fixtures/testing only) ----------------------------------------

def write_shp(path: str, shapes: list[tuple[int, np.ndarray | list]]) -> None:
    """Minimal .shp/.shx writer for fixtures: shapes is a list of
    (shape_type, data) where data is an (n,2) array for point/polygon/
    polyline (single part). Produces spec-compliant files (CW shell
    orientation for polygons) so the reader is tested against
    independently-constructed bytes."""
    records = []
    for stype, data in shapes:
        if stype == _SHAPE_POINT:
            content = struct.pack("<i2d", 1, float(data[0]), float(data[1]))
        elif stype in (_SHAPE_POLYGON, _SHAPE_POLYLINE):
            pts = np.asarray(data, dtype="<f8")
            if stype == _SHAPE_POLYGON and _ring_signed_area(pts) > 0:
                pts = pts[::-1].copy()  # ESRI shells are clockwise
            bbox = (
                pts[:, 0].min(), pts[:, 1].min(),
                pts[:, 0].max(), pts[:, 1].max(),
            )
            content = (
                struct.pack("<i", stype)
                + struct.pack("<4d", *bbox)
                + struct.pack("<2i", 1, len(pts))
                + struct.pack("<i", 0)
                + pts.tobytes()
            )
        else:
            raise ValueError(f"writer unsupported type {stype}")
        records.append(content)

    xs, ys = [], []
    for stype, data in shapes:
        pts = np.atleast_2d(np.asarray(data, dtype="f8"))
        xs += [pts[:, 0].min(), pts[:, 0].max()]
        ys += [pts[:, 1].min(), pts[:, 1].max()]
    bbox = (min(xs), min(ys), max(xs), max(ys))

    body = bytearray()
    shx = bytearray()
    offset_words = 50
    for i, content in enumerate(records):
        header = struct.pack(">ii", i + 1, len(content) // 2)
        shx += struct.pack(">ii", offset_words, len(content) // 2)
        body += header + content
        offset_words += (len(header) + len(content)) // 2

    def file_header(total_words: int) -> bytes:
        h = bytearray(100)
        struct.pack_into(">i", h, 0, SHP_MAGIC)
        struct.pack_into(">i", h, 24, total_words)
        struct.pack_into("<i", h, 28, 1000)
        struct.pack_into("<i", h, 32, shapes[0][0] if shapes else 0)
        struct.pack_into("<4d", h, 36, *bbox)
        return bytes(h)

    with open(path, "wb") as fh:
        fh.write(file_header(50 + len(body) // 2))
        fh.write(body)
    with open(path[:-4] + ".shx", "wb") as fh:
        fh.write(file_header(50 + len(shx) // 2))
        fh.write(shx)
