"""ESRI FileGDB (.gdbtable) source — the reference's second input
format (`ST_READ('…/*.gdbtable')` over the largest member,
ORNL-FEMA-Buildings.md:76-81).

No GDAL here: this is a from-scratch decoder for a SUBSET of the
.gdbtable format as publicly reverse-engineered (Even Rouault's
FGDB spec, the basis of GDAL's OpenFileGDB driver). SURVEY.md §2 S3
scoped v1 to a parquet model; this module upgrades S3 to a real
binary reader. Honest validation note: no Esri-produced .gdbtable
exists in this offline environment, so the reader is validated
against this module's own spec-following writer plus a parquet twin —
structure (header, utf-16 field descriptors, null bitmaps, varuint
strings, delta-varint compressed geometry) follows the public spec;
unvalidated corners are documented inline.

Format subset:

.gdbtable
  40-byte header: int32 magic=3, int32 n_rows, 16 reserved bytes,
  int64 file_size @24, int64 field-section offset @32 (=40).
  Field section: int32 section_size, int32 version=4,
  byte geom_type, 3 flag bytes, int16 n_fields, then per field:
  u8 name_len + UTF-16-LE name, u8 alias_len + UTF-16-LE alias,
  u8 type, type-specific tail:
    string(4): int32 max_len, u8 flags
    int32(1) / float64(3): u8 width, u8 flags
    objectid(6): u8 width, u8 flags (no stored value — implicit id)
    geometry(7): u8 unknown, u8 flags, int16 srs_len + UTF-16 srs,
      u8 has_zm_flags, f64 xorigin, yorigin, xyscale
  Rows: per row int32 size, then ceil(n_nullable/8)-byte null bitmap
  (bit set → NULL), then non-null field values in declaration order:
  int32 LE | f64 LE | varuint len + UTF-8 string | varuint len +
  compressed-geometry blob.

compressed geometry (scaled ints: v = round((coord − origin)·scale))
  point: varuint type=1, varuint sx+1, varuint sy+1
  polygon: varuint type=5, varuint n_points, varuint n_parts,
    bbox varuints (sxmin, symin, sdx, sdy), per-part point counts
    (all but last), then zigzag-varint deltas per coordinate, x run
    then y run, first delta absolute.

.gdbtablx
  16-byte header: int32 magic=3, int32 reserved, int32 n_rows,
  int32 offset_width=5; then n_rows little-endian 5-byte offsets.

Scale notes (r8): .gdbtable has no intra-file sync markers, but the
.gdbtablx row index IS the sync structure — read_filegdb splits the
(OBJECTID, offset) plan into chunk_rows-row slices, one Spark task
each, so a single 100 GB layer decodes in parallel instead of as one
serial task (dense index → each task range-reads only its slice of
the index; sparse → plans ship from the driver). The decoder takes a
`columns` projection and SKIPS the decode of unrequested fields
(geometry blobs are length-prefixed, so an attrs-only query never
pays geometry decode — the EXCLUDE(Shape) projection,
ORNL-FEMA-Buildings.md:80-81, reaches inside the Python decoder
where Catalyst cannot). Geometry blobs batch-decode via one
vectorized varint pass per task (see _decode_geometries_batch)."""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

GDB_MAGIC = 3

T_INT32 = 1
T_FLOAT64 = 3
T_STRING = 4
T_OBJECTID = 6
T_GEOMETRY = 7

GEOM_NONE = 0
GEOM_POINT = 1
GEOM_POLYGON = 4

_SHAPE_POINT = 1
_SHAPE_POLYGON = 5

DEFAULT_XYSCALE = 1.0e9  # ~1e-9 deg quantization (≈0.1 µm at equator)
DEFAULT_ORIGIN = -400.0  # safely below any lon/lat value


# --- varint helpers --------------------------------------------------------


def _write_varuint(out: bytearray, v: int) -> None:
    if v < 0:
        raise ValueError("varuint must be non-negative")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _unpack(fmt: str, buf: bytes, pos: int) -> tuple:
    """struct.unpack_from with truncation mapped to ValueError (the
    decoder's single failure type — see read_filegdb on_error)."""
    try:
        return struct.unpack_from(fmt, buf, pos)
    except struct.error as e:
        raise ValueError(f"truncated structure at offset {pos}: {e}") from e


def _read_varuint(buf: bytes, pos: int) -> tuple[int, int]:
    """Bounds-checked varuint: truncation and over-long encodings (>64
    bits — a malformed stream of continuation bytes would otherwise
    loop to a silent huge int) raise ValueError, so hostile input
    surfaces as a per-file decode failure, never an IndexError or
    memory bomb deep in a task."""
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated varuint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if result > 0xFFFFFFFFFFFFFFFF:
                raise ValueError("varuint exceeds 64 bits")
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("over-long varuint (>64 bits)")


def _read_varuints_scalar(
    buf: bytes, pos: int, n: int
) -> tuple[np.ndarray, int]:
    """Scalar fallback for _read_varuints_vec: OBJECT-dtype output so
    legal 9-10-byte varuints with values ≥ 2^63 survive as Python ints
    (an int64 array raised OverflowError here — r8 review finding —
    which escaped the ValueError-only error contract and killed
    on_error='skip' scans). _unzigzag_vec and np.cumsum both operate
    element-wise with exact Python-int semantics on object arrays, so
    downstream math matches the pre-r8 per-value loop bit-for-bit."""
    vals = np.empty(n, dtype=object)
    for i in range(n):
        v, pos = _read_varuint(buf, pos)
        vals[i] = v
    return vals, pos


def _read_varuints_vec(
    buf: bytes, pos: int, n: int
) -> tuple[np.ndarray, int]:
    """Decode exactly `n` consecutive varuints starting at `pos`,
    vectorized: one uint8 view, terminator-bit scan, and a single
    `np.add.reduceat` over the 7-bit limbs. The scalar loop cost 2.8 s
    of the 9 s single-thread decode at 100k features (r8 bench
    profile); this path does the same work in ~30 ms. Falls back to
    the bounds-checked scalar reader when any varint spans > 8 bytes
    (value ≥ 2^56 — never true for real coordinate deltas, and the
    scalar path carries the full 64-bit validation). Truncation (fewer
    than n terminators before end-of-buffer) raises ValueError like
    the scalar reader."""
    if n == 0:
        return np.empty(0, dtype=np.int64), pos
    # scan window bounded by the max varint width (10 bytes) so one
    # geometry's decode never scans the rest of the file
    win = min(len(buf) - pos, 10 * n)
    b = np.frombuffer(buf, np.uint8, win, pos)
    term = np.flatnonzero(b < 0x80)
    if len(term) < n:
        if win < len(buf) - pos:  # degenerate over-long varuints → scalar
            return _read_varuints_scalar(buf, pos, n)
        raise ValueError("truncated varuint")
    ends = term[:n]
    starts = np.empty(n, dtype=ends.dtype)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    if int((ends - starts).max()) > 7:  # > 8 bytes somewhere → scalar
        return _read_varuints_scalar(buf, pos, n)
    used = int(ends[n - 1]) + 1
    limbs = (b[:used].astype(np.int64) & 0x7F) << (
        7 * (np.arange(used, dtype=np.int64) - np.repeat(starts, ends - starts + 1))
    )
    vals = np.add.reduceat(limbs, starts)
    return vals, pos + used


def _unzigzag_vec(v: np.ndarray) -> np.ndarray:
    return (v >> 1) ^ -(v & 1)


def _decode_geometries_batch(
    content: bytes, spans: list[tuple[int, int]], f: Field
) -> list[bytes | None]:
    """Batch geometry decode: ONE vectorized varint pass over every
    blob in the file, then per-blob WKB assembly from the pre-decoded
    value stream. The per-geometry scalar decode cost ~45% of
    single-thread file decode at 100k features (r8 bench profile);
    the whole-file pass amortizes the numpy fixed costs that made
    per-geometry vectorization a net loss on small polygons.

    Our format subset (point / polygon, no curves or Z) makes every
    blob a pure varint stream, so the global terminator scan aligns
    varint boundaries with blob boundaries for well-formed input. Any
    blob that violates that (truncated, over-long varints, trailing
    bytes, header/count mismatch) is re-decoded by the scalar
    `_decode_geometry`, which raises the pinned ValueError contract."""
    out: list[bytes | None] = [None] * len(spans)
    if not spans:
        return out
    lens = np.array([ln for _, ln in spans], dtype=np.int64)
    buf = b"".join(content[s : s + ln] for s, ln in spans)
    b = np.frombuffer(buf, np.uint8)
    term = np.flatnonzero(b < 0x80)
    n_v = len(term)
    starts = np.empty(n_v, dtype=np.int64)
    if n_v:
        starts[0] = 0
        starts[1:] = term[:-1] + 1
    widths = term - starts + 1
    blob_ends = np.cumsum(lens)
    # varints per blob boundary; a blob whose last byte is not a
    # terminator (or containing an over-wide varint) goes scalar
    vt_bounds = np.searchsorted(term, blob_ends - 1, side="right")
    ok_vec = n_v == 0 or int(widths.max()) <= 8
    bulk = np.zeros(len(spans), dtype=bool)
    if ok_vec and n_v:
        # per-byte-position accumulation: ≤8 gathers of n_varints beats
        # the arange+repeat+reduceat formulation over every byte (those
        # three were 0.9 s of the 2 s single-thread decode)
        all_vals = np.zeros(n_v, dtype=np.int64)
        for k in range(int(widths.max())):
            act = widths > k
            byte = b[np.minimum(starts + k, len(b) - 1)].astype(np.int64)
            all_vals += np.where(act, (byte & 0x7F) << (7 * k), 0)
        dec = _unzigzag_vec(all_vals)
        # segmented cumsum machinery: g[j] - (g[a] - dec[a]) is the
        # within-segment cumulative sum starting at index a
        g = np.cumsum(dec)

        # ---- bulk lane: well-formed single-ring polygons assemble as
        # ONE output buffer (vectorized headers/counts/coords), no
        # per-blob numpy calls. Everything else (points, multi-ring,
        # malformed) drops to the per-blob loop below.
        nb = len(spans)
        t0s = np.empty(nb, dtype=np.int64)
        t0s[0] = 0
        t0s[1:] = vt_bounds[:-1]
        bstarts = np.empty(nb, dtype=np.int64)
        bstarts[0] = 0
        bstarts[1:] = blob_ends[:-1]
        nvs = vt_bounds - t0s
        t0c = np.minimum(t0s, n_v - 1)
        wf = (
            (nvs >= 7)
            & (starts[t0c] == bstarts)
            & (term[np.minimum(vt_bounds - 1, n_v - 1)] == blob_ends - 1)
        )
        npts_a = all_vals[np.minimum(t0c + 1, n_v - 1)]
        nparts_a = all_vals[np.minimum(t0c + 2, n_v - 1)]
        bulk = (
            wf
            & (all_vals[t0c] == _SHAPE_POLYGON)
            & (nparts_a == 1)
            & (npts_a > 0)
            & (nvs == 7 + 2 * npts_a)
            & (npts_a <= lens // 2)
        )
        bidx = np.flatnonzero(bulk)
        if len(bidx):
            npts = npts_a[bidx]
            t0b = t0s[bidx]
            out_lens = 13 + 16 * npts
            out_offs = np.zeros(len(bidx) + 1, dtype=np.int64)
            np.cumsum(out_lens, out=out_offs[1:])
            big = np.empty(int(out_offs[-1]), dtype=np.uint8)
            hdr = (1, 3, 0, 0, 0, 1, 0, 0, 0)  # WKB LE POLYGON, 1 ring
            for j, hv in enumerate(hdr):
                big[out_offs[:-1] + j] = hv
            cnt = np.ascontiguousarray(npts.astype("<u4")).view(
                np.uint8
            ).reshape(-1, 4)
            for j in range(4):
                big[out_offs[:-1] + 9 + j] = cnt[:, j]
            total_pts = int(npts.sum())
            pts_starts = np.zeros(len(bidx) + 1, dtype=np.int64)
            np.cumsum(npts, out=pts_starts[1:])
            seg = np.repeat(np.arange(len(bidx)), npts)
            within = np.arange(total_pts) - pts_starts[seg]
            x0 = (t0b + 7)[seg]
            y0 = x0 + npts[seg]
            x_idx = x0 + within
            y_idx = y0 + within
            xy = np.empty((total_pts, 2), dtype="<f8")
            xy[:, 0] = (g[x_idx] - g[x0] + dec[x0]) / f.xyscale + f.xorigin
            xy[:, 1] = (g[y_idx] - g[y0] + dec[y0]) / f.xyscale + f.yorigin
            xyb = xy.reshape(-1).view(np.uint8)
            mv = memoryview(big)
            for j, i in enumerate(bidx):
                o = int(out_offs[j])
                c0 = int(pts_starts[j]) * 16
                c1 = int(pts_starts[j + 1]) * 16
                big[o + 13 : o + 13 + (c1 - c0)] = xyb[c0:c1]
                out[int(i)] = bytes(mv[o : int(out_offs[j + 1])])
    scale, xo, yo = f.xyscale, f.xorigin, f.yorigin
    for i, (s, ln) in enumerate(spans):
        if bulk[i]:
            continue
        t0 = int(vt_bounds[i - 1]) if i else 0
        t_cur = int(vt_bounds[i])
        blob_start = int(blob_ends[i - 1]) if i else 0
        nv = t_cur - t0
        # well-formed = this blob's varints tile it exactly: first
        # varint starts at its first byte, last terminator is its last
        well_formed = (
            ok_vec
            and nv > 0
            and int(starts[t0]) == blob_start
            and int(term[t_cur - 1]) == int(blob_ends[i]) - 1
        )
        if not well_formed:
            out[i] = _decode_geometry(content[s : s + ln], f)
            continue
        stype = int(all_vals[t0])
        if stype == _SHAPE_POINT and nv == 3:
            x = (int(all_vals[t0 + 1]) - 1) / scale + xo
            y = (int(all_vals[t0 + 2]) - 1) / scale + yo
            out[i] = struct.pack("<BI2d", 1, 1, x, y)
            continue
        if stype != _SHAPE_POLYGON or nv < 7:
            out[i] = _decode_geometry(content[s : s + ln], f)
            continue
        n_points = int(all_vals[t0 + 1])
        n_parts = int(all_vals[t0 + 2])
        head = 7 + max(0, n_parts - 1)
        if (
            n_parts <= 0
            or n_parts > n_points + 1
            or nv != head + 2 * n_points
            or n_points > ln // 2
        ):
            out[i] = _decode_geometry(content[s : s + ln], f)
            continue
        counts = [int(c) for c in all_vals[t0 + 7 : t0 + head]]
        last = n_points - sum(counts)
        if last < 0:
            out[i] = _decode_geometry(content[s : s + ln], f)
            continue
        counts.append(last)
        cx = t0 + head
        cy = cx + n_points
        # within-blob cumsum of the delta stream via the global cumsum
        xs = (g[cx : cx + n_points] - (g[cx] - dec[cx])) / scale + xo
        ys = (g[cy : cy + n_points] - (g[cy] - dec[cy])) / scale + yo
        xy = np.empty((n_points, 2), dtype="<f8")
        xy[:, 0] = xs
        xy[:, 1] = ys
        w = bytearray(struct.pack("<BII", 1, 3, n_parts))
        st = 0
        for c in counts:
            w += struct.pack("<I", c)
            w += xy[st : st + c].tobytes()
            st += c
        out[i] = bytes(w)
    return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# --- field descriptors -----------------------------------------------------


class Field:
    __slots__ = ("name", "ftype", "nullable", "xorigin", "yorigin", "xyscale")

    def __init__(self, name, ftype, nullable=True,
                 xorigin=DEFAULT_ORIGIN, yorigin=DEFAULT_ORIGIN,
                 xyscale=DEFAULT_XYSCALE):
        self.name = name
        self.ftype = ftype
        self.nullable = nullable and ftype != T_OBJECTID
        self.xorigin = xorigin
        self.yorigin = yorigin
        self.xyscale = xyscale


def _pack_utf16(out: bytearray, text: str) -> None:
    out.append(len(text))
    out += text.encode("utf-16-le")


def _unpack_utf16(buf: bytes, pos: int) -> tuple[str, int]:
    if pos >= len(buf):
        raise ValueError("truncated utf-16 string length")
    n = buf[pos]
    pos += 1
    if pos + 2 * n > len(buf):
        raise ValueError(f"utf-16 string runs past EOF (len {n})")
    return buf[pos : pos + 2 * n].decode("utf-16-le"), pos + 2 * n


# --- geometry blobs --------------------------------------------------------


def _encode_point(x: float, y: float, f: Field) -> bytes:
    out = bytearray()
    _write_varuint(out, _SHAPE_POINT)
    _write_varuint(out, round((x - f.xorigin) * f.xyscale) + 1)
    _write_varuint(out, round((y - f.yorigin) * f.xyscale) + 1)
    return bytes(out)


def _encode_polygon(rings: list[np.ndarray], f: Field) -> bytes:
    out = bytearray()
    _write_varuint(out, _SHAPE_POLYGON)
    sx = [np.rint((r[:, 0] - f.xorigin) * f.xyscale).astype("int64")
          for r in rings]
    sy = [np.rint((r[:, 1] - f.yorigin) * f.xyscale).astype("int64")
          for r in rings]
    n_points = sum(len(r) for r in rings)
    _write_varuint(out, n_points)
    _write_varuint(out, len(rings))
    ax = np.concatenate(sx)
    ay = np.concatenate(sy)
    _write_varuint(out, int(ax.min()))
    _write_varuint(out, int(ay.min()))
    _write_varuint(out, int(ax.max() - ax.min()))
    _write_varuint(out, int(ay.max() - ay.min()))
    for r in rings[:-1]:
        _write_varuint(out, len(r))
    prev = 0
    for arr in (ax, ay):  # x run, then y run; first delta absolute
        prev = 0
        for v in arr.tolist():
            _write_varuint(out, _zigzag(v - prev))
            prev = v
    return bytes(out)


def _decode_geometry(blob: bytes, f: Field) -> bytes | None:
    """Compressed geometry → OGC WKB (little-endian)."""
    stype, pos = _read_varuint(blob, 0)
    if stype == _SHAPE_POINT:
        sx, pos = _read_varuint(blob, pos)
        sy, pos = _read_varuint(blob, pos)
        x = (sx - 1) / f.xyscale + f.xorigin
        y = (sy - 1) / f.xyscale + f.yorigin
        return struct.pack("<BI2d", 1, 1, x, y)
    if stype == _SHAPE_POLYGON:
        n_points, pos = _read_varuint(blob, pos)
        n_parts, pos = _read_varuint(blob, pos)
        # memory-bomb guard: every coordinate delta costs ≥1 byte in the
        # stream (2 varints per point), so a lying n_points can demand at
        # most len(blob)/2 real points — allocate against that bound,
        # not the claimed count
        if n_points > len(blob) // 2:
            raise ValueError(
                f"geometry claims {n_points} points but blob is only "
                f"{len(blob)} bytes"
            )
        if n_parts > n_points + 1:
            raise ValueError(
                f"geometry claims {n_parts} parts for {n_points} points"
            )
        for _ in range(4):  # bbox (audit-only here)
            _, pos = _read_varuint(blob, pos)
        counts = []
        for _ in range(max(0, n_parts - 1)):
            c, pos = _read_varuint(blob, pos)
            counts.append(c)
        last = n_points - sum(counts)
        if last < 0:
            raise ValueError(
                f"part counts {counts} exceed claimed {n_points} points"
            )
        counts.append(last)
        zz, pos = _read_varuints_vec(blob, pos, 2 * n_points)
        vals = _unzigzag_vec(zz)
        xs = np.cumsum(vals[:n_points]) / f.xyscale + f.xorigin
        ys = np.cumsum(vals[n_points:]) / f.xyscale + f.yorigin
        xy = np.empty((n_points, 2))
        xy[:, 0] = xs
        xy[:, 1] = ys
        out = bytearray(struct.pack("<BII", 1, 3, n_parts))
        start = 0
        for c in counts:
            out += struct.pack("<I", c)
            out += xy[start : start + c].astype("<f8").tobytes()
            start += c
        return bytes(out)
    raise ValueError(f"unsupported compressed-geometry type {stype}")


# --- table writer (fixtures/testing only) ----------------------------------


def write_gdbtable(
    path: str, fields: list[Field], rows: list[tuple], geom_type: int
) -> None:
    """Spec-subset .gdbtable + .gdbtablx writer. `rows` carry one
    value per non-OBJECTID field (OBJECTID is implicit); geometry
    values are (kind, data): (1, (x, y)) or (5, [rings])."""
    fsec = bytearray()
    fsec += struct.pack("<i", 4)  # version
    fsec += struct.pack("<B3x", geom_type)
    fsec += struct.pack("<h", len(fields))
    for f in fields:
        _pack_utf16(fsec, f.name)
        _pack_utf16(fsec, "")  # alias
        fsec.append(f.ftype)
        if f.ftype == T_STRING:
            fsec += struct.pack("<iB", 65536, 1 if f.nullable else 0)
        elif f.ftype in (T_INT32, T_FLOAT64):
            width = 4 if f.ftype == T_INT32 else 8
            fsec += struct.pack("<BB", width, 1 if f.nullable else 0)
        elif f.ftype == T_OBJECTID:
            fsec += struct.pack("<BB", 4, 0)
        elif f.ftype == T_GEOMETRY:
            fsec.append(0)
            fsec += struct.pack("<B", 1 if f.nullable else 0)
            srs = "GCS_WGS_1984"
            fsec += struct.pack("<h", len(srs))
            fsec += srs.encode("utf-16-le")
            fsec.append(0)  # no Z/M
            fsec += struct.pack("<3d", f.xorigin, f.yorigin, f.xyscale)
        else:
            raise ValueError(f"writer unsupported field type {f.ftype}")

    payload = fields_payload = [f for f in fields if f.ftype != T_OBJECTID]
    nullable = [f for f in payload if f.nullable]
    body = bytearray()
    offsets = []
    base = 40 + 4 + len(fsec)
    for row in rows:
        assert len(row) == len(fields_payload)
        rec = bytearray()
        bitmap = bytearray((len(nullable) + 7) // 8)
        ni = 0
        vals = bytearray()
        for f, v in zip(payload, row):
            if f.nullable:
                if v is None:
                    bitmap[ni // 8] |= 1 << (ni % 8)
                ni += 1
            if v is None:
                continue
            if f.ftype == T_INT32:
                vals += struct.pack("<i", int(v))
            elif f.ftype == T_FLOAT64:
                vals += struct.pack("<d", float(v))
            elif f.ftype == T_STRING:
                enc = str(v).encode("utf-8")
                _write_varuint(vals, len(enc))
                vals += enc
            elif f.ftype == T_GEOMETRY:
                kind, data = v
                if kind == _SHAPE_POINT:
                    blob = _encode_point(data[0], data[1], f)
                else:
                    blob = _encode_polygon(data, f)
                _write_varuint(vals, len(blob))
                vals += blob
            else:
                raise ValueError(f"unsupported value type {f.ftype}")
        rec += bitmap + vals
        offsets.append(base + len(body))
        body += struct.pack("<i", len(rec)) + rec

    hdr = bytearray(40)
    struct.pack_into("<ii", hdr, 0, GDB_MAGIC, len(rows))
    total = 40 + 4 + len(fsec) + len(body)
    struct.pack_into("<q", hdr, 24, total)
    struct.pack_into("<q", hdr, 32, 40)
    with open(path, "wb") as fh:
        fh.write(hdr)
        fh.write(struct.pack("<i", len(fsec)))
        fh.write(fsec)
        fh.write(body)

    # spec-shaped index: n_1024_blocks × 1024 slots, zero-padded tail
    n_blocks = (len(rows) + 1023) // 1024
    tablx = bytearray(struct.pack("<4i", GDB_MAGIC, n_blocks, len(rows), 5))
    for off in offsets:
        tablx += off.to_bytes(5, "little")
    tablx += b"\x00" * (5 * (n_blocks * 1024 - len(offsets)))
    with open(path[: -len(".gdbtable")] + ".gdbtablx", "wb") as fh:
        fh.write(tablx)


# --- table reader ----------------------------------------------------------


def parse_fields(content: bytes) -> tuple[list[Field], int, int]:
    """→ (fields, row-section offset, n_rows).

    All structural reads are bounds-checked (struct.error → ValueError
    via _unpack): a truncated header, a field section pointing past
    EOF, or a lying field count that walks the cursor out of the
    section all fail with a clear decode error instead of an
    IndexError/struct.error escaping a Spark task."""
    if len(content) < 40:
        raise ValueError(f"not a .gdbtable: truncated header ({len(content)} bytes)")
    magic, n_rows = _unpack("<ii", content, 0)
    if magic != GDB_MAGIC:
        raise ValueError(f"not a .gdbtable: bad magic {magic}")
    if n_rows < 0:
        raise ValueError(f"negative row count {n_rows}")
    (fsec_off,) = _unpack("<q", content, 32)
    if not 40 <= fsec_off <= len(content) - 4:
        raise ValueError(f"field section offset out of bounds: {fsec_off}")
    (fsec_size,) = _unpack("<i", content, fsec_off)
    if fsec_size < 0 or fsec_off + 4 + fsec_size > len(content):
        raise ValueError(f"field section size out of bounds: {fsec_size}")
    fsec_end = fsec_off + 4 + fsec_size
    pos = fsec_off + 4
    version, = _unpack("<i", content, pos)
    pos += 4
    pos += 4  # geom type + 3 flag bytes
    (n_fields,) = _unpack("<h", content, pos)
    pos += 2
    if n_fields < 0:
        raise ValueError(f"negative field count {n_fields}")
    fields: list[Field] = []
    for _ in range(n_fields):
        if pos > fsec_end:
            raise ValueError(
                "field descriptors run past the field section "
                f"(lying field count {n_fields}?)"
            )
        name, pos = _unpack_utf16(content, pos)
        _alias, pos = _unpack_utf16(content, pos)
        if pos >= len(content):
            raise ValueError("truncated field descriptor")
        ftype = content[pos]
        pos += 1
        if ftype == T_STRING:
            _maxlen, flags = _unpack("<iB", content, pos)
            pos += 5
            fields.append(Field(name, ftype, bool(flags & 1)))
        elif ftype in (T_INT32, T_FLOAT64):
            _w, flags = _unpack("<BB", content, pos)
            pos += 2
            fields.append(Field(name, ftype, bool(flags & 1)))
        elif ftype == T_OBJECTID:
            pos += 2
            fields.append(Field(name, ftype, False))
        elif ftype == T_GEOMETRY:
            (flags,) = _unpack("<B", content, pos + 1)
            pos += 2
            (srs_len,) = _unpack("<h", content, pos)
            if srs_len < 0:
                raise ValueError(f"negative srs length {srs_len}")
            pos += 2 + 2 * srs_len
            pos += 1  # z/m flags
            xo, yo, sc = _unpack("<3d", content, pos)
            pos += 24
            if not (sc > 0.0):  # also catches NaN
                raise ValueError(f"non-positive coordinate scale {sc!r}")
            fields.append(
                Field(name, ftype, bool(flags & 1), xo, yo, sc)
            )
        else:
            raise ValueError(f"unsupported field type {ftype} ({name})")
    return fields, fsec_off + 4 + fsec_size, n_rows


def parse_gdbtablx(buf: bytes) -> list[int]:
    """Decode a .gdbtablx row index → per-slot .gdbtable offsets
    (slot i holds OBJECTID i+1; offset 0 marks a nonexistent/deleted
    row). Layout per the public reverse-engineered spec: 16-byte
    header (int32 magic, int32 n_1024_blocks, int32 n_valid_rows,
    int32 offset width), then n_1024_blocks × 1024 offsets of `width`
    little-endian bytes (trailing slots of the last block are
    zero-padded). Legacy files from this repo's pre-round-4 writer
    stored n_1024_blocks = 0 with exactly n_valid_rows slots — both
    forms decode.

    SPARSE tables (r6): the full spec appends a trailer after the
    offset array — int32 n_bitmap_int32_words (0 ⇒ dense), int32
    n_total_1024_blocks, int32 n_present_1024_blocks, int32
    n_useful_bitmap_int32_words, then the block bitmap (bit j of byte
    j>>3, mask 1<<(j&7), set ⇒ block j's 1024 offsets are stored).
    Absent blocks expand to 1024 zero slots so OBJECTID = slot + 1
    still holds across the gaps. The header's block count covers only
    PRESENT blocks, and its row-count field counts rows rather than
    nonzero slots in Esri-authored sparse files, so the dense-form
    nonzero==valid cross-check applies only to the dense layouts;
    sparse files are instead validated by bitmap popcount against both
    stored block counts. Everything else out of spec still fails
    loudly."""
    if len(buf) < 16:
        raise ValueError("truncated .gdbtablx header")
    magic, n_blocks, n_valid, width = struct.unpack_from("<4i", buf, 0)
    if magic != GDB_MAGIC:
        raise ValueError(f"bad .gdbtablx magic {magic}")
    if width < 4 or width > 8:
        raise ValueError(f"bad .gdbtablx offset width {width}")
    if n_blocks < 0 or n_valid < 0:
        raise ValueError("negative .gdbtablx counts")
    n_slots = n_blocks * 1024 if n_blocks > 0 else n_valid
    arr_end = 16 + n_slots * width
    if arr_end > len(buf):
        raise ValueError(
            f".gdbtablx too small for {n_slots} slots of {width} bytes"
        )
    slots = [
        int.from_bytes(buf[16 + i * width : 16 + (i + 1) * width], "little")
        for i in range(n_slots)
    ]
    n_bitmap_words = 0
    if len(buf) >= arr_end + 16:
        n_bitmap_words, n_total, n_present, n_useful = struct.unpack_from(
            "<4i", buf, arr_end
        )
    if n_bitmap_words > 0:  # sparse layout
        if n_total < 0 or n_present < 0 or n_useful < 0:
            raise ValueError("negative .gdbtablx bitmap trailer counts")
        if arr_end + 16 + 4 * n_bitmap_words > len(buf):
            raise ValueError(".gdbtablx block bitmap truncated")
        if n_total > 32 * n_bitmap_words:
            raise ValueError(
                f".gdbtablx bitmap too small for {n_total} blocks"
            )
        if n_present != n_blocks:
            raise ValueError(
                f".gdbtablx trailer says {n_present} present blocks, "
                f"header stored {n_blocks}"
            )
        bitmap = buf[arr_end + 16 : arr_end + 16 + 4 * n_bitmap_words]
        present = [
            j for j in range(n_total) if bitmap[j >> 3] & (1 << (j & 7))
        ]
        if len(present) != n_present:
            raise ValueError(
                f".gdbtablx bitmap popcount {len(present)} disagrees "
                f"with its present-block count {n_present}"
            )
        expanded: list[int] = []
        next_stored = 0
        present_set = set(present)
        for j in range(n_total):
            if j in present_set:
                expanded.extend(
                    slots[next_stored * 1024 : (next_stored + 1) * 1024]
                )
                next_stored += 1
            else:
                expanded.extend([0] * 1024)
        return expanded
    if sum(1 for s in slots if s) != n_valid:
        raise ValueError(
            ".gdbtablx nonzero-slot count disagrees with its valid-row "
            "count"
        )
    return slots


def _gather_fixed(b: np.ndarray, idx: np.ndarray, w: int, dt: str):
    """Gather `w`-byte little-endian values at byte offsets `idx` from
    the uint8 view `b`. Indices are clamped to the buffer (callers mask
    out-of-bounds lanes separately) so a not-present row at EOF can't
    fault the gather."""
    g = b[np.minimum(idx[:, None] + np.arange(w), len(b) - 1)]
    return np.ascontiguousarray(g).view(dt).ravel()


def _decode_plan_vec(
    content,
    fields: list[Field],
    plan: list[tuple[int, int]],
    want: set[str] | None,
) -> pd.DataFrame | None:
    """Vectorized row decode over a (oid, offset) plan: one numpy
    gather pass per field instead of a Python dispatch per cell (the
    per-row attr walk was the remaining 45% of single-thread decode
    after the r8 geometry batch pass). Strictly CONSERVATIVE: any
    layout this path can't prove well-formed (negative/overflowing row
    size, field past row end, string length ≥ 128, geometry varuint
    length wider than 4 bytes) returns None and the caller re-runs the
    scalar walk, which raises the pinned ValueError contract — the
    fast path never produces output the scalar path would reject."""
    n = len(plan)
    if n == 0:
        return None
    b = np.frombuffer(content, np.uint8)
    total = len(b)
    oids = np.fromiter((o for o, _ in plan), np.int64, n)
    offs = np.fromiter((p for _, p in plan), np.int64, n)
    if (offs < 0).any() or int(offs.max()) + 4 > total:
        return None
    sizes = _gather_fixed(b, offs, 4, "<i4").astype(np.int64)
    ends = offs + 4 + sizes
    if (sizes < 0).any() or (ends > total).any():
        return None
    nullable = [f for f in fields if f.nullable]
    nbytes = (len(nullable) + 7) // 8
    cur = offs + 4
    if nbytes:
        if ((cur + nbytes) > ends).any():
            return None
        bitmap = b[
            np.minimum(cur[:, None] + np.arange(nbytes), total - 1)
        ]
    cur = cur + nbytes
    data: dict[str, object] = {}
    out_names = [f.name for f in fields if want is None or f.name in want]
    ni = 0
    for f in fields:
        keep = want is None or f.name in want
        if f.ftype == T_OBJECTID:
            if keep:
                data[f.name] = oids
            continue
        if f.nullable:
            isnull = ((bitmap[:, ni >> 3] >> (ni & 7)) & 1).astype(bool)
            ni += 1
        else:
            isnull = np.zeros(n, dtype=bool)
        present = ~isnull
        if f.ftype in (T_INT32, T_FLOAT64):
            w = 4 if f.ftype == T_INT32 else 8
            if (np.where(present, cur + w, cur) > ends).any():
                return None
            if keep:
                vals = _gather_fixed(
                    b, cur, w, "<i4" if w == 4 else "<f8"
                )
                if present.all():
                    data[f.name] = (
                        vals.astype(np.int64) if w == 4 else vals
                    )
                else:
                    # match the scalar walk's pandas inference for a
                    # NULL-bearing numeric column: float64 with NaN
                    # (r8 review: object[int, None] vs float64[x, nan]
                    # flipped dtypes depending on which path ran)
                    col = vals.astype(np.float64)
                    col[isnull] = np.nan
                    data[f.name] = col
            cur = np.where(present, cur + w, cur)
        elif f.ftype == T_STRING:
            if (np.where(present, cur + 1, cur) > ends).any():
                return None
            ln = b[np.minimum(cur, total - 1)].astype(np.int64)
            if (ln[present] >= 0x80).any():  # multi-byte length → scalar
                return None
            if (np.where(present, cur + 1 + ln, cur) > ends).any():
                return None
            if keep:
                col = np.full(n, None, dtype=object)
                starts = cur + 1
                for i in np.flatnonzero(present):
                    a = int(starts[i])
                    col[i] = content[a : a + int(ln[i])].decode(
                        "utf-8", errors="replace"
                    )
                data[f.name] = col
            cur = np.where(present, cur + 1 + ln, cur)
        elif f.ftype == T_GEOMETRY:
            # vectorized varuint blob length, up to 4 bytes (≤ 256 MB)
            ln = np.zeros(n, dtype=np.int64)
            width = np.zeros(n, dtype=np.int64)
            more = present.copy()
            for k in range(4):
                if not more.any():
                    break
                byte = b[np.minimum(cur + k, total - 1)].astype(np.int64)
                ln = np.where(more, ln | ((byte & 0x7F) << (7 * k)), ln)
                width = np.where(more, k + 1, width)
                cont = (byte & 0x80) != 0
                if k == 3 and (more & cont).any():
                    return None  # >4-byte length → scalar
                more = more & cont
            blob_start = cur + width
            if (np.where(present, blob_start + ln, cur) > ends).any():
                return None
            if keep:
                col = np.full(n, None, dtype=object)
                idxs = np.flatnonzero(present)
                spans = [
                    (int(blob_start[i]), int(ln[i])) for i in idxs
                ]
                decoded = _decode_geometries_batch(content, spans, f)
                for i, wkb in zip(idxs, decoded):
                    col[i] = wkb
                data[f.name] = col
            cur = np.where(present, blob_start + ln, cur)
        else:  # pragma: no cover - parse_fields rejects unknown types
            return None
    return pd.DataFrame(data, columns=out_names)


def parse_gdbtable(
    content: bytes,
    columns: list[str] | None = None,
    tablx: bytes | None = None,
    plan: list[tuple[int, int]] | None = None,
) -> pd.DataFrame:
    """Decode .gdbtable bytes → DataFrame (geometry as OGC WKB).

    `columns` projects INSIDE the decoder: unrequested fields are
    skipped, and skipping a geometry field costs one varuint read
    (the blob is length-prefixed), so attrs-only scans never decode
    coordinates.

    Row discovery, per the public spec: with a `.gdbtablx` index the
    slots drive the scan — OBJECTID = slot + 1, offset 0 = hole (a
    deleted row), so OID sequences with gaps decode exactly as Esri
    wrote them. Without the index the row section is walked
    sequentially; a NEGATIVE size marks a deleted row's hole of
    |size| bytes, which is skipped and consumes one OID."""
    fields, pos, n_rows = parse_fields(content)
    want = None if columns is None else set(columns)
    out_fields = [
        f for f in fields if want is None or f.name in want
    ]
    data: dict[str, list] = {f.name: [] for f in out_fields}
    geom_pending: dict[str, tuple[Field, list[tuple[int, int, int]]]] = {}
    nullable = [f for f in fields if f.nullable]
    oid_field = next((f for f in fields if f.ftype == T_OBJECTID), None)

    if plan is not None:
        pass  # explicit row slice (chunked scan) — caller-validated
    elif tablx is not None:
        plan = [
            (slot + 1, off)
            for slot, off in enumerate(parse_gdbtablx(tablx))
            if off
        ]
        if len(plan) != n_rows:
            raise ValueError(
                f".gdbtablx holds {len(plan)} rows but the table header "
                f"counts {n_rows}"
            )

    if plan is not None:
        fast = _decode_plan_vec(content, fields, plan, want)
        if fast is not None:
            return fast
        # conservative fallback: the scalar walk below re-decodes and
        # raises the pinned per-row ValueError contract on corruption

    def decode_row(oid: int, pos: int) -> int:
        """Decode one row record whose int32 size prefix sits at `pos`;
        returns the record's end offset."""
        (size,) = _unpack("<i", content, pos)
        pos += 4
        if size < 0 or pos + size > len(content):
            raise ValueError(
                f"row oid={oid}: size {size} runs past EOF "
                f"(offset {pos}, file {len(content)} bytes)"
            )
        end = pos + size
        nbytes = (len(nullable) + 7) // 8
        if pos + nbytes > end:
            raise ValueError(
                f"row oid={oid}: null bitmap ({nbytes} B) exceeds row size"
            )
        bitmap = content[pos : pos + nbytes]
        p = pos + nbytes
        ni = 0
        rowno = oid - 1
        if oid_field is not None and (want is None or oid_field.name in want):
            data[oid_field.name].append(oid)
        for f in fields:
            if f.ftype == T_OBJECTID:
                continue
            is_null = False
            if f.nullable:
                is_null = bool(bitmap[ni // 8] & (1 << (ni % 8)))
                ni += 1
            keep = want is None or f.name in want
            if is_null:
                if keep:
                    data[f.name].append(None)
                continue
            if f.ftype == T_INT32:
                if p + 4 > end:
                    raise ValueError(
                        f"row {rowno}: field {f.name} runs past row end"
                    )
                if keep:
                    data[f.name].append(
                        struct.unpack_from("<i", content, p)[0]
                    )
                p += 4
            elif f.ftype == T_FLOAT64:
                if p + 8 > end:
                    raise ValueError(
                        f"row {rowno}: field {f.name} runs past row end"
                    )
                if keep:
                    data[f.name].append(
                        struct.unpack_from("<d", content, p)[0]
                    )
                p += 8
            elif f.ftype == T_STRING:
                ln, p = _read_varuint(content, p)
                if p + ln > end:
                    raise ValueError(
                        f"row {rowno}: string {f.name} length {ln} "
                        "runs past row end"
                    )
                if keep:
                    data[f.name].append(
                        content[p : p + ln].decode("utf-8", errors="replace")
                    )
                p += ln
            elif f.ftype == T_GEOMETRY:
                ln, p = _read_varuint(content, p)
                if p + ln > end:
                    raise ValueError(
                        f"row {rowno}: geometry {f.name} length {ln} "
                        "runs past row end"
                    )
                if keep:
                    # deferred: batch-decoded after the row walk (one
                    # vectorized varint pass over every blob)
                    data[f.name].append(None)
                    geom_pending.setdefault(f.name, (f, []))[1].append(
                        (len(data[f.name]) - 1, p, ln)
                    )
                p += ln
        return end

    if plan is not None:
        for oid, off in plan:
            decode_row(oid, off)
    else:
        oid, found = 1, 0
        while found < n_rows:
            (size,) = _unpack("<i", content, pos)
            if size < 0:
                # deleted-row hole: |size| dead bytes, one consumed OID
                hole_end = pos + 4 - size
                if hole_end > len(content):
                    raise ValueError(
                        f"deleted-row hole at offset {pos} runs past EOF"
                    )
                pos = hole_end
                oid += 1
                continue
            pos = decode_row(oid, pos)
            oid += 1
            found += 1
    for name, (gf, entries) in geom_pending.items():
        col = data[name]
        decoded = _decode_geometries_batch(
            content, [(s, ln) for _, s, ln in entries], gf
        )
        for (idx, _, _), wkb in zip(entries, decoded):
            col[idx] = wkb
    return pd.DataFrame(data, columns=[f.name for f in out_fields])


def largest_layer(gdb_dir: str) -> str:
    """The reference's member selection (`ls -S … head -n1`,
    ORNL-FEMA-Buildings.md:76-78): largest .gdbtable by file size —
    driver-side metadata-only logic."""
    cands = [
        os.path.join(gdb_dir, f)
        for f in os.listdir(gdb_dir)
        if f.endswith(".gdbtable")
    ]
    if not cands:
        raise FileNotFoundError(f"no .gdbtable members in {gdb_dir}")
    return max(cands, key=os.path.getsize)


def _spark_type(f: Field) -> str:
    return {
        T_INT32: "int",
        T_FLOAT64: "double",
        T_STRING: "string",
        T_OBJECTID: "long",
        T_GEOMETRY: "binary",
    }[f.ftype]


def read_filegdb(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    on_error: str = "fail",
    chunk_rows: int = 8_192,
) -> DataFrame:
    """Distributed FileGDB layer scan: binaryFile source →
    mapInPandas decoder (ST_READ rendition, ORNL-FEMA-Buildings.md:81).
    `path` is a .gdbtable file or a .gdb directory (largest member
    picked like the reference). Schema comes from the field
    descriptors, read once driver-side; `columns` pushes projection
    into the decoder.

    Every decode failure mode is a ValueError (fuzz-tested: truncated
    varuints, lying row sizes/field counts/blob lengths, memory-bomb
    point counts). on_error="fail" propagates it; on_error="skip" drops
    the corrupt member's rows and keeps the scan alive — audit the
    skipped members with filegdb_failures() over the same path, the
    per-file failure-record discipline shared with crs_quarantine.

    Intra-file parallelism (r8, VERDICT item 2 follow-on): a single
    .gdbtable is one giant member — a whole-file scan is ONE task no
    matter the cluster, i.e. a 100 GB layer decodes serially. When the
    .gdbtablx row index exists, the (OBJECTID, offset) plan is instead
    split into `chunk_rows`-row slices, one task each; every task
    opens and mmaps `path` itself and decodes only its slice.
    LOCALITY CONTRACT: tasks open() the path directly, so it must be
    visible on every executor (local mode, NFS/shared FS) — on a
    driver-only path use chunk_rows=0, which restores the binaryFile
    route that ships bytes through Spark. An object-store rendition
    would swap the mmap for ranged GETs of the index slice and row
    span; that transport is a documented design, not implemented
    here. on_error="skip"'s contract is whole-MEMBER drop — not
    expressible once a member spans tasks — so skip mode keeps the
    single-task path (validation IS decoding there)."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error: {on_error!r}")
    if os.path.isdir(path):
        path = largest_layer(path)
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)
    fields, _, n_rows = parse_fields(head)
    out_fields = [f for f in fields if columns is None or f.name in columns]
    schema = ", ".join(
        f"`{f.name}` {_spark_type(f)}" for f in out_fields
    ) + ", source string"
    skip = on_error == "skip"

    tablx = _sibling_tablx(path) if not skip and chunk_rows else None
    if tablx is not None:
        slots = parse_gdbtablx(tablx)
        if sum(1 for off in slots if off) != n_rows:
            raise ValueError(
                f".gdbtablx holds {sum(1 for o in slots if o)} rows but "
                f"the table header counts {n_rows}"
            )
        dense = _tablx_dense_width(tablx)
        local_path = path
        # emit the same URI form the binaryFile path records, so
        # `source` is stable across chunked/single-task modes (r8
        # review: provenance joins must not depend on chunk_rows)
        source_uri = path if "://" in path else "file:" + os.path.abspath(path)
        tablx_path = path[: -len(".gdbtable")] + ".gdbtablx"
        if dense is not None:
            # dense layout: slot i's offset lives at byte 16 + i*width,
            # so a task materializes ONLY its slice with one ranged
            # read of the index — nothing row-scale crosses the driver
            width = dense
            # chunk over LIVE slots so a deletion-riddled table doesn't
            # spawn empty tasks; each range still covers a contiguous
            # slot interval for the task's one ranged index read
            nz = [i for i, off in enumerate(slots) if off]
            ranges = [
                (nz[k], nz[min(k + chunk_rows, len(nz)) - 1] + 1)
                for k in range(0, len(nz), chunk_rows)
            ] or [(0, 0)]
            cdf = spark.createDataFrame(
                ranges, "lo long, hi long"
            ).repartition(len(ranges))

            def decode_ranges(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                import mmap as _mmap  # noqa: PLC0415

                mm, fh = None, None
                try:
                    for pdf in batches:
                        for lo, hi in zip(pdf["lo"], pdf["hi"]):
                            lo, hi = int(lo), int(hi)
                            if hi <= lo:
                                continue
                            if mm is None:
                                fh = open(local_path, "rb")  # noqa: SIM115
                                mm = _mmap.mmap(
                                    fh.fileno(), 0, access=_mmap.ACCESS_READ
                                )
                            with open(tablx_path, "rb") as xf:
                                xf.seek(16 + lo * width)
                                raw = xf.read((hi - lo) * width)
                            plan = [
                                (lo + i + 1, off)
                                for i, off in enumerate(
                                    int.from_bytes(
                                        raw[i * width : (i + 1) * width],
                                        "little",
                                    )
                                    for i in range(hi - lo)
                                )
                                if off
                            ]
                            if not plan:
                                continue
                            out = parse_gdbtable(mm, columns, plan=plan)
                            out["source"] = source_uri
                            yield out
                finally:
                    if mm is not None:
                        mm.close()
                    if fh is not None:
                        fh.close()

            return cdf.mapInPandas(decode_ranges, schema=schema)

        # sparse layout: absent blocks aren't stored, so slot→byte is
        # not linear — ship each chunk's (oid, offset) plan instead
        plan = [(s + 1, off) for s, off in enumerate(slots) if off]
        chunks = [
            (
                i // chunk_rows,
                [oid for oid, _ in plan[i : i + chunk_rows]],
                [off for _, off in plan[i : i + chunk_rows]],
            )
            for i in range(0, len(plan), chunk_rows)
        ] or [(0, [], [])]
        cdf = spark.createDataFrame(
            chunks, "chunk_id int, oids array<long>, offs array<long>"
        ).repartition(len(chunks))

        def decode_chunks(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import mmap as _mmap  # noqa: PLC0415

            mm, fh = None, None
            try:
                for pdf in batches:
                    for oids, offs in zip(pdf["oids"], pdf["offs"]):
                        if len(oids) == 0:
                            continue
                        if mm is None:
                            fh = open(local_path, "rb")  # noqa: SIM115
                            mm = _mmap.mmap(
                                fh.fileno(), 0, access=_mmap.ACCESS_READ
                            )
                        out = parse_gdbtable(
                            mm,
                            columns,
                            plan=list(zip((int(o) for o in oids),
                                          (int(f) for f in offs))),
                        )
                        out["source"] = source_uri
                        yield out
            finally:
                if mm is not None:
                    mm.close()
                if fh is not None:
                    fh.close()

        return cdf.mapInPandas(decode_chunks, schema=schema)

    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    out = parse_gdbtable(
                        bytes(content), columns, tablx=_sibling_tablx(fpath)
                    )
                except ValueError:
                    if skip:
                        continue
                    raise
                out["source"] = fpath
                yield out

    return files.mapInPandas(decode, schema=schema)


def _tablx_dense_width(buf: bytes) -> int | None:
    """Offset width of a DENSE .gdbtablx (slot i at byte 16 + i*width),
    or None when the file carries a sparse block-bitmap trailer (slot
    positions are then not linear in the byte stream)."""
    magic, n_blocks, n_valid, width = struct.unpack_from("<4i", buf, 0)
    n_slots = n_blocks * 1024 if n_blocks > 0 else n_valid
    arr_end = 16 + n_slots * width
    if len(buf) >= arr_end + 16:
        (n_bitmap_words,) = struct.unpack_from("<i", buf, arr_end)
        if n_bitmap_words > 0:
            return None
    return width


def _sibling_tablx(gdbtable_path: str) -> bytes | None:
    """Bytes of the row index beside a .gdbtable (binaryFile hands the
    path URI-form); None when absent — the sequential walk then covers
    hole-free files, which is what a missing index implies."""
    from urllib.parse import unquote, urlparse

    p = gdbtable_path
    # Spark's binaryFile source emits single-slash URIs ("file:/tmp/x")
    # — urlparse handles both that and the ://-form
    if "://" in p or p.startswith("file:"):
        p = unquote(urlparse(p).path)
    p = p[: -len(".gdbtable")] + ".gdbtablx"
    try:
        with open(p, "rb") as fh:
            return fh.read()
    except OSError:
        return None


def filegdb_failures(spark: SparkSession, path: str) -> DataFrame:
    """Per-file failure records for a FileGDB scan: every .gdbtable
    member under `path` that fails to decode yields (source, error).
    Runs the full decoder (validation IS decoding for a binary format);
    healthy members produce no rows. Pair with
    read_filegdb(on_error='skip') so one corrupt member costs its own
    rows, never the job."""
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".gdbtable")
        )
        if not paths:
            raise FileNotFoundError(f"no .gdbtable members in {path}")
    else:
        paths = [path]

    files = (
        spark.read.format("binaryFile")
        .load(paths)
        .select("path", "content")
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    parse_gdbtable(
                        bytes(content), tablx=_sibling_tablx(fpath)
                    )
                except ValueError as e:
                    yield pd.DataFrame(
                        {"source": [fpath], "error": [str(e)]}
                    )

    return files.mapInPandas(probe, schema="source string, error string")
