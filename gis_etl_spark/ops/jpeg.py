"""Baseline JPEG decoder (ITU-T T.81, public spec), pure numpy/struct
— the last real image format a web-scale corpus hits weekly that the
engine lacked (BMP/PNG/WAV already decode content-exactly; real video
codecs remain the documented deviation).

Scope: baseline sequential DCT, 8-bit, Huffman entropy coding — the
profile every camera/browser emits: SOI / APPn-COM skipped / DQT /
SOF0 / DHT / optional DRI with RSTn resets / SOS / entropy-coded scan
/ EOI. 1-component (grayscale) and 3-component YCbCr scans at 4:4:4,
4:2:2 and 4:2:0 sampling. Progressive (SOF2), arithmetic coding, and
12-bit precision raise ValueError — fail-loudly, like every other
decoder here (a 100 TB corpus turns that into valid=False rows).

Determinism contract (what makes the fixture golden bit-exact): JPEG
is lossy, so the fixture cannot compare against pre-encode pixels the
way PNG does. Instead, everything after the entropy decode is pinned
to an INTEGER-EXACT reconstruction spec, implemented independently by
the fixture's loop-based reference (fixtures._jpeg_reconstruct_blocks)
and by this module's vectorized numpy:

- dequantization: quantized coefficient x quant-table entry — integer;
- inverse DCT: fixed-point with IDCT_K[u][x] =
  round(C(u) * cos((2x+1) * u * pi / 16) * 2^18) (C(0) = 1/sqrt(2));
  two integer matrix passes accumulate in int64, final rounding
  (raw + 2^37) >> 38 folds the 1/4 normalization (2^36 scale * 4);
  then +128 level shift, clip to 0..255;
- chroma upsampling: sample replication (nearest);
- YCbCr -> RGB: 16-bit fixed point,
  R = Y + (91881  * (Cr - 128) + 32768 >> 16)
  G = Y - (22554 * (Cb - 128) + 46802 * (Cr - 128) + 32768 >> 16)
  B = Y + (116130 * (Cb - 128) + 32768 >> 16), clip 0..255
  (the usual BT.601 factors scaled by 2^16; >> is arithmetic/floor).

Every step is integer, so vectorization order cannot change a single
output byte — the same trick the aHash cross-multiplication and the
fixedpoint aggregates use to keep cross-implementation parity exact.
"""

from __future__ import annotations

import struct

import numpy as np

# fixed-point IDCT basis: round(C(u) cos((2x+1)u*pi/16) * 2^18)
IDCT_K = np.array(
    [
        [185364, 185364, 185364, 185364, 185364, 185364, 185364, 185364],
        [257107, 217965, 145639, 51142, -51142, -145639, -217965, -257107],
        [242189, 100318, -100318, -242189, -242189, -100318, 100318, 242189],
        [217965, -51142, -257107, -145639, 145639, 257107, 51142, -217965],
        [185364, -185364, -185364, 185364, 185364, -185364, -185364, 185364],
        [145639, -257107, 51142, 217965, -217965, -51142, 257107, -145639],
        [100318, -242189, 242189, -100318, -100318, 242189, -242189, 100318],
        [51142, -145639, 217965, -257107, 257107, -217965, 145639, -51142],
    ],
    dtype=np.int64,
)

# zigzag scan order (T.81 figure 5): ZIGZAG[k] = (row, col) of the
# k-th transmitted coefficient, flattened to row*8+col
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def idct_blocks_int(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) int dequantized coefficient blocks -> (n, 8, 8) uint8
    samples via the fixed-point spec above. All-integer einsum passes,
    so the result is bit-identical to the fixture's loop reference."""
    c = coef.astype(np.int64)
    # tmp[n, u, y] = sum_v S[n, u, v] * K[v, y]
    tmp = np.einsum("nuv,vy->nuy", c, IDCT_K)
    # raw[n, x, y] = sum_u K[u, x] * tmp[n, u, y]
    raw = np.einsum("ux,nuy->nxy", IDCT_K, tmp)
    out = ((raw + (1 << 37)) >> 38) + 128
    return np.clip(out, 0, 255).astype(np.uint8)


def ycbcr_to_rgb_int(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """Integer-exact BT.601 upconvert per the module spec; inputs are
    equally-sized uint8 planes, output (h, w, 3) uint8."""
    yl = y.astype(np.int64)
    cbl = cb.astype(np.int64) - 128
    crl = cr.astype(np.int64) - 128
    r = yl + ((91881 * crl + 32768) >> 16)
    g = yl - ((22554 * cbl + 46802 * crl + 32768) >> 16)
    b = yl + ((116130 * cbl + 32768) >> 16)
    return np.clip(
        np.stack([r, g, b], axis=-1), 0, 255
    ).astype(np.uint8)


class _HuffTable:
    """Canonical Huffman table from a DHT (bits[1..16], values) — the
    T.81 annex-C code construction: codes of each length assigned in
    value order, lengths ascending. Decode via a (length -> {code:
    value}) dict walk, reading one bit at a time (bounded at 16)."""

    __slots__ = ("lut",)

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte unstuffing; surfaces RSTn markers to the MCU loop."""

    __slots__ = ("buf", "pos", "bits", "nbits")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise ValueError("JPEG scan truncated")
        v = b[self.pos]
        self.pos += 1
        if v == 0xFF:
            if self.pos >= len(b):
                raise ValueError("JPEG scan truncated at 0xFF")
            m = b[self.pos]
            if m == 0x00:
                self.pos += 1
            elif 0xD0 <= m <= 0xD7:
                raise ValueError("unexpected RST inside symbol")
            else:
                # marker (EOI etc.) reached while more bits were
                # demanded -> corrupt stream
                raise ValueError(f"marker 0x{m:02x} inside scan data")
        self.bits = (self.bits << 8) | v
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        lut = table.lut
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def align_and_expect_rst(self, idx: int) -> None:
        """Byte-align and consume the next RSTn marker (DRI mode)."""
        self.nbits = 0
        b = self.buf
        if (
            self.pos + 1 >= len(b)
            or b[self.pos] != 0xFF
            or b[self.pos + 1] != 0xD0 + (idx & 7)
        ):
            raise ValueError("missing/mismatched RST marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (grayscale replicates the
    luma plane). Raises ValueError outside the baseline subset or on
    structural damage."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    h = w = 0
    restart_interval = 0
    pos = 2
    while True:
        if pos + 4 > len(buf):
            raise ValueError("JPEG truncated before SOS")
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD8:
            raise ValueError("nested SOI")
        seglen = struct.unpack_from(">H", buf, pos + 2)[0]
        if seglen < 2:
            raise ValueError("bad JPEG segment length")
        body = buf[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("DQT table truncated")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body, np.uint8, 64, i + 1
                ).astype(np.int64)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("DHT header truncated")
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("DHT values truncated")
                huff[(tc, th)] = _HuffTable(
                    bits, body[i + 17 : i + 17 + n]
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("SOF0 header truncated")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if len(body) < 6 + 3 * nc:
                raise ValueError("SOF0 component table truncated")
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                if not (1 <= hv >> 4 <= 4 and 1 <= hv & 0xF <= 4):
                    raise ValueError("bad SOF sampling factors")
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("DRI segment truncated")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    if not comps or h == 0 or w == 0:
        raise ValueError("missing SOF before SOS")

    # SOS body: component -> (dc table, ac table)
    if not body:
        raise ValueError("SOS header truncated")
    ns = body[0]
    if ns != len(comps):
        raise ValueError("SOS component count mismatch")
    if len(body) < 1 + 2 * ns:
        raise ValueError("SOS component selectors truncated")
    sel: dict[int, tuple[int, int]] = {}
    for c in range(ns):
        cs, tt = body[1 + 2 * c], body[2 + 2 * c]
        sel[cs] = (tt >> 4, tt & 0xF)
    if any(cid not in sel for cid, _, _, _ in comps):
        raise ValueError("SOS/SOF component id mismatch")
    scan_start = pos + 2 + seglen

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # collect every block's coefficients first (Python Huffman walk),
    # then dequant + IDCT all blocks per component in ONE vectorized
    # integer pass
    blocks: dict[int, list] = {ci: [] for ci in range(len(comps))}
    reader = _BitReader(buf, scan_start)
    pred = [0] * len(comps)
    rst_idx = 0
    n_mcu = 0
    for _ in range(mcuy):
        for _ in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.align_and_expect_rst(rst_idx)
                rst_idx += 1
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                dct, act = sel[cid]
                dc_tab = huff.get((0, dct))
                ac_tab = huff.get((1, act))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("scan references missing DHT")
                for _b in range(hs * vs):
                    zz = [0] * 64
                    t = reader.decode(dc_tab)
                    diff = _extend(reader.receive(t), t)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode(ac_tab)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
                    blocks[ci].append(zz)
            n_mcu += 1

    # vectorized integer dequant + IDCT per component
    planes: list[np.ndarray] = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("SOF references missing DQT")
        zzs = np.array(blocks[ci], dtype=np.int64)  # (n, 64) zigzag
        coef = np.zeros((len(zzs), 64), dtype=np.int64)
        coef[:, ZIGZAG] = zzs
        px = idct_blocks_int(
            (coef * qt[tq].reshape(1, 64)).reshape(-1, 8, 8)
        )
        # blocks arrive MCU-major, vs*hs per MCU, row-major inside
        bw, bh = mcux * hs, mcuy * vs  # blocks per row / column
        plane = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(vs):
                    for bx in range(hs):
                        plane[
                            (my * vs + by) * 8 : (my * vs + by) * 8 + 8,
                            (mx * hs + bx) * 8 : (mx * hs + bx) * 8 + 8,
                        ] = px[i]
                        i += 1
        # upsample by replication to the full MCU grid, crop to (h, w)
        plane = plane.repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = planes[0]
        return np.stack([y, y, y], axis=-1)
    return ycbcr_to_rgb_int(planes[0], planes[1], planes[2])


def jpeg_header(buf: bytes) -> tuple[int, int]:
    """Header-only (width, height): marker walk to SOF0, no entropy
    decode — the cheap metadata path."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        seglen = struct.unpack_from(">H", buf, pos + 2)[0]
        if seglen < 2:
            raise ValueError("bad JPEG segment length")
        if marker == 0xC0:
            if pos + 10 > len(buf):
                raise ValueError("SOF0 header truncated")
            _, h, w, _ = struct.unpack_from(">BHHB", buf, pos + 4)
            if h == 0 or w == 0:
                raise ValueError("bad JPEG dimensions")
            return w, h
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})"
            )
        if marker == 0xDA:
            break
        pos += 2 + seglen
    raise ValueError("no SOF0 before SOS")
