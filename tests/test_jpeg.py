"""Golden + hostile-input tests for the baseline JPEG decoder
(gis_etl_spark/ops/jpeg.py, ITU-T T.81 baseline profile).

The positive control is fixtures._encode_jpeg — the FORWARD direction
of the public spec (float FDCT, quantization, canonical Huffman,
restart markers) written independently of the decoder — paired with
fixtures._jpeg_reconstruct, a loop-based implementation of the
integer-exact reconstruction spec (fixed-point IDCT, replication
upsample, BT.601 fixed point) that the decoder's vectorized numpy must
reproduce byte-for-byte. JPEG is lossy, so "golden" means the
reconstruction array, not the pre-encode pixels.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gis_etl_spark.fixtures import (
    _encode_jpeg,
    _jpeg_huff_codes,
    _jpeg_zigzag_positions,
)
from gis_etl_spark.ops.jpeg import (
    IDCT_K,
    ZIGZAG,
    decode_jpeg,
    idct_blocks_int,
    jpeg_header,
)


def test_zigzag_tables_agree():
    """The decoder's hardcoded zigzag (T.81 figure 5) equals the
    fixture's diagonal-walk derivation."""
    pos = _jpeg_zigzag_positions()
    assert [r * 8 + c for r, c in pos] == list(ZIGZAG)


def test_idct_dc_only_block():
    """A DC-only dequantized block must decode to the flat value
    round(dc/8) + 128 per the 2D DCT normalization — pinned by hand:
    dc=400 → 400/8 = 50 → 178 everywhere."""
    blk = np.zeros((1, 8, 8), dtype=np.int64)
    blk[0, 0, 0] = 400
    out = idct_blocks_int(blk)
    assert (out == 178).all()
    # and the zero block is exactly mid-gray
    assert (idct_blocks_int(np.zeros((1, 8, 8), dtype=np.int64)) == 128).all()


def test_idct_matches_loop_reference():
    """Vectorized einsum IDCT == the loop-written fixed-point spec on
    random coefficient blocks (bit-exact, any accumulation order)."""
    import math

    K = [
        [
            round(
                (1 / math.sqrt(2) if u == 0 else 1.0)
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * (1 << 18)
            )
            for x in range(8)
        ]
        for u in range(8)
    ]
    assert (np.array(K) == IDCT_K).all()
    rng = np.random.default_rng(3)
    blocks = rng.integers(-2000, 2000, size=(5, 8, 8)).astype(np.int64)
    got = idct_blocks_int(blocks)
    for n in range(5):
        for x in range(8):
            for y in range(8):
                tmp = [
                    sum(int(blocks[n, u, v]) * K[v][y] for v in range(8))
                    for u in range(8)
                ]
                raw = sum(K[u][x] * tmp[u] for u in range(8))
                val = ((raw + (1 << 37)) >> 38) + 128
                assert got[n, x, y] == min(255, max(0, val))


@pytest.mark.parametrize("mode", ["gray", "444", "422", "420"])
@pytest.mark.parametrize("restart", [0, 3])
def test_roundtrip_matches_reconstruction_golden(mode, restart):
    """decode_jpeg == the loop reconstruction byte-for-byte, across all
    sampling modes, restart intervals, and non-multiple-of-MCU dims."""
    rng = np.random.default_rng(hash((mode, restart)) % (2**31))
    for h, w in [(8, 8), (17, 23), (32, 48), (41, 19)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        buf, recon = _encode_jpeg(px, mode, restart)
        got = decode_jpeg(buf)
        assert got.shape == (h, w, 3)
        assert (got == recon).all(), (mode, restart, h, w)
        assert jpeg_header(buf) == (w, h)


def test_smooth_image_decodes_near_exact():
    """Lossy, but a uniform image survives quantization exactly and a
    smooth gradient stays within a few levels — catches gross scaling
    errors a parity test against the same spec could mask."""
    flat = np.full((24, 24, 3), 200, dtype=np.uint8)
    buf, _ = _encode_jpeg(flat, "444")
    assert (decode_jpeg(buf) == 200).all()
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[:] = np.linspace(40, 90, 16, dtype=np.uint8)[None, :, None]
    buf, _ = _encode_jpeg(grad, "gray")
    got = decode_jpeg(buf).astype(np.int32)
    lum = (grad.astype(np.int32) * [299, 587, 114]).sum(axis=2) // 1000
    assert np.abs(got[:, :, 0] - lum).max() <= 4


def test_grayscale_replicates_luma():
    px = np.random.default_rng(9).integers(
        0, 256, size=(16, 16, 3), dtype=np.uint8
    )
    buf, _ = _encode_jpeg(px, "gray")
    got = decode_jpeg(buf)
    assert (got[:, :, 0] == got[:, :, 1]).all()
    assert (got[:, :, 1] == got[:, :, 2]).all()


def _valid_jpeg() -> bytes:
    px = np.random.default_rng(1).integers(
        0, 256, size=(16, 16, 3), dtype=np.uint8
    )
    return _encode_jpeg(px, "420", 2)[0]


def test_rejects_hostile_inputs():
    buf = _valid_jpeg()
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG" + buf[4:])  # wrong magic
    with pytest.raises(ValueError):
        decode_jpeg(buf[:20])  # truncated before SOS
    with pytest.raises(ValueError):
        decode_jpeg(buf[:-20])  # truncated scan
    # progressive SOF2 → explicit non-baseline rejection
    prog = bytearray(buf)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_header(bytes(prog))
    # 12-bit precision
    deep = bytearray(buf)
    deep[sof + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(deep))
    # corrupt a scan byte → invalid Huffman code / truncation, never
    # silent garbage or a non-ValueError crash
    body = bytearray(buf)
    sos = body.find(b"\xff\xda")
    for off in range(sos + 20, sos + 26):
        hostile = bytearray(buf)
        hostile[off] = 0xFF  # marker byte inside entropy data
        with pytest.raises(ValueError):
            decode_jpeg(bytes(hostile))


def test_missing_tables_fail_loudly():
    """Strip the DHT segment: the scan then references missing Huffman
    tables and must raise, not decode garbage."""
    buf = _valid_jpeg()
    dht = buf.find(b"\xff\xc4")
    seglen = struct.unpack_from(">H", buf, dht + 2)[0]
    stripped = buf[:dht] + buf[dht + 2 + seglen :]
    with pytest.raises(ValueError):
        decode_jpeg(stripped)


def test_huffman_tables_are_spec_valid():
    """Fixture-side canonical tables: prefix-free, no all-ones code
    (T.81 convention), and cover every emittable symbol."""
    from gis_etl_spark.fixtures import (
        _JH_AC_BITS,
        _JH_AC_VALS,
        _JH_DC_BITS,
        _JH_DC_VALS,
    )

    for bits, vals in [(_JH_DC_BITS, _JH_DC_VALS), (_JH_AC_BITS, _JH_AC_VALS)]:
        codes = _jpeg_huff_codes(bits, vals)
        assert len(codes) == len(vals)
        # prefix-free: no code is a prefix of another
        as_strs = [format(c, f"0{ln}b") for c, ln in codes.values()]
        for i, a in enumerate(as_strs):
            for j, b in enumerate(as_strs):
                if i != j:
                    assert not b.startswith(a)
        assert all(c != (1 << ln) - 1 for c, ln in codes.values())
    dc = _jpeg_huff_codes(_JH_DC_BITS, _JH_DC_VALS)
    assert set(dc) == set(range(12))
    ac = _jpeg_huff_codes(_JH_AC_BITS, _JH_AC_VALS)
    assert {0x00, 0xF0} <= set(ac)
    assert all(((r << 4) | s) in ac for r in range(16) for s in range(1, 11))


def test_error_contract_is_valueerror_only():
    """ADVICE r6: decode pipelines catch ValueError only, so EVERY
    structurally-damaged payload must raise ValueError — never
    struct.error / IndexError / KeyError / ZeroDivisionError. Probe
    exhaustively: truncate at every byte offset, and flip every header
    byte (SOI..SOS) to hostile values."""
    buf = _valid_jpeg()
    sos = buf.find(b"\xff\xda")
    for cut in range(len(buf)):
        try:
            decode_jpeg(buf[:cut])
        except ValueError:
            pass
        try:
            jpeg_header(buf[:cut])
        except ValueError:
            pass
    for off in range(2, sos + 14):
        for val in (0x00, 0x01, 0x7F, 0xC4, 0xDA, 0xFF):
            if buf[off] == val:
                continue
            hostile = bytearray(buf)
            hostile[off] = val
            try:
                decode_jpeg(bytes(hostile))
            except ValueError:
                pass
            try:
                jpeg_header(bytes(hostile))
            except ValueError:
                pass
