"""Golden + hostile-input tests for the pure-numpy media decoders and
the multimodal fixture contract (SURVEY.md §2.11).

The byte-literal goldens below are hand-assembled from the PUBLIC
format layouts (BMP file/info headers; RIFF/WAVE chunk structure) —
independent of both the fixture's encoder and the decoder under test.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from gis_etl_spark.fixtures import (
    _encode_bmp,
    _encode_png,
    _encode_wav,
    ensure_media,
)
from gis_etl_spark.ops.multimodal import (
    _parse_header,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
)

# 2×2 24-bit BMP, hand-assembled: bottom row = red, white; top row =
# blue, green; rows padded to 4 bytes, BGR, bottom-up.
BMP_2X2 = bytes(
    [
        0x42, 0x4D, 0x46, 0, 0, 0, 0, 0, 0, 0, 0x36, 0, 0, 0,   # BM header
        0x28, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 0x18, 0,   # info: 2×2
        0, 0, 0, 0, 0x10, 0, 0, 0, 0x13, 0x0B, 0, 0, 0x13, 0x0B,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0x00, 0x00, 0xFF, 0xFF, 0xFF, 0xFF, 0x00, 0x00,  # red, white, pad
        0xFF, 0x00, 0x00, 0x00, 0xFF, 0x00, 0x00, 0x00,  # blue, green, pad
    ]
)


def test_bmp_golden_bytes():
    px = decode_bmp(BMP_2X2)
    expected = np.array(
        [
            [[0, 0, 255], [0, 255, 0]],        # top row: blue, green
            [[255, 0, 0], [255, 255, 255]],    # bottom row: red, white
        ],
        dtype=np.uint8,
    )
    assert px.shape == (2, 2, 3)
    assert (px == expected).all()


def test_bmp_top_down_negative_height():
    # same pixels stored top-down: negative height, rows NOT flipped
    buf = bytearray(BMP_2X2)
    struct.pack_into("<i", buf, 22, -2)
    px = decode_bmp(bytes(buf))
    expected = np.array(
        [
            [[255, 0, 0], [255, 255, 255]],    # first stored row on top
            [[0, 0, 255], [0, 255, 0]],
        ],
        dtype=np.uint8,
    )
    assert (px == expected).all()


def test_bmp_roundtrip_odd_width_padding():
    rng = np.random.default_rng(7)
    for w, h in [(3, 2), (5, 5), (16, 1), (1, 7)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(_encode_bmp(px)) == px).all(), (w, h)


def test_bmp_rejects_hostile():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG\x00" + b"\x00" * 60)           # wrong magic
    with pytest.raises(ValueError):
        decode_bmp(BMP_2X2[:40])                          # truncated header
    with pytest.raises(ValueError):
        decode_bmp(BMP_2X2[:-4])                          # truncated pixels
    eight_bit = bytearray(BMP_2X2)
    struct.pack_into("<H", eight_bit, 28, 8)              # bpp = 8
    with pytest.raises(ValueError):
        decode_bmp(bytes(eight_bit))


# Hand-assembled 2×5 truecolor PNG exercising ALL FIVE scanline filter
# types, one per row. The FILTERED byte stream below is hand-computed
# from the public filter definitions (recon values in the comments);
# only the zlib container (compress/crc32 — stdlib, used by neither
# direction's filter logic) is delegated.
def _png_golden() -> tuple[bytes, np.ndarray]:
    import zlib

    stream = bytes(
        [0] + [10, 20, 30, 40, 50, 60]   # None:  recon = raw
        + [1] + [5, 5, 5, 5, 5, 5]       # Sub:   recon (5,5,5),(10,10,10)
        + [2] + [1, 1, 1, 1, 1, 1]       # Up:    recon (6,6,6),(11,11,11)
        + [3] + [6, 6, 6, 10, 10, 10]    # Avg:   recon (9,9,9),(20,20,20)
        + [4] + [6, 6, 6, 5, 5, 5]       # Paeth: recon (15,15,15),(25,25,25)
    )
    expected = np.array(
        [
            [[10, 20, 30], [40, 50, 60]],
            [[5, 5, 5], [10, 10, 10]],
            [[6, 6, 6], [11, 11, 11]],
            [[9, 9, 9], [20, 20, 20]],
            [[15, 15, 15], [25, 25, 25]],
        ],
        dtype=np.uint8,
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    return buf, expected


def test_png_golden_all_filter_types():
    buf, expected = _png_golden()
    px = decode_png(buf)
    assert px.shape == (5, 2, 3)
    assert (px == expected).all()


def test_png_roundtrip():
    rng = np.random.default_rng(13)
    # heights ≥ 5 exercise every filter type the encoder cycles through
    for w, h in [(1, 5), (3, 7), (16, 16), (64, 6)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_png(_encode_png(px)) == px).all(), (w, h)


def test_png_rejects_hostile():
    import zlib

    buf, _ = _png_golden()
    with pytest.raises(ValueError):
        decode_png(b"\x89PNJ" + buf[4:])                  # wrong magic
    with pytest.raises(ValueError):
        decode_png(buf[:30])                              # truncated IHDR
    # flip one IDAT byte → CRC mismatch must be caught
    bad = bytearray(buf)
    bad[41] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # interlaced flag → unsupported variant

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    inter = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 5, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 35))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(inter)
    # bad filter-type byte in an otherwise valid container
    badf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes([9, 1, 2, 3])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(badf)
    # garbage behind a valid signature → valid=False via _parse_header
    w, h, ch, nf, valid = _parse_header(b"\x89PNG\r\n\x1a\n" + b"\xff" * 40)
    assert valid is False and (w, h, ch, nf) == (0, 0, 0, 0)


# minimal canonical WAV: 2 samples, 2 channels, 8000 Hz, with an
# unknown odd-sized chunk between fmt and data (must be skipped with
# word alignment).
def _wav_golden() -> tuple[bytes, np.ndarray]:
    samples = np.array([[1000, -2000], [32767, -32768]], dtype=np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + junk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body, samples


def test_wav_golden_bytes_with_junk_chunk():
    buf, samples = _wav_golden()
    rate, got = decode_wav(buf)
    assert rate == 8000
    assert got.shape == (2, 2)
    assert (got == samples).all()


def test_wav_roundtrip():
    rng = np.random.default_rng(11)
    for n, ch, rate in [(1, 1, 8000), (100, 2, 44100), (2048, 1, 16000)]:
        s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
        got_rate, got = decode_wav(_encode_wav(s, rate))
        assert got_rate == rate
        assert (got == s).all()


def test_wav_rejects_hostile():
    buf, _ = _wav_golden()
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + buf[4:])                     # wrong magic
    with pytest.raises(ValueError):
        decode_wav(buf[:20])                              # no fmt/data
    bad_bits = bytearray(buf)
    struct.pack_into("<H", bad_bits, 34, 8)               # 8-bit PCM
    with pytest.raises(ValueError):
        decode_wav(bytes(bad_bits))


def test_parse_header_never_raises():
    for junk in (None, b"", b"BM", b"RIFF" + b"\x00" * 20, b"\xff" * 64):
        w, h, ch, nf, valid = _parse_header(junk)
        assert valid is False and (w, h, ch, nf) == (0, 0, 0, 0)


def test_fixture_goldens_match_decoders():
    """Decode every payload of the fixture with the numpy decoders and
    reproduce the encoder's stored content checksums exactly — pandas-
    level (no Spark) so the decoder itself is isolated."""
    pdf = pd.read_parquet(ensure_media())
    for row in pdf.sample(n=200, random_state=3).itertuples():
        buf = bytes(row.payload)
        if row.kind == "image":
            # magic-dispatch covers BMP, PNG, and (v6) baseline JPEG,
            # whose goldens are the loop-reconstruction pixels
            px = decode_image(buf)
            assert px.shape == (row.height, row.width, 3)
            assert int(px.sum(dtype=np.int64)) == row.content_sum
            assert px.size == row.content_units
        elif row.kind == "audio":
            rate, samples = decode_wav(buf)
            assert rate // 100 == row.width
            assert samples.shape == (row.n_frames, row.channels)
            assert (
                int(np.abs(samples.astype(np.int64)).sum())
                == row.content_sum
            )
        else:
            body = np.frombuffer(buf, dtype=np.uint8, offset=13)
            assert int(body.sum(dtype=np.int64)) == row.content_sum


def test_spectral_audio_dc_and_parseval(spark, sf_dir):
    """Spectral invariants per clip: the DC bin equals the exact
    integer sample sum (independent decode), and Parseval holds —
    Σ|x|² == (Σ|X_k|² adjusted for rfft's one-sided form) / n."""
    import numpy as np

    from gis_etl_spark.fixtures import ensure_media
    from gis_etl_spark.ops.multimodal import decode_wav, multimodal_spectral

    rows = {r.media_id: r for r in multimodal_spectral(spark, sf_dir).collect()}
    assert len(rows) > 50

    import pandas as pd

    media = pd.read_parquet(ensure_media())
    checked = 0
    for rec in media.itertuples():
        if rec.kind != "audio" or rec.media_id not in rows:
            continue
        r = rows[rec.media_id]
        _, samples = decode_wav(bytes(rec.payload))
        mono = samples.astype("f8").sum(axis=1)
        assert r.n_samples == len(mono)
        assert r.dc_sum == int(mono.sum())
        X = np.fft.rfft(mono)
        P = X.real**2 + X.imag**2
        # one-sided spectrum: interior bins carry their conjugates
        w = np.full(len(P), 2.0)
        w[0] = 1.0
        if len(mono) % 2 == 0:
            w[-1] = 1.0  # Nyquist bin is self-conjugate
        assert np.isclose(
            (w * P).sum() / len(mono), (mono**2).sum(), rtol=1e-9
        )
        assert 0 <= r.dominant_bin < len(P)
        assert 0 <= r.centroid_milli <= (len(P) - 1) * 1000
        checked += 1
        if checked >= 40:
            break
    assert checked >= 40


def test_ahash_brightness_invariance_and_reference_parity():
    """aHash contract: the vectorized engine hash equals the loop-based
    reference on random images, is EXACTLY invariant to a uniform
    brightness shift (the cross-multiplied compare), and flips for a
    structurally different image."""
    import numpy as np

    from gis_etl_spark.fixtures import _ahash64_reference
    from gis_etl_spark.ops.multimodal import ahash64

    rng = np.random.default_rng(7)
    for _ in range(10):
        h, w = int(rng.integers(16, 65)), int(rng.integers(16, 65))
        px = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
        assert ahash64(px) == _ahash64_reference(px.tolist())
        shifted = (px.astype(np.int16) + 37).astype(np.uint8)
        assert ahash64(shifted) == ahash64(px)
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[:, 8:] = 200
    flipped = grad[:, ::-1]
    assert ahash64(grad) != ahash64(flipped)


def test_ahash_groups_contain_cross_format_dups(spark, sf_dir):
    """The v5 fixture injects exact and brightness-shifted image
    duplicates whose container format follows the id parity — so some
    groups must span BOTH formats, and every group's images decode to
    the same hash the encoder computed pre-encode. Garbage payloads
    never enter the dedup universe."""
    from pyspark.sql import functions as F

    from gis_etl_spark.ops.multimodal import (
        _media,
        image_ahashes,
        multimodal_ahash_groups,
    )

    groups = multimodal_ahash_groups(spark, sf_dir).collect()
    assert len(groups) > 20
    assert any(g.n_formats == 2 for g in groups)
    assert all(g.n_images >= 2 for g in groups)

    # hashing a corrupted payload raises/skips instead of emitting junk
    m = _media(spark).filter(F.col("kind") == "image").limit(5)
    broken = m.withColumn(
        "payload", F.expr("substring(payload, 1, 10)")
    )
    assert image_ahashes(broken).count() == 0


def test_ahash_near_pairs_pigeonhole_complete(spark, sf_dir):
    """Banding with HAM_T=3 < 4 bands is COMPLETE by pigeonhole: the
    banded join must find exactly the pairs a brute-force popcount over
    all fixture hashes finds. And a lightly-damaged image (a few pixel
    regions nudged) lands within the near-pair threshold of its
    original while a random pair does not."""
    import numpy as np

    from gis_etl_spark.fixtures import ensure_media
    from gis_etl_spark.ops.multimodal import (
        HAM_T,
        ahash64,
        multimodal_ahash_near_pairs,
    )

    got = {
        (r.a_id, r.b_id): r.hamming
        for r in multimodal_ahash_near_pairs(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(ensure_media())
    img = pdf[pdf["kind"] == "image"]
    hs = list(zip(img["media_id"].astype(int), img["ahash64"].astype(int)))
    exp = {}
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            (ia, ha), (ib, hb) = hs[i], hs[j]
            d = bin(((ha ^ hb) + (1 << 64)) % (1 << 64)).count("1")
            if d <= HAM_T:
                a, b = sorted((ia, ib))
                exp[(a, b)] = d
    assert got == exp
    assert got, "fixture contains no near pairs — threshold signal lost"

    rng = np.random.default_rng(5)
    px = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    damaged = px.copy()
    damaged[0:2, 0:2] = 255  # nudge one 8x8 block's mean
    d = bin(((ahash64(px) ^ ahash64(damaged)) + (1 << 64)) % (1 << 64))
    assert d.count("1") <= HAM_T


def test_feature_kernel_is_twinnable_and_unit_norm(spark):
    """The r15 featurizer contract: unit 2-norm (within float eps),
    L1 in [1, 4] for 16 dims, deterministic across invocations, and
    component j reproducible from the documented integer-hash formula
    (the same derivation the DuckDB twin unrolls)."""
    import hashlib
    import math

    import pyspark.sql.functions as F

    from gis_etl_spark.ops.multimodal import (
        FEATURE_DIM,
        _media,
        extract_features,
    )

    rows = (
        _media(spark)
        .filter(F.col("payload").isNotNull())
        .limit(8)
        .select("payload", extract_features(F.col("payload")).alias("f"))
        .collect()
    )
    assert rows
    for r in rows:
        v = r["f"]
        assert len(v) == FEATURE_DIM
        n2 = sum(x * x for x in v)
        assert abs(n2 - 1.0) < 1e-12
        l1 = sum(abs(x) for x in v)
        assert 1.0 <= l1 <= 4.0
        # independent re-derivation of the documented formula
        hx = bytes(r["payload"]).hex()
        raw = []
        for j in range(FEATURE_DIM):
            k = (
                int(hashlib.md5(f"{hx}_{j}".encode()).hexdigest()[:15], 16)
                % 2001
                - 1000
            )
            raw.append(k / 1000.0)
        acc = 0.0
        for x in raw:
            acc = acc + x * x
        nrm = math.sqrt(acc)
        assert v == [x / nrm for x in raw]
