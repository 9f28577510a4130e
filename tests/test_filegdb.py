"""FileGDB source tests: spec-subset writer/reader round-trip, the
largest-member selection, in-decoder projection pushdown, null
handling, and the distributed scan vs the parquet twin
(SURVEY.md §2 S3, ORNL-FEMA-Buildings.md:76-81)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from gis_etl_spark.fixtures import ensure_filegdb
from gis_etl_spark.geom import wkb as K
from gis_etl_spark.sources import filegdb as FG


@pytest.fixture(scope="module")
def fixture_paths():
    return ensure_filegdb()


@pytest.fixture(scope="module")
def layer_bytes(fixture_paths):
    gdb_dir, _ = fixture_paths
    with open(FG.largest_layer(gdb_dir), "rb") as fh:
        return fh.read()


def test_largest_member_selection(fixture_paths):
    gdb_dir, _ = fixture_paths
    assert FG.largest_layer(gdb_dir).endswith("a00000009.gdbtable")


def test_attrs_round_trip(layer_bytes, fixture_paths):
    _, twin = fixture_paths
    df = FG.parse_gdbtable(layer_bytes)
    tw = pd.read_parquet(twin)
    assert len(df) == len(tw)
    assert (df["OBJECTID"].values == tw["objectid"].values).all()
    assert (df["occ_cls"].values == tw["occ_cls"].values).all()
    assert (df["prop_st"].values == tw["prop_st"].values).all()
    assert np.allclose(df["height"].values, tw["height"].values)
    assert np.allclose(df["sqmeters"].values, tw["sqmeters"].values)


def test_geometry_quantization_bound(layer_bytes, fixture_paths):
    """Compressed geometry is scaled-int quantized: decoded WKB must
    match the original within a few quanta (1/xyscale) per coord."""
    _, twin = fixture_paths
    df = FG.parse_gdbtable(layer_bytes, ["Shape"])
    tw = pd.read_parquet(twin)
    worst = 0.0
    for g, o in zip(df["Shape"].head(300), tw["orig_wkb"].head(300)):
        c1 = K.centroid(bytes(g))
        c2 = K.centroid(bytes(o))
        worst = max(worst, abs(c1[0] - c2[0]), abs(c1[1] - c2[1]))
    assert worst < 100.0 / FG.DEFAULT_XYSCALE


def test_projection_skips_geometry_decode(layer_bytes, monkeypatch):
    """Attrs-only scans must never decode coordinate blobs (the
    length-prefixed skip) — decode explodes if called."""

    def boom(blob, f):
        raise AssertionError("geometry decoded despite projection")

    def boom_batch(content, spans, f):
        raise AssertionError("geometry decoded despite projection")

    monkeypatch.setattr(FG, "_decode_geometry", boom)
    monkeypatch.setattr(FG, "_decode_geometries_batch", boom_batch)
    out = FG.parse_gdbtable(layer_bytes, ["occ_cls", "height"])
    assert list(out.columns) == ["occ_cls", "height"]
    with pytest.raises(AssertionError, match="despite projection"):
        FG.parse_gdbtable(layer_bytes, ["occ_cls", "Shape"])


def test_null_attrs_round_trip(tmp_path):
    fields = [
        FG.Field("OBJECTID", FG.T_OBJECTID),
        FG.Field("name", FG.T_STRING),
        FG.Field("v", FG.T_FLOAT64),
        FG.Field("n", FG.T_INT32),
    ]
    rows = [("a", 1.5, 7), (None, None, None), ("c", -2.25, None)]
    path = str(tmp_path / "t.gdbtable")
    FG.write_gdbtable(path, fields, rows, FG.GEOM_NONE)
    with open(path, "rb") as fh:
        out = FG.parse_gdbtable(fh.read())
    assert out["OBJECTID"].tolist() == [1, 2, 3]
    assert out["name"].tolist() == ["a", None, "c"]
    # pandas floats carry NaN for NULL
    assert out["v"][0] == 1.5 and out["v"][2] == -2.25
    assert pd.isna(out["v"][1])
    assert out["n"][0] == 7 and pd.isna(out["n"][1]) and pd.isna(out["n"][2])


def test_multi_ring_polygon_round_trip(tmp_path):
    """Shell + hole survive the delta-varint encoding with correct
    part boundaries."""
    shell = np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]
    )
    hole = np.array(
        [[2.0, 2.0], [2.0, 4.0], [4.0, 4.0], [4.0, 2.0], [2.0, 2.0]]
    )
    fields = [
        FG.Field("OBJECTID", FG.T_OBJECTID),
        FG.Field("Shape", FG.T_GEOMETRY),
    ]
    path = str(tmp_path / "g.gdbtable")
    FG.write_gdbtable(
        path, fields, [((5, [shell, hole]),)], FG.GEOM_POLYGON
    )
    with open(path, "rb") as fh:
        out = FG.parse_gdbtable(fh.read())
    base, parts = K.parse(bytes(out["Shape"][0]))
    assert base == K.POLYGON
    assert len(parts[0]) == 2
    np.testing.assert_allclose(parts[0][0], shell, atol=1e-8)
    np.testing.assert_allclose(parts[0][1], hole, atol=1e-8)


def test_spark_scan_matches_twin(spark, fixture_paths):
    gdb_dir, twin = fixture_paths
    df = FG.read_filegdb(spark, gdb_dir, columns=["OBJECTID", "fips"])
    got = df.agg(
        F.count("*").alias("n"),
        F.sum("OBJECTID").alias("s"),
        F.countDistinct("fips").alias("f"),
    ).first()
    tw = pd.read_parquet(twin)
    assert got.n == len(tw)
    assert got.s == int(tw["objectid"].sum())
    assert got.f == tw["fips"].nunique()
    # provenance column present
    assert df.schema["source"].dataType.typeName() == "string"


# --- hostile-input hardening (fuzz) ----------------------------------------
#
# Contract: every malformed input fails with ValueError — never an
# IndexError/struct.error/OverflowError/MemoryError escaping a Spark
# task — and the skip-mode scan turns a corrupt member into a per-file
# failure record instead of job death.


def test_fuzz_truncation_ladder(layer_bytes):
    """Every truncation point either parses (if it cuts after the last
    row... impossible here) or raises ValueError."""
    for cut in [0, 10, 39, 41, 80, 200, len(layer_bytes) // 2,
                len(layer_bytes) - 1]:
        try:
            FG.parse_gdbtable(layer_bytes[:cut])
        except ValueError:
            pass


def test_fuzz_lying_row_size(layer_bytes):
    import struct

    fields, row_off, n_rows = FG.parse_fields(layer_bytes)
    bad = bytearray(layer_bytes)
    struct.pack_into("<i", bad, row_off, 2_000_000_000)  # size past EOF
    with pytest.raises(ValueError, match="runs past EOF"):
        FG.parse_gdbtable(bytes(bad))
    # a NEGATIVE size is a deleted-row tombstone per the spec (round 4),
    # so the walk skips the 9-byte hole and then runs out of file while
    # still owing the header's live-row count — a ValueError either way,
    # from whichever misaligned structure it trips over first
    struct.pack_into("<i", bad, row_off, -5)
    with pytest.raises(ValueError):
        FG.parse_gdbtable(bytes(bad))


def test_fuzz_lying_field_count(layer_bytes):
    import struct

    (fsec_off,) = struct.unpack_from("<q", layer_bytes, 32)
    nf_pos = fsec_off + 4 + 4 + 4
    bad = bytearray(layer_bytes)
    struct.pack_into("<h", bad, nf_pos, 3000)
    with pytest.raises(ValueError):
        FG.parse_gdbtable(bytes(bad))
    struct.pack_into("<h", bad, nf_pos, -2)
    with pytest.raises(ValueError, match="negative field count"):
        FG.parse_gdbtable(bytes(bad))


def test_fuzz_memory_bomb_geometry():
    """A geometry blob claiming 2^40 points must be rejected by the
    byte-count bound, not attempted as an allocation."""
    f = FG.Field("Shape", FG.T_GEOMETRY, True, 0.0, 0.0, 1000.0)
    blob = bytearray()
    FG._write_varuint(blob, FG._SHAPE_POLYGON)
    FG._write_varuint(blob, 1 << 40)   # n_points lie
    FG._write_varuint(blob, 1)         # n_parts
    blob += b"\x00" * 16
    with pytest.raises(ValueError, match="claims"):
        FG._decode_geometry(bytes(blob), f)


def test_fuzz_overlong_varuint():
    with pytest.raises(ValueError, match="varuint"):
        FG._read_varuint(b"\xff" * 11, 0)
    with pytest.raises(ValueError, match="truncated varuint"):
        FG._read_varuint(b"\xff\xff", 0)


def test_fuzz_random_mutations(layer_bytes):
    """Random byte flips anywhere in a valid table: parse either
    succeeds (mutation hit a don't-care byte or a value) or raises
    ValueError — nothing else escapes, and no mutation may hang or
    exhaust memory."""
    rng = np.random.default_rng(7)
    data = bytearray(layer_bytes)
    for trial in range(60):
        i = int(rng.integers(0, len(data)))
        old = data[i]
        data[i] = int(rng.integers(0, 256))
        try:
            FG.parse_gdbtable(bytes(data))
        except ValueError:
            pass
        finally:
            data[i] = old


def test_corrupt_member_skip_and_failure_record(spark, tmp_path, layer_bytes):
    """End-to-end: a corrupt largest member under on_error='skip'
    yields zero rows (scan survives), and filegdb_failures() reports
    it as a per-file record with the decode reason."""
    import os
    import struct

    gdb = tmp_path / "broken.gdb"
    gdb.mkdir()
    bad = bytearray(layer_bytes)
    fields, row_off, _ = FG.parse_fields(layer_bytes)
    struct.pack_into("<i", bad, row_off, 2_000_000_000)
    (gdb / "a00000009.gdbtable").write_bytes(bytes(bad))

    with pytest.raises(Exception):
        FG.read_filegdb(spark, str(gdb)).collect()   # fail mode: propagates
    got = FG.read_filegdb(spark, str(gdb), on_error="skip").collect()
    assert got == []
    recs = FG.filegdb_failures(spark, str(gdb)).collect()
    assert len(recs) == 1
    assert recs[0].source.endswith("a00000009.gdbtable")
    assert "runs past EOF" in recs[0].error
