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

    monkeypatch.setattr(FG, "_decode_geometry", boom)
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
