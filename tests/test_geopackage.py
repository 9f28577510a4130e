"""GeoPackage sink/source tests: spec conformance of the emitted
SQLite file (OGC 12-128r14 subset), geometry-blob round-trips, and
the rowid-range partitioned distributed reader
(SURVEY.md §2 K3, East-Asia-Building-Footprints.md:263-273)."""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from gis_etl_spark.geom import wkb as K
from gis_etl_spark.sources.geopackage import (
    APPLICATION_ID,
    USER_VERSION,
    decode_gpkg_blob,
    encode_gpkg_blob,
    read_geopackage,
    write_geopackage,
)


def _sample_df(spark, n=40):
    rows = []
    for k in range(n):
        ring = np.array(
            [[k, 0.0], [k + 1.0, 0.0], [k + 1.0, 1.0], [k, 1.0], [k, 0.0]]
        )
        rows.append((k, f"f{k}", bytes(K.from_wkt(
            "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"
        ))))
    return spark.createDataFrame(rows, "fid long, name string, geom binary")


@pytest.fixture()
def gpkg(spark, tmp_path):
    path = str(tmp_path / "t.gpkg")
    df = _sample_df(spark)
    n = write_geopackage(df, path, "lay", geometry_type="POLYGON")
    assert n == 40
    return path


def test_blob_codec_round_trip():
    wkb = bytes(K.from_wkt("POINT (3.5 -7.25)"))
    blob = encode_gpkg_blob(wkb, 4326, (3.5, 3.5, -7.25, -7.25))
    out, srs, env = decode_gpkg_blob(blob)
    assert out == wkb and srs == 4326
    assert env == (3.5, 3.5, -7.25, -7.25)
    # no-envelope variant
    out2, _, env2 = decode_gpkg_blob(encode_gpkg_blob(wkb, 0, None))
    assert out2 == wkb and env2 is None


def test_gpkg_file_is_spec_conformant(gpkg):
    con = sqlite3.connect(gpkg)
    try:
        (app_id,) = con.execute("PRAGMA application_id").fetchone()
        (uver,) = con.execute("PRAGMA user_version").fetchone()
        assert app_id == APPLICATION_ID and uver == USER_VERSION
        srs = dict(
            (r[0], r[1])
            for r in con.execute(
                "SELECT srs_id, organization FROM gpkg_spatial_ref_sys"
            )
        )
        assert {4326, -1, 0} <= set(srs)
        (dtype, sid, minx, maxx) = con.execute(
            "SELECT data_type, srs_id, min_x, max_x FROM gpkg_contents "
            "WHERE table_name='lay'"
        ).fetchone()
        assert dtype == "features" and sid == 4326
        assert minx == 0.0 and maxx == 40.0
        gname, gtype = con.execute(
            "SELECT column_name, geometry_type_name "
            "FROM gpkg_geometry_columns WHERE table_name='lay'"
        ).fetchone()
        assert gname == "geom" and gtype == "POLYGON"
        # every stored blob leads with the GP magic + envelope flag
        for (blob,) in con.execute('SELECT geom FROM "lay"'):
            magic, _, flags, srs_id = struct.unpack_from(
                "<2sBBi", bytes(blob), 0
            )
            assert magic == b"GP" and srs_id == 4326
            assert (flags >> 1) & 0x07 == 1  # XY envelope present
    finally:
        con.close()


def test_envelope_matches_geometry_bbox(gpkg):
    con = sqlite3.connect(gpkg)
    try:
        for (blob,) in con.execute('SELECT geom FROM "lay" LIMIT 10'):
            wkb, _, env = decode_gpkg_blob(bytes(blob))
            xmin, ymin, xmax, ymax = K.bbox(wkb)
            assert env == (xmin, xmax, ymin, ymax)
    finally:
        con.close()


def test_distributed_read_round_trip(spark, gpkg):
    back = read_geopackage(spark, gpkg, "lay", num_partitions=5)
    rows = back.orderBy("fid").collect()
    assert len(rows) == 40
    assert [r.fid for r in rows] == list(range(40))
    assert rows[0].name == "f0"
    # geometry survives byte-exact (envelope stripped by the reader)
    orig = {r.fid: bytes(r.geom) for r in _sample_df(spark).collect()}
    assert all(bytes(r.geom) == orig[r.fid] for r in rows)
    # each partition read a disjoint slice: no dup, no loss
    assert back.select("fid").distinct().count() == 40


def test_reader_partition_count(spark, gpkg):
    back = read_geopackage(spark, gpkg, "lay", num_partitions=64)
    # over-partitioning clamps to available rowid ranges, still lossless
    assert back.count() == 40


def test_write_refuses_oversized_input(spark, tmp_path):
    """The driver-collect boundary is explicit: above max_rows the sink
    fails fast naming the distributed alternatives, before collecting."""
    import pytest
    from pyspark.sql import functions as F

    from gis_etl_spark.sources.geopackage import write_geopackage

    big = spark.range(500).select(
        F.lit(bytes(21)).alias("geom"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="max_rows.*write_clustered_parquet"):
        write_geopackage(
            big, str(tmp_path / "t.gpkg"), "layer", max_rows=100
        )
    assert not (tmp_path / "t.gpkg").exists()
