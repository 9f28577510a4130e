"""OGC GeoPackage sink/source — the reference's K3 export
(`COPY … TO 'heatmap.gpkg' (FORMAT GDAL, DRIVER 'GPKG',
LAYER_CREATION_OPTIONS 'WRITE_BBOX=YES')`,
East-Asia-Building-Footprints.md:263-273).

No GDAL: GeoPackage is a plain SQLite database following a public
spec (OGC 12-128r14), and Python ships sqlite3 — so this is a REAL
writer/reader, not a substitute. Implemented subset:

- required metadata tables (gpkg_spatial_ref_sys with the three
  mandatory SRS records, gpkg_contents with layer bbox,
  gpkg_geometry_columns), application_id 'GPKG', user_version 10300;
- feature tables with INTEGER PRIMARY KEY ids and GeoPackage
  geometry blobs: 'GP' magic, version 0, flags (little-endian, XY
  envelope present = WRITE_BBOX=YES parity), srs_id, envelope
  doubles, then the standard OGC WKB payload.

Scale notes: a GeoPackage is ONE SQLite file — single-writer by
construction (GDAL has the same constraint), so the writer runs
driver-side and is meant for AGGREGATED exports (the reference
exports the heatmap: O(distinct cells) rows, not O(corpus)). The
reader, however, is distributed: rowid-range partitioned tasks each
open the file and scan their slice (the classic partitioned-JDBC
pattern; SQLite b-tree rowid lookups make range scans cheap), so a
large exported layer re-ingests in parallel."""

from __future__ import annotations

import datetime as _dt
import os
import sqlite3
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

APPLICATION_ID = 0x47504B47  # 'GPKG'
USER_VERSION = 10300  # GeoPackage 1.3

_SRS_ROWS = [
    # the three records the spec REQUIRES (WGS84 + the two undefined)
    ("WGS 84", 4326, "EPSG", 4326,
     'GEOGCS["WGS 84",DATUM["WGS_1984",'
     'SPHEROID["WGS 84",6378137,298.257223563]],'
     'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
     "World Geodetic System 1984"),
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined",
     "undefined cartesian coordinate reference system"),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
     "undefined geographic coordinate reference system"),
]


def encode_gpkg_blob(wkb: bytes, srs_id: int = 4326,
                     envelope: tuple[float, float, float, float] | None
                     = None) -> bytes:
    """WKB → GeoPackage geometry blob. envelope = (minx, maxx, miny,
    maxy) per spec ordering; None → no-envelope flags (indicator 0)."""
    flags = 0x01  # little-endian header
    if envelope is not None:
        flags |= 0x02  # envelope indicator 1: [minx,maxx,miny,maxy]
    head = struct.pack("<2sBBi", b"GP", 0, flags, srs_id)
    env = b"" if envelope is None else struct.pack("<4d", *envelope)
    return head + env + wkb


def decode_gpkg_blob(blob: bytes) -> tuple[bytes, int, tuple | None]:
    """GeoPackage blob → (wkb, srs_id, envelope|None)."""
    magic, version, flags, srs_id = struct.unpack_from("<2sBBi", blob, 0)
    if magic != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    indicator = (flags >> 1) & 0x07
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}[indicator]
    bo = "<" if flags & 0x01 else ">"
    pos = 8
    env = None
    if n_env:
        env = struct.unpack_from(f"{bo}{n_env}d", blob, pos)
        pos += 8 * n_env
    return blob[pos:], srs_id, env


def _init_gpkg(con: sqlite3.Connection) -> None:
    con.execute(f"PRAGMA application_id = {APPLICATION_ID}")
    con.execute(f"PRAGMA user_version = {USER_VERSION}")
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
             srs_name TEXT NOT NULL,
             srs_id INTEGER PRIMARY KEY,
             organization TEXT NOT NULL,
             organization_coordsys_id INTEGER NOT NULL,
             definition TEXT NOT NULL,
             description TEXT)"""
    )
    con.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        _SRS_ROWS,
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_contents (
             table_name TEXT PRIMARY KEY,
             data_type TEXT NOT NULL,
             identifier TEXT UNIQUE,
             description TEXT DEFAULT '',
             last_change DATETIME NOT NULL,
             min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
             srs_id INTEGER)"""
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
             table_name TEXT NOT NULL,
             column_name TEXT NOT NULL,
             geometry_type_name TEXT NOT NULL,
             srs_id INTEGER NOT NULL,
             z TINYINT NOT NULL, m TINYINT NOT NULL,
             PRIMARY KEY (table_name, column_name))"""
    )


def write_geopackage(
    df: DataFrame,
    path: str,
    layer: str,
    geom_col: str = "geom",
    geometry_type: str = "POLYGON",
    srs_id: int = 4326,
    write_bbox: bool = True,
    max_rows: int = 1_000_000,
) -> int:
    """Export a (small, aggregated) DataFrame with a WKB geometry
    column to a GeoPackage layer. Driver-side single-writer like GDAL;
    the envelope per feature mirrors WRITE_BBOX=YES. Returns the
    feature count.

    A GeoPackage is one sqlite file, so this sink is inherently a
    single driver-side writer; rows stream through
    ``df.toLocalIterator()`` (one partition in memory at a time), so
    driver memory is bounded by the largest partition, not the table.
    It is still the wrong sink for a raw corpus — the write itself is
    serial.
    The row bound makes that boundary explicit: exceeding `max_rows`
    fails fast (probed with a cheap limit(n+1) count, not a full scan)
    and names the distributed alternatives."""
    from gis_etl_spark.geom import wkb as K

    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"write_geopackage: input exceeds max_rows={max_rows} — a "
            "GeoPackage is a single driver-written sqlite file, not a "
            "corpus sink. Aggregate first (heatmap/heatmap_export), or "
            "use the distributed exports: write_clustered_parquet, "
            "write_ndjson, or heatmap_geojson. Raise max_rows only if "
            "a single serial sqlite write of that size is acceptable."
        )
    # toLocalIterator: one partition in driver memory at a time (not a
    # full-table collect) — the sink is inherently driver-side (one
    # sqlite file) but its memory footprint need not be O(table).
    attr_cols = [c for c in df.columns if c != geom_col]
    sql_types = {
        "bigint": "INTEGER", "int": "INTEGER", "long": "INTEGER",
        "double": "REAL", "float": "REAL", "string": "TEXT",
    }
    decls = ", ".join(
        f'"{c}" {sql_types.get(df.schema[c].dataType.typeName(), "TEXT")}'
        for c in attr_cols
    )
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        _init_gpkg(con)
        con.execute(
            f'CREATE TABLE "{layer}" '
            f"(id INTEGER PRIMARY KEY AUTOINCREMENT, "
            f'"{geom_col}" BLOB, {decls})'
        )
        gxmin = gymin = float("inf")
        gxmax = gymax = float("-inf")
        ins = (
            f'INSERT INTO "{layer}" ("{geom_col}", '
            + ", ".join(f'"{c}"' for c in attr_cols)
            + ") VALUES ("
            + ",".join("?" * (1 + len(attr_cols)))
            + ")"
        )
        n_rows = 0
        for r in df.toLocalIterator():
            n_rows += 1
            wkb = bytes(r[geom_col])
            env = None
            if write_bbox:
                xmin, ymin, xmax, ymax = K.bbox(wkb)
                env = (xmin, xmax, ymin, ymax)  # spec order
                gxmin, gymin = min(gxmin, xmin), min(gymin, ymin)
                gxmax, gymax = max(gxmax, xmax), max(gymax, ymax)
            blob = encode_gpkg_blob(wkb, srs_id, env)
            con.execute(
                ins, (blob, *[r[c] for c in attr_cols])
            )
        now = _dt.datetime.now(_dt.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%fZ"
        )
        bbox_vals = (
            (gxmin, gymin, gxmax, gymax)
            if write_bbox and n_rows
            else (None, None, None, None)
        )
        con.execute(
            "INSERT INTO gpkg_contents VALUES (?,?,?,?,?,?,?,?,?,?)",
            (layer, "features", layer, "", now, *bbox_vals, srs_id),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (layer, geom_col, geometry_type, srs_id),
        )
        con.commit()
    finally:
        con.close()
    return n_rows


def read_geopackage(
    spark: SparkSession,
    path: str,
    layer: str,
    num_partitions: int = 8,
) -> DataFrame:
    """Distributed GeoPackage layer scan: rowid ranges are computed
    driver-side, then each task opens the SQLite file and reads its
    slice (partitioned-JDBC pattern); geometry blobs decode to plain
    WKB + envelope columns."""
    con = sqlite3.connect(path)
    try:
        cols = [
            r[1]
            for r in con.execute(f'PRAGMA table_info("{layer}")')
        ]
        (geom_col,) = [
            r[0]
            for r in con.execute(
                "SELECT column_name FROM gpkg_geometry_columns "
                "WHERE table_name = ?",
                (layer,),
            )
        ]
        lo, hi = con.execute(
            f'SELECT min(id), max(id) FROM "{layer}"'
        ).fetchone()
    finally:
        con.close()
    if lo is None:
        lo, hi = 0, -1
    attr_cols = [c for c in cols if c not in (geom_col,)]
    step = max(1, (hi - lo + num_partitions) // num_partitions)
    bounds = [
        (lo + k * step, min(hi, lo + (k + 1) * step - 1))
        for k in range(num_partitions)
        if lo + k * step <= hi
    ]
    bdf = spark.createDataFrame(
        pd.DataFrame(bounds or [(0, -1)], columns=["lo", "hi"])
    ).repartition(max(1, len(bounds)))

    sql_to_spark = {"INTEGER": "long", "REAL": "double", "TEXT": "string"}
    con = sqlite3.connect(path)
    try:
        decl = {
            r[1]: sql_to_spark.get((r[2] or "TEXT").upper(), "string")
            for r in con.execute(f'PRAGMA table_info("{layer}")')
        }
    finally:
        con.close()
    schema = ", ".join(
        [f"`{c}` {decl[c]}" for c in attr_cols]
        + ["geom binary", "srs_id int",
           "env_minx double", "env_maxx double",
           "env_miny double", "env_maxy double"]
    )
    sel_cols = ", ".join(
        [f'"{c}"' for c in attr_cols] + [f'"{geom_col}"']
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo_, hi_ in zip(pdf["lo"], pdf["hi"]):
                c = sqlite3.connect(path)
                try:
                    rows = c.execute(
                        f'SELECT {sel_cols} FROM "{layer}" '
                        f"WHERE id BETWEEN ? AND ? ORDER BY id",
                        (int(lo_), int(hi_)),
                    ).fetchall()
                finally:
                    c.close()
                out = []
                for row in rows:
                    *attrs, blob = row
                    wkb, srs, env = decode_gpkg_blob(bytes(blob))
                    e = env if env is not None else (None,) * 4
                    out.append((*attrs, wkb, srs, *e[:4]))
                yield pd.DataFrame(
                    out,
                    columns=attr_cols
                    + ["geom", "srs_id", "env_minx", "env_maxx",
                       "env_miny", "env_maxy"],
                )

    return bdf.mapInPandas(scan, schema=schema)
