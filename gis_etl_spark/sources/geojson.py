"""GeoJSON source — newline-delimited GeoJSON (GeoJSONSeq / .geojsonl,
RFC 7946 features one-per-line) parsed distributed into WKB rows.

The reference EXPORTS GeoJSON for web maps
(East-Asia-Building-Footprints.md:263-273); this module closes the
loop by reading the format back, so a corpus that left the engine as
GeoJSON can re-enter it. Line-delimited is the scale form: Spark's
text source splits the input at line boundaries, so a 100 TB GeoJSONSeq
corpus parses embarrassingly parallel (a single FeatureCollection
document, by contrast, cannot split — read those with
`read_feature_collection`, one file per task via binaryFile).

Coordinates survive the text roundtrip exactly: the writer emits
Python repr floats (shortest round-trip decimal for float64) and the
reader materializes float64 — byte-identical WKB both directions,
which `io_geojsonl_scan`'s centroid hash-match proves end-to-end.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from gis_etl_spark.geom import wkb as K

_TYPE_NAME = {
    K.POINT: "Point",
    K.LINESTRING: "LineString",
    K.POLYGON: "Polygon",
    K.MULTIPOINT: "MultiPoint",
    K.MULTILINESTRING: "MultiLineString",
    K.MULTIPOLYGON: "MultiPolygon",
}
_NAME_TYPE = {v: k for k, v in _TYPE_NAME.items()}


def to_geojson_geometry(buf: bytes) -> dict:
    """WKB → GeoJSON geometry dict (2-D; Z/M dropped per the writer's
    force-2d convention)."""
    base, parts = K.parse(buf)
    if base == K.POINT:
        p = parts[0][0][0]
        return {"type": "Point", "coordinates": [float(p[0]), float(p[1])]}
    if base == K.MULTIPOINT:
        return {
            "type": "MultiPoint",
            "coordinates": [
                [float(r[0][0]), float(r[0][1])] for r in
                (rings[0] for rings in parts)
            ],
        }
    if base == K.LINESTRING:
        return {
            "type": "LineString",
            "coordinates": [[float(x), float(y)] for x, y in
                            parts[0][0][:, :2]],
        }
    if base == K.MULTILINESTRING:
        return {
            "type": "MultiLineString",
            "coordinates": [
                [[float(x), float(y)] for x, y in rings[0][:, :2]]
                for rings in parts
            ],
        }
    if base == K.POLYGON:
        return {
            "type": "Polygon",
            "coordinates": [
                [[float(x), float(y)] for x, y in ring[:, :2]]
                for ring in parts[0]
            ],
        }
    if base == K.MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [
                    [[float(x), float(y)] for x, y in ring[:, :2]]
                    for ring in rings
                ]
                for rings in parts
            ],
        }
    raise ValueError(f"unsupported geometry type {base}")


def from_geojson_geometry(d: dict) -> bytes:
    """GeoJSON geometry dict → little-endian 2-D WKB."""
    t = d["type"]
    c = d["coordinates"]

    def pts(seq) -> bytes:
        out = bytearray(struct.pack("<I", len(seq)))
        for p in seq:
            out += struct.pack("<2d", float(p[0]), float(p[1]))
        return bytes(out)

    if t == "Point":
        return struct.pack("<BI2d", 1, 1, float(c[0]), float(c[1]))
    if t == "MultiPoint":
        out = bytearray(struct.pack("<BII", 1, 4, len(c)))
        for p in c:
            out += struct.pack("<BI2d", 1, 1, float(p[0]), float(p[1]))
        return bytes(out)
    if t == "LineString":
        return struct.pack("<BII", 1, 2, len(c)) + pts(c)[4:]
    if t == "MultiLineString":
        out = bytearray(struct.pack("<BII", 1, 5, len(c)))
        for line in c:
            out += struct.pack("<BII", 1, 2, len(line)) + pts(line)[4:]
        return bytes(out)
    if t == "Polygon":
        out = bytearray(struct.pack("<BII", 1, 3, len(c)))
        for ring in c:
            out += pts(ring)
        return bytes(out)
    if t == "MultiPolygon":
        out = bytearray(struct.pack("<BII", 1, 6, len(c)))
        for rings in c:
            out += struct.pack("<BII", 1, 3, len(rings))
            for ring in rings:
                out += pts(ring)
        return bytes(out)
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def read_geojsonl(
    spark: SparkSession,
    path_glob: str,
    id_field: str = "building_id",
    on_error: str = "fail",
) -> DataFrame:
    """Distributed GeoJSONSeq scan → (building_id, source, geom WKB).

    spark.read.text splits at line boundaries (arbitrarily many input
    files/partitions); each Arrow batch parses its lines with stdlib
    json and re-encodes WKB — no shuffle, no driver involvement.
    Features missing a geometry yield NULL geom (kept, like the
    parquet corpus keeps its NULL rows).

    on_error='fail' (default) raises on the first malformed line —
    right for controlled corpora. on_error='skip' applies the engine's
    failure-record discipline (cf. read_filegdb): malformed lines
    become auditable error rows (NULL id/geom, source='__corrupt__',
    the offending prefix in `error`) instead of killed tasks — a
    100 TB corpus always contains garbage lines."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    lines = spark.read.text(path_glob)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sources, geoms, errs = [], [], [], []
            for line in pdf["value"]:
                if not line or not line.strip():
                    continue
                try:
                    f = json.loads(line)
                    props = f.get("properties") or {}
                    g = f.get("geometry")
                    geom = None if g is None else from_geojson_geometry(g)
                except (ValueError, KeyError, TypeError, IndexError) as exc:
                    if on_error == "fail":
                        raise
                    ids.append(None)
                    sources.append("__corrupt__")
                    geoms.append(None)
                    errs.append(f"{type(exc).__name__}: {line[:80]}")
                    continue
                ids.append(props.get(id_field))
                sources.append(props.get("source"))
                geoms.append(geom)
                errs.append(None)
            yield pd.DataFrame(
                {
                    "building_id": pd.Series(ids, dtype="Int64"),
                    "source": pd.Series(sources, dtype="object"),
                    "geom": pd.Series(geoms, dtype="object"),
                    "error": pd.Series(errs, dtype="object"),
                }
            )

    return lines.mapInPandas(
        _parse, "building_id long, source string, geom binary, error string"
    )


def read_feature_collection(spark: SparkSession, path_glob: str) -> DataFrame:
    """Whole-document FeatureCollection scan: one file per task via
    binaryFile (the non-splittable form — use GeoJSONSeq for scale)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                doc = json.loads(bytes(content).decode("utf-8"))
                feats = doc.get("features", [])
                ids, sources, geoms = [], [], []
                for f in feats:
                    props = f.get("properties") or {}
                    ids.append(props.get("building_id"))
                    sources.append(props.get("source"))
                    g = f.get("geometry")
                    geoms.append(
                        None if g is None else from_geojson_geometry(g)
                    )
                yield pd.DataFrame(
                    {
                        "building_id": pd.Series(ids, dtype="Int64"),
                        "source": pd.Series(sources, dtype="object"),
                        "geom": pd.Series(geoms, dtype="object"),
                    }
                )

    return files.select("content").mapInPandas(
        _parse, "building_id long, source string, geom binary"
    )
