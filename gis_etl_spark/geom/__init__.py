"""Geometry subsystem: WKB kernels + Spark-facing st_* functions.

The engine's native geometry representation is OGC WKB bytes in a
BinaryType column (SURVEY.md §1.2) — the same convention the reference
keeps with `ST_READ(..., keep_wkb=TRUE)` (east_asia.py:145). All
geometry math is numpy inside Arrow-batched pandas UDFs; shape-type
inspection stays JVM-side as native expressions.
"""

from gis_etl_spark.geom.functions import (
    st_astext,
    st_bbox,
    st_centroid,
    st_flip_coordinates,
    st_force2d,
    st_geomfromtext,
    st_npoints,
    st_shape_type_byte,
    st_x,
    st_y,
)

__all__ = [
    "st_astext",
    "st_bbox",
    "st_centroid",
    "st_flip_coordinates",
    "st_force2d",
    "st_geomfromtext",
    "st_npoints",
    "st_shape_type_byte",
    "st_x",
    "st_y",
]
