"""Custom sources: file formats Spark has no built-in reader for,
implemented as binaryFile scans + batch decoders (the engine's
equivalent of the reference's `ST_READ` table function)."""

from gis_etl_spark.sources.shapefile import read_shapefile

__all__ = ["read_shapefile"]
