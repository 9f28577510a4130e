"""gis_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference GIS ETL toolkit
(marklit/gis-etl), re-expressed Spark-first.

The reference converts building-footprint datasets to spatially-clustered
Parquet with embedded DuckDB + GeoPandas (see `east_asia.py` in the
reference); this engine expresses the same operator surface as Catalyst
logical plans over DataFrames, adds the LLM-data-pipeline operators a
100 TB training-data workload needs (dedup, similarity search, text
analysis, multimodal columns), and is designed for multi-executor
clusters even though tests run on local mode.

Public modules:
  session    — SparkSession factory with engine defaults
  io         — sources/sinks: provenance scans, clustered parquet writer
  geom       — WKB kernels + st_* functions (no GEOS/PROJ dependency)
  layout     — space-filling curves (Hilbert/Morton) + grid cells
  ops        — relational helpers, dedup, similarity, text analysis
  pipelines  — reference-pipeline renditions (convert/merge/stats/heatmap)
"""

__version__ = "0.1.0"
