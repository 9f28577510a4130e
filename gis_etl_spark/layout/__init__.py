"""Data-layout policies: space-filling curves + grid cells.

The one genuinely custom "optimizer" artifact this engine carries
(SURVEY.md §4.2): Hilbert-clustering data before writes so parquet
row-group min/max stats become spatially tight and later bbox
predicates prune row groups. Same idea as Delta Z-ORDER; the
reference does it with the DuckDB lindel extension
(HILBERT_ENCODE, east_asia.py:75-77).
"""

from gis_etl_spark.layout.sfc import (
    grid_cell,
    grid_cell_boundary_wkt,
    hilbert_encode,
    morton_encode,
)

__all__ = [
    "grid_cell",
    "grid_cell_boundary_wkt",
    "hilbert_encode",
    "morton_encode",
]
