"""CLI smoke test: the reference-parity command surface end-to-end in
a subprocess (shapefiles → merge-pqs → output audit)."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pyarrow.parquet as pq

from gis_etl_spark.fixtures import ensure_shapefiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_merge_pqs_roundtrip(tmp_path):
    shp_dir, twin = ensure_shapefiles()
    out = str(tmp_path / "merged")
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run(
        [
            sys.executable, "-m", "gis_etl_spark.cli", "merge-pqs",
            "--input", shp_dir, "--output", out,
            "--max-rows", "2000", "--master", "local[4]",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files
    import pandas as pd

    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == len(pd.read_parquet(twin))
    assert all(pq.read_metadata(f).num_rows <= 2000 for f in files)
    # clustered output carries the layout key
    cols = pq.read_schema(files[0]).names
    assert "hkey" in cols and "geom" in cols and "source" in cols
