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


def test_cli_tiles_and_dedup_spans(tmp_path):
    """New subcommands end-to-end, each in a subprocess (cli main
    stops its session — never run it inside the test process)."""
    import shutil

    from gis_etl_spark.fixtures import ensure_buildings

    env = dict(os.environ, PYTHONPATH=REPO)

    def run(*argv):
        res = subprocess.run(
            [sys.executable, "-m", "gis_etl_spark.cli", *argv],
            env=env, capture_output=True, text=True,
        )
        assert res.returncode == 0, res.stderr[-2000:]

    bpath, _ = ensure_buildings(5_000)
    bdir = str(tmp_path / "bld_in")
    os.makedirs(bdir)
    shutil.copy(bpath, os.path.join(bdir, "buildings.parquet"))
    tiles_out = str(tmp_path / "tiles")
    run("tiles", "--input", bdir, "--output", tiles_out,
        "--zoom", "8", "--master", "local[4]")
    tiles = pq.read_table(tiles_out).to_pydict()
    assert len(tiles["quadkey"]) > 10
    assert all(0 <= x < 256 for x in tiles["x"])

    docs_dir = str(tmp_path / "docs_in")
    os.makedirs(docs_dir)
    shutil.copy(
        "/root/testdata/sf0.001/documents.parquet",
        os.path.join(docs_dir, "documents.parquet"),
    )
    dd_out = str(tmp_path / "dd")
    run("dedup-spans", "--input", docs_dir, "--output", dd_out,
        "--master", "local[4]")
    dd = pq.read_table(dd_out).to_pydict()
    assert len(dd["doc_id"]) == 500
    assert all(k <= n for k, n in zip(dd["n_kept"], dd["n_spans"]))


def test_cli_semdedup_cdc_pagerank(tmp_path):
    """The three session-3 subcommands end-to-end in subprocesses over
    the sf0.001 tables; outputs carry the expected columns and
    non-trivial row counts."""
    import pandas as pd

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    env = dict(os.environ, PYTHONPATH=REPO)
    for cmd, cols, min_rows in [
        ("semdedup", {"vec_id", "list_id", "dropped"}, 100),
        (
            "cdc-compact",
            {"o_custkey", "last_orderkey", "last_status",
             "last_totalprice", "last_update"},
            50,
        ),
        ("pagerank", {"node_id", "kind", "rank_units"}, 100),
    ]:
        out = str(tmp_path / cmd)
        res = subprocess.run(
            [
                sys.executable, "-m", "gis_etl_spark.cli", cmd,
                "--input", sf, "--output", out, "--master", "local[4]",
            ],
            env=env,
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert res.returncode == 0, (cmd, res.stderr[-2000:])
        pdf = pd.read_parquet(out)
        assert set(pdf.columns) == cols, cmd
        assert len(pdf) >= min_rows, cmd
