"""Shared pytest fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from gis_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# --- slow-receipt gating (r19, VERDICT r18 item 2) -------------------
# The full suite grew past the driver's pytest window (~3,300 s on
# local[4]; the window expired at ~11% in r18's VERIFY). The heaviest
# receipt tests — crossover economics arms, full-corpus fixpoints,
# multi-JVM CLI round-trips — are *receipts* for claims that are also
# pinned by cheaper tests; they stay runnable via an explicit opt-in
# (flag or env) but are skipped in the default run so the driver's
# gate can complete. CI / round-end verification runs them with
# SPARK_GRAFT_RUN_SLOW=1.


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow-receipts",
        action="store_true",
        default=False,
        help="run tests marked slow_receipt (also: SPARK_GRAFT_RUN_SLOW=1)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow_receipt: heavy receipt test skipped by default "
        "(opt in with --run-slow-receipts or SPARK_GRAFT_RUN_SLOW=1)",
    )


def pytest_collection_modifyitems(config, items):
    if (
        config.getoption("--run-slow-receipts")
        or os.environ.get("SPARK_GRAFT_RUN_SLOW") == "1"
    ):
        return
    skip = pytest.mark.skip(
        reason="slow receipt; opt in with --run-slow-receipts "
        "or SPARK_GRAFT_RUN_SLOW=1"
    )
    for item in items:
        if "slow_receipt" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "gis-etl-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
