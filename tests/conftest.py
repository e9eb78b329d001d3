import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_analyse_marche_emploi_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "posix_only: txlog test that requires the on-disk POSIX log "
        "store (custom racing store or cross-process DSv2 handles)",
    )
    config.addinivalue_line(
        "markers",
        "slow: long-running sweep/stress test (multi-SF sweeps, "
        "many-commit histories, exhaustive fuzz corpora). Skipped by "
        "default so the full suite fits a CI verify window; opt in "
        "with --run-slow or SPARK_GRAFT_RUN_SLOW=1. Every slow test "
        "has a fast sibling keeping the code path covered by default.",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="also run tests marked @pytest.mark.slow",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow") or os.environ.get(
        "SPARK_GRAFT_RUN_SLOW"
    ):
        return
    skip_slow = pytest.mark.skip(
        reason="slow: opt in with --run-slow or SPARK_GRAFT_RUN_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
