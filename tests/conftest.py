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

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
