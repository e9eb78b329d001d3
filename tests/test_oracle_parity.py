"""Differential test replicating the driver's correctness gate at
sf0.001 (fast); run tools/oracle_check.py at sf0.01 for the full-size
pre-flight."""

import pytest

from data_analyse_marche_emploi_spark import catalog
from tools.oracle_check import check_query, duck_con

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(catalog.QUERIES))
def test_query_matches_oracle(spark, con, name):
    ok, msg = check_query(spark, con, name, SF_SMOKE)
    assert ok, f"{name}: {msg}"
