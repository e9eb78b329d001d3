"""The driver brings its own SparkSession; if it isn't UTC-pinned,
every timestamp query would render different wall-clock values than
DuckDB's UTC-naive timestamps. load_table force-sets the session
timezone, so catalog entries must match the oracle regardless of the
ambient session timezone."""

from __future__ import annotations

import duckdb
import pytest

from data_analyse_marche_emploi_spark.tables import TABLES
from tests.conftest import SF_SMOKE
from tools.oracle_check import check_query


@pytest.fixture()
def ny_session(spark):
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", original)


def test_timestamp_queries_survive_non_utc_session(ny_session):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    for name in ("flagship_orders_by_month", "agg_date_histogram", "date_fmt_fr"):
        ok, msg = check_query(ny_session, con, name, SF_SMOKE)
        assert ok, f"{name} diverged under non-UTC session: {msg}"
