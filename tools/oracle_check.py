"""Local replica of the driver's DuckDB-differential correctness gate.

For every entry in catalog.QUERIES with an oracle: run the Spark query
and the DuckDB SQL on the same parquet dir, sort columns by name,
compare row multisets exactly. Used by tests and ad-hoc:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_analyse_marche_emploi_spark import catalog  # noqa: E402
from data_analyse_marche_emploi_spark.session import get_spark  # noqa: E402
from data_analyse_marche_emploi_spark.tables import TABLES  # noqa: E402


class NonScalarCell(Exception):
    """A list/array/struct output cell — the driver's pandas-based
    canonicalizer (sort_values → factorize) crashes on these
    (`unhashable type: 'list'`), so the local gate must fail them too."""


def _norm(v):
    """Normalize a cell the way the driver's pandas canonicalizer sees it.

    Deliberately STRICTER than a str() hash:
    - decimal.Decimal never equals a float: Spark DECIMAL outputs and
      DuckDB's decimal→float64 pandas conversion hash-diverge in the
      driver, so they must diverge here (policy: emit round(double, k)).
    - list/tuple/ndarray/dict cells raise (driver crashes on them).
    - floats NEVER equal ints, even int-valued ones: DuckDB's
      SUM(BIGINT)→HUGEINT (plain and windowed) reaches pandas as
      float64 while Spark emits int64, and the driver's dtype-
      sensitive hash distinguishes them (round-3 driver failure
      `pipeline_training_sequences`). Policy: oracles must
      CAST(... AS BIGINT) every HUGEINT-producing expression so both
      sides arrive int64. Local green must imply driver green.
    """
    import numpy as np

    if v is None:
        return None
    import pandas as pd

    if v is pd.NaT:
        return None
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise NonScalarCell(f"non-scalar cell {type(v).__name__}: {str(v)[:60]}")
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return ("float", repr(v))
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, datetime.datetime):
        # midnight timestamps ≡ dates: engines disagree on DATE vs
        # midnight-TIMESTAMP rendering of date_trunc/CAST AS DATE.
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_query(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    sdf = catalog.QUERIES[name](spark, sf_dir)
    # Pandas on BOTH sides, like the driver: this is where DuckDB
    # DECIMAL→float64 and HUGEINT→float64 conversions happen, and where
    # array cells become unhashable — collect()/fetchall() would hide
    # exactly the divergences the driver trips on.
    spdf = sdf.toPandas()
    srows = list(spdf.itertuples(index=False, name=None))
    scols = list(spdf.columns)
    if name not in catalog.ORACLES:
        # Run the driver's canonicalizer over rows-only outputs too: the
        # driver still sorts/hashes these rows, so an array/struct cell
        # that would crash its pandas canonicalizer (r7 `emb_pca_project`,
        # `TypeError: unhashable type: 'list'`) must fail HERE, not in
        # CORRECTNESS_r{N}.json. Local green must imply driver green for
        # rows-only entries exactly as it does for full-oracle ones.
        _rows_to_multiset(srows, [c.lower() for c in scols])
        return (len(srows) >= 0, f"rows-only: {len(srows)} rows")
    odf = con.execute(catalog.ORACLES[name]).df()
    ocols = list(odf.columns)
    orows = list(odf.itertuples(index=False, name=None))
    if sorted(scols) != sorted(c.lower() for c in ocols) and sorted(
        c.lower() for c in scols
    ) != sorted(c.lower() for c in ocols):
        return (False, f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}")
    sm = _rows_to_multiset(srows, [c.lower() for c in scols])
    om = _rows_to_multiset(orows, [c.lower() for c in ocols])
    if sm == om:
        return (True, f"OK {len(srows)} rows")
    only_s = list((sm - om).items())[:3]
    only_o = list((om - sm).items())[:3]
    return (
        False,
        f"value mismatch: {len(srows)} spark rows vs {len(orows)} oracle rows; "
        f"spark-only sample={only_s}; oracle-only sample={only_o}",
    )


def main(sf_dir: str, names: list[str] | None = None) -> int:
    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    names = names or list(catalog.QUERIES)
    failed = 0
    for name in names:
        try:
            ok, msg = check_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "PASS" if ok else "FAIL"
        if not ok:
            failed += 1
        print(f"[{status}] {name}: {msg}")
    print(f"{len(names) - failed}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    qs = sys.argv[2:] or None
    raise SystemExit(main(sf, qs))
