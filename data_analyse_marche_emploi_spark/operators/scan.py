"""Scan / projection / filter operators (SURVEY.md §2.B).

In the reference these evaluate *inside Elasticsearch* before data moves
(``_source`` projection and ``terms`` predicate embedded in the Logstash
input query — reference: csv-tech.conf:8-22, export-offres-csv.conf:1-12).
Here the same pushdown is Catalyst's job: expressing the scan as
``read → filter → select`` makes the filter and the pruned column list
reach the Parquet reader (`PushedFilters` / `ReadSchema` in
``.explain("formatted")``), which at 100 TB is the difference between
reading terabytes and reading the row groups that matter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def scan_match_all(df: DataFrame) -> DataFrame:
    """Unfiltered full scan (reference: ``match_all``,
    export-offres-csv.conf:7-9). Identity — the point is that no filter
    means no pushdown barrier."""
    return df


def project_fields(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Source-side column projection (reference: ``_source`` field list,
    csv-tech.conf:13). Catalyst prunes the Parquet ``ReadSchema`` to
    exactly these columns (nested leaves included via
    nestedSchemaPruning)."""
    return df.select(*cols)


def filter_terms_in(df: DataFrame, col: Column, values: Sequence) -> DataFrame:
    """IN-list equality predicate on an exact-match field (reference:
    ``terms`` filter on ``romeCode.keyword``, csv-tech.conf:14-19).
    ``isin`` compiles to an `In` predicate that pushes to Parquet
    row-group stats + dictionary filtering."""
    if len(values) == 1:
        return df.filter(col == values[0])
    return df.filter(col.isin(*values))
