"""Data profiling: per-column quality stats in one pass.

The reference's de-facto quality metric is completeness (collected vs
available counts, ingestion-elasticsearch.py:298-308); a real pipeline
needs that per column. One aggregation computes nulls + exact distincts
for every requested column simultaneously (single scan, partial
aggregation per column), then ``stack`` unpivots the one wide row into
one row per column — no per-column scans, no driver loop over columns
issuing jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Rows of (column, n_rows, n_nulls, n_distinct, completeness).

    Exact distincts: fine up to high-cardinality columns because each
    count_distinct aggregates independently (Spark plans them with an
    expand + partial aggregation); for 100 TB-wide profiling swap in
    approx_count_distinct.
    """
    cols = list(columns) if columns is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        ((F.col("n_rows") - F.col("n_nulls")) / F.col("n_rows")).alias("completeness"),
    )
