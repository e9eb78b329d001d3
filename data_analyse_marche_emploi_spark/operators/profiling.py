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

from pyspark.sql import DataFrame, Window
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


def dq_report(
    df: DataFrame,
    unique_cols: Sequence[str] = (),
    not_null_cols: Sequence[str] = (),
    ref_checks: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Declarative data-quality report: one row per constraint with its
    violation count — the expectation-suite pattern (unique keys, null
    rates, referential integrity) as plain aggregates.

    Scale shape: each uniqueness check is one partial-aggregated
    groupBy; null checks share a single scan via conditional counts;
    each referential check is a left-anti join (broadcast when the
    referenced key side is dimension-sized). Nothing collects more than
    the one-row-per-constraint report."""
    spark = df.sparkSession
    reports = []
    if not_null_cols:
        null_agg = df.agg(
            *[
                F.count(F.when(F.col(c).isNull(), 1)).alias(c)
                for c in not_null_cols
            ]
        )
        reports.append(
            null_agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(f"not_null:{c}").alias("constraint"),
                                F.col(c).cast("long").alias("violations"),
                            )
                            for c in not_null_cols
                        ]
                    )
                ).alias("r")
            ).select("r.constraint", "r.violations")
        )
    for c in unique_cols:
        dupes = (
            df.groupBy(c)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(
                F.lit(f"unique:{c}").alias("constraint"),
                F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias(
                    "violations"
                ),
            )
        )
        reports.append(dupes)
    for fk_col, ref_df, ref_col in ref_checks:
        orphans = (
            df.select(F.col(fk_col))
            .filter(F.col(fk_col).isNotNull())
            .join(
                ref_df.select(F.col(ref_col).alias(fk_col)).distinct(),
                fk_col,
                "left_anti",
            )
            .agg(
                F.lit(f"ref:{fk_col}").alias("constraint"),
                F.count(F.lit(1)).cast("long").alias("violations"),
            )
        )
        reports.append(orphans)
    if not reports:
        raise ValueError("dq_report: declare at least one constraint")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def dq_drift(df_a: DataFrame, df_b: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Population-stability (PSI) drift report between two snapshots:
    per column, per bucket, the smoothed share in each period and the
    PSI contribution ``(p - q) * ln(p / q)``.

    Laplace (+1) smoothing keeps buckets present in only one period
    finite; shares and PSI are floor-bucketed at 1e-6 (the repo's
    standard for cross-engine float determinism — exact comparison of
    the count arithmetic, ULP-insensitive comparison of the log).

    Scale shape: one partial-aggregated count per (column, period);
    everything after runs on bucket-cardinality-sized tables (the
    window totals are over dozens of rows, not the corpus)."""
    reports = []
    for c in columns:
        ca = df_a.groupBy(F.col(c).cast("string").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_a")
        )
        cb = df_b.groupBy(F.col(c).cast("string").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_b")
        )
        # null-safe bucket equality: a NULL bucket present in both
        # periods must merge into ONE row — a plain equi-join splits it
        # into two, inflating the bucket count and corrupting every
        # bucket's smoothing denominator (null buckets are the normal
        # case for a data-quality tool)
        cb2 = cb.withColumnRenamed("bucket", "__bucket_b")
        j = (
            ca.join(cb2, ca["bucket"].eqNullSafe(cb2["__bucket_b"]), "full_outer")
            .select(
                F.coalesce("bucket", "__bucket_b").alias("bucket"),
                F.coalesce("n_a", F.lit(0)).alias("n_a"),
                F.coalesce("n_b", F.lit(0)).alias("n_b"),
            )
        )
        w = Window.partitionBy(F.lit(1))
        nb = F.count(F.lit(1)).over(w)
        ta = F.sum("n_a").over(w)
        tb = F.sum("n_b").over(w)
        p = (F.col("n_a") + 1) / (ta + nb)
        q = (F.col("n_b") + 1) / (tb + nb)
        reports.append(
            j.select(
                F.lit(c).alias("column_name"),
                "bucket",
                "n_a",
                "n_b",
                # the +1e-6 guard absorbs cross-engine libm ULP noise
                # (Spark vs DuckDB ln/÷ can differ by ~1e-8 at this
                # magnitude): without it, a true value landing exactly
                # on a bucket boundary floors differently per engine
                # and the differential hash flakes. 1e-6 ≪ the
                # quantization step (1), so no legitimate value moves.
                F.floor(p * 1e6 + 1e-6).cast("long").alias("share_a6"),
                F.floor(q * 1e6 + 1e-6).cast("long").alias("share_b6"),
                F.floor((p - q) * F.log(p / q) * 1e6 + 1e-6)
                .cast("long")
                .alias("psi6"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
