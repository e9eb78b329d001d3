"""Distributed prefix sum — the scale-safe form of a global running
total.

A global-order cumulative sum written naively (`Window.orderBy(...)`
with no partition key) plans a single-partition window: every row moves
to one task — the textbook scale-killer. The classic fix is the
two-phase prefix sum:

1. range-partition + sort by the order key (global order preserved
   across partition boundaries),
2. per-partition running sum (partition-local window),
3. per-partition totals — ``n_partitions`` rows, collected and turned
   into exclusive offsets (the ONLY driver involvement, bounded by the
   partition count, like the query-set collect in similarity.py),
4. final value = partition offset + local running sum, via a broadcast
   join on the partition id.

The partitioned frame is persisted between the totals action and the
main query so both see identical partition assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _sum_offset_type(df: DataFrame, value_col: str):
    """(Spark type, Python zero) matching ``sum(value_col)``'s result —
    what the collected per-partition totals actually are."""
    dt = df.select(F.sum(value_col).alias("s")).schema["s"].dataType
    if isinstance(dt, T.DecimalType):
        import decimal

        return dt, decimal.Decimal(0)
    if isinstance(dt, T.FractionalType):
        return dt, 0.0
    return T.LongType(), 0


def distributed_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Inclusive running sum of ``value_col`` over the TOTAL order given
    by ``order_cols`` (which must be a unique key), computed without a
    single-partition window. Adds ``out_col``; row order of the result
    is the global order."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n_part, *[F.asc(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.withColumn("__local", F.sum(value_col).over(w))
    totals = sorted(
        parted.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect(),
        key=lambda r: r["__pid"],
    )
    # offset type follows the SUM's result type (from the schema, not
    # the collected Python values — value-sniffing misclassifies
    # DecimalType and all-null columns): long sums stay long, double
    # sums double, decimal sums decimal
    off_type, zero = _sum_offset_type(df, value_col)
    offsets, acc = [], zero
    for r in totals:
        offsets.append((r["__pid"], acc))
        acc += r["t"] if r["t"] is not None else zero
    spark = df.sparkSession
    off_dim = spark.createDataFrame(
        offsets,
        T.StructType(
            [T.StructField("__pid", T.IntegerType()), T.StructField("__off", off_type)]
        ),
    )
    return (
        local.join(F.broadcast(off_dim), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__local"))
        .drop("__pid", "__off", "__local")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Inclusive running sum of ``value_col`` within each group, ordered
    by ``order_cols`` (unique within a group) — without hanging each
    group on a single ``Window.partitionBy(group)`` task.

    A handful of massive strata is the common shape (per-language token
    budgets over a web corpus): plain per-group windows collapse to
    n_groups tasks. Here rows range-partition on (group, order) — so a
    group spans consecutive partitions and every core works — local
    windows run per (partition, group) slice, and the driver stitches
    per-group offsets from the (n_partitions × n_groups) totals grid,
    broadcast back. Same two-phase shape as ``distributed_prefix_sum``,
    keyed by group."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    keys = [*group_cols, *order_cols]
    parted = (
        df.repartitionByRange(n_part, *[F.asc(c) for c in keys])
        .sortWithinPartitions(*keys)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.withColumn("__local", F.sum(value_col).over(w))
    totals = parted.groupBy("__pid", *group_cols).agg(
        F.sum(value_col).alias("t")
    ).collect()
    # offset type follows the summed column (see distributed_prefix_sum)
    off_type, zero = _sum_offset_type(df, value_col)
    acc: dict[tuple, object] = {}
    offsets = []

    def gkey(r):
        # NULL-safe ordering: a raw tuple key raises TypeError the
        # moment one group value is None next to a non-None one (NULL
        # groups are routine for real data — a language column with
        # undetected rows). (present, value) sorts NULLs first,
        # matching repartitionByRange's NULLS FIRST.
        return tuple((r[c] is not None, r[c]) for c in group_cols)

    for r in sorted(totals, key=lambda r: (gkey(r), r["__pid"])):
        g = tuple(r[c] for c in group_cols)
        offsets.append((r["__pid"], *g, acc.get(g, zero)))
        acc[g] = acc.get(g, zero) + (r["t"] if r["t"] is not None else zero)
    spark = df.sparkSession
    from pyspark.sql.types import IntegerType, StructField, StructType

    off_schema = StructType(
        [
            StructField("__pid", IntegerType()),
            *[StructField(c, df.schema[c].dataType) for c in group_cols],
            StructField("__off", off_type),
        ]
    )
    off_dim = spark.createDataFrame(offsets, off_schema)
    # NULL-safe join keys: a plain equi-join never matches NULL group
    # values, which would silently DROP every null-group row from the
    # output instead of prefix-summing it.
    renames = {"__pid": "__opid", **{c: f"__og_{c}" for c in group_cols}}
    off = off_dim
    for old, new in renames.items():
        off = off.withColumnRenamed(old, new)
    cond = F.col("__pid") == F.col("__opid")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__og_{c}"))
    return (
        local.join(F.broadcast(off), cond)
        .withColumn(out_col, F.col("__off") + F.col("__local"))
        .drop("__pid", "__off", "__local", *renames.values())
    )
