"""Table maintenance: small-file compaction.

Streaming ingest (foreachBatch upserts, per-trigger file sinks) and
fine-grained partitioning both breed small files; at 100 TB a table of
KB-sized parquet files destroys scan throughput (per-file open cost,
no row-group parallelism, starved vectorized reader). Compaction
rewrites a table to target-sized files — the engine-side analog of
OPTIMIZE on lakehouse formats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[DataFrame, int]:
    """Read ``path`` and size the output file count from the table's
    actual on-disk bytes (sum of parquet part sizes), not row counts —
    compression ratio is data-dependent. Returns (df, n_files)."""
    import glob
    import os

    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    return spark.read.parquet(path), n_files


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    row_group_bytes: int | None = None,
) -> int:
    """Rewrite a parquet table to ~target-sized files. ``sort_cols``
    range-partitions AND sorts the rewrite on those columns, so both
    file-level and row-group-level parquet min/max stats become
    selective for them (cheap Z-order stand-in for a single sort
    dimension; round-robin placement would leave every FILE spanning
    the full key range and only tighten row groups within files).
    ``row_group_bytes`` overrides the writer's row-group size
    (``parquet.block.size``) — smaller row groups mean finer skipping
    granularity at the cost of footer size and compression ratio.
    Returns the output file count."""
    df, n_files = plan_compaction(spark, path, target_file_bytes)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    writer = out.write.mode("overwrite")
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(out_path)
    return n_files


# ---------------------------------------------------------------------------
# Z-order (Morton) layout: multi-column data skipping.
# ---------------------------------------------------------------------------
# A single-column sort makes parquet min/max stats selective for ONE
# column; queries filtering the second key still read every file.
# Interleaving the bits of both keys (Morton/Z curve) clusters rows so
# EVERY file covers a narrow range of EACH key — predicates on either
# (or both) columns prune files/row-groups by footer stats alone. This
# is the engine-side analog of lakehouse OPTIMIZE ZORDER BY, built from
# pure Column expressions: rank-free min/max bucketing (two scalar
# aggregates, broadcast), bit interleave via shift/mask, then
# repartitionByRange + sortWithinPartitions on the z-value.

from pyspark.sql import Column, functions as F

_Z_BITS = 16  # 16 bits/key -> 32-bit z-value for 2 keys


def _spread_bits(x: Column) -> Column:
    """Spread a 16-bit int's bits to even positions (Morton helper),
    the classic shift/mask ladder as JVM bitwise expressions."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zvalue(a16: Column, b16: Column) -> Column:
    """Interleave two 16-bit bucket ids into one 32-bit Morton code."""
    return _spread_bits(a16).bitwiseOR(F.shiftleft(_spread_bits(b16), 1))


def zorder_cluster(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int,
) -> DataFrame:
    """Return ``df`` re-laid-out as ``n_files`` z-ordered partitions
    clustered on (col_a, col_b) — the write-free core shared by
    :func:`zorder_write` and the txlog table's ``optimize(zorder=...)``.

    Buckets each key to 16 bits by min/max normalization — two scalar
    aggregates (one broadcast row), no global rank/window — so the
    layout step costs one range shuffle regardless of scale. Skew in the
    value distribution degrades bucket balance, not correctness; for
    heavily skewed keys substitute approx-quantile bucket boundaries."""
    stats = df.agg(
        F.min(col_a).alias("a_min"), F.max(col_a).alias("a_max"),
        F.min(col_b).alias("b_min"), F.max(col_b).alias("b_max"),
    )
    top = F.lit((1 << _Z_BITS) - 1)

    def bucket(c: Column, lo: Column, hi: Column) -> Column:
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1)).cast("double")
        return F.least(
            top, F.floor((c - lo).cast("double") / span * top).cast("bigint")
        )

    with_z = (
        df.join(F.broadcast(stats))
        .withColumn(
            "__z",
            zvalue(
                bucket(F.col(col_a), F.col("a_min"), F.col("a_max")),
                bucket(F.col(col_b), F.col("b_min"), F.col("b_max")),
            ),
        )
        .drop("a_min", "a_max", "b_min", "b_max")
    )
    return (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_write(
    df: DataFrame,
    out_path: str,
    col_a: str,
    col_b: str,
    n_files: int,
) -> None:
    """Write ``df`` as ``n_files`` z-ordered parquet files clustered on
    (col_a, col_b) — see :func:`zorder_cluster` for the layout rules."""
    zorder_cluster(df, col_a, col_b, n_files).write.mode("overwrite").parquet(
        out_path
    )


def snapshot_diff(
    cur: DataFrame,
    prev: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots of a keyed table: which keys were
    ``added``, ``removed``, or ``changed`` — the audit step between
    ingest runs (the reference re-ingests the full corpus each run;
    this is how a 100 TB deployment verifies what an incremental upsert
    actually did).

    Each side reduces map-side to ``(key, xxhash64(compare_cols))`` —
    the full-outer join shuffles one 8-byte hash per row, never the
    payload. Unchanged keys are dropped. Hash equality stands in for
    column equality (~rows²/2⁶⁴ false-unchanged odds, the repo-wide
    trade); pass explicit ``compare_cols`` to scope the comparison, or
    ``[]`` for a presence-only diff (added/removed, never changed).

    The hash interleaves a per-column isnull flag with each value:
    Spark's xxhash64 *skips* NULL arguments, so without the flags a
    value moving between nullable columns — ('x', NULL) vs (NULL, 'x')
    — hashes identically and the change is deterministically invisible
    (not 2⁻⁶⁴-unlikely). The flags pin each value to its position.
    """
    compare = (
        compare_cols
        if compare_cols is not None
        else [c for c in cur.columns if c not in key_cols]
    )
    if compare:
        hashed = [F.isnull(F.col(c)).cast("int") for c in compare]
        row_hash = F.xxhash64(
            *[x for c, flag in zip(compare, hashed) for x in (flag, F.col(c))]
        )
    else:
        row_hash = F.lit(0)  # presence-only: every matched key is 'unchanged'
    a = cur.select(*key_cols, row_hash.alias("__ha"))
    b = prev.select(*key_cols, row_hash.alias("__hb"))
    j = a.join(b, key_cols, "full_outer")
    status = (
        F.when(F.col("__hb").isNull(), F.lit("added"))
        .when(F.col("__ha").isNull(), F.lit("removed"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select(*key_cols, "status")
    )


def merge_apply(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """ANSI ``MERGE`` semantics in one pass: ``source`` rows carry
    ``op_col`` in {'upsert', 'delete'};

    * matched + 'upsert'  -> target row REPLACED by the source row
    * matched + 'delete'  -> target row REMOVED
    * unmatched 'upsert'  -> source row INSERTED
    * target rows matching no source key pass through unchanged

    Plan: ONE anti-join of target against the source keys (both
    upserts and deletes knock the old row out) plus the filtered
    upsert rows unioned back — no window, no full-outer join, no
    per-key sort; at scale it is a single equi-shuffle on ``keys``
    (or a broadcast when the changeset is small, which is the common
    shape: a big table merged with a day's delta). Contract: source
    keys are unique (MERGE's own requirement — enforce upstream with
    dedup_union_by_id); duplicate source keys would fan out inserts.

    Output schema = target schema (``op_col`` dropped).
    """
    changed_keys = source.select(*keys).distinct()
    kept = target.join(changed_keys, keys, "left_anti")
    upserts = source.filter(F.col(op_col) == "upsert").drop(op_col)
    return kept.unionByName(upserts.select(*target.columns))


def bucketed_join_status_revenue(spark, orders, lineitem, n_buckets: int = 8):
    """Write orders+lineitem bucketed by order key, then join them
    shuffle-free and aggregate: the canonical co-located fact-fact
    join. Returns the joined aggregate; the join stage must show NO
    Exchange under the SortMergeJoin (pinned by
    tests/test_plan_quality.py::test_bucketed_join_has_no_exchange).

    Table names carry a digest of BOTH inputs' source files so
    entries built against different source dirs (sf0.01 vs sf0.1)
    never alias each other's tables — a lazy DataFrame from an
    earlier build must not silently re-read a later build's data.
    (The logical-plan string is NOT a usable identity here: for a
    parquet read it renders path-free, so every build would hash to
    the same tag.)"""
    import hashlib

    from ..sources.bucketing import write_bucketed

    from . import aggregates as AGG

    o_files, l_files = orders.inputFiles(), lineitem.inputFiles()
    if not o_files or not l_files:
        raise ValueError(
            "bucketed join requires file-backed inputs: inputFiles() is "
            "empty, so the table tag would collapse to a constant and "
            "different datasets would alias each other's bucketed tables"
        )
    tag = hashlib.md5(
        ("|".join(sorted(o_files)) + "||" + "|".join(sorted(l_files))).encode()
    ).hexdigest()[:8]
    write_bucketed(
        orders.select("o_orderkey", "o_orderstatus"),
        f"b_orders_{tag}",
        "o_orderkey",
        n_buckets,
    )
    write_bucketed(
        lineitem.select("l_orderkey", "l_extendedprice"),
        f"b_lineitem_{tag}",
        "l_orderkey",
        n_buckets,
    )
    bo = spark.table(f"b_orders_{tag}")
    bl = spark.table(f"b_lineitem_{tag}")
    joined = bl.hint("merge").join(
        bo.hint("merge"), bl["l_orderkey"] == bo["o_orderkey"]
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        AGG.money_sum(F.col("l_extendedprice"), "revenue"),
    )
