"""Bucketed tables — the shuffle-elimination path for fact-fact joins.

The reference never joins two large collections (its one fact table
lives in Elasticsearch; dims are driver-side lists), but the engine's
100 TB target makes ``lineitem ⋈ orders`` the dominant cost: both sides
hash-partition on the order key at query time — two full shuffles of
the big tables per join (see catalog.join_fact_fact).

Writing both tables bucketed by the join key removes those shuffles
permanently: ``bucketBy(n, key)`` + ``sortBy(key)`` gives a
co-partitioned, pre-sorted layout, and Catalyst plans a sort-merge join
with **no Exchange** on either side (verified in
tests/test_sources_streaming.py by inspecting the physical plan).
Bucket counts should be sized so one bucket of the larger table fits an
executor core's memory — at 100 TB of lineitem, O(10k) buckets.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table (bucket pruning +
    shuffle-free joins/aggregations on ``bucket_col``)."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # A fresh metastore (each local session gets its own Derby)
        # can find a stale location left by a previous session's
        # write — saveAsTable refuses to adopt it
        # (LOCATION_ALREADY_EXISTS), so clear the orphaned directory.
        # Local-path handling only: a real deployment keeps one
        # shared catalog and never hits this.
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        path = os.path.join(wh.removeprefix("file:"), table.lower())
        if os.path.isdir(path):
            shutil.rmtree(path)
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys — plans
    as an Exchange-free sort-merge join."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
