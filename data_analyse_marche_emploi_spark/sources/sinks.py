"""File sinks (SURVEY.md §2.A: snk_csv, ddl_truncate_recreate).

The reference's Logstash CSV sink writes a fixed, ordered field list
with ``,`` separator to a shared volume (export-offres-csv.conf:18-26,
csv-tech.conf:45-53, docker-compose.yml:52); its Elasticsearch "sink"
is truncate-recreate with keyed upsert (ingestion-elasticsearch.py:
36-55, :253-262 — owned by operators.ingest).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    fields: Sequence[str],
    sep: str = ",",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """CSV sink with explicit sink-side column order (reference:
    ``fields => [...]``, csv-tech.conf:45-53).

    ``single_file=True`` coalesces to one part-file for byte-level
    parity with the reference's single CSV; leave False at scale —
    one file per task is the distributed-write fast path.
    """
    out = df.select(*fields)
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", sep)
        # Pin timestamp rendering so CSV bytes don't depend on cluster conf.
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str] = (), mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink — the engine's scale-out layout: query
    predicates on ``partition_cols`` prune whole directories at plan
    time (the Spark analog of the reference's per-region/département
    scan decomposition, ingestion-elasticsearch.py:146-151)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
