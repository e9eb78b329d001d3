"""Table maintenance: small-file compaction.

Streaming ingest (foreachBatch upserts, per-trigger file sinks) and
fine-grained partitioning both breed small files; at 100 TB a table of
KB-sized parquet files destroys scan throughput (per-file open cost,
no row-group parallelism, starved vectorized reader). Compaction
rewrites a table to target-sized files — the engine-side analog of
OPTIMIZE on lakehouse formats.
"""

from __future__ import annotations

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
) -> int:
    """Rewrite a parquet table to ~target-sized files. ``sort_cols``
    additionally sorts within output files so parquet min/max stats
    become selective for those columns (cheap Z-order stand-in for a
    single sort dimension). Returns the output file count."""
    df, n_files = plan_compaction(spark, path, target_file_bytes)
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(out_path)
    return n_files
