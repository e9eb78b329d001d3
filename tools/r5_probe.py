"""Round-5 scale evidence for docs/SCALING.md:

1. 10× document ratios (sf0.01 → sf0.1) for the entries whose plans
   changed this round (tf-idf join topology, window-dedup owner,
   hash-keyed line dedup) plus the streaming drain.
2. Hot-window skew fixture: every doc shares one boilerplate k-token
   window — the pathology the groupBy-min owner defends against.
   A/Bs the shipped owner against the r3 partition-window form.
3. Line-dedup key-mode A/B (hash default vs text oracle form).

Run: python tools/r5_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from data_analyse_marche_emploi_spark import catalog  # noqa: E402
from data_analyse_marche_emploi_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
ENTRIES = [
    "text_tf_idf",
    "dedup_window_exact",
    "dedup_lines_global",
    "stream_dedup_upsert",
]


def bench(thunk, repeats=3) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    return best


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def skewed_docs(spark, n_docs=50_000, boiler_tokens=16, tail_tokens=16):
    """Every doc = the SAME boilerplate prefix + a unique tail: one
    window hash is shared by all n_docs documents."""
    boiler = " ".join(f"b{j}" for j in range(boiler_tokens))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " "),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"t{j}_"), F.col("id").cast("string"))
                    for j in range(tail_tokens)
                ],
            ),
        ).alias("text"),
    )


def window_owner_variants(docs):
    """The shipped groupBy-min owner vs the r3 partition-window owner,
    both over the same window-hash stream."""
    from pyspark.sql import Window

    from data_analyse_marche_emploi_spark.operators.dedup import (
        explode_window_hashes,
    )

    w = explode_window_hashes(
        docs.select(F.col("doc_id").alias("__id"), "text"), "text", 16, "__wh"
    )

    owned = (
        w.groupBy("__wh")
        .agg(F.min("__id").alias("__owner"))
        .groupBy("__owner")
        .agg(F.count(F.lit(1)).alias("n_owned"))
    )
    shipped = (
        w.groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .join(owned, F.col("__id") == F.col("__owner"), "left")
        .select(
            "__id",
            "n_windows",
            (F.col("n_windows") - F.coalesce("n_owned", F.lit(0))).alias(
                "n_dup_windows"
            ),
        )
    )
    win = Window.partitionBy("__wh")
    r3_form = (
        w.withColumn("__owner", F.min("__id").over(win))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(
                F.when(F.col("__owner") < F.col("__id"), 1).otherwise(0)
            ).alias("n_dup_windows"),
        )
    )
    return shipped, r3_form


def main() -> None:
    spark = get_spark(
        "r5-probe",
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    noop(spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count())

    print("== 10x document ratios (sf0.01 -> sf0.1) ==")
    for name in ENTRIES:
        t1 = bench(lambda: noop(catalog.QUERIES[name](spark, SFS[0])))
        t10 = bench(lambda: noop(catalog.QUERIES[name](spark, SFS[1])))
        print(f"{name}: {t1:.2f}s -> {t10:.2f}s  ratio {t10 / t1:.1f}x")

    print("== hot-window skew fixture (50k docs, one shared window) ==")
    docs = skewed_docs(spark)
    docs.write.mode("overwrite").parquet(".scale_test/skewed_docs.parquet")
    sdocs = spark.read.parquet(".scale_test/skewed_docs.parquet")
    shipped, r3_form = window_owner_variants(sdocs)
    t_shipped = bench(lambda: noop(shipped))
    t_window = bench(lambda: noop(r3_form))
    print(f"groupBy-min owner (shipped): {t_shipped:.2f}s")
    print(f"partition-window owner (r3): {t_window:.2f}s")
    print(f"window/shipped ratio: {t_window / t_shipped:.1f}x")

    print("== line-dedup key modes at sf0.1 ==")
    from data_analyse_marche_emploi_spark.operators.dedup import line_dedup_global

    d = spark.read.parquet(f"{SFS[1]}/documents.parquet").repartition(32)
    t_hash = bench(lambda: noop(line_dedup_global(d, "text", "doc_id", 8, "hash")))
    t_text = bench(lambda: noop(line_dedup_global(d, "text", "doc_id", 8, "text")))
    print(f"hash keys (default): {t_hash:.2f}s   text keys (oracle): {t_text:.2f}s")


if __name__ == "__main__":
    main()
