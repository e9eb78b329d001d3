"""Time the corpus-curation family at sf0.01 vs sf0.1 (10x documents)
— the scale-up evidence for docs/SCALING.md. One warm-up + timed run
per (entry, sf); noop-equivalent action (count after materialization).

Run: python tools/curation_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_analyse_marche_emploi_spark import catalog  # noqa: E402
from data_analyse_marche_emploi_spark.session import get_spark  # noqa: E402

ENTRIES = [
    "text_repetition",
    "text_decontaminate",
    "pii_redact",
    "mixture_stratified_sample",
    "mixture_token_budget",
    "docs_to_chunks",
    "chunks_to_sequences",
    "chunks_to_sequences_by_lang",
    "cap_docs_per_source",
    "agg_hll_rollup",
    "bpe_vocab",
    "dedup_window_exact",
    "dedup_embedding_lsh",
    "shuffle_training_order",
    "scd2_apply",
    "pipeline_training_sequences",
    "dedup_lines_global",
    "emb_kmeans",
    "multimodal_jpeg",
]

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def timed(spark, name: str, sf: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        catalog.QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark()
    spark.conf.set("spark.sql.showConsoleProgress", "false")
    rows = {}
    for name in ENTRIES:
        rows[name] = [timed(spark, name, sf) for sf in SFS]
        a, b = rows[name]
        print(f"{name:28s} sf0.01={a:6.2f}s sf0.1={b:6.2f}s ratio={b / a:4.1f}x",
              flush=True)


if __name__ == "__main__":
    main()
