"""Time the round-7 probe set: the late-batch round-6 entries missing from SCALING.md plus this round's additions at sf0.01 vs sf0.1 (10x data) — the
scale-up evidence for docs/SCALING.md. Same protocol as
curation_probe.py: min-of-2 per (entry, sf), noop sink.

Run: python tools/r7_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_analyse_marche_emploi_spark import catalog  # noqa: E402
from data_analyse_marche_emploi_spark.session import get_spark  # noqa: E402

ENTRIES = [
    "sql_recursive_hierarchy",
    "udtf_chunk_overlap",
    "assoc_basket_pairs",
    "graph_triangle_count",
    "graph_clustering_coefficient",
    "pipeline_schema_evolution",
    "maintenance_compact_files",
    "dq_skew_report",
    "pipeline_partitioned_write_prune",
    "pipeline_orc_roundtrip",
    "seq_transition_matrix",
    "stream_src_rest_paged",
    "graph_pagerank",
    "graph_connected_components",
    "q_forecast_revenue",
    "tablelog_time_travel",
    "stream_txlog_merge_sink",
    "txlog_change_feed",
    "graph_clustering_coefficient",
    "text_html_strip",
    "dedup_url_normalized",
    "text_ngram_counts",
    "txlog_ivm_from_cdf",
    "pipeline_crawl_to_training",
    "stream_txlog_source",
    "join_asof_forward",
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
    for name in ENTRIES:
        a, b = (timed(spark, name, sf) for sf in SFS)
        print(
            f"{name:28s} sf0.01={a:6.2f}s sf0.1={b:6.2f}s ratio={b / a:4.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
