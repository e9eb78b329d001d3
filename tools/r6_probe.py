"""Time the round-6 additions at sf0.01 vs sf0.1 (10x data) — the
scale-up evidence for docs/SCALING.md. Same protocol as
curation_probe.py: min-of-2 per (entry, sf), noop sink.

Run: python tools/r6_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_analyse_marche_emploi_spark import catalog  # noqa: E402
from data_analyse_marche_emploi_spark.session import get_spark  # noqa: E402

ENTRIES = [
    "q_waiting_suppliers",
    "q_promo_part_suppliers",
    "q_pareto_frontier",
    "global_quantile_bands",
    "ts_ohlc",
    "ts_interpolate",
    "ts_rolling_distinct",
    "text_bm25",
    "dq_outliers_mad",
    "merge_upsert_delete",
    "dedup_prefix_filter",
    "stream_ohlc",
    "json_variant_extract",
    "agg_weighted_median",
    "ivm_incremental_agg",
    "pipeline_gzip_ndjson_ingest",
    "agg_string_concat",
    "q_revenue_share",
    "dedup_edit_distance",
    "str_fold_accents",
    "agg_cms_counts",
    "join_bucketed_no_shuffle",
    "join_null_safe",
    "agg_conditional",
    "agg_arg_max",
    "xml_extract",
    "multimodal_features",
    "join_scd2_point_in_time",
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
