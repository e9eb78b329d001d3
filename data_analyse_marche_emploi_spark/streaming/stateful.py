"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.F — the extension point for stateful logic the built-in
windows can't express; reference has none, but its run-metrics
accumulation (ingestion-elasticsearch.py:291-313) is this shape done
by hand on the driver).

Per-key arbitrary state lives in the state store (RocksDB/HDFS-backed
on a cluster), is updated per micro-batch from Arrow-batched pandas
frames, and survives restarts via the checkpoint. The demo operator
maintains per-user running event counts and value sums — the live
version of ``agg_groupby_count`` + a sum, with explicit state instead
of a streaming aggregate, so it generalizes to logic aggregates can't
do (decaying counters, per-key ML state, fraud windows, …).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stream_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum(value)) with explicit group state.
    Emits the updated totals for every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
