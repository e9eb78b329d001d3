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

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
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


# --- transformWithState (Spark 4 arbitrary-state API) ---------------------


def make_totals_processor():
    """Per-user running (count, sum) as a transformWithState processor —
    the same semantics as ``stream_user_totals`` on the newer API:
    typed ValueState (RocksDB-backed on a cluster, TTL-able), timers
    available for eviction logic, initial-state bootstrap supported.
    Imported lazily so batch code paths never load the state client."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            prior = self._totals.get() if self._totals.exists() else (0, 0.0)
            n, total = prior[0], prior[1]
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return TotalsProcessor()


def stream_user_totals_tws(events: DataFrame) -> DataFrame:
    """``stream_user_totals`` re-expressed on ``transformWithStateInPandas``
    (Spark 4's arbitrary-state successor to applyInPandasWithState).
    Emits updated per-user totals each micro-batch; drained
    available-now the final row per user equals the batch aggregate.

    The state server speaks protobuf, so this path needs the
    ``protobuf`` package at runtime (absent in the test sandbox — the
    equivalence test importorskips; on a real cluster it runs). The
    applyInPandasWithState twin above is the sandbox-verified form of
    the same semantics."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_totals_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# --- streaming MinHash sketch state ---------------------------------------

MINHASH_K = 8
MINHASH_SENTINEL = 1 << 62  # > any 60-bit hash
MINHASH_STATE = StructType(
    [StructField("sig", ArrayType(LongType()))]
)
MINHASH_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("seed", IntegerType()),
        StructField("minhash", LongType()),
    ]
)


def _md5_60(s: str) -> int:
    """60-bit integer from the first 15 hex chars of md5 — the same
    engine-replayable hash family the SimHash oracle uses (DuckDB:
    ('0x' || substring(md5(s), 1, 15))::BIGINT)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _update_minhash(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    sig = list(state.get[0]) if state.exists else [MINHASH_SENTINEL] * MINHASH_K
    for pdf in pdfs:
        # NULL props must be SKIPPED, not hashed as the string "None":
        # the oracle's md5(seed || ':' || props) is NULL on those rows
        # and min() ignores them — hashing a stringified null would
        # silently break the bit-equal contract. An all-null / empty
        # chunk contributes nothing (min over empty would raise).
        vals = [v for v in pdf["props"] if v is not None and not pd.isna(v)]
        if not vals:
            continue
        for s in range(MINHASH_K):
            batch_min = min(_md5_60(f"{s}:{v}") for v in vals)
            if batch_min < sig[s]:
                sig[s] = batch_min
    state.update((sig,))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * MINHASH_K,
            "seed": list(range(MINHASH_K)),
            "minhash": sig,
        }
    )


def stream_user_minhash(events: DataFrame) -> DataFrame:
    """Streaming per-user MinHash signature over the props strings each
    user emits: k 60-bit minima held in group state. MIN is commutative
    and idempotent, so the state is ORDER-INSENSITIVE across batches and
    restarts — the drained result is bit-equal to the batch group-by-min,
    which is what lets this custom stateful op carry a full value-hash
    DuckDB oracle (unlike order-sensitive state like EWMA, which is why
    the engine's EWMA ships as a batch lag chain instead). The per-user
    sketch is k longs regardless of event count — the behavioral-
    fingerprint building block for streaming user-similarity joins.

    Scale shape: state is O(k) per user; updates are per-batch set
    minima (the Python md5 here is the oracle-replayable family — a
    production fast path swaps xxhash64, same algebra)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_minhash,
        outputStructType=MINHASH_OUT,
        stateStructType=MINHASH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
