"""Window-function operators — ranking, running totals, sessionization.

Absent from the reference (SURVEY.md §2.D "absent" list) but part of the
engine's first-class analytic surface; Kibana-style "top N per group"
dashboards need them the moment slicing goes beyond global top-k.

Scale notes: a window over ``partitionBy(k)`` shuffles once on ``k`` and
sorts within partitions — no global sort. Skewed partition keys are the
risk at 100 TB; AQE skew handling does not apply inside window exchanges,
so choose partition keys with bounded group size (here: supplier, user).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(df: DataFrame, part: str, order: Column, k: int) -> DataFrame:
    """Top-k rows per group via row_number — the distributed top-N
    pattern (one shuffle on the group key, per-group in-memory sort)."""
    w = Window.partitionBy(part).orderBy(order)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def running_sum(df: DataFrame, part: str, order: str, val: Column, alias: str) -> DataFrame:
    """Cumulative sum within group, ordered — rows-frame window."""
    w = (
        Window.partitionBy(part)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(val).over(w))


def sessionize(df: DataFrame, user: str, ts: str, gap_minutes: int) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. The classic lag → gap-flag →
    cumulative-sum composition; one shuffle on the user key."""
    w = Window.partitionBy(user).orderBy(ts)
    gap_sec = gap_minutes * 60
    prev_ts = F.lag(F.col(ts)).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev_ts)) > gap_sec)
    ).cast("int")
    return df.withColumn("session_seq", F.sum(new_session).over(w))
