"""Skew mitigation: salting for hot keys (SURVEY.md §7 scale stance).

A 100 TB corpus has hot keys — one ROME code covering a third of all
offers, one user generating most events. Know what Spark already
solves before salting (measured on a 50%-hot-key table,
docs/SCALING.md):

* algebraic aggregates (count/sum/min/max): map-side partial
  aggregation collapses the hot key to one row per task *before* the
  shuffle — plain ``groupBy`` beat the salted rewrite 3× in our
  measurement. Don't salt these.
* ``countDistinct``: Spark plans an Expand + two-phase aggregate;
  the explicit distinct-then-count rewrite was only ~15% faster.
* big-big skewed joins: AQE's skew-join split (on in session.py) is
  the first line.

Salting earns its keep where none of that applies: per-key state that
cannot partial-merge (``collect_list``, large window frames over a hot
key), and joins whose skewed side feeds a non-splittable stage. The
operators below implement both patterns; their results are exactly the
unsalted answers — verified against the DuckDB oracle like every other
op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, n_salts) derived from the
    whole row via xxhash64 — no RNG state, stable under retries
    (a nondeterministic salt breaks task re-execution)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg_count_sum(
    df: DataFrame, key: str, sum_col: Column, n_salts: int = 16,
    cnt_name: str = "cnt", sum_name: str = "total",
) -> DataFrame:
    """Two-stage salted count+sum per key.

    Stage 1 aggregates on (key, salt) — the hot key spreads over
    ``n_salts`` reduce tasks; stage 2 merges the (tiny) partials by key.
    Equivalent to ``groupBy(key).agg(count, sum)`` for any data.
    """
    partial = (
        with_salt(df, n_salts)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"), F.sum(sum_col).alias("__s"))
    )
    return partial.groupBy(key).agg(
        F.sum("__c").alias(cnt_name), F.sum("__s").alias(sum_name)
    )


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, big_key: str, small_key: str, n_salts: int = 16
) -> DataFrame:
    """Skew-proof big ⋈ small: salt the big side, replicate the small
    side across all salts, equi-join on (key, salt). The small side is
    broadcast anyway at these sizes, so replication is free; the join
    output never concentrates a hot key in one task."""
    salted_big = with_salt(big, n_salts)
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_big.join(
        F.broadcast(replicated),
        (salted_big[big_key] == replicated[small_key])
        & (salted_big["__salt"] == replicated["__salt"]),
    )
    return out.drop(salted_big["__salt"]).drop(replicated["__salt"])
