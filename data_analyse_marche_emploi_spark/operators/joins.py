"""Join operators (SURVEY.md §2.E).

The reference joins only in Python: filtering the ``departements`` dim by
a region key (ingestion-elasticsearch.py:148) and implicitly enriching
offers with referentiel labels downstream. Both are **broadcast hash
joins** in the engine — the dims (13 regions / ~101 départements / ~500
ROME codes; here region/nation) are tiny, so the fact side never
shuffles: each of the 1000 executors gets the dim in memory and streams
its partitions through. An explicit ``F.broadcast`` hint pins the
strategy independent of autoBroadcastJoinThreshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_dim_containment(
    fact: DataFrame, dim: DataFrame, on: Column, how: str = "left_semi"
) -> DataFrame:
    """Containment filter as a broadcast semi-join (reference:
    ``[d for d in departements if d['region']['code'] == code]``,
    ingestion-elasticsearch.py:148)."""
    return fact.join(F.broadcast(dim), on, how)


def join_enrich(fact: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """Enrich facts with dimension labels (reference: implied
    offres × métier/commune labels — export-offres-csv.conf:6,20).
    Broadcast: the fact side keeps its partitioning, no shuffle."""
    return fact.join(F.broadcast(dim), on, how)


def join_anti(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — facts with no match (engine surface beyond the
    reference; Spark gives it for free once join is first-class)."""
    return left.join(right, on, "left_anti")
