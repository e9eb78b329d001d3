"""Mergeable-sketch aggregation (DataSketches HLL / KLL / Theta via the
built-in Spark 4 functions) — the 100 TB pattern for distinct counts and
quantiles.

At scale you never answer "distinct users last quarter" by re-scanning a
quarter of raw events. You pre-aggregate a tiny mergeable sketch per
fine-grained cell (day × segment), persist those — kilobytes per cell —
and answer ANY coarser rollup (month, quarter, arbitrary segment set) by
merging sketches. Merging is associative and commutative, so it
partial-aggregates map-side like a sum: the shuffle carries sketches,
not ids. The estimate error is a fixed property of the sketch size
(HLL: ~1.6%/sqrt(2^lgK); KLL: rank error ~1.7% at k=200), independent
of data volume.

Everything here is a built-in JVM expression (``hll_sketch_agg``,
``kll_sketch_agg_double``, ``theta_sketch_agg`` — Spark 3.5+/4.x): no
UDF, full codegen, Tungsten binary sketch buffers.

Extends the reference's Kibana "unique count" aggregate surface
(SURVEY.md §2.D `agg_distinct`; the reference delegates cardinalities to
Elasticsearch, which itself answers them with the same HLL++ family)
to explicitly two-level, re-mergeable form.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lgK=12 → 2^12 registers → relative standard error ≈ 1.04/sqrt(4096)
# ≈ 1.6%; 4 KB per sketch. The right default trade for per-cell
# materialization at warehouse scale.
HLL_LGK = 12

# KLL k=200 → ~1.7% rank error, ~3 KB per sketch.
KLL_K = 200


def hll_cells(
    df: DataFrame, cell_cols: Sequence[str], value_col: str, lgk: int = HLL_LGK
) -> DataFrame:
    """Phase 1: one HLL sketch per fine-grained cell.

    The output (cell_cols…, sketch BINARY) is what a real pipeline
    persists daily: kilobytes per cell instead of the raw id stream.
    Map-side partial aggregation collapses each task's rows into one
    sketch per local cell before the (tiny) shuffle."""
    return df.groupBy(*cell_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )


def hll_rollup(
    cells: DataFrame, rollup_cols: Sequence[str], alias: str = "distinct_est"
) -> DataFrame:
    """Phase 2: merge cell sketches up to any coarser grain — no raw
    rescan. ``hll_union_agg`` is associative/commutative, so this also
    partial-aggregates; the answer for a quarter is the union of ~90
    4 KB day sketches per group."""
    return cells.groupBy(*rollup_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(True))
        ).alias(alias)
    )


def kll_cells(
    df: DataFrame, cell_cols: Sequence[str], value_col: str, k: int = KLL_K
) -> DataFrame:
    """One KLL(double) quantile sketch per cell — the mergeable form of
    a per-cell value distribution."""
    return df.groupBy(*cell_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias("sketch")
    )


def kll_rollup_quantiles(
    cells: DataFrame,
    rollup_cols: Sequence[str],
    probs: Sequence[float],
) -> DataFrame:
    """Merge per-cell KLL sketches to a coarser grain and read quantiles
    off the merged sketch. Output: rollup_cols… + q_<prob> double
    columns (dots stripped: q_50, q_95, …)."""
    merged = cells.groupBy(*rollup_cols).agg(
        F.kll_merge_agg_double(F.col("sketch")).alias("merged")
    )
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("merged"), F.lit(float(p))).alias(
            f"q_{int(round(p * 100)):02d}"
        )
        for p in probs
    ]
    return merged.select(*rollup_cols, *qcols)


def theta_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Theta-sketch distinct estimate per group. Theta sketches also
    support set algebra (union/intersection/difference across groups)
    downstream — the tool for 'users in BOTH segments' questions that
    HLL cannot answer."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_estimate(
            F.theta_sketch_agg(F.col(value_col))
        ).alias("distinct_est")
    )


def theta_segment_algebra(
    df: DataFrame,
    segment_col: str,
    value_col: str,
    seg_a: str,
    seg_b: str,
) -> DataFrame:
    """Audience overlap between two segments from their theta sketches
    — |A∪B|, |A∩B|, |A\\B|, |B\\A| estimated WITHOUT any join or
    re-scan: each segment aggregates once into a kilobyte sketch
    (map-side partial merge, like every sketch here), and the set
    algebra runs on the two sketch blobs in a 1-row projection. The
    question "how many users clicked but never purchased" at 100 TB
    becomes two persisted sketches and four scalar expressions."""
    sk = (
        df.filter(F.col(segment_col).isin(seg_a, seg_b))
        .groupBy(segment_col)
        .agg(F.theta_sketch_agg(F.col(value_col)).alias("sk"))
    )
    row = (
        sk.groupBy()
        .pivot(segment_col, [seg_a, seg_b])
        .agg(F.first("sk"))
        .withColumnRenamed(seg_a, "__a")
        .withColumnRenamed(seg_b, "__b")
    )
    return row.select(
        F.expr("theta_sketch_estimate(theta_union(__a, __b))").alias("union_est"),
        F.expr("theta_sketch_estimate(theta_intersection(__a, __b))").alias(
            "intersect_est"
        ),
        F.expr("theta_sketch_estimate(theta_difference(__a, __b))").alias(
            "a_minus_b_est"
        ),
        F.expr("theta_sketch_estimate(theta_difference(__b, __a))").alias(
            "b_minus_a_est"
        ),
    )


# --- Misra-Gries frequent items -------------------------------------------

def freq_items(df: DataFrame, item_col: str, k: int = 50) -> DataFrame:
    """Exact heavy hitters: every item whose frequency exceeds n/k,
    with its exact count — at sketch memory, not groupBy memory.

    Two phases:

    1. **Candidate generation** — a Misra-Gries(k) summary per
       partition (``mapInPandas``; O(k) memory per task regardless of
       per-partition cardinality — the point vs a plain groupBy whose
       hash table grows with distinct items). Any item with global
       frequency > n/(k+1) is guaranteed to survive in at least one
       partition's summary: if it missed every local summary its count
       would be bounded by sum(n_p/(k+1)) = n/(k+1). The per-item scan
       is a Python loop, justified here exactly because the bounded
       k-slot decrement semantics have no vectorized equivalent.
    2. **Exact verification** — the candidate union (<= partitions x k
       rows) broadcast-semi-joins the corpus; survivors get exact JVM
       counts; keep count > n/k. So the output is deterministic and
       SQL-equal to ``GROUP BY HAVING count > n/k`` while the full
       aggregation only ever runs on the candidate subset.

    Returns (item, n_occurrences), exact, for frequency > n/k.
    """
    from pyspark.sql import types as T

    # three consumers (candidates, total, exact counts): persist so an
    # expensive upstream (e.g. a token explode) computes once
    df = df.persist()
    cand_schema = T.StructType(
        [
            T.StructField("item", df.schema[item_col].dataType),
            T.StructField("lower_bound", T.LongType()),
        ]
    )

    def mg_partition(it):
        import pandas as pd

        slots: dict = {}
        for pdf in it:
            for v in pdf[item_col]:
                # Arrow->pandas renders nullable-numeric NULLs as NaN,
                # which `is None` misses: a NaN slot would trigger
                # decrements (weakening the survival bound vs the
                # null-excluding count(item_col) total) and can fail
                # the pandas->Arrow cast back to the item dtype.
                if v is None or (isinstance(v, float) and v != v):
                    continue
                if v in slots:
                    slots[v] += 1
                elif len(slots) < k:
                    slots[v] = 1
                else:
                    for key in list(slots):
                        slots[key] -= 1
                        if slots[key] == 0:
                            del slots[key]
        if slots:
            yield pd.DataFrame(
                {"item": list(slots), "lower_bound": list(slots.values())}
            )

    cand = (
        df.select(F.col(item_col).alias(item_col))
        .mapInPandas(mg_partition, cand_schema)
        .select(F.col("item").alias("__cand_item"))
        .distinct()
    )
    totals = df.select(F.count(item_col).alias("__n"))
    return (
        df.join(
            F.broadcast(cand), F.col(item_col) == F.col("__cand_item"), "left_semi"
        )
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .join(F.broadcast(totals))
        .filter(F.col("n_occurrences") * k > F.col("__n"))
        .select("item", "n_occurrences")
    )


def cms_estimates(
    df: DataFrame,
    item_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    probe_items: Sequence | None = None,
) -> DataFrame:
    """Count-min point-frequency estimates next to the exact truth.

    Builds ONE mergeable count-min sketch of ``item_col`` with Spark's
    built-in ``count_min_sketch`` aggregate (JVM, partial-aggregating:
    the shuffle carries width x depth counters — ~2.7 KB * depth at
    eps=0.001 — never items), then reads point estimates back through
    the JVM sketch reader (``CountMinSketch.readFrom``) for the probe
    items. CMS guarantees ``exact <= estimate <= exact + eps * N``
    with probability ``confidence``; cell-wise counter addition makes
    the sketch bit-identical under any partitioning, so the estimates
    are deterministic for a fixed seed.

    ``probe_items=None`` probes every distinct item — only sane for
    bounded-cardinality columns (the driver holds the probe list);
    pass an explicit list at corpus scale. Returns
    ``(item, exact, est, over)`` with ``over = est - exact >= 0``.

    Driver-side state: the sketch (KBs) + probe rows — bounded, no
    corpus data. This is the sketch family's answer to "how hot is
    THIS key?" (skew diagnosis, salting decisions) without a groupBy
    over all keys.
    """
    spark = df.sparkSession
    col = df.select(F.col(item_col).alias("item")).filter(F.col("item").isNotNull())
    sk = col.agg(
        F.expr(
            f"count_min_sketch(item, CAST({eps} AS DOUBLE), "
            f"CAST({confidence} AS DOUBLE), {seed})"
        ).alias("sk")
    ).collect()[0]["sk"]
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk)
    )
    exact = col.groupBy("item").agg(F.count(F.lit(1)).alias("exact"))
    if probe_items is not None:
        # Filter in Spark BEFORE collecting: with an explicit probe
        # list the driver must hold |probe| rows, not |distinct| —
        # the isin predicate also prunes the aggregate's shuffle.
        exact = exact.filter(F.col("item").isin(list(probe_items)))
    counts = {r["item"]: r["exact"] for r in exact.collect()}
    # Absent probe keys still get a row (exact=0): a cold key vs a
    # typo'd one must be distinguishable, and the sketch's overcount
    # on an absent key is exactly the collision signal a skew probe
    # wants to see.
    items = (
        list(dict.fromkeys(probe_items))
        if probe_items is not None
        else list(counts)
    )
    out = [
        (item, counts.get(item, 0), jcms.estimateCount(item)) for item in items
    ]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("item", df.schema[item_col].dataType),
            T.StructField("exact", T.LongType()),
            T.StructField("est", T.LongType()),
        ]
    )
    return (
        spark.createDataFrame(out, schema)
        .withColumn("over", F.col("est") - F.col("exact"))
        .orderBy("item")
    )
