"""Aggregation operators (SURVEY.md §2.D).

The reference computes only a count itself (ES ``_count``,
ingestion-elasticsearch.py:298-301); the richer analytic surface is
delegated to Kibana terms/date-histogram/top-N aggregations over the
offers index (README.md:8-9). The engine owns all of them natively.

Scale notes: every group-by here is a Spark hash aggregate with
map-side partial aggregation (`HashAggregate(partial) → Exchange →
HashAggregate(final)`) — the same per-shard/reduce split Elasticsearch
would have done. Top-k compiles to `TakeOrderedAndProject` (per-partition
heap, no global sort). Exact money sums cast to DECIMAL first: exact,
associative, and therefore deterministic under any partitioning — a
prerequisite for cross-engine reproducibility at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2-decimal money stored as double → exact decimal before SUM so results
# are independent of partition/merge order (bit-stable at any parallelism).
MONEY = "decimal(18,2)"


def money_sum(col: Column, alias: str) -> Column:
    """Exact DECIMAL(18,2) accumulation (order-independent under partial
    aggregation), emitted as round(double, 2): the sum is an exact
    multiple of 0.01, so rounding to the accumulator's own scale snaps
    both engines to the identical double even where one engine's
    decimal→double cast is off by an ulp. DECIMAL output itself is not
    portable across result canonicalizers (Decimal vs pandas)."""
    return F.round(F.sum(col.cast(MONEY)).cast("double"), 2).alias(alias)


def exact_sum(dec_col: Column, alias: str, scale: int) -> Column:
    """Sum an already-exact decimal expression (e.g. price*(1-discount),
    scale 4) and emit round(double, scale) — same portability contract
    as money_sum for non-2-scale accumulators."""
    return F.round(F.sum(dec_col).cast("double"), scale).alias(alias)


def money_avg(col: Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum → double, divided by the
    exact count (IEEE division is order-free). round(6) because the
    quotient is not a finite decimal; both engines round the same
    correctly-rounded-division result."""
    return F.round(
        F.sum(col.cast(MONEY)).cast("double") / F.count(col), 6
    ).alias(alias)


def agg_count_total(df: DataFrame) -> DataFrame:
    """Collection cardinality (reference: ES ``_count`` probe,
    ingestion-elasticsearch.py:298-301). For Parquet sources Spark
    answers `count(*)` from footer metadata without scanning data."""
    return df.agg(F.count(F.lit(1)).alias("total"))


def agg_groupby_count(df: DataFrame, *keys: str) -> DataFrame:
    """Offers-per-code terms aggregation (reference: implied Kibana terms
    agg over romeCode/codeNAF — SURVEY.md §2.D)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def agg_date_histogram(df: DataFrame, ts: Column, unit: str = "month") -> DataFrame:
    """Volume-over-time (reference: implied Kibana date_histogram on
    ``dateActualisation``). Truncated timestamp cast to date for a
    timezone-free, engine-portable bucket key."""
    return (
        df.groupBy(F.date_trunc(unit, ts).cast("date").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def agg_topk(df: DataFrame, key: str, k: int) -> DataFrame:
    """Top-N terms (reference: implied Kibana top-N). Deterministic
    tiebreak on the key so the result set is stable; Spark plans the
    sort+limit as partial top-k (`TakeOrderedAndProject`), never a full
    global sort."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(k)
    )


def agg_distinct(df: DataFrame, col: str) -> DataFrame:
    """Exact distinct cardinality (reference: implied Kibana dashboard
    filters — SURVEY.md §2.D)."""
    return df.agg(F.countDistinct(col).alias("n_distinct"))


def agg_approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path, where exact distinct's
    shuffle of every key is the bottleneck. Not oracle-comparable
    (estimator differs per engine) → rows-only check."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("n_distinct_approx"))


def exact_median_2pass(
    df: DataFrame,
    key: str,
    val: str,
    bucket_width: int = 1_000_000,
    values_are_int: bool = False,
) -> DataFrame:
    """EXACT per-group median (percentile_disc(0.5): the value at rank
    ceil(n/2) in value order) without a global sort — the selection
    problem done scale-right.

    ``percentile()``-style exact aggregation buffers every value of a
    group in one aggregation buffer (OOM on a billion-row group), and a
    global sort is a full shuffle of the fact table. This is the
    classic two-pass bucket refinement instead:

    1. **Histogram pass**: values 1e-6-floor-bucket to int64 micro-units
       (``v6``), then coarse-bucket by ``bucket_width``; one partial-
       aggregated count per (group, bucket). The histogram is
       ``groups × value_range/bucket_width`` rows — BOUNDED by the
       value domain, not the row count — and is the only thing
       collected to the driver.
    2. **Refinement pass**: the driver walks each group's cumulative
       histogram to find the bucket holding the target rank, then ONE
       filtered scan keeps only rows in that bucket per group (a
       broadcast join against a groups-sized table) and a per-group
       window over that small slice picks the exact in-bucket rank.

    Two fact scans, no sort wider than one bucket's residents, driver
    state = the bounded histogram. Returns ``(key, median6)``.

    ``values_are_int``: the column is already an exact int64 domain
    (e.g. micro-unit deviations) — selected AS IS, no 1e-6 scaling.
    A caller must NOT divide such a column by 1e6 to feed the default
    mode: ``floor((d/1e6)*1e6) != d`` for ~2% of int64 values (249 ->
    248), which silently shifts the selected rank value by one unit.
    """
    out = exact_percentiles_2pass(
        df, key, val, [0.5], bucket_width, values_are_int=values_are_int
    )
    return out.select(key, F.col("value6").alias("median6"))


def exact_percentiles_2pass(
    df: DataFrame,
    key: str,
    val: str,
    ps: list[float],
    bucket_width: int = 1_000_000,
    values_are_int: bool = False,
) -> DataFrame:
    """EXACT per-group percentile_disc for a LIST of percentiles in the
    same two passes as :func:`exact_median_2pass` (whose docstring
    carries the full scale analysis): one bounded histogram collect,
    then one refinement scan — every requested percentile's bucket
    joins in the same pass, so cost is independent of ``len(ps)``.

    Rank semantics mirror percentile_disc exactly: the smallest rank r
    with ``r/n >= p`` under DOUBLE comparison (cume_dist is a double in
    every engine, so a float-exact boundary like p=0.25, n=4 picks rank
    1, not 2). Returns ``(key, p, value6)``.

    This is the weight ≡ 1 specialization of
    :func:`exact_weighted_percentiles_2pass` — ONE implementation of
    the histogram walk and refinement serves both, so a fix lands in
    both selection paths (rank r == cumulative unit-weight r, and
    "min qualifying value" equals "value at rank r" because every row
    at an earlier rank has an equal-or-smaller value).
    """
    return exact_weighted_percentiles_2pass(
        df, key, val, None, ps, bucket_width, values_are_int=values_are_int
    )


def exact_weighted_percentiles_2pass(
    df: DataFrame,
    key: str,
    val: str,
    weight: str | None,
    ps: list[float],
    bucket_width: int = 1_000_000,
    values_are_int: bool = False,
) -> DataFrame:
    """EXACT per-group (optionally WEIGHTED) percentile_disc — the
    smallest value v whose cumulative weight fraction (in value order)
    reaches p — via two bounded passes, no per-group total order:

    1. **Histogram pass**: values 1e-6-floor-bucket to int64 micro-
       units (or pass through when ``values_are_int``), coarse-bucket
       by ``bucket_width``; one partial-aggregated WEIGHT sum per
       (group, bucket). The histogram is ``groups x value_range /
       bucket_width`` rows — bounded by the value domain, not the row
       count — and is the only thing collected to the driver.
    2. **Refinement pass**: the driver walks each group's cumulative
       weights to the bucket holding the integer target
       ``T = min{c : c/W >= p}`` (DOUBLE compare, so the boundary
       behavior equals SQL cume_dist) and broadcasts (bucket,
       remaining-weight) back; an in-bucket cumulative-weight window
       over just that bucket's residents takes the MIN qualifying
       value — stable under any tie order inside an equal-value run,
       and by T's minimality ``{cum >= T}`` is exactly
       ``{cum/W >= p}``.

    ``weight=None`` means unit weights (plain percentile_disc).
    Weight contract: the column must be an INTEGRAL type (fractional
    weights would reintroduce float-sum order dependence — rejected
    loudly, not truncated) and NON-NEGATIVE (a negative weight makes
    the cumulative walk non-monotone: silently dropped rows, or a
    nonterminating driver walk on a negative group total — checked
    from the collected histogram's per-bucket minima at zero extra
    shuffle cost). NULL/NaN values are MISSING — their weight never
    enters W; NULL weights count as 0; a group with no weighted value
    mass still emits its (key, p, NULL) rows like SQL GROUP BY.

    Returns ``(key, p, value6)``.
    """
    if not ps:
        raise ValueError("ps must name at least one percentile")
    if len(set(ps)) != len(ps):
        # a duplicate p doubles the joined bucket residents inside one
        # window partition and silently selects the WRONG rank
        raise ValueError(f"duplicate percentiles in {ps}")
    bad = [p for p in ps if not 0.0 < p <= 1.0]
    if bad:
        # p > 1 would walk past every bucket and silently drop the row
        raise ValueError(f"percentiles must be in (0, 1]: {bad}")
    spark = df.sparkSession
    if weight is None:
        w_col = F.lit(1).cast("long")
    else:
        wtype = df.schema[weight].dataType.simpleString()
        if wtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weight column {weight!r} must be integral, got {wtype}"
            )
        w_col = F.coalesce(F.col(weight).cast("long"), F.lit(0))
    # NULL / NaN values are MISSING, exactly as percentile_disc treats
    # them: they join the histogram as a null bucket (never compared or
    # walked), don't count toward W, and a group with no real value at
    # all still emits its (key, NULL) rows like SQL GROUP BY would.
    # Without this, a single NULL crashed the driver walk (None < int)
    # and NaN diverged between engines (Spark casts NaN→0, DuckDB
    # errors) — the one-bad-row-kills-the-job class.
    if values_are_int:
        # exact int64 domain: select as is (isnan() rejects longs)
        v6 = F.when(F.col(val).isNotNull(), F.col(val).cast("long"))
    else:
        v6 = F.when(
            F.col(val).isNotNull() & ~F.isnan(F.col(val)),
            F.floor(F.col(val) * 1e6).cast("long"),
        )
    b = df.select(
        F.col(key).alias("__k"), v6.alias("__v6"), w_col.alias("__w")
    ).withColumn("__bkt", F.floor(F.col("__v6") / bucket_width).cast("long"))
    hist = (
        b.groupBy("__k", "__bkt")
        .agg(F.sum("__w").alias("w"), F.min("__w").alias("wmin"))
        .collect()
    )
    neg = [r for r in hist if r["wmin"] is not None and r["wmin"] < 0]
    if neg:
        raise ValueError(
            f"negative weights in {len(neg)} histogram cell(s), e.g. "
            f"group {neg[0]['__k']!r}: weighted selection requires "
            "non-negative weights"
        )
    from collections import defaultdict

    per_key: dict = defaultdict(list)
    for r in hist:
        per_key[r["__k"]].append((r["__bkt"], r["w"]))
    import math

    def disc_target(W: int, p: float) -> int:
        # min integer c with c/W >= p under DOUBLE compare (cume_dist
        # math; with unit weights this is exactly the rank r)
        c = max(1, math.ceil(W * p))
        while c > 1 and (c - 1) / W >= p:
            c -= 1
        while c / W < p:
            c += 1
        return c

    targets = []  # (key, p, bucket, remaining weight inside bucket)
    empty_keys = []  # groups whose every value is missing / weightless
    for k, buckets in per_key.items():
        real = sorted((bkt, w) for bkt, w in buckets if bkt is not None)
        W = sum(w for _, w in real)
        if W == 0:
            empty_keys.append(k)
            continue
        for p in ps:
            T = disc_target(W, p)
            cum = 0
            for bkt, w in real:
                if cum + w >= T:
                    targets.append((k, float(p), bkt, T - cum))
                    break
                cum += w
    key_type = df.schema[key].dataType.simpleString()
    tgt = spark.createDataFrame(
        targets, f"__k {key_type}, p double, __bkt long, __rem long"
    )
    from pyspark.sql import Window

    # partition includes p: two percentiles landing in the same bucket
    # each join their own copy of the residents and walk independently
    w_cum = (
        Window.partitionBy("__k", "__bkt", "p")
        .orderBy("__v6")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    refined = (
        # null-SAFE key equality: a NULL group key must keep its rows
        # through the refinement join (plain `=` drops the group)
        b.join(
            F.broadcast(tgt),
            b["__k"].eqNullSafe(tgt["__k"]) & (b["__bkt"] == tgt["__bkt"]),
        )
        .drop(tgt["__k"])
        .drop(tgt["__bkt"])
        .withColumn("__cw", F.sum("__w").over(w_cum))
        .filter(F.col("__cw") >= F.col("__rem"))
        .groupBy("__k", "p")
        .agg(F.min("__v6").alias("value6"))
        .select(F.col("__k").alias(key), "p", "value6")
    )
    if not empty_keys:
        return refined
    nulls = spark.createDataFrame(
        [(k, float(p), None) for k in empty_keys for p in ps],
        f"{key} {key_type}, p double, value6 long",
    )
    return refined.unionByName(nulls)


def pareto_frontier_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket_width: int = 1_000_000_000,
) -> DataFrame:
    """EXACT 2-D skyline: rows not dominated under (minimize
    ``min_col``, maximize ``max_col``) — b dominates a iff
    ``b.min <= a.min AND b.max >= a.max`` with one strict. Both
    columns must be integral (pre-bucket floats to int64 units).

    The textbook single-sort skyline needs a GLOBAL total order (one
    running max over all rows — a single-partition window, dead at
    corpus scale). This is the bucket-split form, the same move as
    ``exact_percentiles_2pass``: coarse-bucket ``min_col``, so
    dominance splits into (a) CROSS-BUCKET — every lower bucket's
    price is strictly lower, so only each bucket's max(max_col)
    matters: a buckets-sized table, cumulative-maxed over bucket order
    (a window over rows BOUNDED by value_range/bucket_width, never by
    row count) and broadcast back; and (b) IN-BUCKET — a running max
    over a window PARTITIONED by bucket (both in-bucket specs share
    one partitioning; only bucket residents sort). A row survives iff
    no lower bucket reaches its ``max_col``, no strictly-cheaper
    in-bucket row reaches it, and no equal-``min_col`` row exceeds it
    (ties on BOTH coordinates all survive — neither dominates).

    All comparisons are int64 — engine-exact. Passthrough columns are
    preserved.
    """
    from pyspark.sql import Window

    b = df.withColumn(
        "__bkt", F.floor(F.col(min_col) / bucket_width).cast("long")
    )
    bmax = b.groupBy("__bkt").agg(F.max(max_col).alias("__bmax"))
    w_cum = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = bmax.select(
        "__bkt", F.max("__bmax").over(w_cum).alias("__lower_max")
    )
    w_strict = (
        Window.partitionBy("__bkt")
        .orderBy(min_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("__bkt", min_col)
    flagged = (
        b.join(F.broadcast(cum), "__bkt")
        .withColumn("__m1", F.max(max_col).over(w_strict))
        .withColumn("__m2", F.max(max_col).over(w_eq))
    )
    not_dominated = (
        (F.col("__lower_max").isNull() | (F.col("__lower_max") < F.col(max_col)))
        & (F.col("__m1").isNull() | (F.col("__m1") < F.col(max_col)))
        & (F.col("__m2") == F.col(max_col))
    )
    return flagged.filter(not_dominated).drop(
        "__bkt", "__lower_max", "__m1", "__m2"
    )
