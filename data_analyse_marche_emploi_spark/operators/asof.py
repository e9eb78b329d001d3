"""As-of and range (interval) joins — time-series join surface.

The reference has no joins at all (SURVEY.md §2.E); these are the two
time-series join shapes its event-dated domain (``dateActualisation``)
would need first. Both are built from shuffle-friendly primitives
rather than naive non-equi joins:

* **as-of join** — "for each left row, the latest right row at or
  before it" — via the union-and-window technique: tag both inputs,
  union, sort once per key, carry the last right value forward. One
  shuffle on the key, no row explosion, no range predicate — this is
  the plan that survives 100 TB (a naive ``l.ts >= r.ts`` theta-join
  is quadratic per key).
* **range join** — "pairs within a time window" — via interval
  bucketing: events land in fixed-width buckets; candidates come from
  equi-joining (key, bucket±1); the exact predicate filters residue.
  Equi-join + cheap filter ≈ linear, vs. Catalyst's BNL for raw
  non-equi predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach ``right_cols`` from the nearest right
    row with the same ``key``: the most recent with ``right.ts <=
    left.ts`` (``backward``) or the next with ``right.ts >= left.ts``
    (``forward``); ties match either way. All left columns are
    preserved; unmatched left rows keep NULLs (left-join semantics).
    ``tolerance_seconds`` nulls the attachment when the matched row is
    further than the bound — pandas ``merge_asof`` parity, and the
    practical form (an as-of quote from last year is not a quote).

    Single shuffle on ``key``; per-key chronological sort (reversed
    for ``forward``); a last-value-ignore-nulls window carries the
    nearest right row across. Tolerance is a post-window null-out, so
    it costs one comparison, not a second join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    # Carry ONE struct per right row, not per-column lasts: the struct is
    # non-null for every right row even when its members are NULL, so a
    # NULL in the newest matching right row stays NULL instead of
    # resurrecting a stale value — and all attached fields always come
    # from the SAME right row (per-column ignorenulls lasts can mix
    # fields across different right rows).
    rstruct = StructType(
        [StructField("__rts", right.schema[ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    tagged_l = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__r", F.lit(None).cast(rstruct))
        .select(*lcols, "__side", "__r")
    )
    tagged_r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(ts).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    )
    # Align schemas: right side gets NULL for left-only columns.
    for c in lcols:
        if c not in (key, ts):
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    tagged_r = tagged_r.select(*lcols, "__side", "__r")
    u = tagged_l.unionByName(tagged_r)
    # Right rows sort before left rows at equal ts, so ties match.
    # Forward as-of is the same carry over the REVERSED timeline.
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols, "__side", F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r")
    )
    matched = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # The nearest match is the ONLY candidate that could be within
        # tolerance, so nulling a too-far nearest equals "nearest
        # within tolerance".
        gap = F.abs(
            F.unix_micros(F.col("__r")["__rts"].cast("timestamp"))
            - F.unix_micros(F.col(ts).cast("timestamp"))
        )
        matched = matched.withColumn(
            "__r",
            F.when(
                gap <= F.lit(int(tolerance_seconds) * 1_000_000), F.col("__r")
            ),
        )
    return matched.select(
        *lcols, *[F.col("__r")[c].alias(c) for c in right_cols]
    )


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """All (left, right) pairs sharing ``key`` with
    ``|left_ts - right_ts| <= tolerance`` — interval-bucketed.

    Each side maps to epoch-second buckets of width ``tolerance``; the
    left side probes its own bucket and both neighbors, so every
    qualifying pair co-locates in exactly one equi-join bucket; the
    exact predicate then trims the residue. The shuffle key is
    (key, bucket) — adding the bucket also splinters hot keys.
    """
    width = int(tolerance_seconds)
    # cast("timestamp") first: fixture parquet may surface the event time
    # as TIMESTAMP_NTZ (pyarrow writes tz-naive), which unix_micros
    # rejects. Both sides cast identically under the UTC-pinned session,
    # so the |l - r| difference is unaffected.
    lb = left.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("__lus"),
        *[F.col(c) for c in left_cols],
    ).withColumn(
        "__bucket",
        F.explode(
            F.array(
                (F.col("__lus") / (width * 1_000_000)).cast("long") - 1,
                (F.col("__lus") / (width * 1_000_000)).cast("long"),
                (F.col("__lus") / (width * 1_000_000)).cast("long") + 1,
            )
        ),
    )
    rb = right.select(
        F.col(key).alias("__rk"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__rus"),
        *[F.col(c) for c in right_cols],
    ).withColumn("__rbucket", (F.col("__rus") / (width * 1_000_000)).cast("long"))
    pairs = lb.join(
        rb,
        (F.col("__k") == F.col("__rk")) & (F.col("__bucket") == F.col("__rbucket")),
    ).filter(F.abs(F.col("__lus") - F.col("__rus")) <= width * 1_000_000)
    return pairs.select(F.col("__k").alias(key), *left_cols, *right_cols)


def gapfill_resample(
    events: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Resample an event stream to a dense per-key time grid with
    forward-filled values — the gap-filling/interpolation surface of a
    time-series store (hypertable ``time_bucket_gapfill`` + ``locf``
    re-expressed as one Catalyst plan).

    Per key: bucket events (sum/count), span the key's [min, max]
    bucket range with ``sequence``-exploded spine rows, left-join the
    aggregates back, and carry the last non-null value forward with an
    ``ignorenulls`` window ``last``. One shuffle keys the aggregation;
    the spine explode is map-side on the bounds row; the spine join and
    the fill window reuse the key partitioning. Spine size is bounded
    by (key count x key's active range / bucket), never by event count.

    Returns (key, bucket_ts, n_events, v_fill): empty buckets carry
    n_events = 0 and the forward-filled value (NULL before the key's
    first event — nothing to carry yet).
    """
    b = F.date_trunc(bucket, F.col(ts))
    hourly = events.groupBy(F.col(key), b.alias("bucket_ts")).agg(
        F.sum(value_col).alias("__v"), F.count(F.lit(1)).alias("n_events")
    )
    bounds = hourly.groupBy(key).agg(
        F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi")
    )
    spine = bounds.select(
        key,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"interval 1 {bucket}"))
        ).alias("bucket_ts"),
    )
    joined = spine.join(hourly, [key, "bucket_ts"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key),
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.round(F.last("__v", ignorenulls=True).over(w), 4).alias("v_fill"),
    )


def interpolate_linear(
    events: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-key time grid with LINEAR interpolation at the gaps —
    the ``time_bucket_gapfill`` + ``interpolate`` surface (where
    :func:`gapfill_resample` carries last-observation-forward, this
    draws the line between the surrounding known points).

    NOT the gapfill topology: a spine left-join would re-derive the
    bucket aggregate on both join sides (two fact scans) and then need
    a second window pass to find each gap's neighbors. Instead the gap
    rows are GENERATED already knowing both endpoints: bucket-
    aggregate once, ``lead()`` the next known point in (one window
    over the one aggregation shuffle — partitioning reused), and
    explode ``sequence(1, gap-1)`` into the missing offsets, each row
    interpolating from the (prev, next) pair it was born with. One
    fact scan, one shuffle, one sort; the explode is map-side and
    bounded by grid size, never event count. Gap rows only ever sit
    between two known points, so nothing extrapolates.

    Exactness contract: bucket values are int64 micro-unit sums
    (``sum(floor(v*1e6))`` — associative, order-free) and the
    interpolated value is ``prev6 + floor((next6-prev6)*k / m)`` with
    hour offsets 0 < k < m. The product stays well under 2^53, so the
    DOUBLE division is exact-floored identically in any engine:
    |Δ·k| ≤ ~1e14 and a non-integer true quotient sits ≥ 1/m ≥ 1e-4
    from any integer — orders of magnitude beyond the ulp. NULL/NaN
    values are missing (a bucket with only missing values is a GAP,
    not a known NULL).

    Returns (key, bucket_ts, is_known, value6).
    """
    step_us = {
        "hour": 3_600_000_000,
        "minute": 60_000_000,
        "day": 86_400_000_000,
    }[bucket]
    v6 = F.when(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col)),
        F.floor(F.col(value_col) * 1e6).cast("long"),
    )
    known = (
        events.groupBy(
            F.col(key),
            F.date_trunc(bucket, F.col(ts)).cast("timestamp").alias("bucket_ts"),
        )
        .agg(F.sum(v6).alias("__v6"))
        .filter(F.col("__v6").isNotNull())
    )
    w = Window.partitionBy(key).orderBy("bucket_ts")
    nb = known.select(
        F.col(key),
        "bucket_ts",
        "__v6",
        F.lead("bucket_ts").over(w).alias("__nts"),
        F.lead("__v6").over(w).alias("__n6"),
    )
    known_rows = nb.select(
        F.col(key),
        "bucket_ts",
        F.lit(1).alias("is_known"),
        F.col("__v6").alias("value6"),
    )
    m_steps = (
        (F.unix_micros(F.col("__nts")) - F.unix_micros(F.col("bucket_ts")))
        / F.lit(step_us)
    ).cast("long")
    gaps = (
        nb.filter(F.col("__nts").isNotNull())
        .withColumn("__m", m_steps)
        .filter(F.col("__m") > 1)
        .select(
            F.col(key),
            "bucket_ts",
            "__v6",
            "__n6",
            "__m",
            F.explode(F.sequence(F.lit(1), F.col("__m") - 1)).alias("__k"),
        )
    )
    interp = F.col("__v6") + F.floor(
        ((F.col("__n6") - F.col("__v6")) * F.col("__k")).cast("double")
        / F.col("__m")
    ).cast("long")
    gap_rows = gaps.select(
        F.col(key),
        F.timestamp_micros(
            F.unix_micros(F.col("bucket_ts")) + F.col("__k") * F.lit(step_us)
        ).alias("bucket_ts"),
        F.lit(0).alias("is_known"),
        interp.alias("value6"),
    )
    return known_rows.unionByName(gap_rows)
