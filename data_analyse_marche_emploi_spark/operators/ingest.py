"""Ingest-job semantics (SURVEY.md §2.A / §7 step 7) — the custom-
semantics cluster of the reference, owned as engine conventions:

1. **Keyed upsert**: the reference bulk-indexes with explicit ``_id`` so
   overlapping partitioned scans merge idempotently, last-writer-wins
   (ingestion-elasticsearch.py:36-55). Spark file sinks are not keyed →
   the engine's rule is *dedup-before-write*: ``dropDuplicates`` on the
   key (optionally ordered by a recency column first so "last writer"
   is well-defined) then ``mode("overwrite")`` — the reference's
   truncate-recreate (:253-262).
2. **Error side-table**: malformed inputs become rows in an ``erreurs``
   table instead of failing the job (:99-123) — PERMISSIVE JSON read +
   ``_corrupt_record`` routed to a side output.
3. **Run metrics**: one row per run with totals and wall-clock
   (:291-313), including the reference's completeness invariant
   ``collected == available``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dates import date_fmt_fr, duration_hhmm


def upsert_dedup(df: DataFrame, key: str, recency: str | None = None) -> DataFrame:
    """Last-writer-wins keyed dedup (reference: `_id`-keyed bulk upsert,
    ingestion-elasticsearch.py:46-55).

    With ``recency``, the surviving row per key is the one with the max
    recency value (deterministic last-writer-wins); without, any row
    (the reference's behavior for *identical* duplicate fetches).
    Implemented as max_by-style row_number — one shuffle on the key.
    """
    if recency is None:
        return df.dropDuplicates([key])
    w = Window.partitionBy(key).orderBy(F.col(recency).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def write_overwrite(df: DataFrame, path: str, key: str | None = None) -> None:
    """Truncate-recreate write (reference: DELETE+PUT indices,
    ingestion-elasticsearch.py:253-262). If ``key`` is given the engine
    convention applies dedup first."""
    out = df.dropDuplicates([key]) if key else df
    out.write.mode("overwrite").parquet(path)


ERROR_SCHEMA = T.StructType(
    [
        T.StructField("query", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("status_code", T.StringType()),
        T.StructField("response", T.StringType()),
    ]
)


def parse_json_with_error_channel(
    spark: SparkSession, json_df: DataFrame, col: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE parse of a JSON string column: well-formed rows come
    back typed; malformed rows divert to an error side-output shaped
    like the reference's ``erreurs`` documents
    (ingestion-elasticsearch.py:105-110) — the job never fails.
    """
    # PERMISSIVE mode yields an all-null struct for malformed input, so a
    # null-struct test is not enough; the _corrupt_record column is the
    # reliable malformed-row marker.
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = json_df.withColumn(
        "__parsed",
        F.from_json(
            F.col(col),
            schema_with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    good = parsed.filter(F.col("__parsed._corrupt_record").isNull()).select(
        *[F.col(f"__parsed.{f.name}") for f in schema.fields]
    )
    errors = (
        parsed.filter(F.col("__parsed._corrupt_record").isNotNull())
        .select(
            F.lit("from_json").alias("query"),
            F.lit("malformed json").alias("message"),
            F.lit("n/a").alias("status_code"),
            F.col(col).alias("response"),
        )
    )
    return good, errors


def run_metrics(
    df: DataFrame,
    key: str,
    start_ts,
    end_ts,
    available_total: int | None = None,
) -> DataFrame:
    """One-row run-metrics table (reference: the ``ingestion`` index doc,
    ingestion-elasticsearch.py:303-310): French-formatted start/end,
    available vs collected totals, HH:MM duration, and the completeness
    invariant ``collected == available``."""
    collected = df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct(key).alias("total_distinct"),
    )
    start_c = F.lit(start_ts).cast("timestamp")
    end_c = F.lit(end_ts).cast("timestamp")
    avail = F.lit(available_total).cast("long") if available_total is not None else F.col("total_rows")
    return collected.select(
        F.lit("fin de l'execution du programme").alias("message"),
        date_fmt_fr(start_c).alias("date_debut"),
        date_fmt_fr(end_c).alias("date_fin"),
        avail.alias("total_offres"),
        F.col("total_distinct").alias("total_offres_collecte"),
        duration_hhmm(F.unix_timestamp(end_c) - F.unix_timestamp(start_c)).alias("duree_totale"),
        (F.col("total_distinct") == avail).alias("complet"),
    )


def scd2_history(
    changes: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed.

    The warehouse-side completion of the keyed upsert
    (ingestion-elasticsearch.py:36-55 keeps only the latest state;
    SCD2 keeps every state with its validity interval): consecutive
    identical values collapse, each retained change opens an interval
    ``[valid_from, valid_to)`` closed by the next change, and the open
    interval is ``is_current``.

    One shuffle on ``key`` serves both window passes (change detection
    and interval close share the same (key × ts, tiebreak) ordering).
    ``tiebreak`` must be unique per key (e.g. an event id) so
    micro-equal timestamps order deterministically — this is what makes
    the output reproducible across partitionings and engines.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    # row_number (not prev-is-null) marks the genuine first change so a
    # legitimate NULL attribute value neither opens a spurious interval
    # nor hides a change to/from NULL (eqNullSafe, not <>).
    changed = (
        changes.select(key, attr, ts, tiebreak)
        .withColumn("__prev", F.lag(attr).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1) | ~F.col("__prev").eqNullSafe(F.col(attr))
        )
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return (
        changed.withColumn("valid_to", F.lead(ts).over(w2))
        .select(
            F.col(key),
            F.col(attr),
            F.col(ts).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
