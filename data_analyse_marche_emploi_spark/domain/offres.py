"""The job-offer ("offres") domain model and its end-to-end jobs.

The reference's central table is a dynamically-mapped Elasticsearch
index of France Travail job offers (ingestion-elasticsearch.py:36-55,
:255-256). Here that becomes an explicit nested ``StructType``
(FIXTURES.md §B.1 — the load-bearing fields observed across the repo)
with the reference's tolerate-anything semantics kept via the
PERMISSIVE-parse error channel:

* :data:`OFFRE_SCHEMA` — pinned schema incl. the nested
  ``lieuTravail.commune`` (export-offres-csv.conf:6,13-16),
* :func:`parse_offres` — NDJSON → typed rows + ``erreurs`` side-table
  (ingestion-elasticsearch.py:99-123),
* :func:`ingest_offres` — the full ingest job: parse → last-writer-wins
  keyed upsert on ``id`` (ordered by ``dateActualisation``) → overwrite
  write → one-row run-metrics with the completeness invariant
  (:246, :291-313),
* :func:`export_offres_csv_df` / :func:`extract_tech` — the three
  Logstash pipelines bound to the real offer fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.ingest import parse_json_with_error_channel, run_metrics, upsert_dedup
from ..plans.pipelines import pipeline_csv_tech

OFFRE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("intitule", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("romeCode", T.StringType()),
        T.StructField("codeNAF", T.StringType()),
        T.StructField("qualificationCode", T.StringType()),
        T.StructField("dateActualisation", T.TimestampType()),
        T.StructField(
            "lieuTravail",
            T.StructType(
                [
                    T.StructField("commune", T.StringType()),
                    T.StructField("libelle", T.StringType()),
                ]
            ),
        ),
    ]
)

# csv-tech.conf:15-17 / csv-tech-data.conf:12 — the two extract filters.
ROME_TECH = ["M1801", "M1802", "M1803", "M1805", "M1806"]
ROME_DATA = ["M1403"]


def parse_offres(spark: SparkSession, raw: DataFrame, json_col: str = "value"
                 ) -> tuple[DataFrame, DataFrame]:
    """NDJSON lines → typed offer rows + erreurs side-output. Malformed
    lines never fail the job (reference: ingestion-elasticsearch.py:99-123)."""
    return parse_json_with_error_channel(spark, raw, json_col, OFFRE_SCHEMA)


def ingest_offres(
    spark: SparkSession,
    raw: DataFrame,
    out_path: str,
    run_start: str,
    run_end: str,
    available_total: int | None = None,
    json_col: str = "value",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The reference's ingestion program as one Spark job
    (SURVEY.md §3.1): parse with error channel → keyed last-writer-wins
    upsert on ``id`` (the `_id` bulk-index semantics; recency =
    ``dateActualisation``) → truncate-recreate write → run-metrics row.

    Returns (offres, erreurs, metrics); offres/erreurs are also written
    under ``out_path``.
    """
    good, errors = parse_offres(spark, raw, json_col)
    offres = upsert_dedup(good, "id", recency="dateActualisation")
    offres.write.mode("overwrite").parquet(f"{out_path}/offres")
    errors.write.mode("overwrite").parquet(f"{out_path}/erreurs")
    offres_back = spark.read.parquet(f"{out_path}/offres")
    metrics = run_metrics(
        offres_back, "id", run_start, run_end, available_total=available_total
    )
    metrics.write.mode("append").parquet(f"{out_path}/ingestion")
    return offres_back, errors, metrics


def export_offres_csv_df(offres: DataFrame) -> DataFrame:
    """The export-offres-csv pipeline (export-offres-csv.conf:1-26):
    match_all scan, nested flatten ``lieuTravail.commune`` →
    ``codecommune``, sink-ordered projection. Nested-schema pruning
    makes the scan read only the struct leaf."""
    return offres.select(
        "id",
        "codeNAF",
        "romeCode",
        "qualificationCode",
        "dateActualisation",
        F.col("lieuTravail.commune").alias("codecommune"),
    )


def extract_tech(offres: DataFrame, codes: list[str] | None = None) -> DataFrame:
    """The csv-tech / csv-tech-data pipelines (csv-tech.conf:8-53) on
    real offer fields: terms filter on romeCode, then each field's
    exact mutate chain — intitule's (:29-31) and description's
    (:34-39) differ in steps and order — sink-ordered projection."""
    return pipeline_csv_tech(
        offres, "id", "romeCode", codes or ROME_TECH,
        title_cols=["intitule"], desc_cols=["description"],
    )
