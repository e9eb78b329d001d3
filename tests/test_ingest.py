"""Ingest-semantics tests (SURVEY.md §5 item 4): keyed upsert with
last-writer-wins, error side-channel, overwrite write, completeness
invariant, CSV sink."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_analyse_marche_emploi_spark.operators.ingest import (
    parse_json_with_error_channel,
    run_metrics,
    upsert_dedup,
    write_overwrite,
)
from data_analyse_marche_emploi_spark.plans.pipelines import snk_csv


def test_upsert_dedup_last_writer_wins(spark):
    df = spark.createDataFrame(
        [("a", 1, "old"), ("a", 2, "new"), ("b", 1, "only")],
        "id string, version int, payload string",
    )
    out = {r["id"]: r["payload"] for r in upsert_dedup(df, "id", "version").collect()}
    assert out == {"a": "new", "b": "only"}


def test_upsert_dedup_unkeyed_identical_rows(spark):
    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "id string, v int")
    assert upsert_dedup(df, "id").count() == 2


def test_error_side_channel(spark):
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("v", T.LongType())]
    )
    df = spark.createDataFrame(
        [('{"id": "x", "v": 1}',), ("{not json",), ('{"id": "y", "v": 2}',)],
        "raw string",
    )
    good, errors = parse_json_with_error_channel(spark, df, "raw", schema)
    assert sorted(r["id"] for r in good.collect()) == ["x", "y"]
    errs = errors.collect()
    assert len(errs) == 1 and errs[0]["response"] == "{not json"
    assert errs[0]["message"] == "malformed json"


def test_write_overwrite_with_key(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "id string, v int")
    path = os.path.join(str(tmp_path), "out")
    write_overwrite(df, path, key="id")
    assert spark.read.parquet(path).count() == 2
    # full-refresh semantics: a second write replaces, never appends
    write_overwrite(df, path, key="id")
    assert spark.read.parquet(path).count() == 2


def test_run_metrics_completeness(spark):
    df = spark.createDataFrame([("a",), ("b",), ("b",)], "id string")
    row = run_metrics(df, "id", "2024-01-01 08:00:00", "2024-01-01 09:30:00", 2).collect()[0]
    assert row["total_offres_collecte"] == 2
    assert row["duree_totale"] == "01:30"
    assert row["date_debut"] == "01/01/2024 08:00:00"
    assert row["complet"] is True


def test_snk_csv(spark, tmp_path):
    df = spark.createDataFrame([(1, "x,y"), (2, "z")], "id int, txt string")
    path = os.path.join(str(tmp_path), "csv_out")
    snk_csv(df, path, single_file=True)
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 2
    assert back.columns == ["id", "txt"]
    # quoted comma survives the round-trip
    assert {r["txt"] for r in back.collect()} == {"x,y", "z"}
