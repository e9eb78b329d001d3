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


def test_scd2_history_collapses_and_closes_intervals(spark):
    from datetime import datetime

    from data_analyse_marche_emploi_spark.operators.ingest import scd2_history

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: a, a (collapse), b, b (collapse), a  -> 3 intervals
        (1, "a", t(1), 101),
        (1, "a", t(2), 102),
        (1, "b", t(3), 103),
        (1, "b", t(4), 104),
        (1, "a", t(5), 105),
        # user 2: value changes to NULL and back -> 3 intervals
        (2, "x", t(1), 201),
        (2, None, t(2), 202),
        (2, "x", t(3), 203),
        # user 3: micro-equal timestamps, tiebreak orders them
        (3, "p", t(1), 302),
        (3, "q", t(1), 301),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, status string, ts timestamp, event_id long"
    )
    out = scd2_history(df, "user_id", "status", "ts", "event_id")
    got = sorted(
        out.collect(), key=lambda r: (r["user_id"], r["valid_from"], r["status"] or "")
    )
    u1 = [r for r in got if r["user_id"] == 1]
    assert [(r["status"], r["valid_from"].second) for r in u1] == [
        ("a", 1), ("b", 3), ("a", 5)
    ]
    assert [r["valid_to"].second if r["valid_to"] else None for r in u1] == [3, 5, None]
    assert [r["is_current"] for r in u1] == [False, False, True]
    u2 = [r for r in got if r["user_id"] == 2]
    assert [r["status"] for r in u2] == ["x", None, "x"]
    # tiebreak: event_id 301 (q) precedes 302 (p)? No - order is (ts, event_id):
    # 301 has the smaller id so 'q' opens first and 'p' is current
    u3 = [r for r in got if r["user_id"] == 3]
    assert [(r["status"], r["is_current"]) for r in sorted(u3, key=lambda r: not r["is_current"])] == [
        ("p", True), ("q", False)
    ]
    # every user's intervals tile: each non-current valid_to equals the
    # next interval's valid_from
    for uid in (1, 2, 3):
        iv = sorted(
            [r for r in got if r["user_id"] == uid],
            # micro-equal valid_from ties (user 3) order by interval
            # position: the closed interval precedes the open one
            key=lambda r: (r["valid_from"], r["valid_to"] is None),
        )
        for a, b in zip(iv, iv[1:]):
            assert a["valid_to"] == b["valid_from"]


def test_scd2_history_fuzz_vs_python_reference(spark):
    """Seeded fuzz: scd2_history must agree with an independent
    pure-Python reference on random change feeds — duplicate
    timestamps, NULL values, single-event keys, long repeat runs."""
    import random
    from datetime import datetime, timedelta

    from data_analyse_marche_emploi_spark.operators.ingest import scd2_history

    rng = random.Random(20260813)
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(1, 13):
        for _ in range(rng.randint(1, 14)):
            eid += 1
            rows.append(
                (
                    uid,
                    rng.choice(["a", "b", "b", "c", None]),
                    base + timedelta(seconds=rng.randint(0, 20)),  # forced ts ties
                    eid,
                )
            )

    def py_scd2(rows):
        out = []
        by_key = {}
        for uid, val, ts, eid2 in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
            by_key.setdefault(uid, []).append((val, ts))
        for uid, seq in by_key.items():
            changes = []
            prev = object()  # sentinel distinct from None
            for val, ts in seq:
                if val != prev:
                    changes.append([val, ts, None])
                    prev = val
            for cur, nxt in zip(changes, changes[1:]):
                cur[2] = nxt[1]
            for val, frm, to in changes:
                out.append((uid, val, frm, to, to is None))
        return sorted(out, key=lambda r: (r[0], r[2], r[3] or datetime.max, str(r[1])))

    df = spark.createDataFrame(
        rows, "user_id long, status string, ts timestamp, event_id long"
    )
    got = sorted(
        (
            (r["user_id"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_history(df, "user_id", "status", "ts", "event_id").collect()
        ),
        key=lambda r: (r[0], r[2], r[3] or datetime.max, str(r[1])),
    )
    assert got == py_scd2(rows)
