"""Semantic tests for the time-series joins, TF-IDF, IVF ANN, and the
connector's token pool / referentiel reader."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_analyse_marche_emploi_spark.operators.asof import asof_join, range_join_pairs
from data_analyse_marche_emploi_spark.operators.similarity import (
    ann_ivf,
    knn_brute_force,
)
from data_analyse_marche_emploi_spark.sources.rest_paged import (
    TokenPool,
    read_referentiel,
)
from data_analyse_marche_emploi_spark.tables import load_table


def test_asof_join_semantics(spark):
    """Hand-built fixture: backward as-of picks the latest right row at
    or before each left ts; ties match; no right row → NULL."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"),
         (1, "2024-01-01 12:00:00", "b"),
         (2, "2024-01-01 09:00:00", "c")],
        "k int, ts string, lv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", "r1"),
         (1, "2024-01-01 10:00:00", "r2"),   # tie with left 'a' → matches
         (1, "2024-01-01 11:00:00", "r3"),
         (2, "2024-01-01 09:30:00", "r4")],  # after left 'c' → no match
        "k int, ts string, rv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.lv: r.rv for r in asof_join(left, right, "k", "ts", ["rv"]).collect()}
    assert out == {"a": "r2", "b": "r3", "c": None}


def test_asof_join_random_with_ties_matches_naive(spark):
    """Randomized stress with forced timestamp ties and sparse keys:
    as-of result must equal a naive per-row argmax (computed in
    Python), including tie-matches and no-match NULLs."""
    import random

    rng = random.Random(7)
    base = 1_700_000_000
    lefts = [
        (rng.randint(1, 5), base + rng.randint(0, 50), i) for i in range(120)
    ]
    rights = [
        (rng.randint(1, 5), base + rng.randint(0, 50), 1000 + i) for i in range(120)
    ]
    left = spark.createDataFrame(
        [(k, t, i) for k, t, i in lefts], "k int, sec long, lid int"
    ).withColumn("ts", F.col("sec").cast("timestamp")).drop("sec")
    right = spark.createDataFrame(
        [(k, t, i) for k, t, i in rights], "k int, sec long, rid int"
    ).withColumn("ts", F.col("sec").cast("timestamp")).drop("sec")
    got = {
        r.lid: r.rid
        for r in asof_join(left, right, "k", "ts", ["rid"]).collect()
    }
    for k, t, lid in lefts:
        cands = [(rt, rid) for rk, rt, rid in rights if rk == k and rt <= t]
        # as-of picks the max-ts candidate; among equal ts the engine may
        # pick any (last in window order) — compare on ts, not rid
        want_ts = max((rt for rt, _ in cands), default=None)
        if want_ts is None:
            assert got[lid] is None
        else:
            got_ts = {rid: rt for rt, rid in cands}.get(got[lid])
            assert got_ts == want_ts, (lid, got[lid])


def test_asof_join_null_right_columns_not_resurrected(spark):
    """A NULL column in the newest matching right row must stay NULL —
    not be back-filled from an older right row — and every attached
    column must come from that same right row (per-column ignorenulls
    carries can mix fields across rows). Differential oracle: DuckDB's
    native ASOF LEFT JOIN on the same data."""
    import duckdb

    left_rows = [(1, 100, "l0"), (1, 200, "l1"), (1, 300, "l2"), (2, 150, "l3"),
                 (3, 10, "l4")]
    right_rows = [
        (1, 50, "p1", 10.0),
        (1, 150, None, 20.0),   # newest for l1: price NULL must stay NULL
        (1, 250, "p3", None),   # newest for l2: qty NULL must stay NULL
        (2, 100, None, None),   # matched row entirely NULL-valued
    ]
    left = (
        spark.createDataFrame(left_rows, "k int, sec long, lv string")
        .withColumn("ts", F.col("sec").cast("timestamp")).drop("sec")
    )
    right = (
        spark.createDataFrame(right_rows, "k int, sec long, price string, qty double")
        .withColumn("ts", F.col("sec").cast("timestamp")).drop("sec")
    )
    got = {
        r.lv: (r.price, r.qty)
        for r in asof_join(left, right, "k", "ts", ["price", "qty"]).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE L(k INT, ts TIMESTAMP, lv VARCHAR)")
    con.execute("CREATE TABLE R(k INT, ts TIMESTAMP, price VARCHAR, qty DOUBLE)")
    con.executemany(
        "INSERT INTO L VALUES (?, make_timestamp(? * 1000000), ?)", left_rows
    )
    con.executemany(
        "INSERT INTO R VALUES (?, make_timestamp(? * 1000000), ?, ?)", right_rows
    )
    want = {
        lv: (price, qty)
        for lv, price, qty in con.execute(
            "SELECT l.lv, r.price, r.qty FROM L l "
            "ASOF LEFT JOIN R r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    }
    assert got == want
    # the regression pins the exact cells the buggy carry resurrected
    assert got["l1"] == (None, 20.0)
    assert got["l2"] == ("p3", None)
    assert got["l4"] == (None, None)  # no matching right row at all


def test_range_join_matches_theta_join(spark, sf_dir):
    """Bucketed range join ≡ the naive theta-join on the same predicate."""
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id")
    )
    others = e.select("user_id", "ts", F.col("event_id").alias("near_id"))
    got = (
        range_join_pairs(errors, others, "user_id", "ts", "ts", 3600,
                         ["err_id"], ["near_id"])
        .filter(F.col("err_id") != F.col("near_id"))
    )
    a, b = errors.alias("a"), others.alias("b")
    want = (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter(
            (F.col("err_id") != F.col("near_id"))
            & (
                F.abs(F.unix_micros(F.col("a.ts").cast("timestamp")) - F.unix_micros(F.col("b.ts").cast("timestamp")))
                <= 3600 * 1_000_000
            )
        )
        .select("err_id", "near_id")
    )
    assert {(r.err_id, r.near_id) for r in got.collect()} == {
        (r.err_id, r.near_id) for r in want.collect()
    }


def test_ann_ivf_reports_true_cosines(spark, sf_dir):
    """Every IVF-reported neighbor carries the exact cosine the brute
    force assigns to that same (query, neighbor) pair, and per-query
    ranks are consistent (approximate recall, exact scoring)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    ivf = ann_ivf(e, q, "embedding", "vec_id", k=5, n_centroids=16, n_probe=4)
    brute = knn_brute_force(e, q, "embedding", "vec_id", k=10_000)
    truth = {(r.qid, r.nid): r.cos6 for r in brute.collect()}
    rows = ivf.collect()
    assert len(rows) > 0
    for r in rows:
        assert truth[(r.qid, r.nid)] == r.cos6
    # ranks are 1..n contiguous per query, ordered by descending cosine
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append((r.rank, r.cos6))
    for ranked in per_q.values():
        ranked.sort()
        assert [rk for rk, _ in ranked] == list(range(1, len(ranked) + 1))
        cosines = [c for _, c in ranked]
        assert cosines == sorted(cosines, reverse=True)


def test_token_pool_round_robin():
    pool = TokenPool(
        [("id1", "s1"), ("id2", "s2")], authenticate=lambda cid, sec: f"tok-{cid}"
    )
    assert [pool.get() for _ in range(4)] == ["tok-id1", "tok-id2", "tok-id1", "tok-id2"]


def test_read_referentiel(spark):
    body = json.dumps(
        [{"code": "11", "nom": "Île-de-France"}, {"code": "75", "nom": "Paris"}]
    )
    schema = T.StructType(
        [T.StructField("code", T.StringType()), T.StructField("nom", T.StringType())]
    )
    dim = read_referentiel(spark, lambda url, p: (200, {}, body), "local://regions", schema)
    assert {(r.code, r.nom) for r in dim.collect()} == {
        ("11", "Île-de-France"), ("75", "Paris")
    }


def test_gapfill_resample_dense_grid_and_locf(spark):
    from datetime import datetime

    from data_analyse_marche_emploi_spark.operators.asof import gapfill_resample

    rows = [
        # user 1: events at hours 0 and 3 -> spine 0,1,2,3; fill carries 5.0
        (1, datetime(2024, 1, 1, 0, 15), 2.0),
        (1, datetime(2024, 1, 1, 0, 45), 3.0),
        (1, datetime(2024, 1, 1, 3, 10), 7.0),
        # user 2: single event -> one-row spine
        (2, datetime(2024, 1, 1, 9, 30), 1.5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["bucket_ts"].hour): (r["n_events"], r["v_fill"])
        for r in gapfill_resample(df, "user_id", "ts", "value").collect()
    }
    assert got == {
        (1, 0): (2, 5.0),   # 2.0 + 3.0
        (1, 1): (0, 5.0),   # gap: forward-filled
        (1, 2): (0, 5.0),   # gap: forward-filled
        (1, 3): (1, 7.0),
        (2, 9): (1, 1.5),
    }
