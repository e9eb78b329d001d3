"""Semantic tests for the second round-6 operator batch: OHLC
resample, linear interpolation, rolling distinct, MERGE semantics,
BM25 validation. Oracle parity for the catalog entries is covered by
test_oracle_parity; these pin hand-computed edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.operators.asof import interpolate_linear
from data_analyse_marche_emploi_spark.operators.maintenance import merge_apply
from data_analyse_marche_emploi_spark.operators.text_analysis import bm25_search
from data_analyse_marche_emploi_spark.operators.windows import (
    ohlc_resample,
    rolling_distinct,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_interpolate_draws_exact_line(spark):
    """Known points at hours 0 (v=1.0) and 3 (v=4.0): gap rows at
    hours 1, 2 interpolate to 2.0, 3.0 exactly; endpoints stay known."""
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(3), 4.0)], ["user_id", "ts", "value"]
    )
    rows = {
        r["bucket_ts"].hour: r
        for r in interpolate_linear(df, "user_id", "ts", "value").collect()
    }
    assert [rows[h]["value6"] for h in range(4)] == [
        1_000_000,
        2_000_000,
        3_000_000,
        4_000_000,
    ]
    assert [rows[h]["is_known"] for h in range(4)] == [1, 0, 0, 1]


def test_interpolate_floor_rounds_down_and_skips_all_null_buckets(spark):
    """Non-integer slope floors toward -inf per micro-unit; a bucket
    whose only value is NULL is a GAP (interpolated), not a known
    NULL."""
    df = spark.createDataFrame(
        [(1, _ts(0), 0.0), (1, _ts(1), None), (1, _ts(3), 1.0)],
        "user_id int, ts timestamp, value double",
    )
    rows = {
        r["bucket_ts"].hour: r
        for r in interpolate_linear(df, "user_id", "ts", "value").collect()
    }
    # line 0 -> 1.0 over 3 hours: floor(1e6*k/3)
    assert rows[1]["is_known"] == 0 and rows[1]["value6"] == 333_333
    assert rows[2]["is_known"] == 0 and rows[2]["value6"] == 666_666
    assert rows[3]["value6"] == 1_000_000


def test_interpolate_single_known_point_emits_one_row(spark):
    df = spark.createDataFrame([(1, _ts(5), 2.5)], ["user_id", "ts", "value"])
    out = interpolate_linear(df, "user_id", "ts", "value").collect()
    assert len(out) == 1 and out[0]["value6"] == 2_500_000


def test_rolling_distinct_counts_trailing_window(spark):
    """Users {a} on day 1, {a,b} on day 3: day-3 trailing-7 window sees
    both days; only observed days are reported."""
    d1, d3 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3)
    df = spark.createDataFrame(
        [("a", d1), ("a", d3), ("b", d3), ("a", d3)], ["user_id", "ts"]
    )
    rows = {r["wday"].day: r["n_active"] for r in
            rolling_distinct(df, "user_id", "ts", 7).collect()}
    assert rows == {1: 1, 3: 2}


def test_rolling_distinct_window_expiry(spark):
    """An event window_days-1 days back still counts; one more day out
    it expires."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", base),
            ("b", base + dt.timedelta(days=2)),
            ("c", base + dt.timedelta(days=3)),
        ],
        ["user_id", "ts"],
    )
    rows = {r["wday"].day: r["n_active"] for r in
            rolling_distinct(df, "user_id", "ts", 3).collect()}
    assert rows[1] == 1
    assert rows[3] == 2  # a (day 1) + b (day 3); c is day 4
    assert rows[4] == 2  # b (day 3) + c (day 4); a expired


def test_merge_apply_full_matrix(spark):
    """Matched-update, matched-delete, unmatched-insert, untouched."""
    target = spark.createDataFrame(
        [(1, "keep"), (2, "update-me"), (3, "delete-me")], ["k", "v"]
    )
    source = spark.createDataFrame(
        [(2, "updated", "upsert"), (3, None, "delete"), (9, "new", "upsert")],
        ["k", "v", "op"],
    )
    out = {r["k"]: r["v"] for r in merge_apply(target, source, ["k"]).collect()}
    assert out == {1: "keep", 2: "updated", 9: "new"}


def test_ohlc_open_close_follow_event_time_not_value(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(0, 5), 30.0, 101),
            (1, _ts(0, 1), 10.0, 100),  # earliest -> open
            (1, _ts(0, 9), 20.0, 102),  # latest -> close
        ],
        ["user_id", "ts", "value", "event_id"],
    )
    r = ohlc_resample(df, "user_id", "ts", "value", "event_id").collect()[0]
    assert (r["open6"], r["high6"], r["low6"], r["close6"]) == (
        10_000_000,
        30_000_000,
        10_000_000,
        20_000_000,
    )


def test_bm25_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        bm25_search(df, "text", "doc_id", [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_search(df, "text", "doc_id", ["a", "a"])
    with pytest.raises(ValueError, match="quarter"):
        bm25_search(df, "text", "doc_id", ["a"], k1=1.2)


def test_bm25_rarer_term_outranks_common_term(spark):
    """Two docs, same length; 'rare' appears in one doc, 'common' in
    both: the rare-term doc must outscore the common-only doc."""
    df = spark.createDataFrame(
        [(1, "rare pad pad pad"), (2, "common pad pad pad"),
         (3, "common filler filler filler")],
        ["doc_id", "text"],
    )
    out = bm25_search(df, "text", "doc_id", ["rare", "common"], top_n=3)
    rows = out.collect()
    assert rows[0]["doc_id"] == 1
    assert {r["doc_id"] for r in rows} == {1, 2, 3}


def test_bm25_plan_constant_in_query_length(spark):
    """The score fold's plan shape must not grow with |query| (r10
    verdict ask #7): no per-term max(CASE WHEN) aggregate branches —
    one map-collect aggregate whatever the term count — and a 12-term
    query must still score correctly."""
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 pad"), (2, "t0 pad pad pad")], ["doc_id", "text"]
    )

    def plan(terms):
        q = bm25_search(df, "text", "doc_id", terms)
        return q._jdf.queryExecution().optimizedPlan().toString()

    p3 = plan(["t0", "t1", "t2"])
    p12 = plan([f"t{i}" for i in range(12)])
    assert p3.count("CASE WHEN") == p12.count("CASE WHEN")
    # one aggregate function regardless of query width
    assert p3.count("collect_list") == p12.count("collect_list") == 1
    rows = bm25_search(
        df, "text", "doc_id", [f"t{i}" for i in range(12)], top_n=2
    ).collect()
    assert rows[0]["doc_id"] == 1  # matches three terms vs one


def test_prefix_filter_equals_full_join(spark, sf_dir):
    """Candidate pruning must not change the answer: prefix_filter_pairs
    == ngram_jaccard_pairs (no max_df) on the fixture corpus, pair for
    pair — the prefix theorem's completeness, checked empirically."""
    from data_analyse_marche_emploi_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )
    from data_analyse_marche_emploi_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    got = {
        (r["i"], r["j"]): (r["common"], r["jaccard6"])
        for r in prefix_filter_pairs(
            d, "text", "doc_id", n=3, threshold=(1, 2)
        ).collect()
    }
    # value exactness (common, jaccard6) is pinned by the DuckDB
    # differential oracle; here the dual-implementation compare checks
    # the PAIR SET plus threshold/floor-division consistency
    want = {
        (r["i"], r["j"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            d, "text", "doc_id", n=3, threshold=0.5, max_df=None
        ).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for pair, (common, j6) in got.items():
        assert j6 >= 500_000 and common > 0
        # integer floor-division vs the double ratio: within one unit
        assert abs(j6 - int(want[pair] * 1_000_000)) <= 1


def test_prefix_filter_rejects_bad_threshold(spark):
    from data_analyse_marche_emploi_spark.operators.dedup import (
        prefix_filter_pairs,
    )
    import pytest

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="rational"):
        prefix_filter_pairs(df, "text", "doc_id", threshold=(3, 2))
    with pytest.raises(ValueError, match="rational"):
        prefix_filter_pairs(df, "text", "doc_id", threshold=(0, 2))


def test_pareto_frontier_hand_case(spark):
    """Dominance matrix incl. both-coordinate ties and a cross-bucket
    pair (width=10 puts p=5 and p=15 in different buckets)."""
    from data_analyse_marche_emploi_spark.operators.aggregates import (
        pareto_frontier_2d,
    )

    pts = [
        (1, 5, 100),   # frontier (cheapest)
        (2, 15, 100),  # dominated by 1 cross-bucket (p>, d==)
        (3, 15, 200),  # frontier (more recent than anything cheaper)
        (4, 15, 200),  # exact tie with 3 -> both survive
        (5, 17, 150),  # dominated in-bucket by 3 (p>, d<)
        (6, 25, 300),  # frontier
        (7, 5, 90),    # dominated by 1 at equal price (d<)
    ]
    df = spark.createDataFrame(pts, ["id", "p", "d"])
    keep = {r["id"] for r in
            pareto_frontier_2d(df, "p", "d", bucket_width=10).collect()}
    assert keep == {1, 3, 4, 6}


def test_pareto_frontier_matches_quadratic_def(spark):
    """Bucketed two-phase == brute-force NOT EXISTS dominance on a
    seeded random cloud (crosses many buckets)."""
    import random

    from data_analyse_marche_emploi_spark.operators.aggregates import (
        pareto_frontier_2d,
    )

    rng = random.Random(42)
    pts = [(i, rng.randrange(0, 1000), rng.randrange(0, 1000))
           for i in range(300)]
    brute = {
        i for i, p, d in pts
        if not any(
            (q <= p and e >= d and (q < p or e > d)) for _, q, e in pts
        )
    }
    df = spark.createDataFrame(pts, ["id", "p", "d"])
    keep = {r["id"] for r in
            pareto_frontier_2d(df, "p", "d", bucket_width=64).collect()}
    assert keep == brute


def test_exact_median_int_mode_no_roundtrip_loss(spark):
    """values_are_int selects int64 domains AS IS — the float detour
    floor((249/1e6)*1e6) == 248 must not happen."""
    from data_analyse_marche_emploi_spark.operators.aggregates import (
        exact_median_2pass,
    )

    df = spark.createDataFrame(
        [("g", 249), ("g", 249), ("g", 1000)], ["k", "d6"]
    )
    r = exact_median_2pass(df, "k", "d6", values_are_int=True).collect()[0]
    assert r["median6"] == 249


def test_ohlc_missing_values_are_missing(spark):
    """NULL/NaN-valued events don't enter the bar: n counts priced
    events, open/close skip them, an all-missing bucket emits no bar."""
    df = spark.createDataFrame(
        [
            (1, _ts(0, 1), None, 100),
            (1, _ts(0, 5), 5.0, 101),
            (1, _ts(0, 9), float("nan"), 102),
            (2, _ts(0, 0), None, 200),  # all-missing bucket
        ],
        "user_id int, ts timestamp, value double, event_id int",
    )
    rows = ohlc_resample(df, "user_id", "ts", "value", "event_id").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1 and r["n"] == 1
    assert r["open6"] == r["close6"] == 5_000_000


def test_weighted_percentile_hand_cases(spark):
    """Weight concentration beats row counts; zero weights never
    selected unless the crossing lands inside their value run."""
    from data_analyse_marche_emploi_spark.operators.aggregates import (
        exact_weighted_percentiles_2pass,
    )

    # group a: value 1.0 carries 9 of 10 weight units -> every p<=0.9
    # selects 1.0 even though 2.0 has more ROWS in a count world
    rows = [("a", 1.0, 9), ("a", 2.0, 1)] + [("b", float(i), 1) for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    out = {
        (r["k"], r["p"]): r["value6"]
        for r in exact_weighted_percentiles_2pass(
            df, "k", "v", "w", [0.5, 0.9, 1.0]
        ).collect()
    }
    assert out[("a", 0.5)] == 1_000_000
    assert out[("a", 0.9)] == 1_000_000   # 9/10 >= 0.9 exactly
    assert out[("a", 1.0)] == 2_000_000
    # group b: uniform weights == unweighted percentile_disc
    assert out[("b", 0.5)] == 2_000_000   # rank 2 of 4
    assert out[("b", 1.0)] == 4_000_000


def test_weighted_percentile_zero_weight_and_missing(spark):
    from data_analyse_marche_emploi_spark.operators.aggregates import (
        exact_weighted_percentiles_2pass,
    )

    df = spark.createDataFrame(
        [("g", 0.5, 0), ("g", 1.0, 2), ("g", None, 99), ("g", 2.0, 2)],
        "k string, v double, w int",
    )
    out = {
        r["p"]: r["value6"]
        for r in exact_weighted_percentiles_2pass(
            df, "k", "v", "w", [0.5, 1.0]
        ).collect()
    }
    # missing value's 99 weight never enters W=4; the zero-weight 0.5
    # row cannot absorb the crossing
    assert out[0.5] == 1_000_000 and out[1.0] == 2_000_000
