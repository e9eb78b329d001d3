"""Mergeable-sketch semantics: error bounds vs exact answers, and the
merge-invariance properties the two-level rollup pattern depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.operators.sketches import (
    hll_cells,
    hll_rollup,
    kll_cells,
    kll_rollup_quantiles,
    theta_distinct,
)
from data_analyse_marche_emploi_spark.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    df = load_table(spark, SF_SMOKE, "events").cache()
    yield df
    df.unpersist()


def exact_distinct(events) -> dict[str, int]:
    return {
        r["event_type"]: r["nd"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }


def test_hll_two_level_equals_direct(events):
    """HLL registers are max-merged → building per-month sketches and
    unioning them must give the SAME estimate as one pass over the raw
    stream. This is the property that makes persisted daily sketches a
    lossless substitute for re-scanning raw data at any rollup grain."""
    e = events.withColumn("month", F.date_trunc("month", F.col("ts")))
    rolled = {
        r["event_type"]: r["distinct_est"]
        for r in hll_rollup(
            hll_cells(e, ["month", "event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    direct = {
        r["event_type"]: r["distinct_est"]
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("distinct_est")
        )
        .collect()
    }
    assert rolled == direct


def test_hll_estimate_is_partition_invariant(events):
    """Register max-merge is order/partition-insensitive: the estimate
    must be bit-identical however the rows were distributed — the
    determinism contract a distributed pipeline needs for reruns."""
    def est(df):
        return {
            r["event_type"]: r["distinct_est"]
            for r in hll_rollup(
                hll_cells(df, ["event_type"], "user_id"), ["event_type"]
            ).collect()
        }

    assert est(events.repartition(3)) == est(events.repartition(11))


def test_hll_error_bound(events):
    """lgK=12 → RSE ≈ 1.6%; allow 3σ."""
    exact = exact_distinct(events)
    rolled = {
        r["event_type"]: r["distinct_est"]
        for r in hll_rollup(
            hll_cells(
                events.withColumn("month", F.date_trunc("month", F.col("ts"))),
                ["month", "event_type"],
                "user_id",
            ),
            ["event_type"],
        ).collect()
    }
    assert rolled.keys() == exact.keys()
    for k, nd in exact.items():
        assert abs(rolled[k] - nd) <= max(1, 0.05 * nd), (k, rolled[k], nd)


def test_theta_error_bound(events):
    exact = exact_distinct(events)
    got = {
        r["event_type"]: r["distinct_est"]
        for r in theta_distinct(events, ["event_type"], "user_id").collect()
    }
    assert got.keys() == exact.keys()
    for k, nd in exact.items():
        assert abs(got[k] - nd) <= max(1, 0.05 * nd), (k, got[k], nd)


def test_kll_rollup_rank_error(spark):
    """The merged sketch's quantile values must sit within ~3% rank
    error of the requested probabilities (k=200 ⇒ ε≈1.7%, doubled for
    merge slack): check by computing the TRUE rank of each estimated
    quantile value."""
    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "month", F.date_trunc("month", F.col("o_orderdate"))
    )
    probs = [0.25, 0.5, 0.75, 0.95]
    row = kll_rollup_quantiles(kll_cells(o, ["month"], "o_totalprice"), [], probs).first()
    n = o.count()
    for p in probs:
        v = row[f"q_{int(round(p * 100)):02d}"]
        true_rank = o.filter(F.col("o_totalprice") <= v).count() / n
        assert abs(true_rank - p) <= 0.035, (p, v, true_rank)


def test_theta_algebra_error_bound(events):
    """Theta union/intersection/difference estimates within 5% of the
    exact join-based answers."""
    from data_analyse_marche_emploi_spark.operators.sketches import (
        theta_segment_algebra,
    )

    clicks = {
        r["user_id"]
        for r in events.filter(F.col("event_type") == "click")
        .select("user_id").distinct().collect()
    }
    buys = {
        r["user_id"]
        for r in events.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct().collect()
    }
    row = theta_segment_algebra(events, "event_type", "user_id", "click", "purchase").first()
    exact = {
        "union_est": len(clicks | buys),
        "intersect_est": len(clicks & buys),
        "a_minus_b_est": len(clicks - buys),
        "b_minus_a_est": len(buys - clicks),
    }
    for col, want in exact.items():
        assert abs(row[col] - want) <= max(1, 0.05 * want), (col, row[col], want)


def test_freq_items_exact_and_bounded_candidates(spark):
    from data_analyse_marche_emploi_spark.operators.sketches import freq_items

    # skewed stream: two heavy items, long uniform tail, shuffled
    # across partitions so no single partition sees a clean majority
    import random

    rng = random.Random(7)
    vals = ["hot1"] * 400 + ["hot2"] * 250 + [f"t{i}" for i in range(900)]
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "item string").repartition(8)
    k = 10  # threshold n/k = 155
    got = {r["item"]: r["n_occurrences"] for r in freq_items(df, "item", k).collect()}
    assert got == {"hot1": 400, "hot2": 250}
    # below-threshold heavy-ish item is excluded at k where it misses
    got2 = {r["item"] for r in freq_items(df, "item", 4).collect()}  # n/4 = 387
    assert got2 == {"hot1"}


def test_freq_items_long_column(spark):
    from data_analyse_marche_emploi_spark.operators.sketches import freq_items

    df = spark.createDataFrame(
        [(i,) for i in [7] * 50 + list(range(100))], "user_id long"
    ).repartition(4)
    got = {r["item"]: r["n_occurrences"] for r in freq_items(df, "user_id", 3).collect()}
    assert got == {7: 51}  # 51 of 151 total > 151/3 ~ 50.3


def test_freq_items_nullable_long_with_nans(spark):
    """Arrow->pandas renders nullable-numeric NULLs as NaN; a NaN must
    never occupy an MG slot (it would trigger decrements against a
    null-excluding total) nor reach the LongType candidate cast."""
    from data_analyse_marche_emploi_spark.operators.sketches import freq_items

    rows = [(7,)] * 50 + [(i,) for i in range(60)] + [(None,)] * 200
    df = spark.createDataFrame(rows, "user_id long").repartition(4)
    # total = count(user_id) = 110 non-null (NaNs excluded both sides);
    # 7 occurs 50 + 1 (from range(60)) = 51 > 110/3 ~ 36.7
    got = {r["item"]: r["n_occurrences"] for r in freq_items(df, "user_id", 3).collect()}
    assert got == {7: 51}


# --- count-min ------------------------------------------------------------


def test_cms_one_sided_and_bounded(events):
    """CMS never undercounts; overcount is bounded by eps * N (the
    guarantee is probabilistic at confidence=0.99, but with 5 distinct
    items vs width ~2719 collisions are impossible, so the bound holds
    surely here)."""
    from data_analyse_marche_emploi_spark.operators.sketches import cms_estimates

    out = cms_estimates(events, "event_type", eps=0.001, seed=42).collect()
    n = sum(r["exact"] for r in out)
    assert len(out) > 1
    for r in out:
        assert r["over"] >= 0, "CMS must never undercount"
        assert r["over"] <= 0.001 * n + 1


def test_cms_partition_invariant(events):
    """Counter addition commutes: the estimates are identical no
    matter how the input is partitioned (merge correctness)."""
    from data_analyse_marche_emploi_spark.operators.sketches import cms_estimates

    a = sorted(
        tuple(r) for r in cms_estimates(events, "event_type", seed=7).collect()
    )
    b = sorted(
        tuple(r)
        for r in cms_estimates(
            events.repartition(13, "user_id"), "event_type", seed=7
        ).collect()
    )
    assert a == b


def test_cms_probe_items_subset(events):
    from data_analyse_marche_emploi_spark.operators.sketches import cms_estimates

    out = cms_estimates(
        events, "event_type", probe_items=["click", "purchase"]
    ).collect()
    assert sorted(r["item"] for r in out) == ["click", "purchase"]


def test_cms_collisions_stay_one_sided(spark):
    """Force collisions (tiny width via large eps, 2000 distinct keys):
    estimates may exceed exact but never undercut it."""
    from data_analyse_marche_emploi_spark.operators.sketches import cms_estimates

    df = spark.range(4000).select(
        (F.col("id") % 2000).cast("string").alias("k")
    )
    out = cms_estimates(df, "k", eps=0.1, confidence=0.9, seed=3).collect()
    assert len(out) == 2000
    assert all(r["exact"] == 2 for r in out)
    assert all(r["est"] >= 2 for r in out)
    assert any(r["over"] > 0 for r in out), "tiny width must actually collide"


def test_cms_absent_probe_key_gets_zero_row(events):
    """A probed key with no occurrences must still get a row
    (exact=0) — a cold key and a typo'd key must be distinguishable,
    and the sketch's overcount on an absent key is the collision
    signal."""
    from data_analyse_marche_emploi_spark.operators.sketches import cms_estimates

    out = {
        r["item"]: r
        for r in cms_estimates(
            events, "event_type", probe_items=["click", "no_such_event"]
        ).collect()
    }
    assert set(out) == {"click", "no_such_event"}
    assert out["no_such_event"]["exact"] == 0
    assert out["no_such_event"]["est"] >= 0
