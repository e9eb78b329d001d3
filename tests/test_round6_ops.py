"""Semantic + plan tests for the round-6 operators: directed
containment dedup, GROUPING SETS / unpivot / mode aggregation, and the
deterministic time-series smoothers (trailing RANGE stats, truncated
EWMA). Oracle parity for the catalog entries is covered by
test_oracle_parity; these pin hand-computed semantics and the scale
shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.operators.dedup import containment_pairs
from data_analyse_marche_emploi_spark.operators.windows import (
    ewma,
    ewma_weighted_sum_expr,
    trailing_range_stats,
)


def test_containment_asymmetric_quote(spark):
    """A short doc fully quoted inside a long one: containment
    short→long = 1.0 while long→short is far below — the class Jaccard
    misses. 3-gram shingles."""
    short = "alpha beta gamma delta"                      # 2 shingles
    long_ = short + " eps zeta eta theta iota kappa lam"  # 9 shingles
    docs = spark.createDataFrame([(1, short), (2, long_)], ["doc_id", "text"])
    rows = {
        (r["src"], r["dst"]): r
        for r in containment_pairs(
            docs, "text", "doc_id", n=3, threshold=0.0
        ).collect()
    }
    assert rows[(1, 2)]["containment6"] == 1_000_000  # fully contained
    assert rows[(1, 2)]["common"] == 2
    assert rows[(2, 1)]["containment6"] == 2_000_000 // 9
    # threshold keeps only the contained direction
    kept = containment_pairs(docs, "text", "doc_id", n=3, threshold=0.5).collect()
    assert [(r["src"], r["dst"]) for r in kept] == [(1, 2)]


def test_containment_no_cartesian(spark):
    docs = spark.createDataFrame(
        [(i, f"a b c d{i} e{i}") for i in range(10)], ["doc_id", "text"]
    )
    plan = (
        containment_pairs(docs, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_trailing_range_stats_hand_case(spark):
    """Events at t=0s, 30s, 3600s, 7201s with value 1.0 each: the 1-h
    trailing frame holds {1}, {1,2}, {1,2,3} (0s is exactly 3600s
    before — RANGE is inclusive), then {4} alone."""
    rows = [
        (1, "2024-01-01 00:00:00", 7, 1.0),
        (2, "2024-01-01 00:00:30", 7, 1.0),
        (3, "2024-01-01 01:00:00", 7, 1.0),
        (4, "2024-01-01 02:00:01", 7, 1.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_id"]: (r["n_w"], r["sum6_w"], r["avg6_w"])
        for r in trailing_range_stats(df, "user_id", "ts", "value").collect()
    }
    assert out == {
        1: (1, 1_000_000, 1_000_000),
        2: (2, 2_000_000, 1_000_000),
        3: (3, 3_000_000, 1_000_000),
        4: (1, 1_000_000, 1_000_000),
    }


def test_ewma_matches_python_reference(spark):
    """depth-3 EWMA vs an exact Python integer replay of the same
    fixed-point sum (nano-weights, trailing integer division) — the
    arithmetic is pure int64, so equality is exact, not ±ulp."""
    from data_analyse_marche_emploi_spark.operators.windows import (
        ewma_weight_nanos,
    )

    vals = [10.0, 20.0, 5.0, 40.0, 12.5]
    rows = [
        (i, f"2024-01-01 00:0{i}:00", 1, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_id"]: r["ewma6"]
        for r in ewma(df, "user_id", "ts", "event_id", "value", 0.3, 3).collect()
    }
    import math

    w = ewma_weight_nanos(0.3, 3)
    v6 = [math.floor(v * 1e6) for v in vals]
    expected = {
        t: (w[0] * v6[t] + w[1] * v6[t - 1] + w[2] * v6[t - 2])
        // 1_000_000_000
        for t in range(2, len(vals))
    }
    assert out == expected


def test_ewma_drops_warmup_prefix(spark):
    rows = [(i, f"2024-01-01 00:0{i}:00", 1, 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        r["event_id"]
        for r in ewma(df, "user_id", "ts", "event_id", "value", 0.3, 4).collect()
    )
    assert got == [3, 4]  # first 3 rows lack a full 4-lag window


def test_ewma_expr_fixed_point_integer_weights():
    e = ewma_weighted_sum_expr(["v", "l1", "l2"], 0.5, int_div="div")
    assert e == (
        "CAST((((CAST(500000000 AS BIGINT) * v"
        " + CAST(250000000 AS BIGINT) * l1)"
        " + CAST(125000000 AS BIGINT) * l2)) div 1000000000 AS BIGINT)"
    )
    # the DuckDB twin differs ONLY in the integer-division spelling
    d = ewma_weighted_sum_expr(["v", "l1", "l2"], 0.5, int_div="//")
    assert d == e.replace(" div 1000000000", " // 1000000000")


def test_grouping_sets_one_expand_no_union(spark, sf_dir):
    """GROUPING SETS must compile to a single Expand + aggregate over
    one scan — not a union of three scans."""
    from data_analyse_marche_emploi_spark import catalog

    plan = (
        catalog.QUERIES["agg_grouping_sets"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in plan
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 1


def test_unpivot_single_scan(spark, sf_dir):
    from data_analyse_marche_emploi_spark import catalog

    plan = (
        catalog.QUERIES["unpivot_measures"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 1


def test_important_parts_broadcasts_threshold_only(spark, sf_dir):
    """The one-row threshold aggregate rides a broadcast; the per-part
    aggregate itself must NOT be broadcast-joined against lineitem
    (it is part-cardinality-sized — unbounded at corpus scale)."""
    from data_analyse_marche_emploi_spark import catalog

    plan = (
        catalog.QUERIES["q_important_parts"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan
    # supplier∩nation dim join + one-row total both broadcast: ≥2 BHJ
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2


def test_pca_fit_properties(spark):
    """Orthonormal sign-pinned basis; variances sorted descending and
    matching numpy's full eigendecomposition on the same data."""
    import numpy as np
    from data_analyse_marche_emploi_spark.operators.similarity import pca_fit
    from data_analyse_marche_emploi_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    mean, comps, var = pca_fit(e, "embedding", k=4)
    x = np.array([r["embedding"] for r in e.select("embedding").collect()],
                 dtype=np.float64)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-10)
    # orthonormality
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-10)
    # descending explained variance, equal to numpy's
    assert var[0] >= var[1] >= var[2] >= var[3] > 0
    ref = np.linalg.eigh(np.cov(x, rowvar=False))[0][::-1][:4]
    np.testing.assert_allclose(var, ref, rtol=1e-8)
    # sign pin: the largest-|component| entry of each axis is positive
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_project_matches_numpy(spark):
    import numpy as np
    from data_analyse_marche_emploi_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )
    from data_analyse_marche_emploi_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    mean, comps, _ = pca_fit(e, "embedding", k=4)
    got = {
        r["vec_id"]: np.asarray(r["proj6"])
        for r in pca_project(e, "embedding", "vec_id", k=4).collect()
    }
    rows = e.select("vec_id", "embedding").collect()
    for r in rows[:50]:
        ref = np.floor((np.asarray(r["embedding"]) - mean) @ comps.T * 1e6)
        # same float64 math modulo summation order: buckets may sit 1
        # apart only exactly at a boundary — allow ±1 micro-unit
        assert np.max(np.abs(got[r["vec_id"]] - ref)) <= 1


def test_ewma_rejects_degenerate_params(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, 1.0)],
        ["event_id", "ts", "user_id", "value"],
    )
    with _pytest.raises(ValueError, match="depth"):
        ewma(df, "user_id", "ts", "event_id", "value", 0.3, 1)
    with _pytest.raises(ValueError, match="alpha"):
        ewma(df, "user_id", "ts", "event_id", "value", 1.5, 3)


def test_pca_fit_rejects_tiny_input(spark):
    import pytest as _pytest

    from data_analyse_marche_emploi_spark.operators.similarity import pca_fit

    one = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    with _pytest.raises(ValueError, match="at least 2"):
        pca_fit(one, "embedding", k=1)
    with _pytest.raises(ValueError, match="at least 2"):
        pca_fit(one.filter("vec_id < 0"), "embedding", k=1)


def test_stream_minhash_state_order_insensitive():
    """MIN-merge state: feeding the same rows as one batch, two batches,
    or two batches in reverse order must land the identical signature —
    the property that makes the streaming entry batch-replayable."""
    import pandas as pd

    from data_analyse_marche_emploi_spark.streaming.stateful import (
        MINHASH_K,
        _update_minhash,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    rows = [f'{{"k": {i}}}' for i in range(17)]

    def run(batches):
        st = FakeState()
        out = None
        for b in batches:
            out = list(
                _update_minhash((7,), iter([pd.DataFrame({"props": b})]), st)
            )[-1]
        return list(out["minhash"])

    one = run([rows])
    two = run([rows[:5], rows[5:]])
    rev = run([rows[5:], rows[:5]])
    assert one == two == rev
    assert len(one) == MINHASH_K


def test_exact_median_2pass_hand_cases(spark):
    """Odd and even group sizes, duplicate values, and values straddling
    bucket boundaries: the two-pass selection must return exactly the
    percentile_disc(0.5) value (rank ceil(n/2)) in every case."""
    from data_analyse_marche_emploi_spark.operators.aggregates import (
        exact_median_2pass,
    )

    rows = (
        [("odd", v) for v in [5.0, 1.0, 9.0]]                 # median 5
        + [("even", v) for v in [4.0, 1.0, 2.0, 3.0]]         # rank 2 -> 2
        + [("dups", v) for v in [7.0, 7.0, 7.0, 1.0, 9.0]]    # median 7
        + [("wide", v) for v in [0.5, 1.5, 2.5, 470.0, 480.0]]  # buckets apart
    )
    df = spark.createDataFrame(rows, ["event_type", "value"])
    got = {
        r["event_type"]: r["median6"]
        for r in exact_median_2pass(df, "event_type", "value").collect()
    }
    assert got == {
        "odd": 5_000_000,
        "even": 2_000_000,
        "dups": 7_000_000,
        "wide": 2_500_000,
    }


def test_exact_median_2pass_null_and_nan_are_missing(spark):
    """NULL/NaN values are ignored like percentile_disc ignores them; a
    NULL group key survives the refinement join; an all-missing group
    still emits its (key, NULL) row."""
    from data_analyse_marche_emploi_spark.operators.aggregates import (
        exact_median_2pass,
    )

    rows = [
        ("a", 1.0), ("a", None), ("a", 3.0), ("a", 5.0),
        (None, 2.0), (None, 4.0),
        ("empty", None), ("empty", float("nan")),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        r["event_type"]: r["median6"]
        for r in exact_median_2pass(df, "event_type", "value").collect()
    }
    assert got == {"a": 3_000_000, None: 2_000_000, "empty": None}


def test_containment_dominates_jaccard(spark):
    """Cross-operator invariant: for every doc pair, containment in
    EITHER direction >= their Jaccard (|A∩B|/|A| >= |A∩B|/|A∪B|) and
    every Jaccard pair appears in the containment output — catches a
    posting-list consumer silently dropping or under-scoring pairs."""
    from data_analyse_marche_emploi_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from data_analyse_marche_emploi_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    jac = {
        (r["i"], r["j"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect()
    }
    cont = {
        (r["src"], r["dst"]): r["containment6"]
        for r in containment_pairs(docs, "text", "doc_id", threshold=0.0).collect()
    }
    assert jac, "fixture should contain near-dup pairs at 0.3"
    for (i, j), jv in jac.items():
        ci = cont.get((i, j))
        cj = cont.get((j, i))
        assert ci is not None and cj is not None
        assert ci >= int(jv * 1e6) - 1  # containment >= jaccard (1e-6 grid)
        assert cj >= int(jv * 1e6) - 1


def test_exact_percentiles_multi_p_and_boundaries(spark):
    """len(ps)>1 in one pass: same-bucket percentiles rank
    independently, and the p=0.25/n=4 double-compare boundary picks
    rank 1 (cume_dist 1/4 >= 0.25), exactly like percentile_disc."""
    from data_analyse_marche_emploi_spark.operators.aggregates import (
        exact_percentiles_2pass,
    )

    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + [
        ("b", v) for v in [0.1, 0.2, 0.3]  # all three in bucket 0
    ]
    df = spark.createDataFrame(rows, ["event_type", "value"])
    got = {
        (r["event_type"], r["p"]): r["value6"]
        for r in exact_percentiles_2pass(
            df, "event_type", "value", [0.25, 0.5, 1.0]
        ).collect()
    }
    assert got == {
        ("a", 0.25): 1_000_000,  # rank 1: 1/4 >= 0.25 (boundary)
        ("a", 0.5): 2_000_000,
        ("a", 1.0): 4_000_000,
        ("b", 0.25): 100_000,
        ("b", 0.5): 200_000,   # same bucket as p=0.25/1.0 — independent
        ("b", 1.0): 300_000,
    }


def test_exact_percentiles_rejects_degenerate_lists(spark):
    import pytest as _pytest

    from data_analyse_marche_emploi_spark.operators.aggregates import (
        exact_percentiles_2pass,
    )

    df = spark.createDataFrame([("a", 1.0)], ["event_type", "value"])
    with _pytest.raises(ValueError, match="at least one"):
        exact_percentiles_2pass(df, "event_type", "value", [])
    with _pytest.raises(ValueError, match="duplicate"):
        exact_percentiles_2pass(df, "event_type", "value", [0.5, 0.5])
    with _pytest.raises(ValueError, match="in \\(0, 1\\]"):
        exact_percentiles_2pass(df, "event_type", "value", [1.5])
