"""Salting operators: equivalence with unsalted plans and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.operators.skew import (
    salted_agg_count_sum,
    salted_broadcast_join,
    with_salt,
)
from data_analyse_marche_emploi_spark.tables import load_table


def test_salt_is_deterministic_and_bounded(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    s1 = with_salt(o, 16).select("__salt")
    assert s1.filter((F.col("__salt") < 0) | (F.col("__salt") >= 16)).count() == 0
    # deterministic: same rows → same salts on re-evaluation
    a = with_salt(o, 16).groupBy("__salt").count().collect()
    b = with_salt(o, 16).groupBy("__salt").count().collect()
    assert sorted((r["__salt"], r["count"]) for r in a) == sorted(
        (r["__salt"], r["count"]) for r in b
    )


def test_salted_agg_equals_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    got = salted_agg_count_sum(o, "o_custkey", F.col("o_totalprice"), n_salts=8)
    want = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("o_totalprice").alias("total")
    )
    g = {(r.o_custkey, r.cnt, round(r.total, 2)) for r in got.collect()}
    w = {(r.o_custkey, r.cnt, round(r.total, 2)) for r in want.collect()}
    assert g == w


def test_salted_agg_is_two_stage(spark, sf_dir):
    """The salted plan must contain two aggregate exchanges (key+salt,
    then key) — that's the skew-spreading structure."""
    o = load_table(spark, sf_dir, "orders")
    plan = (
        salted_agg_count_sum(o, "o_custkey", F.col("o_totalprice"), n_salts=8)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Aggregate") >= 2


def test_salted_join_equals_plain(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    got = (
        salted_broadcast_join(c, n, "c_nationkey", "n_nationkey", n_salts=4)
        .groupBy("n_name").count()
    )
    want = c.join(n, c["c_nationkey"] == n["n_nationkey"]).groupBy("n_name").count()
    assert {(r.n_name, r["count"]) for r in got.collect()} == {
        (r.n_name, r["count"]) for r in want.collect()
    }
