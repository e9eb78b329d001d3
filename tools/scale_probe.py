"""Scale probe: generate 10× and skewed variants of the sf0.1 fixtures
under .scale_test/ and measure how the headline plans scale. Results
documented in docs/SCALING.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_analyse_marche_emploi_spark.operators import aggregates as AGG  # noqa: E402
from data_analyse_marche_emploi_spark.operators.skew import (  # noqa: E402
    salted_agg_count_sum,
)
from data_analyse_marche_emploi_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = ".scale_test"


def generate() -> None:
    import duckdb

    os.makedirs(f"{OUT}/sf1x", exist_ok=True)
    os.makedirs(f"{OUT}/sf10x", exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
    COPY (
      SELECT l_orderkey + r.k * 2000000 AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{SRC}/lineitem.parquet'), (SELECT unnest(range(10)) AS k) r
    ) TO '{OUT}/sf10x/lineitem.parquet' (FORMAT parquet)""")
    con.sql(f"""
    COPY (
      SELECT o_orderkey + r.k * 2000000 AS o_orderkey, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet'), (SELECT unnest(range(10)) AS k) r
    ) TO '{OUT}/sf10x/orders.parquet' (FORMAT parquet)""")
    for t in ("lineitem", "orders"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/sf1x/{t}.parquet' (FORMAT parquet)"
        )
    con.sql(f"""
    COPY (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE o_custkey END AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{OUT}/sf10x/orders.parquet')
    ) TO '{OUT}/sf10x/orders_skewed.parquet' (FORMAT parquet)""")


def main() -> None:
    if not os.path.exists(f"{OUT}/sf10x/lineitem.parquet"):
        generate()
    spark = get_spark("scale-probe", extra_conf={
        "spark.driver.memory": "12g",
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    })
    spark.range(100_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    def bench(df):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    def pricing(li):
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                AGG.money_sum(F.col("l_quantity"), "sum_qty"),
                AGG.money_sum(F.col("l_extendedprice"), "sum_base_price"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    def factjoin(li, o):
        return (
            li.select("l_orderkey", "l_extendedprice")
            .join(
                o.select("o_orderkey", "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                AGG.money_sum(F.col("l_extendedprice"), "sum_price"),
            )
        )

    for scale in ("sf1x", "sf10x"):
        li = spark.read.parquet(f"{OUT}/{scale}/lineitem.parquet")
        o = spark.read.parquet(f"{OUT}/{scale}/orders.parquet")
        print(scale, "pricing", bench(pricing(li)), "factjoin", bench(factjoin(li, o)))

    osk = spark.read.parquet(f"{OUT}/sf10x/orders_skewed.parquet")
    plain = osk.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast(AGG.MONEY)).alias("total"),
    )
    salted = salted_agg_count_sum(
        osk, "o_custkey", F.col("o_totalprice").cast(AGG.MONEY), n_salts=32
    )
    print("skew plain", bench(plain), "salted", bench(salted))


if __name__ == "__main__":
    main()
