"""Round-7 operators: clustering coefficient, streaming source, etc."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_clustering_coefficient_hand_graph(spark):
    """K4 minus one edge, plus a pendant: closed-form coefficients.
    Nodes: 1-2, 1-3, 1-4, 2-3, 2-4 (no 3-4 edge), 4-5 pendant.
    Triangles: (1,2,3) and (1,2,4).
    deg: 1->4? no: 1:{2,3,4}=3, 2:{1,3,4}=3, 3:{1,2}=2, 4:{1,2,5}=3,
    5:{4}=1 (excluded).
    tri: 1:2, 2:2, 3:1, 4:1.
    coef6 = tri*2e6 div (deg*(deg-1)): 1: 4e6 div 6 = 666666;
    2: 666666; 3: 2e6 div 2 = 1000000; 4: 2e6 div 6 = 333333."""
    from data_analyse_marche_emploi_spark.operators.baskets import (
        clustering_coefficient,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (4, 5)],
        "src long, dst long",
    )
    got = {
        r["node"]: (r["deg"], r["tri_cnt"], r["coef6"])
        for r in clustering_coefficient(edges).collect()
    }
    assert got == {
        1: (3, 2, 666666),
        2: (3, 2, 666666),
        3: (2, 1, 1000000),
        4: (3, 1, 333333),
    }


def test_clustering_coefficient_no_cartesian(spark):
    from data_analyse_marche_emploi_spark.operators.baskets import (
        clustering_coefficient,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = (
        clustering_coefficient(edges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
