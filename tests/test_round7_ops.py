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


def _write_single_parquet(rows, path):
    """The fixture transport reads ONE parquet file (duckdb
    read_parquet on a path), not a Spark output directory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "o_orderkey": [r["o_orderkey"] for r in rows],
            "o_orderstatus": [r["o_orderstatus"] for r in rows],
            "o_totalprice": [r["o_totalprice"] for r in rows],
        }
    )
    pq.write_table(tbl, path)


def _drain_paged_rest(spark, api_path, ck, out):
    from data_analyse_marche_emploi_spark.sources import datasource as DS

    DS.register(spark)
    sdf = (
        spark.readStream.format("paged_rest")
        .option("path", api_path)
        .option("order_col", "o_orderkey")
        .option("page_size", "37")
        .load()
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_paged_rest_resumes_from_cursor(spark, tmp_path):
    """The streaming connector's whole point: drain, grow the
    collection, drain again off the SAME checkpoint — the second run
    must deliver exactly the delta (no re-reads, no gaps). Cursor
    offsets live in the checkpoint; the API ordering is append-stable
    by o_orderkey."""
    api = str(tmp_path / "api.parquet")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    full = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )
    rows = full.collect()
    head, tail = rows[:100], rows[100:140]

    _write_single_parquet(head, api)
    _drain_paged_rest(spark, api, ck, out)
    got1 = spark.read.parquet(out)
    assert got1.count() == 100

    # the collection grows: 40 new orders, all with HIGHER keys
    _write_single_parquet(head + tail, api)
    _drain_paged_rest(spark, api, ck, out)
    got2 = spark.read.parquet(out)
    assert got2.count() == 140  # delta only: 100 + 40, no duplicates
    assert got2.select("o_orderkey").distinct().count() == 140
    want = {r["o_orderkey"] for r in head + tail}
    assert {r["o_orderkey"] for r in got2.collect()} == want


def test_stream_paged_rest_max_rows_per_batch(spark, tmp_path):
    """Admission control: maxRowsPerBatch bounds each micro-batch, and
    repeated availableNow drains still converge to the full
    collection (each run advances the cursor by at most the budget)."""
    from data_analyse_marche_emploi_spark.sources import datasource as DS

    DS.register(spark)
    api = str(tmp_path / "api.parquet")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    full = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(90)
    )
    _write_single_parquet(full.collect(), api)

    def drain_once():
        sdf = (
            spark.readStream.format("paged_rest")
            .option("path", api)
            .option("order_col", "o_orderkey")
            .option("page_size", "25")
            .option("maxRowsPerBatch", "40")
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out).count()

    counts = [drain_once() for _ in range(3)]
    assert counts[-1] == 90, counts
    assert counts[0] < 90  # the budget actually bit on the first run


def test_clustering_coefficient_reuses_edge_exchange(spark, sf_dir):
    """The edge list feeds the degree branch plus the three wedge-close
    branches; the duplicate edge-building subtrees must collapse to
    ReusedExchange in the AQE final plan (SCALING.md's round-7 claim),
    or the op would pay the basket shuffle four times."""
    from data_analyse_marche_emploi_spark import catalog

    df = catalog.QUERIES["graph_clustering_coefficient"](spark, sf_dir)
    df.collect()  # AQE finalizes the plan only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 3


def test_pagerank_hand_graph(spark):
    """Path graph 1-2-3, 2 iterations, closed form (int fixed-point):
    r1 = (575000000, 1850000000, 575000000),
    r2 = (936250000, 1127500000, 936250000)."""
    from data_analyse_marche_emploi_spark.operators.baskets import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        r["node"]: r["rank9"]
        for r in pagerank(edges, iterations=2).collect()
    }
    assert got == {1: 936250000, 2: 1127500000, 3: 936250000}


def test_pagerank_conserves_rank_order_vs_degree(spark):
    """Star graph: the hub must outrank every leaf."""
    from data_analyse_marche_emploi_spark.operators.baskets import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    got = {r["node"]: r["rank9"] for r in pagerank(edges, iterations=3).collect()}
    hub = got[0]
    assert all(hub > v for n, v in got.items() if n != 0)


def test_q6_predicates_reach_the_scan(spark, sf_dir):
    """TPC-H Q6 is the pushdown showcase: all predicates must appear
    as PushedFilters on the parquet scan."""
    from data_analyse_marche_emploi_spark import catalog

    df = catalog.QUERIES["q_forecast_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)


def test_round7_entries_no_cartesian(spark, sf_dir):
    """Candidate generation in the round-7 graph/txlog entries must be
    keyed joins end-to-end — never a cartesian/nested-loop."""
    from data_analyse_marche_emploi_spark import catalog

    for name in ("graph_pagerank", "txlog_change_feed"):
        plan = (
            catalog.QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_html_strip_edge_cases(spark):
    """Nested angle text in scripts, entity decode order, comments,
    whitespace collapse."""
    from data_analyse_marche_emploi_spark.functions.web import html_strip

    rows = [
        ("<script>if(a<b){x='<div>'}</script>ok", "ok"),
        ("<style>p>a{}</style>kept", "kept"),
        ("a &amp;lt; b", "a &lt; b"),       # decode ORDER: amp last
        ("x<!-- <b>no</b> -->y", "x y"),
        ("a\t\n  b", "a b"),
        ("<p class='x'>t</p>", "t"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "h string")
    import pyspark.sql.functions as F

    got = [r[0] for r in df.select(html_strip(F.col("h"))).collect()]
    assert got == [want for _, want in rows]


def test_url_normalize_edge_cases(spark):
    from data_analyse_marche_emploi_spark.functions.web import url_normalize

    rows = [
        ("HTTP://Example.COM:80/a/?utm_source=x&b=1&a=2#f",
         "http://example.com/a?a=2&b=1"),
        ("https://Host.io:443/", "https://host.io/"),
        ("http://h.com", "http://h.com/"),
        ("http://h.com/p?fbclid=z&gclid=q&utm_medium=m",
         "http://h.com/p"),
        ("http://h.com:8080/x/", "http://h.com:8080/x"),  # non-default port kept
        ("http://h.com/p?b=2&a=1&a=0", "http://h.com/p?a=0&a=1&b=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "u string")
    import pyspark.sql.functions as F

    got = [r[0] for r in df.select(url_normalize(F.col("u"))).collect()]
    assert got == [want for _, want in rows]


def _py_url_normalize(u: str) -> str:
    """Independent pure-Python reference for url_normalize's spec."""
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^#]*)", u)
    scheme, host, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
    host = re.sub(r":80$", "", host)
    host = re.sub(r":443$", "", host)
    path = rest.split("?", 1)[0] or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    query = rest.split("?", 1)[1] if "?" in rest else ""
    params = [
        p
        for p in query.split("&")
        if p and not re.match(r"^(utm_[^=]*|fbclid|gclid)(=|$)", p)
    ]
    q = "&".join(sorted(params))
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


def test_url_normalize_random_differential(spark):
    """300 seeded random URLs (case, ports, utm noise, fragments,
    duplicate params, trailing slashes) — Spark column chain must
    equal the independent Python reference on every one."""
    import random

    import pyspark.sql.functions as F

    from data_analyse_marche_emploi_spark.functions.web import url_normalize

    rng = random.Random(1_2026)
    urls = []
    for _ in range(300):
        scheme = rng.choice(["http", "HTTP", "https", "HtTpS"])
        host = rng.choice(["Example.com", "a.B.c", "HOST.io"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        segs = "/".join(
            "".join(rng.choice("abcXYZ09") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(0, 3))
        )
        path = ("/" + segs if segs else "") + rng.choice(["", "/"])
        nq = rng.randint(0, 5)
        parts = []
        for _ in range(nq):
            k = rng.choice(["a", "b", "zz", "utm_source", "utm_x", "fbclid", "gclid"])
            parts.append(f"{k}={rng.randint(0, 9)}" if rng.random() < 0.8 else k)
        query = ("?" + "&".join(parts)) if parts else ""
        frag = rng.choice(["", "#f", "#x/y?z"])
        urls.append(f"{scheme}://{host}{port}{path}{query}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r[0] for r in df.select(url_normalize(F.col("u"))).collect()]
    want = [_py_url_normalize(u) for u in urls]
    mismatches = [(u, g, w) for u, g, w in zip(urls, got, want) if g != w]
    assert mismatches == [], mismatches[:5]


def test_asof_forward_and_tolerance_hand_case(spark):
    """Closed-form: left at ts 10 and 50; rights at 20, 40, 60.
    forward: 10->20, 50->60. backward+tol 15: 10->None (no earlier),
    50->40. forward+tol 5: both None except none within 5 -> 10->None?
    10->20 gap 10 > 5 -> None; 50->60 gap 10 > 5 -> None."""
    import datetime as dt

    from data_analyse_marche_emploi_spark.operators.asof import asof_join

    def t(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, t(10), "L10"), (1, t(50), "L50")], "k long, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, t(20), "R20"), (1, t(40), "R40"), (1, t(60), "R60")],
        "k long, ts timestamp, rv string",
    )
    fwd = {
        r["lv"]: r["rv"]
        for r in asof_join(left, right, "k", "ts", ["rv"], "forward").collect()
    }
    assert fwd == {"L10": "R20", "L50": "R60"}
    back_tol = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, "k", "ts", ["rv"], "backward", tolerance_seconds=15
        ).collect()
    }
    assert back_tol == {"L10": None, "L50": "R40"}
    fwd_tol = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, "k", "ts", ["rv"], "forward", tolerance_seconds=5
        ).collect()
    }
    assert fwd_tol == {"L10": None, "L50": None}


def test_stream_reader_budget_survives_checkpoint_restart(tmp_path):
    """A fresh reader instance (checkpoint restart) whose committed
    cursor exceeds maxRowsPerBatch must not propose an offset BELOW
    the committed one — driver-side unit check, no Spark session."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from data_analyse_marche_emploi_spark.sources.datasource import (
        PagedRestStreamReader,
    )

    api = str(tmp_path / "api.parquet")
    pq.write_table(
        pa.table({"o_orderkey": list(range(100)),
                  "o_orderstatus": ["O"] * 100,
                  "o_totalprice": [1.0] * 100}),
        api,
    )
    schema = T.StructType(
        [T.StructField("o_orderkey", T.LongType()),
         T.StructField("o_orderstatus", T.StringType()),
         T.StructField("o_totalprice", T.DoubleType())]
    )
    r = PagedRestStreamReader(
        schema, {"path": api, "order_col": "o_orderkey",
                 "page_size": "25", "maxrowsperbatch": "40"}
    )
    # restart: Spark replans the committed batch (80, 80] on the new
    # instance before asking for a new latest offset
    assert r.partitions({"row": 80}, {"row": 80}) == []
    nxt = r.latestOffset()
    assert nxt["row"] >= 80, nxt  # never walks backwards
    assert nxt["row"] <= 100
