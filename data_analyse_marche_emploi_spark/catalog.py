"""Query catalog: the driver-facing registry binding every operator from
SURVEY.md §2 (plus the training-data extensions) to the fixture tables,
each paired with its ANSI-SQL oracle for the DuckDB differential harness.

Each entry is a callable ``(spark, sf_dir) -> DataFrame``. Oracle SQL runs
on DuckDB views named after the fixture tables. Column names are aliased
identically on both sides (the driver sorts columns by name before value
hashing). Money aggregates cast to DECIMAL first so sums are exact and
engine/partitioning-independent (see operators.aggregates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import text as TXT
from .functions.dates import date_fmt_fr, duration_hhmm
from .operators import aggregates as AGG
from .operators import joins as J
from .operators import scan as SCAN
from .tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to the weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7 step 2): the Kibana-dashboard analytic —
# date-histogram × status with order volume and exact revenue.
# ---------------------------------------------------------------------------


@register(
    "flagship_orders_by_month",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket,
           o_orderstatus,
           count(*) AS cnt,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def flagship_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_date_histogram × agg_groupby_count × exact money sum
    (reference: the Kibana dashboard surface, README.md:8-9)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("bucket"),
            "o_orderstatus",
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            AGG.money_sum(F.col("o_totalprice"), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# §2.B scan / projection / filter
# ---------------------------------------------------------------------------


@register("scan_match_all", oracle="SELECT * FROM orders")
def scan_match_all(spark, sf_dir):
    """Unfiltered full scan (reference: match_all, export-offres-csv.conf:7-9)."""
    return SCAN.scan_match_all(_t(spark, sf_dir, "orders"))


@register(
    "proj_source_fields",
    oracle="SELECT l_orderkey, l_partkey, l_shipdate FROM lineitem",
)
def proj_source_fields(spark, sf_dir):
    """Source-side projection (reference: _source list, csv-tech.conf:13).
    Catalyst prunes ReadSchema to exactly these three columns."""
    return SCAN.project_fields(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey", "l_shipdate"
    )


@register(
    "filter_terms_in",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('MACHINERY', 'AUTOMOBILE', 'BUILDING')
    """,
)
def filter_terms_in(spark, sf_dir):
    """IN-list predicate (reference: terms on romeCode.keyword,
    csv-tech.conf:14-19) — pushed to Parquet row-group stats."""
    c = _t(spark, sf_dir, "customer")
    return SCAN.project_fields(
        SCAN.filter_terms_in(c, F.col("c_mktsegment"), ["MACHINERY", "AUTOMOBILE", "BUILDING"]),
        "c_custkey",
        "c_name",
        "c_mktsegment",
    )


@register(
    "filter_single_term",
    oracle="SELECT p_partkey, p_brand FROM part WHERE p_brand = 'Brand#13'",
)
def filter_single_term(spark, sf_dir):
    """Single-element terms list = plain equality (reference:
    csv-tech-data.conf:11-14, romeCode = 'M1403')."""
    p = _t(spark, sf_dir, "part")
    return SCAN.project_fields(
        SCAN.filter_terms_in(p, F.col("p_brand"), ["Brand#13"]), "p_partkey", "p_brand"
    )


@register(
    "col_rename_flatten",
    oracle="""
    SELECT o_orderkey AS id, o_orderdate AS dateactualisation,
           o_orderstatus AS statut
    FROM orders
    """,
)
def col_rename_flatten(spark, sf_dir):
    """Sink-side rename/flatten (reference: lieuTravail.commune →
    codecommune, export-offres-csv.conf:13-17)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").alias("dateactualisation"),
        F.col("o_orderstatus").alias("statut"),
    )


# ---------------------------------------------------------------------------
# §2.C scalar text transforms (the Logstash mutate chain)
# ---------------------------------------------------------------------------


@register(
    "str_lower",
    oracle="SELECT p_partkey, lower(p_name) AS name_lc FROM part",
)
def str_lower(spark, sf_dir):
    """Lowercase (reference: csv-tech.conf:26-28)."""
    p = _t(spark, sf_dir, "part")
    return p.select("p_partkey", TXT.lower(F.col("p_name")).alias("name_lc"))


@register(
    "pipeline_clean_text",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(text), '[,*-.:;«»✔➡¿\\"·?!()/]', ' ', 'g'),
                   '&nbsp', ' ', 'g'),
                 '\r', ' ', 'g'),
               '[ \t\n\x0B\f\r\x{00A0}]', ' ', 'g'),
             '[ \t\n\x0B\f\r\x{00A0}]+', ' ', 'g')) AS text_clean
    FROM documents
    """,
)
def pipeline_clean_text(spark, sf_dir):
    """The full ordered csv-tech.conf:24-41 mutate chain
    (lower → punct → &nbsp → \\r → posix-space → collapse)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TXT.clean_text_chain(F.col("text")).alias("text_clean"))


# ---------------------------------------------------------------------------
# §2.D aggregations
# ---------------------------------------------------------------------------


@register("agg_count_total", oracle="SELECT count(*) AS total FROM lineitem")
def agg_count_total(spark, sf_dir):
    """ES _count equivalent (reference: ingestion-elasticsearch.py:298-301);
    metadata-only count on Parquet."""
    return AGG.agg_count_total(_t(spark, sf_dir, "lineitem"))


@register(
    "agg_groupby_count",
    oracle="SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY 1",
)
def agg_groupby_count(spark, sf_dir):
    """Kibana terms aggregation (SURVEY.md §2.D)."""
    return AGG.agg_groupby_count(_t(spark, sf_dir, "orders"), "o_orderstatus")


@register(
    "agg_date_histogram",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS bucket, count(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def agg_date_histogram(spark, sf_dir):
    """Kibana date_histogram (SURVEY.md §2.D) on the events stream table."""
    return AGG.agg_date_histogram(_t(spark, sf_dir, "events"), F.col("ts"), "day")


@register(
    "agg_topk",
    oracle="""
    SELECT p_brand, count(*) AS cnt FROM part GROUP BY 1
    ORDER BY cnt DESC, p_brand ASC LIMIT 5
    """,
)
def agg_topk(spark, sf_dir):
    """Kibana top-N terms; planned as TakeOrderedAndProject (partial
    top-k per partition, no global sort)."""
    return AGG.agg_topk(_t(spark, sf_dir, "part"), "p_brand", 5)


@register(
    "agg_distinct",
    oracle="SELECT count(DISTINCT c_mktsegment) AS n_distinct FROM customer",
)
def agg_distinct(spark, sf_dir):
    """Exact distinct (SURVEY.md §2.D)."""
    return AGG.agg_distinct(_t(spark, sf_dir, "customer"), "c_mktsegment")


@register("agg_approx_distinct")  # estimator is engine-specific → rows-only
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog++ distinct — the scale path for high-cardinality keys."""
    return AGG.agg_approx_distinct(_t(spark, sf_dir, "lineitem"), "l_partkey")


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
           count(*) AS count_order,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY 1, 2
    """,
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped pricing summary — the engine's heaviest scan+agg
    (BENCH headline). Multi-agg hash aggregate with partial combine."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            AGG.money_sum(F.col("l_quantity"), "sum_qty"),
            AGG.money_sum(F.col("l_extendedprice"), "sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
            AGG.money_avg(F.col("l_quantity"), "avg_qty"),
        )
    )


# ---------------------------------------------------------------------------
# §2.E joins
# ---------------------------------------------------------------------------


@register(
    "join_dim_containment",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
    """,
)
def join_dim_containment(spark, sf_dir):
    """Broadcast semi-join containment filter (reference:
    departements-of-one-region, ingestion-elasticsearch.py:148)."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    out = J.join_dim_containment(
        nation, region, nation["n_regionkey"] == region["r_regionkey"]
    )
    return out.select("n_nationkey", "n_name")


@register(
    "join_enrich",
    oracle="""
    SELECT r_name, count(*) AS cnt,
           sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
)
def join_enrich(spark, sf_dir):
    """Fact × broadcast dims enrich (reference: implied offres ×
    referentiel labels, export-offres-csv.conf:6,20) + rollup."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    enriched = J.join_enrich(
        J.join_enrich(c, n, c["c_nationkey"] == n["n_nationkey"], "inner"),
        r,
        F.col("n_regionkey") == r["r_regionkey"],
        "inner",
    )
    return enriched.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("cnt"), AGG.money_sum(F.col("c_acctbal"), "sum_bal")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    """Left-anti join — customers with no orders (engine surface)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return J.join_anti(c, o, c["c_custkey"] == o["o_custkey"]).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.A ingest semantics: keyed upsert = dedup-union
# ---------------------------------------------------------------------------


@register(
    "dedup_union_by_id",
    oracle="""
    SELECT DISTINCT o_orderkey, o_orderstatus, o_totalprice FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    )
    """,
)
def dedup_union_by_id(spark, sf_dir):
    """The reference's keyed bulk upsert: overlapping partitioned scans
    merged by `_id` (ingestion-elasticsearch.py:36-55) = union of
    overlapping scans deduplicated on the key (SURVEY.md §2.A
    snk_bulk_upsert_by_id)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    a = o.filter(F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    b = o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    return (
        a.unionAll(b)
        .drop("o_orderdate")
        .dropDuplicates(["o_orderkey", "o_orderstatus", "o_totalprice"])
    )
