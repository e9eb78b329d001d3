"""Similarity search over embedding columns (north-star extension,
BASELINE.json): brute-force cosine top-k as the exactness baseline, and
a random-hyperplane LSH bucketed variant as the scale path.

At 100 TB / billions of vectors the brute-force path is the *verifier*
(run on samples), and the LSH path is production: signatures are
map-side, candidates come from bucket equi-joins (shuffle on a small
integer key), and only candidates pay the full-dimension cosine.
An IVF layout (k-means coarse quantizer + inverted lists) would slot in
the same way — bucket id from nearest centroid instead of hyperplane
signs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_expr


def knn_brute_force(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Cross-join queries × corpus → cosine → per-query window top-k.
    Cosine is bucketed to 1e-6 (floor) before ranking with an id
    tiebreak, making the result set fully deterministic and
    engine-portable. Queries are broadcast (assumed small)."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    v = vectors.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = (
        v.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .withColumn("cos6", F.floor(cosine_expr("qv", "nv") * 1e6).cast("long"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos6"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cos6")
    )


def _hyperplane_sig_expr(vec_col: str, bits: int, table: int = 0) -> str:
    """Deterministic pseudo-random hyperplane signature: plane b's
    component for dimension d is xxhash64(table * 2^20 + b * 4096 + d)
    scaled to [-1, 1]; the signature bit is the sign of the dot
    product. Data-independent and reproducible — no fitted model to
    ship; ``table`` offsets the hash stream so each LSH table draws an
    independent plane family."""
    off = table * (1 << 20)
    plane_dot = (
        f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
        f"(x, d) -> CAST(x AS DOUBLE) * (CAST(xxhash64({off} + b * 4096 + d) % 1000001 AS DOUBLE) / 1000000.0)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, b) -> "
        f"acc | (CASE WHEN ({plane_dot}) > 0 THEN shiftleft(1L, b) ELSE 0L END))"
    )


def ann_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer partitions the
    corpus into inverted lists; queries probe only the ``n_probe``
    nearest lists and pay exact cosine there.

    Centroids are a deterministic corpus subset (the ``n_centroids``
    lowest ids — a k-means fit would slot in identically but would ship
    a fitted model; determinism wins for the differential harness).
    Scale shape: assignment is a map-side broadcast argmax; the probe
    join shuffles on the small integer list id, so each query touches
    ~``n_probe/n_centroids`` of the corpus instead of all of it.
    """
    cent = (
        vectors.select(id_col, vec_col)
        .orderBy(F.asc(id_col))  # planned as TakeOrderedAndProject — no global sort
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )

    def nearest_lists(df: DataFrame, idc: str, vc: str, n: int, out: str) -> DataFrame:
        scored = df.join(F.broadcast(cent)).withColumn(
            "__ccos", F.floor(cosine_expr(vc, "cv") * 1e6).cast("long")
        )
        wq = Window.partitionBy(idc).orderBy(F.desc("__ccos"), F.asc("cid"))
        return (
            scored.withColumn("__crn", F.row_number().over(wq))
            .filter(F.col("__crn") <= n)
            .select(df[idc], df[vc], F.col("cid").alias(out))
        )

    v = nearest_lists(
        vectors.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")),
        "nid", "nv", 1, "list_id",
    )
    q = nearest_lists(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")),
        "qid", "qv", n_probe, "qlist_id",
    )
    cand = v.join(
        F.broadcast(q),
        (F.col("list_id") == F.col("qlist_id")) & (F.col("qid") != F.col("nid")),
    ).withColumn("cos6", F.floor(cosine_expr("qv", "nv") * 1e6).cast("long"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos6"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cos6")
    )


def ann_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    bits: int = 12,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: random-hyperplane (SimHash-for-cosine) bucket
    join. Vectors and queries hash to a ``bits``-bit signature per
    table; only same-(table, bucket) candidates pay the exact cosine;
    per-query top-k over the distinct candidate union.

    ``n_tables`` is the OR-amplification knob: recall ≈
    1 − (1 − p^bits)^n_tables for per-plane agreement p, so more tables
    buy recall linearly in signature cost while candidate generation
    stays an equi-join (shuffle key = (table, bucket)). The tested
    contract: every reported neighbor is a true neighbor with its exact
    brute-force cosine, ranks consistent; recall vs knn_brute_force is
    asserted to improve with n_tables in tests."""
    tables = list(range(n_tables))

    def sig_rows(df: DataFrame, idc: str, vc: str, id_alias: str, b_alias: str) -> DataFrame:
        sigs = [
            F.struct(
                F.lit(t).alias("tbl"),
                F.expr(_hyperplane_sig_expr(vc, bits, table=t)).alias("sig"),
            )
            for t in tables
        ]
        return df.select(
            F.col(idc).alias(id_alias),
            F.col(vc).alias(f"{id_alias}_v"),
            F.explode(F.array(*sigs)).alias("tb"),
        ).select(id_alias, f"{id_alias}_v", F.col("tb.tbl").alias(f"{b_alias}_tbl"),
                 F.col("tb.sig").alias(b_alias))

    v = sig_rows(vectors, id_col, vec_col, "nid", "bucket")
    q = sig_rows(queries, id_col, vec_col, "qid", "qbucket")
    cand = (
        v.join(
            F.broadcast(q),
            (F.col("bucket_tbl") == F.col("qbucket_tbl"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("qid") != F.col("nid")),
        )
        .select("qid", "nid", F.col("qid_v").alias("qv"), F.col("nid_v").alias("nv"))
        .distinct()
        .withColumn("cos6", F.floor(cosine_expr("qv", "nv") * 1e6).cast("long"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos6"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cos6")
    )
