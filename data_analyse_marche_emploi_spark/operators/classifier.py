"""Model-based quality filtering: a distributed logistic-regression
classifier over an embedding column — the published distant-supervision
recipe (train "does this look like the high-quality corpus?" on
target-vs-raw labels, then keep documents the model scores highly; the
GPT-3 WebText-vs-CommonCrawl quality classifier and CCNet's LM filter
are this shape).

Spark-first training: FULL-BATCH gradient descent where each iteration
is ONE partial-aggregated pass — every task folds its Arrow batches
into a (d+1)-vector gradient contribution, the shuffle carries one
(dim, value) cell per task, and the driver holds only the (d+1) weight
vector (the emb_kmeans/pca_fit discipline: model state driver-side,
data never leaves the cluster). Scoring is a map-side broadcast dot
product. Iterations are Python-loop orchestration.

Verification class: gradient sums are float partial aggregations, so
cross-engine bit-replay is not claimed (same class as emb_kmeans /
pca_fit — rows-only driver check); the semantic pytest pins separation
accuracy on planted clusters, monotone loss, and same-engine
determinism under repartitioning-stable aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_train", "logreg_score", "quality_filter"]


def logreg_train(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    iters: int = 25,
    lr: float = 2.0,
    l2: float = 1e-4,
):
    """Fit logistic-regression weights on ``(vec_col, label_col ∈
    {0,1})``: returns ``(w, b, losses)`` with ``w`` a length-d numpy
    vector, ``b`` the bias, and ``losses`` the per-iteration mean
    log-loss (driver-side training curve — the monotonicity the tests
    pin). Cost per iteration: one scan, one (d+1)-cell shuffle."""
    import numpy as np

    spark = df.sparkSession
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("logreg_train: empty training set")
    d = len(first[0])
    n = df.count()
    base = df.select(
        F.col(vec_col).cast("array<double>").alias("__x"),
        F.col(label_col).cast("double").alias("__y"),
    )
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    losses: list[float] = []

    grad_schema = "dim int, val double"

    def make_pass(wv, bv):
        bw = spark.sparkContext.broadcast((wv, bv))

        def grad_pass(it):
            import pandas as pd

            cw, cb = bw.value
            acc = np.zeros(d + 2, dtype=np.float64)  # d grads, db, loss
            for pdf in it:
                x = np.array(list(pdf["__x"]), dtype=np.float64)
                y = pdf["__y"].to_numpy(dtype=np.float64)
                z = x @ cw + cb
                p = 1.0 / (1.0 + np.exp(-z))
                err = p - y
                acc[:d] += x.T @ err
                acc[d] += err.sum()
                # numerically-stable log-loss: log(1+e^z) - y*z
                acc[d + 1] += float(
                    np.sum(np.logaddexp(0.0, z) - y * z)
                )
            yield pd.DataFrame(
                {"dim": np.arange(d + 2, dtype=np.int32), "val": acc}
            )

        return grad_pass

    for _ in range(iters):
        cells = (
            base.mapInPandas(make_pass(w, b), grad_schema)
            .groupBy("dim")
            .agg(F.sum("val").alias("s"))
            .collect()
        )
        acc = np.zeros(d + 2)
        for r in cells:
            acc[r["dim"]] = r["s"]
        w -= lr * (acc[:d] / n + l2 * w)
        b -= lr * (acc[d] / n)
        losses.append(acc[d + 1] / n)
    return w, b, losses


def logreg_score(
    df: DataFrame, vec_col: str, id_col: str, w, b: float
) -> DataFrame:
    """Score every row with the trained model: ``(id, logit,
    keep)`` where ``keep = logit > 0`` (probability > 0.5). Map-side
    broadcast dot product over Arrow batches — zero shuffle."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    bw = spark.sparkContext.broadcast((np.asarray(w, dtype=np.float64), float(b)))

    def score(it):
        cw, cb = bw.value
        for pdf in it:
            x = np.array(list(pdf["__x"]), dtype=np.float64)
            z = x @ cw + cb
            yield pd.DataFrame(
                {"__id": pdf["__id"], "logit": z, "keep": z > 0}
            )

    return (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__x"),
        )
        .mapInPandas(score, "__id long, logit double, keep boolean")
        .withColumnRenamed("__id", id_col)
    )


def quality_filter(
    corpus: DataFrame,
    target: DataFrame,
    vec_col: str,
    id_col: str,
    iters: int = 25,
    lr: float = 2.0,
) -> DataFrame:
    """The end-to-end distant-supervision filter: label the TARGET
    slice 1 and the rest of the corpus 0, train, score the whole
    corpus, return ``(id, logit, keep)``. The training pass unions the
    two slices with literal labels — one extra column, no shuffle
    beyond the per-iteration (d+1)-cell gradient exchange."""
    tgt_ids = target.select(F.col(id_col).alias("__tid"))
    labeled = corpus.join(
        F.broadcast(tgt_ids), corpus[id_col] == F.col("__tid"), "left"
    ).select(
        F.col(vec_col).alias("__v"),
        F.col("__tid").isNotNull().cast("int").alias("__label"),
    )
    w, b, _ = logreg_train(labeled, "__v", "__label", iters=iters, lr=lr)
    return logreg_score(corpus, vec_col, id_col, w, b)
