"""Sampling operators for training-mixture construction (north-star
extensions): deterministic stratified Bernoulli sampling by key hash.

Building an LLM training mixture means sampling each source/language/
quality stratum at its own rate — reproducibly, so a re-run (or a
backfill on two more ingest batches) keeps exactly the same documents.
``random()`` cannot do that; a hash of the stable document key can.

Scale shape: the (stratum → rate) spec is a tiny dim **broadcast** to
every task; the gate is a pure per-row expression. No shuffle, no
driver involvement, and the sample is stable under repartitioning,
retries, and incremental re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative-hash constant (2^32 / φ). The key is reduced
# mod a prime first so the product stays far below 2^63 for any BIGINT
# key — ANSI-overflow-safe — at the documented cost that keys equal
# mod 1_000_003 share a gate value.
KNUTH_MULT = 2_654_435_761
KEY_PRIME = 1_000_003


def sample_gate(key_col: str, salt: int = 0) -> F.Column:
    """Deterministic per-row gate in [0, 1000): multiplicative hash of
    the key, reduced to permille. Portable: the same arithmetic runs
    verbatim in any SQL engine (no engine-native hash function)."""
    return F.pmod(
        (F.col(key_col) % KEY_PRIME) * F.lit(KNUTH_MULT) + F.lit(salt), F.lit(1000)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, deterministically preferring
    the lowest ``order_col`` — the per-domain/per-source cap that stops
    a single crawl domain from dominating a training mixture.

    Scale shape: one shuffle on the group key, rank, filter. The rank
    filter means each task emits at most ``cap`` rows per group it
    owns; a pathologically hot group is one task's sort, bounded by
    spill (salting can't apply — top-K-per-group is order-dependent
    across the whole group by construction).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.asc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict[str, float],
    salt: int = 0,
) -> DataFrame:
    """Keep each row of stratum ``s`` iff its key-hash permille falls
    under ``rates[s]`` (a fraction in [0, 1]). Strata absent from
    ``rates`` are dropped — a mixture spec is exhaustive by intent.

    The rate dim is broadcast; the filter is row-local. At 100 TB this
    is a scan with a pushable stratum filter and a cheap arithmetic
    gate — no shuffle anywhere.
    """
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(s, int(round(r * 1000))) for s, r in sorted(rates.items())],
        f"{strata_col} string, __permille int",
    )
    # The join implies the stratum membership, but only a literal IN
    # filter reaches the parquet scan (PushedFilters / partition
    # pruning) — at scale that skips unsampled strata entirely.
    return (
        df.filter(F.col(strata_col).isin(*rates))
        .join(F.broadcast(dim), strata_col, "inner")
        .filter(sample_gate(key_col, salt) < F.col("__permille"))
        .drop("__permille")
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_permille: int = 25,
    test_permille: int = 25,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-row split assignment from the key hash: the
    top ``val+test`` permille of the gate range hold out validation and
    test, the rest is train. Stable under re-runs, retries, and
    repartitioning (same contract as ``stratified_sample``); a doc
    never migrates between splits when the corpus grows, because its
    gate depends only on its own key."""
    gate = sample_gate(key_col, salt)
    train_cut = 1000 - val_permille - test_permille
    return df.withColumn(
        "split",
        F.when(gate < train_cut, "train")
        .when(gate < train_cut + val_permille, "val")
        .otherwise("test"),
    )


def token_budget_mixture(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    tokens_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Chinchilla-style mixture: keep documents per stratum until that
    stratum's TOKEN budget is exhausted, in deterministic key-hash
    order (so the kept set is stable and unbiased, not
    first-files-first). A doc is kept iff it STARTS within budget —
    the budget overshoots by at most one document.

    Scale shape: the per-stratum running token count uses
    ``grouped_prefix_sum`` — range-partitioned two-phase cumsum — so a
    5-language / 100 TB corpus does not collapse onto 5 window tasks.
    """
    from .prefix_sum import grouped_prefix_sum

    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(s, int(b)) for s, b in sorted(budgets.items())],
        f"{strata_col} string, __budget long",
    )
    ordered = (
        df.filter(F.col(strata_col).isin(*budgets))
        .withColumn("__gate", sample_gate(key_col))
        .join(F.broadcast(dim), strata_col, "inner")
    )
    summed = grouped_prefix_sum(
        ordered,
        [strata_col],
        ["__gate", key_col],
        tokens_col,
        out_col="__cum",
    )
    return (
        summed.filter(F.col("__cum") - F.col(tokens_col) < F.col("__budget"))
        .drop("__gate", "__budget", "__cum")
    )


def shuffle_deterministic(
    df: DataFrame, id_col: str, seed: int = 42, out_col: str = "shuffle_pos"
) -> DataFrame:
    """Deterministic global shuffle order for training: every row gets a
    1-based position in the pseudo-random permutation keyed by
    ``md5(seed || ':' || id)``.

    The training-loader step "shuffle the corpus once, read it in
    order" needs a *reproducible* permutation (rerunning the job must
    not reorder shards) — so the key is a cryptographic digest of the
    row id, not rand(). Positions come from the two-phase distributed
    prefix sum over the (digest, id) total order: no single-partition
    window, no driver data path (only the per-partition totals row set
    is collected). Writing the result range-partitioned by ``out_col``
    yields shards that stream the permutation in order.
    """
    from .prefix_sum import distributed_prefix_sum

    # Project to the id before the prefix sum: its persist() would
    # otherwise pin every payload column (text included) through the
    # range exchange and cache — the position join back to the payload
    # is the caller's (cheap, id-keyed) concern.
    keyed = df.select(id_col).withColumn(
        "__sk",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
    ).withColumn("__one", F.lit(1))
    pos = distributed_prefix_sum(keyed, ["__sk", id_col], "__one", out_col)
    return pos.select(id_col, F.col(out_col).cast("long").alias(out_col))


def sample_weighted(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    target_k: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: row i is kept with
    probability ``min(1, target_k * w_i / W)``, so the expected sample
    size is ~``target_k`` and inclusion odds are proportional to the
    weight — the quality-weighted corpus-selection step (weight =
    quality score / length / dedup-cluster mass).

    Decision is pure integer arithmetic — ``gate * W < 1000 * k * w``
    with the portable permille gate — so the sample is bit-reproducible
    across engines and runs (no float boundary, no rand()). W comes
    from a broadcast single-row aggregate, never a driver collect.
    Bounds: gate < 1000 and the comparison stays in int64 for
    W * 1000 < 2^63 (Σ weights below ~9.2e15).

    ``weight_col`` MUST be an integral column (byte/short/int/long):
    the int64 decision would silently truncate fractional weights —
    a quality score in (0, 1) would cast to 0 and never be sampled.
    For fractional scores, pre-scale by a fixed power of 10 first,
    e.g. ``df.withColumn("w", F.round(F.col("score") * 1000).cast("long"))``;
    the common scale factor cancels in the keep probability.
    """
    from pyspark.sql import types as T

    wtype = df.schema[weight_col].dataType
    if not isinstance(wtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"sample_weighted needs an integral weight column; {weight_col} is "
            f"{wtype.simpleString()}. Pre-scale fractional weights by a fixed "
            "power of 10 and round to long (the scale cancels in the odds)."
        )
    totals = df.agg(F.sum(weight_col).cast("long").alias("__W"))
    return (
        df.join(F.broadcast(totals))
        .filter(
            sample_gate(key_col, salt).cast("long") * F.col("__W")
            < F.lit(1000 * target_k) * F.col(weight_col).cast("long")
        )
        .drop("__W")
    )


def sample_exact_k(
    df: DataFrame, key_col: str, k: int, salt: int = 0
) -> DataFrame:
    """Deterministic EXACT-k uniform sample: rank every row by the
    portable multiplicative hash of its key (ties broken by the key
    itself) and keep the k smallest — the distributed equivalent of
    reservoir sampling, with two properties the classic algorithm
    lacks: the sample is identical under repartitioning/retries, and
    it's replayable in any SQL engine (same arithmetic, ORDER BY +
    LIMIT).

    Scale shape: Catalyst plans the rank-and-keep as
    TakeOrderedAndProject — each task keeps its local top-k and only
    k rows per task move, never a global sort. Complements
    sample_gate (rate-based, size ~Binomial) when the contract is an
    exact budget (eval sets, fixed-size calibration splits)."""
    rank = F.pmod(
        (F.col(key_col) % KEY_PRIME) * F.lit(KNUTH_MULT) + F.lit(salt),
        F.lit(KEY_PRIME),
    )
    return (
        df.withColumn("__rank", rank)
        .orderBy("__rank", key_col)
        .limit(k)
        .drop("__rank")
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int = 4096,
    temperature: float | None = None,
    seed: int = 0,
) -> DataFrame:
    """DSIR-style data selection (the published Data Selection via
    Importance Resampling recipe: hashed n-gram bag-of-features
    importance weights): score every RAW document by how much more
    likely its unigram+bigram features are under the TARGET
    distribution than under the raw one, and keep the top ``k``.
    Returns ``(id, score6)`` — score6 is the exact-integer importance
    weight ``Σ_b n_d(b) · llr6(b)`` where ``llr6(b) = floor(1e6 ·
    ln(p_target(b) / p_raw(b)))`` with add-1 smoothing over the
    ``n_buckets`` hashed-feature domain.

    Determinism / oracle replay: features hash through the md5-derived
    32-bit family (the same engine-portable trick the SimHash entry
    rides), the per-BUCKET log-ratio is floor-bucketed once at 1e-6
    (4096 transcendental evaluations total — the only float in the
    op), and the per-document score is an exact integer sum of
    integer products, so any engine with md5 and ln replays the
    ranking bit-for-bit. Selection is deterministic top-k by
    (score desc, id asc); with ``temperature`` set it becomes the
    published IMPORTANCE RESAMPLING itself via the Gumbel-top-k trick
    — top-k by ``key = score + T·g`` samples WITHOUT replacement with
    probability ∝ exp(score/T) — where the Gumbel noise
    ``g = −ln(−ln(u))`` draws its uniform from the md5 hash of
    ``seed:id`` (52 mantissa bits), so the sample is seeded,
    rerun-stable, and replayable by any engine with md5 and ln (the
    per-doc key is the integer score plus ONE floor-bucketed float
    term). T → 0 recovers the deterministic ranking; larger T trades
    target-likeness for diversity, exactly the paper's knob.

    Scale shape: feature extraction is a map-side explode; the two
    distribution fits partial-aggregate to ≤ ``n_buckets`` rows each
    (constant, independent of corpus size) and broadcast back onto the
    per-(doc, bucket) counts; the score is one groupBy(id); top-k
    plans as TakeOrderedAndProject (per-partition heads, no global
    sort). Nothing corpus-sized ever reaches the driver."""

    def grams(df: DataFrame) -> DataFrame:
        # Tokenize ONCE into a projected column; unigrams, the size
        # guard, and the bigram lambda all read __toks (the r9 advisor
        # found split() re-evaluated four times per row here — split
        # is non-cheap, so CollapseProject keeps the projection and
        # the analyzed plan carries exactly one split).
        toked = df.select(
            F.col(id_col).alias("__id"),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        bigrams = F.when(
            F.size(F.col("__toks")) >= 2,
            F.expr(
                "transform(slice(__toks, 1, size(__toks) - 1), "
                "(x, i) -> concat(x, ' ', element_at(__toks, i + 2)))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        return toked.select(
            "__id",
            F.explode(F.concat(F.col("__toks"), bigrams)).alias("g"),
        ).select(
            "__id",
            (
                F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10)
                .cast("long") % n_buckets
            ).alias("b"),
        )

    raw_g = grams(raw)
    tgt_g = grams(target)

    def dist(g: DataFrame) -> DataFrame:
        # ≤ n_buckets rows after the partial agg — constant-size
        return g.groupBy("b").agg(F.count(F.lit(1)).alias("c"))

    # ONE raw-side pass (r14 optimization round): the raw bucket
    # distribution used to re-run the grams explode + per-gram md5 —
    # the op's most expensive map work — because its groupBy(b) and
    # per_doc's groupBy(id, b) shuffle on different keys (no exchange
    # reuse). The distribution is the per-(doc, bucket) counts rolled
    # up, so derive it from per_doc: identical counts by construction,
    # and the rollup input is distinct (doc, bucket) rows, orders of
    # magnitude fewer than gram instances.
    per_doc = raw_g.groupBy("__id", "b").agg(F.count(F.lit(1)).alias("n"))
    raw_c = per_doc.groupBy("b").agg(F.sum("n").alias("csum"))
    tgt_c = dist(tgt_g).withColumnRenamed("c", "ctum")
    raw_tot = raw_c.agg(F.sum("csum").alias("cs_total"))
    tgt_tot = tgt_c.agg(F.sum("ctum").alias("ct_total"))
    # llr6 per observed bucket: ln of one exact rational — the integer
    # cross-products stay < 2^53, so both engines divide the SAME two
    # doubles; unobserved buckets never join a document row.
    llr = (
        raw_c.join(tgt_c, "b", "full_outer")
        .select(
            "b",
            F.coalesce(F.col("csum"), F.lit(0)).alias("cs"),
            F.coalesce(F.col("ctum"), F.lit(0)).alias("ct"),
        )
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "b",
            F.floor(
                F.log(
                    ((F.col("ct") + 1) * (F.col("cs_total") + n_buckets)).cast("double")
                    / ((F.col("cs") + 1) * (F.col("ct_total") + n_buckets)).cast("double")
                )
                * 1e6
            )
            .cast("long")
            .alias("llr6"),
        )
    )
    scored = (
        per_doc.join(F.broadcast(llr), "b")
        .groupBy("__id")
        .agg(F.sum(F.col("n") * F.col("llr6")).alias("score6"))
    )
    if temperature is None:
        return (
            scored.orderBy(F.desc("score6"), F.asc("__id"))
            .limit(k)
            .select(F.col("__id").alias(id_col), "score6")
        )
    # Gumbel-top-k: u ∈ (0,1) from 52 md5 bits of seed:id (the +0.5
    # keeps u strictly inside the open interval), g = −ln(−ln(u)),
    # integer key = score6 + floor(1e6·T·g). Map-side per doc.
    m = float(1 << 52)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col("__id").cast("string"))),
                1, 13,
            ),
            16, 10,
        ).cast("long")
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(m)
    g = -F.log(-F.log(u))
    keyed = scored.withColumn(
        "key6",
        F.col("score6")
        + F.floor(F.lit(1e6 * temperature) * g).cast("long"),
    )
    return (
        keyed.orderBy(F.desc("key6"), F.asc("__id"))
        .limit(k)
        .select(F.col("__id").alias(id_col), "score6", "key6")
    )
