"""Distributed BPE vocabulary training (north-star text analysis: the
tokenizer-training step of an LLM data pipeline, run on the corpus the
engine just curated).

The scalable decomposition: the CORPUS-sized work happens exactly once —
a whitespace-word count that collapses 100 TB of text into a
vocab-sized (word, count) table (one shuffle, map-side combined). Every
merge iteration after that runs on the word table only: adjacent-pair
counts are an explode + partial-aggregated groupBy over ~|vocab| rows,
the argmax pair is a 1-row collect, and applying the merge is a pure
per-row array fold. No iteration ever touches the corpus again.

Spark-specific care: iterative DataFrame updates grow the lineage
linearly (analysis cost per iteration grows without bound), so the word
table is eagerly ``localCheckpoint``-ed every iteration — the plan
stays O(1) deep at any merge count.

Merge application is the greedy leftmost non-overlapping fold: a single
``aggregate`` lambda whose accumulator is the rebuilt symbol array (a
just-merged token can never re-merge within the pass, because
left||right == left would require an empty right symbol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, cnt): the only corpus-sized stage."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_expr(left: str, right: str) -> F.Column:
    """Greedy leftmost application of one merge rule to the symbol
    array, as a pure JVM fold."""
    l = left.replace("\\", "\\\\").replace("'", "\\'")
    r = right.replace("\\", "\\\\").replace("'", "\\'")
    return F.expr(
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l}' AND s = '{r}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{l}{r}')) "
        "ELSE concat(acc, array(s)) END)"
    )


def bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 40,
    min_freq: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns
    (rank, left, right, freq) — rank is the merge order. Deterministic:
    ties break on (freq DESC, left ASC, right ASC)."""
    spark = df.sparkSession
    words = (
        word_counts(df, text_col)
        .select(F.expr("split(w, '')").alias("syms"), "cnt")
        .localCheckpoint()
    )
    rules: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("freq"))
            .filter(F.col("freq") >= min_freq)
        )
        best = pairs.orderBy(F.desc("freq"), F.asc("l"), F.asc("r")).first()
        if best is None:
            break
        rules.append((rank, best["l"], best["r"], best["freq"]))
        words = (
            words.withColumn("syms", _merge_expr(best["l"], best["r"]))
            .localCheckpoint()  # keep the plan O(1) deep across iterations
        )
    return spark.createDataFrame(
        rules, "rank int, left string, right string, freq long"
    )


def bpe_encode(df: DataFrame, text_col: str, rules: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges in rank order to tokenize ``text_col`` —
    adds ``bpe_tokens``. Each rule is one array fold; the chain is a
    single projection (no shuffle, no UDF). The text is char-split
    whole: whitespace chars sit between word spans and no rule contains
    whitespace, so merges can never cross a word boundary; the
    whitespace symbols are dropped from the final token stream."""
    out = df.withColumn(
        "syms", F.expr(f"split(lower({text_col}), '')")
    )
    for left, right in rules:
        out = out.withColumn("syms", _merge_expr(left, right))
    # Drop exactly the separator class TRAINING splits words on (Java
    # \s in word_counts) — trim() stripped only ' ', letting tab/newline
    # through as bogus tokens, while a wider class (e.g. + NBSP) would
    # drop characters the trainer treats as word content, making
    # tokenization diverge from the learned merge statistics. The
    # empty string needs its own clause: '' char-splits out of empty
    # text, \s+ requires >=1 char, and '' is not a trainer word either.
    return out.withColumn(
        "bpe_tokens",
        F.expr(r"filter(syms, s -> s != '' AND s NOT RLIKE '^\\s+$')"),
    ).drop("syms")
