"""BPE trainer: exact rule-sequence equality against a pure-Python
reference, plus the encode roundtrip invariant."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.operators.bpe import (
    bpe_encode,
    bpe_merges,
    word_counts,
)
from data_analyse_marche_emploi_spark.tables import load_table

from .conftest import SF_SMOKE


def ref_bpe(wc: dict[str, int], n_merges: int, min_freq: int):
    """Reference BPE: greedy leftmost merge application, ties broken on
    (freq DESC, left ASC, right ASC)."""
    words: dict[tuple, int] = {}
    for w, c in wc.items():
        t = tuple(w)
        words[t] = words.get(t, 0) + c
    rules = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        cands = [(f, a, b) for (a, b), f in pc.items() if f >= min_freq]
        if not cands:
            break
        freq, left, right = sorted(cands, key=lambda t: (-t[0], t[1], t[2]))[0]
        rules.append((rank, left, right, freq))
        new: dict[tuple, int] = {}
        for syms, c in words.items():
            out: list = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            t = tuple(out)
            new[t] = new.get(t, 0) + c
        words = new
    return rules


def spark_rules(df, text_col, n_merges, min_freq):
    return [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in bpe_merges(df, text_col, n_merges, min_freq)
        .orderBy("rank")
        .collect()
    ]


def test_bpe_matches_reference_synthetic(spark):
    corpus = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a hat and a bat and a rat",
        "that cat chased the rat",
    ] * 3
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    wc = Counter()
    for line in corpus:
        for w in line.lower().split():
            wc[w] += 1
    assert spark_rules(df, "text", 10, 2) == ref_bpe(dict(wc), 10, 2)


def test_bpe_matches_reference_fixture(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    wc = {
        r["w"]: r["cnt"] for r in word_counts(d, "text").collect()
    }
    assert spark_rules(d, "text", 6, 2) == ref_bpe(wc, 6, 2)


def test_bpe_encode_roundtrip(spark):
    """Concatenated tokens reproduce the whitespace-stripped lowercase
    text, and learned merges actually compress the token stream."""
    corpus = ["the cat sat on the mat", "the cats sat on the mats"] * 5
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    rules = [(l, r) for _, l, r, _ in spark_rules(df, "text", 8, 2)]
    enc = bpe_encode(df, "text", rules)
    rows = enc.select(
        "text",
        F.concat_ws("", "bpe_tokens").alias("glued"),
        F.size("bpe_tokens").alias("n_tok"),
    ).collect()
    for r in rows:
        stripped = "".join(r["text"].lower().split())
        assert r["glued"] == stripped
        assert r["n_tok"] < len(stripped)  # merges compressed something


def test_bpe_encode_drops_all_whitespace_symbols(spark):
    from data_analyse_marche_emploi_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([("ab\ncd\tef",)], "text string")
    toks = bpe_encode(df, "text", rules=[]).collect()[0]["bpe_tokens"]
    assert toks == list("abcdef")  # \n and \t never become tokens


def test_bpe_encode_empty_text_yields_no_tokens(spark):
    """Empty text char-splits to [''] — the empty string is not a
    trainer word and must not survive as a token."""
    from data_analyse_marche_emploi_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([("",), ("  ",), ("ab",)], "text string")
    got = {
        i: r["bpe_tokens"]
        for i, r in enumerate(bpe_encode(df, "text", rules=[]).collect())
    }
    assert got[0] == []
    assert got[1] == []
    assert got[2] == ["a", "b"]
