"""Corpus-curation operators (repetition signals, decontamination, PII
redaction, stratified mixture sampling) — hand-computed expectations on
tiny fixtures plus the scale-shape invariants (broadcast sides, no
cartesian, determinism)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.operators.sampling import (
    cap_per_group,
    stratified_sample,
)
from data_analyse_marche_emploi_spark.operators.text_analysis import (
    chunk_tokens,
    decontaminate,
    pii_redact,
    repetition_signals,
)

from .conftest import SF_SMOKE


def test_repetition_signals_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z w"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(df, "text", "doc_id").collect()}
    r1 = rows[1]  # tokens: a a a b -> 2-grams: (a a)(a a)(a b), distinct 2
    assert r1.n_tokens == 4
    assert r1.distinct_token_ratio == 2 / 4
    assert r1.top_token_frac == 3 / 4
    assert r1.dup_2gram_frac == (3 - 2) / 3
    r2 = rows[2]  # all distinct
    assert r2.distinct_token_ratio == 1.0
    assert r2.top_token_frac == 1 / 4
    assert r2.dup_2gram_frac == 0.0
    r3 = rows[3]  # single token: no 2-grams
    assert r3.n_tokens == 1 and r3.dup_2gram_frac == 0.0


def test_decontaminate_flags_ngram_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta tail"),  # shares 'alpha beta gamma'
            (2, "completely different words here"),
            (3, "x alpha beta gamma y"),  # shares it mid-document
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta",)], "text string"
    )
    out = {
        r.doc_id: r
        for r in decontaminate(corpus, bench, "text", "doc_id", n=3).collect()
    }
    assert out[1].contaminated and out[1].n_contaminated_ngrams == 2
    assert not out[2].contaminated and out[2].n_contaminated_ngrams == 0
    assert out[3].contaminated and out[3].n_contaminated_ngrams == 1


def test_decontaminate_broadcasts_bench_side(spark):
    corpus = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"), F.lit(" a b c d")).alias(
            "text"
        ),
    )
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    plan = decontaminate(corpus, bench, "text", "doc_id", n=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pii_redact_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server 192.168.0.17 then call +33 1 23 45 67 89 ok"),
            (3, "clean text with the number 42"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_redact(df, "text", "doc_id").collect()}
    assert rows[1].text_redacted == "mail <EMAIL> now"
    assert (rows[1].n_emails, rows[1].n_ips, rows[1].n_phones) == (1, 0, 0)
    assert rows[2].text_redacted == "server <IP> then call <PHONE> ok"
    assert (rows[2].n_emails, rows[2].n_ips, rows[2].n_phones) == (0, 1, 1)
    # the IP is redacted BEFORE phone counting — never double-counted
    assert rows[3].text_redacted == "clean text with the number 42"
    assert (rows[3].n_emails, rows[3].n_ips, rows[3].n_phones) == (0, 0, 0)


def test_chunk_tokens_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "a b")], "doc_id long, text string")
    rows = sorted(
        chunk_tokens(df, "text", "doc_id", window=4, stride=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    d1 = [r for r in rows if r.doc_id == 1]
    # starts 1,4,7,10 -> 4 chunks; last is the single trailing token
    assert [r.chunk_id for r in d1] == [0, 1, 2, 3]
    assert d1[0].chunk_text == "t0 t1 t2 t3"
    assert d1[1].chunk_text == "t3 t4 t5 t6"  # overlap of window-stride=1
    assert d1[3].chunk_text == "t9" and d1[3].n_chunk_tokens == 1
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "a b"


def test_distributed_prefix_sum_matches_global(spark):
    from data_analyse_marche_emploi_spark.operators.prefix_sum import (
        distributed_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in range(500)], "k long, v long"
    )
    out = {
        r.k: r.prefix_sum
        for r in distributed_prefix_sum(df, ["k"], "v").collect()
    }
    acc = 0
    for i in range(500):
        acc += (i * 7) % 13 + 1
        assert out[i] == acc
    # and the plan must not contain a single-partition global window
    plan = (
        distributed_prefix_sum(df, ["k"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_chunks_to_sequences_packing(spark):
    from data_analyse_marche_emploi_spark.operators.text_analysis import (
        chunks_to_sequences,
    )

    # chunks of 4,4,4,2 tokens, target 6: cut points at every 6 tokens
    df = spark.createDataFrame(
        [(1, 0, 4), (1, 1, 4), (2, 0, 4), (2, 1, 2)],
        "doc_id long, chunk_id int, n_chunk_tokens int",
    )
    rows = {
        (r.doc_id, r.chunk_id): r
        for r in chunks_to_sequences(
            df, ["doc_id", "chunk_id"], "n_chunk_tokens", target=6
        ).collect()
    }
    assert (rows[(1, 0)].sequence_id, rows[(1, 0)].seq_pos) == (0, 0)
    assert (rows[(1, 1)].sequence_id, rows[(1, 1)].seq_pos) == (0, 4)
    assert (rows[(2, 0)].sequence_id, rows[(2, 0)].seq_pos) == (1, 2)
    assert (rows[(2, 1)].sequence_id, rows[(2, 1)].seq_pos) == (2, 0)


def test_cap_per_group_keeps_lowest_ids(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 80 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    out = cap_per_group(df, "source", "doc_id", cap=10)
    big = sorted(r.doc_id for r in out.filter(F.col("source") == "big").collect())
    assert big == list(range(10))  # deterministic: lowest ids win
    assert out.filter(F.col("source") == "small").count() == 10


def test_stratified_sample_deterministic_and_rate(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "fr").otherwise("zz").alias("lang"),
    )
    rates = {"fr": 0.5}
    a = stratified_sample(df, "lang", "doc_id", rates)
    b = stratified_sample(df, "lang", "doc_id", rates)
    ra = sorted(r.doc_id for r in a.collect())
    rb = sorted(r.doc_id for r in b.collect())
    assert ra == rb  # reproducible — same sample on re-run
    # unlisted stratum dropped entirely
    assert a.filter(F.col("lang") == "zz").count() == 0
    # rate roughly honored (2000 eligible, permille gate < 500)
    assert 800 <= len(ra) <= 1200
    # full-rate stratum keeps everything
    full = stratified_sample(df, "lang", "doc_id", {"fr": 1.0})
    assert full.count() == 2000
    # salt changes the sample but not its size class
    salted = stratified_sample(df, "lang", "doc_id", rates, salt=7)
    rs = sorted(r.doc_id for r in salted.collect())
    assert rs != ra


def test_grouped_prefix_sum_matches_window(spark):
    """The two-phase grouped cumsum must equal the single-window
    PARTITION BY answer exactly, for every group."""
    from pyspark.sql import Window

    from data_analyse_marche_emploi_spark.operators.prefix_sum import (
        grouped_prefix_sum,
    )

    df = spark.createDataFrame(
        [(g, i, (i * 7 + ord(g) * 3) % 11 + 1) for g in ["a", "b", "c"] for i in range(200)],
        "grp string, k long, v long",
    )
    got = {
        (r["grp"], r["k"]): r["prefix_sum"]
        for r in grouped_prefix_sum(df, ["grp"], ["k"], "v").collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["grp"], r["k"]): r["ps"]
        for r in df.withColumn("ps", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_token_budget_overshoots_at_most_one_doc(spark):
    """Each stratum's kept token total exceeds its budget by at most
    the final admitted document, and admission order is the key-hash
    gate (deterministic), not input order."""
    from data_analyse_marche_emploi_spark.operators.sampling import (
        token_budget_mixture,
    )
    from data_analyse_marche_emploi_spark.operators.text_analysis import token_count
    from data_analyse_marche_emploi_spark.tables import load_table

    budget = 3000
    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    out = token_budget_mixture(
        d, "lang", "doc_id", "n_tokens", {"fr": budget, "en": budget}
    )
    per = {
        r["lang"]: (r["tot"], r["mx"], r["n"])
        for r in out.groupBy("lang")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per) == {"fr", "en"}
    for lang, (tot, mx, n) in per.items():
        assert tot < budget + mx, (lang, tot, mx)
        assert n >= 1
    # determinism under repartitioning
    again = token_budget_mixture(
        d.repartition(13), "lang", "doc_id", "n_tokens",
        {"fr": budget, "en": budget},
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_train_split_is_stable_under_corpus_growth(spark):
    """A document's split never changes when the corpus doubles — the
    anti-leakage property hash-based splits exist for."""
    from data_analyse_marche_emploi_spark.operators.sampling import (
        train_val_test_split,
    )

    small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in train_val_test_split(small, "doc_id").collect()}
    s2 = {r["doc_id"]: r["split"] for r in train_val_test_split(big, "doc_id").collect()}
    assert all(s2[k] == v for k, v in s1.items())
    # ratios in the right neighborhood on the bigger draw
    from collections import Counter

    c = Counter(s2.values())
    assert c["train"] > 1800 and c["val"] + c["test"] < 200


def test_shuffle_deterministic_is_reproducible_permutation(spark):
    from data_analyse_marche_emploi_spark.operators.sampling import (
        shuffle_deterministic,
    )

    d = spark.range(0, 257).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_deterministic(d, "doc_id").collect()}
    # a true permutation: positions are exactly 1..n
    assert sorted(a.values()) == list(range(1, 258))
    # rerun-stable (the whole point vs rand())
    b = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_deterministic(d, "doc_id").collect()}
    assert a == b
    # seeded: another seed is a different permutation of the same support
    c = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_deterministic(d, "doc_id", seed=7).collect()}
    assert sorted(c.values()) == list(range(1, 258)) and c != a
    # and it actually shuffles: the identity order is broken
    assert any(a[i] != i + 1 for i in range(257))


def test_distributed_prefix_sum_double_values(spark):
    from data_analyse_marche_emploi_spark.operators.prefix_sum import (
        distributed_prefix_sum,
        grouped_prefix_sum,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", 2.5), (3, "b", 10.0)], "k long, g string, v double"
    )
    got = {
        r["k"]: r["ps"]
        for r in distributed_prefix_sum(df, ["k"], "v", "ps").collect()
    }
    assert got == {1: 1.5, 2: 4.0, 3: 14.0}
    got2 = {
        r["k"]: r["ps"]
        for r in grouped_prefix_sum(df, ["g"], ["k"], "v", "ps").collect()
    }
    assert got2 == {1: 1.5, 2: 4.0, 3: 10.0}


def test_prefix_sum_decimal_values(spark):
    from decimal import Decimal

    from data_analyse_marche_emploi_spark.operators.prefix_sum import (
        distributed_prefix_sum,
    )

    df = spark.createDataFrame(
        [(1, Decimal("1.10")), (2, Decimal("2.20"))], "k long, v decimal(10,2)"
    )
    got = {r["k"]: r["ps"] for r in distributed_prefix_sum(df, ["k"], "v", "ps").collect()}
    assert got == {1: Decimal("1.10"), 2: Decimal("3.30")}


def test_sample_weighted_proportional_and_deterministic(spark):
    from data_analyse_marche_emploi_spark.operators.sampling import sample_weighted

    # 400 light docs (w=10) + 100 heavy docs (w=100): W = 14000
    rows = [(i, 10) for i in range(400)] + [(i, 100) for i in range(400, 500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = sample_weighted(df, "doc_id", "w", target_k=50).collect()
    ids = {r["doc_id"] for r in kept}
    # deterministic: identical on re-run
    assert {r["doc_id"] for r in sample_weighted(df, "doc_id", "w", 50).collect()} == ids
    # heavy docs are ~10x more likely: p_heavy = 50*100/14000 = 0.357,
    # p_light = 0.036 — the heavy share of the sample dominates
    heavy = sum(1 for i in ids if i >= 400)
    light = len(ids) - heavy
    assert heavy > light
    # expected size ~50; permille-quantized gate keeps it in a loose band
    assert 25 <= len(ids) <= 90
    # weight above the cap ==> always kept (p = min(1, .))
    df2 = df.union(spark.createDataFrame([(999, 100000)], "doc_id long, w long"))
    assert 999 in {r["doc_id"] for r in sample_weighted(df2, "doc_id", "w", 50).collect()}


def test_sample_weighted_rejects_fractional_weights(spark):
    """A quality score in (0,1) would int64-truncate to 0 and silently
    never be sampled — the operator must refuse non-integral weights."""
    import pytest

    from data_analyse_marche_emploi_spark.operators.sampling import sample_weighted

    df = spark.createDataFrame([(1, 0.9), (2, 0.1)], "doc_id long, w double")
    with pytest.raises(TypeError, match="integral weight"):
        sample_weighted(df, "doc_id", "w", target_k=1)


def test_grouped_prefix_sum_null_group(spark):
    """A NULL group value must neither crash the driver-side offset
    sort (None vs str TypeError) nor vanish through the equi-join
    (NULL keys never match a plain join): null-group rows form their
    own stratum with a correct running sum."""
    from pyspark.sql import functions as F

    from data_analyse_marche_emploi_spark.operators.prefix_sum import (
        grouped_prefix_sum,
    )

    rows = [("fr", 1, 10), (None, 2, 20), ("fr", 3, 30), (None, 4, 40),
            ("en", 5, 50), (None, 6, 60)]
    df = spark.createDataFrame(rows, "grp string, k int, v int")
    got = {
        (r["grp"], r["k"]): r["ps"]
        for r in grouped_prefix_sum(df, ["grp"], ["k"], "v", "ps").collect()
    }
    assert len(got) == 6  # no row dropped
    assert got[("fr", 1)] == 10 and got[("fr", 3)] == 40
    assert got[("en", 5)] == 50
    assert got[(None, 2)] == 20 and got[(None, 4)] == 60 and got[(None, 6)] == 120


def test_char_lm_scores_match_pure_python(spark):
    """char_lm_scores vs an independent pure-Python trigram LM on a
    tiny corpus: same counts, same add-one smoothing, same mean -ln P."""
    import math
    from collections import Counter

    from data_analyse_marche_emploi_spark.operators.text_analysis import (
        char_lm_scores,
    )

    texts = {1: "abcabc", 2: "abcd", 3: "zzzz", 4: "xy"}  # 4 is too short
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )

    # reference model
    tris, c3 = [], Counter()
    per_doc = {}
    for i, t in texts.items():
        if len(t) < 3:
            continue
        ts = [t[k:k + 3] for k in range(len(t) - 2)]
        per_doc[i] = ts
        c3.update(ts)
    c2 = Counter()
    for tri, c in c3.items():
        c2[tri[:2]] += c
    alphabet = {tri[2] for tri in c3}
    a = len(alphabet)

    def lp(tri):
        return math.log((c3[tri] + 1.0) / (c2[tri[:2]] + a))

    expected = {
        i: (round(sum(-lp(t) for t in ts) / len(ts), 6), len(ts))
        for i, ts in per_doc.items()
    }

    got = {
        r["doc_id"]: (r["cross_entropy"], r["n_trigrams"])
        for r in char_lm_scores(df, "text", "doc_id").collect()
    }
    assert got == expected
    assert 4 not in got  # sub-trigram docs excluded, like the oracle


def test_lang_id_ngram_classifies_planted_languages(spark):
    """Trigram-profile language ID on hand-planted texts: each seed
    language's own prose classifies correctly, gibberish with no
    profile trigrams → 'und', and a doc too short for trigrams → 'und'."""
    from data_analyse_marche_emploi_spark.operators.text_analysis import (
        lang_id_ngram,
    )

    rows = [
        (1, "the people watched the animals in the morning light"),
        (2, "les gens regardaient les animaux dans la lumiere du matin"),
        (3, "die menschen schauten den tieren am morgen zu und waren dort"),
        (4, "la gente miraba los animales en la luz de la manana alli"),
        (5, "zzqq xxjj qqzz"),
        (6, "ab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["detected_lang"]
           for r in lang_id_ngram(df, "text", "doc_id").collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "es"
    assert got[5] == "und"
    assert got[6] == "und"


def test_dsir_select_matches_python_reference(spark):
    """Exact-equality differential on a seeded corpus: the distributed
    DSIR scorer (hashed unigram+bigram features, add-1-smoothed
    target/raw distributions, floor-bucketed per-bucket log-ratios,
    exact-integer doc scores, deterministic top-k) must reproduce a
    sequential Python reference bit-for-bit — including the md5 hash
    family and the tie-breaks."""
    import hashlib
    import math
    import random

    from data_analyse_marche_emploi_spark.operators.sampling import (
        dsir_select,
    )

    rng = random.Random(9)
    target_vocab = ["paris", "emploi", "offre", "contrat", "salaire"]
    noise_vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

    def doc(n, vocab, mix=0.0):
        words = [
            rng.choice(target_vocab) if rng.random() < mix else rng.choice(vocab)
            for _ in range(n)
        ]
        return " ".join(words)

    target = {i: doc(12, target_vocab, mix=1.0) for i in range(10)}
    # raw docs with varying target-likeness; a couple of 1-token docs
    # exercise the empty-bigram guard
    raw = {100 + i: doc(10, noise_vocab, mix=i / 30.0) for i in range(30)}
    raw[200] = "paris"
    raw[201] = "zeta"

    B, K = 256, 8

    def grams(text):
        toks = text.split(" ")
        return toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    rc, tc = {}, {}
    per_doc = {}
    for i, t in raw.items():
        for g in grams(t):
            b = bucket(g)
            rc[b] = rc.get(b, 0) + 1
            per_doc.setdefault(i, {})
            per_doc[i][b] = per_doc[i].get(b, 0) + 1
    for t in target.values():
        for g in grams(t):
            b = bucket(g)
            tc[b] = tc.get(b, 0) + 1
    Cs, Ct = sum(rc.values()), sum(tc.values())
    llr6 = {
        b: math.floor(
            math.log(
                ((tc.get(b, 0) + 1) * (Cs + B))
                / ((rc.get(b, 0) + 1) * (Ct + B))
            )
            * 1e6
        )
        for b in set(rc) | set(tc)
    }
    scores = {
        i: sum(n * llr6[b] for b, n in bs.items())
        for i, bs in per_doc.items()
    }
    expected = sorted(
        scores.items(), key=lambda kv: (-kv[1], kv[0])
    )[:K]

    raw_df = spark.createDataFrame(
        list(raw.items()), "doc_id long, text string"
    )
    tgt_df = spark.createDataFrame(
        list(target.items()), "doc_id long, text string"
    )
    got = [
        (r.doc_id, r.score6)
        for r in dsir_select(
            raw_df, tgt_df, "text", "doc_id", k=K, n_buckets=B
        )
        .orderBy(F.desc("score6"), F.asc("doc_id"))
        .collect()
    ]
    assert got == expected
    # semantic sanity: the pure-target one-token doc must rank above
    # every pure-noise doc
    assert 200 in {i for i, _ in got}

    # Gumbel-top-k path (the paper's actual resampler), bit-exact too:
    # key = score + floor(1e6*T*(-ln(-ln(u)))), u from 52 md5 bits of
    # seed:id
    T, SEED = 25.0, 4
    def key6(i):
        h = int(hashlib.md5(f"{SEED}:{i}".encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / float(1 << 52)
        return scores[i] + math.floor(1e6 * T * -math.log(-math.log(u)))
    expected_g = sorted(
        ((i, scores[i], key6(i)) for i in scores),
        key=lambda t: (-t[2], t[0]),
    )[:K]
    got_g = [
        (r.doc_id, r.score6, r.key6)
        for r in dsir_select(
            raw_df, tgt_df, "text", "doc_id", k=K, n_buckets=B,
            temperature=T, seed=SEED,
        ).orderBy(F.desc("key6"), F.asc("doc_id")).collect()
    ]
    assert got_g == expected_g
    # the noise changes the pick vs the deterministic ranking at this
    # temperature (otherwise the knob proves nothing here)
    assert {i for i, _, _ in got_g} != {i for i, _ in got}


def test_dsir_tokenizes_once_per_gram_subtree(spark):
    """r9 advisor: the bigram lambda re-evaluated split(text, ' ')
    three times per row (plus once for unigrams). The tokens are now
    projected ONCE into __toks, so every grams() subtree in the
    analyzed plan carries exactly one split() — pinned by counting one
    split per explode (each explode node is one tokenize site)."""
    from data_analyse_marche_emploi_spark.operators.sampling import (
        dsir_select,
    )

    raw = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    out = dsir_select(raw, tgt, "text", "doc_id", k=1, n_buckets=16)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("split(") == analyzed.count("explode(")


def test_gopher_gate_rules_and_composite(spark):
    """Each Gopher rule fails exactly the doc constructed to fail it,
    the composite keep is the conjunction, and a clean doc passes all
    five."""
    from data_analyse_marche_emploi_spark.operators.text_analysis import (
        gopher_quality_gate,
    )

    good = "the quick brown fox jumps over a lazy dog " * 6  # 60 words+stops
    docs = spark.createDataFrame(
        [
            (1, good.strip()),
            (2, "the of a to in is"),                    # too few words
            (3, " ".join(["a"] * 60)),                   # mean len < 3
            (4, " ".join(["12345"] * 60)),               # no alpha, no stops
            (5, " ".join(["wordy"] * 60)),               # no stopwords
            (6, good.strip() + " " + " ".join(["#"] * 30)),  # symbols
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality_gate(
            docs, "text", "doc_id", min_words=50, min_stopwords=2
        ).collect()
    }
    assert out[1]["keep"] and all(
        out[1][c] for c in ("r_word_count", "r_mean_len", "r_alpha",
                            "r_stopwords", "r_symbols")
    )
    assert not out[2]["r_word_count"] and not out[2]["keep"]
    assert not out[3]["r_mean_len"] and not out[3]["keep"]
    assert not out[4]["r_alpha"] and not out[4]["r_stopwords"]
    assert not out[5]["r_stopwords"] and out[5]["r_word_count"]
    assert not out[6]["r_symbols"] and not out[6]["keep"]
