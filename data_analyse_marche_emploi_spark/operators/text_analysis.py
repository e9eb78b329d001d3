"""Text-analysis operators for a training-data pipeline (north-star
extensions, BASELINE.json): language ID, quality scoring, token
counting, document fingerprinting. These extend the reference's planned
NLP stage over ``intitule``/``description`` (README.md:10) to the
operations an LLM-data pipeline runs over a 100 TB corpus.

All operators are pure Column-expression compositions (JVM-side,
codegen'd) — per-document work with no shuffle except where a join or
group-by is semantically required. At scale they are map-side: a corpus
scan emits (doc, features) partitions-in/partitions-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the n-gram/stopword
# language-ID heuristic. Deliberately small + deterministic.
LANG_WORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ein", "zu", "ist"],
    "en": ["the", "of", "and", "a", "to", "in", "is"],
    "es": ["el", "los", "de", "y", "un", "que", "es"],
    "fr": ["le", "la", "les", "de", "et", "un", "une"],
}

STOPWORDS_EN = ["the", "of", "and", "a", "to", "in", "is"]

# Compact French stopword list for the reference's planned NLP stage
# (README.md:10 — analysis of intitule/description). Owned by the
# engine so the DuckDB oracle can embed the identical list; extend
# freely (both sides read this constant).
STOPWORDS_FR = [
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du", "elle",
    "en", "et", "eux", "il", "ils", "je", "la", "le", "les", "leur",
    "lui", "ma", "mais", "me", "même", "mes", "moi", "mon", "ne", "nos",
    "notre", "nous", "on", "ou", "où", "par", "pas", "pour", "qu", "que",
    "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes", "toi",
    "ton", "tu", "un", "une", "vos", "votre", "vous", "à", "d", "l",
    "s", "est", "sont", "être", "avoir",
]


def remove_stopwords_fr(tokens_col: Column) -> Column:
    """Drop French stopwords from a token array (the engine-owned
    equivalent of Spark ML's StopWordsRemover(french), kept as a pure
    Column expression so it stays JVM-side and oracle-checkable)."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS_FR])
    return F.filter(tokens_col, lambda t: ~F.array_contains(stop, t))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token proxy: word runs + isolated non-word-non-space
    characters (the classic pre-tokenizer regex)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(r"\w+|[^\w\s]"), 0))


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality signals: token count, mean token length,
    punctuation ratio, English-stopword ratio. All ratios are exact
    int/int double divisions (engine-portable, no accumulation order).
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        ((n_chars - (n_tok - F.lit(1))) / n_tok).alias("mean_token_len"),
        ((n_chars - n_alnum) / n_chars).alias("punct_ratio"),
        (n_stop / n_tok).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Function-word language ID: tokenize, count hits per language
    wordlist, argmax (ties → lexicographically first language), 'und'
    when nothing matches.

    Scale shape: explode → broadcast-join the (lang, word) dim →
    two-level aggregation. The wordlist dim is tiny and broadcast; the
    only shuffle is the per-(doc, lang) count, which partial-aggregates
    map-side first.
    """
    spark: SparkSession = df.sparkSession
    words = spark.createDataFrame(
        [(lang, w) for lang, ws in sorted(LANG_WORDS.items()) for w in ws],
        "lang string, w string",
    )
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    scores = (
        toks.join(F.broadcast(words), toks["tok"] == words["w"])
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("hits"), F.asc("lang"))
    best = scores.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return df.select(F.col(id_col)).join(best, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("lang"), F.lit("und")).alias("detected_lang"),
    )


def tf_idf_top_terms(
    df: DataFrame, text_col: str, id_col: str, top_n: int = 3
) -> DataFrame:
    """Per-document top-N terms by smoothed TF-IDF, as pure DataFrame
    algebra (no ML pipeline, no fitted model to ship):

    tf(t, d)  = occurrences of t in d
    idf(t)    = ln((N + 1) / (df(t) + 1)) + 1   (sklearn-style smooth)
    score     = tf · idf, 1e-6-floor-bucketed for deterministic ranking

    Scale shape: explode → per-(doc, term) partial-aggregated count →
    per-term document frequency (second small aggregate) joined back,
    window top-N per doc. The doc-frequency table is term-cardinality
    sized (≪ corpus) and broadcast when small.
    """
    # Corpus size as a broadcast one-row aggregate folded into the plan
    # (not a separate df.count() action on the driver).
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score6", F.floor(F.col("tf") * idf * 1e6).cast("long"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score6"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "term", "rank", "score6")
    )


def fingerprint(col: Column) -> Column:
    """Normalized document fingerprint: md5 of the sorted distinct token
    set — the canonical near-canonicalization fingerprint (token-order
    and repetition insensitive)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


# Rolling-hash parameters: Mersenne-prime modulus keeps the fold inside
# signed-64 under ANSI (acc < 2^31, acc*131 + 2^32 < 2^39).
ROLLING_BASE = 131
ROLLING_MOD = 2_147_483_647  # 2^31 - 1


def fingerprint_rolling(col_name: str) -> Column:
    """Order-sensitive rolling-hash fingerprint (Rabin-Karp style) over
    the token stream: each token maps to a 32-bit value via its md5
    prefix (portable across engines — no shared native string hash
    exists), folded as ``acc·base + h mod p``. Distinguishes
    permutations the set-based :func:`fingerprint` deliberately
    ignores; the building block for shift-tolerant chunk fingerprints.
    Takes the column *name* (the fold is a single SQL expression).
    """
    return F.expr(
        "aggregate("
        f"  transform(split(lower({col_name}), ' '),"
        "            t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)),"
        f"  0L, (acc, h) -> (acc * {ROLLING_BASE} + h) % {ROLLING_MOD})"
    )
