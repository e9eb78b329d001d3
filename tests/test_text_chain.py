"""Pipeline-parity fixtures for the Logstash text-cleaning chain
(SURVEY.md §5 item 3, FIXTURES.md B.1 synthetic-row recipe): guillemets,
the `*-.` codepoint range, `&nbsp` without semicolon, \\r and \\n, space
runs, U+00A0 NBSP, emoji in the strip class, and characters that must
survive (é, ')."""

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.functions.text import clean_text_chain

CASES = [
    # (raw, expected after the full chain)
    ("Développeur PYTHON (H/F)", "développeur python h f"),
    ("«Data», Engineer!", "data engineer"),
    # hyphen + asterisk + plus + comma + dot are all in the *-. range
    ("mot-clé C++ 3.9 *star*", "mot clé c 3 9 star"),
    # ';' is stripped by the punct class BEFORE the &nbsp rule runs
    ("texte&nbsp;avec&nbspentité", "texte avec entité"),
    ("ligne1\r\nligne2", "ligne1 ligne2"),
    ("espaces   multiples\tta bs", "espaces multiples ta bs"),
    ("✔ fait ➡ suite ¿qué? · milieu", "fait suite qué milieu"),
    ("l'apostrophe survit", "l'apostrophe survit"),
]


def test_clean_text_chain_fixtures(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, t string")
    out = {
        r["i"]: r["c"]
        for r in df.select("i", clean_text_chain(F.col("t")).alias("c")).collect()
    }
    for i, (raw, expected) in enumerate(CASES):
        assert out[i] == expected, f"case {i} {raw!r}: got {out[i]!r}, want {expected!r}"


def test_fold_accents_matches_duckdb_strip_accents(spark):
    """The translate fold map must agree with DuckDB's ICU-backed
    strip_accents character-for-character over the whole supported
    set (and é-style combining sequences are out of scope: the map is
    precomposed codepoints only, like the fixture data)."""
    import duckdb

    from data_analyse_marche_emploi_spark.functions.text import (
        ACCENTED,
        UNACCENTED,
        fold_accents,
    )

    assert len(ACCENTED) == len(UNACCENTED)
    probe = "début çà-ôù ÉLÈVE naïve " + ACCENTED
    got = (
        spark.createDataFrame([(probe,)], "s string")
        .select(fold_accents(F.col("s")).alias("f"))
        .collect()[0]["f"]
    )
    expected = duckdb.sql(
        "SELECT strip_accents(?) AS f", params=[probe]
    ).fetchone()[0]
    assert got == expected
