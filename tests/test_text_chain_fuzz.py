"""Seeded fuzz parity for the Logstash mutate chain: Spark's Java-regex
implementation must agree with an independent Python `re`
re-implementation on adversarial inputs (guillemets, emoji, NBSP, the
`*-.` range members, `&nbsp` fragments, control whitespace) — the exact
spots SURVEY.md §7 flags as where silent engine divergence would hide."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.functions.text import clean_text_chain

ALPHABET = (
    list("abcXYZ0189éèàçœ'’@#$%&=+<>[]{}|~^_`")
    + list(",*+-.:;«»✔➡¿\\\"·?!()/")  # the strip class incl. range members
    + ["&nbsp", "&nbsp;", "\r", "\n", "\t", "\x0b", "\f", " ", " ", "  ", "✔➡", "a-b"]
)


def py_clean(s: str) -> str:
    s = s.lower()
    s = re.sub(r'[,*-.:;«»✔➡¿\\"·?!()/]', " ", s)
    s = s.replace("&nbsp", " ")
    s = s.replace("\r", " ")
    s = re.sub("[ \t\n\x0b\f\r ]", " ", s)
    s = re.sub("[ \t\n\x0b\f\r ]+", " ", s)
    return s.strip()


def test_clean_chain_fuzz_parity(spark):
    rng = random.Random(42)
    cases = [
        "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 40)))
        for _ in range(500)
    ]
    # deterministic edge cases on top of the random ones
    cases += ["", " ", " ", "&nbsp&nbsp;", "*-.,", "A«B»C", "✔", "a\rb\nc"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, s string")
    got = {
        r.i: r.out
        for r in df.select("i", clean_text_chain(F.col("s")).alias("out")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == py_clean(c), f"case {i}: {c!r} -> {got[i]!r} != {py_clean(c)!r}"
