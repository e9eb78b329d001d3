"""Text-cleaning Column functions — the Logstash ``mutate`` chain.

The reference cleans ``intitule``/``description`` for downstream NLP with
an *ordered* chain of gsub filters (reference: logstash/pipeline/
csv-tech.conf:24-41 and csv-tech-data.conf:19-36):

    lowercase → strip punctuation class → strip ``&nbsp`` → strip ``\\r``
    → normalize POSIX space → collapse whitespace runs

Two portability subtleties (SURVEY.md §2.C) are preserved exactly:

1. The punctuation class ``[,*-.:;«»✔➡¿\\"·?!()/]`` contains the **range**
   ``*-.`` (codepoints ``*`` ``+`` ``,`` ``-`` ``.``) and mixed
   ASCII/guillemets/emoji. Java regex accepts the class verbatim.
2. Logstash's ``[[:space:]]`` (POSIX) matches U+000B and — unlike Java's
   ``\\s`` in some configurations — we pin an explicit class so behavior
   is engine-independent and matches RE2/DuckDB for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The exact character class from csv-tech.conf:30 — `*-.` is a codepoint
# range, kept deliberately (do not "fix" it to literals).
PUNCT_CLASS = r'[,*-.:;«»✔➡¿\\"·?!()/]'

# Engine-independent whitespace class: POSIX [[:space:]] under Oniguruma
# on UTF-8 is Unicode-aware, so it also matches U+00A0 NBSP — the exact
# divergence case vs Java's \s flagged in SURVEY.md §2.C. Spelled out
# explicitly (same syntax valid in Java regex and RE2/DuckDB).
SPACE_CLASS = "[ \\t\\n\\x0B\\f\\r\\x{00A0}]"

# Oniguruma's ``\s`` on the other hand is ASCII-only (no NBSP) — the
# class Logstash's ``gsub => [..., '\s+', ' ']`` steps actually use.
# Spelled out so Java/RE2/Python agree byte-for-byte.
ASCII_SPACE_CLASS = "[ \\t\\n\\x0B\\f\\r]"


def lower(col: Column) -> Column:
    """Lowercase (reference: csv-tech.conf:26-28)."""
    return F.lower(col)


def strip_punctuation(col: Column) -> Column:
    """Punctuation class → space (reference: csv-tech.conf:30,:37)."""
    return F.regexp_replace(col, PUNCT_CLASS, " ")


def strip_nbsp(col: Column) -> Column:
    """Literal ``&nbsp`` (no trailing ``;``) → space (csv-tech.conf:31,:36)."""
    return F.regexp_replace(col, "&nbsp", " ")


def strip_carriage_returns(col: Column) -> Column:
    """Remove carriage returns (reference: csv-tech.conf:35)."""
    return F.regexp_replace(col, "\r", " ")


def strip_posix_space(col: Column) -> Column:
    """POSIX ``[[:space:]]`` → plain space (reference: csv-tech.conf:38)."""
    return F.regexp_replace(col, SPACE_CLASS, " ")


def collapse_whitespace(col: Column) -> Column:
    """Collapse whitespace runs to one space; applied last
    (reference: csv-tech.conf:32,:39)."""
    return F.trim(F.regexp_replace(col, SPACE_CLASS + "+", " "))


# French/Latin-1 accent fold map — single-codepoint folds only (œ/æ
# need 1→2 expansion, which translate cannot express and DuckDB's
# strip_accents keeps them unfolded too, so they are deliberately out
# of scope; the pytest cross-check pins this set equal to DuckDB's
# ICU-backed strip_accents character-for-character).
ACCENTED = "àâäáãéèêëíîïìôöóòõùûüúçñÿýÀÂÄÁÃÉÈÊËÍÎÏÌÔÖÓÒÕÙÛÜÚÇÑŸÝ"
UNACCENTED = "aaaaaeeeeiiiiooooouuuucnyyAAAAAEEEEIIIIOOOOOUUUUCNYY"


def fold_accents(col: Column) -> Column:
    """Fold accented Latin letters to their ASCII base — the search /
    dedup normalization every French corpus needs ('développeur' and
    'developpeur' must collate). Pure ``translate`` (JVM codepoint
    map, whole-stage codegen — no regex, no UDF)."""
    return F.translate(col, ACCENTED, UNACCENTED)


def collapse_ascii_space(col: Column) -> Column:
    """Logstash's ``gsub => ['\\s+', ' ']`` exactly: collapse *ASCII*
    whitespace runs to one space, no trim (gsub never trims), NBSP
    untouched (Oniguruma ``\\s`` is ASCII-only)."""
    return F.regexp_replace(col, ASCII_SPACE_CLASS + "+", " ")


def clean_intitule_chain(col: Column) -> Column:
    """The *intitule* field's exact mutate chain (csv-tech.conf:26-31,
    csv-tech-data.conf — same shape):

        lowercase → punctuation class → ``&nbsp`` → ``\\s+`` collapse

    Field-exact fidelity notes vs :func:`clean_description_chain`:
    no ``\\r`` strip step (``\\r`` still collapses via ``\\s+``), no
    Unicode ``[[:space:]]`` step — so U+00A0 NBSP survives in intitule
    output — and ``&nbsp`` is stripped *after* the punctuation class.
    No trim: Logstash gsub never trims."""
    c = lower(col)
    c = strip_punctuation(c)
    c = strip_nbsp(c)
    return collapse_ascii_space(c)


def clean_description_chain(col: Column) -> Column:
    """The *description* field's exact mutate chain (csv-tech.conf:34-39):

        lowercase → ``\\r`` → ``&nbsp`` → punctuation class
        → ``[[:space:]]`` (Unicode: eats NBSP) → ``\\s+`` collapse

    ``&nbsp`` is stripped *before* the punctuation class here (the
    opposite order from intitule), and the Unicode space step converts
    NBSP to plain space before the ASCII collapse. No trim."""
    c = lower(col)
    c = strip_carriage_returns(c)
    c = strip_nbsp(c)
    c = strip_punctuation(c)
    c = strip_posix_space(c)
    return collapse_ascii_space(c)


def clean_text_chain(col: Column) -> Column:
    """The full ordered chain of csv-tech.conf:24-41 as one expression.

    Composition order matters and mirrors the Logstash filter order:
    lowercase before regexes, punctuation before whitespace collapse.
    Whole expression stays inside whole-stage codegen (no UDF).
    """
    c = lower(col)
    c = strip_punctuation(c)
    c = strip_nbsp(c)
    c = strip_carriage_returns(c)
    c = strip_posix_space(c)
    c = collapse_whitespace(c)
    return c
