"""Scalar Column-expression catalog (SURVEY.md §2.C).

Every transform is a pure ``Column -> Column`` function built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, never a
Python UDF. Order of application is semantically significant (the
reference's Logstash ``mutate`` filters run in declared order).
"""

from .text import (  # noqa: F401
    clean_text_chain,
    collapse_whitespace,
    lower,
    strip_carriage_returns,
    strip_nbsp,
    strip_punctuation,
    strip_posix_space,
)
from .dates import date_fmt_fr, duration_hhmm  # noqa: F401
