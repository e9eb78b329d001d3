"""The reference's three Logstash pipelines as Catalyst-planned jobs
(SURVEY.md §3.2) plus the CSV sink.

Each pipeline is scan → (pushed-down) filter/projection → ordered
mutate chain → ordered output projection — exactly the conf files'
input/filter/output structure, but as one declarative plan: the
ES-server-side ``_source``/``terms`` pushdown becomes Catalyst
column-pruning/predicate-pushdown into the Parquet scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    clean_description_chain,
    clean_intitule_chain,
    clean_text_chain,
)


def pipeline_csv_tech(
    docs: DataFrame,
    id_col: str,
    code_col: str,
    codes: Sequence[str],
    text_cols: Sequence[str] = (),
    title_cols: Sequence[str] = (),
    desc_cols: Sequence[str] = (),
) -> DataFrame:
    """csv-tech / csv-tech-data pipeline shape (reference:
    csv-tech.conf:8-53, csv-tech-data.conf:5-48): terms-filter on the
    code, clean each text column through its field-exact ordered mutate
    chain, project in sink order.

    The conf applies *different* gsub chains per field: ``title_cols``
    get the intitule chain (csv-tech.conf:29-31 — no ``\\r`` step, no
    Unicode-space step, ``&nbsp`` after punctuation), ``desc_cols`` the
    description chain (:34-39). ``text_cols`` keeps the legacy unified
    chain for callers that don't care about the field-order asterisk."""
    filt = docs.filter(
        F.col(code_col) == codes[0] if len(codes) == 1 else F.col(code_col).isin(*codes)
    )
    cleaned = filt.select(
        F.col(id_col),
        F.col(code_col),
        *[clean_intitule_chain(F.col(c)).alias(c) for c in title_cols],
        *[clean_description_chain(F.col(c)).alias(c) for c in desc_cols],
        *[clean_text_chain(F.col(c)).alias(c) for c in text_cols],
    )
    return cleaned


def pipeline_export_offres(docs: DataFrame, fields: Sequence[tuple[str, str]]) -> DataFrame:
    """export-offres-csv pipeline shape (reference:
    export-offres-csv.conf:1-26): match_all scan, rename/flatten,
    ordered projection — no text cleaning."""
    return docs.select(*[F.col(src).alias(dst) for src, dst in fields])


def snk_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink with header and ',' separator (reference:
    output { csv { ... } }, csv-tech.conf:45-53). ``single_file``
    coalesces to one partition for parity with Logstash's single
    output file — only for small extracts; at scale leave partitioned."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").option("sep", ",").csv(path)
