"""Pipeline-parity tests on the real offer domain (SURVEY.md §5.3):
the regex chain on fixture strings with guillemets, `&nbsp`, `\\r`,
emoji, NBSP; the keyed upsert; the error channel; the completeness
invariant — all per FIXTURES.md §B.1's synthetic-row recipe."""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F

from data_analyse_marche_emploi_spark.domain.offres import (
    ROME_DATA,
    export_offres_csv_df,
    extract_tech,
    ingest_offres,
    parse_offres,
)

OFFRES = [
    {
        "id": "OFR-1",
        "intitule": "Développeur «Big-Data» H/F ✔",
        "description": "Poste à pourvoir&nbsp;rapidement.\r\nÉquipe  dynamique !",
        "romeCode": "M1805",
        "codeNAF": "62.01Z",
        "qualificationCode": "9",
        "dateActualisation": "2024-01-02T10:00:00",
        "lieuTravail": {"commune": "75056", "libelle": "Paris"},
    },
    {
        "id": "OFR-2",
        "intitule": "Data ➡ Scientist (M1403) ¿",
        "description": "SQL, Python/Spark — l'équipe t'attend *vite*",
        "romeCode": "M1403",
        "codeNAF": "62.02A",
        "qualificationCode": "9",
        "dateActualisation": "2024-01-03T09:00:00",
        "lieuTravail": {"commune": "69123", "libelle": "Lyon"},
    },
    # duplicate id OFR-1 — newer dateActualisation must win the upsert
    {
        "id": "OFR-1",
        "intitule": "Développeur Big Data sénior",
        "description": "mise à jour",
        "romeCode": "M1805",
        "codeNAF": "62.01Z",
        "qualificationCode": "9",
        "dateActualisation": "2024-01-05T08:00:00",
        "lieuTravail": {"commune": "75056", "libelle": "Paris"},
    },
]
MALFORMED = '{"id": "OFR-BAD", "intitule": '  # truncated JSON


def _raw(spark):
    lines = [json.dumps(o, ensure_ascii=False) for o in OFFRES] + [MALFORMED]
    return spark.createDataFrame([(l,) for l in lines], "value string")


# Independent re-implementations of the two field-exact Logstash chains
# with Python's re module (a third regex engine) — guards against
# silently porting a Java-regex quirk into both the operator and its
# expectation. Note: no trim (gsub never trims) and Oniguruma `\\s` is
# ASCII-only, while `[[:space:]]` (description only) also eats NBSP.
def py_clean_intitule(s: str) -> str:
    """csv-tech.conf:26-31 — lowercase, punct, &nbsp, \\s+."""
    s = s.lower()
    s = re.sub(r'[,*-.:;«»✔➡¿\\"·?!()/]', " ", s)
    s = s.replace("&nbsp", " ")
    s = re.sub("[ \t\n\x0b\f\r]+", " ", s)
    return s


def py_clean_description(s: str) -> str:
    """csv-tech.conf:34-39 — lowercase, \\r, &nbsp, punct,
    [[:space:]], \\s+."""
    s = s.lower()
    s = s.replace("\r", " ")
    s = s.replace("&nbsp", " ")
    s = re.sub(r'[,*-.:;«»✔➡¿\\"·?!()/]', " ", s)
    s = re.sub("[ \t\n\x0b\f\r\u00a0]", " ", s)
    s = re.sub("[ \t\n\x0b\f\r]+", " ", s)
    return s


def test_parse_error_channel(spark):
    good, errors = parse_offres(spark, _raw(spark))
    assert good.count() == 3
    assert errors.count() == 1
    assert errors.first().response == MALFORMED


def test_ingest_upsert_and_metrics(spark, tmp_path):
    offres, errors, metrics = ingest_offres(
        spark, _raw(spark), str(tmp_path / "out"),
        "2024-01-06 08:00:00", "2024-01-06 09:30:00", available_total=2,
    )
    assert offres.count() == 2  # OFR-1 deduped
    winner = offres.filter(F.col("id") == "OFR-1").first()
    assert winner.intitule == "Développeur Big Data sénior"  # last writer
    m = metrics.first()
    assert m.total_offres_collecte == 2 and m.complet is True
    assert m.duree_totale == "01:30"
    assert m.date_debut == "06/01/2024 08:00:00"


def test_export_pipeline_flattens_nested(spark):
    good, _ = parse_offres(spark, _raw(spark))
    out = export_offres_csv_df(good)
    assert out.columns == [
        "id", "codeNAF", "romeCode", "qualificationCode",
        "dateActualisation", "codecommune",
    ]
    assert {r.codecommune for r in out.collect()} == {"75056", "69123"}


def test_incremental_ndjson_ingest_two_batches(spark, tmp_path):
    """The reference's continuous-collection intent, live: an NDJSON
    offer feed consumed file-by-file (one micro-batch each), parsed
    with the PERMISSIVE channel, upserted by id via foreachBatch.
    Batch 2 updates OFR-1 — last writer must win across micro-batches."""
    from pyspark.sql import functions as F  # noqa: F811

    from data_analyse_marche_emploi_spark.domain.offres import OFFRE_SCHEMA
    from data_analyse_marche_emploi_spark.operators.ingest import (
        parse_json_with_error_channel,
    )
    from data_analyse_marche_emploi_spark.streaming.incremental import (
        foreach_batch_upsert,
    )

    src = tmp_path / "feed"
    src.mkdir()
    batch1 = [OFFRES[0], OFFRES[1]]
    batch2 = [OFFRES[2]]  # OFR-1 with a newer dateActualisation
    (src / "b1.ndjson").write_text(
        "\n".join(json.dumps(o, ensure_ascii=False) for o in batch1)
    )
    (src / "b2.ndjson").write_text(
        "\n".join(json.dumps(o, ensure_ascii=False) for o in batch2)
    )

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    good, _errors = parse_json_with_error_channel(spark, raw, "value", OFFRE_SCHEMA)
    out = str(tmp_path / "offres_table")
    foreach_batch_upsert(good, out, key="id", recency="dateActualisation")

    table = spark.read.parquet(out)
    assert table.count() == 2
    winner = table.filter(F.col("id") == "OFR-1").first()
    assert winner.intitule == "Développeur Big Data sénior"
    assert table.filter(F.col("id") == "OFR-2").count() == 1


def test_extract_tech_regex_chain_parity(spark):
    good, _ = parse_offres(spark, _raw(spark))
    tech = {r.id: r for r in extract_tech(good).collect()}
    # terms filter: only the two M1805 variants of OFR-1 pass; upsert
    # hasn't run here so both raw rows flow through the extract
    assert set(tech) == {"OFR-1"}
    data = {r.id: r for r in extract_tech(good, ROME_DATA).collect()}
    assert set(data) == {"OFR-2"}
    # regex-chain parity with an independent engine, incl. hand checks
    for o in OFFRES:
        row = tech.get(o["id"]) if o["romeCode"] != "M1403" else data.get(o["id"])
        if row is None or o["id"] == "OFR-1":
            continue
        assert row.intitule == py_clean_intitule(o["intitule"])
        assert row.description == py_clean_description(o["description"])
    # Field-exact = no trim: the stripped trailing `¿` / `*` leave one
    # trailing space, exactly as the Logstash gsub chain would.
    assert data["OFR-2"].intitule == "data scientist m1403 "
    assert data["OFR-2"].description == "sql python spark — l'équipe t'attend vite "


def test_field_exact_chains_nbsp_divergence(spark):
    """The one observable difference between the two conf chains
    (csv-tech.conf:29-31 vs :34-39): intitule has no Unicode
    ``[[:space:]]`` step and Oniguruma ``\\s`` is ASCII-only, so NBSP
    survives the intitule chain but not the description chain."""
    from data_analyse_marche_emploi_spark.functions.text import (
        clean_description_chain,
        clean_intitule_chain,
    )

    s = "Chef\u00a0de projet&nbsp;SI !\r\n vite"
    df = spark.createDataFrame([(s,)], "t string")
    row = df.select(
        clean_intitule_chain(F.col("t")).alias("i"),
        clean_description_chain(F.col("t")).alias("d"),
    ).first()
    assert row.i == py_clean_intitule(s) and "\u00a0" in row.i
    assert row.d == py_clean_description(s) and "\u00a0" not in row.d
