"""JSON scalar functions (SURVEY.md §2.C json_parse / json_serialize).

The reference parses API JSON (``json.loads``,
ingestion-elasticsearch.py:40,:24) and serializes documents for the bulk
sink (``json.dumps``, :48-49,:112,:123,:313). Engine-side these are
``get_json_object``/``from_json`` and ``to_json(struct(...))`` — all
JVM-side codegen'd expressions, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_get(col: Column, path: str) -> Column:
    """Extract one field from a JSON string column
    (reference: resultats extraction, ingestion-elasticsearch.py:40)."""
    return F.get_json_object(col, path)


def json_serialize(*cols: Column) -> Column:
    """Serialize columns as a JSON document (reference: NDJSON bulk
    lines, ingestion-elasticsearch.py:48-49). Spark omits null fields —
    same as the reference's dict-of-present-keys."""
    return F.to_json(F.struct(*cols))
