"""data_analyse_marche_emploi_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference project
``projet-data-engineer/data-analyse-marche-emploi`` (a French job-market
ingestion + Logstash-extract + Kibana-analytics stack), re-expressed as an
idiomatic PySpark library:

- every reference operator (SURVEY.md §2) is a documented, tested function
  over DataFrames — declarative, Catalyst-optimized, scale-oblivious;
- the reference's delegated analytic surface (Elasticsearch/Kibana
  aggregations) is owned natively (``operators.aggregates``);
- the Logstash ``mutate`` text pipelines are pure Column-expression chains
  (``functions.text``, ``plans.pipelines``);
- ingestion semantics (keyed upsert, error side-table, run metrics) live in
  ``operators.ingest``;
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) extend the surface (``operators.dedup``,
  ``operators.similarity``, ``operators.text_analysis``,
  ``operators.multimodal``);
- incremental/streaming variants use Structured Streaming (``streaming``).

Design stance: DataFrame/SQL only on the data path (no RDDs, no collect()),
broadcast joins for genuine dimensions, AQE on, explicit schemas, Pandas UDFs
only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .tables import TABLES, load_table, register_views  # noqa: F401
