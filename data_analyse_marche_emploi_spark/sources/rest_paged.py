"""Paginated-REST source, Spark-first (SURVEY.md §2.A).

The reference scans the France Travail search API with a hand-rolled
pagination loop — ``range=start-end`` pages of 150, totals parsed from
the ``Content-Range`` header, one OS thread per region, HTTP 429
backoff, errors diverted to an ``erreurs`` index
(ingestion-elasticsearch.py:57-130, :132-227, :272-289).

Here the same capabilities are re-expressed on Spark's execution model:

* **pagination plan, not a loop** — the driver probes the total once
  (``src_count_probe``) and materializes the page list as a DataFrame;
  each page becomes a task, so fetching is distributed over executors
  (``mapInPandas``), replacing the reference's thread-per-region model
  with Spark task scheduling.
* **injectable transport** — a picklable ``fetch(url, params) ->
  (status, headers, body)`` callable. Tests/bench inject a local
  fixture transport; a live deployment injects a ``requests``-backed
  one. The engine never hard-codes a network dependency.
* **429 retry and error channel** live in the per-task fetch loop:
  throttled pages honor ``Retry-After``; malformed pages become error
  rows (the ``erreurs`` side-table convention, operators.ingest).

At 100 TB-scale ingestion the API itself is the bottleneck; what
matters is that page fetches parallelize across the cluster and that
results flow straight into a DataFrame without driver materialization.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGE_SIZE = 150  # reference page size (ingestion-elasticsearch.py:134-135)

Fetch = Callable[[str, dict], tuple[int, dict, str]]


class TokenPool:
    """Round-robin credential pool (reference: one OAuth token per
    configured key pair, round-robined across scan threads to multiply
    the rate-limit quota — ingestion-elasticsearch.py:10-25, :238-244,
    :278-286).

    ``authenticate`` is injectable like the page transport; the pool
    itself is picklable, so distributed fetch tasks can draw tokens.

    ``ttl_seconds`` bounds token age: a token older than the TTL is
    re-authenticated on the next draw (the reference re-auths per run;
    long-lived distributed scans outlive a single OAuth expiry).
    Rotation starts at the Spark partition id inside tasks, so the N
    copies of a pickled pool don't all hammer credential 0 first —
    deterministic under task retries, uniform across the fleet.
    """

    def __init__(self, credentials: list[tuple[str, str]],
                 authenticate: Callable[[str, str], str],
                 ttl_seconds: float | None = None):
        self.credentials = list(credentials)
        self.authenticate = authenticate
        self.ttl = ttl_seconds
        self.tokens = [authenticate(cid, secret) for cid, secret in credentials]
        self.issued = [time.time()] * len(self.tokens)
        self._next: int | None = 0

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_next"] = None  # task-side copies re-seed from partition id
        return state

    def _start_index(self) -> int:
        try:
            from pyspark import TaskContext

            tc = TaskContext.get()
            return tc.partitionId() if tc is not None else 0
        except Exception:
            return 0

    def get(self) -> str:
        if self._next is None:
            self._next = self._start_index()
        i = self._next % len(self.tokens)
        self._next += 1
        if self.ttl is not None and time.time() - self.issued[i] > self.ttl:
            cid, secret = self.credentials[i]
            self.tokens[i] = self.authenticate(cid, secret)
            self.issued[i] = time.time()
        return self.tokens[i]

    def mark_expired(self, token: str) -> None:
        """Force re-auth of a token the server just 401'd."""
        for i, tok in enumerate(self.tokens):
            if tok == token:
                cid, secret = self.credentials[i]
                self.tokens[i] = self.authenticate(cid, secret)
                self.issued[i] = time.time()


def read_referentiel(
    spark: SparkSession, fetch: Fetch, url: str, schema: T.StructType
) -> DataFrame:
    """Small reference-list fetch → dimension DataFrame (reference:
    get_referentiel for regions/départements/métiers,
    ingestion-elasticsearch.py:27-34, :266-270). One driver-side request
    — these lists are tiny (13 regions / ~101 départements) and become
    broadcast dims in joins."""
    status, _, body = fetch(url, {})
    if status != 200:
        raise RuntimeError(f"referentiel fetch failed: HTTP {status}")
    field_names = [f.name for f in schema.fields]
    rows = [tuple(rec.get(k) for k in field_names) for rec in json.loads(body)]
    return spark.createDataFrame(rows, schema)


def parse_content_range(header: str) -> tuple[int, int, int]:
    """Parse ``"offres 0-149/3149"`` → (start, end, total); the empty
    result renders as ``"offres */0"`` → (0, -1, 0)
    (reference: ingestion-elasticsearch.py:62-63, :89-97)."""
    payload = header.split(" ")[1]
    span, total = payload.split("/")
    if span == "*":
        return 0, -1, int(total)
    start, end = span.split("-")
    return int(start), int(end), int(total)


def fetch_page_with_retry(fetch: Fetch, url: str, params: dict,
                          max_retries: int = 5) -> tuple[dict, str]:
    """ONE request through the engine's full transport-failure policy —
    the shared seam between the transports (fixture or live HTTPS) and
    every reader built on them: a 429 sleeps the server's Retry-After
    and retries (reference: ingestion-elasticsearch.py:79-83); a 401
    retries immediately because the transport has already marked the
    drawn token expired (live_transport.HttpPagedTransport), so the
    pool's next draw is a FRESH credential (reference token refresh,
    ingestion-elasticsearch.py:10-25); any other non-2xx — or retry
    exhaustion — raises. Returns ``(headers, body)``.

    Used by fetch_pages (mapInPandas path, where the raise becomes an
    error-channel row) and by both DSv2 readers (batch and streaming,
    where the raise fails the task: a STREAM cannot shunt a page to an
    error channel without silently breaking its exactly-once row
    contract, so transient failures must be absorbed here and
    permanent ones must be loud)."""
    status = None
    for attempt in range(max_retries + 1):
        status, headers, body = fetch(url, params)
        if status in (200, 206):
            return headers, body
        if attempt == max_retries:
            break
        if status == 429:
            time.sleep(float(headers.get("Retry-After", "1")))
        elif status != 401:
            break
    raise RuntimeError(f"HTTP {status} for range={params.get('range', '?')}")


def probe_total(fetch: Fetch, url: str, params: dict | None = None) -> int:
    """Cheap total-count probe via a 1-page request's Content-Range
    (reference: get_nb_total_offres, ingestion-elasticsearch.py:57-64)."""
    headers, _ = fetch_page_with_retry(
        fetch, url, {**(params or {}), "range": "0-5"}
    )
    if "Content-Range" not in headers:
        raise RuntimeError("probe failed: no Content-Range header")
    return parse_content_range(headers["Content-Range"])[2]


def page_plan(spark: SparkSession, total: int, page_size: int = PAGE_SIZE,
              n_partitions: int | None = None) -> DataFrame:
    """The page list as a DataFrame — the scan plan. One row per page;
    repartitioned so page fetches spread across all executors."""
    n_pages = max(0, (total + page_size - 1) // page_size)
    pages = spark.range(n_pages).select(
        (F.col("id") * page_size).alias("page_start"),
        F.least(F.col("id") * page_size + page_size - 1, F.lit(total - 1)).alias("page_end"),
    )
    return pages.repartition(n_partitions or spark.sparkContext.defaultParallelism)


def fetch_pages(
    pages: DataFrame,
    fetch: Fetch,
    url: str,
    row_schema: T.StructType,
    params: dict | None = None,
    max_retries: int = 5,
) -> DataFrame:
    """Distributed page fetch: every page row becomes one HTTP request
    executed inside an Arrow-batched ``mapInPandas`` task.

    Returns rows of ``row_schema`` plus an ``_error`` string column —
    NULL for clean rows; failed pages yield a single error row (the
    reference's erreurs-document behavior, ingestion-elasticsearch.py:99-123)
    so one bad page never fails the job. Split with
    :func:`split_error_channel`.
    """
    out_schema = T.StructType(
        list(row_schema.fields) + [T.StructField("_error", T.StringType())]
    )
    base_params = dict(params or {})
    field_names = [f.name for f in row_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for start, end in zip(batch["page_start"], batch["page_end"]):
                rng = f"{int(start)}-{int(end)}"
                try:
                    # 429 backoff + 401 fresh-token retry live in the
                    # shared helper; only a permanent failure reaches
                    # the error channel below.
                    _, body = fetch_page_with_retry(
                        fetch, url, {**base_params, "range": rng}, max_retries
                    )
                    for rec in json.loads(body)["resultats"]:
                        rows.append(
                            {**{k: rec.get(k) for k in field_names}, "_error": None}
                        )
                except Exception as exc:  # error channel, job continues
                    rows.append(
                        {**{k: None for k in field_names},
                         "_error": f"range={rng}: {exc}"}
                    )
            yield pd.DataFrame(rows, columns=field_names + ["_error"])

    return pages.mapInPandas(run, schema=out_schema)


def split_error_channel(fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split fetch output into (clean rows, error rows) — the erreurs
    side-table convention."""
    good = fetched.filter(F.col("_error").isNull()).drop("_error")
    errors = fetched.filter(F.col("_error").isNotNull()).select(
        F.lit("fetch_pages").alias("query"),
        F.col("_error").alias("message"),
        F.lit("n/a").alias("status_code"),
        F.lit(None).cast("string").alias("response"),
    )
    return good, errors


def read_paged(
    spark: SparkSession,
    fetch: Fetch,
    url: str,
    row_schema: T.StructType,
    params: dict | None = None,
    page_size: int = PAGE_SIZE,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end paged scan: probe → page plan → distributed fetch →
    (rows, errors). The full Spark restatement of the reference's
    ingestion loop (ingestion-elasticsearch.py:132-167)."""
    total = probe_total(fetch, url, params)
    pages = page_plan(spark, total, page_size)
    return split_error_channel(fetch_pages(pages, fetch, url, row_schema, params))
