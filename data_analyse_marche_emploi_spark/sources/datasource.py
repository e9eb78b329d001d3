"""The paged-REST scan as a first-class Spark (4.x) Python Data Source:
``spark.read.format("paged_rest")`` with one input partition per page
range — the DataSourceV2 shape SURVEY.md §2.A maps the reference's
pagination loop onto (ingestion-elasticsearch.py:132-167).

Compared to the ``mapInPandas`` formulation in ``rest_paged.py`` (which
keeps the transport injectable as a Python callable), this variant is
the catalog-integrated form: planned like any other source, partitions
visible to Spark's scheduler, options carried as strings. The fixture
transport is addressed by path; a live deployment subclasses
:class:`PagedRestDataSource` and swaps :meth:`_make_transport` for an
HTTP-backed one (credentials via options + TokenPool).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .fixture_transport import ParquetPagedTransport
from .rest_paged import fetch_page_with_retry, parse_content_range

DEFAULT_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


class PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class PagedRestDataSource(DataSource):
    """Options: ``path`` (fixture parquet the fake API serves),
    ``columns`` (comma-separated), ``order_col``, ``page_size``."""

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self):
        return DEFAULT_SCHEMA

    def reader(self, schema: T.StructType) -> "PagedRestReader":
        return PagedRestReader(schema, self.options)

    def streamReader(self, schema: T.StructType) -> "PagedRestStreamReader":
        return PagedRestStreamReader(schema, self.options)


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]
        self.order_col = options.get("order_col", self.columns[0])
        self.page_size = int(options.get("page_size", "150"))

    def _make_transport(self) -> ParquetPagedTransport:
        return ParquetPagedTransport(self.path, self.columns, self.order_col)

    def partitions(self) -> Sequence[PageRange]:
        """Planning: one count probe, then one InputPartition per page —
        the reference's pagination loop becomes the scan plan."""
        fetch = self._make_transport()
        headers, _ = fetch_page_with_retry(fetch, "plan", {"range": "0-5"})
        total = parse_content_range(headers["Content-Range"])[2]
        return [
            PageRange(s, min(s + self.page_size - 1, total - 1))
            for s in range(0, total, self.page_size)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        """Execution: each task fetches exactly its page, through the
        shared 429-backoff / 401-token-refresh retry seam."""
        fetch = self._make_transport()
        _, body = fetch_page_with_retry(
            fetch, "read", {"range": f"{partition.start}-{partition.end}"}
        )
        for rec in json.loads(body)["resultats"]:
            yield tuple(rec.get(c) for c in self.columns)


class PagedRestStreamReader(DataSourceStreamReader):
    """The paged-REST collection as a STREAM: offsets are row cursors
    into the API's stable ``order_col`` ordering, so each micro-batch
    reads exactly the pages between the committed cursor and the
    collection's current size. This is the reference's continuous-
    collection intent (SURVEY.md §2.F — the nightly re-scan loop of
    ingestion-elasticsearch.py) made incremental end-to-end: a restart
    resumes from the checkpointed cursor and re-reads nothing, and
    rows appended to the collection (higher ``order_col``) arrive in
    the next batch.

    Scale/robustness notes: the cursor contract requires the API
    ordering to be append-stable (new rows sort AFTER served ones —
    true for autoincrement ids, the reference's ``range`` cursor, and
    time-ordered feeds; NOT for mutable sort keys). ``maxRowsPerBatch``
    bounds each micro-batch (admission control — the streaming analog
    of the batch reader's page budget); within a batch, work still
    fans out one InputPartition per page."""

    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]
        self.order_col = options.get("order_col", self.columns[0])
        self.page_size = int(options.get("page_size", "150"))
        max_rows = options.get("maxRowsPerBatch".lower())
        self.max_rows_per_batch = int(max_rows) if max_rows else None
        self._last_planned = 0
        self._last_committed = 0

    def _make_transport(self) -> ParquetPagedTransport:
        return ParquetPagedTransport(self.path, self.columns, self.order_col)

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        fetch = self._make_transport()
        headers, _ = fetch_page_with_retry(fetch, "plan", {"range": "0-5"})
        total = parse_content_range(headers["Content-Range"])[2]
        # Cursor floor: the highest bound this instance has seen from
        # EITHER the planner (partitions) or the commit path. After a
        # checkpoint restart, _last_planned being seeded via Spark's
        # replay of the last committed batch is engine behavior, not
        # contract (verified on pyspark 4.1.2, pinned by test) — so
        # commit(end) also feeds the floor, and the budgeted proposal
        # below can never walk backwards even if a future engine calls
        # latestOffset first (r7 advisor hardening).
        floor = max(self._last_planned, self._last_committed)
        if self.max_rows_per_batch is not None:
            total = min(total, floor + self.max_rows_per_batch)
        return {"row": max(total, floor)}

    def partitions(self, start: dict, end: dict) -> Sequence[PageRange]:
        lo, hi = int(start["row"]), int(end["row"])
        # Track BOTH bounds: after a checkpoint restart the committed
        # cursor (lo) can exceed everything this fresh reader instance
        # has planned, and a budgeted latestOffset below it would walk
        # the offset backwards on the next batch.
        self._last_planned = max(self._last_planned, lo, hi)
        return [
            PageRange(s, min(s + self.page_size - 1, hi - 1))
            for s in range(lo, hi, self.page_size)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        # Same retry seam as the batch reader: transient 429/401 are
        # absorbed here (a stream has no error channel to shunt a page
        # into without breaking its exactly-once row contract);
        # permanent failures fail the task loudly.
        fetch = self._make_transport()
        _, body = fetch_page_with_retry(
            fetch, "read", {"range": f"{partition.start}-{partition.end}"}
        )
        for rec in json.loads(body)["resultats"]:
            yield tuple(rec.get(c) for c in self.columns)

    def commit(self, end: dict) -> None:
        # The fixture API is stateless (a live deployment would ack
        # the cursor here), but the committed bound still feeds the
        # latestOffset floor — see the restart note there.
        self._last_committed = max(self._last_committed, int(end["row"]))


def register(spark: SparkSession) -> None:
    """Idempotently register the format with the session."""
    spark.dataSource.register(PagedRestDataSource)
