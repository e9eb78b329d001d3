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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .fixture_transport import ParquetPagedTransport
from .rest_paged import parse_content_range

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
        status, headers, _ = fetch("plan", {"range": "0-5"})
        total = parse_content_range(headers["Content-Range"])[2]
        return [
            PageRange(s, min(s + self.page_size - 1, total - 1))
            for s in range(0, total, self.page_size)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        """Execution: each task fetches exactly its page."""
        fetch = self._make_transport()
        status, _, body = fetch(
            "read", {"range": f"{partition.start}-{partition.end}"}
        )
        if status not in (200, 206):
            raise RuntimeError(f"HTTP {status} for page {partition.start}")
        for rec in json.loads(body)["resultats"]:
            yield tuple(rec.get(c) for c in self.columns)


def register(spark: SparkSession) -> None:
    """Idempotently register the format with the session."""
    spark.dataSource.register(PagedRestDataSource)
