"""Local fixture transport for the paged-REST source.

A picklable fake of the France Travail search API
(reference: ingestion-elasticsearch.py:66-130): serves deterministic
pages out of a parquet file with real ``Content-Range`` headers, plus
injectable throttling (HTTP 429 + ``Retry-After``) and failing ranges
so the retry and error-channel paths are exercised without a network.
Each Spark task unpickles its own instance, so per-instance state like
``throttle_first`` behaves deterministically per task.
"""

from __future__ import annotations

import json


class ParquetPagedTransport:
    """``fetch(url, params) -> (status, headers, body)`` backed by a
    parquet file. Pages are ``ORDER BY order_col LIMIT/OFFSET`` slices,
    so the served collection is deterministic."""

    def __init__(
        self,
        path: str,
        columns: list[str],
        order_col: str,
        fail_starts: tuple[int, ...] = (),
        throttle_first: bool = False,
    ):
        self.path = path
        self.columns = columns
        self.order_col = order_col
        self.fail_starts = tuple(fail_starts)
        self.throttle_first = throttle_first
        self._throttled = False

    def __call__(self, url: str, params: dict) -> tuple[int, dict, str]:
        import duckdb

        start_s, end_s = params["range"].split("-")
        start, end = int(start_s), int(end_s)
        if self.throttle_first and not self._throttled:
            self._throttled = True
            return 429, {"Retry-After": "0"}, ""
        if start in self.fail_starts:
            return 500, {}, "injected failure"
        con = duckdb.connect()
        try:
            total = con.sql(
                f"SELECT count(*) FROM read_parquet('{self.path}')"
            ).fetchone()[0]
            if start >= total:
                return 200, {"Content-Range": f"offres */{total}"}, json.dumps(
                    {"resultats": []}
                )
            cols = ", ".join(self.columns)
            n = end - start + 1
            recs = con.sql(
                f"SELECT {cols} FROM read_parquet('{self.path}') "
                f"ORDER BY {self.order_col} LIMIT {n} OFFSET {start}"
            ).fetchall()
            rows = [dict(zip(self.columns, r)) for r in recs]
            headers = {
                "Content-Range": f"offres {start}-{min(end, total - 1)}/{total}"
            }
            return 200, headers, json.dumps({"resultats": rows}, default=str)
        finally:
            con.close()
