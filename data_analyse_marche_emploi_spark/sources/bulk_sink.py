"""NDJSON bulk sink as a Python DataSource writer — the reference's
Elasticsearch `_bulk` wire format (ingestion-elasticsearch.py:44-55):
action line ``{"index": {"_id": <id>}}`` followed by the document line,
one pair per row.

``spark.read/write.format("bulk_ndjson")``: each task writes its
partition as one ``part-<job>-<task>.ndjson`` file of framed pairs —
exactly what a downstream bulk-load into ES (or any keyed store)
consumes. The commit protocol is Spark's: tasks report written files,
the job-level commit keeps them (abort leaves partials to be ignored by
the marker file convention).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql import Row, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class BulkWriteCommit(WriterCommitMessage):
    def __init__(self, file_path: str, n_rows: int):
        self.file_path = file_path  # final name; task leaves .inprogress
        self.n_rows = n_rows


class BulkNdjsonWriter(DataSourceWriter):
    """Rename-on-commit protocol (FileOutputCommitter-v1 shape): tasks
    only ever produce ``*.inprogress`` files; the driver's commit()
    renames reported files to their final names and writes the
    manifest.

    Failure containment is TASK-level: a task that dies at ANY point —
    including after finishing its file but before reporting — leaves
    only an ``.inprogress`` leftover, which the sweeps remove. The
    driver's commit() itself is NOT atomic (v1's known window): a crash
    mid-rename can leave some final-named files with no manifest.
    Consumers must therefore gate on the manifests and read exactly
    their ``files`` lists — never glob ``*.ndjson``
    (:func:`read_manifests` does this).

    All of this job's files carry a per-job id prefix
    (``part-<jobid>-…``), every sweep matches only that prefix, AND the
    manifest itself is per-job (``_MANIFEST-<jobid>.json``) — a shared
    manifest name would let a concurrent job's commit overwrite this
    job's file list, silently orphaning its committed data for
    manifest-gated consumers. Concurrent jobs in one directory
    therefore never touch each other's files or manifests."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.id_col = options.get("id_col", "id")
        # generated once on the driver, shipped pickled to every task:
        # the shared per-job prefix that scopes file names AND sweeps
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, rows: Iterator[Row]) -> BulkWriteCommit:
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(
            self.path, f"part-{self.job_id}-{uuid.uuid4().hex}.ndjson"
        )
        n = 0
        try:
            with open(fname + ".inprogress", "w", encoding="utf-8") as f:
                for row in rows:
                    doc = row.asDict(recursive=True)
                    doc_id = doc.get(self.id_col)
                    f.write(json.dumps({"index": {"_id": doc_id}}) + "\n")
                    f.write(json.dumps(doc, ensure_ascii=False, default=str) + "\n")
                    n += 1
        except BaseException:
            # a failed task must not leave its partial behind — the
            # retry writes a fresh uuid, so this file is garbage forever
            if os.path.exists(fname + ".inprogress"):
                os.remove(fname + ".inprogress")
            raise
        return BulkWriteCommit(fname, n)

    def _sweep_inprogress(self) -> None:
        # only THIS job's leftovers: a concurrent job's in-flight
        # .inprogress files have a different job id prefix
        import glob

        pat = os.path.join(self.path, f"part-{self.job_id}-*.inprogress")
        for leftover in glob.glob(pat):
            os.remove(leftover)

    def commit(self, messages) -> None:
        # the commit point: reported task outputs become visible, then
        # the manifest names the valid file set. Validate EVERY source
        # before renaming ANY — a reported file whose .inprogress is
        # missing means something external removed task output; failing
        # before the first rename keeps the directory in the clean
        # all-.inprogress state so abort()'s sweep fully reverses it.
        live = [m for m in messages if m is not None]
        for m in live:
            src = m.file_path + ".inprogress"
            if not os.path.exists(src):
                raise IOError(
                    f"commit: task output missing: {src} (concurrent writer "
                    f"or external cleanup on {self.path}?)"
                )
        for m in live:
            os.rename(m.file_path + ".inprogress", m.file_path)
        manifest = {
            "files": [m.file_path for m in live],
            "rows": sum(m.n_rows for m in live),
        }
        with open(
            os.path.join(self.path, f"_MANIFEST-{self.job_id}.json"), "w"
        ) as f:
            json.dump(manifest, f)
        # losing speculative/retried attempts finished write() but their
        # messages were discarded; their .inprogress leftovers are
        # garbage on the success path too
        self._sweep_inprogress()

    def abort(self, messages) -> None:
        # nothing was renamed (commit's pre-rename validation failed, or
        # commit never ran), so every leftover of this job is an
        # .inprogress file — reported or not
        self._sweep_inprogress()


def read_manifests(path: str) -> dict:
    """Union the committed file lists of every job that wrote ``path``
    (the consumer-side half of the manifest-gating contract): returns
    ``{"files": [...], "rows": n}`` across all ``_MANIFEST-*.json``,
    plus a legacy single ``_MANIFEST.json`` if present (the pre-
    per-job-manifest writer format — ignoring it would make a
    manifest-gated consumer silently treat previously committed data
    as absent). Final-named files absent from every manifest (a
    crashed commit's v1 window) are correctly ignored."""
    import glob as _glob

    files: list[str] = []
    rows = 0
    paths = sorted(_glob.glob(os.path.join(path, "_MANIFEST-*.json")))
    legacy = os.path.join(path, "_MANIFEST.json")
    if os.path.exists(legacy):
        paths.append(legacy)
    for mpath in paths:
        with open(mpath) as f:
            m = json.load(f)
        files.extend(m["files"])
        rows += m["rows"]
    return {"files": files, "rows": rows}


class BulkNdjsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bulk_ndjson"

    def writer(self, schema, overwrite: bool) -> BulkNdjsonWriter:
        return BulkNdjsonWriter(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(BulkNdjsonDataSource)
