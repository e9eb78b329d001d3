"""bench.py best-ever record persistence (r11 verdict ask #3): the
driver's BENCH_r{N}.json artifacts keep only a 2000-byte tail of the
bench output line, so from r7 on the full per-query dict no longer
parses and every query registered after r6 had NO best-ever record —
the rerun guard treated them as record-less and real regressions had
no baseline. bench.py now merges every run's full result into the
committed docs/BENCH_RECORDS.json and prior_records() reads it."""

from __future__ import annotations

import glob
import json
import os
import re

import bench

ROOT = os.path.dirname(os.path.abspath(bench.__file__))


def test_records_file_is_committed_and_sane():
    rec = bench._load_records_file()
    qs = rec.get("queries") or {}
    assert qs, "docs/BENCH_RECORDS.json missing or empty"
    assert all(
        isinstance(t, (int, float)) and t > 0 for t in qs.values()
    )
    c = rec.get("calib_jvm_sec")
    assert isinstance(c, (int, float)) and c > 0


def test_prior_records_covers_every_benched_headline_query():
    """Every HEADLINE query that has EVER been benched — its name
    appears in any driver BENCH_r*.json artifact (parsed or inside
    the truncated tail) — must have a best-ever record, so the rerun
    guard is never blind to a real regression again."""
    benched: set[str] = set()
    for path in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        with open(path) as f:
            raw = f.read()
        for q in bench.HEADLINE:
            if re.search(re.escape(q) + r'\\?":', raw):
                benched.add(q)
    records = bench.prior_records()
    missing = sorted(benched - set(records))
    assert not missing, (
        f"benched HEADLINE queries with no best-ever record: {missing}"
    )


def test_save_records_min_merges_and_prior_records_reads_it(
    tmp_path, monkeypatch
):
    """save_records keeps the per-query MIN across runs (load-safe:
    a contaminated run can only fail to lower a record) and
    prior_records() folds the file in under the same min rule."""
    path = str(tmp_path / "records.json")
    monkeypatch.setattr(bench, "RECORDS_PATH", path)
    bench.save_records({"q_a": 2.0, "q_b": 1.0}, calib_jvm=0.5)
    bench.save_records({"q_a": 1.5, "q_b": 3.0, "q_c": 0.7}, calib_jvm=0.9)
    with open(path) as f:
        rec = json.load(f)
    assert rec["queries"] == {"q_a": 1.5, "q_b": 1.0, "q_c": 0.7}
    assert rec["calib_jvm_sec"] == 0.5
    # r12 advisor: each record carries the calibration of the run that
    # SET it — q_a/q_c were set by the second (slower, 0.9) run, q_b
    # by the first (0.5) — so the rerun guard can scale each threshold
    # by the record's own host speed instead of one global factor
    assert rec["queries_calib"] == {"q_a": 0.9, "q_b": 0.5, "q_c": 0.9}
    assert bench.prior_record_calibs() == rec["queries_calib"]
    got = bench.prior_records()
    assert got["q_a"] == 1.5 and got["q_b"] == 1.0 and got["q_c"] == 0.7
    # the real BENCH_r*.json artifacts may hold an even lower calib;
    # the records-file value must participate in the min
    assert bench.prior_calib() <= 0.5


def test_prior_records_prefers_calibrated_records():
    """r13: pre-calibration-era (r<=6) artifact minima carry no
    host-speed context and sat ~2x below every calibrated-era
    measurement for some queries, triggering a futile rerun of the
    same untouched entries every round — for queries the records file
    covers, prior_records must resolve to the calibrated record, not
    the uncalibrated artifact value."""
    rec = bench._load_records_file()["queries"]
    got = bench.prior_records()
    # the spot set: phantom-rerun members of the r13 bench run whose
    # only sub-record values live in uncalibrated artifacts
    for q in ("ts_ewma", "chunks_to_sequences", "multimodal_gif_frames"):
        if q in rec:
            assert got[q] == rec[q], (q, got[q], rec[q])


def test_prior_records_sources_flag_artifact_undercuts(
    tmp_path, monkeypatch
):
    """r13 advisor: a calibrated ARTIFACT minimum that undercuts the
    records-file value supplies the baseline but NOT the per-record
    calibration (queries_calib describes the file record's setting
    run) — prior_records_with_sources must drop such queries from the
    file-sourced set so factor_for falls back to the global factor."""
    root = tmp_path
    monkeypatch.setattr(bench, "RECORDS_PATH", str(root / "records.json"))
    bench.save_records({"q_file": 2.0, "q_cut": 5.0}, calib_jvm=0.5)
    art = {
        "calib_jvm_sec": 0.4,
        "queries": {"q_cut": 3.0, "q_art_only": 1.0},
    }
    with open(root / "BENCH_r98.json", "w") as f:
        json.dump(art, f)
    real_glob = glob.glob

    def fake_glob(pat):
        if "BENCH_r*" in pat:
            return real_glob(os.path.join(str(root), "BENCH_r*.json"))
        return real_glob(pat)

    monkeypatch.setattr(glob, "glob", fake_glob)
    best, from_file = bench.prior_records_with_sources()
    assert best == {"q_file": 2.0, "q_cut": 3.0, "q_art_only": 1.0}
    assert "q_file" in from_file
    assert "q_cut" not in from_file and "q_art_only" not in from_file


def test_legacy_records_inherit_global_calib(tmp_path, monkeypatch):
    """Records written before queries_calib existed inherit the file's
    global min calibration — the value the old global rerun factor
    implicitly compared them against — instead of being dropped or
    treated as set on today's host."""
    path = str(tmp_path / "records.json")
    monkeypatch.setattr(bench, "RECORDS_PATH", path)
    with open(path, "w") as f:
        json.dump({"calib_jvm_sec": 0.2, "queries": {"q_old": 4.0}}, f)
    bench.save_records({"q_new": 1.0}, calib_jvm=0.6)
    with open(path) as f:
        rec = json.load(f)
    assert rec["queries"] == {"q_old": 4.0, "q_new": 1.0}
    assert rec["queries_calib"] == {"q_old": 0.2, "q_new": 0.6}
