"""ISO BMFF parser (operators/mp4.py): box-walk correctness, version-1
headers, 64-bit sizes, rejection of malformed input, and the
distributed synth→parse proof behind ``multimodal_mp4_meta``."""

from __future__ import annotations

import struct

import pytest

from data_analyse_marche_emploi_spark.operators import mp4 as M


def test_video_roundtrip_exact():
    b = M.encode_minimal_mp4(
        duration=7500, timescale=1000, width=640, height=360, mdat=b"x" * 100
    )
    m = M.parse_mp4(b)
    assert m["duration_s"] == 7.5
    assert m["n_tracks"] == 1
    assert (m["video_width"], m["video_height"]) == (640, 360)
    assert m["handlers"] == ["vide"]
    assert m["mdat_bytes"] == 100


def test_audio_only_roundtrip():
    m = M.parse_mp4(M.encode_minimal_mp4(duration=30_000, timescale=10_000))
    assert m["duration_s"] == 3.0
    assert m["handlers"] == ["soun"]
    assert m["video_width"] == 0 and m["video_height"] == 0
    assert m["mdat_bytes"] == 0


def test_version1_mvhd_and_largesize_box():
    """Hand-build a version-1 mvhd (64-bit times) inside a moov carried
    by a 64-bit largesize box — both spec paths the writer doesn't
    emit."""
    mvhd_body = (
        struct.pack(">Bxxx", 1)
        + struct.pack(">QQIQ", 0, 0, 90_000, 270_000)  # v1: 64-bit times
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    # moov with size==1 → 64-bit largesize header
    moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(mvhd)) + mvhd
    ftyp_body = b"isom" + struct.pack(">I", 512) + b"isom"
    ftyp = struct.pack(">I", 8 + len(ftyp_body)) + b"ftyp" + ftyp_body
    m = M.parse_mp4(ftyp + moov)
    assert m["timescale"] == 90_000
    assert m["duration_s"] == 3.0
    assert m["n_tracks"] == 0


def test_rejections():
    with pytest.raises(ValueError, match="not an ISO BMFF"):
        M.parse_mp4(b"RIFF....WAVE")
    good = M.encode_minimal_mp4(duration=1000, width=64, height=64)
    with pytest.raises(ValueError, match="out of bounds"):
        M.parse_mp4(good[:40])  # moov box size exceeds truncated payload
    # ftyp alone, no moov
    ftyp_body = b"isom" + struct.pack(">I", 512) + b"isom"
    ftyp = struct.pack(">I", 8 + len(ftyp_body)) + b"ftyp" + ftyp_body
    with pytest.raises(ValueError, match="missing moov"):
        M.parse_mp4(ftyp)


def test_multimodal_mp4_meta_distributed(spark):
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        extract_video_meta,
        synth_mp4,
    )

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    rows = extract_video_meta(synth_mp4(docs, "doc_id")).collect()
    assert len(rows) == 30
    for r in rows:
        i = r["doc_id"]
        assert r["duration_s"] == 0.5 * (1 + i % 24)
        assert r["n_tracks"] == 1
        assert r["video_width"] == 16 * (4 + i % 5)
        assert r["video_height"] == 16 * (3 + i % 3)
        assert r["mdat_bytes"] == 1 + i % 97
        assert r["decoder"] == "mp4-bmff-v1"


def test_sample_frames_slices_inside_mdat(spark):
    """For BMFF payloads the frame sampler must slice from the real
    mdat region (container parse), not the raw payload."""
    from data_analyse_marche_emploi_spark.operators.multimodal import sample_frames

    media = b"\xAB" * 3000  # recognizable mdat content
    payload = M.encode_minimal_mp4(
        duration=1000, width=64, height=48, mdat=media
    )
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, media binary")
    rows = sample_frames(df, every_n_bytes=1024, max_frames=3).collect()
    assert len(rows) == 2  # 3000 // 1024
    for r in rows:
        assert r["decoder"] == "mp4-slice-v1"
        assert set(r["frame_bytes"]) == {0xAB}
