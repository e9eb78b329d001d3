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


def test_tkhd_flags_enable_track():
    """tkhd flags must be 3 (track_enabled | track_in_movie) in the 3
    bytes after the version byte — the earlier pack pattern zeroed the
    flags (a DISABLED track for spec-strict players) and wrote the
    intended value into creation_time."""
    from data_analyse_marche_emploi_spark.operators import jpeg as J
    from data_analyse_marche_emploi_spark.operators import mp4 as M4
    import numpy as np

    px = np.full((8, 8, 1), 9, dtype=np.uint8)
    for payload in (
        M4.encode_minimal_mp4(duration=1000, width=16, height=16, mdat=b"x"),
        M4.encode_mjpeg_mp4([J.encode_jpeg(px)], width=8, height=8),
    ):
        i = payload.index(b"tkhd")
        version_and_flags = payload[i + 4 : i + 8]
        assert version_and_flags == b"\x00\x00\x00\x03"
        # and creation_time (next 4 bytes) is 0, not a misplaced 3
        assert payload[i + 8 : i + 12] == b"\x00\x00\x00\x00"


def test_extract_samples_returns_track_dims_for_opaque_codecs(spark):
    """A non-MJPEG video track must surface container-true dimensions
    on its opaque frame rows (the docstring contract) — not 0×0."""
    from data_analyse_marche_emploi_spark.operators import jpeg as J
    from data_analyse_marche_emploi_spark.operators import mp4 as M4
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        sample_video_frames,
    )

    import numpy as np

    px = np.full((8, 8, 1), 5, dtype=np.uint8)
    payload = bytearray(M4.encode_mjpeg_mp4([J.encode_jpeg(px)] * 2,
                                            width=48, height=32))
    # rewrite the stsd sample-entry fourcc 'jpeg' -> 'avc1' (the stsd
    # occurrence, not the frame bytes: take the LAST index before mdat)
    i = payload.index(b"stsd")
    j = payload.index(b"jpeg", i)
    payload[j : j + 4] = b"avc1"
    out = M4.extract_video_samples(bytes(payload))
    assert out["format"] == "avc1"
    assert (out["width"], out["height"]) == (48, 32)

    df = spark.createDataFrame([(1, bytes(payload))], "doc_id long, media binary")
    rows = sample_video_frames(df).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["decoder"] == "mp4-opaque-avc1"
        assert (r["width"], r["height"]) == (48, 32)
        assert r["mean_pixel"] == -1.0
