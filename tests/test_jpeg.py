"""Baseline JPEG codec (operators/jpeg.py): roundtrip fidelity,
marker/feature coverage (4:2:0, restart markers, odd dims), rejection
of unsupported modes, and the distributed synth→decode proof the
``multimodal_jpeg`` catalog entry rides on."""

from __future__ import annotations

import numpy as np
import pytest

from data_analyse_marche_emploi_spark.operators import jpeg as J
from data_analyse_marche_emploi_spark.operators import media_codecs as MC

ANNEX_K_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])


def test_flat_gray_roundtrips_bit_exact():
    """All-ones quantization + flat image = single DC coefficient; the
    IDCT of a constant is constant, so decode must be EXACT — this is
    the invariant the multimodal_jpeg oracle checks arithmetically."""
    for v in (0, 7, 128, 200, 255):
        px = np.full((16, 24, 1), v, dtype=np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(px))
        assert (dec["width"], dec["height"], dec["channels"]) == (24, 16, 1)
        assert np.array_equal(dec["pixels"], px)


def test_flat_rgb_within_color_transform_rounding():
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[...] = [90, 160, 30]
    dec = J.decode_jpeg(J.encode_jpeg(px))
    assert dec["channels"] == 3
    assert np.abs(dec["pixels"].astype(int) - px.astype(int)).max() <= 2


def test_gradient_gray_near_lossless_with_unit_quant():
    g = np.tile(np.arange(64, dtype=np.uint8), (32, 1))[:, :, None]
    dec = J.decode_jpeg(J.encode_jpeg(g))
    assert np.abs(dec["pixels"].astype(int) - g.astype(int)).max() <= 2


def test_420_subsampling_roundtrip_blockwise_constant_chroma():
    """When chroma is constant over 2x2 blocks, 4:2:0 subsampling is
    lossless, so the decode (which exercises the MCU-interleaved
    multi-block path and chroma upsampling) must land within the usual
    DCT/color rounding bound."""
    rng = np.random.default_rng(42)
    small = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    px = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(px, subsample_420=True))
    assert (dec["width"], dec["height"]) == (40, 24)
    assert np.abs(dec["pixels"].astype(int) - px.astype(int)).max() <= 2


def test_420_odd_dimensions():
    rng = np.random.default_rng(7)
    base = np.repeat(np.repeat(rng.integers(0, 256, (11, 13, 3), dtype=np.uint8), 2, 0), 2, 1)
    px = base[:21, :25].astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(px, subsample_420=True))
    assert (dec["width"], dec["height"]) == (25, 21)
    assert np.abs(dec["pixels"].astype(int) - px.astype(int)).max() <= 2


def test_restart_markers_decoded_and_dc_pred_reset():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 32, 1), dtype=np.uint8).astype(np.uint8)
    enc = J.encode_jpeg(px, restart_interval=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
    dec = J.decode_jpeg(enc)
    assert np.abs(dec["pixels"].astype(int) - px.astype(int)).max() <= 2


def test_annex_k_quantization_lossy_but_bounded():
    px = np.tile(np.arange(128, dtype=np.uint8), (16, 1))[:, :64][:, :, None]
    dec = J.decode_jpeg(J.encode_jpeg(px, quant_luma=ANNEX_K_LUMA))
    err = np.abs(dec["pixels"].astype(int) - px.astype(int)).max()
    assert 0 < err < 40  # genuinely lossy, sanely bounded


def test_byte_stuffing_roundtrip():
    """An image engineered to emit 0xFF bytes in the entropy stream
    exercises the stuff/unstuff path; any mismatch corrupts everything
    after the first stuffed byte."""
    rng = np.random.default_rng(11)
    for seed in range(5):
        px = np.random.default_rng(seed).integers(
            0, 256, (16, 16, 1), dtype=np.uint8
        ).astype(np.uint8)
        enc = J.encode_jpeg(px)
        dec = J.decode_jpeg(enc)
        assert np.abs(dec["pixels"].astype(int) - px.astype(int)).max() <= 2


def test_lossless_sof_rejected():
    # SOF3 (lossless sequential) stays unsupported; SOF2 (progressive)
    # decodes for real since round 5 — see test_jpeg_progressive.py
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(b"\xff\xd8\xff\xc3\x00\x05aaa\xff\xd9")


def test_truncated_progressive_sof_rejected():
    with pytest.raises(ValueError, match="malformed"):
        J.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05aaa\xff\xd9")


def test_not_jpeg_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"P6\n1 1\n255\nabc")


def test_truncated_stream_raises_not_hangs():
    px = np.full((8, 8, 1), 57, dtype=np.uint8)
    enc = J.encode_jpeg(px)
    with pytest.raises(ValueError):
        J.decode_jpeg(enc[:20])  # cut inside the header segments


def test_sniff_format_recognizes_jpeg():
    px = np.full((8, 8, 1), 1, dtype=np.uint8)
    assert MC.sniff_format(J.encode_jpeg(px)) == "jpeg"


def test_multimodal_jpeg_distributed(spark):
    """The catalog entry end-to-end at tiny scale: synth → decode via
    mapInPandas, decoded meta matches the arithmetic ground truth."""
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        extract_image_meta,
        synth_jpeg,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = extract_image_meta(synth_jpeg(docs, "doc_id")).collect()
    assert len(out) == 40
    for r in out:
        i = r["doc_id"]
        assert r["width"] == 16 + 8 * (i % 3)
        assert r["height"] == 8 + 8 * (i % 2)
        assert r["channels"] == 1
        assert r["mean_pixel"] == float(i % 256)
        assert r["decoder"] == "jpeg-baseline-v1"


def test_feature_dispatch_jpeg_real(spark):
    """extract_features routes JPEG payloads to the real decoder."""
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        extract_features,
    )

    px = np.full((8, 16, 1), 99, dtype=np.uint8)
    payload = J.encode_jpeg(px)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, media binary")
    row = extract_features(df).collect()[0]
    assert row["decoder"] == "jpeg-baseline-v1"
    assert row["fake_mean"] == 99.0
    assert row["fake_first"] == 16 * 8


def test_resize_dispatch_jpeg_real(spark):
    from data_analyse_marche_emploi_spark.operators.multimodal import resize_images

    px = np.full((8, 16, 1), 50, dtype=np.uint8)
    payload = J.encode_jpeg(px)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, media binary")
    row = resize_images(df, width=4, height=4).collect()[0]
    assert row["decoder"] == "jpeg-nn-v1"
    # 4x4 gray PPM: "P5\n4 4\n255\n" + 16 pixel bytes
    assert row["n_bytes"] == len(b"P5\n4 4\n255\n") + 16


def test_malformed_jpeg_degrades_in_dispatch(spark):
    """A payload that sniffs as JPEG but is malformed must degrade to
    the tagged fake decoder, not kill the task."""
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        extract_features,
    )

    bad = b"\xff\xd8\xff\xe0" + b"\x00\x10" + b"garbage-not-a-jpeg-body" * 3
    df = spark.createDataFrame([(1, bytearray(bad))], "doc_id long, media binary")
    row = extract_features(df).collect()[0]
    assert row["decoder"] == "fake-v0-invalid"


def test_stuffed_pad_byte_before_restart_marker():
    """An all-ones byte-align pad before a RSTn marker is legally
    followed by a 0x00 stuffing byte; the decoder must skip the FF00
    pair when seeking the marker (regression: seed 5 produces exactly
    this byte sequence)."""
    import re

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 8, 1), dtype=np.uint8).astype(np.uint8)
    enc = J.encode_jpeg(px, restart_interval=1)
    assert re.search(rb"\xff\x00\xff[\xd0-\xd7]", enc) is not None
    dec = J.decode_jpeg(enc)
    assert np.abs(dec["pixels"].astype(int) - px.astype(int)).max() <= 2


def test_pipeline_multimodal_training_filters_corrupt(spark):
    """The capstone's corrupt-payload path: truncated payloads (id%10
    == 7) and short docs drop out; every surviving row carries the
    arithmetically-correct decoded feature for its modality."""
    from data_analyse_marche_emploi_spark import catalog

    rows = catalog.QUERIES["pipeline_multimodal_training"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        i = r["doc_id"]
        assert i % 10 != 7
        assert r["n_tokens"] >= 10
        if i % 3 == 0:
            assert r["modality"] == "audio"
            assert r["mean_feature"] == abs(i % 256 - 128) / 128.0
        elif i % 3 == 1:
            assert r["modality"] == "image-jpeg"
            assert r["mean_feature"] == float(i % 256)
        else:
            assert r["modality"] == "image-png"
            assert r["mean_feature"] == 127.5


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; a conformant encoder's padded file must decode."""
    px = np.full((8, 8, 1), 77, dtype=np.uint8)
    enc = J.encode_jpeg(px)
    # inject fill bytes before the SOF0 marker (FFC0)
    i = enc.index(b"\xff\xc0")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    dec = J.decode_jpeg(padded)
    assert np.array_equal(dec["pixels"], px)


def test_classify_jpeg_distinguishes_progressive_from_corrupt():
    """A valid progressive file (SOF2) must classify as 'progressive'
    — ~10% of real scraped corpora — and now DECODES for real; header
    garbage stays 'malformed'; lossless/arithmetic SOFs are tagged
    valid-but-unsupported instead of dumped in the corrupt channel."""
    import numpy as np

    from data_analyse_marche_emploi_spark.operators.jpeg import (
        classify_jpeg,
        encode_jpeg,
    )
    from data_analyse_marche_emploi_spark.operators.multimodal import _decode

    px = np.full((8, 8, 1), 100, dtype=np.uint8)
    baseline = encode_jpeg(px)
    assert classify_jpeg(baseline) == "baseline"

    # a REAL progressive file classifies as 'progressive' and (since
    # round 5) decodes for real through the dispatch layer
    from data_analyse_marche_emploi_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    progressive = encode_jpeg_progressive(px)
    assert classify_jpeg(progressive) == "progressive"
    assert _decode(progressive)["decoder"] == "jpeg-progressive-v1"

    # a baseline stream whose SOF marker is flipped to SOF2 is an
    # ILL-FORMED progressive file (baseline scan header: Se=63 on a DC
    # scan) — it classifies progressive but decodes to the corrupt
    # channel, which is the honest outcome
    i = baseline.index(b"\xff\xc0")
    franken = baseline[:i] + b"\xff\xc2" + baseline[i + 2:]
    assert classify_jpeg(franken) == "progressive"
    assert _decode(franken)["decoder"] == "fake-v0-invalid"

    # lossless sequential (SOF3) → other-sof
    lossless = baseline[:i] + b"\xff\xc3" + baseline[i + 2:]
    assert classify_jpeg(lossless) == "other-sof"

    assert classify_jpeg(b"\xff\xd8\xff\x00garbage") == "malformed"
    assert classify_jpeg(b"not a jpeg") == "malformed"
    # truncated mid-stream: SOI+APP0 then nothing
    assert classify_jpeg(baseline[:6]) == "malformed"
    # corrupt baseline still lands in the corrupt channel
    assert _decode(b"\xff\xd8\xff\xdb junk")["decoder"] == "fake-v0-invalid"
