"""Real-decoder tests: WAV RIFF parse/PCM decode and PPM parse/resize,
plus the format dispatch inside the multimodal mapInPandas operators."""

from __future__ import annotations

import math
import struct

import numpy as np

from data_analyse_marche_emploi_spark.operators import media_codecs as MC
from data_analyse_marche_emploi_spark.operators.multimodal import (
    attach_media,
    extract_audio_features,
    extract_features,
    extract_wav_meta,
    resize_images,
    synth_wav,
)


def _make_wav16(freq_hz: float = 440.0, rate: int = 16000, seconds: float = 0.25,
                channels: int = 1) -> tuple[bytes, np.ndarray]:
    n = int(rate * seconds)
    t = np.arange(n) / rate
    mono = (np.sin(2 * math.pi * freq_hz * t) * 0.5 * 32767).astype("<i2")
    frames = np.repeat(mono, channels) if channels > 1 else mono
    data = frames.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data, mono


def test_decode_wav_pcm16_roundtrip():
    payload, mono = _make_wav16()
    w = MC.decode_wav(payload)
    assert (w["n_channels"], w["sample_rate"], w["bits"]) == (1, 16000, 16)
    assert w["n_samples"] == len(mono)
    assert abs(w["duration_s"] - 0.25) < 1e-9
    # decoded samples match the synthesized sine exactly (scaled int16)
    np.testing.assert_allclose(w["samples"], mono / 32768.0, atol=0)


def test_decode_wav_stereo_takes_first_channel():
    payload, mono = _make_wav16(channels=2)
    w = MC.decode_wav(payload)
    assert w["n_channels"] == 2
    assert w["n_samples"] == len(mono)
    np.testing.assert_allclose(w["samples"], mono / 32768.0, atol=0)


def test_decode_wav_rejects_garbage():
    for bad in (b"", b"RIFFxxxxJUNK", b"\x00" * 64):
        try:
            MC.decode_wav(bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_decode_ppm_header_and_pixels():
    pix = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + pix.tobytes()
    p = MC.decode_ppm(payload)
    assert (p["width"], p["height"], p["channels"], p["maxval"]) == (3, 2, 3, 255)
    np.testing.assert_array_equal(p["pixels"], pix)


def test_resize_nearest_exact():
    # 2x2 checkerboard upsampled 2x: each source pixel becomes a 2x2 block
    pix = np.array([[[0], [255]], [[255], [0]]], dtype=np.uint8)
    out = MC.resize_nearest(pix, 4, 4)
    assert out.shape == (4, 4, 1)
    np.testing.assert_array_equal(out[:2, :2, 0], 0)
    np.testing.assert_array_equal(out[:2, 2:, 0], 255)
    np.testing.assert_array_equal(out[2:, :2, 0], 255)
    np.testing.assert_array_equal(out[2:, 2:, 0], 0)
    # identity resize is a no-op
    np.testing.assert_array_equal(MC.resize_nearest(pix, 2, 2), pix)


def test_wav_synth_and_meta_distributed(spark):
    docs = spark.createDataFrame(
        [(1, "bonjour"), (2, "x" * 16000)], "doc_id long, text string"
    )
    meta = {r.doc_id: r for r in extract_wav_meta(synth_wav(docs, "text", "doc_id")).collect()}
    assert meta[1].n_samples == 7 and meta[1].decoder == "wav-pcm8-v1"
    assert meta[2].n_samples == 16000
    assert abs(meta[2].duration_s - 2.0) < 1e-9  # 16000 samples @ 8 kHz


def test_feature_dispatch_real_vs_fake(spark):
    wav, _ = _make_wav16()
    ppm = b"P6\n2 2\n255\n" + bytes(12)
    rows = [(1, wav), (2, ppm), (3, b"plain text bytes")]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    feats = {r.doc_id: r for r in extract_features(media).collect()}
    assert feats[1].decoder == "wav-pcm16-v1"
    assert feats[2].decoder == "ppm-v1"
    assert feats[2].fake_mean == 0.0  # all-zero pixels, really decoded
    assert feats[3].decoder == "fake-v0"
    audio = {r.doc_id: r for r in extract_audio_features(media).collect()}
    assert audio[1].decoder == "wav-pcm16-v1"
    assert abs(audio[1].duration_proxy - 0.25) < 1e-9  # true seconds
    assert audio[3].decoder == "fake-audio-v0"


def test_resize_dispatch_ppm_real(spark):
    pix = np.zeros((4, 4, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, MC.encode_ppm(pix)), (2, b"not an image")], "doc_id long, media binary"
    )
    out = {r.doc_id: r for r in resize_images(media, width=2, height=2).collect()}
    assert out[1].decoder == "ppm-nn-v1"
    assert out[1].n_bytes == len(MC.encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8)))
    assert out[2].decoder == "fake-resize-v0"


def test_attach_media_payload_still_fake_path(spark, sf_dir):
    """Documents fixture carries text/plain payloads — they must keep
    taking the fake path (the catalog oracles encode its formulas)."""
    from data_analyse_marche_emploi_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(5)
    feats = extract_features(attach_media(d, "text", "doc_id")).collect()
    assert feats and all(r.decoder == "fake-v0" for r in feats)


def test_decode_magic_false_positive_degrades_not_crashes():
    """Text that merely starts with PNM/WAV magic must fall back to the
    fake decoder (tagged -invalid), never raise out of the task."""
    from data_analyse_marche_emploi_spark.operators.multimodal import _decode

    out = _decode(b"P6 est un processeur intel")
    assert out["decoder"] == "fake-v0-invalid"
    assert out["n_bytes"] == 26


def test_decode_wav_truncated_data_raises_valueerror():
    import pytest as _pytest

    from data_analyse_marche_emploi_spark.operators.media_codecs import (
        decode_wav,
        encode_wav_pcm8,
    )

    full = encode_wav_pcm8(bytes(range(200)))
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(full[:-50])  # declared data size runs past payload


def test_decode_wav_short_fmt_raises_valueerror_not_struct_error():
    import struct

    import pytest as _pytest

    from data_analyse_marche_emploi_spark.operators.media_codecs import decode_wav

    fmt_body = struct.pack("<IHH", 8, 1, 1)[4:]  # 4-byte fmt body
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 4 + 8 + 2) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", 2) + b"ab"
    )
    with _pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav(payload)


def test_decode_ppm_crlf_header_terminator():
    import numpy as np

    from data_analyse_marche_emploi_spark.operators.media_codecs import decode_ppm

    pixels = bytes(range(18))  # 3x2 RGB
    img = decode_ppm(b"P6\n3 2\n255\r\n" + pixels)
    assert img["width"] == 3 and img["height"] == 2
    assert np.array_equal(img["pixels"].ravel(), np.frombuffer(pixels, np.uint8))


def test_decode_ppm_bare_cr_terminator_with_newline_pixel():
    """A bare-\r terminated header whose first pixel byte is 0x0A must
    not be mistaken for CRLF — size consistency disambiguates."""
    import numpy as np

    from data_analyse_marche_emploi_spark.operators.media_codecs import decode_ppm

    pixels = bytes([10, 1, 2, 3])  # first pixel IS 0x0A
    img = decode_ppm(b"P5\r2 2\r255\r" + pixels)
    assert np.array_equal(img["pixels"].ravel(), np.frombuffer(pixels, np.uint8))


def test_spectral_dominant_bin_matches_tone(spark):
    """synth_wav_tone → extract_audio_spectral end-to-end: the rFFT
    argmax must land on round(f * n_fft / sr) for every id-derived
    tone frequency, proving decode scaling and FFT indexing."""
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        extract_audio_spectral,
        synth_wav_tone,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    rows = extract_audio_spectral(synth_wav_tone(docs, "doc_id")).collect()
    assert len(rows) == 40
    for r in rows:
        f = 100 + 100 * (r["doc_id"] % 20)
        assert r["dominant_bin"] == round(f * 1024 / 8000)
        assert r["n_samples"] == 1024
        assert r["decoder"] == "wav-rfft-v1"


def test_resize_area_exact_properties():
    """Area resample: constants stay constant, a 0/255 checkerboard
    downscaled 2x hits the exact box mean, the global mean is preserved
    exactly for even factors, and upscales fall back to nearest."""
    import numpy as np

    from data_analyse_marche_emploi_spark.operators import media_codecs as MC

    px = np.full((32, 32, 3), 77, np.uint8)
    assert np.all(MC.resize_area(px, 16, 16) == 77)

    cb = np.zeros((4, 4, 1), np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    assert np.all(MC.resize_area(cb, 2, 2) == 128)

    g = ((np.arange(32)[:, None] + np.arange(256)[None, :]) % 256).astype(
        np.uint8
    )[:, :, None]
    assert MC.resize_area(g, 128, 16).mean() == g.mean() == 127.5

    up = MC.resize_area(np.full((4, 4, 1), 9, np.uint8), 8, 8)
    assert up.shape == (8, 8, 1) and np.all(up == 9)

    # fractional factors stay deterministic and in range
    r = MC.resize_area(np.full((10, 7, 3), 50, np.uint8), 3, 4)
    assert r.shape == (4, 3, 3) and np.all(r == 50)


def test_resize_area_antialiases_where_nearest_aliases():
    """The motivating property: a fine checkerboard downscaled 2x is
    all-128 under area averaging but collapses to one phase (0 or 255)
    under nearest-neighbor — the aliasing artifact area resampling
    exists to prevent."""
    import numpy as np

    from data_analyse_marche_emploi_spark.operators import media_codecs as MC

    cb = np.zeros((16, 16, 1), np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    area = MC.resize_area(cb, 8, 8)
    nearest = MC.resize_nearest(cb, 8, 8)
    assert np.all(area == 128)
    assert set(np.unique(nearest)) <= {0, 255}


def test_resize_area_mixed_axis_still_averages():
    """Regression: a resize that keeps or grows one axis while
    downscaling the other must STILL area-average the downscaled axis
    (an `or`-based upscale fallback aliased it to one checker phase)."""
    import numpy as np

    from data_analyse_marche_emploi_spark.operators import media_codecs as MC

    cb = np.zeros((16, 16, 1), np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    assert np.all(MC.resize_area(cb, 16, 8) == 128)   # same width
    assert np.all(MC.resize_area(cb, 32, 8) == 128)   # upscale width
