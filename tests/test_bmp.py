"""BMP codec tests: lossless round-trips (24-bit BGR + 8-bit palette,
stride padding, bottom-up/top-down row order), exception discipline,
and the Spark catalog entry."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_analyse_marche_emploi_spark.operators import bmp as B


def test_rgb_roundtrip_exact():
    px = np.random.default_rng(1).integers(0, 256, (9, 7, 3), dtype=np.uint8)
    d = B.decode_bmp(B.encode_bmp(px))
    assert (d["width"], d["height"], d["channels"], d["mode"]) == (7, 9, 3, "bmp")
    np.testing.assert_array_equal(d["pixels"], px)


def test_gray_palette_roundtrip_exact():
    g = np.random.default_rng(2).integers(0, 256, (5, 11, 1), dtype=np.uint8)
    d = B.decode_bmp(B.encode_bmp(g))
    np.testing.assert_array_equal(d["pixels"], np.repeat(g, 3, axis=2))


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])
def test_stride_padding_every_alignment(w):
    """Row padding to 4 bytes differs for every width mod 4 — each must
    round-trip exactly (a stride bug shears the image)."""
    px = ((np.arange(3 * w * 3).reshape(3, w, 3) * 7) % 256).astype(np.uint8)
    np.testing.assert_array_equal(B.decode_bmp(B.encode_bmp(px))["pixels"], px)


def test_top_down_negative_height():
    """Hand-flip the height field negative and re-order rows: decoders
    must honor top-down order (the encoder always writes bottom-up)."""
    px = np.random.default_rng(3).integers(0, 256, (4, 3, 3), dtype=np.uint8)
    payload = bytearray(B.encode_bmp(px))
    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)
    d = B.decode_bmp(bytes(payload))
    # same bytes now interpreted top-down = vertically flipped image
    np.testing.assert_array_equal(d["pixels"], px[::-1])


def test_rejects_unsupported_compression_and_depth():
    px = np.zeros((2, 2, 3), np.uint8)
    payload = bytearray(B.encode_bmp(px))
    struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        B.decode_bmp(bytes(payload))
    payload = bytearray(B.encode_bmp(px))
    struct.pack_into("<H", payload, 28, 32)
    with pytest.raises(ValueError, match="bit depth"):
        B.decode_bmp(bytes(payload))


def test_rejects_implausible_dimensions():
    px = np.zeros((2, 2, 3), np.uint8)
    payload = bytearray(B.encode_bmp(px))
    struct.pack_into("<ii", payload, 18, 65535, 65535)
    with pytest.raises(ValueError, match="implausible"):
        B.decode_bmp(bytes(payload))


def test_not_bmp():
    with pytest.raises(ValueError):
        B.decode_bmp(b"GIF89a......")


@settings(max_examples=120, deadline=None)
@given(
    cut=st.integers(min_value=0, max_value=245),
    flip=st.integers(min_value=0, max_value=245),
    val=st.integers(min_value=0, max_value=255),
)
def test_decoder_survives_truncation_and_bitflips(cut, flip, val):
    """ValueError-only contract under hostile input (the codec_audit
    exhaustive sweep runs out-of-process; this keeps a fast in-suite
    regression)."""
    px = np.random.default_rng(4).integers(0, 256, (6, 6, 3), dtype=np.uint8)
    payload = bytearray(B.encode_bmp(px))
    payload = payload[:cut] + payload[cut + 1:]  # drop a byte
    if flip < len(payload):
        payload[flip] = val
    try:
        B.decode_bmp(bytes(payload))
    except ValueError:
        pass


def test_catalog_entry_distributed(spark):
    from data_analyse_marche_emploi_spark import catalog

    rows = catalog.QUERIES["multimodal_bmp"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["decoder"] == "bmp-v1"
        assert r["mean_pixel"] == 127.5
        assert r["width"] == 256


def test_encode_rejects_non_uint8():
    wide = np.zeros((2, 2, 3), dtype=np.int16)
    with pytest.raises(ValueError, match="uint8"):
        B.encode_bmp(wide)


def test_sniff_requires_plausible_info_header():
    """A 2-byte 'BM' magic false-positives wildly; the sniff also
    requires a known BITMAPINFOHEADER size so 'BM'-prefixed text stays
    'unknown' (fake-v0 path) instead of polluting the corrupt channel."""
    from data_analyse_marche_emploi_spark.operators import media_codecs as MC

    assert MC.sniff_format(b"BMW market report 2024, Q3 edition.........") == "unknown"
    assert MC.sniff_format(B.encode_bmp(np.zeros((2, 2, 3), np.uint8))) == "bmp"
