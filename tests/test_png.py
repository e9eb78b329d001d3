"""PNG codec (operators/png.py): lossless roundtrips, all five filter
types, palette/RGBA expansion, rejection of unsupported modes, and the
distributed synth→decode proof behind ``multimodal_png``."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_analyse_marche_emploi_spark.operators import media_codecs as MC
from data_analyse_marche_emploi_spark.operators import png as P


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _raw_png(w, h, color, lines: bytes, extra=b"") -> bytes:
    return (
        P.PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + extra
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_bit_exact_gray_and_rgb():
    rng = np.random.default_rng(0)
    for shape in [(7, 13, 1), (16, 16, 3), (1, 1, 1), (33, 5, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)
        for mix in (True, False):
            dec = P.decode_png(P.encode_png(px, filter_mix=mix))
            assert (dec["height"], dec["width"], dec["channels"]) == shape
            assert np.array_equal(dec["pixels"], px)


def test_average_and_paeth_unfilter():
    """Handcraft a payload filtered with Average (even rows) and Paeth
    (odd rows) per the spec's reference pseudocode; the decoder must
    invert both exactly."""
    rng = np.random.default_rng(5)
    h, w, ch = 4, 6, 3
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8).astype(np.uint8)
    flat = px.reshape(h, w * ch).astype(int)
    lines = bytearray()
    prev = [0] * (w * ch)
    for y in range(h):
        cur = list(flat[y])
        if y % 2 == 0:
            lines.append(3)
            for x in range(w * ch):
                left = cur[x - ch] if x >= ch else 0
                lines.append((cur[x] - ((left + prev[x]) >> 1)) & 0xFF)
        else:
            lines.append(4)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                lines.append((cur[x] - pred) & 0xFF)
        prev = cur
    dec = P.decode_png(_raw_png(w, h, 2, bytes(lines)))
    assert np.array_equal(dec["pixels"], px)


def test_palette_expands_to_rgb():
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8).astype(np.uint8)
    idx = rng.integers(0, 5, (3, 4), dtype=np.uint8).astype(np.uint8)
    lines = bytearray()
    for y in range(3):
        lines.append(0)
        lines += bytes(idx[y])
    dec = P.decode_png(
        _raw_png(4, 3, 3, bytes(lines), extra=_chunk(b"PLTE", pal.tobytes()))
    )
    assert dec["channels"] == 3
    assert np.array_equal(dec["pixels"], pal[idx])


def test_palette_index_out_of_range_rejected():
    lines = bytes([0, 7])  # index 7, palette of 2
    pal = bytes(6)
    with pytest.raises(ValueError, match="palette index"):
        P.decode_png(_raw_png(1, 1, 3, lines, extra=_chunk(b"PLTE", pal)))


def test_rgba_passthrough():
    rng = np.random.default_rng(2)
    rgba = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8).astype(np.uint8)
    lines = bytearray()
    for y in range(4):
        lines.append(0)
        lines += rgba[y].tobytes()
    dec = P.decode_png(_raw_png(4, 4, 6, bytes(lines)))
    assert dec["channels"] == 4
    assert np.array_equal(dec["pixels"], rgba)


def test_rejects_interlace_16bit_garbage_and_truncation():
    with pytest.raises(ValueError, match="interlace"):
        P.decode_png(
            P.PNG_MAGIC
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        )
    with pytest.raises(ValueError, match="8-bit"):
        P.decode_png(
            P.PNG_MAGIC
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        )
    with pytest.raises(ValueError, match="not a PNG"):
        P.decode_png(b"nope")
    # declared 2x2 RGB but IDAT holds a single scanline: size mismatch
    with pytest.raises(ValueError, match="expected"):
        P.decode_png(_raw_png(2, 2, 2, bytes([0, 1, 2, 3, 4, 5, 6])))


def test_corrupt_idat_raises_valueerror():
    body = (
        P.PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", b"\x00not-zlib")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        P.decode_png(body)


def test_multi_idat_chunks_concatenate():
    """The spec allows the zlib stream split across IDAT chunks."""
    px = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    lines = bytearray()
    for y in range(3):
        lines.append(0)
        lines += px[y].tobytes()
    z = zlib.compress(bytes(lines))
    half = len(z) // 2
    body = (
        P.PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", z[:half])
        + _chunk(b"IDAT", z[half:])
        + _chunk(b"IEND", b"")
    )
    dec = P.decode_png(body)
    assert np.array_equal(dec["pixels"], px)


def test_sniff_format_recognizes_png():
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    assert MC.sniff_format(P.encode_png(px)) == "png"


def test_multimodal_png_distributed(spark):
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        extract_image_meta,
        synth_png,
    )

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    out = extract_image_meta(synth_png(docs, "doc_id")).collect()
    assert len(out) == 30
    for r in out:
        i = r["doc_id"]
        assert r["width"] == 256
        assert r["height"] == 2 + i % 3
        assert r["channels"] == 1
        assert r["mean_pixel"] == 127.5
        assert r["decoder"] == "png-v1"


def test_resize_dispatch_png_real(spark):
    from data_analyse_marche_emploi_spark.operators.multimodal import resize_images

    px = np.full((8, 16, 3), 50, dtype=np.uint8)
    payload = P.encode_png(px)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, media binary")
    row = resize_images(df, width=4, height=4).collect()[0]
    assert row["decoder"] == "png-nn-v1"
    assert row["n_bytes"] == len(b"P6\n4 4\n255\n") + 48
