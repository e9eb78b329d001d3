"""GIF codec tests: lossless round-trips (LZW + palettes +
interlacing), exception discipline, and the Spark catalog entry."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_analyse_marche_emploi_spark.operators import gif as G


def test_flat_roundtrip_exact():
    px = np.full((8, 8, 3), [10, 200, 30], np.uint8)
    d = G.decode_gif(G.encode_gif(px))
    np.testing.assert_array_equal(d["pixels"], px)
    assert (d["width"], d["height"], d["channels"], d["n_frames"]) == (8, 8, 3, 1)


def test_256_color_gradient_roundtrip_exact():
    g = ((np.arange(16)[:, None] + np.arange(256)[None, :]) % 256).astype(np.uint8)
    px = np.repeat(g[:, :, None], 3, axis=2)
    np.testing.assert_array_equal(G.decode_gif(G.encode_gif(px))["pixels"], px)


@pytest.mark.parametrize("interlace", [False, True])
def test_lzw_table_growth_roundtrip(interlace):
    # 60k pixels over a full 256-color palette pushes the LZW string
    # table through every code width up to 12 bits and the clear-on-full
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    px = pal[rng.integers(0, 256, (200, 300))]
    d = G.decode_gif(G.encode_gif(px, interlace=interlace))
    np.testing.assert_array_equal(d["pixels"], px)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    ncol=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
)
def test_roundtrip_property(w, h, ncol, seed, interlace):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), np.uint8)
    px = pal[rng.integers(0, ncol, (h, w))]
    np.testing.assert_array_equal(
        G.decode_gif(G.encode_gif(px, interlace=interlace))["pixels"], px
    )


def test_too_many_colors_raises():
    rng = np.random.default_rng(6)
    with pytest.raises(ValueError, match="too many colors"):
        G.encode_gif(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))


def test_not_gif_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        G.decode_gif(b"P6\n1 1\n255\nabc")


def test_truncation_raises_valueerror_only():
    px = np.full((8, 8, 3), 9, np.uint8)
    payload = G.encode_gif(px)
    for cut in range(len(payload)):
        try:
            G.decode_gif(payload[:cut])
        except ValueError:
            pass  # the only permitted exception


@settings(max_examples=40, deadline=None)
@given(pos=st.integers(0, 10_000), flip=st.integers(1, 255))
def test_bitflip_raises_valueerror_only(pos, flip):
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (32, 3), np.uint8)
    payload = G.encode_gif(pal[rng.integers(0, 32, (24, 24))], interlace=True)
    m = bytearray(payload)
    m[pos % len(m)] ^= flip
    try:
        G.decode_gif(bytes(m))
    except ValueError:
        pass


def test_sniff_and_dispatch(spark):
    """The catalog entry end-to-end at tiny scale: synth → decode via
    mapInPandas, decoded meta matches the arithmetic ground truth."""
    from data_analyse_marche_emploi_spark.operators import media_codecs as MC
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        extract_image_meta,
        synth_gif,
    )

    px = np.full((4, 4, 3), 1, np.uint8)
    assert MC.sniff_format(G.encode_gif(px)) == "gif"

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    rows = extract_image_meta(synth_gif(docs, "doc_id")).collect()
    assert len(rows) == 12
    for r in rows:
        assert r["width"] == 256
        assert r["height"] == 2 + r["doc_id"] % 3
        assert r["mean_pixel"] == 127.5
        assert r["decoder"] == "gif-v1"


def test_resize_real_for_gif(spark):
    from data_analyse_marche_emploi_spark.operators.multimodal import (
        resize_images,
    )

    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    payload = G.encode_gif(pal[rng.integers(0, 16, (32, 48))])
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, media binary")
    row = resize_images(df, width=8, height=8).collect()[0]
    assert row["decoder"] == "gif-nn-v1"
    assert row["n_bytes"] > 0
