"""Property-based fuzz for the media codecs (hypothesis):

* PNG encode→decode is IDENTITY for arbitrary uint8 images (lossless
  codec — any deviation is a filter/inflate bug).
* JPEG encode→decode with unit quantization stays within the DCT
  rounding bound for arbitrary images, exact for flat ones.
* WAV PCM8 framing round-trips arbitrary byte payloads sample-exactly.
* The decoders never hang or die with a non-ValueError on arbitrary
  byte garbage or on truncations/bitflips of valid payloads — the
  dispatch layer's "degrade, don't abort" contract depends on
  exactly this exception discipline.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_analyse_marche_emploi_spark.operators import jpeg as J
from data_analyse_marche_emploi_spark.operators import media_codecs as MC
from data_analyse_marche_emploi_spark.operators import mp4 as M4
from data_analyse_marche_emploi_spark.operators import png as P

dims = st.tuples(
    st.integers(min_value=1, max_value=24),  # h
    st.integers(min_value=1, max_value=24),  # w
    st.sampled_from([1, 3]),                 # channels
)


def _image(h, w, c, seed):
    return (
        np.random.default_rng(seed)
        .integers(0, 256, (h, w, c), dtype=np.uint8)
        .astype(np.uint8)
    )


@settings(max_examples=40, deadline=None)
@given(dims=dims, seed=st.integers(0, 2**31), mix=st.booleans())
def test_png_roundtrip_identity(dims, seed, mix):
    h, w, c = dims
    px = _image(h, w, c, seed)
    dec = P.decode_png(P.encode_png(px, filter_mix=mix))
    assert np.array_equal(dec["pixels"], px)


@settings(max_examples=25, deadline=None)
@given(dims=dims, seed=st.integers(0, 2**31))
def test_jpeg_unit_quant_bounded_error(dims, seed):
    h, w, c = dims
    px = _image(h, w, c, seed)
    dec = J.decode_jpeg(J.encode_jpeg(px))
    assert (dec["height"], dec["width"]) == (h, w)
    # unit quantization: error is DCT/color rounding only. Per-channel-
    # count bounds so a 1-2-level IDCT/upsample regression stays
    # caught: grayscale has no YCbCr round-trip (empirical max 2, +1
    # slack against hypothesis corner cases); color adds the YCbCr trip
    # whose analytical worst case is ~3.4 → provable bound 4.
    bound = 3 if c == 1 else 4
    assert np.abs(dec["pixels"].astype(int) - px.astype(int)).max() <= bound


@settings(max_examples=40, deadline=None)
@given(raw=st.binary(min_size=0, max_size=512),
       rate=st.integers(min_value=1, max_value=48_000))
def test_wav_pcm8_roundtrip_sample_exact(raw, rate):
    w = MC.decode_wav(MC.encode_wav_pcm8(raw, rate))
    assert w["n_samples"] == len(raw)
    assert w["sample_rate"] == rate
    back = np.round(w["samples"] * 128.0 + 128.0).astype(np.uint8)
    assert bytes(back) == raw


@settings(max_examples=120, deadline=None)
@given(garbage=st.binary(min_size=0, max_size=256))
def test_decoders_raise_only_valueerror_on_garbage(garbage):
    for dec in (MC.decode_wav, MC.decode_ppm, J.decode_jpeg, P.decode_png,
                M4.parse_mp4, M4.extract_video_samples):
        try:
            dec(garbage)
        except ValueError:
            pass  # the documented failure mode


def test_jpeg_dc_predictor_overflow_regression():
    """Pin the exact r4-red fuzz case (seed=255, flip byte 127): a
    bit-flip in a DHT/scan header put a DC size-category symbol >11 in
    the Huffman table, receive() read an unbounded Python int, and
    ``zz[0] = pred[ci]`` raised OverflowError — leaking past the
    documented ValueError-only contract (operators/jpeg.py now
    validates T.81 table F.1 categories and bounds the predictor)."""
    px = _image(8, 8, 1, 255)
    payload = J.encode_jpeg(px)
    mutated = bytearray(payload)
    mutated[127 % len(mutated)] ^= 0xFF
    try:
        J.decode_jpeg(bytes(mutated))
    except ValueError:
        pass  # the documented failure mode — anything else fails the test


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31), cut=st.integers(0, 400),
       flip=st.integers(0, 400))
def test_decoders_survive_truncation_and_bitflips(seed, cut, flip):
    """Truncations and single-byte corruptions of VALID payloads must
    either decode or raise ValueError — never hang, never IndexError/
    struct.error/zlib.error (those leak through the dispatch layer's
    except ValueError and would kill a Spark task)."""
    px = _image(8, 8, 1, seed)

    def extract_and_decode(payload):
        """The full MJPEG video path: sample walk + per-frame T.81
        decode — a corrupt sample table or frame must surface as
        ValueError, nothing else."""
        out = M4.extract_video_samples(payload)
        for s in out["samples"]:
            J.decode_jpeg(s)

    payloads = [
        P.encode_png(px),
        J.encode_jpeg(px),
        MC.encode_wav_pcm8(bytes(px.ravel()), 8000),
        M4.encode_minimal_mp4(duration=1000, width=16, height=16, mdat=b"x" * 32),
        M4.encode_mjpeg_mp4([J.encode_jpeg(px)] * 2, width=8, height=8),
    ]
    for payload, dec in zip(payloads, (P.decode_png, J.decode_jpeg,
                                       MC.decode_wav, M4.parse_mp4,
                                       extract_and_decode)):
        truncated = payload[: cut % (len(payload) + 1)]
        mutated = bytearray(payload)
        mutated[flip % len(mutated)] ^= 0xFF
        for cand in (truncated, bytes(mutated)):
            try:
                dec(cand)
            except ValueError:
                pass


def test_implausible_dimensions_raise_valueerror_not_memoryerror():
    """A crafted header can claim 65535×65535 (12-16 GiB of decode
    buffers); the failed numpy/zlib allocation would surface as
    MemoryError — past every caller's `except ValueError` — killing a
    Spark task on one corrupt row. All four image decoders must reject
    implausible geometry BEFORE allocating (single-byte-flip fuzz can
    never reach this: both 16-bit dims must be large simultaneously)."""
    import struct as S

    from data_analyse_marche_emploi_spark.operators import gif as G
    from data_analyse_marche_emploi_spark.operators import png as P

    # GIF: huge logical screen + tiny 1x1 frame
    gif = bytearray(b"GIF89a")
    gif += S.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)
    gif += bytes([0, 0, 0, 255, 255, 255])
    gif += b"\x2c" + S.pack("<HHHHB", 0, 0, 1, 1, 0)
    gif.append(2)
    lzw = G._lzw_encode(b"\x00", 2)
    gif.append(len(lzw))
    gif += lzw
    gif += b"\x00\x3b"
    with pytest.raises(ValueError, match="implausible"):
        G.decode_gif(bytes(gif))
    with pytest.raises(ValueError, match="implausible"):
        G.decode_gif_frames(bytes(gif))

    # JPEG: SOF0 and SOF2 claiming 65535x65535
    for sof in (0xC0, 0xC2):
        jp = bytearray(b"\xff\xd8")
        jp += b"\xff\xdb" + S.pack(">HB", 67, 0) + bytes([1] * 64)
        jp += bytes([0xFF, sof]) + S.pack(">HBHHB", 11, 8, 65535, 65535, 1)
        jp += S.pack(">BBB", 1, 0x11, 0)
        jp += b"\xff\xda" + S.pack(">HB", 8, 1) + S.pack(">BB", 1, 0)
        jp += b"\x00\x3f\x00\xff\xd9"
        with pytest.raises(ValueError, match="implausible"):
            J.decode_jpeg(bytes(jp))

    # PNG: huge IHDR (also covers the zlib-bomb path: the inflate is
    # capped at the header geometry, which is rejected first here)
    import zlib

    ihdr = S.pack(">IIBBBBB", 65535, 65535, 8, 0, 0, 0, 0)
    png = bytearray(b"\x89PNG\r\n\x1a\n")
    for ctype, data in ((b"IHDR", ihdr), (b"IDAT", zlib.compress(b"\x00")),
                        (b"IEND", b"")):
        png += S.pack(">I", len(data)) + ctype + data
        png += S.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="implausible"):
        P.decode_png(bytes(png))


def test_png_zlib_bomb_capped():
    """An IDAT that inflates past the header's promised geometry is
    rejected by the capped decompressobj, not materialized."""
    import struct as S
    import zlib

    from data_analyse_marche_emploi_spark.operators import png as P

    ihdr = S.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # promises 2x2 gray
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)  # ~10 KB compressed
    png = bytearray(b"\x89PNG\r\n\x1a\n")
    for ctype, data in ((b"IHDR", ihdr), (b"IDAT", bomb), (b"IEND", b"")):
        png += S.pack(">I", len(data)) + ctype + data
        png += S.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        P.decode_png(bytes(png))
