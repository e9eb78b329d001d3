"""Dependency-free BMP (Windows bitmap) codec.

Covers the uncompressed BI_RGB profile that dominates real scraped
corpora: BITMAPFILEHEADER + BITMAPINFOHEADER (the 40-byte core shared
by the V4/V5 header extensions, which are accepted and read for their
first 40 bytes), 8-bit paletted and 24-bit BGR pixels, bottom-up and
top-down row order, rows padded to 4-byte boundaries. RLE and bitfield
compressions raise a clear ValueError rather than mis-decoding.

Contract (same as decode_jpeg/decode_png/decode_gif): decoders raise
**ValueError and nothing else** on malformed/truncated/hostile input —
Spark tasks route that to the corrupt channel; any other exception
escaping would kill the task. Exhaustively audited by
tools/codec_audit.py (every truncation point × every byte flipped).

Extends the SURVEY §2.H multimodal surface the same way the other
codecs do (reference repo has no image path at all; this is the
training-data-pipeline extension mandated by the north star).
"""

from __future__ import annotations

import struct

import numpy as np

# Same guard class as the other decoders: a 14+40-byte header can claim
# 2**31-square dimensions; cap the decode canvas before allocating.
MAX_PIXELS = 64_000_000

_FILE_HDR = 14
_CORE_HDR = 40
_HDR_SIZES = (40, 52, 56, 108, 124)  # INFO, V2, V3, V4, V5


def sniff_bmp(payload: bytes | None) -> bool:
    return bool(payload) and payload[:2] == b"BM" and len(payload) >= _FILE_HDR


def decode_bmp(payload: bytes) -> dict:
    """BMP → ``{width, height, channels, pixels, n_frames, mode}``
    (uint8 RGB; paletted images resolve through their color table).
    Raises ValueError on malformed input — never any other exception."""
    try:
        return _decode_impl(payload)
    except (struct.error, IndexError, KeyError, OverflowError,
            ZeroDivisionError, MemoryError) as e:
        raise ValueError(f"malformed BMP stream: {e!r}") from None


def _decode_impl(payload: bytes) -> dict:
    if not sniff_bmp(payload):
        raise ValueError("not a BMP payload")
    if len(payload) < _FILE_HDR + _CORE_HDR:
        raise ValueError("truncated BMP header")
    off_bits = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, _FILE_HDR)[0]
    if hdr_size not in _HDR_SIZES:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if len(payload) < _FILE_HDR + hdr_size:
        raise ValueError("truncated BMP info header")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bits = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    top_down = h < 0
    ah = -h if top_down else h
    if w <= 0 or ah == 0:
        raise ValueError(f"corrupt BMP dimensions {w}x{h}")
    if w * ah > MAX_PIXELS:
        raise ValueError(f"implausible BMP dimensions {w}x{ah}")
    if planes != 1:
        raise ValueError(f"corrupt BMP: planes={planes}")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bits not in (8, 24):
        raise ValueError(f"unsupported BMP bit depth {bits}")
    pal = None
    if bits == 8:
        clr_used = struct.unpack_from("<I", payload, 46)[0]
        n_pal = clr_used or 256
        if n_pal > 256:
            raise ValueError(f"corrupt BMP: palette of {n_pal}")
        pal_off = _FILE_HDR + hdr_size
        if len(payload) < pal_off + n_pal * 4:
            raise ValueError("truncated BMP palette")
        quad = np.frombuffer(payload, np.uint8, n_pal * 4, pal_off)
        pal = quad.reshape(n_pal, 4)[:, 2::-1]  # BGRx -> RGB
    stride = (w * bits // 8 + 3) & ~3
    need = stride * ah
    if off_bits + need > len(payload) or off_bits < _FILE_HDR + _CORE_HDR:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, np.uint8, need, off_bits).reshape(ah, stride)
    if bits == 24:
        px = rows[:, : w * 3].reshape(ah, w, 3)[:, :, ::-1]  # BGR -> RGB
    else:
        idx = rows[:, :w]
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError("corrupt BMP: palette index out of range")
        px = pal[idx]
    if not top_down:
        px = px[::-1]
    return {"width": w, "height": ah, "channels": 3,
            "pixels": np.ascontiguousarray(px), "n_frames": 1, "mode": "bmp"}


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 1|3) → BMP bytes. 1-channel encodes as 8-bit with a
    grayscale palette (identity map, so decode returns the same values
    replicated to RGB); 3-channel encodes 24-bit BGR. Bottom-up rows,
    4-byte-aligned — the profile every consumer accepts."""
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3) uint8, got {pixels.shape}")
    if pixels.dtype != np.uint8:
        # a wider dtype would serialize multi-byte samples into the BGR
        # stream silently (int16 rows interleave zero bytes) — reject
        raise ValueError(f"expected uint8 pixels, got {pixels.dtype}")
    h, w, ch = pixels.shape
    bits = 8 if ch == 1 else 24
    stride = (w * bits // 8 + 3) & ~3
    pal = b""
    if ch == 1:
        pal = b"".join(bytes((g, g, g, 0)) for g in range(256))
        rows = pixels[:, :, 0]
    else:
        rows = pixels[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    body = bytearray()
    pad = b"\x00" * (stride - w * bits // 8)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += rows[y].tobytes() + pad
    off = _FILE_HDR + _CORE_HDR + len(pal)
    info = struct.pack(
        "<IiiHHIIiiII", _CORE_HDR, w, h, 1, bits, 0, len(body),
        2835, 2835, 256 if ch == 1 else 0, 0,
    )
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + info + pal + bytes(body)
