"""Dependency-free PNG codec (W3C PNG / RFC 2083 subset).

The second real image format next to ``operators/jpeg.py`` — and the
first *lossless* one: zlib (stdlib) inflates IDAT, scanlines unfilter
with all five spec filter types (None/Sub/Up/Average/Paeth), so a
decode→encode→decode loop is bit-exact, which makes PNG the strongest
roundtrip proof in the multimodal family.

Scope: 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. Adam7 interlace, 1/2/4/16-bit
depths raise ValueError — callers route that to the documented tagged
fallback like every other codec here.

The encoder writes color type 0/2, one caller-selectable filter per
scanline (default: Sub on odd rows, Up on even — so every encoded
payload exercises the unfilter paths, not just filter 0), standard
zlib stream, correct CRCs.

All format knowledge is the published spec; the reference repo has no
media pipeline (this extends SURVEY.md's multimodal north-star the
same way media_codecs.py does for WAV/PPM).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_png(payload: bytes | None) -> bool:
    return bool(payload) and payload[:8] == PNG_MAGIC


def decode_png(payload: bytes) -> dict:
    """PNG → ``{width, height, channels, pixels}`` ((h, w, c) uint8;
    palette images expand to RGB). Raises ValueError on interlaced /
    non-8-bit / malformed input — truncations and bit-flips must not
    surface as struct.error/IndexError (fuzz-pinned exception
    discipline, test_codec_fuzz.py)."""
    try:
        return _decode_impl(payload)
    except (struct.error, IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"malformed PNG stream: {e!r}") from None


def _decode_impl(payload: bytes) -> dict:
    if not sniff_png(payload):
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    n = len(payload)
    while pos + 8 <= n:
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError(f"truncated {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"only 8-bit depth supported (got {depth})")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            ihdr = (w, h, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, color = ihdr
    ch = _CHANNELS[color]
    # Bound allocations by the HEADER before touching the stream: a
    # 33-byte IHDR can claim 2³¹×2³¹ and a small IDAT can be a zlib
    # bomb — either way numpy/zlib would raise MemoryError past the
    # ValueError-only contract. 64 Mpx ≈ 256 MB RGBA.
    if w == 0 or h == 0:
        raise ValueError("corrupt IHDR: zero dimension")
    if w * h > 64_000_000:
        raise ValueError(f"implausible PNG dimensions {w}x{h}")
    stride = w * ch
    expected = h * (stride + 1)
    try:
        dec = zlib.decompressobj()
        # cap the inflate at the geometry the header promises — a
        # stream that wants to produce more is corrupt by definition
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from None
    if len(raw) != expected:
        raise ValueError(
            f"decompressed size {len(raw)} != expected {expected}"
        )
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    lines = arr[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        line = lines[y]
        if f == 0:
            pass
        elif f == 1:  # Sub — inherently sequential in x
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif f == 2:  # Up — vectorized (no x-dependence)
            lines[y] = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth (spec 9.4 predictor, sequential)
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {f} on line {y}")
        prev = lines[y]
    px = lines.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        px = palette[idx]
        ch = 3
    return {"width": w, "height": h, "channels": ch, "pixels": px}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_mix: bool = True) -> bytes:
    """(h, w, 1|3) uint8 → PNG bytes (color type 0 or 2, 8-bit).

    ``filter_mix`` alternates Sub/Up filters per scanline so decoding
    any encoded payload exercises the unfilter logic; False writes
    filter 0 everywhere (byte-identical scanlines, useful for
    handcrafted test vectors)."""
    h, w, ch = pixels.shape
    if ch not in (1, 3):
        raise ValueError("encoder supports gray or RGB")
    color = 0 if ch == 1 else 2
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.uint8)
    out_lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = flat[y]
        if not filter_mix:
            out_lines.append(0)
            out_lines += line.tobytes()
        elif y % 2 == 1:  # Sub
            shifted = np.concatenate([np.zeros(ch, np.uint8), line[:-ch]])
            out_lines.append(1)
            out_lines += ((line.astype(np.int16) - shifted) & 0xFF).astype(
                np.uint8
            ).tobytes()
        else:  # Up
            out_lines.append(2)
            out_lines += ((line.astype(np.int16) - prev) & 0xFF).astype(
                np.uint8
            ).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out_lines), 6))
        + _chunk(b"IEND", b"")
    )
