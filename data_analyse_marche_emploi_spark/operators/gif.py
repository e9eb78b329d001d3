"""Dependency-free GIF (87a/89a) codec.

Extends the multimodal decode family (WAV/PPM/JPEG/PNG/MP4 —
operators/media_codecs.py, jpeg.py, png.py, mp4.py) with the other
image format real scraped corpora carry. GIF is LOSSLESS over palettes
of ≤256 colors, so — unlike JPEG — ANY such image round-trips
bit-exactly, which gives catalog fixtures arithmetic oracles with no
flat-block restriction.

Decoder scope: 87a + 89a, global and local color tables, interlaced
and non-interlaced frames, full LZW (dynamic code widths through 12
bits, clear/EOI codes, deferred-clear streams), extension blocks
(skipped; frame COUNT is reported by walking every image descriptor).
The first frame decodes to RGB pixels; transparency indices resolve to
their palette color (the curation pipeline wants statistics, not
compositing). Malformed/truncated input raises ValueError ONLY — the
same degrade-don't-abort contract as the other codecs (fuzz-pinned).

Encoder scope (test-payload manufacture): 89a, one frame, global
palette built from the image's distinct colors (raises if > 256), real
LZW compression, optional interlacing so the decoder's de-interlace
path is exercised.

Everything here is public knowledge: the GIF89a specification and the
LZW algorithm it mandates. Reference parity note: the reference repo
has no media pipeline; this extends SURVEY.md's multimodal north-star
(BASELINE.json) like the sibling codecs.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_gif(payload: bytes | None) -> bool:
    return bool(payload) and payload[:6] in (b"GIF87a", b"GIF89a")


# A 13-byte header can claim 65535×65535 — a 12 GiB canvas — and numpy's
# failed allocation raises MemoryError, escaping the ValueError-only
# contract (one corrupt row would kill the Spark task). 64 Mpx bounds
# the decode canvas at ~192 MB RGB while accepting any plausible image.
MAX_PIXELS = 64_000_000


# --- LZW -------------------------------------------------------------------


class _LSBReader:
    """GIF packs LZW codes little-endian, least-significant-bit first
    (the opposite of JPEG's bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF LZW → index stream of exactly ``expected`` pixels."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"corrupt LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LSBReader(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            min_code_size + 1,
            eoi + 1,
        )

    table, width, next_code = reset()
    prev: bytes | None = None
    while len(out) < expected:
        code = reader.read(width)
        if code == clear:
            table, width, next_code = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("corrupt LZW stream: first code undefined")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream: code out of sequence")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("LZW stream ended before the frame was complete")
    return bytes(out[:expected])


class _LSBWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW compression (string-table build, dynamic widths,
    clear-on-full) — the decoder's exact inverse."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LSBWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, min_code_size + 1, eoi + 1

    table, width, next_code = reset()
    bw.write(clear, width)
    s = b""
    for b in indices:
        c = s + bytes([b])
        if c in table:
            s = c
            continue
        bw.write(table[s], width)
        if next_code < 4096:
            table[c] = next_code
            next_code += 1
            # GIF increments width when next_code EXCEEDS the current
            # range (the decoder grows at next_code == 2^width after
            # its own insert, which lags the encoder by exactly one)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table, width, next_code = reset()
        s = bytes([b])
    if s:
        bw.write(table[s], width)
    bw.write(eoi, width)
    return bw.flush()


# --- container -------------------------------------------------------------


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(payload: bytes) -> dict:
    """GIF → ``{width, height, channels, pixels, n_frames, mode}``
    (first frame as uint8 RGB; n_frames counts every image descriptor).
    Raises ValueError on malformed/truncated input — never any other
    exception (same contract as decode_jpeg/decode_png)."""
    try:
        return _decode_impl(payload)
    except (struct.error, IndexError, KeyError, OverflowError,
            ZeroDivisionError, MemoryError) as e:
        raise ValueError(f"malformed GIF stream: {e!r}") from None


def _walk(payload: bytes):
    """Parse the container: returns (screen, frames) where ``screen`` =
    {w, h, bg, global_pal} and each frame dict carries its descriptor,
    palette, raw LZW chunks, and the Graphic Control Extension state
    (disposal method, transparent index) that preceded it."""
    if not sniff_gif(payload):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if w == 0 or h == 0:
        raise ValueError("corrupt GIF: zero logical screen dimension")
    if w * h > MAX_PIXELS:
        raise ValueError(f"implausible GIF dimensions {w}x{h}")
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames = []
    gce = {"disposal": 0, "transparent": None}
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated extension block")
            label = payload[pos]
            pos += 1
            sub = []
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated extension sub-blocks")
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                sub.append(payload[pos:pos + sz])
                if len(sub[-1]) != sz:
                    raise ValueError("truncated extension sub-block")
                pos += sz
            if label == 0xF9 and sub and len(sub[0]) >= 4:  # GCE
                flags = sub[0][0]
                gce = {
                    "disposal": (flags >> 2) & 0x7,
                    "transparent": sub[0][3] if flags & 0x1 else None,
                }
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block type {block:#x}")
        # image descriptor
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if fw == 0 or fh == 0:
            raise ValueError("corrupt GIF: zero frame dimension")
        if fx + fw > w or fy + fh > h:
            raise ValueError("corrupt GIF: frame exceeds logical screen")
        pal = global_pal
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame with no color table")
        if pos >= len(payload):
            raise ValueError("truncated image data")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("truncated image sub-blocks")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            chunks.append(payload[pos:pos + sz])
            if len(chunks[-1]) != sz:
                raise ValueError("truncated image sub-block")
            pos += sz
        frames.append({
            "x": fx, "y": fy, "w": fw, "h": fh,
            "interlaced": bool(fpacked & 0x40), "pal": pal,
            "min_code": min_code, "data": b"".join(chunks), **gce,
        })
        gce = {"disposal": 0, "transparent": None}  # GCE scopes one image
    if not frames:
        raise ValueError("GIF with no image frame")
    return {"w": w, "h": h, "bg": bg, "global_pal": global_pal}, frames


def _frame_indices(fr: dict) -> np.ndarray:
    idx = _lzw_decode(fr["data"], fr["min_code"], fr["w"] * fr["h"])
    arr = np.frombuffer(idx, np.uint8).reshape(fr["h"], fr["w"])
    if int(arr.max()) >= fr["pal"].shape[0]:
        raise ValueError("corrupt GIF: palette index out of range")
    if fr["interlaced"]:
        arr = _deinterlace(arr)
    return arr


def _bg_color(screen: dict) -> np.ndarray:
    """Logical-screen background as RGB: the background-color index
    resolved against the global palette (clamped, as browsers do), or
    black when no global palette exists."""
    if screen["global_pal"] is not None:
        return screen["global_pal"][
            min(screen["bg"], screen["global_pal"].shape[0] - 1)
        ]
    return np.zeros(3, dtype=np.uint8)


def _decode_impl(payload: bytes) -> dict:
    screen, frames = _walk(payload)
    w, h = screen["w"], screen["h"]
    fr = frames[0]
    arr = _frame_indices(fr)
    px = fr["pal"][arr]
    if (fr["x"], fr["y"], fr["w"], fr["h"]) == (0, 0, w, h) and fr[
        "transparent"
    ] is None:
        pixels = px
    else:
        # Same compositing rules as decode_gif_frames' first frame:
        # background-color canvas, transparent indices keep the canvas
        # — the two APIs must report identical pixels for one file.
        pixels = np.broadcast_to(_bg_color(screen), (h, w, 3)).copy()
        region = pixels[fr["y"]:fr["y"] + fr["h"],
                        fr["x"]:fr["x"] + fr["w"]]
        if fr["transparent"] is not None:
            opaque = arr != fr["transparent"]
            region[opaque] = px[opaque]
        else:
            region[:] = px
    return {"width": w, "height": h, "channels": 3, "pixels": pixels,
            "n_frames": len(frames), "mode": "gif"}


def decode_gif_frames(payload: bytes, max_frames: int = 4) -> dict:
    """Animated GIF → composited frames: each of the first
    ``max_frames`` frames rendered onto the logical screen honoring the
    Graphic Control Extension — transparent indices keep the underlying
    canvas, disposal 2 restores the frame rect to the background color,
    disposal 3 restores the pre-frame canvas. Returns ``{width, height,
    n_frames, frames: [uint8 (h, w, 3), ...]}`` (``n_frames`` counts
    ALL image descriptors, beyond the decoded prefix). Raises
    ValueError on malformed input — never any other exception."""
    try:
        screen, frames = _walk(payload)
        w, h = screen["w"], screen["h"]
        bg_color = _bg_color(screen)
        canvas = np.broadcast_to(bg_color, (h, w, 3)).copy()
        out = []
        for fr in frames[:max_frames]:
            before = canvas.copy() if fr["disposal"] == 3 else None
            arr = _frame_indices(fr)
            px = fr["pal"][arr]
            region = canvas[fr["y"]:fr["y"] + fr["h"],
                            fr["x"]:fr["x"] + fr["w"]]
            if fr["transparent"] is not None:
                opaque = arr != fr["transparent"]
                region[opaque] = px[opaque]
            else:
                region[:] = px
            out.append(canvas.copy())
            if fr["disposal"] == 2:
                canvas[fr["y"]:fr["y"] + fr["h"],
                       fr["x"]:fr["x"] + fr["w"]] = bg_color
            elif fr["disposal"] == 3 and before is not None:
                canvas = before
        return {"width": w, "height": h, "n_frames": len(frames),
                "frames": out}
    except (struct.error, IndexError, KeyError, OverflowError,
            ZeroDivisionError, MemoryError) as e:
        raise ValueError(f"malformed GIF stream: {e!r}") from None


def _palettize(frames: list[np.ndarray]):
    """Shared global palette over all frames: (palette, index frames,
    palette bit width). Raises if the union exceeds 256 colors."""
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError(f"too many colors for GIF: {colors.shape[0]}")
    bits = max(1, int(np.ceil(np.log2(max(2, colors.shape[0])))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    idx_frames, off = [], 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        idx_frames.append(
            inverse[off:off + n].astype(np.uint8).reshape(f.shape[:2])
        )
        off += n
    return pal, idx_frames, bits


def _emit_frame(out: bytearray, idx: np.ndarray, min_code: int,
                interlace: bool) -> None:
    h, w = idx.shape
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
        idx = idx[order]
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    lzw = _lzw_encode(idx.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 with ≤256 distinct colors → GIF89a bytes
    (lossless: ``decode_gif(encode_gif(px))`` returns ``px`` exactly)."""
    h, w, nc = pixels.shape
    if nc != 3:
        raise ValueError("encode_gif expects (h, w, 3) RGB")
    pal, (idx,), bits = _palettize([pixels])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    _emit_frame(out, idx, max(2, bits), interlace)
    out += b"\x3b"
    return bytes(out)


def encode_gif_animated(frames: list[np.ndarray],
                        delay_cs: int = 10) -> bytes:
    """Full-screen (h, w, 3) frames sharing ≤256 colors → animated
    GIF89a (one GCE per frame, disposal 1 = leave in place; lossless,
    so ``decode_gif_frames`` returns every frame exactly)."""
    if not frames:
        raise ValueError("encode_gif_animated needs at least one frame")
    h, w, nc = frames[0].shape
    if nc != 3 or any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one (h, w, 3) shape")
    pal, idx_frames, bits = _palettize(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    # Netscape loop extension (loop forever) — the standard animation marker
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in idx_frames:
        out += b"\x21\xf9\x04" + bytes([0x04, delay_cs & 0xFF,
                                        (delay_cs >> 8) & 0xFF, 0]) + b"\x00"
        _emit_frame(out, idx, max(2, bits), False)
    out += b"\x3b"
    return bytes(out)
