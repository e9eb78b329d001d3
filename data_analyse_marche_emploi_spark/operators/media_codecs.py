"""Dependency-free media codecs for the multimodal operators.

The container has no PIL/ffmpeg/torchaudio, but two formats need no
codec library at all — their containers are simple enough to parse with
``struct`` + numpy, which makes the decode step of the multimodal
pipeline REAL for them instead of a stub:

* **WAV** (RIFF/WAVE, PCM 8/16-bit): chunk walk → fmt + data; samples
  decoded with ``np.frombuffer``; duration/band energies computed from
  the actual PCM.
* **PPM/PGM** (netpbm P6/P5 binary): whitespace/comment-tolerant header
  parse → (width, height, maxval); pixels via ``np.frombuffer``;
  nearest-neighbor resize is exact integer index math.

Anything else falls back to the deterministic fake decoder in
operators.multimodal (documented stub — swapping in PIL/ffmpeg stays a
one-function change).

These functions run inside Arrow-batched ``mapInPandas`` workers: pure
CPU, no I/O, embarrassingly parallel — the Spark-side contract
(schemas, batching, partitioning) is unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"
PPM_MAGICS = (b"P6", b"P5")


JPEG_MAGIC = b"\xff\xd8\xff"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes | None) -> str:
    """'wav' | 'ppm' | 'jpeg' | 'png' | 'gif' | 'bmp' | 'unknown' by magic bytes."""
    if not payload:
        return "unknown"
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] in PPM_MAGICS:
        return "ppm"
    if payload[:3] == JPEG_MAGIC:
        return "jpeg"
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if (
        payload[:2] == b"BM"
        and len(payload) >= 54
        and int.from_bytes(payload[14:18], "little") in (40, 52, 56, 108, 124)
    ):
        # 2-byte magics false-positive wildly ("BMW market report…"), so
        # unlike the 6-8-byte magics above, BMP also requires a known
        # BITMAPINFOHEADER size at offset 14 before claiming the payload
        return "bmp"
    return "unknown"


# --- WAV -------------------------------------------------------------------


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE container and decode its PCM samples.

    Returns ``{n_channels, sample_rate, bits, n_samples, duration_s,
    samples}`` where ``samples`` is a float64 numpy array in [-1, 1]
    (first channel for multi-channel audio). Raises ValueError on a
    malformed container — callers route that to the error channel.
    """
    if sniff_format(payload) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # declared chunk length runs past the payload: a truncated
            # file would otherwise decode "successfully" with silently
            # wrong sample counts / durations
            raise ValueError(
                f"truncated {cid!r} chunk: declared {size}, present {len(body)}"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        # struct.unpack_from would raise struct.error, which callers
        # catching the documented ValueError wouldn't see
        raise ValueError(f"fmt chunk too short: {len(fmt)} < 16 bytes")
    audio_format, n_channels, sample_rate, _, _, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only PCM 8/16-bit supported (fmt={audio_format}, bits={bits})")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
        samples = raw.astype(np.float64) / 32768.0
    else:  # unsigned 8-bit PCM
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    if n_channels > 1:
        usable = len(samples) - (len(samples) % n_channels)
        samples = samples[:usable].reshape(-1, n_channels)[:, 0]
    n_samples = len(samples)
    return {
        "n_channels": int(n_channels),
        "sample_rate": int(sample_rate),
        "bits": int(bits),
        "n_samples": int(n_samples),
        "duration_s": n_samples / sample_rate if sample_rate else 0.0,
        "samples": samples,
    }


def encode_wav_pcm8(raw: bytes, sample_rate: int = 8000) -> bytes:
    """Frame arbitrary bytes as a valid mono 8-bit PCM WAV (each input
    byte = one unsigned sample). Used by tests and the round-trip
    catalog entry to manufacture real WAV payloads deterministically."""
    data_size = len(raw)
    hdr = b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate, 1, 8)
    return hdr + fmt + b"data" + struct.pack("<I", data_size) + raw


def wav_band_energies(samples: np.ndarray, n_bands: int) -> list[float]:
    """Mean absolute amplitude over ``n_bands`` equal time slices of the
    decoded signal — a real (if coarse) energy profile computed from
    actual PCM, windowed in time like a spectrogram's frames."""
    if len(samples) == 0:
        return [0.0] * n_bands
    chunks = np.array_split(np.abs(samples), n_bands)
    return [float(c.mean()) if len(c) else 0.0 for c in chunks]


# --- PPM / PGM -------------------------------------------------------------


def _read_pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse the netpbm header: magic, width, height, maxval, and the
    offset where pixel data starts. Honors whitespace and # comments."""
    magic = payload[:2]
    if magic not in PPM_MAGICS:
        raise ValueError("not a binary PPM/PGM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        if i >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    # Exactly one whitespace terminates the header (spec) — but a
    # Windows-line-ending writer emits CRLF, where skipping one byte
    # shifts every pixel by the stray \n, while a bare-\r writer whose
    # first pixel is 0x0A looks identical to CRLF. When the byte after
    # the terminator is ambiguous (a \r\n pair), disambiguate by pixel
    # buffer size: prefer the offset whose remaining byte count matches
    # width*height*channels exactly; spec-compliant single-skip wins
    # ties and the no-match case (frombuffer then reports truncation).
    if i >= len(payload) or not payload[i : i + 1].isspace():
        raise ValueError("PNM header not terminated by whitespace")
    off = i + 1
    if payload[i : i + 2] == b"\r\n":
        channels = 3 if magic == b"P6" else 1
        need = fields[0] * fields[1] * channels
        if len(payload) - (i + 1) != need and len(payload) - (i + 2) == need:
            off = i + 2
    return magic, fields[0], fields[1], fields[2], off


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6, RGB) or PGM (P5, gray) image.

    Returns ``{width, height, channels, maxval, pixels}`` with pixels as
    a (height, width, channels) uint8 numpy array."""
    magic, width, height, maxval, off = _read_pnm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    channels = 3 if magic == b"P6" else 1
    need = width * height * channels
    pix = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "maxval": maxval,
        "pixels": pix.reshape(height, width, channels),
    }


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3|1) uint8 array → binary P6/P5 bytes."""
    h, w, c = pixels.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Exact nearest-neighbor resample by integer index mapping — the
    real thing, not a stub (same pixel-center convention as PIL's
    NEAREST)."""
    h, w, _ = pixels.shape
    rows = ((np.arange(height) + 0.5) * h / height).astype(np.int64).clip(0, h - 1)
    cols = ((np.arange(width) + 0.5) * w / width).astype(np.int64).clip(0, w - 1)
    return pixels[rows][:, cols]


def resize_area(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Area-average (anti-aliased) resample — the correct DOWNSCALE
    filter (OpenCV INTER_AREA semantics): each output pixel is the
    mean of its exact fractional source rectangle, computed from the
    2-D prefix-sum in float64, so the result is deterministic and —
    when the factors divide evenly — the global mean is preserved
    EXACTLY (disjoint equal-size boxes). Upscales fall back to
    nearest-neighbor (area weighting degenerates there)."""
    h, w, c = pixels.shape
    if width >= w and height >= h:
        # pure upscale on BOTH axes: every output box lies inside one
        # source pixel, so area weighting degenerates to nearest. A
        # mixed resize (down one axis, up the other) must NOT take
        # this path — the downscaled axis still needs averaging or the
        # aliasing the function exists to prevent comes back.
        return resize_nearest(pixels, width, height)
    # prefix sums with a zero border: S[y, x] = sum over [0:y, 0:x)
    ps = np.zeros((h + 1, w + 1, c), dtype=np.float64)
    np.cumsum(np.cumsum(pixels.astype(np.float64), axis=0), axis=1,
              out=ps[1:, 1:])
    ys = np.linspace(0, h, height + 1)
    xs = np.linspace(0, w, width + 1)
    # Evaluate the bilinear-interpolated prefix sum at every box
    # boundary in one vectorized gather (exact for the
    # piecewise-constant image): G has shape (height+1, width+1, c)
    yi = np.floor(ys).astype(np.int64)
    fy = (ys - yi)[:, None, None]
    yi2 = np.minimum(yi + 1, h)
    xi = np.floor(xs).astype(np.int64)
    fx = (xs - xi)[None, :, None]
    xi2 = np.minimum(xi + 1, w)
    grid = (
        (1 - fy) * (1 - fx) * ps[yi][:, xi]
        + (1 - fy) * fx * ps[yi][:, xi2]
        + fy * (1 - fx) * ps[yi2][:, xi]
        + fy * fx * ps[yi2][:, xi2]
    )
    # box integral = 2-D finite difference of the boundary grid
    integ = (grid[1:, 1:] - grid[:-1, 1:] - grid[1:, :-1] + grid[:-1, :-1])
    area = (np.diff(ys)[:, None] * np.diff(xs)[None, :])[:, :, None]
    return np.clip(np.round(integ / area), 0, 255).astype(np.uint8)
