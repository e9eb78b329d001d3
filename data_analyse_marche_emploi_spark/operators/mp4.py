"""Dependency-free ISO BMFF (MP4) container parser + minimal writer.

Upgrades the video family from "fully stubbed" to "container-real,
codec-stubbed": the box grammar (ISO/IEC 14496-12 — [size][type]
nesting), movie header (mvhd timescale/duration), track headers (tkhd
dimensions), media headers (mdhd), handler types, and mdat payload
bounds are all genuinely parsed; only FRAME DECODE remains a stub (no
ffmpeg/codec libraries in this environment — the sample_frames
byte-slice stands in for decoded keyframes, documented in
operators/multimodal.py).

The writer emits a minimal-but-valid ftyp/moov/mdat file (version-0
full boxes, 16.16 fixed-point dimensions) so tests and the catalog
entry can manufacture deterministic payloads whose parsed metadata has
an arithmetic ground truth.

All layout knowledge is the published ISO/IEC 14496-12 spec; the
reference repo has no media pipeline (SURVEY.md multimodal
north-star).
"""

from __future__ import annotations

import struct

MP4_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1", b"M4V ")


def sniff_mp4(payload: bytes | None) -> bool:
    """ISO BMFF sniff: a leading ftyp box with a known major brand."""
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[4:8] == b"ftyp"
        and payload[8:12] in MP4_BRANDS
    )


def _walk(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the sibling boxes in
    [start, end). Raises ValueError on malformed sizes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", payload, pos)[0]
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {btype!r} size {size} out of bounds")
        yield btype, body, pos + size
        pos += size


def _find(payload: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk(payload, start, end):
        if t == btype:
            return b, e
    return None


def parse_mp4(payload: bytes) -> dict:
    """Parse container metadata: ``{duration_s, timescale, n_tracks,
    video_width, video_height, handlers, mdat_bytes, mdat_offset}``.
    Width/height are 0 for audio-only files. Raises ValueError on
    malformed input — truncations/bit-flips must not surface as
    struct.error (fuzz-pinned, test_codec_fuzz.py)."""
    try:
        return _parse_impl(payload)
    except struct.error as e:
        raise ValueError(f"malformed BMFF stream: {e!r}") from None


def _parse_impl(payload: bytes) -> dict:
    if not sniff_mp4(payload):
        raise ValueError("not an ISO BMFF payload")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("missing moov box")
    ms, me = moov
    mvhd = _find(payload, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("missing mvhd box")
    vs, _ = mvhd
    version = payload[vs]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, vs + 4 + 16)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", payload, vs + 4)
    n_tracks = 0
    video_w = video_h = 0
    handlers: list[str] = []
    for t, b, e in _walk(payload, ms, me):
        if t != b"trak":
            continue
        n_tracks += 1
        tkhd = _find(payload, b, e, b"tkhd")
        mdia = _find(payload, b, e, b"mdia")
        handler = ""
        if mdia is not None:
            hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                handler = payload[hdlr[0] + 8 : hdlr[0] + 12].decode(
                    "ascii", "replace"
                )
        handlers.append(handler)
        if tkhd is not None and handler == "vide":
            tb, te = tkhd
            # width/height are the last two 16.16 fixed-point fields
            w_fx, h_fx = struct.unpack_from(">II", payload, te - 8)
            video_w, video_h = w_fx >> 16, h_fx >> 16
    mdat = _find(payload, 0, len(payload), b"mdat")
    mdat_bytes = (mdat[1] - mdat[0]) if mdat is not None else 0
    return {
        "duration_s": duration / timescale if timescale else 0.0,
        "timescale": timescale,
        "duration": duration,
        "n_tracks": n_tracks,
        "video_width": video_w,
        "video_height": video_h,
        "handlers": handlers,
        "mdat_bytes": mdat_bytes,
        "mdat_offset": mdat[0] if mdat is not None else -1,
    }


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_minimal_mp4(duration: int, timescale: int = 1000,
                       width: int = 0, height: int = 0,
                       mdat: bytes = b"") -> bytes:
    """Minimal valid ftyp/moov/mdat file. ``width/height > 0`` adds a
    'vide' track (16.16 fixed dims); otherwise a 'soun' track. The
    parse of this writer's output has exact arithmetic ground truth."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    is_video = width > 0 and height > 0
    tkhd = _box(
        b"tkhd",
        struct.pack(">BxxxIIIxxxxI", 0, 0, 0, 1, duration)
        + b"\x00" * 8
        + struct.pack(">HHHxx", 0, 0, 0 if is_video else 0x0100)
        + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box(
        b"hdlr",
        struct.pack(">BxxxI", 0, 0)
        + (b"vide" if is_video else b"soun")
        + b"\x00" * 12
        + b"handler\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov + _box(b"mdat", mdat)
