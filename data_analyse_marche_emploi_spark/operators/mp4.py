"""Dependency-free ISO BMFF (MP4) container parser + minimal writer.

The box grammar (ISO/IEC 14496-12 — [size][type] nesting), movie
header (mvhd timescale/duration), track headers (tkhd dimensions),
media headers (mdhd), handler types, mdat payload bounds, AND the
sample table (stbl: stsd sample-entry fourcc, stsz sizes, stsc
sample-to-chunk runs, stco/co64 chunk offsets) are all genuinely
parsed. For Motion-JPEG tracks ('jpeg' sample entries) this makes
FRAME DECODE real end-to-end with zero external codecs: the sample
walk hands each frame's bytes to the in-repo T.81 baseline decoder
(operators/jpeg.py). Other codecs (avc1/hevc…) remain undecodable
here by necessity — extract_video_samples still returns their raw
sample bytes with the fourcc so callers can route them.

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


def extract_video_samples(payload: bytes, max_samples: int | None = None) -> dict:
    """Walk the first video track's sample table and return
    ``{"format": fourcc, "samples": [bytes, ...], "width": w,
    "height": h}`` — each sample is one coded frame, located via stsz
    (sizes) + stsc (sample→chunk runs) + stco/co64 (chunk offsets);
    width/height are the track header's 16.16 dims (0 if tkhd absent).
    Raises ValueError on missing or malformed tables (never
    struct.error/IndexError — fuzz-pinned).
    The caller decides decodability from the fourcc ('jpeg' → the
    in-repo T.81 decoder; anything else is an opaque bitstream here)."""
    try:
        return _extract_samples_impl(payload, max_samples)
    except (struct.error, IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"malformed BMFF sample table: {e!r}") from None


def _extract_samples_impl(payload: bytes, max_samples: int | None) -> dict:
    if not sniff_mp4(payload):
        raise ValueError("not an ISO BMFF payload")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("missing moov box")
    stbl = None
    track_w = track_h = 0
    for t, b, e in _walk(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find(payload, b, e, b"tkhd")
        if tkhd is not None:
            w_fx, h_fx = struct.unpack_from(">II", payload, tkhd[1] - 8)
            track_w, track_h = w_fx >> 16, h_fx >> 16
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _find(payload, minf[0], minf[1], b"stbl")
        break
    if stbl is None:
        raise ValueError("no video track with a sample table")
    ss, se = stbl
    stsd = _find(payload, ss, se, b"stsd")
    stsz = _find(payload, ss, se, b"stsz")
    stsc = _find(payload, ss, se, b"stsc")
    stco = _find(payload, ss, se, b"stco")
    co64 = _find(payload, ss, se, b"co64")
    if stsd is None or stsz is None or stsc is None or (stco is None and co64 is None):
        raise ValueError("incomplete sample table (need stsd/stsz/stsc/stco)")
    # stsd: first sample entry's fourcc
    n_entries = struct.unpack_from(">I", payload, stsd[0] + 4)[0]
    if n_entries < 1 or stsd[0] + 16 > stsd[1]:
        raise ValueError("empty stsd")
    fourcc = payload[stsd[0] + 12 : stsd[0] + 16].decode("ascii", "replace")
    # stsz: fixed size or per-sample table
    fixed_size, n_samples = struct.unpack_from(">II", payload, stsz[0] + 4)
    if n_samples > 1_000_000:
        raise ValueError("implausible sample count")
    if fixed_size:
        sizes = [fixed_size] * n_samples
    else:
        if stsz[0] + 12 + 4 * n_samples > stsz[1]:
            raise ValueError("stsz table truncated")
        sizes = list(struct.unpack_from(f">{n_samples}I", payload, stsz[0] + 12))
    # stco/co64: chunk offsets
    if stco is not None:
        n_chunks = struct.unpack_from(">I", payload, stco[0] + 4)[0]
        if stco[0] + 8 + 4 * n_chunks > stco[1]:
            raise ValueError("stco table truncated")
        offsets = list(struct.unpack_from(f">{n_chunks}I", payload, stco[0] + 8))
    else:
        n_chunks = struct.unpack_from(">I", payload, co64[0] + 4)[0]
        if co64[0] + 8 + 8 * n_chunks > co64[1]:
            raise ValueError("co64 table truncated")
        offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, co64[0] + 8))
    # stsc: (first_chunk, samples_per_chunk, desc_idx) runs → per-chunk counts
    n_runs = struct.unpack_from(">I", payload, stsc[0] + 4)[0]
    if stsc[0] + 8 + 12 * n_runs > stsc[1]:
        raise ValueError("stsc table truncated")
    runs = [
        struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * i)
        for i in range(n_runs)
    ]
    if not runs or any(r[0] < 1 or r[1] < 1 for r in runs):
        raise ValueError("invalid stsc run")
    # ISO 14496-12 8.7.4: runs must start at chunk 1 and be strictly
    # ascending by first_chunk — otherwise some chunk has NO covering
    # run and any fabricated samples-per-chunk would slice sample bytes
    # at wrong offsets and hand garbage to the frame decoder as valid
    if runs[0][0] != 1 or any(
        runs[i][0] >= runs[i + 1][0] for i in range(len(runs) - 1)
    ):
        raise ValueError("corrupt stsc: runs not ascending from chunk 1")
    samples: list[bytes] = []
    si = 0
    limit = n_samples if max_samples is None else min(n_samples, max_samples)
    for ci in range(n_chunks):
        # samples-per-chunk for chunk ci+1 = last run with first_chunk <= ci+1
        # (total coverage guaranteed by the ascending-from-1 check)
        spc = next(r[1] for r in reversed(runs) if r[0] <= ci + 1)
        pos = offsets[ci]
        for _ in range(spc):
            if si >= limit:
                return {"format": fourcc, "samples": samples,
                        "width": track_w, "height": track_h}
            if si >= n_samples:
                break
            end = pos + sizes[si]
            if end > len(payload):
                raise ValueError("sample extends past end of file")
            samples.append(bytes(payload[pos:end]))
            pos = end
            si += 1
    if si < limit:
        raise ValueError("chunk map covers fewer samples than stsz declares")
    return {"format": fourcc, "samples": samples,
            "width": track_w, "height": track_h}


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
        # version 0, flags 3 (track_enabled | track_in_movie — the three
        # bytes AFTER the version byte; 'xxx' pad here would write
        # flags=0, a disabled track per ISO 14496-12)
        struct.pack(">B3sIIIxxxxI", 0, b"\x00\x00\x03", 0, 0, 1, duration)
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


def encode_mjpeg_mp4(frames: list[bytes], timescale: int = 1000,
                     frame_duration: int = 40, width: int = 16,
                     height: int = 16) -> bytes:
    """Minimal valid Motion-JPEG MP4: one 'vide' track whose samples
    are the given coded JPEG frames, with a complete sample table
    (stsd 'jpeg' VisualSampleEntry, stts, stsc single-run, stsz
    per-sample sizes, stco one chunk). extract_video_samples on this
    writer's output returns the frame bytes verbatim, so a synth →
    extract → T.81-decode round trip has exact arithmetic ground
    truth."""
    if not frames:
        raise ValueError("need at least one frame")
    n = len(frames)
    duration = n * frame_duration
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    def moov_for(chunk_offset: int) -> bytes:
        mvhd = _box(
            b"mvhd",
            struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8
            + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                          0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),
        )
        tkhd = _box(
            b"tkhd",
            # flags=3 goes in the 3 bytes after version; the earlier
            # ">Bxxx...3..." form zeroed flags and wrote 3 into
            # creation_time (spec-strict players treat flags=0 as a
            # DISABLED track)
            struct.pack(">B3sIIIxxxxI", 0, b"\x00\x00\x03", 0, 0, 1, duration)
            + b"\x00" * 8
            + struct.pack(">HHHxx", 0, 0, 0)
            + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = _box(
            b"mdhd",
            struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _box(
            b"hdlr",
            struct.pack(">BxxxI", 0, 0) + b"vide" + b"\x00" * 12
            + b"handler\x00",
        )
        vmhd = _box(b"vmhd", struct.pack(">BxxxHHHH", 0, 1, 0, 0, 0))
        # one self-contained 'url ' entry (flags=1: data in this file)
        dref = _box(
            b"dref",
            struct.pack(">BxxxI", 0, 1)
            + _box(b"url ", struct.pack(">BBBB", 0, 0, 0, 1)),
        )
        dinf = _box(b"dinf", dref)
        # VisualSampleEntry 'jpeg' (ISO 14496-12 §12.1.3)
        entry = (
            b"\x00" * 6 + struct.pack(">H", 1)              # data_ref_idx
            + b"\x00" * 16                                   # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)     # 72 dpi
            + struct.pack(">I", 0) + struct.pack(">H", 1)    # frame_count
            + b"\x00" * 32                                   # compressorname
            + struct.pack(">Hh", 24, -1)                     # depth, pre_defined
        )
        stsd = _box(b"stsd", struct.pack(">BxxxI", 0, 1) + _box(b"jpeg", entry))
        stts = _box(b"stts", struct.pack(">BxxxIII", 0, 1, n, frame_duration))
        stsc = _box(b"stsc", struct.pack(">BxxxIIII", 0, 1, 1, n, 1))
        stsz = _box(
            b"stsz",
            struct.pack(">BxxxII", 0, 0, n)
            + struct.pack(f">{n}I", *[len(f) for f in frames]),
        )
        stco = _box(b"stco", struct.pack(">BxxxII", 0, 1, chunk_offset))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    # two-pass: moov length is independent of the 4-byte offset value
    probe = moov_for(0)
    chunk_offset = len(ftyp) + len(probe) + 8  # first byte inside mdat
    moov = moov_for(chunk_offset)
    assert len(moov) == len(probe)
    return ftyp + moov + _box(b"mdat", b"".join(frames))
