"""Dependency-free baseline JPEG (ITU T.81 / JFIF) codec.

Retires the last ``_fake_decode`` fallback for *images*: JPEG payloads
now decode for real — marker walk → quantization + Huffman table parse
→ entropy decode (byte-stuffing + restart markers) → dequantize →
de-zigzag → 8×8 IDCT → chroma upsampling → YCbCr→RGB. Pure
Python/numpy; the IDCT is a vectorized orthonormal DCT-II matrix
product over all blocks at once, so decode cost is dominated by the
(tiny, per-coefficient) Huffman bit walk.

Scope: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2 —
spectral selection + successive approximation, the full T.81 Annex G
Huffman feature set: interleaved/non-interleaved DC scans, per-band AC
scans, EOB runs, DC/AC refinement scans; ~10 % of real scraped corpora
is progressive), 8-bit precision, 1 or 3 components, any JFIF sampling
whose factors divide the max (covers 4:4:4, 4:2:2, 4:2:0), DRI/RSTn
restart markers. Arithmetic coding, lossless/hierarchical SOFs, and
12-bit raise ValueError — callers route that to the documented
fallback, same contract as truncated WAV/PPM.

The encoder exists to manufacture deterministic test payloads (the
container has no image files): 4:4:4 or forced-4:2:0, caller-supplied
quantization tables, the spec's Annex K Huffman tables. With all-ones
quantization a flat-color image round-trips BIT-EXACTLY (single DC
coefficient, IDCT of a constant is constant), which gives the catalog
entry an arithmetic SQL oracle; gradient images round-trip within the
usual DCT quantization bound and are asserted within tolerance in
tests.

Everything here is public knowledge: the marker grammar, zigzag order,
Annex K tables, and DCT definitions are from the published T.81 spec.
Reference parity note: the reference repo has no media pipeline; this
extends SURVEY.md's multimodal north-star (BASELINE.json) the same way
operators/media_codecs.py does for WAV/PPM.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU T.81, public) ------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval) per class/id.
_DC_LUM = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: IDCT is  C.T @ coeff @ C, FDCT is C @ px @ C.T
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.where(
    _k[:, None] == 0, 1 / np.sqrt(2), 1.0
) * 0.5


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks → (n, 8, 8) spatial, vectorized."""
    return np.einsum("ij,njk,kl->nil", _C.T, blocks, _C, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,kl->nil", _C, blocks, _C.T, optimize=True)


# --- Huffman ---------------------------------------------------------------


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """Canonical Huffman: map (length, code) → symbol (T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict:
    """symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers.

    RSTn markers are consumed by ``restart()`` which also resets the
    bit buffer to a byte boundary (T.81 E.2.4)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill_one()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def _fill_one(self) -> None:
        d = self.data
        if self.pos >= len(d):
            self.buf, self.nbits = 0xFF, 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                self.buf, self.nbits = 0xFF, 8
                return
            # marker ahead: don't consume it; emit pad bits
            self.buf, self.nbits = 0xFF, 8
            return
        self.pos += 1
        self.buf, self.nbits = b, 8

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def align_and_expect_rst(self, n: int) -> None:
        """Drop partial byte, consume the RSTn marker (mod-8 sequence n)."""
        self.nbits = 0
        d = self.data
        # An encoder's byte-align flush pads with 1 bits; a final byte
        # of all ones is 0xFF, which the stuffing rule follows with
        # 0x00 — so a legal stream can put FF00 right before the RST
        # marker. Skip stuffed pad bytes, then any bare pad FFs.
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0x00:
            self.pos += 2
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or d[self.pos + 1] != 0xD0 + (n % 8)
        ):
            raise ValueError(f"expected RST{n % 8} marker at {self.pos}")
        self.pos += 2


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# --- decoder ---------------------------------------------------------------


def sniff_jpeg(payload: bytes | None) -> bool:
    return bool(payload) and payload[:3] == b"\xff\xd8\xff"


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JPEG → ``{width, height, channels, pixels}`` (uint8
    (h, w, c) array, RGB for 3-component, gray for 1). Raises
    ValueError on progressive/arithmetic/12-bit/malformed input —
    including truncated/bit-flipped streams, which must NOT surface as
    struct.error/IndexError/KeyError (callers implement the dispatch
    layer's "degrade, don't abort" contract by catching the documented
    ValueError; fuzz-pinned in test_codec_fuzz.py)."""
    try:
        return _decode_impl(payload)
    except (struct.error, IndexError, KeyError, OverflowError,
            ZeroDivisionError, MemoryError) as e:
        raise ValueError(f"malformed JPEG stream: {e!r}") from None


def _decode_impl(payload: bytes) -> dict:
    if not sniff_jpeg(payload):
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    prog_state = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them or a conformant encoder's padded file
        # misreads 0xFF as the marker code
        while pos + 4 <= n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qt[tq] = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                hs, vs = hv >> 4, hv & 0xF
                # T.81 B.2.2: sampling factors are 1..4. A corrupt 0
                # reaches the MCU-grid division and leaked as
                # ZeroDivisionError (exhaustive bit-flip audit, r5).
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("corrupt SOF: sampling factor out of 1..4")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            if w == 0 or h == 0:
                raise ValueError("corrupt SOF: zero dimension")
            # A 19-byte SOF can claim 65535×65535 — the coefficient /
            # plane buffers would be a >12 GiB allocation whose
            # MemoryError escapes the ValueError-only contract (one
            # crafted row kills the task). 64 Mpx bounds the decode
            # buffers at ~0.5-1 GB while accepting any plausible photo.
            if w * h > 64_000_000:
                raise ValueError(f"implausible SOF dimensions {w}x{h}")
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/1) and progressive (SOF2) DCT supported"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = [0] + list(body[i + 1 : i + 17])
                cnt = sum(bits)
                huffval = list(body[i + 17 : i + 17 + cnt])
                huff[(tc, th)] = _build_decode_table(bits, huffval)
                i += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = struct.unpack_from(">BB", body, 1 + 2 * c)
                matches = [x for x in frame["comps"] if x["id"] == cs]
                if not matches:
                    raise ValueError(f"SOS references unknown component {cs}")
                scan.append((matches[0], tables >> 4, tables & 0xF))
            data_start = pos + 2 + seg_len
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    # a non-interleaved multi-scan baseline file would
                    # need further SOS segments we don't process —
                    # mis-decoding silently is worse than refusing
                    raise ValueError(
                        "non-interleaved multi-scan baseline JPEG unsupported"
                    )
                return _decode_scan(
                    payload, data_start, frame, scan, qt, huff,
                    restart_interval,
                )
            # progressive: Ss/Se/AhAl follow the component specs
            ss, se, ahal = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            if prog_state is None:
                prog_state = _init_progressive_state(frame)
            pos = _decode_progressive_scan(
                payload, data_start, frame, scan, huff, restart_interval,
                prog_state, ss, se, ahal >> 4, ahal & 0xF,
            )
            continue
        pos += 2 + seg_len
    if prog_state is not None:
        return _finish_progressive(frame, prog_state, qt)
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, scan, qt, huff, restart_interval):
    w, h = frame["w"], frame["h"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component block grids (in MCU-padded units)
    planes = []
    for c, _, _ in scan:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        planes.append(np.zeros((bh * bw, 8, 8), dtype=np.float64))
    reader = _BitReader(payload, pos)
    pred = [0] * len(scan)
    rst_seq = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_and_expect_rst(rst_seq)
                rst_seq += 1
                pred = [0] * len(scan)
            for ci, (c, dc_id, ac_id) in enumerate(scan):
                dct = huff[(0, dc_id)]
                act = huff[(1, ac_id)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = reader.decode_symbol(dct)
                        # T.81 table F.1: 8-bit baseline DC magnitude
                        # category SSSS is 0..11. A corrupt DHT can put
                        # symbols >11 in the table; receive(s) would then
                        # read an unbounded int and pred accumulation
                        # overflows int32 (OverflowError leaked past the
                        # ValueError contract — fuzz seed=255/flip=127).
                        if s > 11:
                            raise ValueError("corrupt scan: DC size category > 11")
                        pred[ci] += _extend(reader.receive(s), s)
                        if not (-(1 << 15) <= pred[ci] < (1 << 15)):
                            raise ValueError("corrupt scan: DC predictor out of range")
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            # T.81: AC magnitude category is 1..10 for
                            # 8-bit precision.
                            if s > 10:
                                raise ValueError("corrupt scan: AC size category > 10")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz * q
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        planes[ci][row * (mcus_x * c["h"]) + col] = blk.reshape(8, 8)
            mcu_index += 1
    return _assemble([c for c, _, _ in scan], planes, mcus_x, mcus_y, w, h,
                     "baseline")


def _assemble(comps, planes, mcus_x, mcus_y, w, h, mode):
    """Dequantized (n, 8, 8) coefficient blocks per component → final
    pixel dict (IDCT, plane crop, chroma upsample, color convert).
    Shared by the baseline and progressive paths."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for ci, c in enumerate(comps):
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        spatial = _idct_blocks(planes[ci]) + 128.0
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # crop to the component's true dimensions, then replicate up to
        # full resolution (nearest — the common fast-path convention)
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        pix = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 1,
                "pixels": pix[:, :, None], "mode": mode}
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    pix = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": pix,
            "mode": mode}


# --- progressive decoder (T.81 Annex G, Huffman) ---------------------------


def _init_progressive_state(frame) -> dict:
    """Per-component coefficient accumulators for the multi-scan walk:
    int32 (n_blocks, 64) arrays in ZIGZAG order, sized to the MCU-padded
    grid (interleaved DC scans address it in MCU order; non-interleaved
    AC scans address the ceil(component-dim/8) prefix of each row)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    coef = {}
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        coef[c["id"]] = np.zeros((bh * bw, 64), dtype=np.int32)
    return {"mcus_x": mcus_x, "mcus_y": mcus_y, "hmax": hmax, "vmax": vmax,
            "coef": coef, "nscans": 0}


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past entropy-coded data to the next non-RST marker."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # stray RST (e.g. after final interval)
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            return pos
        pos += 1
    return n


def _comp_block_dims(frame, c, hmax, vmax) -> tuple[int, int]:
    """Non-interleaved block-grid dims for one component (T.81 A.2.2):
    ceil(ceil(dim * sampling / max_sampling) / 8) per axis."""
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _refine_nonzero(coef, k, reader, p1) -> None:
    """Read one correction bit for an already-nonzero coefficient
    (T.81 G.1.2.3: append the bit below the known magnitude)."""
    if reader.read_bit():
        cur = int(coef[k])
        if (cur & p1) == 0:
            coef[k] = cur + (p1 if cur >= 0 else -p1)


def _first_ac_block(coef, reader, act, ss, se, al, eobrun) -> int:
    """Decode one block's band in an AC first scan (Ah == 0). Returns
    the updated EOB run (blocks whose band is entirely zero)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                return (1 << r) - 1 + (reader.receive(r) if r else 0)
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            if s > 10:
                raise ValueError("corrupt scan: AC size category > 10")
            coef[k] = _extend(reader.receive(s), s) << al
            k += 1
    return 0


def _refine_ac_block(coef, reader, act, ss, se, al, eobrun) -> int:
    """Decode one block's band in an AC refinement scan (Ah == Al + 1):
    newly-significant coefficients arrive as ±1<<Al; every
    already-nonzero coefficient passed over contributes one correction
    bit (libjpeg/stb-compatible ordering). Returns the updated EOB run."""
    p1 = 1 << al
    if eobrun > 0:
        for k in range(ss, se + 1):
            if coef[k] != 0:
                _refine_nonzero(coef, k, reader, p1)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0xF
        val = 0
        eob_mode = False
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1 + (reader.receive(r) if r else 0)
                eob_mode = True  # only correction bits remain in band
            # else ZRL: r == 15 skips 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError(
                    "corrupt progressive refinement: size category != 1"
                )
            val = p1 if reader.read_bit() else -p1
        satisfied = eob_mode
        while k <= se:
            if coef[k] != 0:
                _refine_nonzero(coef, k, reader, p1)
            elif not eob_mode:
                if r == 0:
                    if s:
                        coef[k] = val
                    k += 1
                    satisfied = True
                    break
                r -= 1
            k += 1
        # A ZRL / newly-significant advance that the band cannot hold is
        # a desync — flag it like _first_ac_block's "run past band end"
        # instead of silently tolerating a drifted bit position.
        if not satisfied:
            raise ValueError("corrupt progressive refinement: advance past band end")
    return eobrun


def _decode_progressive_scan(payload, pos, frame, scan, huff,
                             restart_interval, state, ss, se, ah, al) -> int:
    """Decode one progressive SOS (any of the four scan kinds) into the
    accumulated coefficient state; returns the stream position of the
    next marker after the entropy data."""
    if ss == 0:
        if se != 0:
            raise ValueError("corrupt scan header: DC scan with Se != 0")
        kind = "dc_first" if ah == 0 else "dc_refine"
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        if se > 63 or ss > se:
            raise ValueError("corrupt scan header: bad spectral band")
        kind = "ac_first" if ah == 0 else "ac_refine"
    if al > 13 or ah > 14:
        raise ValueError("corrupt scan header: successive approximation > 13")
    reader = _BitReader(payload, pos)
    mcus_x, mcus_y = state["mcus_x"], state["mcus_y"]
    hmax, vmax = state["hmax"], state["vmax"]
    rst_seq = 0
    if kind in ("dc_first", "dc_refine"):
        pred = [0] * len(scan)
        # DC scans may interleave all frame components (MCU walk). A
        # single-component DC scan degenerates to the same walk with a
        # 1-component MCU, except the grid is the non-interleaved one.
        interleaved = len(scan) > 1
        if interleaved:
            unit_iter = [(my, mx) for my in range(mcus_y) for mx in range(mcus_x)]
        else:
            c = scan[0][0]
            nbx, nby = _comp_block_dims(frame, c, hmax, vmax)
            unit_iter = [(by, bx) for by in range(nby) for bx in range(nbx)]
        for unit_index, (uy, ux) in enumerate(unit_iter):
            if restart_interval and unit_index and unit_index % restart_interval == 0:
                reader.align_and_expect_rst(rst_seq)
                rst_seq += 1
                pred = [0] * len(scan)
            for ci, (c, dc_id, _) in enumerate(scan):
                grid_w = mcus_x * c["h"]
                if interleaved:
                    blocks = [
                        ((uy * c["v"] + by) * grid_w + (ux * c["h"] + bx))
                        for by in range(c["v"]) for bx in range(c["h"])
                    ]
                else:
                    blocks = [uy * grid_w + ux]
                coefs = state["coef"][c["id"]]
                for bi in blocks:
                    if kind == "dc_first":
                        dct = huff[(0, dc_id)]
                        s = reader.decode_symbol(dct)
                        if s > 11:
                            raise ValueError(
                                "corrupt scan: DC size category > 11"
                            )
                        pred[ci] += _extend(reader.receive(s), s)
                        if not (-(1 << 15) <= pred[ci] < (1 << 15)):
                            raise ValueError(
                                "corrupt scan: DC predictor out of range"
                            )
                        coefs[bi, 0] = pred[ci] << al
                    else:  # dc_refine: one correction bit per block
                        if reader.read_bit():
                            coefs[bi, 0] = int(coefs[bi, 0]) | (1 << al)
    else:
        c, _, ac_id = scan[0]
        act = huff[(1, ac_id)]
        coefs = state["coef"][c["id"]]
        grid_w = mcus_x * c["h"]
        nbx, nby = _comp_block_dims(frame, c, hmax, vmax)
        eobrun = 0
        block_fn = _first_ac_block if kind == "ac_first" else _refine_ac_block
        unit_index = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and unit_index and unit_index % restart_interval == 0:
                    reader.align_and_expect_rst(rst_seq)
                    rst_seq += 1
                    eobrun = 0
                eobrun = block_fn(
                    coefs[by * grid_w + bx], reader, act, ss, se, al, eobrun
                )
                unit_index += 1
    state["nscans"] += 1
    return _skip_to_marker(payload, reader.pos)


def _finish_progressive(frame, state, qt) -> dict:
    if state["nscans"] == 0:
        raise ValueError("progressive JPEG with no decoded scans")
    comps = frame["comps"]
    planes = []
    for c in comps:
        zz = state["coef"][c["id"]]
        q = qt[c["tq"]]
        blk = np.zeros((zz.shape[0], 64), dtype=np.float64)
        blk[:, ZIGZAG] = zz * q[None, :]
        planes.append(blk.reshape(-1, 8, 8))
    return _assemble(comps, planes, state["mcus_x"], state["mcus_y"],
                     frame["w"], frame["h"], "progressive")


# --- encoder ---------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff else 0
    if diff < 0:
        bits = diff + (1 << size) - 1
    else:
        bits = diff
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        bits = v + (1 << size) - 1 if v < 0 else v
        code, length = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _plane_to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a 2-D plane to multiples of 8 (edge replicate) and return
    (n_blocks, 8, 8) in raster order plus the block-grid dims."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    return blocks, ph // 8, pw // 8


def _prepare_encode(pixels: np.ndarray, quant_luma, quant_chroma,
                    subsample_420: bool):
    """Shared front half of both encoders: color convert, subsample,
    FDCT, quantize. Returns (comp_blocks, comp_grid, samp, qids,
    quants, mcus_x, mcus_y, h, w, nc) where comp_blocks[ci] is the
    (n_blocks, 64) int32 zigzag coefficient grid."""
    h, w, nc = pixels.shape
    if quant_luma is None:
        quant_luma = np.ones(64, dtype=np.int32)
    if quant_chroma is None:
        quant_chroma = np.ones(64, dtype=np.int32)
    quant_luma = np.asarray(quant_luma, dtype=np.int32).reshape(64)
    quant_chroma = np.asarray(quant_chroma, dtype=np.int32).reshape(64)
    px = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    else:
        planes = [px[..., 0]]
        samp = [(1, 1)]
        qids = [0]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    quants = [quant_luma, quant_chroma]
    # quantized zigzag blocks per component, indexed by block-grid raster
    comp_blocks = []
    comp_grid = []
    for ci, plane in enumerate(planes):
        sh, sv = samp[ci]
        # pad plane out to the full MCU grid for this component
        tw, th = mcus_x * sh * 8, mcus_y * sv * 8
        ph, pw = plane.shape
        plane = np.pad(plane, ((0, th - ph), (0, tw - pw)), mode="edge")
        blocks, gh, gw = _plane_to_blocks(plane)
        coeff = _fdct_blocks(blocks - 128.0)
        q = quants[qids[ci]]
        flat = coeff.reshape(-1, 64)[:, ZIGZAG]  # natural → zigzag
        zz = np.round(flat / q[None, :]).astype(np.int32)
        comp_blocks.append(zz)
        comp_grid.append((gh, gw))
    return (comp_blocks, comp_grid, samp, qids, quants, mcus_x, mcus_y,
            h, w, nc)


def _emit_frame_headers(out: bytearray, h, w, nc, samp, qids, quants,
                        sof_marker: int) -> None:
    """SOI + JFIF APP0 + DQTs + SOFn, shared by both encoders."""
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(quants[: 2 if nc == 3 else 1]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in q
        )
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for ci in range(nc):
        out += struct.pack(
            ">BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]
        )


def encode_jpeg(pixels: np.ndarray, quant_luma: np.ndarray | None = None,
                quant_chroma: np.ndarray | None = None,
                subsample_420: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 1|3) uint8 → baseline JFIF bytes.

    Default quantization tables are ALL ONES (near-lossless: flat-color
    blocks round-trip exactly). Pass the Annex K tables for realistic
    lossy behavior. ``subsample_420`` box-averages chroma 2×2 and
    encodes Y at 2×2 sampling so the decoder's upsampling path is
    exercised; ``restart_interval`` emits DRI + RSTn markers."""
    (comp_blocks, comp_grid, samp, qids, quants, mcus_x, mcus_y,
     h, w, nc) = _prepare_encode(pixels, quant_luma, quant_chroma,
                                 subsample_420)
    out = bytearray()
    _emit_frame_headers(out, h, w, nc, samp, qids, quants, 0xC0)
    tables = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if nc == 3:
        tables += [(0, 1, _DC_CHR), (1, 1, _AC_CHR)]
    enc_tabs = {}
    for tc, th, (bits, huffval) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(huffval), (tc << 4) | th)
        out += bytes(bits[1:]) + bytes(huffval)
        enc_tabs[(tc, th)] = _build_encode_table(bits, huffval)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        tid = 0 if ci == 0 else (1 if nc == 3 else 0)
        out += struct.pack(">BB", ci + 1, (tid << 4) | tid)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    bw = _BitWriter()
    pred = [0] * nc
    rst_seq = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.flush()
                out += bytes(bw.out)
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst_seq % 8)])
                rst_seq += 1
                pred = [0] * nc
            for ci in range(nc):
                sh, sv = samp[ci]
                _, gw = comp_grid[ci]
                tid = 0 if ci == 0 else (1 if nc == 3 else 0)
                for by in range(sv):
                    for bx in range(sh):
                        row = my * sv + by
                        col = mx * sh + bx
                        zz = comp_blocks[ci][row * gw + col]
                        pred[ci] = _encode_block(
                            bw, zz, pred[ci],
                            enc_tabs[(0, tid)], enc_tabs[(1, tid)],
                        )
            mcu_index += 1
    bw.flush()
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Progressive-scan Huffman tables. Annex K's AC tables carry only EOB
# (0x00) and ZRL (0xF0) among the s=0 symbols, but progressive AC scans
# also need the EOBn run-length symbols 0x10..0xE0 — so the progressive
# encoder ships its own flat canonical tables: every symbol at one code
# length (L chosen so count < 2^L, keeping the all-ones code unused as
# T.81 C.2 requires). Compression is suboptimal; determinism and
# decoder-compatibility are what the test corpus needs.
_PROG_DC_SYMS = list(range(12))
_PROG_DC = ([0, 0, 0, 0, 12] + [0] * 12, _PROG_DC_SYMS)
_PROG_AC_SYMS = (
    [r << 4 for r in range(15)]            # EOB1..EOB16384 run lengths
    + [0xF0]                               # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC = (
    [0] * 9 + [len(_PROG_AC_SYMS)] + [0] * 7,  # all 176 symbols at length 9
    _PROG_AC_SYMS,
)


def _default_scan_script(nc: int) -> list:
    """cjpeg-style progression: DC with one successive-approximation
    level, per-component spectral-selection AC scans at Al, then AC and
    DC refinements down to Al=0."""
    if nc == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
    ]


def _emit_eobrun(bw: _BitWriter, ac_tab: dict, eobrun: int,
                 bitbuf: list) -> None:
    """Flush a pending EOB run + its buffered correction bits."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, length = ac_tab[nbits << 4]
        bw.write(code, length)
        if nbits:
            bw.write(eobrun & ((1 << nbits) - 1), nbits)
    for b in bitbuf:
        bw.write(b, 1)
    bitbuf.clear()


def _encode_ac_first(bw, zz_rows, ss, se, al, ac_tab) -> None:
    """AC first scan (Ah=0) for one component band over its blocks."""
    eobrun = 0
    for zz in zz_rows:
        band = [int(v) for v in zz[ss:se + 1]]
        shifted = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in band]
        if not any(shifted):
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(bw, ac_tab, eobrun, [])
                eobrun = 0
            continue
        r = 0
        last_nz = max(i for i, v in enumerate(shifted) if v)
        for i, v in enumerate(shifted):
            if i > last_nz:
                eobrun += 1  # trailing zeros → this block joins an EOB run
                break
            if v == 0:
                r += 1
                continue
            if eobrun:
                _emit_eobrun(bw, ac_tab, eobrun, [])
                eobrun = 0
            while r > 15:
                code, length = ac_tab[0xF0]
                bw.write(code, length)
                r -= 16
            size = abs(v).bit_length()
            bits = v + (1 << size) - 1 if v < 0 else v
            code, length = ac_tab[(r << 4) | size]
            bw.write(code, length)
            bw.write(bits, size)
            r = 0
        else:
            if r > 0:  # band ended in zeros after the last nonzero
                eobrun += 1
        if eobrun == 0x7FFF:
            _emit_eobrun(bw, ac_tab, eobrun, [])
            eobrun = 0
    _emit_eobrun(bw, ac_tab, eobrun, [])


def _encode_ac_refine(bw, zz_rows, ss, se, al, ac_tab) -> None:
    """AC refinement scan (Ah=Al+1): newly-significant coefficients as
    ±1<<Al plus one correction bit for every already-nonzero
    coefficient passed over.

    Correction-bit placement mirrors the decoder's advance windows
    exactly: a ZRL opens a window of 16 zero-history slots and the
    corrections INTERLEAVED among those slots follow that ZRL; a
    (r<<4)|1 symbol's corrections are those before its target slot;
    corrections in blocks folded into an EOB run are buffered (in
    positional order) and flushed right after the EOBn symbol."""
    eobrun = 0
    fifo: list[int] = []  # corrections buffered under the pending EOB run

    def flush_eob():
        nonlocal eobrun
        _emit_eobrun(bw, ac_tab, eobrun, fifo)
        eobrun = 0

    for zz in zz_rows:
        band = [int(v) for v in zz[ss:se + 1]]
        absval = [abs(v) >> al for v in band]
        keob = max((i for i, a in enumerate(absval) if a == 1), default=-1)
        if keob < 0:
            # no newly-significant coefficient: the whole band folds
            # into the EOB run; history corrections ride the FIFO
            fifo.extend(a & 1 for a in absval if a > 1)
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        # events since the last emitted symbol: 'z' = zero-history slot,
        # int = a history coefficient's correction bit
        gap: list = []
        for i, a in enumerate(absval):
            if i > keob:
                break
            if a == 0:
                gap.append("z")
            elif a > 1:
                gap.append(a & 1)
            else:  # newly significant
                nz = gap.count("z")
                while nz > 15:
                    flush_eob()
                    code, length = ac_tab[0xF0]
                    bw.write(code, length)
                    # window = everything up to and incl. the 16th zero
                    seen = 0
                    cut = 0
                    for cut, ev in enumerate(gap):
                        if ev == "z":
                            seen += 1
                            if seen == 16:
                                break
                    for ev in gap[: cut + 1]:
                        if ev != "z":
                            bw.write(ev, 1)
                    gap = gap[cut + 1:]
                    nz -= 16
                flush_eob()
                code, length = ac_tab[(nz << 4) | 1]
                bw.write(code, length)
                bw.write(1 if band[i] >= 0 else 0, 1)
                for ev in gap:
                    if ev != "z":
                        bw.write(ev, 1)
                gap = []
        # tail after the last newly-significant coefficient
        tail_corr = [a & 1 for a in absval[keob + 1:] if a > 1]
        if absval[keob + 1:]:
            fifo.extend(tail_corr)
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(pixels: np.ndarray,
                            quant_luma: np.ndarray | None = None,
                            quant_chroma: np.ndarray | None = None,
                            subsample_420: bool = False,
                            scans: list | None = None) -> bytes:
    """(h, w, 1|3) uint8 → PROGRESSIVE (SOF2) JFIF bytes.

    Transmits the same quantized coefficients as :func:`encode_jpeg`
    split across a cjpeg-style scan script (DC first + refinement,
    per-component spectral bands, AC successive-approximation
    refinements), so ``decode_jpeg(encode_jpeg_progressive(px))``
    equals ``decode_jpeg(encode_jpeg(px))`` bit-exactly — progressive
    transmission is lossless re-ordering. ``scans`` overrides the
    script with (comp_indices, Ss, Se, Ah, Al) tuples."""
    (comp_blocks, comp_grid, samp, qids, quants, mcus_x, mcus_y,
     h, w, nc) = _prepare_encode(pixels, quant_luma, quant_chroma,
                                 subsample_420)
    if scans is None:
        scans = _default_scan_script(nc)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    out = bytearray()
    _emit_frame_headers(out, h, w, nc, samp, qids, quants, 0xC2)
    enc_tabs = {}
    for tc, th, (bits, huffval) in [(0, 0, _PROG_DC), (1, 0, _PROG_AC)]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(huffval), (tc << 4) | th)
        out += bytes(bits[1:17]) + bytes(huffval)
        enc_tabs[(tc, th)] = _build_encode_table(bits, huffval)
    dc_tab, ac_tab = enc_tabs[(0, 0)], enc_tabs[(1, 0)]
    for comp_idx, ss, se, ah, al in scans:
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_idx), len(comp_idx))
        for ci in comp_idx:
            out += struct.pack(">BB", ci + 1, 0)  # DC/AC table id 0
        out += struct.pack(">BBB", ss, se, (ah << 4) | al)
        bw = _BitWriter()
        if ss == 0 and ah == 0:  # DC first (interleaved MCU walk)
            pred = [0] * len(comp_idx)
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for k, ci in enumerate(comp_idx):
                        sh, sv = samp[ci]
                        _, gw = comp_grid[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                row, col = my * sv + by, mx * sh + bx
                                v = int(comp_blocks[ci][row * gw + col][0]) >> al
                                diff = v - pred[k]
                                pred[k] = v
                                size = abs(diff).bit_length()
                                bits_ = diff + (1 << size) - 1 if diff < 0 else diff
                                code, length = dc_tab[size]
                                bw.write(code, length)
                                if size:
                                    bw.write(bits_, size)
        elif ss == 0:  # DC refinement: bit Al of each DC, MCU order
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci in comp_idx:
                        sh, sv = samp[ci]
                        _, gw = comp_grid[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                row, col = my * sv + by, mx * sh + bx
                                v = int(comp_blocks[ci][row * gw + col][0])
                                bw.write((v >> al) & 1, 1)
        else:  # AC scan: single component, non-interleaved block walk
            ci = comp_idx[0]
            sh, sv = samp[ci]
            _, gw = comp_grid[ci]
            cw = -(-w * sh // hmax)
            ch = -(-h * sv // vmax)
            nbx, nby = -(-cw // 8), -(-ch // 8)
            zz_rows = [
                comp_blocks[ci][by * gw + bx]
                for by in range(nby) for bx in range(nbx)
            ]
            if ah == 0:
                _encode_ac_first(bw, zz_rows, ss, se, al, ac_tab)
            else:
                _encode_ac_refine(bw, zz_rows, ss, se, al, ac_tab)
        bw.flush()
        out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def classify_jpeg(payload: bytes) -> str:
    """Classify a JPEG payload by its SOF marker WITHOUT decoding:
    ``baseline`` (SOF0/1), ``progressive`` (SOF2 — ~10 % of real
    scraped corpora; both decodable here), ``other-sof``
    (lossless/hierarchical/arithmetic — valid but undecodable),
    ``malformed``. Lets pipeline operators report honest per-class
    counts instead of lumping valid-but-unsupported files in with
    corrupt ones."""
    if not sniff_jpeg(payload):
        return "malformed"
    pos, n = 2, len(payload)
    try:
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return "malformed"
            while pos + 4 <= n and payload[pos + 1] == 0xFF:
                pos += 1
            marker = payload[pos + 1]
            if marker in (0xC0, 0xC1):
                return "baseline"
            if marker == 0xC2:
                return "progressive"
            if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                          0xCE, 0xCF):
                return "other-sof"
            if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
                return "malformed"
            seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
            if seg_len < 2:
                return "malformed"
            pos += 2 + seg_len
    except struct.error:
        return "malformed"
    return "malformed"
