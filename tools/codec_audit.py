"""Exhaustive codec exception-contract audit (heavier than the
hypothesis fuzz in tests/test_codec_fuzz.py, which samples): for every
codec, try EVERY truncation point and EVERY byte offset × 4 flip
patterns of a valid payload, and assert the decoder either decodes or
raises ValueError — nothing else. This is the leak class that killed
round-4 CI (OverflowError via a corrupt DC size category) and the r5
ZeroDivisionError (corrupt SOF sampling factor); a clean sweep here
means one corrupt row cannot kill a Spark task through any of these
decoders.

Run: python tools/codec_audit.py   (~1 min; prints per-codec counts)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from data_analyse_marche_emploi_spark.operators import gif as G  # noqa: E402
from data_analyse_marche_emploi_spark.operators import jpeg as J  # noqa: E402
from data_analyse_marche_emploi_spark.operators import media_codecs as MC  # noqa: E402
from data_analyse_marche_emploi_spark.operators import mp4 as M4  # noqa: E402
from data_analyse_marche_emploi_spark.operators import png as P  # noqa: E402

FLIPS = (0xFF, 0x01, 0x80, 0x10)


def extract_and_decode(payload: bytes) -> None:
    out = M4.extract_video_samples(payload)
    for s in out["samples"]:
        J.decode_jpeg(s)


def audit(name: str, payload: bytes, dec) -> int:
    leaks = 0
    for cut in range(len(payload) + 1):
        try:
            dec(payload[:cut])
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001 — the audit's whole point
            leaks += 1
            print(f"  LEAK {name} cut={cut}: {type(e).__name__}: {e}")
    for flip in range(len(payload)):
        for bits in FLIPS:
            m = bytearray(payload)
            m[flip] ^= bits
            try:
                dec(bytes(m))
            except ValueError:
                pass
            except Exception as e:  # noqa: BLE001
                leaks += 1
                print(f"  LEAK {name} flip={flip}^{bits:#x}: "
                      f"{type(e).__name__}: {e}")
    dec(payload)  # the clean payload must still decode
    print(f"{name}: {len(payload)} bytes, {leaks} leaks")
    return leaks


def main() -> None:
    g = np.random.default_rng(3).integers(0, 256, (8, 8, 1), dtype=np.uint8)
    rgb = np.random.default_rng(4).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    total = 0
    total += audit("png-gray", P.encode_png(g), P.decode_png)
    total += audit("png-rgb-mixed-filters", P.encode_png(rgb, filter_mix=True),
                   P.decode_png)
    total += audit("jpeg-gray", J.encode_jpeg(g), J.decode_jpeg)
    total += audit("jpeg-rgb", J.encode_jpeg(rgb), J.decode_jpeg)
    total += audit("jpeg-progressive-gray", J.encode_jpeg_progressive(g),
                   J.decode_jpeg)
    total += audit("jpeg-progressive-rgb", J.encode_jpeg_progressive(rgb),
                   J.decode_jpeg)
    total += audit("gif", G.encode_gif(rgb), G.decode_gif)
    total += audit("gif-interlaced",
                   G.encode_gif(np.repeat(g, 3, axis=2), interlace=True),
                   G.decode_gif)
    pal = np.random.default_rng(5).integers(0, 256, (9, 3), dtype=np.uint8)
    anim = G.encode_gif_animated(
        [pal[np.random.default_rng(6 + k).integers(0, 9, (10, 10))]
         for k in range(3)]
    )
    total += audit("gif-animated+frames",
                   anim, lambda b: G.decode_gif_frames(b, max_frames=3))
    from data_analyse_marche_emploi_spark.operators import bmp as BM

    total += audit("bmp-rgb", BM.encode_bmp(rgb), BM.decode_bmp)
    total += audit("bmp-gray-paletted", BM.encode_bmp(g), BM.decode_bmp)
    total += audit("wav", MC.encode_wav_pcm8(bytes(range(200)), 8000),
                   MC.decode_wav)
    total += audit("ppm", MC.encode_ppm(rgb), MC.decode_ppm)
    total += audit(
        "mp4-meta",
        M4.encode_minimal_mp4(duration=1000, width=16, height=16,
                              mdat=b"x" * 64),
        M4.parse_mp4,
    )
    total += audit(
        "mjpeg-extract+decode",
        M4.encode_mjpeg_mp4([J.encode_jpeg(g)] * 2, width=8, height=8),
        extract_and_decode,
    )
    print(f"TOTAL LEAKS: {total}")
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
