"""r16 in-process kernel profiler for the media codec families.

Times the EXACT per-id fixture kernels the registered queries run inside
their mapInPandas passes — synthesis (plane build + encode) and decode —
single-threaded, no Spark, so per-row cost is visible without dispatch
or shuffle noise (guide §1). Run before and after each codec
optimization; the per-row ratios are the kernel-speedup receipts for
OPTIMIZATION_r16.md.

Usage: python tools/profile_decode_r16.py [n_ids] [family ...]
Families: mpeg1 jpeg gif tiff (default: all). n_ids defaults to 1000.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _timeit(label: str, fn, n_rows: int) -> float:
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{label:34s} {dt:8.3f} s  {1000.0 * dt / n_rows:8.4f} ms/row")
    return dt


def prof_mpeg1(ids: list[int]) -> None:
    from rippledb_spark.operators.mpeg1 import (
        decode_mpeg1_frames,
        encode_mpeg1_intra,
    )
    from rippledb_spark.operators.multimodal import (
        synth_mpeg1_dims,
        synth_mpeg1_planes,
    )

    planes = {}

    def synth():
        for mid in ids:
            w, h, nf, _ = synth_mpeg1_dims(mid)
            planes[mid] = [synth_mpeg1_planes(mid, f) for f in range(nf)]

    _timeit("mpeg1 plane synth", synth, len(ids))
    payloads = {}

    def enc():
        for mid in ids:
            w, h, nf, rate = synth_mpeg1_dims(mid)
            payloads[mid] = encode_mpeg1_intra(
                w, h, planes[mid], rate_code=rate
            )

    _timeit("mpeg1 encode (intra)", enc, len(ids))

    def dec():
        for mid in ids:
            decode_mpeg1_frames(payloads[mid])

    _timeit("mpeg1 decode", dec, len(ids))


def prof_jpeg(ids: list[int]) -> None:
    from rippledb_spark.operators.jpeg import (
        decode_jpeg_planes,
        encode_jpeg_color,
        encode_jpeg_gray_progressive,
    )
    from rippledb_spark.operators.multimodal import (
        synth_color_jpeg_planes,
        synth_color_jpeg_shape,
    )

    shapes = {mid: synth_color_jpeg_shape(mid) for mid in ids}
    planes = {}

    def synth():
        for mid in ids:
            planes[mid] = synth_color_jpeg_planes(mid)

    _timeit("jpeg plane synth", synth, len(ids))
    payloads = {}

    def enc():
        for mid in ids:
            w, h, hy, vy, dri = shapes[mid]
            y, cb, cr = planes[mid]
            payloads[mid] = encode_jpeg_color(
                w, h, y, cb, cr, sampling=(hy, vy), restart_interval=dri
            )

    _timeit("jpeg color encode", enc, len(ids))

    def dec():
        for mid in ids:
            decode_jpeg_planes(payloads[mid])

    _timeit("jpeg color decode", dec, len(ids))

    prog = {}

    def encp():
        for mid in ids:
            w, h, *_ = shapes[mid]
            y = planes[mid][0]
            prog[mid] = encode_jpeg_gray_progressive(w, h, y)

    _timeit("jpeg progressive encode", encp, len(ids))

    def decp():
        for mid in ids:
            decode_jpeg_planes(prog[mid])

    _timeit("jpeg progressive decode", decp, len(ids))


def prof_gif(ids: list[int]) -> None:
    from rippledb_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
        synth_gif_frames,
        synth_gif_pixels,
    )

    payloads = {}

    def enc():
        for mid in ids:
            frames = synth_gif_frames(mid)
            fields = [
                synth_gif_pixels(mid, k, w, h)
                for k, (w, h, _) in enumerate(frames)
            ]
            payloads[mid] = encode_gif(frames, pixels=fields)

    _timeit("gif synth+encode (pattern)", enc, len(ids))

    def dec():
        for mid in ids:
            decode_gif_pixels(payloads[mid])

    _timeit("gif decode (pixels)", dec, len(ids))


def prof_tiff(ids: list[int]) -> None:
    from rippledb_spark.operators.multimodal import (
        synth_pattern_pixels,
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    raws = {mid: synth_pattern_pixels(mid, 64, 48) for mid in ids}
    comp = {}

    def enc():
        for mid in ids:
            comp[mid] = tiff_lzw_encode(raws[mid])

    _timeit("tiff lzw encode (64x48)", enc, len(ids))

    def dec():
        for mid in ids:
            tiff_lzw_decode(comp[mid], len(raws[mid]))

    _timeit("tiff lzw decode", dec, len(ids))


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 1000
    fams = [a for a in args if not a.isdigit()] or [
        "mpeg1", "jpeg", "gif", "tiff"
    ]
    ids = list(range(n))
    print(f"# n_ids={n} families={fams}")
    for fam in fams:
        {"mpeg1": prof_mpeg1, "jpeg": prof_jpeg, "gif": prof_gif,
         "tiff": prof_tiff}[fam](ids)


if __name__ == "__main__":
    main()
