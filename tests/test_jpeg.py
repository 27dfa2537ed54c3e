"""Baseline JPEG codec + MJPEG-in-AVI (operators/jpeg.py, r8)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rippledb_spark.operators.jpeg import (
    AC_BITS,
    AC_VALUES,
    DC_BITS,
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from rippledb_spark.operators.multimodal import (
    decode_avi_frames,
    encode_avi,
    synth_mjpeg_dims,
    synth_mjpeg_pixels,
)


def test_annex_k_table_shapes():
    assert sum(DC_BITS) == 12
    assert sum(AC_BITS) == len(AC_VALUES) == 162


def test_block_constant_round_trip_is_exact():
    rng = np.random.default_rng(7)
    for w, h in [(8, 8), (16, 8), (24, 16), (13, 10)]:
        bw, bh = -(-w // 8), -(-h // 8)
        vals = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1)[:h, :w]
        got_w, got_h, pix = decode_jpeg_gray(encode_jpeg_gray(w, h, img.tobytes()))
        assert (got_w, got_h) == (w, h)
        assert np.frombuffer(pix, np.uint8).reshape(h, w).tolist() == img.tolist()


def test_arbitrary_content_round_trip_within_rounding():
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    _, _, pix = decode_jpeg_gray(encode_jpeg_gray(40, 24, img.tobytes()))
    got = np.frombuffer(pix, np.uint8).reshape(24, 40).astype(int)
    # unit quant table: the only loss is coefficient rounding (≤1 LSB)
    assert np.abs(got - img.astype(int)).max() <= 1


def test_lossy_quant_bounded_and_smaller():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    e1 = encode_jpeg_gray(32, 32, img.tobytes())
    e16 = encode_jpeg_gray(32, 32, img.tobytes(), quant=[16] * 64)
    assert len(e16) < len(e1)  # coarser quant compresses harder
    _, _, pix = decode_jpeg_gray(e16)
    got = np.frombuffer(pix, np.uint8).reshape(32, 32).astype(int)
    assert np.abs(got - img.astype(int)).max() < 64


def test_gradient_survives_entropy_coding():
    # smooth ramp: long zero runs + ZRL/EOB paths all get exercised
    img = np.add.outer(np.arange(16) * 8, np.arange(24) * 5).astype(np.uint8)
    _, _, pix = decode_jpeg_gray(encode_jpeg_gray(24, 16, img.tobytes()))
    got = np.frombuffer(pix, np.uint8).reshape(16, 24).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 1


def test_decoder_refusals_are_loud():
    ok = encode_jpeg_gray(8, 8, bytes(64))
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg_gray(b"\x00\x01")
    # SOF0 -> SOF2: progressive
    prog = ok.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="not baseline"):
        decode_jpeg_gray(prog)
    # cut mid-scan on an image whose entropy segment is long enough
    rng = np.random.default_rng(5)
    big = encode_jpeg_gray(
        32, 32, rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
    )
    with pytest.raises(ValueError, match="truncated JPEG"):
        decode_jpeg_gray(big[:-40])
    # 3-component SOF refuses (patch ncomp + length won't match, so build
    # a fake SOF body by editing the component count byte directly)
    at = ok.index(b"\xff\xc0")
    multi = bytearray(ok)
    multi[at + 9] = 3  # ncomp field of SOF0
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_gray(bytes(multi))


def test_mjpeg_avi_round_trip_exact():
    for mid in range(10):
        w, h, nf, uspf = synth_mjpeg_dims(mid)
        frames = [synth_mjpeg_pixels(mid, f, w, h) for f in range(nf)]
        v = decode_avi_frames(
            encode_avi(w, h, frames, us_per_frame=uspf, codec="mjpg")
        )
        assert v["compression"] == "mjpg"
        assert (v["width"], v["height"], v["n_frames"]) == (w, h, nf)
        assert v["frames"] == frames, mid  # exact: block-constant + unit quant


def test_mjpeg_frame_dims_must_match_container():
    # strf says 16x8 but the JPEG inside is 8x8 → loud refusal
    good = encode_avi(8, 8, [bytes(64)], codec="mjpg")
    bad = bytearray(good)
    at = bad.index(struct.pack("<Ii", 40, 8))  # BITMAPINFOHEADER
    struct.pack_into("<i", bad, at + 4, 16)  # biWidth = 16
    with pytest.raises(ValueError, match="strf says"):
        decode_avi_frames(bytes(bad))
