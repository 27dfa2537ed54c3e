"""MPEG-1 intra codec (operators/mpeg1.py, r11): exact DC round-trips,
the AC path against an independent numpy IDCT, VLC details, refusals,
and the Spark frame-stats surface."""

from __future__ import annotations

import numpy as np
import pytest

from rippledb_spark.operators.mpeg1 import (
    _AC_EOB,
    _AC_TABLE,
    _Bits,
    _DC_SIZE_CHROMA,
    _DC_SIZE_LUMA,
    _INTRA_Q,
    _MBA_TABLE,
    _dc_diff_bits,
    decode_mpeg1_frames,
    encode_mpeg1_intra,
)


def _const_planes(w, h, fn_y, cb=128, cr=128):
    bw = w // 8
    y = bytes(fn_y((yy // 8) * bw + (xx // 8)) % 256
              for yy in range(h) for xx in range(w))
    c1 = bytes([cb]) * (w * h // 4)
    c2 = bytes([cr]) * (w * h // 4)
    return y, c1, c2


def test_dc_only_roundtrip_is_exact():
    w, h = 48, 32
    frames = [_const_planes(w, h, lambda b, f=f: 43 * 9 + 19 * f + 13 * b)
              for f in range(3)]
    es = encode_mpeg1_intra(w, h, frames, rate_code=4)
    v = decode_mpeg1_frames(es)
    assert (v["width"], v["height"], v["n_frames"]) == (w, h, 3)
    assert v["us_per_frame"] == 33366
    for f in range(3):
        assert v["frames"][f] == frames[f]


def _handmade_stream_with_ac(run, level, qscale=8):
    """One 16x16 I-picture whose FIRST luma block carries dc=100 plus
    one AC coefficient (run, level); everything else flat 128."""
    bits = _Bits()
    bits.start_code(0xB3)
    bits.w(16, 12); bits.w(16, 12); bits.w(1, 4); bits.w(3, 4)
    bits.w(0x3FFFF, 18); bits.w(1, 1); bits.w(0, 10); bits.w(0, 1)
    bits.w(0, 1); bits.w(0, 1)
    bits.start_code(0x00)
    bits.w(0, 10); bits.w(1, 3); bits.w(0xFFFF, 16); bits.w(0, 1)
    bits.start_code(0x01)
    bits.w(qscale, 5); bits.w(0, 1)
    bits.wstr(_MBA_TABLE[1]); bits.wstr("1")  # MB 0, intra
    preds = {"y": 128, "cb": 128, "cr": 128}
    for i, comp in enumerate(("y", "y", "y", "y", "cb", "cr")):
        dc = 100 if i == 0 else 128
        diff = dc - preds[comp]
        preds[comp] = dc
        size, amp = _dc_diff_bits(diff)
        tab = _DC_SIZE_LUMA if comp == "y" else _DC_SIZE_CHROMA
        bits.wstr(tab[size])
        if size:
            bits.w(amp, size)
        if i == 0:
            bits.wstr(_AC_TABLE[(run, abs(level))])
            bits.w(0 if level > 0 else 1, 1)  # sign
        bits.wstr(_AC_EOB)
    bits.start_code(0xB7)
    bits.align()
    return bytes(bits.buf)


@pytest.mark.parametrize(
    "run,level", [(0, 1), (1, 1), (0, 2), (2, 3), (5, 1), (5, -1), (0, -2)]
)
def test_ac_path_matches_independent_idct(run, level):
    """The AC dequant + zigzag + IDCT chain checked against a from-
    scratch numpy reference (NOT jpeg.py's matrix — an independent
    derivation of the 8x8 DCT-II basis)."""
    from rippledb_spark.operators.jpeg import _Z

    qscale = 8
    es = _handmade_stream_with_ac(run, level, qscale)
    v = decode_mpeg1_frames(es)
    y = np.frombuffer(v["frames"][0][0], dtype=np.uint8).reshape(16, 16)
    got = y[:8, :8].astype(np.int64)

    # independent reference: coefficient grid -> pixels
    k = run + 1  # zigzag index of the AC coefficient
    r, c = _Z[k]
    w = _INTRA_Q[r * 8 + c]
    prod = 2 * level * qscale * w
    rec = prod // 16 if prod >= 0 else -((-prod) // 16)  # trunc toward 0
    if rec and rec % 2 == 0:
        rec -= 1 if rec > 0 else -1
    F = np.zeros((8, 8))
    F[0, 0] = 100 * 8
    F[r, c] = rec
    x = np.arange(8)
    basis = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    a = np.full(8, np.sqrt(2.0 / 8))
    a[0] = np.sqrt(1.0 / 8)
    # f(y,x) = sum_u sum_v a(u)a(v) F[u,v] cos_u(y) cos_v(x)
    ref = np.zeros((8, 8))
    for u in range(8):
        for vv in range(8):
            ref += a[u] * a[vv] * F[u, vv] * np.outer(basis[u], basis[vv])
    ref = np.clip(np.round(ref), 0, 255).astype(np.int64)
    assert np.array_equal(got, ref)
    # the rest of the picture decoded flat 128
    assert (y[8:, :] == 128).all() and (y[:8, 8:] == 128).all()


def test_refusals():
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_mpeg1_intra(20, 16, [])
    # non-block-constant content refuses loudly (DC-only fixture class)
    y = bytes(range(256))
    c = bytes([128]) * 64
    with pytest.raises(ValueError, match="non-block-constant"):
        encode_mpeg1_intra(16, 16, [(y, c, c)])
    # a P picture with no preceding reference refuses loudly (r11:
    # P is now decoded, but only after an I establishes the reference)
    bits = _Bits()
    bits.start_code(0xB3)
    bits.w(16, 12); bits.w(16, 12); bits.w(1, 4); bits.w(3, 4)
    bits.w(0x3FFFF, 18); bits.w(1, 1); bits.w(0, 10); bits.w(0, 1)
    bits.w(0, 1); bits.w(0, 1)
    bits.start_code(0x00)
    bits.w(0, 10); bits.w(2, 3)  # P
    bits.w(0xFFFF, 16)
    bits.start_code(0xB7)
    bits.align()
    with pytest.raises(ValueError, match="P picture before"):
        decode_mpeg1_frames(bytes(bits.buf))


def test_custom_intra_matrix_roundtrip():
    """load_intra_quantizer_matrix parses (DC-only content is matrix-
    independent, so the round-trip stays exact)."""
    from rippledb_spark.operators.jpeg import _Z
    from rippledb_spark.operators.mpeg1 import _Bits as B

    w, h = 16, 16
    frames = [_const_planes(w, h, lambda b: 50 + b)]
    es = bytearray(encode_mpeg1_intra(w, h, frames))
    # rewrite the sequence header with load_intra=1 + a custom matrix
    bits = B()
    bits.start_code(0xB3)
    bits.w(w, 12); bits.w(h, 12); bits.w(1, 4); bits.w(3, 4)
    bits.w(0x3FFFF, 18); bits.w(1, 1); bits.w(0, 10); bits.w(0, 1)
    bits.w(1, 1)  # load intra matrix
    for k in range(64):
        bits.w(16 if k else 8, 8)  # zigzag order
    bits.w(0, 1)
    bits.align()
    head = bytes(bits.buf)
    rest = bytes(es[12:])  # original stream after its 12-byte seq header
    v = decode_mpeg1_frames(head + rest)
    assert v["frames"][0] == frames[0]


def test_spark_frame_stats_surface(spark, sf_dir):
    from rippledb_spark.operators import multimodal as MM
    from rippledb_spark.tables import load

    d = load(spark, sf_dir, "documents").filter("doc_id % 4 = 2").limit(6)
    media = MM.synthesize_mpeg1_streams(d, "doc_id")
    stats = MM.mpeg1_frame_pixel_stats(media, every_n=1).collect()
    assert len(stats) > 0
    for r in stats:
        w, h = r["width"], r["height"]
        assert r["n_pixels"] == w * h
        # closed-form y_sum from the fixture arithmetic
        bw, bh = w // 8, h // 8
        want = 64 * sum(
            (43 * r["media_id"] + 19 * r["frame_no"] + 13 * b) % 256
            for b in range(bw * bh)
        )
        assert r["y_sum"] == want


def _bc_plane(w, h, fn):
    bw = w // 8
    return bytes(fn((y // 8) * bw + (x // 8)) % 256
                 for y in range(h) for x in range(w))


def test_p_picture_mc_shift_and_skip_exact():
    """r11: zero-residual P pictures — skip copy, MC shift, chroma
    halving, MV differential wrap — all numerically exact."""
    import numpy as np

    from rippledb_spark.operators.mpeg1 import encode_mpeg1_ip

    w, h = 48, 32
    Y = _bc_plane(w, h, lambda b: 30 + 13 * b)
    Cb = _bc_plane(24, 16, lambda b: 90 + 7 * b)
    Cr = _bc_plane(24, 16, lambda b: 60 + 5 * b)
    mbw = w // 16
    hold = [None] * (mbw * 2)
    shift = [((0, 0) if mx == 0 else (-16, 0))
             for my in range(2) for mx in range(mbw)]
    es = encode_mpeg1_ip(w, h, (Y, Cb, Cr), [hold, shift])
    v = decode_mpeg1_frames(es)
    assert v["n_frames"] == 3
    assert v["frames"][1] == (Y, Cb, Cr)  # all-skip P == reference
    Y2 = np.frombuffer(v["frames"][2][0], dtype=np.uint8).reshape(h, w)
    Y0 = np.frombuffer(Y, dtype=np.uint8).reshape(h, w)
    assert (Y2[:, 16:] == Y0[:, :-16]).all()
    assert (Y2[:, :16] == Y0[:, :16]).all()
    Cb2 = np.frombuffer(v["frames"][2][1], dtype=np.uint8).reshape(16, 24)
    Cb0 = np.frombuffer(Cb, dtype=np.uint8).reshape(16, 24)
    assert (Cb2[:, 8:] == Cb0[:, :-8]).all()


def test_p_picture_refusals():
    from rippledb_spark.operators.mpeg1 import _Bits, encode_mpeg1_ip

    w, h = 32, 32
    Y = _bc_plane(w, h, lambda b: 100)
    C = _bc_plane(16, 16, lambda b: 128)
    # odd vectors refuse at encode (chroma-exact class)
    with pytest.raises(ValueError, match="even"):
        encode_mpeg1_ip(w, h, (Y, C, C), [[(2, 1)] * 4])
    # P before I refuses at decode
    bits = _Bits()
    bits.start_code(0xB3)
    bits.w(w, 12); bits.w(h, 12); bits.w(1, 4); bits.w(3, 4)
    bits.w(0x3FFFF, 18); bits.w(1, 1); bits.w(0, 10); bits.w(0, 1)
    bits.w(0, 1); bits.w(0, 1)
    bits.start_code(0x00)
    bits.w(0, 10); bits.w(2, 3); bits.w(0xFFFF, 16)
    bits.w(1, 1); bits.w(1, 3); bits.w(0, 1)
    bits.start_code(0xB7); bits.align()
    with pytest.raises(ValueError, match="P picture before"):
        decode_mpeg1_frames(bytes(bits.buf))
    # B picture refuses
    bits = _Bits()
    bits.start_code(0xB3)
    bits.w(w, 12); bits.w(h, 12); bits.w(1, 4); bits.w(3, 4)
    bits.w(0x3FFFF, 18); bits.w(1, 1); bits.w(0, 10); bits.w(0, 1)
    bits.w(0, 1); bits.w(0, 1)
    bits.start_code(0x00)
    bits.w(0, 10); bits.w(3, 3); bits.w(0xFFFF, 16)
    bits.start_code(0xB7); bits.align()
    with pytest.raises(ValueError, match="picture type"):
        decode_mpeg1_frames(bytes(bits.buf))


def test_p_residual_dc_and_ac_matches_independent_idct():
    """r12: residual-coded P macroblocks — Table B.3 CBP, the
    dct_coeff_first '1s' short code, escape coding, non-intra dequant
    (trunc-toward-zero + oddification), and IDCT-add onto the MC
    prediction — all against an independent numpy mirror."""
    import numpy as np

    from rippledb_spark.operators.mpeg1 import (
        _Z,
        _dct_matrix,
        _dequant_non_intra,
        encode_mpeg1_ip,
    )

    w, h = 32, 16
    Y = _bc_plane(w, h, lambda b: 100 + 10 * b)
    Cb = _bc_plane(16, 8, lambda b: 90)
    Cr = _bc_plane(16, 8, lambda b: 60)
    # MB0 holds with a DC residual on each luma block; MB1 MC-copies
    # MB0 and carries an AC residual (leading ±1 short code, a mid
    # coefficient, and an out-of-table escape) plus a chroma DC.
    resid0 = {bi: [(0, 3)] for bi in range(4)}
    resid1 = {0: [(0, -1), (5, 4), (20, 47)], 4: [(0, 2)]}
    es = encode_mpeg1_ip(
        w, h, (Y, Cb, Cr), [[(0, 0, resid0), (-16, 0, resid1)]]
    )
    v = decode_mpeg1_frames(es)
    assert v["n_frames"] == 2
    M = _dct_matrix()

    def resid_block(coeffs, q=8):
        F = np.zeros((8, 8))
        for k, lv in coeffs:
            r, c = _Z[k]
            F[r, c] = _dequant_non_intra(lv, q, 16)
        return M.T @ F @ M

    Y0 = np.frombuffer(Y, np.uint8).reshape(h, w).astype(np.float64)
    exp = Y0.copy()
    for by in range(2):
        for bx in range(2):
            exp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] += resid_block([(0, 3)])
    exp[:, 16:32] = Y0[:, 0:16]
    exp[0:8, 16:24] += resid_block([(0, -1), (5, 4), (20, 47)])
    exp = np.clip(np.round(exp), 0, 255)
    Y1 = np.frombuffer(v["frames"][1][0], np.uint8).reshape(h, w)
    assert (Y1 == exp).all()
    Cb0 = np.frombuffer(Cb, np.uint8).reshape(8, 16).astype(np.float64)
    expc = Cb0.copy()
    expc[:, 8:16] = Cb0[:, 0:8]
    expc[0:8, 8:16] += resid_block([(0, 2)])
    expc = np.clip(np.round(expc), 0, 255)
    Cb1 = np.frombuffer(v["frames"][1][1], np.uint8).reshape(8, 16)
    assert (Cb1 == expc).all()
    # Cr untouched by any pattern bit: pure MC copy
    Cr0 = np.frombuffer(Cr, np.uint8).reshape(8, 16)
    Cr1 = np.frombuffer(v["frames"][1][2], np.uint8).reshape(8, 16)
    assert (Cr1[:, 8:] == Cr0[:, :8]).all()


def test_non_intra_dequant_rules():
    """§2.4.4.2 fine print: truncation toward ZERO, oddification
    toward zero, ±2048 clamp, zero passthrough."""
    from rippledb_spark.operators.mpeg1 import _dequant_non_intra

    assert _dequant_non_intra(0, 8, 16) == 0
    # (2·3+1)·8·16/16 = 56 even → 55
    assert _dequant_non_intra(3, 8, 16) == 55
    # negative mirrors: (2·(−3)−1)·8 = −56 → −55
    assert _dequant_non_intra(-3, 8, 16) == -55
    # truncation toward zero: (2·(−1)−1)·3·17/16 = −153/16 → −9 (floor
    # would give −10); odd already
    assert _dequant_non_intra(-1, 3, 17) == -9
    # clamp
    assert _dequant_non_intra(127, 31, 16) == 2047
    assert _dequant_non_intra(-127, 31, 16) == -2048


def test_motion_f_code2_sign_before_residual():
    """ADVICE r11: Table B.4 puts the sign INSIDE the motion_code
    codeword, before the f_size residual. Pin the bit order by hand
    and round-trip an f_code=2 stream whose vectors need residuals."""
    import numpy as np

    from rippledb_spark.operators.mpeg1 import (
        _Bits,
        _decode_motion,
        _encode_motion,
        encode_mpeg1_ip,
    )

    # delta −6 at f_size=1: magnitude code 3 = '00010', then sign 1
    # (negative), THEN the 1-bit residual 1 — mag ((3−1)<<1)+1+1 = 6
    b = _Bits()
    _encode_motion(b, -6, 1)
    b.align()
    s = "".join(format(x, "08b") for x in b.buf)
    assert s.startswith("00010" + "1" + "1")
    b.pos = 0
    assert _decode_motion(b, 1, [0, 0], 0) == -6
    for f_size in (0, 1, 2, 3):
        f = 1 << f_size
        for delta in (-6, 6, -1, 5, 16 * f - 1, -16 * f):
            if not -16 * f <= delta <= 16 * f - 1:
                continue
            b = _Bits()
            _encode_motion(b, delta, f_size)
            b.align()
            b.pos = 0
            assert _decode_motion(b, f_size, [0, 0], 0) == delta
    # full stream at f_code=2 (every coded vector carries a residual)
    w, h = 48, 16
    Y = _bc_plane(w, h, lambda b: 20 + 17 * b)
    C = _bc_plane(24, 8, lambda b: 128)
    mvs = [(0, 0), (-16, 0), (-16, 0)]
    v = decode_mpeg1_frames(encode_mpeg1_ip(w, h, (Y, C, C), [mvs], f_code=2))
    Y0 = np.frombuffer(Y, np.uint8).reshape(h, w)
    Y1 = np.frombuffer(v["frames"][1][0], np.uint8).reshape(h, w)
    assert (Y1[:, 16:] == Y0[:, :-16]).all()
    assert (Y1[:, :16] == Y0[:, :16]).all()


def test_cbp_table_is_prefix_free_and_complete():
    from rippledb_spark.operators.mpeg1 import _CBP_TABLE

    assert sorted(_CBP_TABLE) == list(range(1, 64))
    codes = sorted(_CBP_TABLE.values(), key=len)
    for i, a in enumerate(codes):
        for b in codes[i + 1:]:
            assert not b.startswith(a), (a, b)


def test_intra_refresh_inside_p_picture():
    """An intra macroblock inside a P picture decodes with fresh DC
    predictors while its neighbors skip-copy."""
    import numpy as np

    from rippledb_spark.operators.mpeg1 import (
        _Bits,
        _DC_SIZE_CHROMA,
        _DC_SIZE_LUMA,
        _MBA_TABLE,
        _dc_diff_bits,
        encode_mpeg1_intra,
    )

    w, h = 32, 16
    Y = _bc_plane(w, h, lambda b: 40 + b)
    C = _bc_plane(16, 8, lambda b: 128)
    base = encode_mpeg1_intra(w, h, [(Y, C, C)])
    bits = _Bits(base[:-4])
    # P picture: MB0 intra-refreshed to value 200, MB1 coded (0,0) copy
    bits.start_code(0x00)
    bits.w(1, 10); bits.w(2, 3); bits.w(0xFFFF, 16)
    bits.w(1, 1); bits.w(1, 3); bits.w(0, 1)
    bits.start_code(0x01)
    bits.w(8, 5); bits.w(0, 1)
    bits.wstr(_MBA_TABLE[1])
    bits.wstr("00011")  # intra MB in P
    preds = {"y": 128, "cb": 128, "cr": 128}
    for comp in ("y", "y", "y", "y", "cb", "cr"):
        dc = 200 if comp == "y" else 128
        diff = dc - preds[comp]
        preds[comp] = dc
        size, amp = _dc_diff_bits(diff)
        tab = _DC_SIZE_LUMA if comp == "y" else _DC_SIZE_CHROMA
        bits.wstr(tab[size])
        if size:
            bits.w(amp, size)
        bits.wstr("10")  # EOB
    bits.wstr(_MBA_TABLE[1])
    bits.wstr("001")  # pred-mc, MV (0,0)
    bits.wstr("1"); bits.wstr("1")  # motion codes 0, 0
    bits.start_code(0xB7); bits.align()
    v = decode_mpeg1_frames(bytes(bits.buf))
    Y1 = np.frombuffer(v["frames"][1][0], dtype=np.uint8).reshape(h, w)
    Y0 = np.frombuffer(Y, dtype=np.uint8).reshape(h, w)
    assert (Y1[:, :16] == 200).all()          # refreshed MB
    assert (Y1[:, 16:] == Y0[:, 16:]).all()   # copied MB
