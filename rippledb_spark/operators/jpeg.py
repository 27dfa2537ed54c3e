"""JPEG (ITU-T T.81 / ISO 10918-1, public spec) — dependency-free
(struct + numpy): encoder and decoder pairs for BOTH stream shapes real
web JPEGs use — baseline sequential (SOF0) and progressive (SOF2,
Annex G Huffman: spectral selection + successive approximation; r15,
closing the r14 VERDICT missing #1 — a large share of real web JPEGs
are progressive and previously refused as decode_ok = false, invisible
to both features and dedup).

Scope (the baseline profile):

- markers: SOI, APP0 (JFIF 1.1), DQT (multiple tables), SOF0 (8-bit,
  1 or 3 components, sampling factors), DHT (the Annex K standard
  luminance tables, canonical Annex C code assignment), DRI + RSTn
  restart markers, SOS, EOI; unknown APPn/COM segments are skipped by
  length on decode;
- entropy coding: per-component DC differential categories, AC run/size
  symbols with ZRL (15,0) and EOB (0,0), byte stuffing (FF → FF 00),
  restart-interval predictor resets with byte alignment;
- multi-component interleaved MCUs: grayscale (1×1), YCbCr 4:4:4
  (1×1 chroma beside 1×1 luma), 4:2:2 (2×1 luma), and 4:2:0 (2×2 luma)
  — the overwhelmingly common web layouts; chroma upsampling by
  replication and the JFIF/T.871 YCbCr→RGB conversion live in
  :func:`jpeg_to_rgb`;
- transform: orthonormal 8×8 DCT-II/III as one numpy matrix product per
  component (M·B·Mᵀ over a block stack — no Python pixel loops), level
  shift ±128, edge replication out to MCU coverage, clip and crop on
  decode.

DETERMINISM FOR THE ORACLE: JPEG is lossy, so decoded pixels are not
generally SQL-recomputable — EXCEPT for component planes that are
CONSTANT on each 8×8 block under a quantization table of all ones: a
constant block's AC coefficients are exactly zero and its DC is the
exact integer 8·(v−128), so quantize → entropy → dequantize → IDCT
reproduces v EXACTLY (float error ~1e-13, far inside the final
round-to-int). The registered mjpeg/color queries synthesize exactly
such planes; arbitrary content is covered by pytest round-trip
tolerance tests instead. RGB conversion is NOT part of any oracle (its
half-way rounding is engine-sensitive); oracles certify the decoded
Y/Cb/Cr planes.

Progressive additions (r15): SOF2 marker walk over MULTIPLE scans; DC
first/refine scans (interleaved or single-component; the DC point
transform is an arithmetic shift, so refinement bit-ORs reconstruct
negative coefficients exactly); single-component AC first/refine scans
over any spectral band with EOBn block runs (G.1.2.2-3, the
libjpeg-structured correction-bit walk); DRI/RSTn inside any scan.
The progressive ENCODER transmits the same quantized coefficients as
the baseline one under the standard six-scan script, so progressive
and baseline encodes of one pixel field decode BIT-IDENTICALLY — for
any content, which pytest pins, and in particular for the
block-constant oracle class above. Its AC scans ship a deliberately
flat fixed Huffman table (PROG_AC_BITS) the way the GIF encoder ships
fixed-width LZW: deterministic and conforming over optimal.

Arithmetic coding, hierarchical mode, 12-bit precision, and sampling
factors above 2 remain out of scope — decode refuses them loudly.
"""

from __future__ import annotations

import struct

# --- Annex K standard luminance Huffman tables (public spec) ---------------

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALUES = list(range(12))

AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALUES = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# zigzag scan order: _Z[k] = (row, col) of the k-th coefficient
_Z = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
_Z_ROWS = [r for r, _ in _Z]
_Z_COLS = [c for _, c in _Z]


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C canonical code assignment → {symbol: (code, length)}."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_VALUES)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALUES)


class _HuffTable:
    """One decoded DHT: a 16-bit flat LUT (symbol, code length) for the
    fast path plus the {(length, code): symbol} dict the bit-serial
    fallback walks — so malformed scans raise the identical errors
    (r16, guide §4.2: the per-bit walk was the decode's hot loop)."""

    __slots__ = ("dec", "lut")

    def __init__(self, dec: dict[tuple[int, int], int]):
        self.dec = dec
        lut: list = [None] * (1 << 16)
        for (ln, code), sym in dec.items():
            base = code << (16 - ln)
            for i in range(1 << (16 - ln)):
                lut[base + i] = (sym, ln)
        self.lut = lut


_HUFF_CACHE: dict[tuple, _HuffTable] = {}


def _decode_table(bits: list[int], values: list[int]) -> _HuffTable:
    """DHT spec → :class:`_HuffTable`, memoized on the table bytes (the
    fixture corpus reuses the Annex K pair on every image, so the LUT
    builds once per worker, not once per payload)."""
    key = (tuple(bits), tuple(values))
    tbl = _HUFF_CACHE.get(key)
    if tbl is None:
        tbl = _HUFF_CACHE[key] = _HuffTable(
            {
                (ln, c): sym
                for sym, (c, ln) in _canonical_codes(bits, values).items()
            }
        )
    return tbl


_DCT_M = None


def _dct_matrix():
    import numpy as np

    global _DCT_M
    if _DCT_M is None:
        x = np.arange(8)
        u = x.reshape(-1, 1)
        M = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        M[0] /= np.sqrt(2.0)
        M.setflags(write=False)  # shared instance — callers only read
        _DCT_M = M
    return _DCT_M


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """1-pad to a byte boundary (before RSTn / EOI, per F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def marker(self, lo: int) -> None:
        self.align()
        self.out += bytes((0xFF, lo))  # markers are never stuffed

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG after FF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def _fill_soft(self) -> bool:
        """Pull one more entropy byte into the accumulator if one is
        available BEFORE the next marker / end of data; never raises and
        never consumes a marker (peeks for the LUT fast path only —
        consuming reads keep :meth:`_fill`'s error semantics)."""
        pos = self.pos
        data = self.data
        if pos >= len(data):
            return False
        b = data[pos]
        if b == 0xFF:
            if pos + 1 >= len(data) or data[pos + 1] != 0x00:
                return False
            self.pos = pos + 2  # unstuff
        else:
            self.pos = pos + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        nb = self.nbits - n
        v = (self.acc >> nb) & ((1 << n) - 1)
        self.nbits = nb
        self.acc &= (1 << nb) - 1
        return v

    def huff(self, table: "_HuffTable") -> int:
        nb = self.nbits
        while nb < 16 and self._fill_soft():
            nb = self.nbits
        idx = (
            (self.acc << (16 - nb)) & 0xFFFF
            if nb < 16
            else (self.acc >> (nb - 16)) & 0xFFFF
        )
        ent = table.lut[idx]
        if ent is not None:
            sym, ln = ent
            if ln <= nb:
                nb -= ln
                self.nbits = nb
                self.acc &= (1 << nb) - 1
                return sym
        # serial fallback: identical error behavior on malformed scans
        dec = table.dec
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = dec.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker (F.2.2.5)."""
        self.acc = 0
        self.nbits = 0  # discard the 1-padding of the finished interval
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated JPEG at restart boundary")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + n:
            raise ValueError(
                f"expected RST{n} at {self.pos}, got "
                f"{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2


def _category(v: int) -> int:
    return 0 if v == 0 else v.bit_length() if v > 0 else (-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    # negative amplitudes use the one's-complement convention (T.81 F.1.4)
    return v if v >= 0 else v + (1 << size) - 1


def _plane_qblocks(plane, pw: int, ph: int, cover_x: int, cover_y: int, Q):
    """Plane bytes → quantized DCT blocks (cover_y, cover_x, 8, 8): pad by
    edge replication out to the MCU coverage grid, one matrix-product DCT
    over the whole block stack."""
    import numpy as np

    a = np.frombuffer(plane, dtype=np.uint8).reshape(ph, pw)
    if cover_y * 8 == ph and cover_x * 8 == pw:
        padded = a  # already MCU-aligned — skip the no-op pad
    else:
        padded = np.pad(
            a, ((0, cover_y * 8 - ph), (0, cover_x * 8 - pw)), mode="edge"
        )
    blocks = (
        padded.reshape(cover_y, 8, cover_x, 8)
        .transpose(0, 2, 1, 3)
        .astype(np.float64)
        - 128.0
    )
    M = _dct_matrix()
    coefs = np.einsum("ux,ijxy,vy->ijuv", M, blocks, M)
    return np.round(coefs / Q).astype(np.int64)


def _encode_block(w: "_BitWriter", zz, prev_dc: int) -> int:
    dc = int(zz[0])
    diff = dc - prev_dc
    size = _category(diff)
    code, ln = _DC_ENC[size]
    w.write(code, ln)
    if size:
        w.write(_amplitude(diff, size), size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l2 = _AC_ENC[0xF0]  # ZRL
            w.write(c, l2)
            run -= 16
        size = _category(v)
        c, l2 = _AC_ENC[(run << 4) | size]
        w.write(c, l2)
        w.write(_amplitude(v, size), size)
        run = 0
    if last_nz < 63:
        c, l2 = _AC_ENC[0x00]  # EOB
        w.write(c, l2)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _zz_table(q: list[int]) -> bytes:
    return bytes(q[r * 8 + c] for r, c in _Z)


def _headers(width: int, height: int, comps, qtabs: list[list[int]],
             restart_interval: int) -> bytes:
    """comps: list of (component id, h, v, tq)."""
    out = b"\xff\xd8"
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qtabs):
        out += _seg(0xFFDB, bytes([tq]) + _zz_table(q))
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v, tq in comps:
        sof += bytes((cid, (h << 4) | v, tq))
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALUES))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALUES))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, _, _ in comps:
        sos += bytes((cid, 0x00))  # DC table 0, AC table 0 for every comp
    out += _seg(0xFFDA, sos + b"\x00\x3f\x00")
    return out


def _encode_scan(qblocks_per_comp, samplings, mcus_x: int, mcus_y: int,
                 restart_interval: int) -> bytes:
    w = _BitWriter()
    prev = [0] * len(qblocks_per_comp)
    rst = 0
    since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                w.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                prev = [0] * len(qblocks_per_comp)
                since_restart = 0
            for ci, (qb, (h, v)) in enumerate(
                zip(qblocks_per_comp, samplings)
            ):
                for by in range(v):
                    for bx in range(h):
                        blk = qb[my * v + by, mx * h + bx]
                        prev[ci] = _encode_block(
                            w, blk[_Z_ROWS, _Z_COLS].tolist(), prev[ci]
                        )
            since_restart += 1
    return w.flush()


def encode_jpeg_gray(width: int, height: int, pixels: bytes,
                     quant: list[int] | None = None,
                     restart_interval: int = 0) -> bytes:
    """8-bit grayscale row-major pixels → baseline JFIF bytes. ``quant``
    is the 64-entry quantization table in NATURAL (row-major) order;
    default all ones (numerically lossless for block-constant content,
    see module docstring). ``restart_interval`` emits DRI + RSTn every
    that many MCUs (0 = none)."""
    import numpy as np

    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("dimensions out of JPEG range")
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or any(not (1 <= v <= 255) for v in q):
        raise ValueError("quant table must be 64 values in 1..255")
    mcus_x, mcus_y = -(-width // 8), -(-height // 8)
    Q = np.array(q, dtype=np.float64).reshape(8, 8)
    qb = _plane_qblocks(pixels, width, height, mcus_x, mcus_y, Q)
    scan = _encode_scan([qb], [(1, 1)], mcus_x, mcus_y, restart_interval)
    return (
        _headers(width, height, [(1, 1, 1, 0)], [q], restart_interval)
        + scan
        + b"\xff\xd9"
    )


def encode_jpeg_color(
    width: int,
    height: int,
    y: bytes,
    cb: bytes,
    cr: bytes,
    sampling: tuple[int, int] = (2, 2),
    quant_y: list[int] | None = None,
    quant_c: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """YCbCr planes → baseline JFIF bytes. ``sampling`` is the LUMA
    (H, V) factor pair — (1,1) = 4:4:4, (2,1) = 4:2:2, (2,2) = 4:2:0;
    chroma is always 1×1, so ``cb``/``cr`` are ceil(width/H) ×
    ceil(height/V) planes (the caller supplies already-subsampled
    chroma — how to downsample is an editorial choice the codec does
    not make). Quant table 0 serves luma, table 1 chroma; both default
    to all ones."""
    import numpy as np

    hy, vy = sampling
    if (hy, vy) not in ((1, 1), (2, 1), (2, 2)):
        raise ValueError("sampling must be (1,1), (2,1) or (2,2)")
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("dimensions out of JPEG range")
    cw, ch = -(-width // hy), -(-height // vy)
    if len(y) != width * height:
        raise ValueError("luma plane does not match dimensions")
    if len(cb) != cw * ch or len(cr) != cw * ch:
        raise ValueError(f"chroma planes must be {cw}x{ch} for {hy}x{vy}")
    qy = list(quant_y) if quant_y is not None else [1] * 64
    qc = list(quant_c) if quant_c is not None else [1] * 64
    for q in (qy, qc):
        if len(q) != 64 or any(not (1 <= v <= 255) for v in q):
            raise ValueError("quant tables must be 64 values in 1..255")
    mcus_x = -(-width // (8 * hy))
    mcus_y = -(-height // (8 * vy))
    QY = np.array(qy, dtype=np.float64).reshape(8, 8)
    QC = np.array(qc, dtype=np.float64).reshape(8, 8)
    qb_y = _plane_qblocks(y, width, height, mcus_x * hy, mcus_y * vy, QY)
    qb_cb = _plane_qblocks(cb, cw, ch, mcus_x, mcus_y, QC)
    qb_cr = _plane_qblocks(cr, cw, ch, mcus_x, mcus_y, QC)
    scan = _encode_scan(
        [qb_y, qb_cb, qb_cr],
        [(hy, vy), (1, 1), (1, 1)],
        mcus_x,
        mcus_y,
        restart_interval,
    )
    comps = [(1, hy, vy, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    return (
        _headers(width, height, comps, [qy, qc], restart_interval)
        + scan
        + b"\xff\xd9"
    )


def _find_scan_end(payload: bytes, start: int) -> int:
    """First position ≥ start holding a marker that ENDS entropy data —
    any FF xx with xx not in {00 (stuffing), D0-D7 (restarts)}. T.81
    B.1.1.5: entropy segments contain no other markers."""
    pos = start
    n = len(payload)
    while True:
        pos = payload.find(b"\xff", pos)
        if pos < 0 or pos + 1 >= n:
            raise ValueError(
                "truncated JPEG: entropy data missing terminating marker"
            )
        nxt = payload[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
            continue
        return pos


def _decode_scan_baseline(r, order, huff, coefs, mcus_x, mcus_y,
                          restart_interval):
    """The sequential interleaved scan (SOF0): every component's full
    zigzag per MCU, DC differentials + AC run/size, restart resets."""
    prev = [0] * len(order)
    rst = 0
    since_restart = 0

    def receive_extend(size: int) -> int:
        if size == 0:
            return 0
        raw = r.bits(size)
        return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                r.restart(rst)
                rst = (rst + 1) & 7
                prev = [0] * len(order)
                since_restart = 0
            for ci, (cid, h, v, tq, td, ta) in enumerate(order):
                dc_tbl, ac_tbl = huff[(0, td)], huff[(1, ta)]
                for by in range(v):
                    for bx in range(h):
                        # each block is visited exactly once and coefs
                        # start zeroed, so only nonzero coefficients
                        # need writing (r16 — replaces the full 64-slot
                        # zigzag scatter per block)
                        blk = coefs[ci][my * v + by, mx * h + bx]
                        size = r.huff(dc_tbl)
                        prev[ci] += receive_extend(size)
                        blk[0, 0] = prev[ci]
                        k = 1
                        while k < 64:
                            sym = r.huff(ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError(
                                        f"invalid AC symbol {sym:02X}"
                                    )
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[_Z[k]] = receive_extend(size)
                            k += 1
            since_restart += 1


def _decode_scan_progressive_dc(r, scan, huff, coefs, comp_blocks,
                                mcus_x, mcus_y, restart_interval, Ah, Al):
    """Progressive DC scan (T.81 G.2): Ah == 0 sends the point-
    transformed DC differentials (arithmetic shift, so refinement
    bit-ORs reconstruct negatives exactly); Ah > 0 sends one raw bit
    per block — bit Al of the coefficient. Interleaved over MCUs when
    the scan names several components, else over the one component's
    own block grid."""

    def receive_extend(size: int) -> int:
        if size == 0:
            return 0
        raw = r.bits(size)
        return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1

    prev = [0] * len(scan)
    rst = 0
    since_restart = 0

    def one_block(si: int, by: int, bx: int) -> None:
        ci, td, _ta = scan[si]
        blk = coefs[ci]
        if by >= blk.shape[0] or bx >= blk.shape[1]:
            return  # MCU padding outside the component grid
        if Ah == 0:
            size = r.huff(huff[(0, td)])
            prev[si] += receive_extend(size)
            blk[by, bx, 0, 0] = prev[si] << Al
        else:
            if r.bit():
                blk[by, bx, 0, 0] |= 1 << Al

    if len(scan) > 1:
        samplings = [
            (coefs[ci].shape[1] // mcus_x, coefs[ci].shape[0] // mcus_y)
            for ci, _, _ in scan
        ]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and since_restart == restart_interval:
                    r.restart(rst)
                    rst = (rst + 1) & 7
                    prev = [0] * len(scan)
                    since_restart = 0
                for si, (h, v) in enumerate(samplings):
                    for by in range(v):
                        for bx in range(h):
                            one_block(si, my * v + by, mx * h + bx)
                since_restart += 1
    else:
        bw, bh = comp_blocks[scan[0][0]]
        for byx in range(bw * bh):
            if restart_interval and since_restart == restart_interval:
                r.restart(rst)
                rst = (rst + 1) & 7
                prev = [0] * len(scan)
                since_restart = 0
            one_block(0, byx // bw, byx % bw)
            since_restart += 1


def _decode_scan_progressive_ac(r, scan, huff, coefs, comp_blocks,
                                restart_interval, Ss, Se, Ah, Al):
    """Progressive AC scan (T.81 G.2, single component by G.1.1.1.1):
    Ah == 0 is the FIRST pass over the band — run/size symbols on the
    point-transformed values, EOBn codes spanning 2^n + extra whole
    blocks; Ah > 0 is the REFINEMENT pass — newly-significant ±1·2^Al
    coefficients threaded through runs of zero-history positions, with
    one correction bit for every nonzero-history position passed (the
    libjpeg-structured walk of G.1.2.3)."""
    ci, _td, ta = scan[0]
    ac_tbl = huff[(1, ta)]
    blk3 = coefs[ci]
    bw, bh = comp_blocks[ci]
    eobrun = 0
    rst = 0
    since_restart = 0
    p1, m1 = 1 << Al, -(1 << Al)

    def receive_extend(size: int) -> int:
        raw = r.bits(size)
        return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1

    for byx in range(bw * bh):
        if restart_interval and since_restart == restart_interval:
            r.restart(rst)
            rst = (rst + 1) & 7
            eobrun = 0
            since_restart = 0
        since_restart += 1
        blk = blk3[byx // bw, byx % bw]
        if Ah == 0:
            if eobrun:
                eobrun -= 1
                continue
            k = Ss
            while k <= Se:
                sym = r.huff(ac_tbl)
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += r.bits(run)
                    break
                k += run
                if k > Se:
                    raise ValueError("AC run past the scan's spectral band")
                blk[_Z[k]] = receive_extend(size) << Al
                k += 1
        else:
            # refinement walks read every band position repeatedly —
            # do it over a plain-int zigzag copy and write back only the
            # changed positions (r16; values and order identical)
            zzl = blk[_Z_ROWS, _Z_COLS].tolist()
            changed: list[int] = []
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    sym = r.huff(ac_tbl)
                    run, size = sym >> 4, sym & 0xF
                    newval = 0
                    if size == 0:
                        if run != 15:  # EOBn: run of whole blocks
                            eobrun = 1 << run
                            if run:
                                eobrun += r.bits(run)
                            break
                        # ZRL: skip 16 zero-history positions
                    elif size == 1:
                        newval = p1 if r.bit() else m1
                    else:
                        raise ValueError(
                            "AC refinement symbol with size > 1"
                        )
                    while k <= Se:
                        v = zzl[k]
                        if v:
                            # correction bit for an already-nonzero coef
                            if r.bit() and not (v & p1):
                                zzl[k] = v + (p1 if v > 0 else m1)
                                changed.append(k)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if newval and k <= Se:
                        zzl[k] = newval
                        changed.append(k)
                    k += 1
            if eobrun:
                # remainder of the band: correction bits only
                while k <= Se:
                    v = zzl[k]
                    if v:
                        if r.bit() and not (v & p1):
                            zzl[k] = v + (p1 if v > 0 else m1)
                            changed.append(k)
                    k += 1
                eobrun -= 1
            for kc in changed:
                blk[_Z[kc]] = zzl[kc]


# --- progressive encoding (T.81 Annex G, Huffman) ---------------------------

# The Annex K AC table carries no EOBn symbols beyond EOB0, so
# progressive scans ship their OWN AC table: every symbol a progressive
# AC scan can emit — EOBn (n ≤ 14), ZRL, and (run, size ≤ 10) — as a
# FLAT canonical 8-bit code (176 symbols < 255, Kraft-valid, the
# all-ones code unused as T.81 C.2 requires). Deliberately
# compression-suboptimal and deterministic, the fixed-width-LZW trick
# of the GIF encoder applied to Huffman: any conforming decoder
# accepts it, and no frequency pass can perturb the bytes.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALUES = [
    (run << 4) | size for run in range(16) for size in range(11)
]

_PROG_AC_ENC = _canonical_codes(PROG_AC_BITS, PROG_AC_VALUES)


def _sos_header(comps: list[tuple[int, int, int]], Ss: int, Se: int,
                Ah: int, Al: int) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes((cid, (td << 4) | ta))
    return _seg(0xFFDA, body + bytes((Ss, Se, (Ah << 4) | Al)))


def _emit_eobrun(w: "_BitWriter", eobrun: int, buffered: list[int]) -> int:
    """Flush a pending EOBn run (category-coded length + extra bits) and
    the correction bits buffered behind it (G.1.2.3's BE mechanism).
    Returns 0 (the new run length)."""
    if eobrun > 0:
        cat = eobrun.bit_length() - 1
        code, ln = _PROG_AC_ENC[cat << 4]
        w.write(code, ln)
        if cat:
            w.write(eobrun - (1 << cat), cat)
        for b in buffered:
            w.write(b, 1)
        buffered.clear()
    return 0


def _enc_scan_dc_first(w: "_BitWriter", qbs, samplings, mcus_x: int,
                       mcus_y: int, Al: int, ri: int = 0) -> None:
    prev = [0] * len(qbs)
    rst = since = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and since == ri:
                w.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                prev = [0] * len(qbs)
                since = 0
            since += 1
            for ci, (qb, (h, v)) in enumerate(zip(qbs, samplings)):
                for by in range(v):
                    for bx in range(h):
                        dc = int(qb[my * v + by, mx * h + bx, 0, 0]) >> Al
                        diff = dc - prev[ci]
                        prev[ci] = dc
                        size = _category(diff)
                        code, ln = _DC_ENC[size]
                        w.write(code, ln)
                        if size:
                            w.write(_amplitude(diff, size), size)


def _enc_scan_dc_refine(w: "_BitWriter", qbs, samplings, mcus_x: int,
                        mcus_y: int, Al: int, ri: int = 0) -> None:
    rst = since = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and since == ri:
                w.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                since = 0
            since += 1
            for qb, (h, v) in zip(qbs, samplings):
                for by in range(v):
                    for bx in range(h):
                        w.write((int(qb[my * v + by, mx * h + bx, 0, 0])
                                 >> Al) & 1, 1)


def _enc_scan_ac_first(w: "_BitWriter", qb, bw: int, bh: int, Ss: int,
                       Se: int, Al: int, ri: int = 0) -> None:
    eobrun = 0
    rst = since = 0
    for byx in range(bw * bh):
        if ri and since == ri:
            eobrun = _emit_eobrun(w, eobrun, [])
            w.marker(0xD0 + rst)
            rst = (rst + 1) & 7
            since = 0
        since += 1
        zzl = qb[byx // bw, byx % bw][_Z_ROWS, _Z_COLS].tolist()
        t = []
        for k in range(Ss, Se + 1):
            v = zzl[k]
            # AC point transform divides TOWARD ZERO (G.1.2.2) — unlike
            # the DC arithmetic shift
            t.append(v // (1 << Al) if v >= 0 else -((-v) >> Al))
        nz = [i for i, v in enumerate(t) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(w, eobrun, [])
            continue
        eobrun = _emit_eobrun(w, eobrun, [])
        run = 0
        for i in range(nz[-1] + 1):
            v = t[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _PROG_AC_ENC[0xF0]  # ZRL
                w.write(code, ln)
                run -= 16
            size = _category(v)
            code, ln = _PROG_AC_ENC[(run << 4) | size]
            w.write(code, ln)
            w.write(_amplitude(v, size), size)
            run = 0
        if nz[-1] < Se - Ss:
            eobrun += 1
    _emit_eobrun(w, eobrun, [])


def _enc_scan_ac_refine(w: "_BitWriter", qb, bw: int, bh: int, Ss: int,
                        Se: int, Al: int, ri: int = 0) -> None:
    """G.1.2.3: newly-significant ±1·2^Al coefficients threaded through
    zero-history runs, correction bits for already-significant positions
    buffered behind the code that closes them (BR within a block, BE
    behind a pending EOB run)."""
    eobrun = 0
    be: list[int] = []  # correction bits buffered behind the EOB run
    rst = since = 0
    for byx in range(bw * bh):
        if ri and since == ri:
            eobrun = _emit_eobrun(w, eobrun, be)
            w.marker(0xD0 + rst)
            rst = (rst + 1) & 7
            since = 0
        since += 1
        zzl = qb[byx // bw, byx % bw][_Z_ROWS, _Z_COLS].tolist()
        t = [abs(zzl[k]) >> Al for k in range(Ss, Se + 1)]
        signs = [zzl[k] < 0 for k in range(Ss, Se + 1)]
        eob = -1  # last newly-significant position
        for i, v in enumerate(t):
            if v == 1:
                eob = i
        run = 0
        br: list[int] = []  # correction bits since the last emitted code
        for i in range(eob + 1):
            v = t[i]
            if v == 0:
                run += 1
                continue
            if v > 1:
                br.append(v & 1)
                continue
            # newly significant (v == 1)
            while run > 15:
                eobrun = _emit_eobrun(w, eobrun, be)
                code, ln = _PROG_AC_ENC[0xF0]
                w.write(code, ln)
                run -= 16
                for b in br:
                    w.write(b, 1)
                br.clear()
            eobrun = _emit_eobrun(w, eobrun, be)
            code, ln = _PROG_AC_ENC[(run << 4) | 1]
            w.write(code, ln)
            w.write(0 if signs[i] else 1, 1)
            for b in br:
                w.write(b, 1)
            br.clear()
            run = 0
        # tail: zero-history runs and correction bits beyond the last
        # newly-significant coefficient ride the EOB run
        tail = [v & 1 for v in t[eob + 1 :] if v > 1]
        if run > 0 or tail or eob + 1 <= Se - Ss:
            eobrun += 1
            be.extend(tail)
            if eobrun == 0x7FFF or len(be) > 900:
                eobrun = _emit_eobrun(w, eobrun, be)
    _emit_eobrun(w, eobrun, be)


def _progressive_tail(qbs, samplings, comp_ids, quant_ids, mcus_x: int,
                      mcus_y: int, comp_blocks, ri: int = 0) -> bytes:
    """The standard grayscale/color progressive scan script over
    already-quantized blocks: DC first (Al=1, interleaved) → DC refine →
    per-component AC first in two spectral bands (Al=1) → per-component
    AC refine over 1..63 — all four Annex G scan types on the wire."""
    out = b""
    w = _BitWriter()
    _enc_scan_dc_first(w, qbs, samplings, mcus_x, mcus_y, 1, ri)
    out += _sos_header([(cid, 0, 0) for cid in comp_ids], 0, 0, 0, 1)
    out += w.flush()
    w = _BitWriter()
    _enc_scan_dc_refine(w, qbs, samplings, mcus_x, mcus_y, 0, ri)
    out += _sos_header([(cid, 0, 0) for cid in comp_ids], 0, 0, 1, 0)
    out += w.flush()
    for ci, cid in enumerate(comp_ids):
        bw_, bh_ = comp_blocks[ci]
        for (ss, se) in ((1, 5), (6, 63)):
            w = _BitWriter()
            _enc_scan_ac_first(w, qbs[ci], bw_, bh_, ss, se, 1, ri)
            out += _sos_header([(cid, 0, 1)], ss, se, 0, 1)
            out += w.flush()
    for ci, cid in enumerate(comp_ids):
        bw_, bh_ = comp_blocks[ci]
        w = _BitWriter()
        _enc_scan_ac_refine(w, qbs[ci], bw_, bh_, 1, 63, 0, ri)
        out += _sos_header([(cid, 0, 1)], 1, 63, 1, 0)
        out += w.flush()
    return out


def _progressive_headers(width: int, height: int, comps,
                         qtabs: list[list[int]]) -> bytes:
    """SOI + JFIF + DQT + SOF2 + the Annex K DHT pair (scans follow)."""
    out = b"\xff\xd8"
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qtabs):
        out += _seg(0xFFDB, bytes([tq]) + _zz_table(q))
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, h, v, tq in comps:
        sof += bytes((cid, (h << 4) | v, tq))
    out += _seg(0xFFC2, sof)
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALUES))
    out += _seg(0xFFC4, b"\x11" + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALUES))
    return out


def encode_jpeg_gray_progressive(width: int, height: int, pixels: bytes,
                                 quant: list[int] | None = None,
                                 restart_interval: int = 0) -> bytes:
    """8-bit grayscale pixels → PROGRESSIVE JFIF bytes (SOF2) under the
    standard six-scan script (DC first/refine + two AC spectral bands,
    first then refine — all four Annex G scan types). Same quantized
    coefficients as :func:`encode_jpeg_gray`, transmitted progressively
    — so with the default all-ones table on block-constant content the
    decoded pixels are bit-identical to the baseline encode's (the
    oracle-exactness class of the module docstring)."""
    import numpy as np

    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("dimensions out of JPEG range")
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or any(not (1 <= v <= 255) for v in q):
        raise ValueError("quant table must be 64 values in 1..255")
    mcus_x, mcus_y = -(-width // 8), -(-height // 8)
    Q = np.array(q, dtype=np.float64).reshape(8, 8)
    qb = _plane_qblocks(pixels, width, height, mcus_x, mcus_y, Q)
    hdr = _progressive_headers(width, height, [(1, 1, 1, 0)], [q])
    if restart_interval:
        hdr += _seg(0xFFDD, struct.pack(">H", restart_interval))
    return (
        hdr
        + _progressive_tail(
            [qb], [(1, 1)], [1], [0], mcus_x, mcus_y,
            [(mcus_x, mcus_y)], restart_interval,
        )
        + b"\xff\xd9"
    )


def encode_jpeg_color_progressive(
    width: int,
    height: int,
    y: bytes,
    cb: bytes,
    cr: bytes,
    sampling: tuple[int, int] = (2, 2),
    quant_y: list[int] | None = None,
    quant_c: list[int] | None = None,
) -> bytes:
    """YCbCr planes → PROGRESSIVE JFIF bytes (SOF2) — the interleaved-DC
    + per-component-AC scan script over the same subsampled layouts as
    :func:`encode_jpeg_color` (4:4:4 / 4:2:2 / 4:2:0)."""
    import numpy as np

    hy, vy = sampling
    if (hy, vy) not in ((1, 1), (2, 1), (2, 2)):
        raise ValueError("sampling must be (1,1), (2,1) or (2,2)")
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("dimensions out of JPEG range")
    cw, ch = -(-width // hy), -(-height // vy)
    if len(y) != width * height:
        raise ValueError("luma plane does not match dimensions")
    if len(cb) != cw * ch or len(cr) != cw * ch:
        raise ValueError(f"chroma planes must be {cw}x{ch} for {hy}x{vy}")
    qy = list(quant_y) if quant_y is not None else [1] * 64
    qc = list(quant_c) if quant_c is not None else [1] * 64
    for q in (qy, qc):
        if len(q) != 64 or any(not (1 <= v <= 255) for v in q):
            raise ValueError("quant tables must be 64 values in 1..255")
    mcus_x = -(-width // (8 * hy))
    mcus_y = -(-height // (8 * vy))
    QY = np.array(qy, dtype=np.float64).reshape(8, 8)
    QC = np.array(qc, dtype=np.float64).reshape(8, 8)
    qb_y = _plane_qblocks(y, width, height, mcus_x * hy, mcus_y * vy, QY)
    qb_cb = _plane_qblocks(cb, cw, ch, mcus_x, mcus_y, QC)
    qb_cr = _plane_qblocks(cr, cw, ch, mcus_x, mcus_y, QC)
    comp_blocks = [
        (-(-width // 8), -(-height // 8)),
        (-(-cw // 8), -(-ch // 8)),
        (-(-cw // 8), -(-ch // 8)),
    ]
    return (
        _progressive_headers(
            width, height, [(1, hy, vy, 0), (2, 1, 1, 1), (3, 1, 1, 1)],
            [qy, qc],
        )
        + _progressive_tail(
            [qb_y, qb_cb, qb_cr], [(hy, vy), (1, 1), (1, 1)],
            [1, 2, 3], [0, 1, 1], mcus_x, mcus_y, comp_blocks,
        )
        + b"\xff\xd9"
    )


def decode_jpeg_planes(payload: bytes) -> dict:
    """JFIF bytes → {width, height, components: [{id, h, v, width,
    height, plane}]} with each component's plane decoded at ITS OWN
    resolution (ceil(width·h/hmax) × ceil(height·v/vmax)) — the full
    entropy + dequantize + IDCT path, restart markers included, NO
    upsampling or color conversion (see jpeg_to_rgb).

    Decodes BOTH stream shapes real web JPEGs use: baseline sequential
    (SOF0, one interleaved scan) and PROGRESSIVE (SOF2 — r15, closing
    the r14 VERDICT missing #1: a large share of real web JPEGs are
    progressive and previously refused): spectral selection and
    successive approximation in any spec-legal scan script — DC
    first/refine (interleaved or not), per-component AC first/refine
    with EOBn runs, DRI/RSTn inside any scan. Raises ValueError on
    structural violations or on modes outside these two (arithmetic
    coding, hierarchical, 12-bit)."""
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    mode = None  # 0xC0 baseline | 0xC2 progressive
    sof_comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    restart_interval = 0
    coefs: list = []
    comp_blocks: list[tuple[int, int]] = []  # per component (bw, bh)
    mcus_x = mcus_y = 0
    hmax = vmax = 1
    n_scans = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {payload[pos]:02X}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables are not supported")
                zz = list(body[at + 1 : at + 65])
                tbl = [0] * 64
                for k, (rr, cc) in enumerate(_Z):
                    tbl[rr * 8 + cc] = zz[k]
                quant[tq] = tbl
                at += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0xF
                bits = list(body[at + 1 : at + 17])
                nv = sum(bits)
                values = list(body[at + 17 : at + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, values)
                at += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline | SOF2 progressive
            mode = marker
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG is not supported")
            if ncomp not in (1, 3):
                raise ValueError(
                    f"{ncomp}-component JPEG: grayscale and YCbCr only"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF component list")
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                h, v = hv >> 4, hv & 0xF
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise ValueError(
                        f"sampling factor {h}x{v} out of the supported 1..2"
                    )
                sof_comps.append((cid, h, v, tq))
            hmax = max(h for _, h, _, _ in sof_comps)
            vmax = max(v for _, _, v, _ in sof_comps)
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            coefs = [
                np.zeros((mcus_y * v, mcus_x * h, 8, 8), dtype=np.int64)
                for _, h, v, _ in sof_comps
            ]
            comp_blocks = [
                (
                    -(-(-(-width * h // hmax)) // 8),
                    -(-(-(-height * v // vmax)) // 8),
                )
                for _, h, v, _ in sof_comps
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline (SOF0) and progressive "
                "(SOF2) JPEG are supported"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — decode the scan, then keep walking
            if mode is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated JPEG SOS header")
            by_id = {cid: i for i, (cid, _, _, _) in enumerate(sof_comps)}
            scan: list[tuple[int, int, int]] = []  # (comp index, td, ta)
            for ci in range(ns):
                cid, tables = body[1 + 2 * ci : 3 + 2 * ci]
                if cid not in by_id:
                    raise ValueError(f"SOS names unknown component {cid}")
                scan.append((by_id[cid], tables >> 4, tables & 0xF))
            Ss, Se, AhAl = body[1 + 2 * ns : 4 + 2 * ns]
            Ah, Al = AhAl >> 4, AhAl & 0xF
            scan_at = pos + 2 + seglen
            scan_end = _find_scan_end(payload, scan_at)
            r = _BitReader(payload[:scan_end], scan_at)
            if mode == 0xC0:
                if (Ss, Se, Ah, Al) != (0, 63, 0, 0):
                    raise ValueError("baseline scan with progressive params")
                if ns != len(sof_comps):
                    raise ValueError(
                        "partial-scan JPEG (SOS components != SOF "
                        "components) is not baseline-interleaved"
                    )
                order = []
                for idx, td, ta in scan:
                    cid, h, v, tq = sof_comps[idx]
                    if (
                        tq not in quant
                        or (0, td) not in huff
                        or (1, ta) not in huff
                    ):
                        raise ValueError(
                            "JPEG scan references missing DQT/DHT tables"
                        )
                    order.append((cid, h, v, tq, td, ta))
                _decode_scan_baseline(
                    r, order, huff, coefs, mcus_x, mcus_y, restart_interval
                )
            else:  # progressive
                if Ss == 0:
                    if Se != 0:
                        raise ValueError(
                            "progressive scan mixes DC and AC (Ss=0, Se>0)"
                        )
                    if Ah == 0:
                        for _idx, td, _ta in scan:
                            if (0, td) not in huff:
                                raise ValueError(
                                    "DC scan references a missing DHT table"
                                )
                    _decode_scan_progressive_dc(
                        r, scan, huff, coefs, comp_blocks, mcus_x, mcus_y,
                        restart_interval, Ah, Al,
                    )
                else:
                    if ns != 1:
                        raise ValueError(
                            "progressive AC scan must be single-component"
                        )
                    if not Ss <= Se <= 63:
                        raise ValueError("bad spectral band in AC scan")
                    if (1, scan[0][2]) not in huff:
                        raise ValueError(
                            "AC scan references a missing DHT table"
                        )
                    _decode_scan_progressive_ac(
                        r, scan, huff, coefs, comp_blocks,
                        restart_interval, Ss, Se, Ah, Al,
                    )
            n_scans += 1
            pos = scan_end
            continue
        # APPn / COM / others: skipped by length
        pos += 2 + seglen
    if width is None or not n_scans:
        raise ValueError("JPEG missing SOF/SOS")

    M = _dct_matrix()
    components = []
    for ci, (cid, h, v, tq) in enumerate(sof_comps):
        if tq not in quant:
            raise ValueError("JPEG component references a missing DQT table")
        Q = np.array(quant[tq], dtype=np.float64).reshape(8, 8)
        spatial = np.einsum("xu,ijuv,yv->ijxy", M.T, coefs[ci] * Q, M.T)
        bh, bw = spatial.shape[:2]
        img = (
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        pw = -(-width * h // hmax)
        ph = -(-height * v // vmax)
        out = np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
        components.append(
            {
                "id": cid,
                "h": h,
                "v": v,
                "width": pw,
                "height": ph,
                "plane": out[:ph, :pw].tobytes(),
            }
        )
    return {"width": width, "height": height, "components": components}


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Baseline grayscale JFIF bytes → (width, height, row-major pixels).
    Raises ValueError on structural violations or on color streams
    (use decode_jpeg_planes / jpeg_to_rgb for those)."""
    d = decode_jpeg_planes(payload)
    if len(d["components"]) != 1:
        raise ValueError(
            f"{len(d['components'])}-component JPEG: only grayscale is"
            " supported here — decode_jpeg_planes handles color"
        )
    return d["width"], d["height"], d["components"][0]["plane"]


def jpeg_to_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """Color JPEG → (width, height, interleaved RGB bytes): decode the
    planes, upsample chroma by replication to full resolution, and apply
    the JFIF/T.871 full-range YCbCr→RGB conversion. Grayscale input
    yields R=G=B=Y. NOT oracle-certified (the ±0.5-boundary rounding of
    the conversion is engine-sensitive); pytest pins it against
    closed-form fixtures with conversion values away from .5
    boundaries."""
    import numpy as np

    d = decode_jpeg_planes(payload)
    w, h = d["width"], d["height"]
    comps = d["components"]
    if len(comps) == 1:
        y = np.frombuffer(comps[0]["plane"], np.uint8).reshape(h, w)
        return w, h, np.repeat(y[:, :, None], 3, axis=2).tobytes()
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        a = np.frombuffer(c["plane"], np.uint8).reshape(c["height"], c["width"])
        a = np.repeat(np.repeat(a, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(a[:h, :w].astype(np.float64))
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
