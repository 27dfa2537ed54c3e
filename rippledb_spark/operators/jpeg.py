"""Baseline JPEG (ITU-T T.81 / ISO 10918-1, public spec) for 8-bit
grayscale — dependency-free (struct + numpy): a full sequential-DCT
encoder and decoder pair, the codec inside MJPEG video streams.

Scope (the baseline grayscale profile, everything a single-component
JFIF stream uses):

- markers: SOI, APP0 (JFIF 1.1), DQT, SOF0 (8-bit, one component, 1×1
  sampling), DHT (the Annex K standard luminance DC + AC tables), SOS,
  EOI; unknown APPn/COM segments are skipped by length on decode;
- entropy coding: canonical Huffman per Annex C, DC differential
  categories, AC run/size symbols with ZRL (15,0) and EOB (0,0), byte
  stuffing (FF → FF 00) in the entropy-coded segment;
- transform: orthonormal 8×8 DCT-II/III as one numpy matrix product per
  frame (M·B·Mᵀ over a block stack — no Python pixel loops), level
  shift ±128, right/bottom edge replication to 8×8 multiples, clip and
  crop on decode.

DETERMINISM FOR THE ORACLE: JPEG is lossy, so decoded pixels are not
generally SQL-recomputable — EXCEPT for images that are CONSTANT on
each 8×8 block and a quantization table of all ones: a constant block's
AC coefficients are exactly zero and its DC is the exact integer
8·(v−128), so quantize → entropy → dequantize → IDCT reproduces v
EXACTLY (float error ~1e-13, far inside the final round-to-int). The
registered mjpeg query synthesizes exactly such frames; arbitrary
content is covered by pytest round-trip-within-tolerance tests instead.

Progressive/arithmetic modes, restart markers, multi-component color,
and chroma subsampling are out of scope — decode refuses them loudly.
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

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
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


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} for the bit-serial decoder."""
    return {(ln, c): sym for sym, (c, ln) in _canonical_codes(bits, values).items()}


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    u = x.reshape(-1, 1)
    M = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    M[0] /= np.sqrt(2.0)
    return M


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

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad the final byte
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

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _category(v: int) -> int:
    return 0 if v == 0 else v.bit_length() if v > 0 else (-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    # negative amplitudes use the one's-complement convention (T.81 F.1.4)
    return v if v >= 0 else v + (1 << size) - 1


def encode_jpeg_gray(width: int, height: int, pixels: bytes,
                     quant: list[int] | None = None) -> bytes:
    """8-bit grayscale row-major pixels → baseline JFIF bytes. ``quant``
    is the 64-entry quantization table in NATURAL (row-major) order;
    default all ones (numerically lossless for block-constant content,
    see module docstring)."""
    import numpy as np

    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("dimensions out of JPEG range")
    q = list(quant) if quant is not None else [1] * 64
    if len(q) != 64 or any(not (1 <= v <= 255) for v in q):
        raise ValueError("quant table must be 64 values in 1..255")

    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bw, bh = -(-width // 8), -(-height // 8)
    padded = np.pad(a, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - 128.0
    M = _dct_matrix()
    Q = np.array(q, dtype=np.float64).reshape(8, 8)
    coefs = np.einsum("ux,nxy,vy->nuv", M, blocks, M)
    quantized = np.round(coefs / Q).astype(np.int64)

    zz_rows = [r for r, _ in _Z]
    zz_cols = [c for _, c in _Z]
    w = _BitWriter()
    prev_dc = 0
    for blk in quantized:
        zz = blk[zz_rows, zz_cols]
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
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
                code, ln = _AC_ENC[0xF0]  # ZRL
                w.write(code, ln)
                run -= 16
            size = _category(v)
            code, ln = _AC_ENC[(run << 4) | size]
            w.write(code, ln)
            w.write(_amplitude(v, size), size)
            run = 0
        if last_nz < 63:
            code, ln = _AC_ENC[0x00]  # EOB
            w.write(code, ln)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = bytes(q[r * 8 + c] for r, c in _Z)
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + zz_q)
    out += seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALUES))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALUES))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += scan + b"\xff\xd9"  # EOI
    return out


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Baseline grayscale JFIF bytes → (width, height, row-major pixels).
    Raises ValueError on structural violations or non-baseline /
    multi-component streams (refuse-loudly, like the other decoders)."""
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    comp_q = comp_dc = comp_ac = 0
    scan_at = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {payload[pos]:02X}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables are not baseline")
                zz = list(body[at + 1 : at + 65])
                tbl = [0] * 64
                for k, (r, c) in enumerate(_Z):
                    tbl[r * 8 + c] = zz[k]
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
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG is not baseline")
            if ncomp != 1:
                raise ValueError(
                    f"{ncomp}-component JPEG: only grayscale is supported"
                )
            if body[7] != 0x11:
                raise ValueError("subsampled grayscale is not meaningful")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: progressive/extended JPEG is not baseline"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals are not supported")
        elif marker == 0xDA:  # SOS
            if body[0] != 1:
                raise ValueError("multi-component scan")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0xF
            scan_at = pos + 2 + seglen
            break
        # APPn / COM / others: skipped by length
        pos += 2 + seglen
    if scan_at is None or width is None:
        raise ValueError("JPEG missing SOF0/SOS")
    if comp_q not in quant or (0, comp_dc) not in huff or (1, comp_ac) not in huff:
        raise ValueError("JPEG scan references missing DQT/DHT tables")

    Q = np.array(quant[comp_q], dtype=np.float64).reshape(8, 8)
    dc_tbl, ac_tbl = huff[(0, comp_dc)], huff[(1, comp_ac)]
    bw, bh = -(-width // 8), -(-height // 8)
    r = _BitReader(payload, scan_at)
    zz_rows = [x for x, _ in _Z]
    zz_cols = [c for _, c in _Z]
    coefs = np.zeros((bh * bw, 8, 8), dtype=np.float64)
    prev_dc = 0

    def receive_extend(size: int) -> int:
        if size == 0:
            return 0
        v = r.bits(size)
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    for bi in range(bh * bw):
        zz = [0] * 64
        size = r.huff(dc_tbl)
        prev_dc += receive_extend(size)
        zz[0] = prev_dc
        k = 1
        while k < 64:
            sym = r.huff(ac_tbl)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError(f"invalid AC symbol {sym:02X}")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = receive_extend(size)
            k += 1
        blk = coefs[bi]
        blk[zz_rows, zz_cols] = zz
    M = _dct_matrix()
    spatial = np.einsum("xu,nuv,yv->nxy", M.T, coefs * Q, M.T)
    img = (
        spatial.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )
    out = np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
    return width, height, out[:height, :width].tobytes()
