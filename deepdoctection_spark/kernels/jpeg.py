"""Pure-stdlib baseline JPEG codec (grayscale): DCT + Huffman, no Pillow.

Fourth real codec family (after PNG/GIF/PDF): lossy transform coding — the
decoder implements the REAL baseline pipeline (marker parse, DQT/DHT/SOF0/
SOS, Huffman entropy decode with byte-unstuffing and RST handling, DC
prediction, dezigzag, dequantize, orthonormal 2-D IDCT, level shift+clamp)
and the encoder the inverse. Tables are the public Annex K defaults.

Oracle design (media_jpeg_stats): JPEG is lossy, so a general image can't be
SQL-recomputed — but a PIECEWISE-FLAT image (each 8×8 block one constant c)
has a DC-only spectrum: DC = 8·(c−128), every AC exactly 0. The full lossy
chain then collapses to closed-form integer arithmetic

    decoded = clamp(round(round(8·(c−128)/Q₀₀) · Q₀₀ / 8) + 128, 0, 255)

which DuckDB reproduces exactly — while Spark actually Huffman-decodes real
scan bytes and runs the real IDCT. Encoding floats leave ACs at ~1e-13,
quantizing to 0, so the equality is exact, not approximate.

Scope (quarantine-on-miss): baseline sequential (SOF0), 8-bit, single
component. Progressive/color/subsampled JPEGs raise ValueError → row
quarantine (real color decode stays behind the Pillow seam).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# standard luminance quantization table (Annex K.1), row-major
QTABLE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.3: luminance DC — BITS (codes per length 1..16) and values
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.5: luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) per the canonical JPEG code assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            c = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
            m[u, x] = c * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_DCT = _dct_matrix()
_DC_ENC = _huff_codes(DC_BITS, DC_VALS)
_AC_ENC = _huff_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def jpeg_encode(gray: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → baseline JPEG bytes (Annex K tables, no
    subsampling question — single component). Edge blocks pad by
    replication, the spec-recommended choice."""
    a = np.ascontiguousarray(gray, dtype=np.uint8)
    h, w = a.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(a, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")

    wr = _BitWriter()
    prev_dc = 0
    shifted = padded.astype(np.float64) - 128.0
    for by in range(bh):
        for bx in range(bw):
            block = shifted[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coef = _DCT @ block @ _DCT.T
            q = np.round(coef / QTABLE).astype(np.int32).reshape(-1)[ZIGZAG]
            # DC: difference coding
            diff = int(q[0]) - prev_dc
            prev_dc = int(q[0])
            cat = _category(diff) if diff else 0
            code, ln = _DC_ENC[cat]
            wr.put(code, ln)
            if cat:
                amp = diff if diff > 0 else diff + (1 << cat) - 1
                wr.put(amp, cat)
            # AC: run-length of zeros + category
            run = 0
            for k in range(1, 64):
                v = int(q[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = _AC_ENC[0xF0]  # ZRL
                    wr.put(zc, zl)
                    run -= 16
                cat = _category(v)
                code, ln = _AC_ENC[(run << 4) | cat]
                wr.put(code, ln)
                amp = v if v > 0 else v + (1 << cat) - 1
                wr.put(amp, cat)
                run = 0
            if run:
                ec, el = _AC_ENC[0x00]  # EOB
                wr.put(ec, el)
    scan = wr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0 (1:1 aspect, no thumbnail)
    qz = QTABLE.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qz  # DQT id 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])  # SOF0: comp 1, 1x1 sampling, qtable 0
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(DC_VALS), 0x00) \
        + bytes(DC_BITS) + bytes(DC_VALS)  # DHT DC class0 id0
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(AC_VALS), 0x10) \
        + bytes(AC_BITS) + bytes(AC_VALS)  # DHT AC class1 id0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and RSTn awareness (reset() is called by the block loop)."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST marker reached mid-read
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xff{nxt:02x} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_and_skip_rst(self) -> None:
        self.acc = 0
        self.n = 0
        # consume the RST marker bytes
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decoder(bits: list[int], vals: list[int]):
    """(code, length) → value lookup as nested dict keyed by (length, code)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def jpeg_decode(raw: bytes) -> np.ndarray:
    """Baseline grayscale JPEG bytes → (h, w) uint8. Raises ValueError on
    shapes outside the declared scope (progressive, multi-component,
    12-bit) — the callers' row quarantine."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = 0
    comp_q = comp_dc = comp_ac = 0
    restart_interval = 0
    scan_start = -1
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seg_len,) = struct.unpack(">H", raw[pos:pos + 2])
        seg = raw[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                z = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int32)
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = z
                qtables[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_decoder(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise ValueError("only 8-bit baseline supported")
            if ncomp != 1:
                raise ValueError(
                    "only single-component (grayscale) JPEG in stdlib scope; "
                    "color decode needs Pillow")
            if seg[7] != 0x11:
                raise ValueError("subsampled JPEG unsupported")
            comp_q = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0x{marker:02x} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != 1:
                raise ValueError("multi-component scan unsupported")
            comp_dc, comp_ac = seg[2] >> 4, seg[2] & 0x0F
            scan_start = pos + seg_len
            break
        pos += seg_len
    if scan_start < 0 or h == 0:
        raise ValueError("truncated JPEG: no SOS/SOF")
    q = qtables[comp_q]
    dct, act = dc_tables[comp_dc], ac_tables[comp_ac]

    bh, bw = (h + 7) // 8, (w + 7) // 8
    out = np.empty((bh * 8, bw * 8), dtype=np.uint8)
    r = _BitReader(raw, scan_start)
    prev_dc = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align_and_skip_rst()
                prev_dc = 0
            mcu += 1
            coeffs = np.zeros(64, dtype=np.int32)
            try:
                cat = _read_huff(r, dct)
                diff = _extend(r.bits(cat), cat) if cat else 0
                prev_dc += diff
                coeffs[0] = prev_dc
                k = 1
                while k < 64:
                    rs = _read_huff(r, act)
                    run, size = rs >> 4, rs & 0x0F
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC index overrun")
                    coeffs[k] = _extend(r.bits(size), size)
                    k += 1
            except _RestartMarker:
                raise ValueError("unexpected restart marker (DRI mismatch)")
            block = np.zeros(64, dtype=np.int32)
            block[ZIGZAG] = coeffs
            deq = block.reshape(8, 8) * q
            pix = _DCT.T @ deq.astype(np.float64) @ _DCT
            out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
                np.round(pix) + 128, 0, 255).astype(np.uint8)
    return out[:h, :w]
