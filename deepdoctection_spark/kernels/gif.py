"""Pure-stdlib GIF codec: LZW decoder + uncompressed-LZW encoder.

Third real image family on the in-sandbox oracle-checked path (after PNG,
operators/codecs.py:76-213, and PDF, kernels/pdf.py): palette-indexed
images, the shape web crawls are full of. Implements GIF87a/89a per the
public spec — header + logical screen descriptor, global color table,
image descriptor, LZW-compressed index stream in sub-blocks, trailer.
Reference consumes real pixels via Pillow (datapoint/convert.py:78-166);
this covers the palette-decode path without it.

Scope (quarantine-on-miss, same policy as png_decode): single-image,
non-interlaced, global color table only. Animated/interlaced/local-palette
GIFs raise ValueError → the callers' row quarantine.

The encoder is real LZW (string table, code-width growth to 12 bits,
CLEAR + reset when the table fills), bookkept in LOCKSTEP with the decoder
so both sides agree on width at every stream position — round trips
exercise the decoder's growth and KwKwK paths, not just root codes.
"""

from __future__ import annotations

import struct

import numpy as np

_HDRS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def gif_encode(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → GIF89a bytes.
    Palette is padded to the next power of two (min 2)."""
    a = np.ascontiguousarray(indices, dtype=np.uint8)
    h, w = a.shape
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    n = len(pal)
    if a.max(initial=0) >= n:
        raise ValueError("index out of palette range")
    bits = max(1, (max(n, 2) - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:n] = pal

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global table, bits-1 size, no sort
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor

    # Real LZW: string table keyed (prefix_code, byte), width grows in
    # LOCKSTEP with the decoder's table (same add-entry/advance sequence at
    # the same stream positions), CLEAR + reset when the table fills.
    min_code = max(bits, 2)
    clear = 1 << min_code
    eoi = clear + 1
    out.append(min_code)

    width = min_code + 1
    bitbuf = 0
    nbits = 0
    data = bytearray()

    def put(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    put(clear)
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    prev = -1
    for px in a.reshape(-1).tolist():
        if prev < 0:
            prev = px
            continue
        hit = table.get((prev, px))
        if hit is not None:
            prev = hit
            continue
        put(prev)
        if next_code < 4096:
            table[(prev, px)] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by ONE entry (its first
            # code after a clear adds no entry), so the encoder grows the
            # width one entry later than its own count suggests — at
            # (1<<width)+1, exactly when the decoder (at 1<<width) grows
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            put(clear)
            table.clear()
            next_code = eoi + 1
            width = min_code + 1
        prev = px
    if prev >= 0:
        put(prev)
    put(eoi)
    if nbits:
        data.append(bitbuf & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def gif_decode(raw: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB. Full LZW (grows the string table,
    handles CLEAR/EOI and the KwKwK case) — decodes any conformant
    single-image non-interlaced GIF, not just this module's encoder output."""
    if raw[:6] not in _HDRS:
        raise ValueError("bad GIF signature")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", raw[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(raw, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:  # trailer
            raise ValueError("GIF contains no image data")
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if b == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack("<HHHHB", raw[pos + 1 : pos + 10])
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(raw, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF image without color table")
            min_code = raw[pos]
            pos += 1
            data = bytearray()
            while raw[pos] != 0:
                ln = raw[pos]
                data += raw[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(data), min_code, w * h)
            return palette[idx.reshape(h, w)]
        raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("truncated GIF")


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    # string table as (prefix_code, last_byte); roots are (-1, i)
    prefix = [-1] * 4096
    suffix = list(range(clear)) + [0] * (4096 - clear)
    next_code = eoi + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    bitbuf = 0
    nbits = 0
    di = 0
    prev = -1
    stack: list[int] = []
    while n_out < n_pixels:
        while nbits < width:
            if di >= len(data):
                raise ValueError("LZW stream truncated")
            bitbuf |= data[di] << nbits
            di += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("LZW: first code not a root")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            c = code
        elif code == next_code:  # KwKwK
            c = prev
            stack.append(_first_byte(prefix, suffix, prev))
        else:
            raise ValueError("LZW: code beyond table")
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c]
        while stack and n_out < n_pixels:
            out[n_out] = stack.pop()
            n_out += 1
        stack.clear()
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = _first_byte(prefix, suffix, code if code < next_code else prev)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out


def _first_byte(prefix: list[int], suffix: list[int], code: int) -> int:
    while prefix[code] >= 0:
        code = prefix[code]
    return suffix[code]
