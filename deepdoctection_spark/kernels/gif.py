"""Pure-stdlib GIF codec: LZW decoder + uncompressed-LZW encoder.

Third real image family on the in-sandbox oracle-checked path (after PNG,
operators/codecs.py:76-213, and PDF, kernels/pdf.py): palette-indexed
images, the shape web crawls are full of. Implements GIF87a/89a per the
public spec — header + logical screen descriptor, global color table,
image descriptor, LZW-compressed index stream in sub-blocks, trailer.
Reference consumes real pixels via Pillow (datapoint/convert.py:78-166);
this covers the palette-decode path without it.

Scope (round 4 closes the r3 gaps): interlaced images (four-pass row
raster), local color tables, and ANIMATED GIFs — multi-frame decode with
real compositing semantics (sub-rect frames over the logical screen,
disposal methods 0/1 leave, 2 restore-background, 3 restore-previous,
GCE transparency). gif_decode returns the first composited frame (still
semantics, what a thumbnailer wants); gif_decode_frames returns them all.
Only genuinely malformed streams raise ValueError → row quarantine.

The encoder is real LZW (string table, code-width growth to 12 bits,
CLEAR + reset when the table fills), bookkept in LOCKSTEP with the decoder
so both sides agree on width at every stream position — round trips
exercise the decoder's growth and KwKwK paths, not just root codes.
"""

from __future__ import annotations

import struct

import numpy as np

_HDRS = (b"GIF87a", b"GIF89a")

# interlace passes per the spec: (first row, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _lzw_compress(pixels: list[int], min_code: int) -> bytes:
    """Real LZW: string table keyed (prefix_code, byte), width grows in
    LOCKSTEP with the decoder's table (same add-entry/advance sequence at
    the same stream positions), CLEAR + reset when the table fills."""
    clear = 1 << min_code
    eoi = clear + 1
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
    for px in pixels:
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
    return bytes(data)


def _pal_table(palette: np.ndarray) -> tuple[np.ndarray, int]:
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    bits = max(1, (max(len(pal), 2) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    return table, bits


def _image_block(a: np.ndarray, bits: int, interlace: bool) -> bytes:
    """Image descriptor + LZW sub-blocks for one (full-screen) frame."""
    h, w = a.shape
    iflags = 0x40 if interlace else 0
    out = bytearray(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags))
    rows = a[_interlace_order(h), :] if interlace else a
    min_code = max(bits, 2)
    out.append(min_code)
    data = _lzw_compress(rows.reshape(-1).tolist(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"  # block terminator
    return bytes(out)


def gif_encode(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → GIF89a bytes.
    Palette is padded to the next power of two (min 2). ``interlace`` writes
    the four-pass row raster (iflags bit 6)."""
    a = np.ascontiguousarray(indices, dtype=np.uint8)
    h, w = a.shape
    if a.max(initial=0) >= len(palette):
        raise ValueError("index out of palette range")
    table, bits = _pal_table(palette)

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global table, bits-1 size, no sort
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += table.tobytes()
    out += _image_block(a, bits, interlace)
    out += b"\x3b"  # trailer
    return bytes(out)


def gif_encode_animated(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delay_cs: int = 10,
    loop: int = 0,
) -> bytes:
    """List of (h, w) uint8 index frames (shared global palette) → animated
    GIF89a: NETSCAPE2.0 loop extension + per-frame graphic control
    (disposal=1 'do not dispose', delay in centiseconds)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    table, bits = _pal_table(palette)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += table.tobytes()
    # NETSCAPE application extension: loop count
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for f in frames:
        a = np.ascontiguousarray(f, dtype=np.uint8)
        if a.shape != (h, w):
            raise ValueError("frames must share the logical screen size")
        if a.max(initial=0) >= len(palette):
            raise ValueError("index out of palette range")
        # GCE: disposal=1 (leave), no transparency
        out += b"\x21\xf9\x04" + bytes([1 << 2]) + struct.pack("<H", delay_cs) \
            + b"\x00\x00"
        out += _image_block(a, bits, interlace=False)
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def gif_decode(raw: bytes) -> np.ndarray:
    """GIF bytes → (h, w, 3) uint8 RGB: the FIRST frame, composited onto the
    logical screen (still/thumbnail semantics). Full LZW (grows the string
    table, handles CLEAR/EOI and the KwKwK case), interlaced rasters, local
    color tables — decodes any conformant GIF, not just this module's
    encoder output."""
    return _decode_frames(raw, first_only=True)[0]


def gif_decode_frames(raw: bytes) -> list[np.ndarray]:
    """Animated GIF bytes → list of (screen_h, screen_w, 3) uint8 RGB frames
    with real compositing: sub-rect frames drawn over the canvas, GCE
    transparency (transparent pixels leave the canvas through), disposal
    methods 0/1 (leave), 2 (restore to background color) and
    3 (restore to previous canvas)."""
    return _decode_frames(raw, first_only=False)


def _decode_frames(raw: bytes, first_only: bool) -> list[np.ndarray]:
    if raw[:6] not in _HDRS:
        raise ValueError("bad GIF signature")
    sw, sh, flags, bg, _aspect = struct.unpack("<HHBBB", raw[6:13])
    pos = 13
    gpalette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gpalette = np.frombuffer(raw, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    # canvas starts as the background color (or black without a table)
    if gpalette is not None and bg < len(gpalette):
        bg_rgb = gpalette[bg]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    # pending graphic-control state (applies to the NEXT image block)
    disposal = 0
    transparent = -1
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = raw[pos + 1]
            pos += 2
            if label == 0xF9 and raw[pos] >= 4:  # graphic control
                packed = raw[pos + 1]
                disposal = (packed >> 2) & 0x07
                transparent = raw[pos + 4] if packed & 0x01 else -1
            while raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if b == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack("<HHHHB", raw[pos + 1 : pos + 10])
            pos += 10
            palette = gpalette
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
            pos += 1  # block terminator
            idx = _lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in four-pass order
                deint = np.empty_like(idx)
                deint[_interlace_order(h), :] = idx
                idx = deint
            if left + w > sw or top + h > sh:
                raise ValueError("frame rect outside logical screen")
            prev_canvas = canvas.copy() if disposal == 3 else None
            rgb = palette[idx]
            region = canvas[top : top + h, left : left + w]
            if transparent >= 0:
                opaque = idx != transparent
                region[opaque] = rgb[opaque]
            else:
                region[:, :] = rgb
            frames.append(canvas.copy())
            if first_only:
                return frames
            if disposal == 2:  # restore background within the frame rect
                canvas[top : top + h, left : left + w] = bg_rgb
            elif disposal == 3 and prev_canvas is not None:
                canvas = prev_canvas
            disposal = 0
            transparent = -1
            continue
        raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


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
