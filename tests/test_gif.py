"""Stdlib GIF codec (kernels/gif.py): real-LZW round trips across palette
sizes, code-width growth to 12 bits, table-full clears, KwKwK sequences,
registry dispatch, and quarantine on out-of-scope shapes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from deepdoctection_spark.kernels.gif import gif_decode, gif_encode


def _img(mid: int):
    w, h, n = 7 + mid % 8, 5 + mid % 5, 4 + mid % 13
    idx = ((mid + 7 * np.arange(w * h)) % n).astype(np.uint8).reshape(h, w)
    pal = np.stack(
        [3 * np.arange(n), 3 * np.arange(n) + 1, 3 * np.arange(n) + 2], axis=1
    ).astype(np.uint8)
    return idx, pal


@pytest.mark.parametrize("mid", [0, 3, 7, 12, 29, 44])
def test_roundtrip_small_shapes(mid):
    idx, pal = _img(mid)
    assert (gif_decode(gif_encode(idx, pal)) == pal[idx]).all()


def test_roundtrip_width_growth_and_clears():
    # 200k pixels, 256-color palette: the code width must walk 9→12 bits
    # and the table fills (CLEAR + reset) multiple times
    n = 256
    idx = ((np.arange(200_000) * 37 + (np.arange(200_000) ** 2 // 7)) % n
           ).astype(np.uint8).reshape(400, 500)
    pal = ((np.arange(n * 3) * 5) % 256).astype(np.uint8).reshape(n, 3)
    raw = gif_encode(idx, pal)
    assert len(raw) < idx.size  # real compression, not root-code emission
    assert (gif_decode(raw) == pal[idx]).all()


def test_roundtrip_kwkwk_runs():
    # long constant runs produce the canonical KwKwK decoder case
    idx = np.zeros((40, 50), dtype=np.uint8)
    idx[::3] = 1
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    assert (gif_decode(gif_encode(idx, pal)) == pal[idx]).all()


def test_registry_dispatch():
    from deepdoctection_spark.operators.codecs import decode_image

    idx, pal = _img(5)
    a = decode_image(gif_encode(idx, pal))
    assert a.shape == (idx.shape[0], idx.shape[1], 3)
    assert (a == pal[idx]).all()


def test_out_of_scope_shapes_quarantine():
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTAGIF" + b"\x00" * 20)
    idx, pal = _img(1)
    with pytest.raises(ValueError, match="truncated|LZW|buffer"):
        gif_decode(bytes(gif_encode(idx, pal)[:20]))


def test_interlaced_roundtrip():
    """Four-pass row raster: encode writes pass order, decode restores it."""
    for mid in (1, 3, 9):
        idx, pal = _img(mid)
        np.testing.assert_array_equal(
            gif_decode(gif_encode(idx, pal, interlace=True)), pal[idx]
        )


def test_interlace_bit_is_a_row_permutation():
    """Flipping the interlace bit on sequentially-encoded data decodes to a
    row permutation (the four-pass reorder applied to sequential rows) —
    same multiset of rows, different order — which pins that the decoder
    really reorders rows rather than ignoring the flag."""
    idx, pal = _img(1)
    raw = bytearray(gif_encode(idx, pal))
    table_bytes = 3 * (2 << (raw[10] & 0x07))
    desc = 13 + table_bytes
    assert raw[desc] == 0x2C
    raw[desc + 9] |= 0x40
    out = gif_decode(bytes(raw))
    expected = pal[idx]
    assert not np.array_equal(out, expected)  # order differs...
    assert sorted(map(bytes, out.reshape(out.shape[0], -1))) == sorted(
        map(bytes, expected.reshape(expected.shape[0], -1))
    )  # ...but the rows are the same multiset


def test_animated_frames_roundtrip():
    from deepdoctection_spark.kernels.gif import (
        gif_decode_frames,
        gif_encode_animated,
    )

    rng = np.random.default_rng(5)
    pal = np.stack(
        [3 * np.arange(7), 3 * np.arange(7) + 1, 3 * np.arange(7) + 2], 1
    ).astype(np.uint8)
    frames = [rng.integers(0, 7, size=(9, 8), dtype=np.uint8) for _ in range(4)]
    raw = gif_encode_animated(frames, pal, delay_cs=5)
    dec = gif_decode_frames(raw)
    assert len(dec) == 4
    for f, d in zip(frames, dec):
        np.testing.assert_array_equal(d, pal[f])
    # still semantics: gif_decode returns the first composited frame
    np.testing.assert_array_equal(gif_decode(raw), pal[frames[0]])


def test_subrect_transparency_and_disposal_compositing():
    """Hand-built two-frame GIF: frame 2 is a 2x2 sub-rect at (1,1) with a
    transparent index — the canvas must show frame 1 through the holes;
    disposal=2 after frame 1 would instead restore background."""
    import struct as _s

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   np.uint8)
    # screen 4x4, global table 4 entries (bits=2), bg index 0
    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", 4, 4, 0x80 | (1 << 4) | 1, 0, 0)
    out += pal.tobytes()

    from deepdoctection_spark.kernels.gif import _image_block

    f1 = np.full((4, 4), 1, np.uint8)  # all red
    out += b"\x21\xf9\x04" + bytes([1 << 2]) + _s.pack("<H", 5) + b"\x00\x00"
    out += _image_block(f1, 2, False)
    # frame 2: 2x2 sub-rect at (1,1): [[2, T],[T, 3]] with transparent=0
    sub = np.array([[2, 0], [0, 3]], np.uint8)
    out += b"\x21\xf9\x04" + bytes([(1 << 2) | 1]) + _s.pack("<H", 5) \
        + b"\x00\x00"
    out += b"\x2c" + _s.pack("<HHHHB", 1, 1, 2, 2, 0)
    min_code = 2
    out.append(min_code)
    from deepdoctection_spark.kernels.gif import _lzw_compress

    data = _lzw_compress(sub.reshape(-1).tolist(), min_code)
    out.append(len(data))
    out += data + b"\x00"
    out += b"\x3b"

    from deepdoctection_spark.kernels.gif import gif_decode_frames

    dec = gif_decode_frames(bytes(out))
    assert len(dec) == 2
    np.testing.assert_array_equal(dec[0], pal[f1])
    exp = pal[f1].copy()
    exp[1, 1] = pal[2]
    exp[2, 2] = pal[3]  # transparent holes at (1,2) and (2,1) keep red
    np.testing.assert_array_equal(dec[1], exp)


def test_index_out_of_palette_range_rejected():
    idx = np.full((4, 4), 9, dtype=np.uint8)
    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="palette range"):
        gif_encode(idx, pal)


def test_header_fields():
    idx, pal = _img(2)
    raw = gif_encode(idx, pal)
    assert raw[:6] == b"GIF89a"
    w, h = struct.unpack("<HH", raw[6:10])
    assert (h, w) == idx.shape
    assert raw.endswith(b"\x00\x3b")
