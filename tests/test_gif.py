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
    raw = bytearray(gif_encode(idx, pal))
    # flip the interlace bit in the image descriptor (structural offset —
    # 0x2c bytes also occur inside palette data)
    table_bytes = 3 * (2 << (raw[10] & 0x07))
    desc = 13 + table_bytes
    assert raw[desc] == 0x2C
    raw[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gif_decode(bytes(raw))
    with pytest.raises(ValueError, match="truncated|LZW|buffer"):
        gif_decode(bytes(gif_encode(idx, pal)[:20]))


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
