"""Stdlib baseline JPEG codec (kernels/jpeg.py): real Huffman + DCT round
trips, the DC-only closed form that backs the media_jpeg_stats oracle,
lossy-bound checks on arbitrary images, registry dispatch, and quarantine
on out-of-scope shapes (progressive / color / truncated)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from deepdoctection_spark.kernels.jpeg import QTABLE, jpeg_decode, jpeg_encode


def _flat_block_img(mid: int, even: bool = True):
    """Piecewise-flat per-8x8-block image; even deltas → exactly lossless."""
    bw, bh = 2 + mid % 3, 2 + mid % 2
    step = 2 if even else 1
    vals = step * ((mid % 256 + 17 * np.arange(bh * bw)) % (256 // step))
    return np.repeat(np.repeat(vals.reshape(bh, bw), 8, 0), 8, 1).astype(
        np.uint8
    )


@pytest.mark.parametrize("mid", [0, 1, 2, 3, 4, 5, 17, 100, 255])
def test_flat_blocks_exactly_lossless(mid):
    img = _flat_block_img(mid)
    np.testing.assert_array_equal(jpeg_decode(jpeg_encode(img)), img)


def test_dc_closed_form_matches_oracle_algebra():
    """decoded = clamp(round(round(8(c-128)/Q00)*Q00/8)+128) — the formula
    the DuckDB oracle relies on (module docstring). With Q00=16 the DC
    quotient is (c-128)/2: EVEN levels are integer quotients (no rounding
    boundary → exactly lossless, the oracle's construction); ODD levels sit
    exactly on x.5 where float jitter may round either way → decoded is
    c±1. The test pins both regimes."""
    q00 = int(QTABLE[0, 0])
    assert q00 == 16  # Annex K.1 — the even-delta oracle algebra assumes it
    for c in range(0, 256, 2):  # even: exact
        out = jpeg_decode(jpeg_encode(np.full((8, 8), c, dtype=np.uint8)))
        assert (out == c).all(), (c, out[0, 0])
    for c in [1, 7, 77, 129, 255]:  # odd: half-boundary, one step either way
        out = jpeg_decode(jpeg_encode(np.full((8, 8), c, dtype=np.uint8)))
        v = int(out[0, 0])
        assert (out == v).all() and v in (max(c - 1, 0), min(c + 1, 255)), (
            c, v)


def test_lossy_roundtrip_bounded_error():
    # smooth gradient: baseline JPEG at Annex-K quality keeps error small
    x = np.linspace(0, 255, 64)
    img = ((x[None, :] + x[:, None]) / 2).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24
    assert abs(float(out.mean()) - float(img.mean())) < 2.0


def test_non_multiple_of_8_dims_edge_padding():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img))
    assert out.shape == (13, 21)  # decoder crops the padded block grid


def test_ac_coefficients_exercised():
    """A non-flat block must emit real AC codes (ZRL/EOB paths), not just
    DC — guard that the scan isn't degenerate."""
    img = np.zeros((8, 8), dtype=np.uint8)
    img[0, 0] = 255
    raw = jpeg_encode(img)
    out = jpeg_decode(raw)
    # energy concentrates where it started; decode is a real IDCT result
    assert out[0, 0] > out[7, 7]
    assert out.std() > 0


def test_registry_dispatch_grayscale_channel():
    from deepdoctection_spark.operators.codecs import decode_image

    img = _flat_block_img(9)
    a = decode_image(jpeg_encode(img))
    assert a.shape == (img.shape[0], img.shape[1], 1)
    np.testing.assert_array_equal(a[:, :, 0], img)


def test_out_of_scope_quarantines():
    with pytest.raises(ValueError, match="signature"):
        jpeg_decode(b"NOTAJPEG" + b"\x00" * 16)
    raw = bytearray(jpeg_encode(_flat_block_img(3)))
    sof = raw.find(b"\xff\xc0")
    assert sof > 0
    raw2 = bytes(raw[:sof]) + b"\xff\xc2" + bytes(raw[sof + 2:])
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode(raw2)
    with pytest.raises((ValueError, IndexError)):
        jpeg_decode(bytes(raw[: len(raw) // 2]))


def test_multicomponent_rejected():
    # patch SOF0 to claim 3 components → stdlib scope rejects (Pillow seam)
    raw = bytearray(jpeg_encode(_flat_block_img(4)))
    sof = raw.find(b"\xff\xc0")
    (seg_len,) = struct.unpack(">H", raw[sof + 2:sof + 4])
    raw[sof + 9] = 3  # ncomp byte
    with pytest.raises(ValueError, match="single-component"):
        jpeg_decode(bytes(raw))


def test_header_fields():
    img = _flat_block_img(2)
    raw = jpeg_encode(img)
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    sof = raw.find(b"\xff\xc0")
    h, w = struct.unpack(">HH", raw[sof + 5:sof + 9])
    assert (h, w) == img.shape


def test_byte_stuffing_roundtrip():
    """Scan data containing 0xFF bytes must be stuffed/unstuffed; sweep many
    flat levels so some Huffman streams hit 0xFF alignment."""
    for mid in range(40):
        img = _flat_block_img(mid, even=False)
        out = jpeg_decode(jpeg_encode(img))
        assert out.shape == img.shape
