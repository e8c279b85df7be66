"""Codec adapter seams: magic-byte dispatch, real WAV path (stdlib),
registry plug-ins, and skip-marked contract tests for the optional
PIL/pypdf/pdfplumber backends (absent in the sandbox — the tests document
and verify the adapter API wherever those libs ARE installed)."""

from __future__ import annotations

import numpy as np
import pytest

from deepdoctection_spark.operators import codecs
from deepdoctection_spark.operators.multimodal import fimg_encode, fpcm_encode


def test_dispatch_fimg():
    raw = fimg_encode(seed=3, w=4, h=2, c=3)
    a = codecs.decode_image(raw)
    assert a.shape == (2, 4, 3)


def test_dispatch_unknown_magic():
    with pytest.raises(ValueError, match="no image decoder"):
        codecs.decode_image(b"XXXX....")


def test_png_without_pillow_raises_not_implemented():
    if codecs._PILImage is not None:
        pytest.skip("Pillow installed — real decode covered by test_pil_roundtrip")
    with pytest.raises(NotImplementedError, match="Pillow"):
        codecs.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_wav_roundtrip_real_codec():
    # the stdlib-backed REAL audio codec: encode → dispatch-decode
    sr, x = 8000, (np.arange(100) * 37 % 4096 - 2048).astype("<i2")
    raw = codecs.wav_encode(sr, x)
    assert raw[:4] == b"RIFF"
    sr2, x2 = codecs.decode_audio(raw)
    assert sr2 == sr
    np.testing.assert_array_equal(x2, x)


def test_audio_features_accepts_wav_payloads(spark):
    # production path: the mapInPandas stage dispatches FPCM *and* WAV
    from deepdoctection_spark.operators.multimodal import audio_features

    sr, n = 8000, 64
    x = (np.arange(n) * 13 % 4096 - 2048).astype("<i2")
    rows = [
        (1, codecs.wav_encode(sr, x)),
        (2, fpcm_encode(seed=5, sr=sr, n=n)),
        (3, b"????not audio"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    assert out[1]["sample_rate"] == sr and out[1]["n_samples"] == n
    assert out[1]["error"] is None and out[2]["error"] is None
    assert out[3]["error"] is not None  # quarantined, not fatal


def test_register_custom_decoder():
    def fake(raw: bytes) -> np.ndarray:
        return np.zeros((1, 1, 3), dtype=np.uint8)

    codecs.register_image_decoder(b"ZZZZ", fake)
    try:
        assert codecs.decode_image(b"ZZZZ-payload").shape == (1, 1, 3)
    finally:
        del codecs.IMAGE_DECODERS[b"ZZZZ"]


# --- optional-backend contract tests (skip when the lib is absent) ----------


def test_pil_roundtrip():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    out = codecs.decode_image(buf.getvalue())
    np.testing.assert_array_equal(out, a)


def test_pypdf_page_texts():
    pypdf = pytest.importorskip("pypdf")
    import io

    w = pypdf.PdfWriter()
    w.add_blank_page(width=72, height=72)
    buf = io.BytesIO()
    w.write(buf)
    pages = codecs.pdf_page_texts(buf.getvalue())
    assert pages == [""]


def test_pdfplumber_positioned_lines_contract():
    pytest.importorskip("pdfplumber")
    # contract only: output lines must parse as the pdf_reader wire format
    from deepdoctection_spark.kernels.layout import looks_like_layout  # noqa: F401


def test_pdf_without_pypdf_raises_not_implemented():
    if codecs._pypdf is not None:
        pytest.skip("pypdf installed")
    with pytest.raises(NotImplementedError, match="pypdf"):
        codecs.pdf_page_texts(b"%PDF-1.4 ...")
