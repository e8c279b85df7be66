"""Codec adapter seams: pluggable decode behind a magic-byte registry.

The reference consumes media through predictor-shaped adapters
(`ObjectDetector.predict(np_img)`, `PdfMiner.predict(bytes)`,
/root/reference/deepdoctection/extern/base.py:118-439) so a user can swap
backends without touching the pipeline. This module is that seam for the
Spark engine: every production decode path (operators/multimodal.py) calls
the registry, which dispatches on the payload's leading magic bytes:

- built-in fake codecs (FIMG/FPCM/FVID) — always available, fully
  oracle-checked (the sandbox path);
- real codecs gated behind import-try: PNG/JPEG via Pillow, PDF text via
  pypdf, positioned PDF runs via pdfplumber (none ship in this container —
  their contract tests are skip-marked, the dispatch plumbing is not);
- WAV via the stdlib ``wave`` module — a REAL codec that works everywhere,
  exercised unskipped;
- user plug-ins via register_image_decoder / register_audio_decoder — the
  documented adapter API (plug pdfplumber/PIL outside the sandbox without
  touching the engine).

Decoders raise NotImplementedError with an actionable message when the
backing library is absent; the per-row quarantine in the operators turns
that into an `error` column value, never a task failure.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Callable

import numpy as np

try:  # optional: real image codecs
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - absent in the build container
    _PILImage = None

try:  # optional: PDF page-text extraction
    import pypdf as _pypdf
except ImportError:  # pragma: no cover
    _pypdf = None

try:  # optional: positioned PDF text runs (the PdfMiner.predict seam)
    import pdfplumber as _pdfplumber
except ImportError:  # pragma: no cover
    _pdfplumber = None


# ---------------------------------------------------------------------------
# image decoders: magic prefix → fn(raw) -> np.ndarray (h, w, c)
# ---------------------------------------------------------------------------


def _pil_decode(raw: bytes) -> np.ndarray:
    if _PILImage is None:
        raise NotImplementedError(
            "PNG/JPEG decode needs Pillow — `pip install pillow` outside the "
            "sandbox; the FIMG fake codec covers the plumbing here"
        )
    a = np.asarray(_PILImage.open(io.BytesIO(raw)).convert("RGB"))
    return a


def _fimg_decode(raw: bytes) -> np.ndarray:
    from deepdoctection_spark.operators.multimodal import fimg_decode

    return fimg_decode(raw)


IMAGE_DECODERS: dict[bytes, Callable[[bytes], np.ndarray]] = {
    b"FIMG": _fimg_decode,
    b"\x89PNG": _pil_decode,
    b"\xff\xd8\xff": _pil_decode,
}


def register_image_decoder(magic: bytes, fn: Callable[[bytes], np.ndarray]) -> None:
    """Adapter API: plug a decoder for payloads starting with ``magic``."""
    IMAGE_DECODERS[magic] = fn


def decode_image(raw: bytes) -> np.ndarray:
    """Dispatch on magic bytes → (h, w, c) uint8 array."""
    for magic, fn in IMAGE_DECODERS.items():
        if raw[: len(magic)] == magic:
            return fn(raw)
    raise ValueError(f"no image decoder registered for magic {raw[:4]!r}")


# ---------------------------------------------------------------------------
# audio decoders: magic prefix → fn(raw) -> (sample_rate, int16 samples)
# ---------------------------------------------------------------------------


def _wav_decode(raw: bytes) -> tuple[int, np.ndarray]:
    """Real WAV (RIFF/PCM16) decode via the stdlib wave module — no external
    dependency; multi-channel audio is downmixed by taking channel 0."""
    with wave.open(io.BytesIO(raw), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only PCM16 wav supported, got width {w.getsampwidth()}")
        sr = w.getframerate()
        n = w.getnframes()
        x = np.frombuffer(w.readframes(n), dtype="<i2")
        ch = w.getnchannels()
        if ch > 1:
            x = x.reshape(-1, ch)[:, 0]
    return sr, x


def _fpcm_decode(raw: bytes) -> tuple[int, np.ndarray]:
    from deepdoctection_spark.operators.multimodal import fpcm_decode

    return fpcm_decode(raw)


AUDIO_DECODERS: dict[bytes, Callable[[bytes], tuple[int, np.ndarray]]] = {
    b"FPCM": _fpcm_decode,
    b"RIFF": _wav_decode,
}


def register_audio_decoder(
    magic: bytes, fn: Callable[[bytes], tuple[int, np.ndarray]]
) -> None:
    AUDIO_DECODERS[magic] = fn


def decode_audio(raw: bytes) -> tuple[int, np.ndarray]:
    for magic, fn in AUDIO_DECODERS.items():
        if raw[: len(magic)] == magic:
            return fn(raw)
    raise ValueError(f"no audio decoder registered for magic {raw[:4]!r}")


def wav_encode(sr: int, samples: np.ndarray) -> bytes:
    """PCM16 WAV writer (stdlib) — round-trip partner of _wav_decode."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# PDF adapters (the PdfMiner.predict(bytes) kernel slot, extern/base.py:118-439)
# ---------------------------------------------------------------------------


def pdf_page_texts(raw: bytes) -> list[str]:
    """Per-page plain text from PDF bytes (pypdf backend). The returned pages
    feed the engine as one transcript turn each (SerializerPdfDoc.load
    semantics, custom_serialize.py:514-559)."""
    if _pypdf is None:
        raise NotImplementedError(
            "PDF text extraction needs pypdf — `pip install pypdf` outside "
            "the sandbox"
        )
    reader = _pypdf.PdfReader(io.BytesIO(raw))
    return [page.extract_text() or "" for page in reader.pages]


def pdf_positioned_lines(raw: bytes) -> list[str]:
    """Per-page positioned payloads ('@x,y:content' lines — the engine's
    pdf_reader wire format) from PDF bytes (pdfplumber backend). Plugging
    this in turns real PDFs into inputs for kernels/layout.py with zero
    engine changes: the column/sub-line geometry kernels are the same."""
    if _pdfplumber is None:
        raise NotImplementedError(
            "positioned PDF extraction needs pdfplumber — `pip install "
            "pdfplumber` outside the sandbox"
        )
    pages = []
    with _pdfplumber.open(io.BytesIO(raw)) as pdf:
        for page in pdf.pages:
            lines = [
                f"@{w['x0']:.0f},{w['top']:.0f}:{w['text']}"
                for w in page.extract_words()
            ]
            pages.append("\n".join(lines))
    return pages
