"""MJPEG-in-AVI container codec (stdlib + numpy only).

Implements the public RIFF/AVI layout (MSDN "AVI RIFF File Reference"):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader (56 bytes)
        LIST 'strl'
          'strh' AVIStreamHeader ('vids'/'MJPG', 56 bytes)
          'strf' BITMAPINFOHEADER (40 bytes, biCompression='MJPG')
      LIST 'movi'
        '00dc' <jpeg bytes> [zero pad to even]  × n_frames
      'idx1' AVIOLDINDEX (16 bytes per frame)

Every frame payload is a complete baseline JPEG (kernels/jpeg.py both
encodes and decodes them), so "video decode" = RIFF chunk walk + the
already-proven still-image codec per frame — the in-sandbox closure of the
reference's opaque-media decode seam (datapoint/convert.py:78-166), which
delegates stills and frames to external codec libraries the same way.

The reader is a defensive chunk walker: it honours declared sizes, even-byte
padding, and 'rec ' grouping sub-lists, and validates the idx1 frame count
against the movi payload count.
"""

from __future__ import annotations

import struct

_AVIH_FCC = b"avih"
_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def avi_encode_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap per-frame baseline JPEG payloads into a spec-shaped AVI."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    max_frame = max(len(f) for f in frames)
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<10I",
        usec,              # dwMicroSecPerFrame
        max_frame * fps,   # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_frame,         # dwSuggestedBufferSize
        width,
        height,
    ) + b"\x00" * 16       # dwReserved[4]
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0, 0,      # dwFlags, wPriority, wLanguage, dwInitialFrames
            1, fps,          # dwScale / dwRate = frame period
            0, len(frames),  # dwStart, dwLength (frames)
            max_frame,       # dwSuggestedBufferSize
            0xFFFFFFFF,      # dwQuality (default)
            0,               # dwSampleSize (0: one sample per chunk)
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24,
        b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(_AVIH_FCC, avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b""
    idx_entries = []
    for f in frames:
        # offset convention: from the start of the 'movi' fourcc to the
        # chunk's own fourcc (the most widely written variant)
        idx_entries.append((4 + len(movi_payload), len(f)))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _KEYFRAME, off, ln)
            for off, ln in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in [start, end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = pos + 8
        if payload + size > end:
            raise ValueError(
                f"chunk {fourcc!r} at {pos} overruns container ({size} bytes)"
            )
        yield fourcc, payload, size
        pos = payload + size + (size % 2)  # skip even-byte pad


def _collect_video_chunks(data: bytes, start: int, end: int, out: list[bytes]):
    for fourcc, payload, size in _walk(data, start, end):
        if fourcc == b"LIST" and data[payload : payload + 4] == b"rec ":
            _collect_video_chunks(data, payload + 4, payload + size, out)
        elif fourcc[2:4] in (b"dc", b"db"):
            out.append(data[payload : payload + size])


def avi_decode_mjpeg(raw: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an AVI container; return (width, height, fps, jpeg_frames).

    Raises ValueError on malformed containers (bad magic, truncated chunks,
    missing headers, index/frame-count mismatch) — callers route those rows
    to quarantine, never to a task failure.
    """
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    (riff_size,) = struct.unpack("<I", raw[4:8])
    end = min(8 + riff_size, len(raw))
    width = height = n_frames = usec = None
    frames: list[bytes] = []
    idx_count = 0
    for fourcc, payload, size in _walk(raw, 12, end):
        if fourcc == b"LIST":
            ltype = raw[payload : payload + 4]
            if ltype == b"hdrl":
                for fcc2, p2, s2 in _walk(raw, payload + 4, payload + size):
                    if fcc2 == _AVIH_FCC:
                        fields = struct.unpack("<10I", raw[p2 : p2 + 40])
                        usec, n_frames = fields[0], fields[4]
                        width, height = fields[8], fields[9]
            elif ltype == b"movi":
                _collect_video_chunks(raw, payload + 4, payload + size, frames)
        elif fourcc == b"idx1":
            idx_count = size // 16
    if width is None or usec is None:
        raise ValueError("missing avih header")
    if not frames:
        raise ValueError("no video chunks in movi list")
    if n_frames != len(frames) or (idx_count and idx_count != len(frames)):
        raise ValueError(
            f"frame count mismatch: avih={n_frames} movi={len(frames)} idx1={idx_count}"
        )
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("video chunk is not a JPEG (bad SOI)")
    return int(width), int(height), 1_000_000 // int(usec), frames
