"""Pure-stdlib WARC/1.1 codec: gzip-member writer + streaming member parser.

WARC (ISO 28500) is THE ingest format for web-scale training corpora —
Common Crawl alone publishes petabytes of `.warc.gz` where every record is
its own gzip member so readers can split a file at member boundaries
without decompressing the whole archive. The reference ingests documents
through per-file dataflows (SerializerFiles, utils/fs.py; pdf/image byte
loaders datapoint/convert.py:78-166); a crawl-scale engine needs the WARC
container itself. Implemented from the public spec, stdlib `zlib` only.

Writer: one gzip member per record (the Common Crawl layout), record =
version line + CRLF header block + CRLF CRLF + payload + CRLF CRLF.
Parser: walks members via `zlib.decompressobj(wbits=31)` + `unused_data`
(never inflates two members at once, O(member) memory — the property that
makes a 1 GiB `.warc.gz` split streamable inside one Spark task), then
parses each record's header block and slices the payload by the mandatory
Content-Length. Malformed members raise ValueError → row quarantine
upstream (operators/webcrawl.py), matching every other codec kernel here.
"""

from __future__ import annotations

import zlib

CRLF = b"\r\n"
_VERSIONS = (b"WARC/1.1", b"WARC/1.0")


def build_record(warc_type: str, headers: list[tuple[str, str]], payload: bytes) -> bytes:
    """Serialize one WARC record (version line, named headers in the given
    order, mandatory WARC-Type + Content-Length added here, two trailing
    CRLFs per spec §4)."""
    lines = [b"WARC/1.1"]
    lines.append(b"WARC-Type: " + warc_type.encode("ascii"))
    for k, v in headers:
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return CRLF.join(lines) + CRLF + CRLF + payload + CRLF + CRLF


def gzip_member(data: bytes, level: int = 6) -> bytes:
    """One self-contained gzip member (wbits=31 writes the gzip wrapper with
    mtime 0 — byte-deterministic for a given input, unlike gzip.compress
    which stamps wall-clock time into the header)."""
    co = zlib.compressobj(level, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def split_members(blob: bytes) -> list[bytes]:
    """Inflate a concatenation of gzip members into the list of member
    payloads. Uses `unused_data` to find each next member boundary — the
    streaming idiom that never holds more than one inflated member."""
    out: list[bytes] = []
    buf = blob
    while buf:
        d = zlib.decompressobj(wbits=31)
        try:
            raw = d.decompress(buf)
        except zlib.error as exc:  # torn/corrupt member
            raise ValueError(f"bad gzip member at offset {len(blob) - len(buf)}: {exc}")
        if not d.eof:
            raise ValueError("truncated gzip member (stream ended mid-member)")
        out.append(raw + d.flush())
        buf = d.unused_data
    return out


def parse_record(raw: bytes) -> tuple[dict[str, str], bytes]:
    """Parse one inflated WARC record → (lower-cased header dict, payload).
    Validates the version line, the mandatory Content-Length, and the two
    record-terminating CRLFs; raises ValueError on any violation."""
    head_end = raw.find(CRLF + CRLF)
    if head_end < 0:
        raise ValueError("no header/payload separator")
    lines = raw[:head_end].split(CRLF)
    if lines[0] not in _VERSIONS:
        raise ValueError(f"bad version line {lines[0][:20]!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line {ln[:40]!r}")
        headers[k.strip().decode("utf-8").lower()] = v.strip().decode("utf-8")
    if "content-length" not in headers:
        raise ValueError("missing Content-Length")
    n = int(headers["content-length"])
    body_start = head_end + 4
    payload = raw[body_start : body_start + n]
    if len(payload) != n:
        raise ValueError(f"payload truncated: {len(payload)} < {n}")
    if raw[body_start + n : body_start + n + 4] != CRLF + CRLF:
        raise ValueError("missing record-terminating CRLFCRLF")
    return headers, payload


def parse_warc_blob(blob: bytes) -> list[tuple[int, dict[str, str], bytes]]:
    """Full blob → [(member_index, headers, payload)] in file order."""
    return [
        (i, *parse_record(raw)) for i, raw in enumerate(split_members(blob))
    ]


# ---------------------------------------------------------------------------
# HTTP response payloads + WET conversion (the Common Crawl WARC→WET product)
# ---------------------------------------------------------------------------

import re as _re

_TAG = _re.compile(r"<[^>]*>")
_NONCONTENT = _re.compile(
    r"(?is)<!--.*?-->|<(script|style)[^>]*>.*?</\1\s*>"
)


def build_http_response(status: int, reason: str, body: bytes,
                        content_type: str = "text/html; charset=utf-8") -> bytes:
    """Serialize an HTTP/1.1 response message (the payload of a WARC
    `response` record, WARC Content-Type `application/http;
    msgtype=response`)."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("ascii") + body


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Parse an HTTP response message → (status, lower-cased headers, body).
    Body is sliced by Content-Length when present (ignoring trailing junk),
    else everything after the header block. Raises ValueError on a
    malformed status line — row quarantine upstream."""
    head_end = payload.find(CRLF + CRLF)
    if head_end < 0:
        raise ValueError("no HTTP header/body separator")
    lines = payload[:head_end].split(CRLF)
    first = lines[0].split(None, 2)
    if len(first) < 2 or not first[0].startswith(b"HTTP/") or not first[1].isdigit():
        raise ValueError(f"bad HTTP status line {lines[0][:40]!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(b":")
        if sep:
            headers[k.strip().decode("utf-8").lower()] = v.strip().decode("utf-8")
    body = payload[head_end + 4:]
    if "content-length" in headers:
        body = body[: int(headers["content-length"])]
    return int(first[1]), headers, body


def html_to_wet(html: str) -> str:
    """The WET plain-text conversion: every tag becomes a line break, lines
    are trimmed, empties drop, survivors join with '\\n'. Deliberately the
    DUMB whole-page conversion the Common Crawl WET product applies —
    boilerplate REMOVAL is a downstream, separately-scored concern
    (kernels/html.py's density-based extractor); WET keeps nav/footer/title
    text verbatim — but script/style element CONTENT and comments are not
    text and drop entirely (the one removal the WET product does do)."""
    html = _NONCONTENT.sub("\n", html)
    lines = (seg.strip() for seg in _TAG.sub("\n", html).split("\n"))
    return "\n".join(ln for ln in lines if ln)
