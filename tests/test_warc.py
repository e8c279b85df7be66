"""WARC codec (kernels/warc.py) + crawl ingest operator (operators/webcrawl.py)."""

from __future__ import annotations

import pytest

from deepdoctection_spark.kernels import warc as K
from deepdoctection_spark.operators import webcrawl as W


def _blob(payloads: list[bytes]) -> bytes:
    return b"".join(
        K.gzip_member(
            K.build_record(
                "resource",
                [("WARC-Target-URI", f"https://x.org/{i}")],
                p,
            )
        )
        for i, p in enumerate(payloads)
    )


def test_kernel_round_trip_multi_member():
    payloads = [b"alpha", b"", b"payload with spaces and \xf0\x9f\x8c\x90 utf8"]
    recs = K.parse_warc_blob(_blob(payloads))
    assert [idx for idx, _, _ in recs] == [0, 1, 2]
    for i, (_, headers, payload) in enumerate(recs):
        assert payload == payloads[i]
        assert headers["warc-type"] == "resource"
        assert headers["warc-target-uri"] == f"https://x.org/{i}"
        assert int(headers["content-length"]) == len(payloads[i])


def test_member_split_never_crosses_boundaries():
    # a payload that CONTAINS a full serialized record must not confuse the
    # member walk (framing comes from gzip, not from content scanning)
    inner = K.build_record("resource", [], b"inner")
    recs = K.parse_warc_blob(_blob([inner, b"tail"]))
    assert [p for _, _, p in recs] == [inner, b"tail"]


def test_truncated_member_raises():
    blob = _blob([b"hello"])
    with pytest.raises(ValueError, match="truncated gzip member"):
        K.split_members(blob[:-5])


def test_corrupt_member_raises():
    blob = _blob([b"hello", b"world"])
    bad = blob[:10] + b"\x00\x00\x00\x00" + blob[14:]
    with pytest.raises(ValueError):
        K.parse_warc_blob(bad)


def test_content_length_violation_raises():
    rec = K.build_record("resource", [], b"abcdef")
    torn = rec.replace(b"Content-Length: 6", b"Content-Length: 99")
    with pytest.raises(ValueError, match="payload truncated"):
        K.parse_record(torn)


def test_spark_round_trip_and_quarantine(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    blobs = W.synth_warc(docs)
    poison = spark.createDataFrame(
        [(999999, 1, b"not a gzip member at all")],
        "blob_id long, n_members int, content binary",
    )
    out = W.warc_records(blobs.unionByName(poison)).collect()
    good = [r for r in out if r["error"] is None]
    bad = [r for r in out if r["error"] is not None]
    assert len(bad) == 1 and bad[0]["blob_id"] == 999999
    docs_rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    resources = [r for r in good if r["warc_type"] == "resource"]
    assert len(resources) == len(docs_rows)
    for r in resources:
        did = int(r["url"].rsplit("/", 1)[1])
        assert r["content_length"] == len(docs_rows[did].encode())
        assert docs_rows[did].startswith(r["text_prefix"])
    infos = [r for r in good if r["warc_type"] == "warcinfo"]
    assert all(r["rec_idx"] == 0 and r["url"] is None for r in infos)


# ---------------------------------------------------------------------------
# property: arbitrary payload/header round trips survive the codec
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_payloads = st.lists(st.binary(max_size=400), min_size=1, max_size=8)
_token = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_./:",
    min_size=1, max_size=40,
)


@settings(max_examples=80, deadline=None, derandomize=True)
@given(_payloads, st.lists(st.tuples(_token, _token), max_size=4))
def test_property_round_trip(payloads, extra_headers):
    blob = b"".join(
        K.gzip_member(
            K.build_record(
                "resource",
                [("X-H%d" % j, v) for j, (_, v) in enumerate(extra_headers)],
                p,
            )
        )
        for p in payloads
    )
    recs = K.parse_warc_blob(blob)
    assert [p for _, _, p in recs] == payloads
    for _, headers, p in recs:
        assert int(headers["content-length"]) == len(p)
        for j, (_, v) in enumerate(extra_headers):
            assert headers[f"x-h{j}"] == v.strip()


# --- WARC→WET (HTTP response records → plain text) -------------------------


def test_http_response_round_trip_and_content_length_slice():
    body = b"<p>hello</p>JUNKJUNK"  # trailing junk beyond Content-Length
    msg = K.build_http_response(200, "OK", body[:12]) + b"JUNKJUNK"
    status, headers, got = K.parse_http_response(msg)
    assert status == 200
    assert headers["content-type"].startswith("text/html")
    assert got == b"<p>hello</p>"


def test_http_bad_status_line_raises():
    import pytest

    with pytest.raises(ValueError, match="status line"):
        K.parse_http_response(b"NOTHTTP 200 OK\r\n\r\nx")


def test_html_to_wet_keeps_boilerplate_drops_tags():
    html = ("<html><head><title>T</title></head><body>"
            "<nav> nav  text </nav><p>a b</p><br/><footer></footer></body></html>")
    assert K.html_to_wet(html) == "T\nnav  text\na b"


def test_wet_records_status_and_text(spark, sf_small):
    from deepdoctection_spark.operators.webcrawl import (
        synth_warc_responses,
        warc_wet_records,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = warc_wet_records(synth_warc_responses(docs))
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r["error"] is None for r in rows)
    for r in rows:
        did = int(r["url"].rsplit("/", 1)[1])
        if did % 11 == 0:
            assert r["http_status"] == 404 and r["wet_text"] == "not found"
        else:
            assert r["http_status"] == 200
            assert r["wet_text"].startswith(f"Doc {did}\nsite nav\nDoc {did}\n")
            assert r["wet_text"].endswith("\ncontact")
        assert r["wet_len"] == len(r["wet_text"])
        assert r["content_type"] == "text/html"


def test_wet_corrupt_blob_quarantines(spark):
    from deepdoctection_spark.operators.webcrawl import warc_wet_records

    blobs = spark.createDataFrame(
        [(1, 2, bytearray(b"\x1f\x8bgarbage"))],
        "blob_id long, n_members int, content binary",
    )
    rows = warc_wet_records(blobs).collect()
    assert len(rows) == 1 and rows[0]["error"] is not None


def test_html_to_wet_drops_script_style_comment_content():
    html = ("<html><head><script>var x = 1 > 0;</script><style>p{color:red}"
            "</style><!-- note > here --></head><body><p>keep me</p>"
            "</body></html>")
    assert K.html_to_wet(html) == "keep me"
