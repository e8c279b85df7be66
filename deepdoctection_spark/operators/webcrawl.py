"""WARC crawl-archive ingest: the Common Crawl container as a first-class
source (kernels/warc.py holds the stdlib codec).

Reference analogue: the byte-serializer sources (SerializerFiles /
SerializerPdfDoc, dd/utils — one datapoint per container unit); here the
container is the web-archive format a 100 TB crawl corpus actually arrives
in. Spark-first shape:

- Real ingest (`warc_records`) is ONE narrow `mapInPandas` stage over a
  table of (blob_id, content binary) — at production scale that table is
  `spark.read.format("binaryFile").load("s3://…/*.warc.gz")`, so parsing
  runs scan-aligned with ZERO shuffles and O(one inflated member) memory
  per task (kernels/warc.split_members streams via `unused_data`).
- The synthesis side (`synth_warc`) exists for the oracle fixture: it
  assembles deterministic multi-member `.warc.gz` blobs from the documents
  table (one groupBy shuffle — fixture-only; real pipelines read archives,
  they don't write them from rows).

Every parsed field the query exposes (type, target URI, Content-Length,
payload prefix) comes out of the genuine gzip-inflate + header parse, and
the DuckDB oracle recomputes it closed-form from `documents` — the same
round-trip-vs-formula philosophy as the image codecs (multimodal_ops.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepdoctection_spark.kernels import warc as K

INFO_PAYLOAD = b"software: ddspark-crawler/1.0\r\nformat: WARC file version 1.1\r\n"
WARC_DATE = "2026-01-01T00:00:00Z"
PREFIX_CHARS = 32

BLOB_SCHEMA = "blob_id long, n_members int, content binary"
REC_SCHEMA = (
    "blob_id long, rec_idx int, warc_type string, url string, "
    "content_length long, text_prefix string, error string"
)


def _record_id(doc_id: int) -> str:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def doc_url(doc_id_col) -> F.Column:
    """Deterministic target URI, same host scheme as weburl.host_quota."""
    return F.concat(
        F.lit("https://h"), (doc_id_col % 7).cast("string"),
        F.lit(".example.org/p/"), doc_id_col.cast("string"),
    )


def synth_warc(docs: DataFrame, per_blob: int = 8) -> DataFrame:
    """documents → deterministic `.warc.gz` blobs: member 0 is a warcinfo
    record, then one `resource` record per doc (ascending doc_id), each its
    own gzip member (the Common Crawl layout)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob_id = int(pdf["blob_id"].iloc[0])
        members = [
            K.gzip_member(
                K.build_record(
                    "warcinfo",
                    [("WARC-Date", WARC_DATE),
                     ("WARC-Record-ID", _record_id(-1 - blob_id))],
                    INFO_PAYLOAD,
                )
            )
        ]
        for did, text, url in zip(
            pdf["doc_id"].tolist(), pdf["text"].tolist(), pdf["url"].tolist()
        ):
            members.append(
                K.gzip_member(
                    K.build_record(
                        "resource",
                        [("WARC-Date", WARC_DATE),
                         ("WARC-Record-ID", _record_id(int(did))),
                         ("WARC-Target-URI", url),
                         ("Content-Type", "text/plain")],
                        str(text).encode("utf-8"),
                    )
                )
            )
        return pd.DataFrame(
            [(blob_id, len(members), b"".join(members))],
            columns=["blob_id", "n_members", "content"],
        )

    base = docs.select(
        "doc_id", "text",
        F.expr(f"doc_id div {per_blob}").alias("blob_id"),
        doc_url(F.col("doc_id")).alias("url"),
    )
    return base.groupBy("blob_id").applyInPandas(build, schema=BLOB_SCHEMA)


def warc_records(blobs: DataFrame) -> DataFrame:
    """Parse `.warc.gz` blobs → one row per record. Narrow mapInPandas
    stage; malformed blobs quarantine to a single error row (never throw),
    matching the engine-wide poison-row contract."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, raw in zip(pdf["blob_id"].tolist(), pdf["content"].tolist()):
                bid = int(bid)
                try:  # row quarantine
                    for idx, headers, payload in K.parse_warc_blob(bytes(raw)):
                        wtype = headers.get("warc-type", "")
                        is_doc = wtype == "resource"
                        rows.append((
                            bid, idx, wtype,
                            headers.get("warc-target-uri") if is_doc else None,
                            int(headers["content-length"]),
                            payload.decode("utf-8")[:PREFIX_CHARS]
                            if is_doc else None,
                            None,
                        ))
                except Exception as exc:
                    rows.append((
                        bid, None, None, None, None, None,
                        f"{type(exc).__name__}: {exc}"[:200],
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "blob_id", "rec_idx", "warc_type", "url",
                    "content_length", "text_prefix", "error",
                ],
            )

    return blobs.select("blob_id", "content").mapInPandas(parse, schema=REC_SCHEMA)


# ---------------------------------------------------------------------------
# robots.txt crawl-policy filtering (RFC 9309 longest-match core)
# ---------------------------------------------------------------------------


def _agent_lines(robots: DataFrame) -> DataFrame:
    """Explode robots.txt bodies into lines tagged with the governing
    `User-agent` group (`cur_agent` = the most recent preceding agent name,
    tracked with one last-non-null window — foreign-agent groups like a
    blanket `User-agent: evilbot / Disallow: /` must not leak into our
    verdicts). Shared by the rule and crawl-delay parsers."""
    from pyspark.sql.window import Window

    ln = F.trim(F.col("line"))
    agent = F.lower(F.regexp_extract(ln, r"(?i)^user-agent\s*:\s*(\S+)", 1))
    w = (
        Window.partitionBy("host").orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        robots.select(
            "host",
            F.posexplode(F.split("robots_txt", "\n")).alias("line_no", "line"),
        )
        .withColumn(
            "cur_agent",
            F.last(F.when(agent != "", agent), ignorenulls=True).over(w),
        )
    )


def robots_rules(robots: DataFrame) -> DataFrame:
    """Parse robots.txt bodies → (host, is_allow, prefix, rule_len).

    Real group semantics via `_agent_lines`; comments, blank lines and
    empty-path Disallow (spec: matches nothing) drop out. Scope note:
    RFC 9309 prefix rules; the `*`/`$` wildcard extension is not
    implemented. Output is hosts×rules-sized — broadcast it at the
    decision join."""
    ln = F.trim(F.col("line"))
    lines = _agent_lines(robots)
    rule_type = F.lower(F.regexp_extract(ln, r"(?i)^(allow|disallow)\s*:", 1))
    prefix = F.regexp_extract(ln, r"(?i)^(?:allow|disallow)\s*:\s*(\S+)", 1)
    return (
        lines.where((F.col("cur_agent") == "*") & (rule_type != "") & (prefix != ""))
        .select(
            "host",
            (rule_type == "allow").alias("is_allow"),
            prefix.alias("prefix"),
            F.length(prefix).cast("int").alias("rule_len"),
        )
    )


def robots_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """Crawl-policy verdict per URL: among the host's rules whose prefix
    matches the path, the LONGEST wins; ties go to Allow (RFC 9309 §2.2.2);
    no match → allowed. ONE broadcast left join (rules are hosts×lines —
    always model-sized) + one per-URL window; URLs stream, nothing else
    shuffles, so the filter runs scan-aligned over a 10^10-row frontier."""
    from pyspark.sql.window import Window

    j = urls.join(F.broadcast(rules), on="host", how="left")
    hit = F.col("prefix").isNotNull() & F.col("path").startswith(F.col("prefix"))
    ranked = j.select(
        "doc_id", "host", "path",
        F.when(hit, F.col("prefix")).alias("m_prefix"),
        F.when(hit, F.col("rule_len")).otherwise(F.lit(-1)).alias("m_len"),
        F.when(hit, F.col("is_allow")).alias("m_allow"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("m_len").desc(),
        F.col("m_allow").desc_nulls_last(),
        F.col("m_prefix").asc_nulls_last(),
    )
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id", "host", "path",
            F.coalesce(F.col("m_allow"), F.lit(True)).alias("allowed"),
            F.col("m_prefix").alias("matched_prefix"),
        )
    )


# ---------------------------------------------------------------------------
# frontier politeness scheduling (per-host Crawl-delay fetch slots)
# ---------------------------------------------------------------------------


def robots_delays(robots: DataFrame) -> DataFrame:
    """Parse `Crawl-delay: <seconds>` under the `User-agent: *` group →
    (host, delay_ms). When a group states the directive more than once the
    LARGEST value wins (conservative politeness — the de-facto extension has
    no tie rule). Hosts without the directive are simply absent; the
    scheduler fills its default there. Output is hosts-sized — broadcast."""
    delay = F.regexp_extract(
        F.trim(F.col("line")), r"(?i)^crawl-delay\s*:\s*(\d+)", 1
    )
    return (
        _agent_lines(robots)
        .where((F.col("cur_agent") == "*") & (delay != ""))
        .groupBy("host")
        .agg((F.max(delay.cast("long")) * 1000).alias("delay_ms"))
    )


def frontier_schedule(
    urls: DataFrame,
    delays: DataFrame,
    n_fetchers: int = 64,
    default_delay_ms: int = 1000,
) -> DataFrame:
    """Politeness scheduler over a URL frontier: per host, rank URLs by
    (priority DESC, path) and assign fetch slot k the start time
    ``k * delay_ms``; every URL of a host lands on the same fetcher shard
    (md5(host) % n_fetchers) so connection reuse and the politeness clock
    stay fetcher-local.

    Plan shape: ONE broadcast join (delays are hosts-sized) + ONE window
    keyed by host — the frontier streams, nothing else shuffles, so this is
    a single host-hash exchange over a 10^10-row frontier. Per-host slotting
    is inherently sequential (politeness serializes each host anyway); hosts
    so large their partition skews are capped upstream by
    weburl.host_quota_sample before scheduling."""
    from pyspark.sql.window import Window

    j = urls.join(F.broadcast(delays), on="host", how="left")
    delay_ms = F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms)).cast("long")
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("path"))
    slot = (F.row_number().over(w) - 1).cast("int")
    fetcher = (
        F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10).cast("long")
        % n_fetchers
    ).cast("int")
    return j.select(
        "doc_id", "host", "path", F.col("priority").cast("int").alias("priority"),
        fetcher.alias("fetcher"),
        slot.alias("slot"),
        delay_ms.alias("delay_ms"),
        (slot.cast("long") * delay_ms).alias("fetch_at_ms"),
    )


# ---------------------------------------------------------------------------
# sitemap ingest (sitemaps.org urlset XML, JVM-side parse) + discovery diff
# ---------------------------------------------------------------------------

_SITEMAP_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
)


def synth_sitemaps(docs: DataFrame) -> DataFrame:
    """documents → one deterministic sitemaps.org urlset per host: every doc
    URL of the host plus 'ghost' entries (url_id = doc_id + 1_000_000 for
    doc_id % 5 == 0, hosted on the PARENT doc's host) the frontier has never
    seen — so the discovery diff has both outcomes. lastmod/priority derive
    closed-form from url_id. Fixture-only (one groupBy); real pipelines read
    urlset bodies out of fetched responses."""
    d = F.col("doc_id")
    ids = docs.select(d.alias("url_id"), (d % 7).alias("hk")).unionByName(
        docs.where(d % 5 == 0).select(
            (d + 1000000).alias("url_id"), (d % 7).alias("hk")
        )
    )
    uid = F.col("url_id")
    host = F.concat(F.lit("h"), F.col("hk").cast("string"), F.lit(".example.org"))
    entry = F.concat(
        F.lit("  <url><loc>https://"), host, F.lit("/p/"), uid.cast("string"),
        F.lit("</loc><lastmod>2026-01-"),
        F.lpad(((uid % 28) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><priority>0."), (uid % 10).cast("string"),
        F.lit("</priority></url>"),
    )
    return (
        ids.select(host.alias("host"), entry.alias("entry"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit(_SITEMAP_HEAD),
                F.concat_ws("\n", F.sort_array(F.collect_list("entry"))),
                F.lit("\n</urlset>\n"),
            ).alias("xml")
        )
    )


def sitemap_entries(sitemaps: DataFrame) -> DataFrame:
    """Parse urlset XML → (host, loc, lastmod, priority_pct). Entirely
    JVM-side: one `regexp_extract_all` over the body + explode, then field
    extracts — no Python crosses, so parsing runs scan-aligned over fetched
    sitemap bodies (each `<url>` element must sit on one line, the layout
    crawl-served sitemaps use). Absent optional fields → NULL; priority is
    kept as exact integer percent (0.7 → 70)."""
    e = F.col("entry")
    lm = F.regexp_extract(e, "<lastmod>([^<]*)</lastmod>", 1)
    # any spec-legal 0.0-1.0 value, incl. "1.0" and multi-digit fractions;
    # round before the int cast so 0.29*100 = 28.999… lands on 29, not 28
    pr = F.regexp_extract(e, r"<priority>([01](?:\.\d+)?)</priority>", 1)
    return (
        sitemaps.select(
            "host",
            F.explode(
                F.regexp_extract_all("xml", F.lit("<url>(.*?)</url>"), 1)
            ).alias("entry"),
        )
        .select(
            "host",
            F.regexp_extract(e, "<loc>([^<]*)</loc>", 1).alias("loc"),
            F.when(lm != "", lm).alias("lastmod"),
            F.when(
                pr != "", F.round(pr.cast("double") * 100).cast("int")
            ).alias("priority_pct"),
        )
    )


def sitemap_discover(entries: DataFrame, frontier: DataFrame) -> DataFrame:
    """Discovery diff: which sitemap URLs the crawl already knows. ONE hash
    join on url (frontier must be url-unique — it is, post `url_dedup`);
    both sides stream, AQE handles host skew, so the diff is two exchanges
    at 10^10 rows — never a broadcast of either big side."""
    f = frontier.select(F.col("url").alias("loc"), F.lit(True).alias("known"))
    return entries.join(f, on="loc", how="left").withColumn(
        "known", F.coalesce(F.col("known"), F.lit(False))
    )


# ---------------------------------------------------------------------------
# WARC response records → WET plain-text conversion (the WARC→WET product)
# ---------------------------------------------------------------------------

WET_SCHEMA = (
    "blob_id long, url string, http_status int, content_type string, "
    "wet_len int, wet_text string, error string"
)


def synth_warc_responses(docs: DataFrame, per_blob: int = 8) -> DataFrame:
    """documents → `.warc.gz` blobs of `response` records carrying REAL
    HTTP/1.1 messages: docs with doc_id % 11 == 0 serve a 404 error page,
    the rest a 200 HTML page (title/nav/h1/body/footer template around the
    doc text). Fixture-only synthesis; real pipelines read fetched
    archives."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob_id = int(pdf["blob_id"].iloc[0])
        members = []
        for did, text, url in zip(
            pdf["doc_id"].tolist(), pdf["text"].tolist(), pdf["url"].tolist()
        ):
            did = int(did)
            if did % 11 == 0:
                http = K.build_http_response(
                    404, "Not Found", b"<html><body><p>not found</p></body></html>"
                )
            else:
                body = (
                    f"<html><head><title>Doc {did}</title></head>"
                    f"<body><nav>site nav</nav><h1>Doc {did}</h1>"
                    f"<p>{text}</p><footer>contact</footer></body></html>"
                ).encode("utf-8")
                http = K.build_http_response(200, "OK", body)
            members.append(
                K.gzip_member(
                    K.build_record(
                        "response",
                        [("WARC-Date", WARC_DATE),
                         ("WARC-Record-ID", _record_id(did)),
                         ("WARC-Target-URI", url),
                         ("Content-Type", "application/http; msgtype=response")],
                        http,
                    )
                )
            )
        return pd.DataFrame(
            [(blob_id, len(members), b"".join(members))],
            columns=["blob_id", "n_members", "content"],
        )

    base = docs.select(
        "doc_id", "text",
        F.expr(f"doc_id div {per_blob}").alias("blob_id"),
        doc_url(F.col("doc_id")).alias("url"),
    )
    return base.groupBy("blob_id").applyInPandas(build, schema=BLOB_SCHEMA)


def warc_wet_records(blobs: DataFrame) -> DataFrame:
    """WARC→WET: parse `.warc.gz` blobs, keep `response` records, parse the
    HTTP message (status, media type before any ';' parameter) and emit the
    WET plain-text conversion of the body (kernels/warc.html_to_wet). Same
    shape as `warc_records`: ONE narrow mapInPandas stage over binary blobs
    — scan-aligned, zero shuffles, O(one member) memory — with malformed
    blobs quarantined to a single error row."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, raw in zip(pdf["blob_id"].tolist(), pdf["content"].tolist()):
                bid = int(bid)
                try:  # row quarantine
                    for _idx, headers, payload in K.parse_warc_blob(bytes(raw)):
                        if headers.get("warc-type") != "response":
                            continue
                        status, http_headers, body = K.parse_http_response(payload)
                        wet = K.html_to_wet(body.decode("utf-8"))
                        ctype = http_headers.get("content-type", "")
                        rows.append((
                            bid, headers.get("warc-target-uri"), status,
                            ctype.partition(";")[0].strip(), len(wet), wet, None,
                        ))
                except Exception as exc:
                    rows.append((
                        bid, None, None, None, None, None,
                        f"{type(exc).__name__}: {exc}"[:200],
                    ))
            yield pd.DataFrame(
                rows,
                columns=["blob_id", "url", "http_status", "content_type",
                         "wet_len", "wet_text", "error"],
            )

    return blobs.select("blob_id", "content").mapInPandas(parse, schema=WET_SCHEMA)
