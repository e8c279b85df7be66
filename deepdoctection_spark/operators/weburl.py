"""Canonical-URL normalization + URL-level dedup — crawl-pipeline keying.

Web-scale corpora are keyed by URL before any content hash is computed:
the same page is fetched as ``http://www.Example.com/a/?utm_source=x`` and
``https://example.com/a`` and must collapse to ONE canonical key or every
downstream stage (frontier dedup, recrawl scheduling, per-site quotas)
double-counts it. The normalization here is the standard recipe: lowercase
scheme+host, strip a leading ``www.``, drop default ports (http:80 /
https:443), collapse trailing slashes on the path, drop the fragment, drop
``utm_*`` tracking parameters and sort the rest.

Everything is pure column expressions (regexp_extract / split / filter /
array_sort / concat) — zero UDF, no shuffle for the canonical key itself;
the dedup verdict is one window over the canonical key. At 100 TB this is
a narrow codegen map plus a single hash shuffle on the canonical URL, the
same shape as exact content dedup.

Reference analogue: deterministic external-id derivation
(/root/reference/deepdoctection/datapoint/convert.py md5 helpers) — here
the id is a normalized URL rather than a content hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCHEME = r"^[A-Za-z][A-Za-z0-9+.-]*"


def canonical_url(u):
    """Column → Column: the canonical form of an absolute http(s) URL."""
    scheme = F.lower(F.regexp_extract(u, f"({_SCHEME})://", 1))
    hostport = F.lower(F.regexp_extract(u, f"{_SCHEME}://([^/?#]*)", 1))
    hp = F.split(hostport, ":")
    host = F.regexp_replace(F.element_at(hp, 1), r"^www\.", "")
    port = F.when(F.size(hp) > 1, F.element_at(hp, 2)).otherwise(F.lit(""))
    is_default = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    portpart = F.when(is_default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.regexp_extract(u, f"{_SCHEME}://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.startswith("utm_"),
    )
    qn = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, portpart, path,
        F.when(qn == "", F.lit("")).otherwise(F.concat(F.lit("?"), qn)),
    )


def host_quota_sample(df: DataFrame, host_col: str = "host",
                      id_col: str = "doc_id", k: int = 10) -> DataFrame:
    """Cap each host's contribution at ``k`` documents — the per-domain
    quota every web-derived training corpus applies so a single huge site
    cannot dominate the mix. Selection is a DETERMINISTIC uniform draw:
    rank within host by ``md5(id)`` (a stable pseudo-random order both
    engines compute identically), keep the first ``k``. One window shuffle
    on host; re-runs and cluster-size changes return the same sample."""
    w = Window.partitionBy(host_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("host_rank", F.row_number().over(w).cast("int"))
        .where(F.col("host_rank") <= k)
    )


def url_dedup(df: DataFrame, url_col: str = "raw_url",
              id_col: str = "doc_id") -> DataFrame:
    """Per-row canonical key + dedup verdict: ``is_canonical_rep`` marks the
    lowest-id row of each canonical group (the fetch to keep). One window
    over the canonical key — a single hash shuffle, skew-bounded by the
    group sizes (a hot URL's group is capped by its variant count, not the
    corpus)."""
    canon = df.withColumn("canonical_url", canonical_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url")
    return canon.select(
        id_col,
        url_col,
        "canonical_url",
        (F.col(id_col) == F.min(id_col).over(w)).alias("is_canonical_rep"),
        F.count("*").over(w).cast("int").alias("n_variants"),
    )


def resolve_redirects(edges: DataFrame, max_hops: int = 32) -> DataFrame:
    """Resolve HTTP redirect chains to their terminal URL by pointer
    doubling: each round joins the current pointer table with itself, so
    after k rounds every pointer has advanced up to 2^k hops — chains of
    length ≤ max_hops resolve in ceil(log2(max_hops)) self equi-joins
    instead of max_hops sequential ones. The canonical web-graph
    canonicalization step before URL dedup: at 10^10 redirect edges each
    round is ONE hash self-join (AQE-planned) and lineage is cut per round
    with localCheckpoint (the dedupclusters discipline), never a driver
    collect.

    edges: (src, dst) — a functional graph (one outgoing redirect per src;
    dedupe upstream if a crawl recorded several). Returns one row per src:
    (src, final_url, hops, resolved) where resolved=False marks redirect
    LOOPS (the pointer never reaches a terminal URL — a real crawl signal,
    those URLs are dropped from the frontier)."""
    import math

    cur = edges.select(
        "src", F.col("dst").alias("ptr"), F.lit(1).cast("int").alias("hops")
    )
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        hop = cur.select(
            F.col("src").alias("ptr"),
            F.col("ptr").alias("nxt"),
            F.col("hops").alias("add"),
        )
        cur = (
            cur.join(hop, on="ptr", how="left")
            .select(
                "src",
                F.coalesce("nxt", "ptr").alias("ptr"),
                (F.col("hops") + F.coalesce("add", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    srcs = edges.select(F.col("src").alias("ptr")).distinct().withColumn(
        "is_src", F.lit(True)
    )
    return (
        cur.join(srcs, on="ptr", how="left")
        .select(
            "src",
            F.col("ptr").alias("final_url"),
            F.col("hops").cast("int").alias("hops"),
            F.col("is_src").isNull().alias("resolved"),
        )
    )


def host_rollup(
    pages: DataFrame,
    blocked_drop_ppm: int = 300_000,
    dup_sample_ppm: int = 100_000,
) -> DataFrame:
    """Domain-level curation rollup — the FineWeb-style decision table that
    keeps/samples/drops whole hosts before any per-page work. pages:
    (host, fingerprint, n_tokens, blocked). Per host: page count, exact-dup
    ratio (pages minus distinct fingerprints), robots-blocked ratio and
    mean tokens — all as exact integers (ppm / milli-tokens, the engine-wide
    determinism contract) — then the verdict: 'drop' when the blocked share
    clears blocked_drop_ppm, else 'sample' when the dup share clears
    dup_sample_ppm, else 'keep'.

    ONE hash agg keyed by host (countDistinct plans as a two-phase partial
    agg); at 10^10 pages the output is hosts-sized, so the rollup is the
    cheapest possible gate to run FIRST in a curation cascade."""
    n = F.col("n_pages")
    agg = pages.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("fingerprint").alias("n_unique"),
        F.sum(F.col("blocked").cast("long")).alias("n_blocked"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    dup_ppm = F.floor((n - F.col("n_unique")) * 1_000_000 / n).cast("long")
    blocked_ppm = F.floor(F.col("n_blocked") * 1_000_000 / n).cast("long")
    mean_tokens_milli = F.floor(F.col("total_tokens") * 1_000 / n).cast("long")
    return agg.select(
        "host", "n_pages", "n_unique",
        dup_ppm.alias("dup_ppm"),
        blocked_ppm.alias("blocked_ppm"),
        mean_tokens_milli.alias("mean_tokens_milli"),
        F.when(blocked_ppm >= blocked_drop_ppm, F.lit("drop"))
        .when(dup_ppm >= dup_sample_ppm, F.lit("sample"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )


def crawl_snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """URL-level diff between two crawl snapshots — the change-detection
    feed for revisit scheduling: ONE url-keyed full-outer hash join of
    (url, fingerprint) tables, then a pure-column status verdict:
    'added' (no old row), 'deleted' (no new row), 'changed' (fingerprints
    differ), 'unchanged'. Both snapshot scans prune to two columns; at
    10^10 URLs this is one exchange per side with AQE skew handling, and
    the downstream host change-rate rollup reuses host_rollup's
    hosts-keyed agg shape."""
    o = old.select("url", F.col("fingerprint").alias("old_fp"))
    n = new.select("url", F.col("fingerprint").alias("new_fp"))
    ofp, nfp = F.col("old_fp"), F.col("new_fp")
    return (
        o.join(n, on="url", how="full_outer")
        .select(
            "url", "old_fp", "new_fp",
            F.when(ofp.isNull(), F.lit("added"))
            .when(nfp.isNull(), F.lit("deleted"))
            .when(ofp != nfp, F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


# page-directive regexes — RE2-safe, quote-agnostic, case-insensitive
_META_ROBOTS = (
    r"""(?i)<meta[^>]*name\s*=\s*["']robots["'][^>]*"""
    r"""content\s*=\s*["']([^"']*)["']"""
)
_REL_CANONICAL = (
    r"""(?i)<link[^>]*rel\s*=\s*["']canonical["'][^>]*"""
    r"""href\s*=\s*["']([^"']*)["']"""
)


def page_directives(pages: DataFrame, col: str = "html") -> DataFrame:
    """Per-page indexing directives a compliant crawl pipeline must honor
    BEFORE any extraction work is spent: the robots meta tag's
    noindex/nofollow verdicts (RFC 9309's page-level counterpart — noindex
    pages must not enter the corpus, nofollow pages contribute no frontier
    links) and the rel=canonical target (which overrides the fetched URL
    as the dedup key, catching mirrors the URL normalizer cannot).

    Two case-insensitive quote-agnostic regexp_extracts + substring
    verdicts — pure column expressions, a narrow map over the page scan,
    zero shuffle; at 10^10 pages this gate runs inside the same codegen
    stage as the fetch-status filter. Returns (url, noindex, nofollow,
    canonical) with canonical NULL when absent."""
    robots = F.lower(F.regexp_extract(F.col(col), _META_ROBOTS, 1))
    canon = F.regexp_extract(F.col(col), _REL_CANONICAL, 1)
    return pages.select(
        "url",
        robots.contains("noindex").cast("int").alias("noindex"),
        robots.contains("nofollow").cast("int").alias("nofollow"),
        F.when(canon != "", canon).alias("canonical"),
    )
