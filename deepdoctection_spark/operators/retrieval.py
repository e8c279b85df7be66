"""Query-time ranked retrieval over the corpus: boolean AND, exact phrase
match via positional posting adjacency, and BM25-scored top-k search.

`textstats.tfidf_bm25` is the INDEX-side surface (per-document top terms);
this module is the SEARCH-side surface: given query terms, find and rank the
matching documents. The reference's analogue is the consumption API over
extracted text (Page.text / Page.chunks, /root/reference/deepdoctection/
datapoint/view.py:660-764) feeding a downstream retrieval stack; here the
retrieval itself is in-engine.

Scale shape (the part that matters at 100 TB): the query-term table is
model-sized (a handful of rows) and BROADCAST, so the per-document work is a
map-side hash probe; the only corpus-wide shuffles are the one explode+agg
that builds the (doc, token, tf) postings and the per-doc score aggregation.
The final top-k window runs over only the documents that hit >=1 query term.

Query terms are derived deterministically from the corpus itself (document-
frequency rank band below the stopword head) so tests and oracles need no
external fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deepdoctection_spark.operators.dedup import normalized_text

# Integer micro-units for cross-engine exact comparison (the token_surprisal
# determinism contract): quantize each per-term log BEFORE multiplying.
_MICRO = 1_000_000


def _tf(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tf) postings — one explode + one map-side-combinable
    hash aggregation over the corpus scan."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("token"),
    ).where(F.length("token") > 0)
    return toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("tf")
    )


def query_terms(
    tf: DataFrame, start_rank: int, n_terms: int, min_df: int = 2
) -> DataFrame:
    """The n_terms tokens at document-frequency ranks [start_rank,
    start_rank+n_terms) — a deterministic mid-frequency query (below the
    stopword head, above the hapax tail). Returns (token, df, qrank).

    The global rank window is bounded by the min_df cut (long tail dropped
    BEFORE the sort, same rationale as textstats.corpus_vocab)."""
    dfr = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    w = Window.orderBy(F.desc("df"), "token")
    return (
        dfr.where(F.col("df") >= min_df)
        .withColumn("qrank", F.row_number().over(w).cast("int"))
        .where(F.col("qrank").between(start_rank, start_rank + n_terms - 1))
    )


def boolean_and_search(
    docs: DataFrame, start_rank: int = 10, n_terms: int = 3
) -> DataFrame:
    """Conjunctive boolean retrieval: documents containing ALL query terms.

    Plan: postings ⋈ broadcast(query terms) → per-doc hit count == n_terms.
    The broadcast makes the filter a map-side probe; no corpus-vs-corpus
    join exists anywhere."""
    tf = _tf(docs)
    qt = query_terms(tf, start_rank, n_terms)
    return (
        tf.join(F.broadcast(qt.select("token")), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_terms_hit"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
        .where(F.col("n_terms_hit") == n_terms)
        .select("doc_id", "total_tf")
    )


def phrase_search(docs: DataFrame) -> DataFrame:
    """Exact-phrase retrieval for the corpus's most frequent token bigram
    (ties broken lexicographically): (doc_id, phrase, n_matches, first_pos).

    Bigram formation is row-local (zip the token array with its own tail —
    no positional self-join, no shuffle); one hash agg elects the phrase;
    the 1-row winner is broadcast back over the bigram stream. At scale the
    phrase would arrive as user input and the count/elect stage disappears —
    the match stage is the plan under test."""
    ws = F.filter(
        F.split(normalized_text(F.col("text")), " "),
        lambda w: F.length(w) > 0,
    )
    toks = docs.select("doc_id", ws.alias("ws")).where(F.size("ws") >= 2)
    bigrams = F.zip_with(
        F.slice(F.col("ws"), F.lit(1), F.size("ws") - 1),
        F.slice(F.col("ws"), F.lit(2), F.size("ws") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = toks.select("doc_id", F.posexplode(bigrams).alias("pos0", "bg"))
    winner = (
        bg.groupBy("bg")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bg")
        .limit(1)
        .select("bg")
    )
    return (
        bg.join(F.broadcast(winner), "bg")
        .groupBy("doc_id")
        .agg(
            F.first("bg").alias("phrase"),
            F.count("*").cast("int").alias("n_matches"),
            (F.min("pos0") + 1).cast("int").alias("first_pos"),
        )
        .select("doc_id", "phrase", "n_matches", "first_pos")
    )


def bm25_query_search(
    docs: DataFrame,
    start_rank: int = 10,
    n_terms: int = 5,
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked top-k retrieval for the deterministic query-term set:
    (doc_id, n_terms_hit, bm25, rank).

    Same saturation/idf math as textstats.tfidf_bm25 (the per-term idf log is
    integer-quantized before the multiply, so per-doc score sums are exact
    longs and the global ranking compares integers — bit-stable vs the DuckDB
    oracle). Plan: postings ⋈ broadcast(terms+df) ⋈ dl → per-doc sum → one
    top-k window over only the hit set."""
    tf = _tf(docs)
    qt = query_terms(tf, start_rank, n_terms)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    st = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    bidf6 = F.floor(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * _MICRO
        + F.lit(0.5)
    ).cast("long")
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qt), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            F.floor(bidf6 * sat + F.lit(0.5)).cast("long").alias("s6"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_terms_hit"),
        F.sum("s6").cast("long").alias("s6"),
    )
    w = Window.orderBy(F.desc("s6"), "doc_id")
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select(
            "doc_id",
            "n_terms_hit",
            (F.col("s6") / F.lit(float(_MICRO))).alias("bm25"),
            "rank",
        )
    )
