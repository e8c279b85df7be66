"""Near-duplicate cluster formation: connected components over dup pairs.

Pair-level dedup (MinHash/SimHash/Jaccard) yields edges; production dedup
needs CLUSTERS (keep one representative per component). This operator
computes connected components distributively with iterated min-label
propagation — the standard Spark formulation (no GraphFrames dependency):

    label(v) ← min(label(v), min over neighbors(label(u)))   until fixpoint

Each round is one self-join + aggregation on the edge list; rounds needed =
graph diameter (near-dup graphs are shallow — duplicates of a document are
duplicates of each other, so components are dense and the loop converges in
2-3 rounds). The loop is DRIVER-side control flow over fully distributed
steps; each iteration's result is checkpointed via localCheckpoint to cut
the growing lineage (the iterative-algorithm pattern Catalyst cannot express
declaratively).

Scale notes:
- edges come pre-deduplicated from the banded LSH joins (bounded fan-out);
- each propagation round shuffles |V| + |E| rows on the vertex key;
- convergence check is a 1-row aggregate per round (no collect of data).

The DuckDB oracle computes the same components with a recursive CTE
(transitive closure by min-label), a genuinely independent serial algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) — component = min node id reachable via edges.

    Isolated nodes are absent (callers union the full corpus and coalesce
    to self-cluster, see dup_clusters)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("min_nb"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("min_nb")).alias("label"),
        )
    )
    converged = False
    for _ in range(max_iter):
        # candidate labels: own label ∪ neighbors' labels
        neigh = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(sym["a"].alias("node"), F.col("label"))
        )
        new_labels = (
            labels.select("node", "label")
            .union(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "node")
            .where(F.col("o.label") != F.col("n.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Unconverged labels are WRONG (split clusters → wrong is_kept →
        # wrong curation keep/drop). High-diameter chains are plausible at
        # 10^9-doc near-dup scale, so fail loudly instead of returning them.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    doc_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Per document: its near-dup cluster id (min doc_id of the component;
    singletons are their own cluster), the cluster size, and whether this doc
    is the kept representative — the materialized keep/drop decision a
    training-data dedup pass actually applies."""
    comp = connected_components(pairs, src, dst)
    joined = docs.select(F.col(doc_col).alias("node")).join(
        comp, "node", "left"
    )
    labeled = joined.select(
        F.col("node").alias(doc_col),
        F.coalesce("component", "node").alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        labeled.join(sizes, "cluster_id")
        .select(
            doc_col,
            "cluster_id",
            "cluster_size",
            (F.col(doc_col) == F.col("cluster_id")).alias("is_kept"),
        )
    )


def cluster_select_longest(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """Representative selection by QUALITY rather than identity: within each
    near-dup cluster keep the member with the most whitespace tokens
    (CCNet/FineWeb's keep-longest policy — near-dups are usually truncations
    and boilerplate-wrapped copies of the fullest variant; ``dup_clusters``'
    min-id keep is deterministic but quality-blind). Tie-break doc_id ASC
    keeps the choice total.

    One cluster_id-keyed rank window over the already-materialized cluster
    relation joined to a narrow token-count projection — no new
    candidate-generation cost; the policy swap is free at any scale.
    Returns (doc_id, cluster_id, cluster_size, n_tokens, keep_longest)."""
    norm = F.trim(F.regexp_replace(F.col("text"), r"[ \t\n\r\f\x0B]+", " "))
    toks = docs.select(
        "doc_id",
        F.size(F.filter(F.split(norm, " "), lambda w: F.length(w) > 0))
        .cast("long").alias("n_tokens"),
    )
    j = clusters.join(toks, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_tokens"), F.col("doc_id"))
    return (
        j.withColumn("sel_rank", F.row_number().over(w))
        .select(
            "doc_id", "cluster_id", "cluster_size", "n_tokens",
            (F.col("sel_rank") == 1).cast("int").alias("keep_longest"),
        )
    )
