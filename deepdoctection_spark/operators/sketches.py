"""Deterministic streaming sketches: HyperLogLog distinct-count and
Count-Min frequency estimation.

At 100 TB an exact ``COUNT(DISTINCT token)`` or exact heavy-hitter table is a
full shuffle of the token universe; the sketch versions reduce each partition
to a fixed-size register table that merges associatively (max for HLL,
sum for CMS) — the classic Flajolet/Fuller-Martin and Cormode-Muthukrishnan
constructions. Spark's built-ins (``approx_count_distinct``,
``count_min_sketch``) implement the same idea but their register layout is
engine-private, so they cannot be differentially tested against another
engine. These versions are built from ``md5`` + integer arithmetic only —
bit-identical in Spark SQL and DuckDB SQL — which gives the driver a
value-hash oracle *and* documents the exact on-disk register format a
checkpointed sketch would have.

Reference analogue: the summarizer stats the reference accumulates per
dataflow pass (/root/reference/deepdoctection/dataflow/stats.py — mean/std/
histogram accumulators); these are their sublinear-memory cousins.

Determinism contract (same discipline as training_ops.quality_surprisal):
every per-row quantity is integer (hex-prefix buckets, leading-zero ranks,
shifted harmonic terms); floats appear only in the final per-group estimate,
computed from already-aggregated integers with an identical expression on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepdoctection_spark.operators.textstats import _tokens

# HLL geometry: m = 256 registers (first 2 hex chars of md5), rank measured
# over the next 13 nibbles (52 bits) → rho ∈ [1, 53].
HLL_M = 256
HLL_TAIL_NIBBLES = 13
HLL_MAX_RHO = 4 * HLL_TAIL_NIBBLES + 1
# bias-correction constant alpha_m for m = 256 (Flajolet et al. 2007, §4)
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# each register M_j contributes 2^(MAX_RHO - M_j) to the scaled harmonic sum,
# so S = 2^MAX_RHO * sum(2^-M_j) stays exact 64-bit integer arithmetic.
HLL_SCALE = 1 << HLL_MAX_RHO

CMS_DEPTH = 4
CMS_WIDTH = 512


def _hll_rho():
    """Leading-zero rank of the 52-bit tail, from hex-string arithmetic:
    4 bits per leading '0' nibble plus the intra-nibble zeros of the first
    non-zero digit (1→3, 2-3→2, 4-7→1, 8-f→0), plus one."""
    fnz = F.conv(
        F.substr(F.col("tail"), F.col("zn") + 1, F.lit(1)), 16, 10
    ).cast("int")
    adjust = (
        F.when(fnz == 1, 3)
        .when(fnz <= 3, 2)
        .when(fnz <= 7, 1)
        .otherwise(0)
    )
    return (
        F.when(F.col("zn") == HLL_TAIL_NIBBLES, F.lit(HLL_MAX_RHO))
        .otherwise(F.col("zn") * 4 + adjust + 1)
        .alias("rho")
    )


def hll_distinct(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-group HyperLogLog estimate of distinct 3-shingles next to the
    exact count — the cardinality a dedup planner wants before sizing an
    LSH pass, at sketch cost instead of a distinct-shuffle.

    Plan shape: one narrow pass computes (bucket, rho) per shingle
    occurrence — no pre-dedup shuffle, duplicates collapse inside the
    register max — then a 2-level hash aggregation: (group, bucket) →
    max(rho) is at most |groups|·256 rows regardless of input size, and the
    final per-group reduce is driver-trivial. The exact ``countDistinct``
    column exists only as the accuracy foil for tests/oracle; a production
    run would drop it (it is the full shuffle the sketch avoids).
    """
    from deepdoctection_spark.operators.dedup import normalized_text

    ws = F.split(normalized_text(F.col("text")), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - 3, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(ws, i + 1, 3), " "))
    toks = docs.select(
        F.col(group_col).alias("grp"), F.explode(sh).alias("token")
    ).where(F.size(F.split(F.col("token"), " ")) == 3)
    hashed = toks.select(
        "grp",
        F.conv(F.substring(F.md5("token"), 1, 2), 16, 10)
        .cast("int")
        .alias("bucket"),
        F.substring(F.md5("token"), 3, HLL_TAIL_NIBBLES).alias("tail"),
    )
    ranked = hashed.select(
        "grp",
        "bucket",
        F.length(F.regexp_extract("tail", "^0*", 0)).alias("zn"),
        "tail",
    ).select("grp", "bucket", _hll_rho())
    regs = ranked.groupBy("grp", "bucket").agg(F.max("rho").alias("m_reg"))
    per = regs.groupBy("grp").agg(
        F.count("*").cast("long").alias("buckets_used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_MAX_RHO} - m_reg)")
        ).alias("s_present"),
    )
    s_scaled = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("buckets_used")) * F.lit(HLL_SCALE)
    ).alias("s_scaled")
    per = per.select("grp", "buckets_used", s_scaled)
    empty = F.lit(HLL_M) - F.col("buckets_used")
    raw = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(HLL_SCALE))
        / F.col("s_scaled").cast("double")
    )
    # small-range correction: linear counting while empty registers remain
    # and the raw estimate is under 2.5m (standard HLL switch point)
    est = (
        F.when(
            (empty > 0) & (raw < F.lit(2.5 * HLL_M)),
            F.floor(
                F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / empty)
                + F.lit(0.5)
            ),
        )
        .otherwise(F.floor(raw + F.lit(0.5)))
        .cast("long")
        .alias("hll_est")
    )
    exact = toks.groupBy("grp").agg(
        F.countDistinct("token").cast("long").alias("exact_distinct")
    )
    return (
        per.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            "exact_distinct",
            "buckets_used",
            "s_scaled",
            est,
        )
    )


def cms_heavy_hitters(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """Count-Min sketch over the token stream, probed at the exact top-k.

    The sketch build is the scale path: tokens fan out ×depth to
    (row, col = md5(row#token) mod width) and hash-aggregate into a fixed
    depth×width counter table (2048 rows here) with full map-side combine —
    partition-local sketches merge by addition, so the shuffle moves O(d·w)
    rows per partition, never O(tokens). The probe joins the exact top-k
    (the test foil) back against the sketch and takes min over rows; the
    CMS guarantee est ≥ true holds exactly and is asserted in tests.
    """
    toks = docs.select(F.explode(_tokens()).alias("token"))
    rows = toks.select(
        "token",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("r"),
    )
    cell = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("#", "r", "token")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(CMS_WIDTH),
    ).alias("c")
    sketch = rows.select("r", cell).groupBy("r", "c").agg(
        F.count("*").cast("long").alias("cnt")
    )
    counts = toks.groupBy("token").agg(F.count("*").cast("long").alias("true_n"))
    top = counts.orderBy(F.desc("true_n"), "token").limit(top_k)
    probe = top.select(
        "token",
        "true_n",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("r"),
    ).select("token", "true_n", "r", cell)
    return (
        probe.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("token", "true_n")
        .agg(F.min("cnt").alias("cms_est"))
    )


# HDR-histogram geometry: exact buckets below 2^HDR_EXACT_BITS, then
# (exponent, 2-bit mantissa) buckets — bucket width 2^(e-3), lower bound
# (4+sub)·2^(e-3), relative error < 25%. Pure integer arithmetic
# (bit length via length(bin(v))) so Spark and DuckDB agree bit-for-bit.
HDR_EXACT_LIMIT = 8
HDR_QUANTILES = (50, 90, 99)


def _hdr_bucket(v):
    """Integer HDR bucket id of a non-negative integer column."""
    e = F.length(F.bin(v))
    # exact: v < 2^31 and the divisor is a power of two, so the double
    # division is representable and floor == integer div (shiftleft takes a
    # Python-int shift, so the column-shift is pow(2, e-3) — exact in double)
    sub = F.floor(
        v.cast("long") / F.pow(F.lit(2.0), (e - 3).cast("double"))
    ).cast("long") % 4
    return F.when(v < HDR_EXACT_LIMIT, v.cast("long")).otherwise(
        (e * 4 + sub).cast("long")
    )


def _hdr_lower_bound(bucket):
    """Bucket id → inclusive lower bound of the bucket's value range."""
    e = F.floor(bucket / 4).cast("long")
    sub = bucket % 4
    return F.when(bucket < HDR_EXACT_LIMIT, bucket).otherwise(
        (
            (4 + sub).cast("double") * F.pow(F.lit(2.0), (e - 3).cast("double"))
        ).cast("long")
    )


def hdr_quantiles(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Mergeable log-scale quantile sketch (HDR-histogram construction,
    Tene's HdrHistogram / Prometheus-native-histogram family) over per-doc
    whitespace token counts, per group.

    Per partition the state is a fixed-size (bucket → count) table — counts
    merge by sum, so the groupBy is map-side combinable and the shuffle
    carries O(groups × buckets) rows regardless of corpus size; the quantile
    probe is one cumulative window over the tiny bucket table plus a
    broadcast of the 3-row quantile grid. Exact below 8, <25% relative
    error above (2-bit mantissa); all arithmetic integer until the final
    lower-bound reconstruction, so the DuckDB oracle replays it exactly.
    Contrast with ``percentile_approx``: same sublinear idea, but Spark's
    KLL-ish layout is engine-private and cannot be differentially tested.
    """
    v = F.size(_tokens())
    t = docs.select(F.col(group_col).alias("grp"), v.alias("v"))
    g = (
        t.select("grp", _hdr_bucket(F.col("v")).alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select("grp", "bucket", F.sum("c").over(w).alias("cum"))
    tot = t.groupBy("grp").agg(F.count("*").cast("long").alias("n"))
    spark = docs.sparkSession
    qs = spark.createDataFrame(
        [(q,) for q in HDR_QUANTILES], "q_pct int"
    )
    # ceil(q_pct·n/100) in exact integer terms (values ≪ 2^53)
    thr = F.floor((F.col("q_pct") * F.col("n") + 99) / 100).cast("long")
    sel = (
        cum.join(tot, "grp")
        .crossJoin(F.broadcast(qs))
        .where(F.col("cum") >= thr)
        .groupBy("grp", "q_pct")
        .agg(F.min("bucket").alias("bucket"))
    )
    return sel.select(
        F.col("grp").alias(group_col),
        "q_pct",
        "bucket",
        _hdr_lower_bound(F.col("bucket")).cast("long").alias("est_lb"),
    )


# KMV (k-minimum-values / bottom-k theta) sketch geometry: 60-bit hash from
# the first 15 md5 nibbles (exact BIGINT both engines), k = 64 retained
# minima. Unbiased estimator (k-1)·2^60/kth for a full sketch; a sketch
# holding fewer than k values IS the exact distinct set.
KMV_K = 64
KMV_DOMAIN = float(1 << 60)


def _kmv_hash(col):
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def _kmv_est(n, kth):
    """Estimate from aggregated integers only (HLL's determinism contract):
    floats appear in one final expression identical on both engines."""
    return F.when(n < KMV_K, n.cast("double")).otherwise(
        F.lit(KMV_K - 1.0) * F.lit(KMV_DOMAIN) / kth
    )


def kmv_setops(sets: DataFrame, key_col: str = "url",
               set_col: str = "s") -> DataFrame:
    """Theta-sketch set algebra over two keyed sets 'a' and 'b': distinct
    estimates for a, b, a∪b, a∩b and a∖b from two k=64 bottom-k sketches,
    next to the exact counts (the accuracy foil a production run drops).

    HLL (``hll_distinct``) merges by register-max and so answers UNION
    cardinality only; the KMV sketch is a uniform sample of the hashed key
    space, so intersect/difference fall out of the union sketch by
    membership counting (Beyer et al. 2007; the Theta sketch of Dasgupta
    et al. 2016): every member of the union's bottom-k that lies below a
    set's own kth minimum is, by construction, IN that set's bottom-k —
    sketch-only membership tests, no second corpus pass.

    Plan shape (the 100 TB story): one distinct per set (the only
    key-cardinality shuffle — at scale replace with the same hash-agg the
    dedup path uses), then TWO-LEVEL bottom-k: a partition-local
    row_number over (set, partition_id) cuts each partition to ≤k
    candidate rows, and the global per-set bottom-k sorts only ≤k·P
    survivors — the full distinct-key set is never globally sorted. All
    set algebra then runs on ≤3k rows. The exact-count columns are the
    test foil only: they are the full distinct-shuffle the sketch avoids.

    Reference analogue: dataflow summary statistics
    (/root/reference/deepdoctection/dataflow/stats.py) — this is their
    sublinear set-overlap cousin for two-crawl / two-corpus comparison.
    """
    from pyspark.sql import Window

    s, k = F.col(set_col), KMV_K
    dist = sets.select(s.alias("s"), _kmv_hash(F.col(key_col)).alias("h")
                       ).distinct()
    w_local = Window.partitionBy("s", F.spark_partition_id()).orderBy("h")
    cand = (
        dist.withColumn("rn", F.row_number().over(w_local))
        .where(F.col("rn") <= k).select("s", "h")
    )
    w_set = Window.partitionBy("s").orderBy("h")
    sk = (
        cand.withColumn("rn", F.row_number().over(w_set))
        .where(F.col("rn") <= k).select("s", "h")
    )
    sk_a = sk.where("s = 'a'").select("h")
    sk_b = sk.where("s = 'b'").select("h")
    w_all = Window.orderBy("h")
    sk_u = (
        sk_a.unionByName(sk_b).distinct()
        .withColumn("rn", F.row_number().over(w_all))
        .where(F.col("rn") <= k).select("h")
    )
    flagged = (
        sk_u.join(sk_a.withColumn("in_a", F.lit(1)), "h", "left")
        .join(sk_b.withColumn("in_b", F.lit(1)), "h", "left")
        .select("h", F.coalesce("in_a", F.lit(0)).alias("in_a"),
                F.coalesce("in_b", F.lit(0)).alias("in_b"))
    )

    def _one(df: DataFrame, op: str) -> DataFrame:
        agg = df.agg(F.count("*").cast("long").alias("sk_n"),
                     F.max("h").alias("kth"))
        return agg.select(
            F.lit(op).alias("op"), "sk_n", "kth",
            F.floor(_kmv_est(F.col("sk_n"), F.col("kth")) + 0.5)
            .cast("long").alias("est"),
        )

    base = _one(sk_a, "a").unionByName(_one(sk_b, "b")).unionByName(
        _one(sk_u, "union"))
    u = base.where("op = 'union'").select(
        F.col("sk_n").alias("u_n"), F.col("est").alias("u_est"))
    partial = flagged.agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("long")
        .alias("n_a_only"),
    )

    def _derived(n_col: str, op: str) -> DataFrame:
        return partial.crossJoin(F.broadcast(u)).select(
            F.lit(op).alias("op"),
            F.col(n_col).alias("sk_n"),
            F.lit(None).cast("long").alias("kth"),
            F.floor(F.col(n_col).cast("double") * F.col("u_est")
                    / F.col("u_n") + 0.5).cast("long").alias("est"),
        )

    ex_a = sets.where(s == "a").select(_kmv_hash(F.col(key_col)).alias("h"))
    ex_b = sets.where(s == "b").select(_kmv_hash(F.col(key_col)).alias("h"))
    inter = ex_a.distinct().join(ex_b.distinct(), "h")
    exact = (
        ex_a.agg(F.count_distinct("h").alias("exact")).select(
            F.lit("a").alias("op"), "exact")
        .unionByName(ex_b.agg(F.count_distinct("h").alias("exact")).select(
            F.lit("b").alias("op"), "exact"))
        .unionByName(
            ex_a.unionByName(ex_b).agg(
                F.count_distinct("h").alias("exact")).select(
                F.lit("union").alias("op"), "exact"))
        .unionByName(inter.agg(F.count("*").cast("long").alias("exact"))
                     .select(F.lit("intersect").alias("op"), "exact"))
        .unionByName(
            ex_a.distinct().join(ex_b.distinct(), "h", "left_anti")
            .agg(F.count("*").cast("long").alias("exact"))
            .select(F.lit("a_not_b").alias("op"), "exact"))
    )
    ops = base.unionByName(_derived("n_both", "intersect")).unionByName(
        _derived("n_a_only", "a_not_b"))
    return ops.join(exact, "op").select("op", "sk_n", "kth", "est", "exact")
