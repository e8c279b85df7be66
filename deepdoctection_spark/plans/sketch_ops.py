"""Query registrations: deterministic sketches (HLL, Count-Min), the
Naive-Bayes classifier, and the deterministic corpus split.

Each oracle re-derives the identical integer register/score layout in DuckDB
SQL, so the driver's value-hash compare covers the sketch math itself, not
just row counts. Float appears only after the final integer aggregation
(same contract as training_ops.quality_surprisal).
"""

from __future__ import annotations

from deepdoctection_spark.operators.classify import nb_train_score
from deepdoctection_spark.operators.corpusprep import split_assign
from deepdoctection_spark.operators.sketches import (
    HLL_ALPHA,
    cms_heavy_hitters,
    hll_distinct,
)
from deepdoctection_spark.plans.registry import register
from deepdoctection_spark.plans.training_ops import _NORM, _docs

_TOK_CTE = f"""
toks0 AS (SELECT doc_id, lang, unnest(string_split({_NORM}, ' ')) AS token
          FROM documents),
tok AS (SELECT doc_id, lang, token FROM toks0 WHERE length(token) > 0)
"""


@register(
    "sketch_hll_distinct",
    f"""
WITH shws AS (SELECT lang, string_split({_NORM}, ' ') AS ws FROM documents),
tok AS (SELECT lang, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS token
        FROM shws, unnest(range(1, greatest(len(ws) - 1, 1))) AS t(i)),
hashed AS (SELECT lang AS grp,
       ('0x' || substr(md5(token), 1, 2))::BIGINT AS bucket,
       substr(md5(token), 3, 13) AS tail FROM tok),
z AS (SELECT grp, bucket, length(regexp_extract(tail, '^0*')) AS zn, tail
      FROM hashed),
rho AS (SELECT grp, bucket,
       CASE WHEN zn = 13 THEN 53
            ELSE zn * 4 + (CASE WHEN d = 1 THEN 3 WHEN d <= 3 THEN 2
                                WHEN d <= 7 THEN 1 ELSE 0 END) + 1
       END AS r
       FROM (SELECT grp, bucket, zn,
             CASE WHEN zn >= 13 THEN 0
                  ELSE ('0x' || substr(tail, zn + 1, 1))::BIGINT END AS d
             FROM z) q),
regs AS (SELECT grp, bucket, max(r) AS m_reg FROM rho GROUP BY grp, bucket),
per AS (SELECT grp, count(*)::BIGINT AS buckets_used,
        sum((1::BIGINT << (53 - m_reg)))::BIGINT AS s_present
        FROM regs GROUP BY grp),
fin AS (SELECT grp, buckets_used,
        s_present + (256 - buckets_used) * (1::BIGINT << 53) AS s_scaled
        FROM per),
est AS (SELECT grp, buckets_used, s_scaled,
        {HLL_ALPHA!r}::DOUBLE * 65536.0 * 9007199254740992.0 / s_scaled AS raw
        FROM fin),
exact AS (SELECT lang AS grp, count(DISTINCT token)::BIGINT AS exact_distinct
          FROM tok GROUP BY lang)
SELECT e.grp AS lang, x.exact_distinct, e.buckets_used, e.s_scaled,
  (CASE WHEN (256 - e.buckets_used) > 0 AND e.raw < 640.0
        THEN floor(256.0 * ln(256.0 / (256 - e.buckets_used)) + 0.5)
        ELSE floor(e.raw + 0.5) END)::BIGINT AS hll_est
FROM est e JOIN exact x ON x.grp = e.grp
""",
)
def q_sketch_hll(spark, sf_dir):
    """HyperLogLog distinct-3-shingle count per language next to the exact
    count: fixed 256-register sketch per group, merge-by-max, integer
    harmonic sum; estimate + linear-counting small-range branch."""
    return hll_distinct(_docs(spark, sf_dir))


@register(
    "sketch_cms_heavy",
    f"""
WITH {_TOK_CTE},
rows_ AS (SELECT token, r FROM tok, unnest([0, 1, 2, 3]) AS t(r)),
cells AS (SELECT r,
          ('0x' || substr(md5(r::VARCHAR || '#' || token), 1, 8))::BIGINT
            % 512 AS c
          FROM rows_),
sketch AS (SELECT r, c, count(*)::BIGINT AS cnt FROM cells GROUP BY r, c),
counts AS (SELECT token, count(*)::BIGINT AS true_n FROM tok GROUP BY token),
top AS (SELECT token, true_n FROM counts ORDER BY true_n DESC, token LIMIT 20),
probe AS (SELECT token, true_n, r,
          ('0x' || substr(md5(r::VARCHAR || '#' || token), 1, 8))::BIGINT
            % 512 AS c
          FROM top, unnest([0, 1, 2, 3]) AS t(r))
SELECT p.token, p.true_n, min(s.cnt) AS cms_est
FROM probe p JOIN sketch s ON s.r = p.r AND s.c = p.c
GROUP BY p.token, p.true_n
""",
)
def q_sketch_cms(spark, sf_dir):
    """Count-Min sketch (depth 4 × width 512) over the token stream, probed
    at the exact top-20 tokens; CMS overestimate guarantee holds exactly."""
    return cms_heavy_hitters(_docs(spark, sf_dir))


@register(
    "classify_nb_lang",
    f"""
WITH base AS (SELECT doc_id, lang AS label,
       (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 10) < 8 AS is_train,
       text FROM documents),
toks0 AS (SELECT doc_id, label, is_train,
          unnest(string_split({_NORM}, ' ')) AS token FROM base),
tok AS (SELECT * FROM toks0 WHERE length(token) > 0),
train AS (SELECT * FROM tok WHERE is_train),
cnt AS (SELECT label, token, count(*)::BIGINT AS ctl FROM train
        GROUP BY label, token),
tot AS (SELECT label, count(*)::BIGINT AS tot_l FROM train GROUP BY label),
vocab AS (SELECT count(DISTINCT token)::BIGINT AS vsz FROM train),
tdocs AS (SELECT label, count(*)::BIGINT AS n_docs FROM base WHERE is_train
          GROUP BY label),
ttot AS (SELECT count(*)::BIGINT AS n_total FROM base WHERE is_train),
priors AS (SELECT label,
           floor(ln(n_docs / n_total::DOUBLE) * 1000000 + 0.5)::BIGINT
             AS prior_micro
           FROM tdocs, ttot),
held AS (SELECT doc_id, label AS true_label, token FROM tok
         WHERE NOT is_train),
classes AS (SELECT label AS cls FROM tot),
terms AS (SELECT h.doc_id, h.true_label, c.cls,
          floor(ln((coalesce(n.ctl, 0) + 1.0) / (t.tot_l + v.vsz)) * 1000000
                + 0.5)::BIGINT AS t_micro
          FROM held h CROSS JOIN classes c
          LEFT JOIN cnt n ON n.label = c.cls AND n.token = h.token
          JOIN tot t ON t.label = c.cls, vocab v),
scores AS (SELECT doc_id, true_label, cls, sum(t_micro)::BIGINT AS ll_micro
           FROM terms GROUP BY 1, 2, 3),
ranked AS (SELECT s.doc_id, s.true_label, s.cls,
           s.ll_micro + p.prior_micro AS score_micro,
           row_number() OVER (PARTITION BY s.doc_id
                              ORDER BY s.ll_micro + p.prior_micro DESC, s.cls)
             AS rk
           FROM scores s JOIN priors p ON p.label = s.cls)
SELECT doc_id, true_label AS lang, cls AS pred_label, score_micro
FROM ranked WHERE rk = 1
""",
)
def q_classify_nb(spark, sf_dir):
    """Multinomial Naive Bayes trained on the md5-hash 80% fold, scored on
    the 20% held-out fold; integer micro-log-posteriors, argmax with
    deterministic tie-break."""
    return nb_train_score(_docs(spark, sf_dir))


@register(
    "corpus_split_assign",
    """
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, lang,
      ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS bucket
      FROM documents) b
""",
)
def q_split_assign(spark, sf_dir):
    """Deterministic stratification-free train/val/test assignment from
    md5(doc_id::VARCHAR) — stable under re-runs and cluster-size changes."""
    return split_assign(_docs(spark, sf_dir))


@register(
    "sketch_hdr_quantiles",
    f"""
WITH t AS (SELECT lang AS grp,
       len(list_filter(string_split({_NORM}, ' '), w -> length(w) > 0))::BIGINT AS v
       FROM documents),
b AS (SELECT grp, CASE WHEN v < 8 THEN v
       ELSE (length(bin(v)) * 4
             + (v // (1::BIGINT << (length(bin(v)) - 3))) % 4)::BIGINT
       END AS bucket FROM t),
g AS (SELECT grp, bucket, count(*)::BIGINT AS c FROM b GROUP BY grp, bucket),
cum AS (SELECT grp, bucket,
        sum(c) OVER (PARTITION BY grp ORDER BY bucket)::BIGINT AS cum FROM g),
tot AS (SELECT grp, count(*)::BIGINT AS n FROM t GROUP BY grp),
qs AS (SELECT * FROM (VALUES (50), (90), (99)) AS q(q_pct)),
sel AS (SELECT cum.grp, q_pct, min(bucket) AS bucket
        FROM cum JOIN tot USING (grp) CROSS JOIN qs
        WHERE cum >= (q_pct * n + 99) // 100
        GROUP BY cum.grp, q_pct)
SELECT grp AS lang, q_pct::INT AS q_pct, bucket::BIGINT AS bucket,
       (CASE WHEN bucket < 8 THEN bucket
        ELSE (4 + bucket % 4)::BIGINT << (bucket // 4 - 3)::INT
        END)::BIGINT AS est_lb
FROM sel
""",
)
def q_sketch_hdr_quantiles(spark, sf_dir):
    """HDR-histogram quantile sketch (p50/p90/p99 of per-doc whitespace
    token counts, per lang): fixed-size mergeable bucket table, exact below
    8, <25% relative error above, integer arithmetic end-to-end — the
    differentially-testable cousin of percentile_approx."""
    from deepdoctection_spark.operators.sketches import hdr_quantiles

    return hdr_quantiles(_docs(spark, sf_dir))


_KMV_URLS_CTE = """
a_urls AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.org/p/' || doc_id AS url
  FROM documents
),
b_urls AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.org/p/' || doc_id AS url
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT 'https://h' || (doc_id % 7) || '.example.org/new/' || doc_id
  FROM documents WHERE doc_id % 17 = 0
)
"""


@register(
    "sketch_kmv_setops",
    f"""
WITH {_KMV_URLS_CTE},
ha AS (SELECT DISTINCT ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
       FROM a_urls),
hb AS (SELECT DISTINCT ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
       FROM b_urls),
ska AS (SELECT h FROM ha ORDER BY h LIMIT 64),
skb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
sku AS (SELECT h FROM (SELECT DISTINCT h FROM (
          SELECT h FROM ska UNION ALL SELECT h FROM skb))
        ORDER BY h LIMIT 64),
flag AS (SELECT h, (h IN (SELECT h FROM ska))::INT AS in_a,
                (h IN (SELECT h FROM skb))::INT AS in_b FROM sku),
base AS (
  SELECT 'a' AS op, count(*)::BIGINT AS sk_n, max(h) AS kth FROM ska
  UNION ALL SELECT 'b', count(*)::BIGINT, max(h) FROM skb
  UNION ALL SELECT 'union', count(*)::BIGINT, max(h) FROM sku
),
est_base AS (SELECT op, sk_n, kth,
  floor(CASE WHEN sk_n < 64 THEN sk_n::DOUBLE
        ELSE 63.0 * 1152921504606846976.0 / kth END + 0.5)::BIGINT AS est
  FROM base),
u AS (SELECT sk_n AS u_n, est AS u_est FROM est_base WHERE op = 'union'),
part AS (SELECT sum(in_a * in_b)::BIGINT AS n_both,
                sum(in_a * (1 - in_b))::BIGINT AS n_a_only FROM flag),
der AS (
  SELECT 'intersect' AS op, n_both AS sk_n, NULL::BIGINT AS kth,
         floor(n_both::DOUBLE * u_est / u_n + 0.5)::BIGINT AS est
  FROM part, u
  UNION ALL
  SELECT 'a_not_b', n_a_only, NULL::BIGINT,
         floor(n_a_only::DOUBLE * u_est / u_n + 0.5)::BIGINT
  FROM part, u
),
exact AS (
  SELECT 'a' AS op, count(*)::BIGINT AS exact FROM ha
  UNION ALL SELECT 'b', count(*)::BIGINT FROM hb
  UNION ALL SELECT 'union', count(*)::BIGINT
    FROM (SELECT h FROM ha UNION SELECT h FROM hb)
  UNION ALL SELECT 'intersect', count(*)::BIGINT
    FROM (SELECT h FROM ha INTERSECT SELECT h FROM hb)
  UNION ALL SELECT 'a_not_b', count(*)::BIGINT
    FROM (SELECT h FROM ha EXCEPT SELECT h FROM hb)
)
SELECT o.op, o.sk_n, o.kth, o.est, x.exact
FROM (SELECT * FROM est_base UNION ALL SELECT * FROM der) o
JOIN exact x USING (op)
""",
)
def q_sketch_kmv_setops(spark, sf_dir):
    """KMV/theta-sketch set algebra between two crawl snapshots' URL sets
    (the snapshot-diff fixture): distinct estimates for a, b, a∪b, a∩b,
    a∖b from k=64 bottom-k sketches next to the exact counts. HLL answers
    union only; this is the sketch that sizes crawl overlap / churn
    without a distinct-shuffle. Two-level bottom-k (partition-local cut,
    then per-set top-64) — the full key set is never globally sorted."""
    from pyspark.sql import functions as F

    from deepdoctection_spark.operators.sketches import kmv_setops

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    url_p = F.concat(
        F.lit("https://h"), (d % 7).cast("string"),
        F.lit(".example.org/p/"), d.cast("string"),
    )
    a = docs.select(F.lit("a").alias("s"), url_p.alias("url"))
    b = docs.where(d % 13 != 0).select(
        F.lit("b").alias("s"), url_p.alias("url")
    ).unionByName(
        docs.where(d % 17 == 0).select(
            F.lit("b").alias("s"),
            F.concat(
                F.lit("https://h"), (d % 7).cast("string"),
                F.lit(".example.org/new/"), d.cast("string"),
            ).alias("url"),
        )
    )
    return kmv_setops(a.unionByName(b))
