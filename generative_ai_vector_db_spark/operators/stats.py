"""Distributed statistics & model-eval operators (round 10, q286-q291).

Extensions beyond the reference surface (which delegates all analytics;
SURVEY.md §2.C): the evaluation/statistics tier a training-data
pipeline runs next to curation — ROC/calibration for quality-classifier
gates, rank correlations for metric-agreement audits, nonparametric
group tests for source-mix drift. Everything is pure DataFrame
built-ins, single-pass where the math allows, and every global
rank/quantile runs on the DISTINCT-VALUE domain (the q228/q282 shape:
per-value counts + prefix sums over |distinct values| rows), never a
row-level global sort. The prefix sums themselves are DISTRIBUTED
(``functions.prefix.prefix_sums``: range-partition on value,
per-partition running sums, broadcast partition offsets — the q283
rank machinery generalized to SUM columns), because the distinct-value
domain GROWS with N on real data (r12 judge measurement: ~N^0.43 on
the fixture ladder) — no unpartitioned window anywhere in these plans.

Cross-engine parity rules (FIXTURES.md): BIGINT casts for integer
outputs, explicit DOUBLE casts before division, identical arithmetic
order on both sides, and rank statistics derived from integer
prefix-sums (exact) rather than engine rank() internals where the
domain is continuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.prefix import prefix_sums
from ..tables import load

# ROC/calibration label convention: 'purchase' events are the positive
# class, 'view' the negative, score = the event value. (q282 Mann-
# Whitney uses click-vs-purchase — disjoint pair, no dupe.)
ROC_POS, ROC_NEG = "purchase", "view"


# ---------------------------------------------------------------------------
# q286 ROC curve at exact decile thresholds.
# Scale: one groupBy(value) (shuffle on the 2-dp value domain), one
# DISTRIBUTED prefix scan over distinct values, broadcast 9-row decile frame
# joined by integer inequality — tp/fp at each threshold fall out of
# the SAME prefix sums (total - strictly-before), no per-threshold
# rescan. At 100 TB the only row-scale op is the first groupBy.
# ---------------------------------------------------------------------------
def q286_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(ROC_POS, ROC_NEG)
    )
    dv = ev.groupBy("value").agg(
        F.sum((F.col("event_type") == ROC_POS).cast("bigint"))
        .cast("bigint")
        .alias("ca"),
        F.sum((F.col("event_type") == ROC_NEG).cast("bigint"))
        .cast("bigint")
        .alias("cb"),
    )
    # distributed exclusive prefix sums over the distinct-value frame
    # (range-partitioned — the domain grows with N, so no unpartitioned
    # window; see functions/prefix.py)
    pre = prefix_sums(dv, ["value"], {"ca": "ba", "cb": "bb"}).select(
        "value", "ca", "cb", "ba", "bb"
    )
    # totals from the DISTINCT-VALUE frame, not a second row-scale
    # pass — the events parquet is scanned once per dv reference
    # (2 subplans), never once per output column
    tot = dv.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    pre = pre.crossJoin(F.broadcast(tot))  # 1-row totals
    deciles = spark.range(1, 10).select(F.col("id").cast("bigint").alias("decile"))
    # threshold_i = smallest distinct value whose inclusive cumulative
    # count reaches i/10 of N: i*N <= cum*10 AND i*N > before*10 —
    # exact BIGINT arithmetic on both engines.
    cum = (F.col("ba") + F.col("bb") + F.col("ca") + F.col("cb")).cast("bigint")
    before = (F.col("ba") + F.col("bb")).cast("bigint")
    n_all = (F.col("na") + F.col("nb")).cast("bigint")
    hit = pre.join(
        F.broadcast(deciles),
        (F.col("decile") * n_all <= cum * 10)
        & (F.col("decile") * n_all > before * 10),
    )
    tp = (F.col("na") - F.col("ba")).cast("bigint")
    fp = (F.col("nb") - F.col("bb")).cast("bigint")
    return (
        hit.select(
            "decile",
            F.col("value").alias("threshold"),
            tp.alias("tp"),
            fp.alias("fp"),
            (tp.cast("double") / F.col("na").cast("double")).alias("tpr"),
            (fp.cast("double") / F.col("nb").cast("double")).alias("fpr"),
            (
                tp.cast("double") / (tp + fp).cast("double")
            ).alias("precision"),
        )
        .orderBy("decile")
    )


Q286_SQL = f"""
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('{ROC_POS}', '{ROC_NEG}')
),
dv AS (
  SELECT value,
         CAST(coalesce(sum(CASE WHEN event_type = '{ROC_POS}' THEN 1 END), 0)
              AS BIGINT) AS ca,
         CAST(coalesce(sum(CASE WHEN event_type = '{ROC_NEG}' THEN 1 END), 0)
              AS BIGINT) AS cb
  FROM ev GROUP BY value
),
pre AS (
  SELECT value, ca, cb,
         CAST(coalesce(sum(ca) OVER (
           ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS ba,
         CAST(coalesce(sum(cb) OVER (
           ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS bb
  FROM dv
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM dv
),
deciles AS (SELECT CAST(range AS BIGINT) AS decile FROM range(1, 10))
SELECT decile,
       value AS threshold,
       CAST(na - ba AS BIGINT) AS tp,
       CAST(nb - bb AS BIGINT) AS fp,
       CAST(na - ba AS DOUBLE) / CAST(na AS DOUBLE) AS tpr,
       CAST(nb - bb AS DOUBLE) / CAST(nb AS DOUBLE) AS fpr,
       CAST(na - ba AS DOUBLE) / CAST((na - ba) + (nb - bb) AS DOUBLE)
         AS precision
FROM pre, tot, deciles
WHERE decile * (na + nb) <= (ba + bb + ca + cb) * 10
  AND decile * (na + nb) > (ba + bb) * 10
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# q287 calibration bins + Brier decomposition inputs.
# Pseudo-probability p = value / max(value) (min-max calibration of the
# raw score); 10 equal-width bins. One agg for the max (broadcast
# 1-row), one groupBy(bin) — two row-scale passes, both map-side
# combinable. ECE weight = n_bin/N emitted per bin so the scalar ECE
# is a trivial client-side sum.
# ---------------------------------------------------------------------------
def q287_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(ROC_POS, ROC_NEG)
    )
    mx = ev.agg(F.max("value").alias("mxv"), F.count("*").alias("n_all"))
    ev = ev.crossJoin(F.broadcast(mx))
    p = F.col("value").cast("double") / F.col("mxv").cast("double")
    y = (F.col("event_type") == ROC_POS).cast("double")
    binc = F.least(F.floor(p * 10).cast("bigint"), F.lit(9).cast("bigint"))
    binned = ev.select(
        binc.alias("bin"), p.alias("p"), y.alias("y"), "n_all"
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.avg("p").alias("mean_p"),
            F.avg("y").alias("frac_pos"),
            F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y")))
            .alias("brier"),
            (
                F.count("*").cast("double")
                * F.abs(F.avg("p") - F.avg("y"))
                / F.first("n_all").cast("double")
            ).alias("ece_part"),
        )
        .orderBy("bin")
    )


Q287_SQL = f"""
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('{ROC_POS}', '{ROC_NEG}')
),
mx AS (SELECT max(value) AS mxv, count(*) AS n_all FROM ev),
binned AS (
  SELECT least(CAST(floor(CAST(value AS DOUBLE) / CAST(mxv AS DOUBLE) * 10)
                    AS BIGINT), 9) AS bin,
         CAST(value AS DOUBLE) / CAST(mxv AS DOUBLE) AS p,
         CASE WHEN event_type = '{ROC_POS}' THEN 1.0 ELSE 0.0 END AS y,
         n_all
  FROM ev, mx
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       avg(p) AS mean_p,
       avg(y) AS frac_pos,
       avg((p - y) * (p - y)) AS brier,
       CAST(count(*) AS DOUBLE) * abs(avg(p) - avg(y))
         / CAST(any_value(n_all) AS DOUBLE) AS ece_part
FROM binned
GROUP BY bin
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# q288 Kendall tau-b per source (metric-agreement audit: do char count
# and whitespace token count rank documents the same way?).
# Concordant/discordant via a WITHIN-SOURCE pair self-join (i<j) —
# bounded-block quadratic, the documented q215/q27 shape: per-source
# block sizes are capped by the corpus sharding design (|block| ~ 250
# at sf0.1); at 100 TB the audit runs per source-shard sample, never a
# global cross of the corpus. Tie counts come from per-value groupBys
# (linear). tau-b denominator uses exact BIGINT pair counts.
#
# Oversize sources degrade GRACEFULLY (VERDICT r10 #3): any source
# block larger than KENDALL_BLOCK_CAP is deterministically
# systematic-sampled down to <= cap docs (q60's every-k-th-by-key-rank
# shape, k = ceil(n/cap)) BEFORE the pair join, so a skewed corpus
# yields a sampled tau-b instead of an error or a silent quadratic.
# The sampling rule is mirrored in the SQL twin (oracle parity holds
# on oversize corpora too); on the fixtures k == 1 everywhere, so the
# sampled plan is byte-identical to the exact one. The output column
# ``n`` is the SAMPLED block size by declaration.
# ---------------------------------------------------------------------------
KENDALL_BLOCK_CAP = 5000  # pairs-per-source <= cap^2/2; sample past it


def q288_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("y"),
    )
    w_src = Window.partitionBy("source")
    w_ord = Window.partitionBy("source").orderBy("doc_id")
    stride = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(
            F.count(F.lit(1)).over(w_src)
            / F.lit(float(KENDALL_BLOCK_CAP))
        ).cast("bigint"),
    )
    # the stride is carried to the OUTPUT (stride column, 1 = exact):
    # silent degradation was the r11 self-review's observability flag —
    # a consumer must be able to tell a sampled tau from an exact one
    # without knowing raw block sizes.
    docs = (
        docs.withColumn("_stride", stride)
        .withColumn("_keep", (F.row_number().over(w_ord) - 1) % stride)
        .where(F.col("_keep") == 0)
        .drop("_keep")
    )
    a, b = docs.alias("a"), docs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    dx = F.col("a.x") - F.col("b.x")
    dy = F.col("a.y") - F.col("b.y")
    cd = pairs.groupBy(F.col("a.source").alias("source")).agg(
        F.sum(((dx > 0) & (dy > 0) | (dx < 0) & (dy < 0)).cast("bigint"))
        .cast("bigint")
        .alias("concordant"),
        F.sum(((dx > 0) & (dy < 0) | (dx < 0) & (dy > 0)).cast("bigint"))
        .cast("bigint")
        .alias("discordant"),
    )
    n_g = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.max("_stride").cast("bigint").alias("stride"),
    )
    tx = (
        docs.groupBy("source", "x")
        .agg(F.count("*").cast("bigint").alias("t"))
        .groupBy("source")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2)
            .cast("bigint")
            .alias("n1")
        )
    )
    ty = (
        docs.groupBy("source", "y")
        .agg(F.count("*").cast("bigint").alias("t"))
        .groupBy("source")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2)
            .cast("bigint")
            .alias("n2")
        )
    )
    joined = cd.join(n_g, "source").join(tx, "source").join(ty, "source")
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("bigint")
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / F.sqrt(
        (n0 - F.col("n1")).cast("double") * (n0 - F.col("n2")).cast("double")
    )
    return joined.select(
        "source", "n", "stride", "concordant", "discordant",
        tau.alias("tau_b"),
    ).orderBy("source")


Q288_SQL = f"""
WITH d0 AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS y
  FROM documents
),
d AS (
  SELECT source, doc_id, x, y,
         greatest(1, CAST(ceil(CAST(nsrc AS DOUBLE)
                               / {KENDALL_BLOCK_CAP}) AS BIGINT)) AS stride
  FROM (
    SELECT d0.*,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
           count(*) OVER (PARTITION BY source) AS nsrc
    FROM d0)
  WHERE (rn - 1) % greatest(1, CAST(ceil(CAST(nsrc AS DOUBLE)
                                         / {KENDALL_BLOCK_CAP}) AS BIGINT)) = 0
),
cd AS (
  SELECT a.source,
         CAST(coalesce(sum(CASE WHEN (a.x > b.x AND a.y > b.y)
                                  OR (a.x < b.x AND a.y < b.y)
                           THEN 1 END), 0) AS BIGINT) AS concordant,
         CAST(coalesce(sum(CASE WHEN (a.x > b.x AND a.y < b.y)
                                  OR (a.x < b.x AND a.y > b.y)
                           THEN 1 END), 0) AS BIGINT) AS discordant
  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.source
),
ng AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
              CAST(max(stride) AS BIGINT) AS stride
       FROM d GROUP BY source),
tx AS (
  SELECT source, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n1
  FROM (SELECT source, x, CAST(count(*) AS BIGINT) AS t
        FROM d GROUP BY source, x)
  GROUP BY source
),
ty AS (
  SELECT source, CAST(sum(t * (t - 1) / 2) AS BIGINT) AS n2
  FROM (SELECT source, y, CAST(count(*) AS BIGINT) AS t
        FROM d GROUP BY source, y)
  GROUP BY source
)
SELECT cd.source, n, stride, concordant, discordant,
       CAST(concordant - discordant AS DOUBLE)
         / sqrt(CAST(CAST(n * (n - 1) / 2 AS BIGINT) - n1 AS DOUBLE)
                * CAST(CAST(n * (n - 1) / 2 AS BIGINT) - n2 AS DOUBLE))
         AS tau_b
FROM cd JOIN ng ON cd.source = ng.source
        JOIN tx ON cd.source = tx.source
        JOIN ty ON cd.source = ty.source
ORDER BY cd.source
"""


# ---------------------------------------------------------------------------
# q289 Kruskal-Wallis H across all five event types (nonparametric
# one-way ANOVA sibling of q278; rank analogue of the source-mix drift
# gate). Ranks on the distinct-value domain: per-value totals -> one
# distributed prefix scan -> average ranks; per-(value,group) counts join the
# rank table on value. Tie-corrected H. Single row out.
# ---------------------------------------------------------------------------
def q289_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    vg = ev.groupBy("value", "event_type").agg(
        F.count("*").cast("bigint").alias("c")
    )
    dv = vg.groupBy("value").agg(F.sum("c").cast("bigint").alias("t"))
    # distributed exclusive prefix sum (functions/prefix.py) — the
    # distinct-value domain grows with N, never a single partition
    ranked = prefix_sums(dv, ["value"], {"t": "_bf"}).select(
        "value",
        "t",
        (
            F.col("_bf").cast("double")
            + (F.col("t").cast("double") + F.lit(1.0)) / F.lit(2.0)
        ).alias("avg_rank"),
    )
    grp = (
        vg.join(ranked, "value")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_g"),
            F.sum(F.col("c").cast("double") * F.col("avg_rank")).alias("r_g"),
        )
    )
    tie = ranked.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("double")
        .alias("tie_term")
    )
    agg = grp.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g").cast("double"))
        .alias("rr"),
    ).crossJoin(F.broadcast(tie))
    nd = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (nd * (nd + 1.0)) * F.col("rr")
        - F.lit(3.0) * (nd + 1.0)
    )
    corr = F.lit(1.0) - F.col("tie_term") / (nd * nd * nd - nd)
    return agg.select(
        "n",
        (F.col("k") - 1).cast("bigint").alias("df"),
        h.alias("h_stat"),
        (h / corr).alias("h_corrected"),
    )


Q289_SQL = """
WITH vg AS (
  SELECT value, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY value, event_type
),
dv AS (SELECT value, CAST(sum(c) AS BIGINT) AS t FROM vg GROUP BY value),
ranked AS (
  SELECT value, t,
         CAST(coalesce(sum(t) OVER (
           ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS DOUBLE) + (CAST(t AS DOUBLE) + 1.0) / 2.0 AS avg_rank
  FROM dv
),
grp AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_g,
         sum(CAST(c AS DOUBLE) * avg_rank) AS r_g
  FROM vg JOIN ranked USING (value)
  GROUP BY event_type
),
tie AS (
  SELECT CAST(sum(t * t * t - t) AS DOUBLE) AS tie_term FROM ranked
),
agg AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         sum(r_g * r_g / CAST(n_g AS DOUBLE)) AS rr
  FROM grp
)
SELECT n,
       CAST(k - 1 AS BIGINT) AS df,
       12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * rr
         - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h_stat,
       (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * rr
         - 3.0 * (CAST(n AS DOUBLE) + 1.0))
         / (1.0 - tie_term / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                              * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
         AS h_corrected
FROM agg, tie
"""


# ---------------------------------------------------------------------------
# q290 Brown-Forsythe (median-based Levene) variance-equality test on
# value across event types — the robust precondition check for q278's
# ANOVA. Exact per-group medians (Spark `median` == DuckDB `median`,
# both interpolate the even-count midpoint in double), broadcast back
# (5 rows), then one-way ANOVA on |x - median_g| via single-pass
# per-group co-moments. Two row-scale passes total.
# ---------------------------------------------------------------------------
def q290_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("value").cast("double") - F.col("med")).alias("z"),
    )
    g = z.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("z").alias("s_g"),
        F.sum(F.col("z") * F.col("z")).alias("ss_g"),
    )
    agg = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("s_g").alias("s"),
        F.sum(F.col("s_g") * F.col("s_g") / F.col("n_g").cast("double"))
        .alias("sb"),
        F.sum("ss_g").alias("ss"),
    )
    nd = F.col("n").cast("double")
    ssb = F.col("sb") - F.col("s") * F.col("s") / nd
    ssw = F.col("ss") - F.col("sb")
    df1 = (F.col("k") - 1).cast("bigint")
    df2 = (F.col("n") - F.col("k")).cast("bigint")
    return agg.select(
        df1.alias("df1"),
        df2.alias("df2"),
        (
            (ssb / df1.cast("double")) / (ssw / df2.cast("double"))
        ).alias("f_stat"),
    )


Q290_SQL = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
z AS (
  SELECT e.event_type, abs(CAST(e.value AS DOUBLE) - m.med) AS z
  FROM events e JOIN med m ON e.event_type = m.event_type
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
         sum(z) AS s_g, sum(z * z) AS ss_g
  FROM z GROUP BY event_type
),
agg AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         sum(s_g) AS s,
         sum(s_g * s_g / CAST(n_g AS DOUBLE)) AS sb,
         sum(ss_g) AS ss
  FROM g
)
SELECT CAST(k - 1 AS BIGINT) AS df1,
       CAST(n - k AS BIGINT) AS df2,
       ((sb - s * s / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
         / ((ss - sb) / CAST(n - k AS DOUBLE)) AS f_stat
FROM agg
"""


# ---------------------------------------------------------------------------
# q291 Spearman rank correlation per source between char count and
# whitespace token count. Average ranks via rank() + (ties-1)/2 inside
# per-source windows (partitioned — no global sort), then the explicit
# Pearson sum formula on the ranks (identical arithmetic both engines;
# no reliance on engine corr() internals).
# ---------------------------------------------------------------------------
def q291_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("double").alias("x"),
        F.size(F.split(F.col("text"), " ")).cast("double").alias("y"),
    )
    wx = Window.partitionBy("source").orderBy("x")
    wy = Window.partitionBy("source").orderBy("y")
    tx = Window.partitionBy("source", "x")
    ty = Window.partitionBy("source", "y")
    ranked = docs.select(
        "source",
        (
            F.rank().over(wx).cast("double")
            + (F.count("*").over(tx).cast("double") - 1.0) / 2.0
        ).alias("rx"),
        (
            F.rank().over(wy).cast("double")
            + (F.count("*").over(ty).cast("double") - 1.0) / 2.0
        ).alias("ry"),
    )
    g = ranked.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return g.select("source", "n", (num / den).alias("rho")).orderBy("source")


Q291_SQL = """
WITH d AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS x,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS y
  FROM documents
),
ranked AS (
  SELECT source,
         CAST(rank() OVER (PARTITION BY source ORDER BY x) AS DOUBLE)
           + (CAST(count(*) OVER (PARTITION BY source, x) AS DOUBLE) - 1.0)
             / 2.0 AS rx,
         CAST(rank() OVER (PARTITION BY source ORDER BY y) AS DOUBLE)
           + (CAST(count(*) OVER (PARTITION BY source, y) AS DOUBLE) - 1.0)
             / 2.0 AS ry
  FROM d
),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
         sum(rx * rx) AS sxx, sum(ry * ry) AS syy
  FROM ranked GROUP BY source
)
SELECT source, n,
       (CAST(n AS DOUBLE) * sxy - sx * sy)
         / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                * (CAST(n AS DOUBLE) * syy - sy * sy)) AS rho
FROM g
ORDER BY source
"""


QUERIES = {
    "q286_roc_curve": q286_roc_curve,
    "q287_calibration_bins": q287_calibration_bins,
    "q288_kendall_tau": q288_kendall_tau,
    "q289_kruskal_wallis": q289_kruskal_wallis,
    "q290_brown_forsythe": q290_brown_forsythe,
    "q291_spearman_rho": q291_spearman_rho,
}

ORACLE: dict[str, str] = {
    "q286_roc_curve": Q286_SQL,
    "q287_calibration_bins": Q287_SQL,
    "q288_kendall_tau": Q288_SQL,
    "q289_kruskal_wallis": Q289_SQL,
    "q290_brown_forsythe": Q290_SQL,
    "q291_spearman_rho": Q291_SQL,
}


# ---------------------------------------------------------------------------
# q305 — deterministic Poisson bootstrap CI for the per-type mean
# value: BOOT_B resamples, each event's multiplicity in resample r
# drawn as Poisson(1) via fixed CDF thresholds over the PORTABLE
# uniform mix of (event_id, r) (functions/hashing.py — both engines
# compute the identical integer, so the "random" multiplicities are
# bit-identical; the Poisson bootstrap is the standard distributed
# variant because it needs no global resample index). Per-(type, r)
# weighted means are rounded to 8 dp before ranking (identical decimal
# summands -> rank ties resolve identically), then the 2.5%/97.5%
# empirical quantiles come from a row_number over the B=BOOT_B rows
# per type — a bounded window (B rows/group), never a row-scale sort.
# Scale: the only row-scale work is one numpy pass over the event
# stream (guide §4.2, §2.1) — r16 PERF: the B-way logical fan-out
# (crossJoin(broadcast(reps)) + per-cell codegen hash) became ONE
# mapInPandas pass that draws all B multiplicities per row as an
# (rows x B) numpy grid and emits per-(type, r) PARTIAL weighted sums
# (<= n_types*B rows per batch), so the exchange ships partials, never
# the fanned stream. The numpy mix replicates functions/hashing.py
# lane by lane on int64 (same %/div arithmetic, non-negative ids,
# < 2^63/1700 — no wrap), and u = cast-to-double / HASH_MOD compares
# against the same _POIS literals, so every multiplicity is the
# bit-identical integer; the 8-dp round before ranking absorbs the
# partial-sum association order exactly as it already absorbed Spark's
# partition-order sum. Final rows verified equal vs the fan-out form
# at sf0.001/0.01/0.1 + the synthetic events decade.
# ---------------------------------------------------------------------------
from ..functions.hashing import (
    HASH_MOD,
    KNUTH1,
    KNUTH2,
    PORTABLE_ID_MOD,
    mix_duck,
)

BOOT_B = 200
# P(X<=k) for Poisson(1), k=0..3 (fixed 9-dp decimals; >3 -> 4)
_POIS = (0.367879441, 0.735758882, 0.919698603, 0.980988245)
_LO_RANK = 5  # ceil(0.025 * 200)
_HI_RANK = 196  # floor(0.975 * 200) + 1


def q305_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    B = BOOT_B

    def draw(batches):
        import numpy as np
        import pandas as pd

        r = np.arange(B, dtype=np.int64)
        p0, p1, p2, p3 = _POIS
        M, K1, K2, H = PORTABLE_ID_MOD, KNUTH1, KNUTH2, HASH_MOD
        # ALLOCATION DISCIPLINE (guide §5 memory): the (rows x B) grid
        # is computed in CAP-row blocks through buffers allocated ONCE
        # per task and reused via out= — a whole-batch grid allocates
        # ~8 fresh 16 MB temporaries per Arrow batch, and first-touch
        # page faults on fresh large blocks dominated the runtime
        # (measured: whole-batch grid 10-12 s at sf0.1 / 29-57 s at
        # the events decade vs 1.5 s / 7-9 s blocked+reused; even the
        # JVM fan-out it replaced was 2.2 s / 14-16 s). Every
        # arithmetic op is unchanged — same int64 lane math, same
        # float division, same thresholds — only buffer reuse.
        CAP = 2048  # rows per block: each grid temp stays ~3 MB
        X = np.empty((CAP, B), dtype=np.int64)
        T = np.empty((CAP, B), dtype=np.int64)
        U = np.empty((CAP, B), dtype=np.float64)
        BB = np.empty((CAP, B), dtype=bool)
        MI = np.empty((CAP, B), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            eid_all = pdf["event_id"].to_numpy(dtype=np.int64)
            val_all = pdf["value"].to_numpy(dtype=np.float64)
            et_all = pdf["event_type"].to_numpy()
            types, codes = np.unique(et_all, return_inverse=True)
            smv = np.zeros((len(types), B), dtype=np.float64)
            sm = np.zeros((len(types), B), dtype=np.int64)
            for s in range(0, len(eid_all), CAP):
                n = min(CAP, len(eid_all) - s)
                eid = eid_all[s : s + n]
                x, t, u, bb, mi = X[:n], T[:n], U[:n], BB[:n], MI[:n]
                np.add(eid[:, None] * B, r[None, :], out=x)
                np.floor_divide(x, M, out=t)
                np.mod(t, M, out=t)
                np.multiply(t, K2, out=t)
                np.mod(x, M, out=x)
                np.multiply(x, K1, out=x)
                np.add(x, t, out=x)
                np.mod(x, H, out=x)
                np.true_divide(x, float(H), out=u)
                mi[...] = 0
                for p in (p0, p1, p2, p3):
                    np.greater_equal(u, p, out=bb)
                    np.add(mi, bb, out=mi)
                cb = codes[s : s + n]
                vb = val_all[s : s + n]
                for tt in range(len(types)):
                    sel = cb == tt
                    if not sel.any():
                        continue
                    mw = mi[sel]
                    smv[tt] += (mw * vb[sel, None]).sum(axis=0)
                    sm[tt] += mw.sum(axis=0)
            yield pd.DataFrame(
                {
                    "event_type": np.repeat(types, B),
                    "r": np.tile(r, len(types)),
                    "smv": smv.ravel(),
                    "sm": sm.ravel(),
                }
            )

    partials = ev.mapInPandas(
        draw, "event_type string, r bigint, smv double, sm bigint"
    )
    per = (
        partials.groupBy("event_type", "r")
        .agg(F.sum("smv").alias("smv"), F.sum("sm").cast("bigint").alias("sm"))
        .select(
            "event_type",
            "r",
            F.round(F.col("smv") / F.col("sm").cast("double"), 8).alias(
                "bmean"
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy("bmean", "r")
    ranked = per.withColumn("rk", F.row_number().over(w))
    base = ev.groupBy("event_type").agg(F.avg("value").alias("mean_value"))
    ci = (
        ranked.groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rk") == _LO_RANK, F.col("bmean"))).alias(
                "ci_lo"
            ),
            F.min(F.when(F.col("rk") == _HI_RANK, F.col("bmean"))).alias(
                "ci_hi"
            ),
        )
    )
    return (
        base.join(ci, "event_type")
        .select("event_type", "mean_value", "ci_lo", "ci_hi")
        .orderBy("event_type")
    )


_Q305_U = mix_duck(f"event_id * {BOOT_B} + r")

Q305_SQL = f"""
WITH fanned AS (
  SELECT event_type, value, r,
         CAST({_Q305_U} AS DOUBLE) / {HASH_MOD}.0 AS u
  FROM events, (SELECT CAST(range AS BIGINT) AS r FROM range(0, {BOOT_B})) t
),
per AS (
  SELECT event_type, r,
         round(sum(CAST(CASE WHEN u < {_POIS[0]} THEN 0
                             WHEN u < {_POIS[1]} THEN 1
                             WHEN u < {_POIS[2]} THEN 2
                             WHEN u < {_POIS[3]} THEN 3
                             ELSE 4 END AS DOUBLE) * value)
               / sum(CAST(CASE WHEN u < {_POIS[0]} THEN 0
                               WHEN u < {_POIS[1]} THEN 1
                               WHEN u < {_POIS[2]} THEN 2
                               WHEN u < {_POIS[3]} THEN 3
                               ELSE 4 END AS DOUBLE)), 8) AS bmean
  FROM fanned
  GROUP BY event_type, r
),
ranked AS (
  SELECT event_type, bmean,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY bmean, r) AS rk
  FROM per
),
base AS (
  SELECT event_type, avg(value) AS mean_value FROM events GROUP BY event_type
)
SELECT b.event_type, b.mean_value,
       min(CASE WHEN rk = {_LO_RANK} THEN bmean END) AS ci_lo,
       min(CASE WHEN rk = {_HI_RANK} THEN bmean END) AS ci_hi
FROM base b JOIN ranked r ON b.event_type = r.event_type
GROUP BY b.event_type, b.mean_value
ORDER BY b.event_type
"""


# ---------------------------------------------------------------------------
# q306 — Welch's unequal-variance t-test between the ROC pair's value
# distributions (completes the repo's two-sample family: q282 is the
# rank test, q281 assumes pooled variance, q278/q289 are k-sample).
# Single-pass co-moments per group; Welch-Satterthwaite df. One
# row-scale aggregate, 1-row output.
# ---------------------------------------------------------------------------
def q306_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(ROC_POS, ROC_NEG)
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    a = (F.col("event_type") == ROC_POS).cast("int")
    agg = g.agg(
        F.sum(F.col("n") * a).cast("bigint").alias("na"),
        F.sum(F.col("s") * a).alias("sa"),
        F.sum(F.col("ss") * a).alias("ssa"),
        F.sum(F.col("n") * (1 - a)).cast("bigint").alias("nb"),
        F.sum(F.col("s") * (1 - a)).alias("sb"),
        F.sum(F.col("ss") * (1 - a)).alias("ssb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma = F.col("sa") / na
    mb = F.col("sb") / nb
    va = (F.col("ssa") - F.col("sa") * F.col("sa") / na) / (na - 1.0)
    vb = (F.col("ssb") - F.col("sb") * F.col("sb") / nb) / (nb - 1.0)
    sea, seb = va / na, vb / nb
    t = (ma - mb) / F.sqrt(sea + seb)
    df = (sea + seb) * (sea + seb) / (
        sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)
    )
    return agg.select(
        "na",
        "nb",
        (ma - mb).alias("mean_diff"),
        t.alias("t_stat"),
        df.alias("welch_df"),
    )


Q306_SQL = f"""
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(value) AS s, sum(value * value) AS ss
  FROM events WHERE event_type IN ('{ROC_POS}', '{ROC_NEG}')
  GROUP BY event_type
),
agg AS (
  SELECT CAST(sum(CASE WHEN event_type = '{ROC_POS}' THEN n END) AS BIGINT)
           AS na,
         sum(CASE WHEN event_type = '{ROC_POS}' THEN s END) AS sa,
         sum(CASE WHEN event_type = '{ROC_POS}' THEN ss END) AS ssa,
         CAST(sum(CASE WHEN event_type = '{ROC_NEG}' THEN n END) AS BIGINT)
           AS nb,
         sum(CASE WHEN event_type = '{ROC_NEG}' THEN s END) AS sb,
         sum(CASE WHEN event_type = '{ROC_NEG}' THEN ss END) AS ssb
  FROM g
)
SELECT na, nb,
       sa / na - sb / nb AS mean_diff,
       (sa / na - sb / nb)
         / sqrt(((ssa - sa * sa / na) / (na - 1.0)) / na
                + ((ssb - sb * sb / nb) / (nb - 1.0)) / nb) AS t_stat,
       (((ssa - sa * sa / na) / (na - 1.0)) / na
        + ((ssb - sb * sb / nb) / (nb - 1.0)) / nb)
       * (((ssa - sa * sa / na) / (na - 1.0)) / na
          + ((ssb - sb * sb / nb) / (nb - 1.0)) / nb)
       / ((((ssa - sa * sa / na) / (na - 1.0)) / na)
            * (((ssa - sa * sa / na) / (na - 1.0)) / na) / (na - 1.0)
          + (((ssb - sb * sb / nb) / (nb - 1.0)) / nb)
            * (((ssb - sb * sb / nb) / (nb - 1.0)) / nb) / (nb - 1.0))
         AS welch_df
FROM agg
"""


QUERIES.update(
    {
        "q305_poisson_bootstrap": q305_poisson_bootstrap,
        "q306_welch_ttest": q306_welch_ttest,
    }
)

ORACLE.update(
    {
        "q305_poisson_bootstrap": Q305_SQL,
        "q306_welch_ttest": Q306_SQL,
    }
)


# ---------------------------------------------------------------------------
# q316 — two-sample Cramér–von Mises statistic between the ROC pair's
# value distributions: T = (n*m)/(n+m)^2 * Σ_z t_z (F_n(z) − G_m(z))²
# over the combined sample (distinct values weighted by multiplicity).
# CvM weighs the WHOLE CDF gap where KS (q220) sees only the max —
# the round's third distribution-drift lens. Exact integer prefix
# sums on the distinct-value domain (distributed — functions/prefix.py);
# one division per term at output.
# ---------------------------------------------------------------------------
def q316_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(ROC_POS, ROC_NEG)
    )
    dv = ev.groupBy("value").agg(
        F.sum((F.col("event_type") == ROC_POS).cast("bigint"))
        .cast("bigint")
        .alias("ca"),
        F.sum((F.col("event_type") == ROC_NEG).cast("bigint"))
        .cast("bigint")
        .alias("cb"),
    )
    # distributed inclusive prefix sums (functions/prefix.py) — the
    # distinct-value domain grows with N, never a single partition
    cum = prefix_sums(
        dv, ["value"], {"ca": "fa", "cb": "fb"}, inclusive=True
    ).select((F.col("ca") + F.col("cb")).alias("t"), "fa", "fb")
    tot = dv.agg(
        F.sum("ca").cast("bigint").alias("n"),
        F.sum("cb").cast("bigint").alias("m"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    gap = (
        F.col("fa").cast("double") / F.col("n").cast("double")
        - F.col("fb").cast("double") / F.col("m").cast("double")
    )
    agg = j.agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.sum(F.col("t").cast("double") * gap * gap).alias("_s"),
    )
    nm = F.col("n").cast("double") * F.col("m").cast("double")
    nn = (F.col("n") + F.col("m")).cast("double")
    return agg.select(
        "n", "m", (nm / (nn * nn) * F.col("_s")).alias("t_stat")
    )


Q316_SQL = f"""
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('{ROC_POS}', '{ROC_NEG}')
),
dv AS (
  SELECT value,
         CAST(coalesce(sum(CASE WHEN event_type = '{ROC_POS}' THEN 1 END), 0)
              AS BIGINT) AS ca,
         CAST(coalesce(sum(CASE WHEN event_type = '{ROC_NEG}' THEN 1 END), 0)
              AS BIGINT) AS cb
  FROM ev GROUP BY value
),
cum AS (
  SELECT ca + cb AS t,
         CAST(sum(ca) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fa,
         CAST(sum(cb) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fb
  FROM dv
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n, CAST(sum(cb) AS BIGINT) AS m FROM dv
)
SELECT n, m,
       CAST(n AS DOUBLE) * CAST(m AS DOUBLE)
         / (CAST(n + m AS DOUBLE) * CAST(n + m AS DOUBLE))
         * sum(CAST(t AS DOUBLE)
               * (CAST(fa AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(fb AS DOUBLE) / CAST(m AS DOUBLE))
               * (CAST(fa AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(fb AS DOUBLE) / CAST(m AS DOUBLE))) AS t_stat
FROM cum, tot
GROUP BY n, m
"""


QUERIES.update({"q316_cvm_test": q316_cvm_test})
ORACLE.update({"q316_cvm_test": Q316_SQL})


# ---------------------------------------------------------------------------
# q334 — Neyman optimal sampling allocation: split a fixed audit
# budget of SAMPLE_BUDGET draws across sources proportionally to
# N_h * s_h (stratum size x stddev of n_chars) — the variance-minimal
# design for estimating the corpus mean. Output compares the Neyman
# share against proportional allocation (the delta column is the
# budget a proportional design wastes on low-variance strata). q288
# audits metric agreement per source; this decides how much LOOKING
# each source deserves. Companion to q330 (which draws a sample;
# this sizes one) and q332 (mixture weights for training; this is
# the audit-side allocation).
# Scale: one stddev_samp agg per source + a 1-row broadcast total;
# floor() on identical doubles both engines.
# ---------------------------------------------------------------------------
SAMPLE_BUDGET = 1000


def q334_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("x")
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.stddev_samp("x").alias("sd"),
    )
    tot = per.agg(
        F.sum(F.col("n_docs") * F.col("sd")).alias("tot_ns"),
        F.sum("n_docs").cast("double").alias("tot_n"),
    )
    ney = (F.col("n_docs") * F.col("sd")) / F.col("tot_ns")
    prop = F.col("n_docs") / F.col("tot_n")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(F.col("sd"), 4).alias("len_sd"),
            F.round(ney, 4).alias("neyman_share"),
            F.floor(ney * SAMPLE_BUDGET).cast("bigint").alias("neyman_n"),
            F.round(ney - prop, 4).alias("delta_vs_proportional"),
        )
        .orderBy("source")
    )


Q334_SQL = f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         stddev_samp(CAST(n_chars AS DOUBLE)) AS sd
  FROM documents GROUP BY source
),
tot AS (
  SELECT sum(n_docs * sd) AS tot_ns, CAST(sum(n_docs) AS DOUBLE) AS tot_n
  FROM per
)
SELECT source, n_docs,
       round(sd, 4) AS len_sd,
       round(n_docs * sd / tot_ns, 4) AS neyman_share,
       CAST(floor(n_docs * sd / tot_ns * {SAMPLE_BUDGET}) AS BIGINT)
         AS neyman_n,
       round(n_docs * sd / tot_ns - n_docs / tot_n, 4)
         AS delta_vs_proportional
FROM per, tot
ORDER BY source
"""


QUERIES.update({"q334_neyman_allocation": q334_neyman_allocation})
ORACLE.update({"q334_neyman_allocation": Q334_SQL})


# ---------------------------------------------------------------------------
# q354 — split-conformal prediction intervals (Vovk; Lei et al.): the
# distribution-free coverage guarantee a serving pipeline wants around
# a point predictor, computed at corpus scale. Split: the portable
# mix of event_id routes each event to CALIBRATION (even mix) or TEST
# (odd mix) — deterministic across engines/retries, the q102
# hash-split discipline. Predictor: per-event-type calibration mean
# (round 4). Nonconformity: |value - pred| (round 4). qhat per type =
# the ceil((n_cal + 1) * (1 - alpha))-th smallest calibration residual
# — the FINITE-SAMPLE-CORRECTED order statistic, selected by integer
# row_number (no quantile interpolation, so both engines pick the
# identical residual). Coverage on the held-out half should be
# >= 1 - alpha in expectation; the gap is the driver-graded number.
# Scale: two shuffles on event_type (a handful of groups), residual
# ranking is a per-type window; nothing global.
# ---------------------------------------------------------------------------
CONF_ALPHA = 0.1


def q354_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import mix_spark

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("v")
    )
    is_cal = F.expr(mix_spark("event_id")) % 2 == 0
    ev = ev.withColumn("is_cal", is_cal)
    pred = (
        ev.where("is_cal")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("v"), 4).alias("pred"),
            F.count(F.lit(1)).cast("bigint").alias("n_cal"),
        )
    )
    resid = (
        ev.join(F.broadcast(pred), "event_type")
        .withColumn("r", F.round(F.abs(F.col("v") - F.col("pred")), 4))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("r").asc(), F.col("event_id")
    )
    qhat = (
        resid.where("is_cal")
        .withColumn("rn", F.row_number().over(w))
        .where(
            F.col("rn")
            == F.ceil((F.col("n_cal") + 1) * F.lit(1.0 - CONF_ALPHA)).cast(
                "int"
            )
        )
        .select("event_type", F.col("r").alias("qhat"))
    )
    return (
        resid.where(~F.col("is_cal"))
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.max("qhat").alias("qhat"),
            F.round(
                F.sum(F.when(F.col("r") <= F.col("qhat"), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("coverage"),
        )
        .select(
            "event_type",
            "n_cal",
            "n_test",
            "qhat",
            "coverage",
            F.lit(1.0 - CONF_ALPHA).alias("target"),
        )
        .orderBy("event_type")
    )


def _q354_sql() -> str:
    from ..functions.hashing import mix_duck

    return f"""
WITH ev AS (
  SELECT event_id, event_type, CAST(value AS DOUBLE) AS v,
         ({mix_duck('event_id')}) % 2 = 0 AS is_cal
  FROM events
),
pred AS (
  SELECT event_type, round(avg(v), 4) AS pred,
         CAST(count(*) AS BIGINT) AS n_cal
  FROM ev WHERE is_cal GROUP BY event_type
),
resid AS (
  SELECT e.event_id, e.event_type, e.is_cal, p.pred, p.n_cal,
         round(abs(e.v - p.pred), 4) AS r
  FROM ev e JOIN pred p USING (event_type)
),
qhat AS (
  SELECT event_type, r AS qhat FROM (
    SELECT event_type, r, n_cal,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY r, event_id) AS rn
    FROM resid WHERE is_cal
  ) WHERE rn = CAST(ceil((n_cal + 1) * {1.0 - CONF_ALPHA}) AS INT)
)
SELECT t.event_type,
       max(t.n_cal) AS n_cal,
       CAST(count(*) AS BIGINT) AS n_test,
       max(q.qhat) AS qhat,
       round(sum(CASE WHEN t.r <= q.qhat THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS coverage,
       {1.0 - CONF_ALPHA} AS target
FROM resid t JOIN qhat q USING (event_type)
WHERE NOT t.is_cal
GROUP BY t.event_type
ORDER BY t.event_type
"""


Q354_SQL = _q354_sql()

QUERIES.update({"q354_conformal_interval": q354_conformal_interval})
ORACLE.update({"q354_conformal_interval": Q354_SQL})


# ---------------------------------------------------------------------------
# q367 — anytime-valid A/B monitor (e-process; Ramdas et al. 2023,
# "Game-theoretic statistics and safe anytime-valid inference"): the
# sequential complement to q249's fixed-horizon A/B z-test. A live
# pipeline peeks at the dashboard every day; classical p-values are
# invalid under optional stopping, while an e-process E_t can be
# monitored continuously and rejects the moment E_t >= 1/alpha with
# ville-inequality type-I control AT ANY stopping rule. Stream here =
# the daily click/purchase mix; H0: an event in the pair is a
# purchase with p = 1/2. E-value: the Hoeffding supermartingale
#   log E_t = lambda * (k_t - n_t/2) - lambda^2 * n_t / 8,  lambda=1/4
# = 0.125*(2*k_t - n_t) - 0.0078125*n_t — every coefficient is DYADIC
# and k_t/n_t are exact BIGINT running counts, so log E_t is EXACT in
# doubles on both engines (no libm exp/log anywhere; the rejection
# threshold ln(1/alpha) is one pinned literal both sides).
# Scale shape: one conditional-count reduce to the day frame, then
# the functions/prefix.py distributed inclusive prefix sums for the
# running counts (day frames are calendar-bounded, but the machinery
# costs nothing and keeps the no-unpartitioned-window invariant
# uniform); the e-statistic is a scan-side expression of two bigints.
# ---------------------------------------------------------------------------
AB_E_LAMBDA = 0.25
AB_E_LOG_THRESHOLD = 2.995732273553991  # ln(1/0.05), pinned literal


def ab_daily_frame(ev: DataFrame, extra_keys: tuple = ()) -> DataFrame:
    """Day-frame reduce for the A/B e-process: (day, n, k) from raw
    click/purchase events. Shared by the batch op and the streaming
    monitor face (streaming/ingest_stream.py), whose per-micro-batch
    partials — this same reduce keyed additionally by source file via
    ``extra_keys`` — merge into exactly this frame: integer sums
    commute, so stream==batch is an exact equality."""
    return ev.where(
        F.col("event_type").isin("click", "purchase")
    ).groupBy(
        *extra_keys,
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("bigint"))
        .cast("bigint")
        .alias("k"),
    )


def ab_monitor_from_daily(daily: DataFrame) -> DataFrame:
    """The q367 e-process table from a (day, n, k) day frame."""
    cum = prefix_sums(
        daily, ["day"], {"n": "n_t", "k": "k_t"}, inclusive=True
    )
    e_log = (
        F.lit(0.125) * (F.lit(2) * F.col("k_t") - F.col("n_t")).cast("double")
        - F.lit(0.0078125) * F.col("n_t").cast("double")
    )
    return (
        cum.select(
            "day",
            "n_t",
            "k_t",
            F.round(e_log, 6).alias("log_e"),
            (e_log >= F.lit(AB_E_LOG_THRESHOLD)).cast("bigint").alias(
                "rejected"
            ),
        )
        .orderBy("day")
    )


def q367_anytime_ab_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ab_monitor_from_daily(
        ab_daily_frame(load(spark, sf_dir, "events"))
    )


Q367_SQL = f"""
WITH ev AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_b
  FROM events WHERE event_type IN ('click', 'purchase')
),
daily AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(is_b) AS BIGINT) AS k
  FROM ev GROUP BY day
),
cum AS (
  SELECT day,
         CAST(sum(n) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_t,
         CAST(sum(k) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS k_t
  FROM daily
)
SELECT day, n_t, k_t,
       round(0.125 * CAST(2 * k_t - n_t AS DOUBLE)
             - 0.0078125 * CAST(n_t AS DOUBLE), 6) AS log_e,
       CAST(CASE WHEN 0.125 * CAST(2 * k_t - n_t AS DOUBLE)
                      - 0.0078125 * CAST(n_t AS DOUBLE)
                      >= {AB_E_LOG_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT)
         AS rejected
FROM cum
ORDER BY day
"""

QUERIES.update({"q367_anytime_ab_monitor": q367_anytime_ab_monitor})
ORACLE.update({"q367_anytime_ab_monitor": Q367_SQL})


# ---------------------------------------------------------------------------
# q368 — sequential drift e-detector (the anytime-valid version of
# the q220/q266 drift gates): q220's KS and q266's PSI compare two
# FIXED windows, which is the wrong tool for a monitor that looks
# every day — repeated looks invalidate fixed-window thresholds
# exactly as they invalidate p-values (the q367 argument). This op
# monitors the daily 'view'-value stream against a reference window
# (the first DRIFT_REF_DAYS days) with a Hoeffding e-process on
# range-normalized increments y_i = (x_i - mu0)/R in [-1, 1]:
#   log E_t = lambda * sum(y_i) - lambda^2 * n_t / 2,   lambda = 1/8
# rejecting at the pinned ln(1/0.05) Ville boundary — valid at ANY
# stopping rule, so "alert the day it crosses" is sound.
# Exactness discipline (the q367 contract): values become integer
# CENTS; sum(y_i) = A_t / (n_ref * R) where A_t = sum(n_ref*x_i -
# S_ref) is an EXACT BIGINT prefix (n_ref*sum_day(x) - n_day*S_ref
# per day, prefix-summed via functions/prefix.py); the single
# bigint/bigint -> double division is IEEE-deterministic, and every
# other coefficient is dyadic — bit-identical cross-engine with no
# libm. (At 100 TB the bigint products move to DECIMAL(38,0); the
# plan shape is unchanged. Monitored values outside the reference
# range stretch y beyond [-1,1] — the standard bounded-increment
# caveat; a production deploy clips or widens R.)
# Scale shape: one conditional reduce to the day frame, distributed
# prefix sums for the day rank and the running (A_t, n_t), broadcast
# 1-row reference aggregate, scan-side e-statistic.
# ---------------------------------------------------------------------------
DRIFT_TYPE = "view"
DRIFT_REF_DAYS = 7
DRIFT_E_LAMBDA = 0.125
DRIFT_E_LOG_THRESHOLD = 2.995732273553991  # ln(1/0.05), pinned literal


def drift_daily_frame(ev: DataFrame, extra_keys: tuple = ()) -> DataFrame:
    """Day-frame reduce for the drift e-process: (day, n, s, mx, mn)
    over integer cents. Shared by the batch op and the streaming
    monitor face (which keys it additionally by source file via
    ``extra_keys``) — sums, min and max all merge associatively
    across micro-batch partials, so stream==batch is exact."""
    cents = F.round(F.col("value") * 100).cast("bigint")
    return ev.where(F.col("event_type") == DRIFT_TYPE).groupBy(
        *extra_keys,
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("s"),
        F.max(cents).alias("mx"),
        F.min(cents).alias("mn"),
    )


def drift_edetector_from_daily(daily: DataFrame) -> DataFrame:
    """The q368 e-process table from a (day, n, s, mx, mn) day frame."""
    ranked = prefix_sums(
        daily.withColumn("_one", F.lit(1)),
        ["day"],
        {"_one": "idx"},
        inclusive=True,
    )
    ref = (
        ranked.where(F.col("idx") <= DRIFT_REF_DAYS)
        .agg(
            F.sum("n").cast("bigint").alias("n_ref"),
            F.sum("s").cast("bigint").alias("s_ref"),
            # greatest(..., 1): a zero-range reference window (all
            # reference values identical) would divide by zero below —
            # Spark yields NULL while the oracle's CASE falls to ELSE,
            # a cross-engine mismatch. Clamping to 1 cent defines the
            # degenerate case identically on both engines (r14 advice).
            F.greatest(F.max("mx") - F.min("mn"), F.lit(1))
            .cast("bigint")
            .alias("r_ref"),
        )
    )
    mon = (
        ranked.where(F.col("idx") > DRIFT_REF_DAYS)
        .crossJoin(F.broadcast(ref))
        .withColumn(
            # sum over the day's events of (n_ref*x_i - S_ref), exact
            "a_day",
            (F.col("n_ref") * F.col("s") - F.col("n") * F.col("s_ref"))
            .cast("bigint"),
        )
    )
    cum = prefix_sums(
        mon, ["day"], {"a_day": "a_t", "n": "n_t"}, inclusive=True
    )
    e_log = F.lit(DRIFT_E_LAMBDA) * (
        F.col("a_t").cast("double")
        / (F.col("n_ref") * F.col("r_ref")).cast("double")
    ) - F.lit(DRIFT_E_LAMBDA * DRIFT_E_LAMBDA / 2.0) * F.col("n_t").cast(
        "double"
    )
    return (
        cum.select(
            "day",
            "n_t",
            F.round(e_log, 6).alias("log_e"),
            (e_log >= F.lit(DRIFT_E_LOG_THRESHOLD)).cast("bigint").alias(
                "rejected"
            ),
        )
        .orderBy("day")
    )


def q368_drift_edetector(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drift_edetector_from_daily(
        drift_daily_frame(load(spark, sf_dir, "events"))
    )


Q368_SQL = f"""
WITH ev AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = '{DRIFT_TYPE}'
),
daily AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         max(cents) AS mx, min(cents) AS mn
  FROM ev GROUP BY day
),
ranked AS (
  SELECT day, n, s, mx, mn,
         row_number() OVER (ORDER BY day) AS idx
  FROM daily
),
ref AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_ref,
         CAST(sum(s) AS BIGINT) AS s_ref,
         CAST(greatest(max(mx) - min(mn), 1) AS BIGINT) AS r_ref
  FROM ranked WHERE idx <= {DRIFT_REF_DAYS}
),
mon AS (
  SELECT day, n, CAST(n_ref * s - n * s_ref AS BIGINT) AS a_day,
         n_ref, r_ref
  FROM ranked, ref WHERE idx > {DRIFT_REF_DAYS}
),
cum AS (
  SELECT day, n_ref, r_ref,
         CAST(sum(n) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_t,
         CAST(sum(a_day) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS a_t
  FROM mon
)
SELECT day, n_t,
       round({DRIFT_E_LAMBDA} * (CAST(a_t AS DOUBLE)
               / CAST(n_ref * r_ref AS DOUBLE))
             - {DRIFT_E_LAMBDA * DRIFT_E_LAMBDA / 2.0}
               * CAST(n_t AS DOUBLE), 6) AS log_e,
       CAST(CASE WHEN {DRIFT_E_LAMBDA} * (CAST(a_t AS DOUBLE)
                        / CAST(n_ref * r_ref AS DOUBLE))
                      - {DRIFT_E_LAMBDA * DRIFT_E_LAMBDA / 2.0}
                        * CAST(n_t AS DOUBLE)
                      >= {DRIFT_E_LOG_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT)
         AS rejected
FROM cum
ORDER BY day
"""

QUERIES.update({"q368_drift_edetector": q368_drift_edetector})
ORACLE.update({"q368_drift_edetector": Q368_SQL})
