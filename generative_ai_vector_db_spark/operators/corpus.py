"""Corpus-preparation operators for LLM training-data pipelines —
the north-star extensions beyond the reference's ingest surface
(the reference stops at chunk+embed+store; a 100 TB pretraining corpus
also needs packing, mixture control, quantization and profiling).

All four are pure built-in expressions with exact DuckDB twins:

* q79 token packing — the standard "concatenate-and-chop" pretraining
  packing: documents are laid head-to-tail per language partition in
  deterministic doc_id order and cut into fixed token-budget packs.
  One shuffle (window per lang); the cumulative offset is a running
  window sum, so a 100 TB corpus packs in a single pass.
* q80 corpus mixing — deterministic round-robin interleave across
  languages (the "data mixture" order for a training run). Per-lang
  row_number + a broadcast 5-row language-index dim; the global mix
  position is computed ARITHMETICALLY ((rn-1)*n_langs + lang_idx), not
  with a global-sort window — no single-partition bottleneck at scale.
* q81 embedding quantization — symmetric int8 per vector:
  q = floor(x/max_abs*127 + 0.5). floor(+0.5) instead of round():
  half-up floor is defined identically in Spark and DuckDB, while
  round() differs at .5 boundaries by engine. max/abs/divide are
  IEEE-exact in identical order → bit-identical ints both engines.
  Emits scalar summaries (sum/min/max/nonzero) — flat-sortable output.
* q82 length histogram — fixed-width corpus length profile; floor
  integer bucketing, one tiny aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import HASH_MOD, mix_core_duck, mix_core_spark
from ..functions.prefix import prefix_sums
from ..tables import load

PACK_BUDGET = 512  # tokens per pack
HIST_WIDTH = 100  # chars per histogram bucket


# ---------------------------------------------------------------------------
# q79 — token packing (concatenate-and-chop)
# ---------------------------------------------------------------------------
def q79_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_cum = docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    start = F.col("cum_tokens") - F.col("n_tokens")
    return (
        with_cum.select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor(start / PACK_BUDGET).cast("bigint").alias("pack_id"),
            (start % PACK_BUDGET).cast("bigint").alias("pack_offset"),
        )
        .orderBy("lang", "doc_id")
    )


Q79_SQL = f"""
WITH cum AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         sum(len(string_split(text, ' '))) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       CAST(floor((cum_tokens - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS pack_id,
       CAST((cum_tokens - n_tokens) % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM cum
ORDER BY lang, doc_id
"""


# ---------------------------------------------------------------------------
# q80 — deterministic corpus mixing order (round-robin by language)
# ---------------------------------------------------------------------------
def q80_corpus_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    langs = (
        docs.select("lang")
        .distinct()
        .withColumn("lang_idx", F.row_number().over(Window.orderBy("lang")).cast("bigint"))
        .withColumn("n_langs", F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint"))
    )
    rn = F.row_number().over(Window.partitionBy("lang").orderBy("doc_id")).cast("bigint")
    ranked = docs.select("doc_id", "lang").withColumn("rn", rn)
    return (
        ranked.join(F.broadcast(langs), "lang")
        .select(
            "doc_id",
            "lang",
            "rn",
            ((F.col("rn") - 1) * F.col("n_langs") + F.col("lang_idx")).alias("mix_pos"),
        )
        .orderBy("mix_pos", "doc_id")
    )


Q80_SQL = """
WITH langs AS (
  SELECT lang,
         CAST(row_number() OVER (ORDER BY lang) AS BIGINT) AS lang_idx,
         CAST(count(*) OVER () AS BIGINT) AS n_langs
  FROM (SELECT DISTINCT lang FROM documents)
),
ranked AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rn
  FROM documents
)
SELECT r.doc_id, r.lang, r.rn,
       (r.rn - 1) * l.n_langs + l.lang_idx AS mix_pos
FROM ranked r JOIN langs l USING (lang)
ORDER BY mix_pos, doc_id
"""


# ---------------------------------------------------------------------------
# q81 — symmetric int8 embedding quantization (scalar summaries)
# ---------------------------------------------------------------------------
def q81_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    # widen first; abs/max are exact, so max_abs is bit-identical across
    # engines (dedup.py PERF NOTE: materialize arrays as attributes)
    dbl = emb.withColumn(
        "d", F.transform("embedding", lambda x: x.cast("double"))
    )
    scaled = dbl.withColumn(
        "max_abs", F.array_max(F.transform("d", lambda x: F.abs(x)))
    )
    q = F.transform(
        "d", lambda x: F.floor(x / F.col("max_abs") * 127 + F.lit(0.5)).cast("bigint")
    )
    with_q = scaled.withColumn("q", q)
    return (
        with_q.select(
            "vec_id",
            F.round("max_abs", 4).alias("max_abs"),
            F.aggregate("q", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
            F.array_min("q").alias("q_min"),
            F.array_max("q").alias("q_max"),
            F.size(F.filter("q", lambda x: x != 0)).cast("bigint").alias("q_nonzero"),
        )
        .orderBy("vec_id")
    )


Q81_SQL = """
WITH widened AS (
  SELECT vec_id,
         [CAST(x AS DOUBLE) for x in embedding] AS d
  FROM embeddings
),
scaled AS (
  SELECT vec_id, d,
         list_max([abs(x) for x in d]) AS max_abs
  FROM widened
),
quantized AS (
  SELECT vec_id, max_abs,
         [CAST(floor(x / max_abs * 127 + 0.5) AS BIGINT) for x in d] AS q
  FROM scaled
)
SELECT vec_id,
       round(max_abs, 4) AS max_abs,
       CAST(list_sum(q) AS BIGINT) AS q_sum,
       list_min(q) AS q_min,
       list_max(q) AS q_max,
       CAST(len(list_filter(q, x -> x != 0)) AS BIGINT) AS q_nonzero
FROM quantized
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# q82 — document length histogram
# ---------------------------------------------------------------------------
def q82_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = (F.floor(F.length("text") / HIST_WIDTH) * HIST_WIDTH).cast("bigint")
    total = Window.partitionBy()
    return (
        docs.select(bucket.alias("bucket_start"))
        .groupBy("bucket_start")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "share",
            F.round(F.col("n_docs") / F.sum("n_docs").over(total), 4),
        )
        .orderBy("bucket_start")
    )


Q82_SQL = f"""
WITH b AS (
  SELECT CAST(floor(length(text) / {HIST_WIDTH}) * {HIST_WIDTH} AS BIGINT) AS bucket_start
  FROM documents
)
SELECT bucket_start,
       count(*) AS n_docs,
       round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 4) AS share
FROM b
GROUP BY bucket_start
ORDER BY bucket_start
"""


# ---------------------------------------------------------------------------
# q88 — distribution-based curation: keep documents at or above their
# language's median length. The per-lang medians are a 5-row exact
# percentile aggregate (broadcast back); the filter itself is a narrow
# scan-side predicate. Exact `percentile` on integer n_chars keeps both
# engines bit-identical ((a+b)/2 on ints < 2^52 is exact in double).
# ---------------------------------------------------------------------------
def q88_median_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    med = docs.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("median_chars")
    )
    return (
        docs.join(F.broadcast(med), "lang")
        .where(F.col("n_chars") >= F.col("median_chars"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round("median_chars", 4).alias("median_chars"),
        )
        .orderBy("doc_id")
    )


Q88_SQL = """
WITH med AS (
  SELECT lang, percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars) AS median_chars
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars, round(med.median_chars, 4) AS median_chars
FROM documents d JOIN med USING (lang)
WHERE d.n_chars >= med.median_chars
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# q119 — n-gram decontamination (GPT-3-style 13-gram overlap): a train
# document is contaminated if any of its 13-grams appears in the eval
# split. Eval membership is the deterministic doc_id residue (same rule
# family as q102's leak-free split); the eval gram set is DISTINCT and
# broadcast — eval sets are small by construction, so the train side
# never shuffles. Complements q65 (whole-doc fingerprint semi-join)
# with the industry-standard partial-overlap rule.
# Scale: train grams stay (doc_id, gram) pairs, deduped per doc via
# array_distinct BEFORE the explode — the join is |train grams| x
# broadcast. At larger vocabularies swap the gram string for
# xxhash64(gram) on both sides of the join (engine-local, never
# compared cross-engine).
# ---------------------------------------------------------------------------
DECONTAM_N = 13
EVAL_MOD = 20  # doc_id % EVAL_MOD == 0 -> eval split


def _word_ngrams(words, n: int):
    """n-gram strings over a MATERIALIZED words attribute (see dedup.py
    PERF NOTE), guarded for short docs like text._bigrams."""
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def q119_ngram_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.lower(F.col("text")), " ").alias("words"))
        .select("doc_id", _word_ngrams(F.col("words"), DECONTAM_N).alias("grams"))
    )
    pairs = docs.select("doc_id", F.explode("grams").alias("gram"))
    eval_grams = (
        pairs.where(F.col("doc_id") % EVAL_MOD == 0)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = pairs.where(F.col("doc_id") % EVAL_MOD != 0).alias("t")
    joined = train.join(F.broadcast(eval_grams).alias("e"),
                        F.col("t.gram") == F.col("e.gram"), "left")
    return (
        joined.groupBy("t.doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("e.hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


Q119_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents
),
g0 AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(words) - {DECONTAM_N - 1}, 0)),
           i -> array_to_string(words[i:i+{DECONTAM_N - 1}], ' '))) AS gram
  FROM w
),
g AS (SELECT DISTINCT doc_id, gram FROM g0),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = 0)
SELECT g.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN ev.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       sum(CASE WHEN ev.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
         AS contaminated
FROM g LEFT JOIN ev ON g.gram = ev.gram
WHERE g.doc_id % {EVAL_MOD} <> 0
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


# ---------------------------------------------------------------------------
# q120 — duplicated-span profile (exact substring dedup, Lee et al.
# "Deduplicating Training Data Makes Language Models Better" shape):
# every 20-word rolling window is an instance; an instance is
# duplicated if its window text occurs in at least one OTHER document.
# Two shuffles on the window key (per-gram doc count, then the join
# back) + one on doc_id — never all-pairs. At scale the window string
# becomes a rolling hash (engine-local); the fixture-scale oracle
# groups on the exact string so both engines agree byte-for-byte.
# ---------------------------------------------------------------------------
SPAN_W = 20


def q120_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.lower(F.col("text")), " ").alias("words"))
        .select(
            "doc_id",
            F.when(
                F.size("words") >= SPAN_W,
                F.transform(
                    F.sequence(F.lit(0), F.size("words") - SPAN_W),
                    lambda i: F.concat_ws(" ", F.slice(F.col("words"), i + 1, SPAN_W)),
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("spans"),
        )
    )
    inst = docs.select("doc_id", F.explode("spans").alias("span"))
    per_span = inst.groupBy("span").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return (
        inst.alias("i")
        .join(per_span.alias("s"), F.col("i.span") == F.col("s.span"))
        .groupBy("i.doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("s.n_docs") > 1).cast("bigint")).alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 4).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


Q120_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents
),
inst AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(words) - {SPAN_W - 1}, 0)),
           i -> array_to_string(words[i:i+{SPAN_W - 1}], ' '))) AS span
  FROM w
),
per_span AS (
  SELECT span, count(DISTINCT doc_id) AS n_docs FROM inst GROUP BY span
)
SELECT i.doc_id,
       count(*) AS n_windows,
       CAST(sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_windows,
       round(CAST(sum(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS dup_frac
FROM inst i JOIN per_span s ON i.span = s.span
GROUP BY i.doc_id
ORDER BY i.doc_id
"""


# ---------------------------------------------------------------------------
# q121 — unigram language-model scoring (the cheap perplexity proxy
# used for corpus quality filtering, e.g. CCNet-style): build the
# corpus unigram distribution (one agg), broadcast it back onto the
# token stream, and score each document by its mean token log
# probability. The vocabulary aggregate is orders of magnitude smaller
# than the corpus (Heaps' law) — broadcast is the deployment shape up
# to multi-million-term vocabularies; the token stream never shuffles
# except for the per-doc aggregate.
# ---------------------------------------------------------------------------
def q121_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    freq = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .select("w", F.log(F.col("cnt") / F.col("total")).alias("logp"))
    )
    return (
        toks.alias("t")
        .join(F.broadcast(freq).alias("f"), F.col("t.w") == F.col("f.w"))
        .groupBy("t.doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("f.logp") / F.count(F.lit(1)), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


Q121_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
freq AS (
  SELECT w, ln(CAST(count(*) AS DOUBLE)
               / (SELECT count(*) FROM toks)) AS logp
  FROM toks GROUP BY w
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       round(sum(f.logp) / count(*), 4) AS avg_logprob
FROM toks t JOIN freq f ON t.w = f.w
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# q143 — embedding dimension health report: per-dimension mean/stddev/
# min/max over the first DIM_STATS_K dimensions — the collapsed-
# dimension / dead-unit check run before trusting an embedding table
# for retrieval or dedup (a dimension with ~0 stddev carries no
# signal; a wildly off-center mean breaks cosine assumptions).
# ``posexplode`` fans out rows but the per-dim aggregation state is 4
# moments × dim — partial aggregation reduces map-side, the shuffle
# carries only DIM_STATS_K groups regardless of corpus size. Stats are
# rounded to 3 (not 4) decimals: sums of millions of floats differ in
# the last ulp between engines, and 3 decimals absorbs that without
# hiding a dead dimension.
# ---------------------------------------------------------------------------
DIM_STATS_K = 8


def q143_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).where(F.col("dim") < DIM_STATS_K)
    x = F.col("x").cast("double")
    return (
        exploded.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(x), 3).alias("mean"),
            F.round(F.stddev(x), 3).alias("std"),
            F.round(F.min(x), 3).alias("min_v"),
            F.round(F.max(x), 3).alias("max_v"),
        )
        .orderBy("dim")
    )


Q143_SQL = f"""
SELECT g.i - 1 AS dim, count(*) AS n,
       round(avg(CAST(embedding[g.i] AS DOUBLE)), 3) AS mean,
       round(stddev(CAST(embedding[g.i] AS DOUBLE)), 3) AS std,
       round(min(CAST(embedding[g.i] AS DOUBLE)), 3) AS min_v,
       round(max(CAST(embedding[g.i] AS DOUBLE)), 3) AS max_v
FROM embeddings, generate_series(1, {DIM_STATS_K}) AS g(i)
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q150 — keep-BEST dedup: exact dedup over a whitespace/case-normalized
# fingerprint that keeps the highest-quality copy instead of the
# min-id copy (q12's rule). This is how production corpora dedup:
# mirrors of the same page differ in padding/casing, and you want the
# longest (least-truncated) capture to survive. One narrow projection
# computes the fingerprint scan-side (sha256 of the normalized text —
# the shuffle key is 32 bytes, never the document body), then a single
# rank window per fingerprint picks the survivor: longest n_chars,
# ties to the smallest doc_id for determinism. One shuffle total, and
# at 100 TB the shuffle carries (fp, doc_id, n_chars, source) — the
# text column is re-joined only for survivors if the caller needs it.
# ---------------------------------------------------------------------------
def q150_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # explicit char class, not \s: Java regex \s includes \x0B while
    # DuckDB's RE2 \s is [\t\n\f\r ] — an engine-dependent fingerprint
    # would silently split dedup groups on edge whitespace.
    fp = F.sha2(
        F.lower(F.trim(F.regexp_replace("text", "[ \\t\\n\\r\\f]+", " "))), 256
    ).alias("fp")
    keyed = docs.select("doc_id", "source", "n_chars", fp)
    w = Window.partitionBy("fp").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_dupes", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("n_dupes").cast("bigint").alias("n_dupes"),
        )
        .orderBy("doc_id")
    )


Q150_SQL = r"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         -- explicit char class matching the Spark side (Java \s and
         -- RE2 \s disagree on \x0B); see q150_dedup_keep_best.
         sha256(lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')))) AS fp
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY fp
                            ORDER BY n_chars DESC, doc_id) AS rk,
         count(*) OVER (PARTITION BY fp) AS n_dupes
  FROM keyed
)
SELECT doc_id, source, n_chars, CAST(n_dupes AS BIGINT) AS n_dupes
FROM ranked
WHERE rk = 1
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q154 — corpus novelty curve: as documents stream in (doc_id order),
# what fraction of each arrival decile's distinct 5-grams was never
# seen before? The saturation diagnostic for corpus growth — when the
# novel-gram share flattens, additional same-source data stops adding
# information (scaling-laws data curation). Each gram's first-seen doc
# is one min() agg keyed by the gram (shuffle rows = distinct grams,
# map-side combined); novelty joins back on the SAME gram key (no
# second shuffle shape), then deciles are a broadcast 1-row width
# computed from max(doc_id) — integer arithmetic, no global sort/ntile.
# ---------------------------------------------------------------------------
NOVELTY_N = 5
NOVELTY_BUCKETS = 10


def q154_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", F.split(F.lower("text"), " ").alias("words"))
        .select("doc_id", F.explode(_word_ngrams(F.col("words"), NOVELTY_N)).alias("gram"))
    )
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    width = docs.agg(
        F.floor(F.max("doc_id") / NOVELTY_BUCKETS + 1).alias("_w")
    )
    per_doc = (
        grams.join(first_seen, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("bigint")).alias(
                "n_novel"
            ),
        )
    )
    return (
        per_doc.crossJoin(F.broadcast(width))
        .groupBy(F.floor(F.col("doc_id") / F.col("_w")).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("n_grams"),
            F.sum("n_novel").cast("bigint").alias("n_novel"),
            F.round(F.sum("n_novel") / F.sum("n_grams"), 4).alias("novel_share"),
        )
        .orderBy("bucket")
    )


Q154_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents
),
g0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(words) - {NOVELTY_N - 1}, 0)),
           i -> array_to_string(words[i:i+{NOVELTY_N - 1}], ' ')))) AS gram
  FROM w
),
first_seen AS (
  SELECT gram, min(doc_id) AS first_doc FROM g0 GROUP BY gram
),
width AS (
  SELECT CAST(floor(max(doc_id) / {NOVELTY_BUCKETS} + 1) AS BIGINT) AS _w
  FROM documents
),
per_doc AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM g0 g JOIN first_seen f USING (gram)
  GROUP BY g.doc_id
)
SELECT CAST(floor(d.doc_id / w._w) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_grams) AS BIGINT) AS n_grams,
       CAST(sum(d.n_novel) AS BIGINT) AS n_novel,
       round(CAST(sum(d.n_novel) AS DOUBLE) / sum(d.n_grams), 4) AS novel_share
FROM per_doc d CROSS JOIN width w
GROUP BY 1
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# q183 — dup-saturation curve: as the corpus arrives (doc_id order),
# what share of each arrival decile is an EXACT duplicate of an
# earlier document? The doc-level complement of q154's gram-novelty
# curve: q154 says when new text stops arriving, this says when the
# crawler starts re-fetching whole documents — the signal to stop
# ingesting a source. A doc is a dup iff its normalized fingerprint's
# first-seen doc_id (one min() agg on the fp key, map-side combined)
# is smaller than its own. Deciles by integer width from a broadcast
# 1-row max — no global sort, no window over the corpus.
# ---------------------------------------------------------------------------
DUPCURVE_BUCKETS = 10


def q183_dup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    fp = F.sha2(
        F.lower(F.trim(F.regexp_replace("text", "[ \\t\\n\\r\\f]+", " "))), 256
    )
    keyed = docs.select("doc_id", fp.alias("fp"))
    first_seen = keyed.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    width = docs.agg(
        F.floor(F.max("doc_id") / DUPCURVE_BUCKETS + 1).alias("_w")
    )
    marked = keyed.join(first_seen, "fp").crossJoin(F.broadcast(width))
    return (
        marked.groupBy(
            F.floor(F.col("doc_id") / F.col("_w")).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("first_doc") < F.col("doc_id")).cast("bigint"))
            .cast("bigint")
            .alias("n_dups"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_dups",
            F.round(
                F.col("n_dups").cast("double") / F.col("n_docs").cast("double"),
                4,
            ).alias("dup_share"),
        )
        .orderBy("bucket")
    )


Q183_SQL = rf"""
WITH keyed AS (
  SELECT doc_id,
         sha256(lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')))) AS fp
  FROM documents
),
first_seen AS (SELECT fp, min(doc_id) AS first_doc FROM keyed GROUP BY fp),
width AS (SELECT floor(max(doc_id) / {DUPCURVE_BUCKETS} + 1) AS _w FROM documents)
SELECT CAST(floor(k.doc_id / w._w) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN f.first_doc < k.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dups,
       round(CAST(sum(CASE WHEN f.first_doc < k.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 4) AS dup_share
FROM keyed k JOIN first_seen f USING (fp) CROSS JOIN width w
GROUP BY 1
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# q184 — deterministic epoch shuffling into training shards: per epoch,
# every doc gets an engine-portable pseudo-random key (Knuth
# multiplicative hash of (doc_id, epoch) — the q132 device), a shard
# assignment, and its position within the shard. This is how shuffled
# training data is actually laid out at 100 TB: you never globally
# rank the corpus; you route by key to N_SHARDS bounded shards
# (repartition) and sort WITHIN each shard (the window below is
# per-(epoch, shard) — partitions stay shard-sized). Re-running any
# epoch reproduces the identical order on both engines — resumable
# training without storing a permutation.
# ---------------------------------------------------------------------------
SHUFFLE_EPOCHS = 2
N_SHARDS = 8
EPOCH_SALT = 97003


def q184_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(SHUFFLE_EPOCHS).select(
        F.col("id").cast("bigint").alias("epoch")
    )
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        # two-lane portable mix (functions/hashing.py): the previous
        # single-lane residue form gave doc_id and doc_id + 1e6 the
        # SAME shuffle position in EVERY epoch — systematic pair
        # correlation where this operator promises per-doc randomness.
        # The high lane breaks the aliasing (period 1e12) and the sum
        # stays < 5.5e15, no int64 wrap / DuckDB raise for any id.
        (
            (
                F.expr(mix_core_spark("doc_id"))
                + F.col("epoch") * EPOCH_SALT
                + 12345
            )
            % HASH_MOD
        ).alias("skey"),
    )
    w = Window.partitionBy("epoch", F.col("skey") % N_SHARDS).orderBy(
        "skey", "doc_id"
    )
    return (
        keyed.select(
            "epoch",
            "doc_id",
            (F.col("skey") % N_SHARDS).cast("bigint").alias("shard"),
            F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
        )
        .orderBy("epoch", "shard", "pos_in_shard")
    )


Q184_SQL = f"""
WITH epochs AS (SELECT unnest(generate_series(0, {SHUFFLE_EPOCHS - 1})) AS epoch),
keyed AS (
  SELECT CAST(e.epoch AS BIGINT) AS epoch, d.doc_id,
         ({mix_core_duck("d.doc_id")} + e.epoch * {EPOCH_SALT}
          + 12345) % {HASH_MOD} AS skey
  FROM documents d CROSS JOIN epochs e
)
SELECT epoch, doc_id,
       CAST(skey % {N_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY epoch, skey % {N_SHARDS}
                               ORDER BY skey, doc_id) AS BIGINT)
           AS pos_in_shard
FROM keyed
ORDER BY epoch, shard, pos_in_shard
"""


# ---------------------------------------------------------------------------
# q185 — dedup savings report: what exact dedup is WORTH, per source —
# docs removed, tokens removed, and the share of the source's token
# mass that is duplicated. The cost-benefit view that decides whether
# to run the heavier near-dup passes (q44/q159) on a source at all.
# One fingerprint scan (32-byte shuffle keys), first-seen min-agg,
# then a per-source aggregate; integer sums, one double division.
# ---------------------------------------------------------------------------
def q185_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    fp = F.sha2(
        F.lower(F.trim(F.regexp_replace("text", "[ \\t\\n\\r\\f]+", " "))), 256
    )
    keyed = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        fp.alias("fp"),
    )
    first_seen = keyed.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    marked = keyed.join(first_seen, "fp").withColumn(
        "is_dup", (F.col("first_doc") < F.col("doc_id")).cast("bigint")
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_dup").cast("bigint").alias("n_dup_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens_total"),
            F.sum(F.col("is_dup") * F.col("n_tok"))
            .cast("bigint")
            .alias("tokens_duplicated"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            "tokens_total",
            "tokens_duplicated",
            F.round(
                F.col("tokens_duplicated").cast("double")
                / F.col("tokens_total").cast("double"),
                4,
            ).alias("dup_token_share"),
        )
        .orderBy("source")
    )


Q185_SQL = r"""
WITH keyed AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         sha256(lower(trim(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')))) AS fp
  FROM documents
),
first_seen AS (SELECT fp, min(doc_id) AS first_doc FROM keyed GROUP BY fp),
marked AS (
  SELECT k.source, k.n_tok,
         CASE WHEN f.first_doc < k.doc_id THEN 1 ELSE 0 END AS is_dup
  FROM keyed k JOIN first_seen f USING (fp)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
       CAST(sum(n_tok) AS BIGINT) AS tokens_total,
       CAST(sum(is_dup * n_tok) AS BIGINT) AS tokens_duplicated,
       round(CAST(sum(is_dup * n_tok) AS DOUBLE)
             / CAST(sum(n_tok) AS DOUBLE), 4) AS dup_token_share
FROM marked
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q162 — per-source token-budget mixture scheduler: allocate a global
# training-token budget across sources by temperature-flattened
# availability (p_s ∝ avail_s^alpha, alpha=0.5 — the multilingual-
# sampling standard: flatter than proportional, so small sources are
# up-weighted), capped at MIX_MAX_EPOCHS passes over any source
# (repetition hurts past a few epochs per scaling-law practice). The
# missing piece between q80 (interleave order) and q79 (packing): HOW
# MANY tokens to draw from each source. One narrow scan -> one
# per-source agg -> broadcast 1-row total; output rows = #sources.
# Drift guard: sqrt terms rounded to 8dp and summed as DECIMAL; the
# remaining arithmetic is single fixed-order double ops, and the
# integer budget math uses floor() (identical on both engines —
# round() ties differ: Spark HALF_UP vs DuckDB away-from-zero vs
# banker's, floor has no tie).
# ---------------------------------------------------------------------------
MIX_ALPHA = 0.5  # temperature; 0.5 == sqrt flattening
MIX_MAX_EPOCHS = 4
MIX_BUDGET_NUM, MIX_BUDGET_DEN = 3, 2  # budget = 1.5x total corpus tokens


def q162_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("avail_tokens"),
        )
    )
    sq = F.round(F.sqrt(F.col("avail_tokens").cast("double")), 8).cast(
        "decimal(27,8)"
    )
    flat = per_src.withColumn("sq", sq)
    totals = flat.agg(
        F.sum("sq").alias("sq_total"),
        F.sum("avail_tokens").cast("bigint").alias("avail_total"),
    )
    budget = F.floor(
        (F.col("avail_total") * MIX_BUDGET_NUM) / F.lit(float(MIX_BUDGET_DEN))
    )
    weight = F.col("sq").cast("double") / F.col("sq_total").cast("double")
    target = F.floor(budget.cast("double") * weight).cast("bigint")
    drawn = F.least(target, F.lit(MIX_MAX_EPOCHS) * F.col("avail_tokens")).cast(
        "bigint"
    )
    return (
        flat.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "avail_tokens",
            F.round(weight, 6).alias("mix_weight"),
            target.alias("target_tokens"),
            drawn.alias("drawn_tokens"),
            F.round(
                drawn.cast("double") / F.col("avail_tokens").cast("double"), 4
            ).alias("epochs"),
        )
        .orderBy("source")
    )


Q162_SQL = f"""
WITH per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
  FROM documents GROUP BY source
),
flat AS (
  SELECT *, CAST(round(sqrt(CAST(avail_tokens AS DOUBLE)), 8)
                 AS DECIMAL(27,8)) AS sq
  FROM per_src
),
totals AS (
  SELECT sum(sq) AS sq_total, CAST(sum(avail_tokens) AS BIGINT) AS avail_total
  FROM flat
)
SELECT f.source, f.n_docs, f.avail_tokens,
       round(CAST(f.sq AS DOUBLE) / CAST(t.sq_total AS DOUBLE), 6) AS mix_weight,
       CAST(floor(CAST(floor((t.avail_total * {MIX_BUDGET_NUM})
                             / {float(MIX_BUDGET_DEN)}) AS DOUBLE)
                  * (CAST(f.sq AS DOUBLE) / CAST(t.sq_total AS DOUBLE)))
            AS BIGINT) AS target_tokens,
       CAST(least(floor(CAST(floor((t.avail_total * {MIX_BUDGET_NUM})
                                   / {float(MIX_BUDGET_DEN)}) AS DOUBLE)
                        * (CAST(f.sq AS DOUBLE) / CAST(t.sq_total AS DOUBLE))),
                  {MIX_MAX_EPOCHS} * f.avail_tokens) AS BIGINT) AS drawn_tokens,
       round(CAST(least(floor(CAST(floor((t.avail_total * {MIX_BUDGET_NUM})
                                         / {float(MIX_BUDGET_DEN)}) AS DOUBLE)
                              * (CAST(f.sq AS DOUBLE)
                                 / CAST(t.sq_total AS DOUBLE))),
                        {MIX_MAX_EPOCHS} * f.avail_tokens) AS DOUBLE)
             / CAST(f.avail_tokens AS DOUBLE), 4) AS epochs
FROM flat f CROSS JOIN totals t
ORDER BY f.source
"""


# ---------------------------------------------------------------------------
# q196 — token-mass-weighted length quartiles per source: "what
# document length does the median TRAINING TOKEN come from" — the
# distribution that actually matters for batch shaping and truncation
# budgets (q103/q104), where the unweighted median (q88) is misleading
# because one 10k-char doc carries the token mass of a hundred
# 100-char docs. Pure integer arithmetic: per-source cumulative char
# mass over (n_chars, doc_id) order, quartile = smallest length whose
# cumulative mass reaches k/4 of the source total — no interpolation,
# no float percentile, bit-identical on both engines. One window + one
# aggregation, both partitioned by source (parallel across sources; no
# global sort).
# ---------------------------------------------------------------------------
def q196_weighted_length_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tw = Window.partitionBy("source")
    cum = docs.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(w).cast("bigint").alias("cum"),
        F.sum("n_chars").over(tw).cast("bigint").alias("total"),
    )
    return (
        cum.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("total").cast("bigint").alias("total_chars"),
            F.min(
                F.when(F.col("cum") * 4 >= F.col("total"), F.col("n_chars"))
            )
            .cast("bigint")
            .alias("wp25"),
            F.min(
                F.when(F.col("cum") * 2 >= F.col("total"), F.col("n_chars"))
            )
            .cast("bigint")
            .alias("wmedian"),
            F.min(
                F.when(F.col("cum") * 4 >= F.col("total") * 3, F.col("n_chars"))
            )
            .cast("bigint")
            .alias("wp75"),
        )
        .orderBy("source")
    )


Q196_SQL = """
WITH cum AS (
  SELECT source, n_chars,
         CAST(sum(n_chars) OVER (PARTITION BY source
                                 ORDER BY n_chars, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS total
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(total) AS BIGINT) AS total_chars,
       CAST(min(CASE WHEN cum * 4 >= total THEN n_chars END) AS BIGINT)
           AS wp25,
       CAST(min(CASE WHEN cum * 2 >= total THEN n_chars END) AS BIGINT)
           AS wmedian,
       CAST(min(CASE WHEN cum * 4 >= total * 3 THEN n_chars END) AS BIGINT)
           AS wp75
FROM cum
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q208 — perplexity filtering with a held-out LM (CCNet shape): train
# an add-one-smoothed unigram model on HALF the corpus (alternating
# doc_id blocks of 20 — block, not residue: the fixtures assign
# source = doc_id % 20, so a residue split would train on half the
# SOURCES instead of half of each source), score the
# OTHER half, and report per-source mean NLL and the share of
# documents a PPL_GATE filter would drop. The honest version of q121:
# scoring uses a model the scored text never trained, so boilerplate
# that saturates its own corpus can't score itself fluent. Engine-
# exact: each token type's log-prob is rounded ONCE to 8dp and summed
# as DECIMAL (order-independent, the q71 discipline) — never a raw
# float sum over shuffle order. OOV tokens take the smoothed
# 1/(N+V) mass via the left join's coalesce. Joins shuffle on the
# token key (vocabulary-bounded); per-doc and per-source rollups are
# ordinary partial aggregations.
# ---------------------------------------------------------------------------
PPL_GATE_NLL = 6.3  # drop docs with mean NLL above this (≈ ppl 545)


def q208_ppl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = lambda df: df.select(  # noqa: E731
        "doc_id",
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    )
    split = F.expr("(doc_id div 20) % 2")
    train = toks(docs.where(split == 0))
    held = toks(docs.where(split == 1))
    stats = train.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.countDistinct("w").cast("bigint").alias("_v"),
    )
    dec = "decimal(27,8)"
    vocab = (
        train.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(stats))
        .select(
            "w",
            F.round(
                -F.log((F.col("cnt") + 1) / (F.col("_n") + F.col("_v")).cast("double")),
                8,
            )
            .cast(dec)
            .alias("nll"),
        )
    )
    oov = stats.select(
        F.round(
            -F.log(1.0 / (F.col("_n") + F.col("_v")).cast("double")), 8
        )
        .cast(dec)
        .alias("nll_oov")
    )
    per_doc = (
        held.join(vocab, "w", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                (
                    F.sum(F.coalesce(F.col("nll"), F.col("nll_oov"))).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                ),
                4,
            )
            .cast("decimal(18,4)")
            .alias("mean_nll"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("mean_nll").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_nll"),
            F.sum(
                (F.col("mean_nll") > PPL_GATE_NLL).cast("bigint")
            )
            .cast("bigint")
            .alias("n_filtered"),
        )
        .orderBy("source")
    )


Q208_SQL = f"""
WITH train AS (
  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE (doc_id // 20) % 2 = 0
),
held AS (
  SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE (doc_id // 20) % 2 = 1
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS _n,
         CAST(count(DISTINCT w) AS BIGINT) AS _v
  FROM train
),
vocab AS (
  SELECT w,
         CAST(round(-ln((count(*) + 1)
                        / CAST((SELECT _n + _v FROM stats) AS DOUBLE)), 8)
              AS DECIMAL(27,8)) AS nll
  FROM train GROUP BY w
),
oov AS (
  SELECT CAST(round(-ln(1.0 / CAST(_n + _v AS DOUBLE)), 8) AS DECIMAL(27,8))
             AS nll_oov
  FROM stats
),
per_doc AS (
  SELECT h.doc_id, h.source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(round(CAST(sum(coalesce(v.nll, (SELECT nll_oov FROM oov)))
                         AS DOUBLE) / count(*), 4) AS DECIMAL(18,4))
             AS mean_nll
  FROM held h LEFT JOIN vocab v USING (w)
  GROUP BY h.doc_id, h.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(mean_nll) AS DOUBLE) / count(*), 4) AS avg_nll,
       CAST(sum(CASE WHEN mean_nll > {PPL_GATE_NLL} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_filtered
FROM per_doc
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q221 heavy-hitter top-k tokens — the two-pass sketch+verify pattern
# for frequent items at corpus scale. A naive global top-k over tokens
# shuffles the ENTIRE token stream on the token key (|vocab| can be
# billions of n-grams at 100 TB); the production shape is:
#   pass 1 — per-partition Misra-Gries sketch (capacity C) over the
#     token stream via mapInPandas: per Arrow batch, tokens are
#     pre-counted VECTORIZED (value_counts) and merged into the
#     bounded dict; overflow subtracts the minimum count from all
#     entries and evicts zeros (the weighted-MG step). Each partition
#     emits <= C candidate tokens — the only thing shuffled is
#     |partitions| * C candidates.
#   pass 2 — exact counts for the candidate set only: the candidate
#     list is BROADCAST back and the token stream re-scanned with a
#     semi-join + groupBy bounded by the candidate set, never |vocab|.
# MG guarantee: any token with global freq > N/C survives in at least
# one partition's sketch (averaging argument), so when the true k-th
# count exceeds N/C the two-pass result is EXACTLY the global top-k —
# which is what the DuckDB oracle checks (the fixture vocabulary is
# smaller than C, the strongest form of that guarantee; the
# capacity-starved regime is pinned in tests with a skewed synthetic
# corpus). Tokenization matches q83/q86/q87 (lowercase, \\s+ split).
# ---------------------------------------------------------------------------
MG_CAPACITY = 64
MG_TOPK = 20


def _mg_sketch_partition(batches):
    """Weighted Misra-Gries over an iterator of Arrow batches; emits
    the surviving candidate tokens of this partition."""
    import pandas as pd

    counts: dict[str, int] = {}
    for pdf in batches:
        for tok, w in pdf["term"].value_counts().items():
            counts[tok] = counts.get(tok, 0) + int(w)
        while len(counts) > MG_CAPACITY:
            m = min(counts.values())
            counts = {k: v - m for k, v in counts.items() if v > m}
    yield pd.DataFrame({"term": list(counts)})


def q221_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    tokens = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), "\\s+")).alias("term"))
        .where(F.col("term") != "")
    )
    candidates = (
        tokens.mapInPandas(_mg_sketch_partition, "term string").distinct()
    )
    topk = (
        tokens.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(MG_TOPK)
    )
    # Exactness precondition, enforced IN-PLAN so a capacity-starved
    # regime fails loudly instead of surfacing as a mystery oracle
    # mismatch after a fixture regeneration: the two-pass result is the
    # exact global top-k iff either (a) the candidate set IS the whole
    # vocabulary (nothing was ever evicted — today's fixture regime,
    # vocab < MG_CAPACITY), or (b) the k-th exact candidate count
    # exceeds N/MG_CAPACITY (the MG survival bound covers the top-k
    # margin). assert_true keeps schema and rows identical when the
    # precondition holds and raises at execution when it does not.
    # The countDistinct in (a) is a fixture-scale diagnostic only — at
    # 100 TB you drop it and rely on (b), which needs just N and the
    # already-tiny candidate recount.
    guard = (
        tokens.agg(
            F.count(F.lit(1)).alias("_n_tok"),
            F.countDistinct("term").alias("_n_vocab"),
        )
        .crossJoin(F.broadcast(candidates.agg(F.count(F.lit(1)).alias("_n_cand"))))
        .crossJoin(
            F.broadcast(
                topk.agg(F.min("n").alias("_kth_n"), F.count(F.lit(1)).alias("_k"))
            )
        )
    )
    exact_ok = (F.col("_n_vocab") == F.col("_n_cand")) | (
        F.col("_kth_n") * MG_CAPACITY > F.col("_n_tok")
    )
    return (
        topk.crossJoin(F.broadcast(guard))
        .where(F.assert_true(exact_ok, F.lit("q221: MG capacity starved — top-k not provably exact")).isNull())
        .select("term", "n")
        .orderBy(F.col("n").desc(), "term")
    )


Q221_SQL = f"""
WITH t AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM t
WHERE term <> ''
GROUP BY term
ORDER BY n DESC, term
LIMIT {MG_TOPK}
"""


# ---------------------------------------------------------------------------
# q225 dataset card — the one-pass summary card a training-data release
# ships with (datasheet/data-card shape): volume, source/language
# spread, length distribution, token mass and exact-duplicate rate, as
# a long-format (metric, value) table. ONE scan computes every number:
# a single groupBy-less aggregate (all partial-combinable map-side),
# then an 11-row stack — no per-metric re-scan, which at 100 TB is the
# difference between one job and eleven. Count-distincts are exact
# (the card is an audit artifact; q05's HLL is the approximate face).
# All doubles derive from exact integer sums with one final division,
# so both engines agree bit-for-bit before the round.
# ---------------------------------------------------------------------------
def q225_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.lower("text"), "\\s+"), lambda x: x != F.lit("")
        )
    )
    agg = docs.agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct("source").alias("_srcs"),
        F.countDistinct("lang").alias("_langs"),
        F.sum("n_chars").alias("_chars"),
        F.percentile("n_chars", F.lit(0.5)).alias("_p50"),
        F.percentile("n_chars", F.lit(0.9)).alias("_p90"),
        F.sum(toks).alias("_toks"),
        F.countDistinct("text").alias("_texts"),
    )
    return agg.selectExpr(
        """stack(11,
           'n_docs',          CAST(_n AS DOUBLE),
           'n_sources',       CAST(_srcs AS DOUBLE),
           'n_langs',         CAST(_langs AS DOUBLE),
           'total_chars',     CAST(_chars AS DOUBLE),
           'mean_chars',      round(CAST(_chars AS DOUBLE) / _n, 4),
           'p50_chars',       round(_p50, 4),
           'p90_chars',       round(_p90, 4),
           'total_tokens',    CAST(_toks AS DOUBLE),
           'mean_tokens',     round(CAST(_toks AS DOUBLE) / _n, 4),
           'distinct_texts',  CAST(_texts AS DOUBLE),
           'exact_dup_rate',  round(1.0 - CAST(_texts AS DOUBLE) / _n, 4)
        ) AS (metric, value)"""
    ).orderBy("metric")


Q225_SQL = """
WITH s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT source) AS BIGINT) AS srcs,
         CAST(count(DISTINCT lang) AS BIGINT) AS langs,
         CAST(sum(n_chars) AS BIGINT) AS chars,
         quantile_cont(n_chars, 0.5) AS p50,
         quantile_cont(n_chars, 0.9) AS p90,
         CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> ''))) AS BIGINT) AS toks,
         CAST(count(DISTINCT text) AS BIGINT) AS texts
  FROM documents
)
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, CAST(n AS DOUBLE) AS value FROM s
  UNION ALL SELECT 'n_sources', CAST(srcs AS DOUBLE) FROM s
  UNION ALL SELECT 'n_langs', CAST(langs AS DOUBLE) FROM s
  UNION ALL SELECT 'total_chars', CAST(chars AS DOUBLE) FROM s
  UNION ALL SELECT 'mean_chars', round(CAST(chars AS DOUBLE) / n, 4) FROM s
  UNION ALL SELECT 'p50_chars', round(p50, 4) FROM s
  UNION ALL SELECT 'p90_chars', round(p90, 4) FROM s
  UNION ALL SELECT 'total_tokens', CAST(toks AS DOUBLE) FROM s
  UNION ALL SELECT 'mean_tokens', round(CAST(toks AS DOUBLE) / n, 4) FROM s
  UNION ALL SELECT 'distinct_texts', CAST(texts AS DOUBLE) FROM s
  UNION ALL SELECT 'exact_dup_rate',
                   round(1.0 - CAST(texts AS DOUBLE) / n, 4) FROM s
)
ORDER BY metric
"""


# ---------------------------------------------------------------------------
# q228 quantile normalization — per-document quantile features (global
# and within-source percent_rank of length), the standard monotone
# feature transform before mixing heterogeneous sources into one
# curriculum. The POINT is the scalable rewrite: percent_rank is
# definitionally (rank-1)/(n-1) with rank-1 = #rows strictly smaller,
# so instead of a single-partition global row window (the naive
# `percent_rank() OVER (ORDER BY x)` — one reducer at 100 TB), we
#   1. reduce to per-DISTINCT-value counts (shuffle-parallel,
#      map-side partial);
#   2. prefix-sum those counts over the ordered distinct values — a
#      window over |distinct values| rows, bounded by the value
#      domain, not the row count (same reduce-then-scan shape as
#      q218/q220);
#   3. broadcast-join the cumulative counts back to the rows.
# The DuckDB oracle IS the naive window function — the hash-match
# proves the distributed rewrite computes percent_rank exactly,
# ties and all. Single-row groups emit 0.0 (the window definition).
# ---------------------------------------------------------------------------
def q228_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    n_tot = docs.agg(F.count(F.lit(1)).alias("_n"))
    gcounts = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("_c"))
    wg = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, -1
    )
    gless = gcounts.select(
        "n_chars",
        F.coalesce(F.sum("_c").over(wg), F.lit(0)).alias("_less_g"),
    )
    scounts = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("_c")
    )
    ws = Window.partitionBy("source").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sless = scounts.select(
        "source",
        "n_chars",
        F.coalesce(F.sum("_c").over(ws), F.lit(0)).alias("_less_s"),
    )
    sn = docs.groupBy("source").agg(F.count(F.lit(1)).alias("_n_s"))
    pr = lambda less, n: F.when(  # noqa: E731
        n > 1, F.round(less.cast("double") / (n - 1), 4)
    ).otherwise(F.lit(0.0))
    return (
        docs.join(F.broadcast(gless), "n_chars")
        .join(F.broadcast(sless), ["source", "n_chars"])
        .join(F.broadcast(sn), "source")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "doc_id",
            "source",
            "n_chars",
            pr(F.col("_less_g"), F.col("_n")).alias("pr_global"),
            pr(F.col("_less_s"), F.col("_n_s")).alias("pr_source"),
        )
        .orderBy("doc_id")
    )


Q228_SQL = """
SELECT doc_id, source, n_chars,
       round(percent_rank() OVER (ORDER BY n_chars), 4) AS pr_global,
       round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars),
             4) AS pr_source
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q297 — boilerplate n-gram mining (C4/RefinedWeb-style cleaning):
# word 8-grams that recur across >= BOILER_MIN_DOCS DISTINCT documents
# are boilerplate (headers, footers, navigation chrome, license
# blurbs); report each source's boilerplate exposure — what fraction
# of its shingle instances are corpus-frequent. Differs from q65
# (train/eval contamination) and q120 (pairwise span reuse): this is
# corpus-global frequent-shingle extraction, the removal LIST builder.
# Scale: shingles dedup per doc (array_distinct), one groupBy(gram)
# for doc frequency — the frequent set is tiny (it's the point), so
# the exposure join broadcasts it back onto the shingle stream; the
# stream itself shuffles only for the per-source aggregate.
# ---------------------------------------------------------------------------
BOILER_N = 8
BOILER_MIN_DOCS = 3


def q297_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.split(F.lower(F.col("text")), " ").alias("words"),
        )
        .select(
            "doc_id",
            "source",
            F.explode(_word_ngrams(F.col("words"), BOILER_N)).alias("gram"),
        )
    )
    freq = (
        docs.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .where(F.col("df") >= BOILER_MIN_DOCS)
    )
    hit = docs.join(
        F.broadcast(freq.select("gram", F.lit(1).alias("hot"))), "gram", "left"
    )
    return (
        hit.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hot"), F.lit(0)))
            .cast("bigint")
            .alias("n_boiler"),
        )
        .select(
            "source",
            "n_shingles",
            "n_boiler",
            (
                F.col("n_boiler").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("boiler_frac"),
        )
        .orderBy("source")
    )


Q297_SQL = f"""
WITH w AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS words
  FROM documents
),
g AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(words) - {BOILER_N - 1}, 0)),
           i -> array_to_string(words[i:i+{BOILER_N - 1}], ' ')))) AS gram
  FROM w
),
freq AS (
  SELECT gram FROM g GROUP BY gram
  HAVING count(*) >= {BOILER_MIN_DOCS}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(coalesce(sum(CASE WHEN f.gram IS NOT NULL THEN 1 END), 0)
            AS BIGINT) AS n_boiler,
       CAST(coalesce(sum(CASE WHEN f.gram IS NOT NULL THEN 1 END), 0)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS boiler_frac
FROM g LEFT JOIN freq f USING (gram)
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q298 — token-budget water-filling: allocate a global sampling budget
# (WATERFILL_SHARE of corpus tokens) across sources so no source
# exceeds its capacity and all uncapped sources get the same water
# level L: Σ min(cap_i, L) = B. Classic cap-allocation solved exactly
# in ONE window pass over the per-source aggregate (sort sources by
# capacity, the pivot is the first row where the remaining budget
# fits under the current capacity; 20 rows — metadata-scale, the
# row-scale work is only the per-source token count). The allocation
# plan feeds q80/q162-style mixture sampling with hard caps.
# Token = whitespace token count (q39 convention).
# ---------------------------------------------------------------------------
WATERFILL_SHARE_NUM, WATERFILL_SHARE_DEN = 1, 2  # B = 1/2 of corpus tokens


def q298_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    caps = (
        load(spark, sf_dir, "documents")
        .select(
            "source",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tok"),
        )
        .groupBy("source")
        .agg(F.sum("tok").cast("bigint").alias("cap"))
    )
    tot = caps.agg(
        F.sum("cap").cast("bigint").alias("_t"),
        F.count(F.lit(1)).cast("bigint").alias("_k"),
    )
    # distributed exclusive prefix sum + rank (functions/prefix.py:
    # idx = prefix count of ones) — |sources| grows with the corpus,
    # so no unpartitioned window over it
    ranked = prefix_sums(
        caps.withColumn("_one", F.lit(1)),
        ["cap", "source"],
        {"cap": "below", "_one": "idx"},
    ).crossJoin(F.broadcast(tot)).select(
        "source", "cap", "below", "idx", "_t", "_k"
    )
    budget = (
        F.col("_t").cast("double")
        * F.lit(float(WATERFILL_SHARE_NUM))
        / F.lit(float(WATERFILL_SHARE_DEN))
    )
    remaining = F.col("_k") - F.col("idx")
    # candidate level if every source from this row up is uncapped
    lvl = (budget - F.col("below").cast("double")) / remaining.cast("double")
    # rows BEFORE the pivot violate lvl <= cap (they are fully
    # capped); every row from the pivot on is valid but later rows
    # understate the level — the true level is the MAX valid candidate
    cand = ranked.select(
        "source", "cap", F.when(lvl <= F.col("cap").cast("double"), lvl).alias("lvl")
    )
    level = cand.agg(F.max("lvl").alias("level"))
    return (
        cand.crossJoin(F.broadcast(level))
        .select(
            "source",
            "cap",
            F.least(F.col("cap").cast("double"), F.col("level")).alias(
                "allocation"
            ),
            (
                F.least(F.col("cap").cast("double"), F.col("level"))
                / F.col("cap").cast("double")
            ).alias("fill_frac"),
        )
        .orderBy("source")
    )


Q298_SQL = f"""
WITH caps AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS cap
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(cap) AS BIGINT) AS _t, CAST(count(*) AS BIGINT) AS _k
  FROM caps
),
ranked AS (
  SELECT source, cap,
         CAST(coalesce(sum(cap) OVER (
           ORDER BY cap, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS below,
         CAST(row_number() OVER (ORDER BY cap, source) - 1 AS BIGINT) AS idx,
         _t, _k
  FROM caps, tot
),
cand AS (
  SELECT source, cap,
         CASE WHEN (CAST(_t AS DOUBLE) * {WATERFILL_SHARE_NUM}.0
                    / {WATERFILL_SHARE_DEN}.0
                    - CAST(below AS DOUBLE)) / CAST(_k - idx AS DOUBLE)
                   <= CAST(cap AS DOUBLE)
              THEN (CAST(_t AS DOUBLE) * {WATERFILL_SHARE_NUM}.0
                    / {WATERFILL_SHARE_DEN}.0
                    - CAST(below AS DOUBLE)) / CAST(_k - idx AS DOUBLE)
         END AS lvl
  FROM ranked
),
level AS (SELECT max(lvl) AS level FROM cand)
SELECT source, cap,
       least(CAST(cap AS DOUBLE), level) AS allocation,
       least(CAST(cap AS DOUBLE), level) / CAST(cap AS DOUBLE) AS fill_frac
FROM cand, level
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q332 — temperature-scaled mixture weights (the multilingual-LM
# sampling rule: w_s ∝ tokens_s^τ, τ = 0.7): per source — raw token
# share, temperature share, and the epoch multiplier temp/raw (how
# many times a low-resource source is over-sampled relative to
# proportional). q80 mixes by GIVEN weights and q162 schedules a GIVEN
# budget; this op COMPUTES the weights those two consume — the third
# piece of the mixing pipeline. Up-sampled sources (mult > 1) are the
# dedup-sensitivity set: over-sampling amplifies any dup they contain
# (cross-ref q183's dup-rate curve).
# Scale: one narrow agg per source (map-side partial sums); the share
# normalization is a 1-row broadcast. pow(x, 0.7) only on the
# |S|-row aggregate, never per document.
# ---------------------------------------------------------------------------
MIX_TAU = 0.7


def q332_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("source", "text")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("tot"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_TAU))).alias(
            "tot_t"
        ),
    )
    raw = F.col("n_tokens") / F.col("tot")
    temp = F.pow(F.col("n_tokens").cast("double"), F.lit(MIX_TAU)) / F.col(
        "tot_t"
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(raw, 4).alias("raw_share"),
            F.round(temp, 4).alias("temp_share"),
            F.round(temp / raw, 4).alias("epoch_mult"),
        )
        .orderBy("source")
    )


Q332_SQL = f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot,
         sum(pow(CAST(n_tokens AS DOUBLE), {MIX_TAU})) AS tot_t
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / tot, 4) AS raw_share,
       round(pow(CAST(n_tokens AS DOUBLE), {MIX_TAU}) / tot_t, 4)
         AS temp_share,
       round((pow(CAST(n_tokens AS DOUBLE), {MIX_TAU}) / tot_t)
             / (n_tokens / tot), 4) AS epoch_mult
FROM per, tot
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q350 — DSIR importance resampling weights (Xie et al. 2023: Data
# Selection for LMs via Importance Resampling): score every document
# by the log-likelihood ratio of a TARGET-domain hashed-unigram LM
# over the RAW-corpus LM, the standard recipe for carving a
# target-like training subset out of a 100 TB crawl. Target here =
# the English slice (lang = 'en'); features = whitespace unigrams
# hashed into DSIR_BUCKETS buckets (the paper's hashing trick — the
# weight table is a FIXED-SIZE array independent of vocabulary, which
# is what makes the method viable at crawl scale: a B-row broadcast,
# never a vocab-sized shuffle). Both LMs are add-one smoothed over the
# bucket space; per-doc importance = mean bucket log-ratio. Output =
# the DSIR_TOP selection (rank by importance, the docs a resampler
# would keep). The word->bucket hash is the portable 3-char/length
# mix (q302's word-hash family) so both engines bucket identically.
# Scale: ONE token pass builds both count tables (conditional agg),
# B-row broadcast back onto the token stream, one per-doc aggregate.
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 1024
DSIR_TOP = 50
DSIR_TARGET_LANG = "en"

# portable word -> bucket hash, identical SQL on both engines:
# ((len*31 + cp(first))*31 + cp(mid))*31 + cp(last), reduced mod B.
# int64-safe: len <= ~1e6, codepoints <= 0x10FFFF.
# BMP-ONLY ASSUMPTION (documented, r12 ADVICE): Spark ascii() yields
# the first UTF-16 code unit (a surrogate for astral-plane chars,
# U+10000+) while DuckDB ord() yields the full codepoint — the two
# engines agree exactly on the Basic Multilingual Plane (all chars
# <= U+FFFF, which covers the fixture and the dominant mass of web
# text) and may bucket a word differently only when its first/mid/
# last character is astral (emoji, rare CJK extensions). DSIR is
# robust to this: a hashed-bucket LM already tolerates collisions by
# design, so a rare astral word landing in a different bucket
# perturbs two of 1024 smoothed counts. For strict cross-engine
# parity on astral-heavy corpora, pre-normalize such chars upstream.
_DSIR_HASH_SPARK = (
    "pmod(((length(w) * 31 + ascii(substring(w, 1, 1))) * 31"
    " + ascii(substring(w, cast((length(w) + 1) / 2 as int), 1))) * 31"
    " + ascii(substring(w, length(w), 1)), {b})"
)
_DSIR_HASH_DUCK = (
    "((length(w) * 31 + ord(substring(w, 1, 1))) * 31"
    " + ord(substring(w, CAST(floor((length(w) + 1) / 2) AS INT), 1))) * 31"
    " + ord(substring(w, length(w), 1))"
)


def q350_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).where(F.col("w") != "")
    toks = toks.select(
        "doc_id",
        "lang",
        F.expr(_DSIR_HASH_SPARK.format(b=DSIR_BUCKETS)).alias("bucket"),
    )
    # r16 PERF (guide §1.2 don't compute twice, §2.3 shuffle fewer
    # bytes): `toks` used to feed BOTH the bucket-count aggregate and
    # the per-doc scoring aggregate as separate subtrees, so the
    # explode + per-token string hash ran TWICE over the corpus (the
    # dominant cost — measured 5.5 s at the documents decade). One
    # pass now compresses the token stream to per-(doc, bucket) counts
    # (map-side combinable; <= min(tokens, B) rows per doc) and
    # localCheckpoints that — the global LM counts, the totals, and
    # the per-doc score all derive from the compressed frame. Integer
    # counts are exact; importance becomes sum(c*lw)/sum(c) instead of
    # per-token sum(lw)/count(*) — same quantity, bucket-grouped
    # summation order (oracle hash re-verified at all SFs + decade;
    # reference-vs-grouped equality test-locked).
    toksc = (
        toks.groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    is_t = F.col("lang") == DSIR_TARGET_LANG
    counts = toksc.groupBy("bucket").agg(
        F.sum(F.when(is_t, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("ct"),
        F.sum("c").cast("bigint").alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1) / (F.col("tt") + DSIR_BUCKETS))
            - F.log((F.col("cr") + 1) / (F.col("tr") + DSIR_BUCKETS))
        ).alias("lw"),
    )
    scored = (
        toksc.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("c").cast("double") * F.col("lw"))
                / F.sum("c").cast("double"),
                4,
            ).alias("importance"),
        )
    )
    w = Window.orderBy(F.col("importance").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= DSIR_TOP)
        .select("rank", "doc_id", "lang", "n_tokens", "importance")
        .orderBy("rank")
    )


Q350_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         ({_DSIR_HASH_DUCK}) % {DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
  WHERE w != ''
),
counts AS (
  SELECT bucket,
         CAST(count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS BIGINT)
           AS ct,
         CAST(count(*) AS BIGINT) AS cr
  FROM toks GROUP BY bucket
),
totals AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM counts),
weights AS (
  SELECT bucket,
         ln((ct + 1) / CAST(tt + {DSIR_BUCKETS} AS DOUBLE))
           - ln((cr + 1) / CAST(tr + {DSIR_BUCKETS} AS DOUBLE)) AS lw
  FROM counts, totals
),
scored AS (
  SELECT t.doc_id, t.lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(sum(w.lw) / count(*), 4) AS importance
  FROM toks t JOIN weights w USING (bucket)
  GROUP BY t.doc_id, t.lang
)
SELECT CAST(row_number() OVER (ORDER BY importance DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, lang, n_tokens, importance
FROM scored
QUALIFY rank <= {DSIR_TOP}
ORDER BY rank
"""


QUERIES = {
    "q350_dsir_importance": q350_dsir_importance,
    "q332_temperature_mixture": q332_temperature_mixture,
    "q297_boilerplate_ngrams": q297_boilerplate_ngrams,
    "q298_budget_waterfill": q298_budget_waterfill,
    "q79_token_packing": q79_token_packing,
    "q80_corpus_mixing": q80_corpus_mixing,
    "q81_embedding_quantize": q81_embedding_quantize,
    "q82_length_histogram": q82_length_histogram,
    "q88_median_length_filter": q88_median_length_filter,
    "q119_ngram_decontam": q119_ngram_decontam,
    "q120_span_dedup": q120_span_dedup,
    "q121_unigram_logprob": q121_unigram_logprob,
    "q143_embedding_dim_stats": q143_embedding_dim_stats,
    "q150_dedup_keep_best": q150_dedup_keep_best,
    "q154_novelty_curve": q154_novelty_curve,
    "q162_token_budget_mixture": q162_token_budget_mixture,
    "q183_dup_rate_curve": q183_dup_rate_curve,
    "q184_epoch_shuffle": q184_epoch_shuffle,
    "q185_dedup_savings": q185_dedup_savings,
    "q196_weighted_length_quartiles": q196_weighted_length_quartiles,
    "q208_ppl_filter": q208_ppl_filter,
    "q221_heavy_hitters": q221_heavy_hitters,
    "q225_dataset_card": q225_dataset_card,
    "q228_quantile_normalize": q228_quantile_normalize,
}

ORACLE = {
    "q350_dsir_importance": Q350_SQL,
    "q332_temperature_mixture": Q332_SQL,
    "q221_heavy_hitters": Q221_SQL,
    "q225_dataset_card": Q225_SQL,
    "q228_quantile_normalize": Q228_SQL,
    "q297_boilerplate_ngrams": Q297_SQL,
    "q298_budget_waterfill": Q298_SQL,
    "q79_token_packing": Q79_SQL,
    "q80_corpus_mixing": Q80_SQL,
    "q81_embedding_quantize": Q81_SQL,
    "q82_length_histogram": Q82_SQL,
    "q88_median_length_filter": Q88_SQL,
    "q119_ngram_decontam": Q119_SQL,
    "q120_span_dedup": Q120_SQL,
    "q121_unigram_logprob": Q121_SQL,
    "q143_embedding_dim_stats": Q143_SQL,
    "q150_dedup_keep_best": Q150_SQL,
    "q154_novelty_curve": Q154_SQL,
    "q162_token_budget_mixture": Q162_SQL,
    "q183_dup_rate_curve": Q183_SQL,
    "q184_epoch_shuffle": Q184_SQL,
    "q185_dedup_savings": Q185_SQL,
    "q196_weighted_length_quartiles": Q196_SQL,
    "q208_ppl_filter": Q208_SQL,
}


# ---------------------------------------------------------------------------
# q356 — DoReMi reweighting step (Xie et al. 2023, Domain Reweighting
# with Minimax Optimization): one exponentiated-gradient update of the
# per-source training mixture, driven by per-domain EXCESS LOSS. The
# static mixture family (q80 caps, q162 token budgets, q332
# temperature) sets weights from SIZE; DoReMi sets them from how much
# each domain still hurts — domains whose loss exceeds the corpus
# average get upweighted. Loss proxy here = per-source mean negative
# unigram log-likelihood under the corpus LM (q121's portable
# machinery; in production this column comes from the proxy model's
# eval pass — the UPDATE RULE, which is what this op implements, is
# identical). w_new ∝ share_old * exp(eta * excess), renormalized;
# loss is rounded(6) BEFORE exp so both engines exponentiate the
# identical double.
# Scale: q121's one token pass + vocab broadcast, then a |sources|-row
# update — the whole DoReMi step is metadata-sized beyond the scan.
# ---------------------------------------------------------------------------
DOREMI_ETA = 1.0


def q356_doremi_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).where(F.col("w") != "")
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    freq = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .select("w", F.log(F.col("cnt") / F.col("total")).alias("logp"))
    )
    per = (
        toks.join(F.broadcast(freq), "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(-F.sum("logp") / F.count(F.lit(1)), 6).alias("loss"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens"),
        F.round(
            F.sum(F.col("loss") * F.col("n_tokens")) / F.sum("n_tokens"),
            6,
        ).alias("avg_loss"),
    )
    upd = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "loss",
        (F.col("n_tokens") / F.col("tot_tokens")).alias("share_old"),
        (
            (F.col("n_tokens") / F.col("tot_tokens"))
            * F.exp(
                F.lit(DOREMI_ETA) * (F.col("loss") - F.col("avg_loss"))
            )
        ).alias("w_raw"),
        (F.col("loss") - F.col("avg_loss")).alias("excess"),
    )
    norm = upd.agg(F.sum("w_raw").alias("z"))
    return (
        upd.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_tokens",
            "loss",
            F.round("excess", 6).alias("excess_loss"),
            F.round("share_old", 4).alias("share_old"),
            F.round(F.col("w_raw") / F.col("z"), 4).alias("share_new"),
            F.round(F.col("w_raw") / F.col("z") / F.col("share_old"), 4)
            .alias("mult"),
        )
        .orderBy("source")
    )


Q356_SQL = f"""
WITH toks AS (
  SELECT source, w FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS w
    FROM documents
  ) WHERE w != ''
),
freq AS (
  SELECT w, ln(CAST(count(*) AS DOUBLE)
               / (SELECT count(*) FROM toks)) AS logp
  FROM toks GROUP BY w
),
per AS (
  SELECT t.source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(-sum(f.logp) / count(*), 6) AS loss
  FROM toks t JOIN freq f USING (w)
  GROUP BY t.source
),
tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot_tokens,
         round(sum(loss * n_tokens) / sum(n_tokens), 6) AS avg_loss
  FROM per
),
upd AS (
  SELECT source, n_tokens, loss,
         n_tokens / tot_tokens AS share_old,
         (n_tokens / tot_tokens)
           * exp({DOREMI_ETA} * (loss - avg_loss)) AS w_raw,
         loss - avg_loss AS excess
  FROM per, tot
),
norm AS (SELECT sum(w_raw) AS z FROM upd)
SELECT source, n_tokens, loss,
       round(excess, 6) AS excess_loss,
       round(share_old, 4) AS share_old,
       round(w_raw / z, 4) AS share_new,
       round(w_raw / z / share_old, 4) AS mult
FROM upd, norm
ORDER BY source
"""

QUERIES.update({"q356_doremi_step": q356_doremi_step})
ORACLE.update({"q356_doremi_step": Q356_SQL})


# ---------------------------------------------------------------------------
# q358 — decontamination strictness curve: q119 pins the GPT-3 13-gram
# rule; this sweeps the n-gram LENGTH n in {5, 8, 13} and reports what
# each strictness would flag — the advisor that prices the
# false-positive/false-negative trade before a decontamination run
# (shorter n flags more train docs, catching paraphrases but also
# punishing common phrases; the curve's shape is the evidence for
# choosing n). Same split rule, same broadcast-eval-grams shape as
# q119, executed once per n (a bounded 3-element sweep — the gram
# length changes the TOKENIZATION, so unlike q344/q349 the passes
# cannot share one scored frame; documented cost, |sweep| scans).
# ---------------------------------------------------------------------------
DECONTAM_NS = [5, 8, 13]


def q358_decontam_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("words")
    )
    outs = []
    for n in DECONTAM_NS:
        pairs = docs.select(
            "doc_id", F.explode(_word_ngrams(F.col("words"), n)).alias("gram")
        )
        ev = (
            pairs.where(F.col("doc_id") % EVAL_MOD == 0)
            .select("gram")
            .distinct()
        )
        n_eval = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_eval_grams"))
        train = pairs.where(F.col("doc_id") % EVAL_MOD != 0)
        hits = train.join(F.broadcast(ev), "gram", "semi").select(
            "doc_id"
        )
        per_doc = (
            train.select("doc_id")
            .distinct()
            .join(
                hits.groupBy("doc_id").agg(
                    F.count(F.lit(1)).cast("bigint").alias("h")
                ),
                "doc_id",
                "left",
            )
        )
        outs.append(
            per_doc.agg(
                F.lit(n).cast("bigint").alias("n"),
                F.count(F.lit(1)).cast("bigint").alias("n_train_docs"),
                F.sum((F.col("h") > 0).cast("bigint"))
                .cast("bigint")
                .alias("n_flagged"),
                F.sum(F.coalesce("h", F.lit(0))).cast("bigint").alias(
                    "n_hit_grams"
                ),
                F.round(
                    F.sum((F.col("h") > 0).cast("bigint"))
                    / F.count(F.lit(1)).cast("double"),
                    4,
                ).alias("flagged_share"),
            ).crossJoin(F.broadcast(n_eval))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("n")


def _q358_sql() -> str:
    parts = []
    for n in DECONTAM_NS:
        parts.append(f"""
SELECT CAST({n} AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_train_docs,
       CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(sum(coalesce(h, 0)) AS BIGINT) AS n_hit_grams,
       round(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS flagged_share,
       (SELECT CAST(count(*) AS BIGINT) FROM ev{n}) AS n_eval_grams
FROM (
  SELECT t.doc_id, (
    SELECT count(*) FROM pairs{n} p
    WHERE p.doc_id = t.doc_id
      AND p.doc_id % {EVAL_MOD} != 0
      AND p.gram IN (SELECT gram FROM ev{n})
  ) AS h
  FROM (SELECT DISTINCT doc_id FROM pairs{n}
        WHERE doc_id % {EVAL_MOD} != 0) t
)""")
    ctes = []
    for n in DECONTAM_NS:
        ctes.append(f"""pairs{n} AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(len(words) - {n - 1}, 0)),
    i -> array_to_string(words[i:i+{n - 1}], ' ')))) AS gram
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words
        FROM documents)
  WHERE len(words) >= {n}
),
ev{n} AS (
  SELECT DISTINCT gram FROM pairs{n} WHERE doc_id % {EVAL_MOD} = 0
)""")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(parts)
        + "\nORDER BY n"
    )


Q358_SQL = _q358_sql()

QUERIES.update({"q358_decontam_curve": q358_decontam_curve})
ORACLE.update({"q358_decontam_curve": Q358_SQL})
