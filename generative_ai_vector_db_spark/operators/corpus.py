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


QUERIES = {
    "q79_token_packing": q79_token_packing,
    "q80_corpus_mixing": q80_corpus_mixing,
    "q81_embedding_quantize": q81_embedding_quantize,
    "q82_length_histogram": q82_length_histogram,
    "q88_median_length_filter": q88_median_length_filter,
}

ORACLE = {
    "q79_token_packing": Q79_SQL,
    "q80_corpus_mixing": Q80_SQL,
    "q81_embedding_quantize": Q81_SQL,
    "q82_length_histogram": Q82_SQL,
    "q88_median_length_filter": Q88_SQL,
}
