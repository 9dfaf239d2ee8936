"""Lexical + hybrid retrieval: BM25 scoring and reciprocal-rank-fusion.

Extends the reference's retrieval surface (vector-only top-k,
``app.py:409``) with the lexical side a production RAG deployment pairs
with it: a BM25 ranker over the document corpus and an RRF fusion of
the lexical and vector rankings (the standard "hybrid search" shape in
Elasticsearch/OpenSearch/Vespa and pgvector deployments).

Plan shapes (100 TB reasoning):
* The token explode → (doc_id, term) is the classic inverted-index
  build. Corpus statistics (doc length, df per term, N, avgdl) are
  aggregations computed ONCE and reusable across queries — in a real
  deployment they persist next to the store (store.py) like the ANN
  index artifacts; here they are recomputed per call so the query stays
  self-contained.
* Per-query work filters the token stream to the query's terms BEFORE
  any shuffle (predicate pushdown to the scan), so tf/df aggregation
  shuffles only rows containing query terms — O(postings(q)), not
  O(corpus).
* df and corpus stats are tiny (one row per query term / one row
  total): broadcast, never shuffled against.
* Cross-engine float determinism (FIXTURES.md): per-term contributions
  are summed in FIXED query-term order via conditional aggregation
  (not a shuffle-order-dependent SUM), scores are rounded before
  ranking, and ties break on doc_id — 1-ulp libm differences between
  the JVM and DuckDB cannot reorder results.

Test coverage: tests/test_retrieval.py (hand-computed BM25 on a toy
corpus + fixture invariants); driver oracle twins below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.prefix import prefix_sums
from ..tables import load

K1 = 1.2
B = 0.75
K = 13  # reference fan-out, app.py:409
RRF_K = 60  # standard RRF damping constant
QUERY_TERMS = ["spark", "window", "customer"]  # fixture-vocabulary query
Q_VEC_ID = 0  # vector-side query: embedding of vec_id 0 (q26 pattern)
DIM = 64


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "\\s+")).alias("term"),
    ).where(F.col("term") != "")


def _bm25_per_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf, contrib): per-term BM25 contribution of each
    QUERY_TERMS member in each matching doc (shared by q83/q84's score
    sum and q267's per-term ranking eval).

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene/ATIRE form)
    tf_norm = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    """
    tokens = _tokens(spark, sf_dir)
    dl = tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    qtok = tokens.where(F.col("term").isin(QUERY_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = (
        qtok.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        idf
        * F.col("tf")
        / (
            F.col("tf")
            + F.lit(K1)
            * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl").cast("double") / avgdl)
        )
    )
    return (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", "term", "tf", contrib.alias("contrib"))
    )


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score): BM25 of QUERY_TERMS over every matching doc."""
    per_term = _bm25_per_term(spark, sf_dir)
    # fixed-order sum across query terms (each term is one row per doc
    # post-aggregation, so max() picks that single value)
    parts = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("contrib"))), F.lit(0.0)
        ).alias(f"_c{i}")
        for i, t in enumerate(QUERY_TERMS)
    ]
    g = per_term.groupBy("doc_id").agg(*parts)
    score = F.col("_c0")
    for i in range(1, len(QUERY_TERMS)):
        score = score + F.col(f"_c{i}")
    return g.select("doc_id", score.alias("score"))


def q83_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = bm25_scores(spark, sf_dir).select(
        "doc_id", F.round("score", 4).alias("bm25")
    )
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= K)
        .orderBy("rn")
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)
_CASE_SUM = "\n      + ".join(
    f"coalesce(max(CASE WHEN term = '{t}' THEN contrib END), 0)"
    for t in QUERY_TERMS
)

_BM25_CTE = f"""
tokens AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
),
tokens_f AS (SELECT * FROM tokens WHERE term != ''),
dl AS (SELECT doc_id, count(*) AS dl FROM tokens_f GROUP BY doc_id),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_len
  FROM dl
),
qtok AS (SELECT * FROM tokens_f WHERE term IN ({_TERMS_SQL})),
tf AS (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY doc_id, term),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtok GROUP BY term),
per AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (corpus.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * tf.tf
           / (tf.tf + {K1} * (1.0 - {B} + {B} * CAST(dl.dl AS DOUBLE)
              / (CAST(corpus.total_len AS DOUBLE) / CAST(corpus.n_docs AS DOUBLE))))
           AS contrib
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus
),
bm25s AS (
  SELECT doc_id,
         {_CASE_SUM} AS score
  FROM per GROUP BY doc_id
)"""

Q83_SQL = f"""
WITH {_BM25_CTE},
ranked AS (
  SELECT doc_id, round(score, 4) AS bm25,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rn
  FROM bm25s
)
SELECT doc_id, bm25, rn FROM ranked WHERE rn <= {K} ORDER BY rn
"""


# ---------------------------------------------------------------------------
# q84 — hybrid retrieval: RRF fusion of the BM25 ranking with the exact
# cosine ranking against a query vector. Inner join on doc identity
# (doc_id == vec_id): fused set = docs with both signals. Each side is
# ranked within a fixed candidate window (RRF_WINDOW, the standard
# deployed form — rank lists are always truncated) — the rank filter
# immediately after each row_number lets Spark rewrite the global
# window as a distributed TakeOrderedAndProject(top-W) instead of a
# single-partition sort of every candidate, so the plan survives a
# 100 TB corpus.
# ---------------------------------------------------------------------------
RRF_WINDOW = 1000  # per-side candidate cap (rank_window_size)


def q84_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = bm25_scores(spark, sf_dir).select(
        "doc_id", F.round("score", 4).alias("bm25")
    )
    lex = lex.withColumn(
        "rank_lex",
        F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")),
    ).where(F.col("rank_lex") <= RRF_WINDOW)

    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == Q_VEC_ID).select(
        F.col("embedding").alias("q_emb")
    )
    from ..functions import vectors as V

    vec = (
        emb.where(F.col("vec_id") != Q_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(V.cosine(F.col("q_emb"), F.col("embedding")), 4).alias(
                "cos_sim"
            ),
        )
        .withColumn(
            "rank_vec",
            F.row_number().over(
                Window.orderBy(F.col("cos_sim").desc(), "vec_id")
            ),
        )
        .where(F.col("rank_vec") <= RRF_WINDOW)
    )

    fused = lex.join(vec, lex.doc_id == vec.vec_id).select(
        "doc_id",
        "bm25",
        "cos_sim",
        F.col("rank_lex").cast("bigint").alias("rank_lex"),
        F.col("rank_vec").cast("bigint").alias("rank_vec"),
        F.round(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex"))
            + F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_vec")),
            6,
        ).alias("rrf"),
    )
    w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= K)
        .orderBy("rn")
    )


_DUCK_DOT_Q = (
    "list_sum([ CAST(q.q_emb[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)"
    f" for k in generate_series(1, {DIM}) ])"
)
_DUCK_NORM_Q = (
    "sqrt(list_sum([ CAST(q.q_emb[k] AS DOUBLE) * CAST(q.q_emb[k] AS DOUBLE)"
    f" for k in generate_series(1, {DIM}) ]))"
)
_DUCK_NORM_B2 = (
    "sqrt(list_sum([ CAST(b.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)"
    f" for k in generate_series(1, {DIM}) ]))"
)

Q84_SQL = f"""
WITH {_BM25_CTE},
lex AS (
  SELECT doc_id, round(score, 4) AS bm25,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rank_lex
  FROM bm25s
  QUALIFY rank_lex <= {RRF_WINDOW}
),
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {Q_VEC_ID}),
vec AS (
  SELECT b.vec_id,
         round({_DUCK_DOT_Q} / ({_DUCK_NORM_Q} * {_DUCK_NORM_B2}), 4) AS cos_sim
  FROM embeddings b CROSS JOIN q
  WHERE b.vec_id != {Q_VEC_ID}
),
vecr AS (
  SELECT vec_id, cos_sim,
         row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank_vec
  FROM vec
  QUALIFY rank_vec <= {RRF_WINDOW}
),
fused AS (
  SELECT lex.doc_id, lex.bm25, vecr.cos_sim,
         CAST(lex.rank_lex AS BIGINT) AS rank_lex,
         CAST(vecr.rank_vec AS BIGINT) AS rank_vec,
         round(1.0 / ({RRF_K} + lex.rank_lex) + 1.0 / ({RRF_K} + vecr.rank_vec), 6)
           AS rrf
  FROM lex JOIN vecr ON lex.doc_id = vecr.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM fused
)
SELECT doc_id, bm25, cos_sim, rank_lex, rank_vec, rrf, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {K} ORDER BY rn
"""


# ---------------------------------------------------------------------------
# q86 — TF-IDF keyword extraction: top-3 terms per document. Reuses the
# inverted-index shape; idf is a broadcast-size per-term table; the
# per-doc top-k is a WindowGroupLimit (k rows forwarded per partition,
# same plan family as Q13/Q25). idf = ln(N / df), score = tf * idf.
# ---------------------------------------------------------------------------
TOP_TERMS = 3


def q86_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    tokens = _tokens(spark, sf_dir)
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = (
        tokens.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    n_docs = load(spark, sf_dir, "documents").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= TOP_TERMS)
        .orderBy("doc_id", "rn")
    )


Q86_SQL = f"""
WITH tokens AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
),
tokens_f AS (SELECT * FROM tokens WHERE term != ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens_f GROUP BY doc_id, term),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens_f GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(dft.df AS DOUBLE)), 4)
           AS tfidf
  FROM tf JOIN dft USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, tfidf, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {TOP_TERMS}
ORDER BY doc_id, rn
"""


# ---------------------------------------------------------------------------
# q87 — vocabulary build with coverage: top-20 terms by corpus
# frequency and the cumulative fraction of all tokens they cover (the
# "how big must the vocab be" curve). Counts aggregate map-side before
# the distributed prefix scan (vocab rows, not token rows).
# ---------------------------------------------------------------------------
VOCAB_K = 20


def q87_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _tokens(spark, sf_dir).groupBy("term").agg(
        F.count("*").cast("bigint").alias("n")
    )
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    # distributed inclusive prefix sum + rank in DESCENDING count
    # order (functions/prefix.py: rn = inclusive prefix count of
    # ones) — the vocabulary grows ~Heaps' law with N, so no
    # unpartitioned window over it
    ranked = prefix_sums(
        counts.withColumn("_one", F.lit(1)),
        [F.desc("n"), F.asc("term")],
        {"n": "cum", "_one": "rn"},
        inclusive=True,
    ).crossJoin(F.broadcast(total))
    return (
        ranked.where(F.col("rn") <= VOCAB_K)
        .select(
            "term",
            "n",
            "rn",
            F.round(F.col("cum").cast("double") / F.col("total").cast("double"), 6)
            .alias("coverage"),
        )
        .orderBy("rn")
    )


Q87_SQL = f"""
WITH tokens AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
),
tokens_f AS (SELECT * FROM tokens WHERE term != ''),
counts AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tokens_f GROUP BY term),
total AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
ranked AS (
  SELECT term, n,
         CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rn,
         CAST(sum(n) OVER (ORDER BY n DESC, term
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM counts CROSS JOIN total
),
final AS (
  SELECT term, n, rn,
         round(CAST(cum AS DOUBLE) / CAST((SELECT total FROM total) AS DOUBLE), 6)
           AS coverage
  FROM ranked WHERE rn <= {VOCAB_K}
)
SELECT * FROM final ORDER BY rn
"""


# ---------------------------------------------------------------------------
# q144 — Zipf-law fit over the term-frequency distribution: the
# log-log regression of frequency against rank for the top-K vocabulary
# terms. The slope (~ -1 for natural language) is the standard corpus
# health check — boilerplate-heavy or machine-generated corpora flatten
# or steepen it. Plan: one map-side-combined term count, one rank
# window immediately capped (WindowGroupLimit / distributed top-N per
# the unpartitioned-window policy), then a single-row regr_* aggregate
# (JVM-side running moments, same family as q140).
# ---------------------------------------------------------------------------
ZIPF_K = 200


def q144_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _tokens(spark, sf_dir).groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ranked = (
        counts.withColumn(
            "rn",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "term"))
            .cast("bigint"),
        )
        .where(F.col("rn") <= ZIPF_K)
    )
    x = F.log(F.col("rn").cast("double"))
    y = F.log(F.col("n").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 4).alias("r2"),
    )


Q144_SQL = f"""
WITH tokens AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS term FROM documents
),
tokens_f AS (SELECT term FROM tokens WHERE term != ''),
counts AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tokens_f GROUP BY term),
ranked AS (
  SELECT term, n,
         CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rn
  FROM counts
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round(regr_slope(ln(CAST(n AS DOUBLE)), ln(CAST(rn AS DOUBLE))), 4) AS slope,
       round(regr_intercept(ln(CAST(n AS DOUBLE)), ln(CAST(rn AS DOUBLE))), 4)
         AS intercept,
       round(regr_r2(ln(CAST(n AS DOUBLE)), ln(CAST(rn AS DOUBLE))), 4) AS r2
FROM ranked WHERE rn <= {ZIPF_K}
"""


# ---------------------------------------------------------------------------
# q146 — PMI collocations: the top word pairs by pointwise mutual
# information ln(p(ab) / (p(a) p(b))) over ADJACENT word pairs (the
# classic collocation detector; also the bigram-merge signal BPE-style
# tokenizer training uses). Tokenization matches q41/q120 (split on
# single space) so bigram instances line up with the span/Jaccard ops.
# Plan: positional bigrams via transform-over-sequence on the
# materialized words array (the dedup.py HOF rule); two map-side-
# combined counts (bigram, unigram); the bigram table is filtered to
# count >= PMI_MIN_COUNT BEFORE joining unigram counts, so the two
# equi-joins on term ship only the surviving candidates. The unigram
# vocabulary is Heaps-law small relative to the corpus but NOT hinted
# broadcast — at 100 TB a 100M-term vocab should shuffle, and AQE
# promotes it to broadcast when it is small. Corpus totals are 1-row
# broadcasts. Final ordering is by the ROUNDED pmi (FIXTURES.md float
# policy) with the bigram as tie-break, capped to a TakeOrdered.
# ---------------------------------------------------------------------------
PMI_MIN_COUNT = 5
PMI_TOP = 20


def q146_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        F.split(F.lower(F.col("text")), " ").alias("words")
    )
    n = F.size("words")
    bigrams = docs.select(
        F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("words"), i + 1),
                    F.element_at(F.col("words"), i + 2),
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("bgs")
    ).select(F.explode("bgs").alias("bigram"))
    uni = (
        docs.select(F.explode("words").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    bc = bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pair")
    )
    n1 = uni.agg(F.sum("c").cast("double").alias("n1"))
    n2 = bc.agg(F.sum("n_pair").cast("double").alias("n2"))
    parts = F.split(F.col("bigram"), " ")
    cand = (
        bc.where(F.col("n_pair") >= PMI_MIN_COUNT)
        .withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
    )
    ua = uni.select(F.col("t").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("t").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.log(
        (F.col("n_pair").cast("double") * F.col("n1") * F.col("n1"))
        / (F.col("n2") * F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    return (
        cand.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select("bigram", "n_pair", F.round(pmi, 4).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(PMI_TOP)
    )


Q146_SQL = f"""
WITH w AS (
  SELECT string_split(lower(text), ' ') AS words FROM documents
),
uni AS (SELECT unnest(words) AS t FROM w),
uc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY t),
n1 AS (SELECT CAST(sum(c) AS DOUBLE) AS n1 FROM uc),
bg AS (
  SELECT unnest(list_transform(
           generate_series(1, greatest(len(words) - 1, 0)),
           i -> words[i] || ' ' || words[i + 1])) AS bigram
  FROM w
),
bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n_pair FROM bg GROUP BY bigram),
n2 AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS n2 FROM bc),
cand AS (
  SELECT bigram, n_pair,
         string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2
  FROM bc WHERE n_pair >= {PMI_MIN_COUNT}
)
SELECT cand.bigram, cand.n_pair,
       round(ln((CAST(cand.n_pair AS DOUBLE) * n1.n1 * n1.n1)
                / (n2.n2 * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))), 4) AS pmi
FROM cand
JOIN uc ua ON cand.w1 = ua.t
JOIN uc ub ON cand.w2 = ub.t
CROSS JOIN n1 CROSS JOIN n2
ORDER BY pmi DESC, cand.bigram
LIMIT {PMI_TOP}
"""


# ---------------------------------------------------------------------------
# q161 — second-stage rerank (cross-encoder stand-in): re-score q84's
# fused top-K with a deterministic feature fusion — normalized lexical
# score, vector similarity, and query-term coverage — the shape of a
# production two-stage retrieval stack (cheap recall stage -> expensive
# precision stage over K rows). A real cross-encoder would replace
# `ce_score` with a model call over (query, doc) pairs; everything
# around it — candidate plumbing, K-row broadcast, rank diff — is the
# real operator. Scale: the rerank runs on K rows (the q84 output),
# so its cost is independent of corpus size; the only corpus-side work
# is the coverage lookup, a broadcast semi-join of K doc_ids against
# the documents scan. Weights sum to 1; all inputs are pre-rounded at
# 4dp so the fixed-order fusion expression is bit-identical on both
# engines.
# ---------------------------------------------------------------------------
CE_W_VEC, CE_W_LEX, CE_W_COV = 0.45, 0.35, 0.20


def q161_ce_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = q84_hybrid_rrf(spark, sf_dir)
    mx = cand.agg(F.max("bm25").alias("bm25_max"))
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), "\\s+")
    coverage = None
    for t in QUERY_TERMS:
        hit = F.array_contains(toks, t).cast("int")
        coverage = hit if coverage is None else coverage + hit
    cov = docs.select(
        "doc_id", (coverage / float(len(QUERY_TERMS))).alias("coverage")
    )
    ce = (
        cov.join(F.broadcast(cand), "doc_id")
        .crossJoin(F.broadcast(mx))
        .select(
            "doc_id",
            F.round(
                F.lit(CE_W_VEC) * F.col("cos_sim")
                + F.lit(CE_W_LEX) * (F.col("bm25") / F.col("bm25_max"))
                + F.lit(CE_W_COV) * F.col("coverage"),
                6,
            ).alias("ce_score"),
            F.col("rn").alias("rrf_rank"),
        )
    )
    w = Window.orderBy(F.col("ce_score").desc(), "doc_id")
    return (
        ce.withColumn("ce_rank", F.row_number().over(w).cast("bigint"))
        .select(
            "ce_rank",
            "doc_id",
            "ce_score",
            "rrf_rank",
            (F.col("rrf_rank") - F.col("ce_rank")).cast("bigint").alias("moved"),
        )
        .orderBy("ce_rank")
    )


_DUCK_COV = " + ".join(
    f"(CASE WHEN list_contains(string_split_regex(lower(d.text), '\\s+'), '{t}')"
    " THEN 1 ELSE 0 END)"
    for t in QUERY_TERMS
)

Q161_SQL = f"""
WITH cand AS ({Q84_SQL}),
mx AS (SELECT max(bm25) AS bm25_max FROM cand),
cov AS (
  SELECT d.doc_id, ({_DUCK_COV}) / {float(len(QUERY_TERMS))} AS coverage
  FROM documents d JOIN cand ON cand.doc_id = d.doc_id
),
scored AS (
  SELECT c.doc_id,
         round({CE_W_VEC} * c.cos_sim
               + {CE_W_LEX} * (c.bm25 / (SELECT bm25_max FROM mx))
               + {CE_W_COV} * cov.coverage, 6) AS ce_score,
         c.rn AS rrf_rank
  FROM cand c JOIN cov ON cov.doc_id = c.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY ce_score DESC, doc_id) AS BIGINT)
           AS ce_rank,
       doc_id, ce_score, rrf_rank,
       CAST(rrf_rank
            - row_number() OVER (ORDER BY ce_score DESC, doc_id) AS BIGINT)
           AS moved
FROM scored
ORDER BY ce_rank
"""


# ---------------------------------------------------------------------------
# q192 — retrieval coverage curve: as k grows over the BM25 top-K
# (q83), how many of the query's terms are covered by at least one
# retrieved document? The "is k big enough" diagnostic for the RAG
# context budget (reference fan-out K=13, app.py:409): the rank where
# coverage saturates is the smallest context that still grounds every
# query concept, and n_new shows which ranks actually add information
# (rank positions that contribute nothing are pure prompt-token cost,
# q28/q53's budget). Post-ranking work is tiny-data: first-covering
# rank per term is a |terms|-row aggregate, the curve a K x |terms|
# broadcast crossJoin. The term-presence side is one additional scan,
# but filtered to the query's terms AT the scan (same pushdown shape
# as q83's qtok), so its shuffle is O(postings(q)), not O(corpus).
# ---------------------------------------------------------------------------
def q192_citation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    top = q83_bm25_topk(spark, sf_dir).select("doc_id", "rn")
    qterms = (
        _tokens(spark, sf_dir)
        .where(F.col("term").isin(QUERY_TERMS))
        .select("doc_id", "term")
        .distinct()
    )
    fr = (
        qterms.join(top, "doc_id")
        .groupBy("term")
        .agg(F.min("rn").alias("first_rank"))
    )
    n_terms = len(QUERY_TERMS)
    return (
        top.select(F.col("rn").alias("rank"))
        .crossJoin(F.broadcast(fr))
        .groupBy("rank")
        .agg(
            F.sum(
                F.when(F.col("first_rank") <= F.col("rank"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
            F.sum(
                F.when(F.col("first_rank") == F.col("rank"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_new"),
        )
        .select(
            "rank",
            "n_covered",
            "n_new",
            F.round(F.col("n_covered") / F.lit(float(n_terms)), 4).alias(
                "coverage"
            ),
        )
        .orderBy("rank")
    )


Q192_SQL = f"""
WITH {_BM25_CTE},
ranked AS (
  SELECT doc_id, round(score, 4) AS bm25,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rn
  FROM bm25s
),
top AS (SELECT doc_id, rn FROM ranked WHERE rn <= {K}),
qterms AS (
  SELECT DISTINCT doc_id, term FROM tokens_f WHERE term IN ({_TERMS_SQL})
),
fr AS (
  SELECT term, min(rn) AS first_rank
  FROM qterms JOIN top USING (doc_id)
  GROUP BY term
)
SELECT rn AS rank,
       CAST(sum(CASE WHEN first_rank <= rn THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered,
       CAST(sum(CASE WHEN first_rank = rn THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       round(sum(CASE WHEN first_rank <= rn THEN 1 ELSE 0 END)
             / CAST({len(QUERY_TERMS)} AS DOUBLE), 4) AS coverage
FROM top CROSS JOIN fr
GROUP BY rn
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# q201 — context-budget packing: how much of the q83 top-K ranking
# actually fits the prompt's context budget, in rank order, with the
# first partially-fitting document truncated (q104's truncation
# semantics applied to the RAG assembly step, reference "\n\n".join at
# app.py:418 — which has NO budget and silently overflows the model
# window; this is the budget-aware version a production pipeline
# ships). Pure integer arithmetic over the K-row ranked candidate set:
# a running-sum window by rank, fit_chars = clamp(budget - prev_cum),
# all post-ranking work on K rows — the corpus is touched only by q83.
# ---------------------------------------------------------------------------
CONTEXT_BUDGET_CHARS = 1200


def q201_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    top = q83_bm25_topk(spark, sf_dir).select("doc_id", "rn")
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, -1)
    ranked = top.join(docs, "doc_id").select(
        "rn",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        .cast("bigint")
        .alias("prev_cum"),
    )
    fit = F.greatest(
        F.lit(0),
        F.least(
            F.col("n_chars"),
            F.lit(CONTEXT_BUDGET_CHARS) - F.col("prev_cum"),
        ),
    )
    return ranked.select(
        "rn",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        fit.cast("bigint").alias("fit_chars"),
        (fit == F.col("n_chars")).alias("fully_included"),
    ).orderBy("rn")


Q201_SQL = f"""
WITH {_BM25_CTE},
ranked AS (
  SELECT doc_id, round(score, 4) AS bm25,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rn
  FROM bm25s
),
top AS (SELECT doc_id, rn FROM ranked WHERE rn <= {K}),
cums AS (
  SELECT t.rn, t.doc_id, d.n_chars,
         CAST(coalesce(sum(d.n_chars) OVER (ORDER BY t.rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prev_cum
  FROM top t JOIN documents d USING (doc_id)
)
SELECT rn, doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(greatest(0, least(n_chars, {CONTEXT_BUDGET_CHARS} - prev_cum))
            AS BIGINT) AS fit_chars,
       greatest(0, least(n_chars, {CONTEXT_BUDGET_CHARS} - prev_cum))
           = n_chars AS fully_included
FROM cums
ORDER BY rn
"""


# ---------------------------------------------------------------------------
# q236 inverted-index build — the batch posting-list construction step
# of every search stack (the thing Chroma's keyword sibling or a
# Lucene segment build does offline): per term with document
# frequency >= INDEX_MIN_DF, emit df, total tf, and the posting list
# as doc_ids in ascending order. Plan: tokenize once (same scan-side
# explode as q83/q86/q87), per-(term, doc) tf aggregate, then ONE
# groupBy term — posting order comes from array_sort over the
# collected NUMERIC ids (collect_list order is nondeterministic and a
# string sort would put 10 before 9), serialized with array_join so
# the driver hashes a flat string. At 100 TB this output IS the
# index: write it range-partitioned by term (q194) and a term lookup
# is one partition-pruned scan; the df floor bounds both the skewed
# stopword postings and the long tail of hapaxes.
# ---------------------------------------------------------------------------
INDEX_MIN_DF = 5


def q236_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_doc = (
        _tokens(spark, sf_dir)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("tf_total"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("df") >= INDEX_MIN_DF)
        .orderBy("term")
    )


Q236_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
),
per_doc AS (
  SELECT term, doc_id, count(*) AS tf
  FROM tok WHERE term != '' GROUP BY 1, 2
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS tf_total,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM per_doc
GROUP BY term
HAVING count(*) >= {INDEX_MIN_DF}
ORDER BY term
"""


# ---------------------------------------------------------------------------
# q267 — retrieval ranking evaluation (NDCG@10): for each query term,
# rank matching docs by that term's BM25 contribution and score the
# ranking against a term-frequency relevance gold with normalized
# discounted cumulative gain — the standard IR eval harness (BM25's
# length normalization reorders docs away from raw-tf relevance;
# NDCG < 1 quantifies by how much). q83 produces the ranking; this
# grades it — the eval loop a retrieval stack ships with.
# Ranking key is round(contrib, 4) + doc_id (the q83/q115 RANKING
# exception: 4-dp collapse makes cross-engine ties exact, doc_id
# breaks them identically); DCG discounts and the final ratio are raw
# doubles (driver canonicalizes).
# Scale shape: reuses the q83 per-term frame (token explode + two
# bounded-key joins); both rankings are per-term windows —
# WindowGroupLimit prunes to top-10 per partition before the sort
# completes; the DCG/IDCG sums aggregate ≤10 rows per term.
# ---------------------------------------------------------------------------
NDCG_K = 10


def q267_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _bm25_per_term(spark, sf_dir).select(
        "term", "doc_id", "tf", F.round("contrib", 4).alias("score")
    )
    w_sys = Window.partitionBy("term").orderBy(
        F.col("score").desc(), "doc_id"
    )
    w_ideal = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), "doc_id"
    )
    ranked = per.select(
        "term",
        "tf",
        F.row_number().over(w_sys).alias("r_sys"),
        F.row_number().over(w_ideal).alias("r_ideal"),
    )
    gain = F.col("tf").cast("double")
    return (
        ranked.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.sum(
                F.when(
                    F.col("r_sys") <= NDCG_K,
                    gain / F.log2(F.col("r_sys") + 1),
                ).otherwise(F.lit(0.0))
            ).alias("dcg"),
            F.sum(
                F.when(
                    F.col("r_ideal") <= NDCG_K,
                    gain / F.log2(F.col("r_ideal") + 1),
                ).otherwise(F.lit(0.0))
            ).alias("idcg"),
        )
        .select(
            "term",
            "n_matched",
            "dcg",
            "idcg",
            (F.col("dcg") / F.col("idcg")).alias("ndcg"),
        )
        .orderBy("term")
    )


Q267_SQL = f"""
WITH {_BM25_CTE.split("per AS")[0]}per AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(ln(1.0 + (corpus.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * tf.tf
           / (tf.tf + {K1} * (1.0 - {B} + {B} * CAST(dl.dl AS DOUBLE)
              / (CAST(corpus.total_len AS DOUBLE)
                 / CAST(corpus.n_docs AS DOUBLE)))), 4)
           AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus
),
ranked AS (
  SELECT term, tf,
         row_number() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id) AS r_sys,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id) AS r_ideal
  FROM per
)
SELECT term,
       CAST(count(*) AS BIGINT) AS n_matched,
       sum(CASE WHEN r_sys <= {NDCG_K}
                THEN CAST(tf AS DOUBLE) / log2(r_sys + 1)
                ELSE 0.0 END) AS dcg,
       sum(CASE WHEN r_ideal <= {NDCG_K}
                THEN CAST(tf AS DOUBLE) / log2(r_ideal + 1)
                ELSE 0.0 END) AS idcg,
       sum(CASE WHEN r_sys <= {NDCG_K}
                THEN CAST(tf AS DOUBLE) / log2(r_sys + 1)
                ELSE 0.0 END)
         / sum(CASE WHEN r_ideal <= {NDCG_K}
                    THEN CAST(tf AS DOUBLE) / log2(r_ideal + 1)
                    ELSE 0.0 END) AS ndcg
FROM ranked
GROUP BY term
ORDER BY term
"""


# ---------------------------------------------------------------------------
# q274 — MRR / hit-rate eval of the BM25 ranking: per query term, the
# reciprocal rank of the first MOST-RELEVANT doc (relevance = term
# frequency; relevant = docs attaining the term's max tf) plus
# hit@1/5/10 — the binary-relevance companion to q267's graded NDCG
# (MRR is what vector-store evals actually report). Exact arithmetic
# end to end: ranks are ints, rr = 1/int — bit-identical on both
# engines, no float policy needed beyond the q83 ranking key.
# Scale shape: reuses the q83 per-term frame; one rank window per
# term (WindowGroupLimit-prunable), one ≤|terms|-group aggregate.
# ---------------------------------------------------------------------------
def q274_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _bm25_per_term(spark, sf_dir).select(
        "term", "doc_id", "tf", F.round("contrib", 4).alias("score")
    )
    w_sys = Window.partitionBy("term").orderBy(F.col("score").desc(), "doc_id")
    w_max = Window.partitionBy("term")
    ranked = per.select(
        "term",
        "tf",
        F.row_number().over(w_sys).alias("r_sys"),
        F.max("tf").over(w_max).alias("best_tf"),
    )
    first_rel = F.min(
        F.when(F.col("tf") == F.col("best_tf"), F.col("r_sys"))
    )
    return (
        ranked.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.max("best_tf").cast("bigint").alias("best_tf"),
            first_rel.cast("bigint").alias("first_rel_rank"),
        )
        .select(
            "term",
            "n_matched",
            "best_tf",
            "first_rel_rank",
            (F.lit(1.0) / F.col("first_rel_rank")).alias("rr"),
            (F.col("first_rel_rank") <= 1).cast("int").alias("hit_at_1"),
            (F.col("first_rel_rank") <= 5).cast("int").alias("hit_at_5"),
            (F.col("first_rel_rank") <= 10).cast("int").alias("hit_at_10"),
        )
        .orderBy("term")
    )


Q274_SQL = f"""
WITH {_BM25_CTE.split("per AS")[0]}per AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(ln(1.0 + (corpus.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * tf.tf
           / (tf.tf + {K1} * (1.0 - {B} + {B} * CAST(dl.dl AS DOUBLE)
              / (CAST(corpus.total_len AS DOUBLE)
                 / CAST(corpus.n_docs AS DOUBLE)))), 4)
           AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus
),
ranked AS (
  SELECT term, tf,
         row_number() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id) AS r_sys,
         max(tf) OVER (PARTITION BY term) AS best_tf
  FROM per
),
agg AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS n_matched,
         CAST(max(best_tf) AS BIGINT) AS best_tf,
         CAST(min(CASE WHEN tf = best_tf THEN r_sys END) AS BIGINT)
           AS first_rel_rank
  FROM ranked
  GROUP BY term
)
SELECT term, n_matched, best_tf, first_rel_rank,
       1.0 / first_rel_rank AS rr,
       CAST(first_rel_rank <= 1 AS INT) AS hit_at_1,
       CAST(first_rel_rank <= 5 AS INT) AS hit_at_5,
       CAST(first_rel_rank <= 10 AS INT) AS hit_at_10
FROM agg
ORDER BY term
"""


# ---------------------------------------------------------------------------
# q300 — Mean-Average-Precision eval of the BM25 ranking: per query
# term, AP = mean over relevant docs of precision@rank, with binary
# relevance tf >= REL_TF (the "clearly on-topic" bar; q274's MRR uses
# first-best, q267's NDCG uses graded gain — AP is the third standard
# eval and weights the WHOLE relevant set by rank). Ranks and
# cumulative-relevant counts are ints; each precision term is one IEEE
# division; the per-term sum spans <= |matched docs| smallish terms —
# inside the repo's float-sum policy for 4-dp-graded outputs.
# Scale shape: reuses the q83 per-term frame; one rank window per
# term, one per-term aggregate. Terms with no relevant docs emit NULL.
# ---------------------------------------------------------------------------
REL_TF = 2


def q300_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = _bm25_per_term(spark, sf_dir).select(
        "term", "doc_id", "tf", F.round("contrib", 4).alias("score")
    )
    w_sys = Window.partitionBy("term").orderBy(F.col("score").desc(), "doc_id")
    rel = (F.col("tf") >= REL_TF).cast("bigint")
    ranked = per.select(
        "term",
        rel.alias("rel"),
        F.row_number().over(w_sys).alias("r_sys"),
    )
    w_cum = Window.partitionBy("term").orderBy("r_sys")
    cum = ranked.select(
        "term",
        "rel",
        "r_sys",
        F.sum("rel").over(w_cum).alias("rel_cum"),
    )
    return (
        cum.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.sum("rel").cast("bigint").alias("n_relevant"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.col("rel_cum").cast("double")
                    / F.col("r_sys").cast("double"),
                )
            ).alias("_psum"),
        )
        .select(
            "term",
            "n_matched",
            "n_relevant",
            F.when(
                F.col("n_relevant") > 0,
                F.col("_psum") / F.col("n_relevant").cast("double"),
            ).alias("ap"),
        )
        .orderBy("term")
    )


Q300_SQL = f"""
WITH {_BM25_CTE.split("per AS")[0]}per AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(ln(1.0 + (corpus.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * tf.tf
           / (tf.tf + {K1} * (1.0 - {B} + {B} * CAST(dl.dl AS DOUBLE)
              / (CAST(corpus.total_len AS DOUBLE)
                 / CAST(corpus.n_docs AS DOUBLE)))), 4)
           AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus
),
ranked AS (
  SELECT term,
         CAST(tf >= {REL_TF} AS BIGINT) AS rel,
         row_number() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id) AS r_sys
  FROM per
),
cum AS (
  SELECT term, rel, r_sys,
         sum(rel) OVER (PARTITION BY term ORDER BY r_sys) AS rel_cum
  FROM ranked
)
SELECT term,
       CAST(count(*) AS BIGINT) AS n_matched,
       CAST(sum(rel) AS BIGINT) AS n_relevant,
       CASE WHEN sum(rel) > 0
            THEN sum(CASE WHEN rel = 1
                          THEN CAST(rel_cum AS DOUBLE)
                               / CAST(r_sys AS DOUBLE) END)
                 / CAST(sum(rel) AS DOUBLE)
       END AS ap
FROM cum
GROUP BY term
ORDER BY term
"""


# ---------------------------------------------------------------------------
# q340 — BM25 + pseudo-relevance feedback (RM3-lite): run the q83
# query, take the top PRF_FB docs as the feedback set, extract the
# PRF_EXP most frequent feedback terms (length >= 4, original terms
# excluded), score the expansion terms with the SAME BM25 formula over
# the FULL corpus, and re-rank on base + expansion score. The
# expansion-term sum is made engine-deterministic by folding a SORTED
# (term, contrib) array left-to-right (the q254 pattern) — the term
# set is data-dependent, so q83's unrolled per-term CASE cannot apply.
# Scale: one extra pass over the token stream for the expansion tf/df
# (same shape as q83's), a 5-row broadcast term list, and the final
# rank is one TakeOrdered-style top-k frame.
# ---------------------------------------------------------------------------
PRF_FB = 3
PRF_EXP = 5
PRF_MIN_LEN = 4


def q340_bm25_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tokens = _tokens(spark, sf_dir)
    base = bm25_scores(spark, sf_dir).localCheckpoint()
    w_fb = Window.orderBy(F.round("score", 4).desc(), "doc_id")
    fb = (
        base.withColumn("rn", F.row_number().over(w_fb))
        .where(F.col("rn") <= PRF_FB)
        .select("doc_id")
    )
    exp_terms = (
        tokens.join(F.broadcast(fb), "doc_id")
        .where(
            (~F.col("term").isin(QUERY_TERMS))
            & (F.length("term") >= PRF_MIN_LEN)
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "trn",
            F.row_number().over(Window.orderBy(F.col("c").desc(), "term")),
        )
        .where(F.col("trn") <= PRF_EXP)
        .select("term")
    )
    etok = tokens.join(F.broadcast(exp_terms), "term")
    dl = tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    tf = etok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = (
        etok.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        idf
        * F.col("tf")
        / (
            F.col("tf")
            + F.lit(K1)
            * (
                F.lit(1.0)
                - F.lit(B)
                + F.lit(B) * F.col("dl").cast("double") / avgdl
            )
        )
    )
    eper = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", "term", contrib.alias("contrib"))
    )
    # deterministic data-dependent sum: sorted (term, contrib) fold
    esum = eper.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, s: acc + s["contrib"],
        ).alias("exp_score")
    )
    full = (
        base.join(esum, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("score"), F.lit(0.0))
                + F.coalesce(F.col("exp_score"), F.lit(0.0))
            ).alias("prf"),
        )
    )
    w = Window.orderBy(F.round("prf", 4).desc(), "doc_id")
    return (
        full.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= K)
        .select("rn", "doc_id", F.round("prf", 4).alias("prf_score"))
        .orderBy("rn")
    )


Q340_SQL = f"""
WITH {_BM25_CTE},
fb AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rn
    FROM bm25s
  ) WHERE rn <= {PRF_FB}
),
expc AS (
  SELECT term, count(*) AS c
  FROM tokens_f JOIN fb USING (doc_id)
  WHERE term NOT IN ({_TERMS_SQL}) AND length(term) >= {PRF_MIN_LEN}
  GROUP BY term
),
expt AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY c DESC, term) AS trn FROM expc
  ) WHERE trn <= {PRF_EXP}
),
etok AS (SELECT doc_id, term FROM tokens_f JOIN expt USING (term)),
etf AS (SELECT doc_id, term, count(*) AS tf FROM etok GROUP BY doc_id, term),
edf AS (SELECT term, count(DISTINCT doc_id) AS df FROM etok GROUP BY term),
eper AS (
  SELECT etf.doc_id, etf.term,
         ln(1.0 + (corpus.n_docs - edf.df + 0.5) / (edf.df + 0.5))
           * etf.tf
           / (etf.tf + {K1} * (1.0 - {B} + {B} * CAST(dl.dl AS DOUBLE)
              / (CAST(corpus.total_len AS DOUBLE)
                 / CAST(corpus.n_docs AS DOUBLE))))
           AS contrib
  FROM etf
  JOIN edf USING (term)
  JOIN dl ON dl.doc_id = etf.doc_id
  CROSS JOIN corpus
),
esum AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(0.0,
             list_transform(
               list_sort(list(struct_pack(term := term, contrib := contrib))),
               s -> s.contrib)),
           (acc, x) -> acc + x) AS exp_score
  FROM eper GROUP BY doc_id
),
full_s AS (
  SELECT coalesce(b.doc_id, e.doc_id) AS doc_id,
         coalesce(b.score, 0.0) + coalesce(e.exp_score, 0.0) AS prf
  FROM bm25s b FULL OUTER JOIN esum e ON b.doc_id = e.doc_id
)
SELECT rn, doc_id, round(prf, 4) AS prf_score FROM (
  SELECT doc_id, prf,
         CAST(row_number() OVER (ORDER BY round(prf, 4) DESC, doc_id)
              AS BIGINT) AS rn
  FROM full_s
) WHERE rn <= {K}
ORDER BY rn
"""


QUERIES = {
    "q340_bm25_prf": q340_bm25_prf,
    "q300_map_eval": q300_map_eval,
    "q83_bm25_topk": q83_bm25_topk,
    "q84_hybrid_rrf": q84_hybrid_rrf,
    "q86_tfidf_keywords": q86_tfidf_keywords,
    "q87_vocab_coverage": q87_vocab_coverage,
    "q144_zipf_fit": q144_zipf_fit,
    "q146_pmi_collocations": q146_pmi_collocations,
    "q161_ce_rerank": q161_ce_rerank,
    "q192_citation_coverage": q192_citation_coverage,
    "q201_context_budget": q201_context_budget,
    "q236_inverted_index": q236_inverted_index,
    "q267_ndcg_eval": q267_ndcg_eval,
    "q274_mrr_eval": q274_mrr_eval,
}

ORACLE = {
    "q340_bm25_prf": Q340_SQL,
    "q300_map_eval": Q300_SQL,
    "q83_bm25_topk": Q83_SQL,
    "q84_hybrid_rrf": Q84_SQL,
    "q86_tfidf_keywords": Q86_SQL,
    "q87_vocab_coverage": Q87_SQL,
    "q144_zipf_fit": Q144_SQL,
    "q146_pmi_collocations": Q146_SQL,
    "q161_ce_rerank": Q161_SQL,
    "q192_citation_coverage": Q192_SQL,
    "q201_context_budget": Q201_SQL,
    "q236_inverted_index": Q236_SQL,
    "q267_ndcg_eval": Q267_SQL,
    "q274_mrr_eval": Q274_SQL,
}
