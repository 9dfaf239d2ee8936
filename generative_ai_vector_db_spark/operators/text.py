"""Text-analysis operators for the LLM-data-pipeline (north star in
BASELINE.json): language ID, quality scoring, token counting, document
fingerprinting, and n-gram Jaccard near-dup — all over ``documents``.

Everything is built-in expressions (regex counts, higher-order array
fns) — no Python in the hot path, so a 100 TB corpus scan stays inside
whole-stage codegen at parquet-scan speed. Each query has an exact
DuckDB oracle twin (same regexes — both engines' classes used here are
common to Java regex and RE2; same fold order for the rolling hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load

# Tiny embedded stopword lists (public, language-characteristic words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "a", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}

PUNCT_RE = "[.!?,;:]"
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _words(col):
    return F.split(F.lower(col), " ")


def _sql_list(xs):
    return ", ".join("'" + x + "'" for x in xs)


# ---------------------------------------------------------------------------
# Language ID — n-gram/stopword-overlap heuristic: ratio of tokens found
# in each language's stopword list; argmax with threshold.
# ---------------------------------------------------------------------------
def q37_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize words once (each language ratio references it; inline
    # expressions re-split per reference — dedup.py PERF NOTE)
    docs = load(spark, sf_dir, "documents").withColumn("words", _words(F.col("text")))
    words = F.col("words")
    n_words = F.size(words)
    cols = {"doc_id": F.col("doc_id")}
    for lang, sw in STOPWORDS.items():
        hits = F.size(F.filter(words, lambda w: w.isin(sw)))
        cols[f"ratio_{lang}"] = F.round(hits / n_words, 4)
    best_ratio = F.greatest(*[cols[f"ratio_{lang}"] for lang in STOPWORDS])
    predicted = F.lit("unknown")
    # argmax with first-wins tie-break in dict order (deterministic)
    for lang in reversed(list(STOPWORDS)):
        predicted = F.when(
            (cols[f"ratio_{lang}"] == best_ratio) & (best_ratio >= 0.02),
            F.lit(lang),
        ).otherwise(predicted)
    return (
        docs.select(
            *[v.alias(k) for k, v in cols.items()],
            predicted.alias("predicted_lang"),
        )
        .orderBy("doc_id")
    )


def _q37_sql() -> str:
    ratio_exprs = []
    for lang, sw in STOPWORDS.items():
        ratio_exprs.append(
            f"round(CAST(len(list_filter(string_split(lower(text), ' '), "
            f"w -> w IN ({_sql_list(sw)}))) AS DOUBLE) / "
            f"len(string_split(lower(text), ' ')), 4) AS ratio_{lang}"
        )
    langs = list(STOPWORDS)
    best = "greatest(" + ", ".join(f"ratio_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in langs:
        case += f"WHEN ratio_{lang} = {best} AND {best} >= 0.02 THEN '{lang}' "
    case += "ELSE 'unknown' END"
    return f"""
WITH scored AS (
  SELECT doc_id, {", ".join(ratio_exprs)}
  FROM documents
)
SELECT doc_id, {", ".join(f"ratio_{lang}" for lang in langs)}, {case} AS predicted_lang
FROM scored
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Quality scoring — length / punctuation / stopword signals combined
# into a deterministic [0,1] score (the Gopher-rules / C4-style shape).
# ---------------------------------------------------------------------------
def q38_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("words", _words(F.col("text")))
    words = F.col("words")
    n_chars = F.length("text")
    n_words = F.size(words)
    avg_wlen = (n_chars - (n_words - 1)) / n_words  # chars net of single spaces
    punct_ratio = F.regexp_count("text", F.lit(PUNCT_RE)) / n_chars
    sw_ratio = F.size(F.filter(words, lambda w: w.isin(STOPWORDS["en"]))) / n_words
    score = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            F.lit(0.3)
            + 2.0 * sw_ratio
            - 2.0 * punct_ratio
            + F.when((avg_wlen >= 3) & (avg_wlen <= 10), 0.2).otherwise(0.0),
        ),
    )
    return docs.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        F.round(avg_wlen, 4).alias("avg_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    ).orderBy("doc_id")


Q38_SQL = f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(lower(text), ' ')) AS n_words,
         len(regexp_extract_all(text, '{PUNCT_RE}')) AS n_punct,
         len(list_filter(string_split(lower(text), ' '),
             w -> w IN ({_sql_list(STOPWORDS["en"])}))) AS n_sw
  FROM documents
), derived AS (
  SELECT doc_id, n_chars, n_words,
         CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words AS avg_wlen,
         CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
         CAST(n_sw AS DOUBLE) / n_words AS sw_ratio
  FROM base
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_words AS BIGINT) AS n_words,
       round(avg_wlen, 4) AS avg_word_len,
       round(punct_ratio, 4) AS punct_ratio,
       round(sw_ratio, 4) AS stopword_ratio,
       round(least(1.0, greatest(0.0,
           0.3 + 2.0 * sw_ratio - 2.0 * punct_ratio
           + CASE WHEN avg_wlen >= 3 AND avg_wlen <= 10 THEN 0.2 ELSE 0.0 END)), 4)
           AS quality_score
FROM derived
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Token counting — whitespace tokens + a BPE-ish regex token count
# (alpha runs, digit runs, single non-alnum marks).
# ---------------------------------------------------------------------------
def q39_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    lower = F.lower("text")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws_tokens"),
        F.regexp_count(lower, F.lit("[a-z]+")).cast("bigint").alias("alpha_tokens"),
        F.regexp_count(lower, F.lit("[0-9]+")).cast("bigint").alias("num_tokens"),
        F.regexp_count(lower, F.lit(TOKEN_RE)).cast("bigint").alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


Q39_SQL = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS alpha_tokens,
       CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS BIGINT) AS num_tokens,
       CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT) AS bpe_ish_tokens
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Document fingerprint — rolling polynomial hash over word features,
# folded strictly left-to-right (same order both engines). Word feature
# = 31*len(word) + codepoint(first char): engine-portable (no engine
# hash fn crosses Spark/DuckDB), collision-tolerable for fingerprinting.
# ---------------------------------------------------------------------------
FP_MULT = 1000003
FP_MOD = 2147483647


def q40_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("words", _words(F.col("text")))
    words = F.col("words")
    feats = F.transform(
        words,
        lambda w: (F.length(w) * 31 + F.ascii(F.substring(w, 1, 1))).cast("bigint"),
    )
    fp = F.aggregate(
        feats,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * FP_MULT + x) % FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


Q40_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(lower(text), ' '),
             w -> CAST(length(w) * 31 + ascii(substring(w, 1, 1)) AS BIGINT))),
         (a, b) -> (a * {FP_MULT} + b) % {FP_MOD}) AS fingerprint
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup — word-bigram set Jaccard over same-source
# pairs. Scale: source is the blocking key (like Q27's label); swap in
# MinHash bands (dedup.py) when no natural block exists.
# ---------------------------------------------------------------------------
JACCARD_TAU = 0.03


def _bigrams(words):
    """``words`` MUST be an attribute (materialized column), not an
    inline expression: the lambda indexes into it per element, and an
    inlined array expression re-evaluates per element (see dedup.py
    PERF NOTE — 22x measured).

    Guarded for size-1 arrays: sequence(0, -1) yields [0, -1] and
    element_at(words, 0) throws at runtime; the CASE branch matches the
    DuckDB twin's generate_series(1, len-1), which is simply empty."""
    n = F.size(words)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(words, i + 1), F.element_at(words, i + 2)),
        )
    )
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def q41_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", _words(F.col("text")).alias("words"))
        .select("doc_id", "source", _bigrams(F.col("words")).alias("grams"))
    )
    a = docs.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("src"), F.col("grams").alias("grams_a")
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"), F.col("grams").alias("grams_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return (
        a.join(b, (F.col("src") == F.col("src_b")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            F.col("src").alias("source"),
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_TAU)
        .orderBy("id_a", "id_b")
    )


Q41_SQL = f"""
WITH g AS (
  SELECT doc_id, source,
         list_distinct([words[i] || ' ' || words[i+1]
                        for i in generate_series(1, len(words) - 1)]) AS grams
  FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS words FROM documents)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.source AS source,
       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
             len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
            len(list_distinct(list_concat(a.grams, b.grams))), 4) >= {JACCARD_TAU}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# PII-style redaction — training-data hygiene op: mask email-shaped
# tokens and digit runs. Spark regexp_replace is global by default;
# DuckDB needs the 'g' flag — same RE2/Java-compatible patterns.
# ---------------------------------------------------------------------------
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
DIGITS_RE = "[0-9]+"


def q57_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), DIGITS_RE, "<NUM>"
    )
    return (
        docs.select(
            "doc_id",
            F.substring(redacted, 1, 80).alias("redacted_head"),
            F.regexp_count("text", F.lit(DIGITS_RE)).cast("bigint").alias("n_digit_runs"),
            F.regexp_count("text", F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
            (F.length("text") - F.length(redacted)).cast("bigint").alias("len_delta"),
        )
        .orderBy("doc_id")
    )


Q57_SQL = f"""
SELECT doc_id,
       substring(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{DIGITS_RE}', '<NUM>', 'g'), 1, 80) AS redacted_head,
       CAST(len(regexp_extract_all(text, '{DIGITS_RE}')) AS BIGINT) AS n_digit_runs,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(length(text) - length(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{DIGITS_RE}', '<NUM>', 'g')) AS BIGINT) AS len_delta
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Corpus-level stats — the one-screen training-data report: volume,
# token mass, dedup rate, per-language distribution. One pass + one
# tiny aggregation; at 100 TB this is the nightly corpus dashboard.
# ---------------------------------------------------------------------------
def q63_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn("words", _words(F.col("text")))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
            F.sum(F.size("words")).cast("bigint").alias("total_words"),
            F.round(F.avg(F.size("words")), 4).alias("avg_words"),
            F.countDistinct(F.sha2("text", 256)).alias("n_unique_docs"),
        )
        .withColumn(
            "dup_rate",
            F.round(1.0 - F.col("n_unique_docs") / F.col("n_docs"), 4),
        )
        .orderBy("lang")
    )


Q63_SQL = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS total_words,
       round(avg(len(string_split(lower(text), ' '))), 4) AS avg_words,
       count(DISTINCT sha256(text)) AS n_unique_docs,
       round(1.0 - CAST(count(DISTINCT sha256(text)) AS DOUBLE) / count(*), 4) AS dup_rate
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Repetition ratio (Gopher-rule shape): 1 - distinct_bigrams/total_bigrams
# per document — high values flag boilerplate/spam for filtering.
# ---------------------------------------------------------------------------
def q64_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", _words(F.col("text")).alias("words"))
        .select("doc_id", "words", _bigrams(F.col("words")).alias("distinct_grams"))
    )
    total = F.greatest(F.size("words") - 1, F.lit(1))
    return docs.select(
        "doc_id",
        F.size("distinct_grams").cast("bigint").alias("n_distinct_bigrams"),
        total.cast("bigint").alias("n_bigrams"),
        F.round(1.0 - F.size("distinct_grams") / total.cast("double"), 4).alias(
            "repetition_ratio"
        ),
    ).orderBy("doc_id")


Q64_SQL = """
WITH g AS (
  SELECT doc_id,
         greatest(len(words) - 1, 1) AS n_bigrams,
         len(list_distinct([words[i] || ' ' || words[i+1]
                            for i in generate_series(1, len(words) - 1)])) AS n_distinct
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
)
SELECT doc_id,
       CAST(n_distinct AS BIGINT) AS n_distinct_bigrams,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       round(1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams, 4) AS repetition_ratio
FROM g
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Benchmark-contamination check: documents sharing any word-3-gram with a
# probe set (e.g. eval-benchmark passages). Exploded shingles -> semi-join
# on the shingle — at 100 TB the probe side is broadcast and the corpus
# side streams; no pairwise comparison ever materializes.
# ---------------------------------------------------------------------------
PROBE_SNIPPETS = [
    "scan merge part",
    "fast key order",
    "window small hash",
]


def q65_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import with_shingles

    docs = with_shingles(load(spark, sf_dir, "documents").select("doc_id", "text"))
    exploded = docs.select("doc_id", F.explode("shingles").alias("shingle"))
    probes = F.array(*[F.lit(s) for s in PROBE_SNIPPETS])
    hits = exploded.where(F.array_contains(probes, F.col("shingle")))
    return (
        hits.groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_contaminated_grams"))
        .orderBy("doc_id")
    )


Q65_SQL = f"""
WITH shingled AS (
  SELECT doc_id,
         unnest(list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                for i in generate_series(1, len(words) - 2)])) AS shingle
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
)
SELECT doc_id, count(DISTINCT shingle) AS n_contaminated_grams
FROM shingled
WHERE shingle IN ({", ".join("'" + s + "'" for s in PROBE_SNIPPETS)})
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Composite curation pipeline — the full training-data pass as ONE
# logical plan: quality-filter -> exact-dedup (keep min id) -> redact ->
# token-count -> deterministic eval split. Catalyst fuses the narrow
# stages into a single scan + one dedup shuffle; at 100 TB this IS the
# nightly curation job.
# ---------------------------------------------------------------------------
def q74_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").withColumn("words", _words(F.col("text")))
    n_words = F.size("words")
    sw_ratio = F.size(F.filter(F.col("words"), lambda w: w.isin(STOPWORDS["en"]))) / n_words
    quality_ok = (n_words >= 10) & (sw_ratio >= 0.01)

    filtered = docs.where(quality_ok)
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        filtered.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    redacted = F.regexp_replace("text", DIGITS_RE, "<NUM>")
    return deduped.select(
        "doc_id",
        "lang",
        F.substring(redacted, 1, 60).alias("clean_head"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.when(F.col("doc_id") % 10 == 0, "eval").otherwise("train").alias("split"),
    ).orderBy("doc_id")


Q74_SQL = f"""
WITH scored AS (
  SELECT *,
         len(string_split(lower(text), ' ')) AS n_words,
         CAST(len(list_filter(string_split(lower(text), ' '),
              w -> w IN ({_sql_list(STOPWORDS["en"])}))) AS DOUBLE)
           / len(string_split(lower(text), ' ')) AS sw_ratio
  FROM documents
),
filtered AS (
  SELECT * FROM scored WHERE n_words >= 10 AND sw_ratio >= 0.01
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
    FROM filtered
  ) WHERE rn = 1
)
SELECT doc_id,
       lang,
       substring(regexp_replace(text, '{DIGITS_RE}', '<NUM>', 'g'), 1, 60) AS clean_head,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CASE WHEN doc_id % 10 = 0 THEN 'eval' ELSE 'train' END AS split
FROM deduped
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q145 — per-document token entropy: Shannon entropy of the word
# distribution, H = ln(N) - sum(c ln c)/N over per-word counts c (one
# pass, no join — the identity avoids dividing each count by N before
# the log). Low-entropy documents are template/boilerplate/spam; this
# is the standard diversity signal next to the repetition ratio (q64).
# norm_entropy divides by ln(n_distinct) (max achievable H), 0.0 for
# single-word docs. Plan: two stacked aggregations, both map-side
# partial; tokenization matches q41/q120 (split on single space).
# ---------------------------------------------------------------------------
def q145_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    per = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    c = F.col("c").cast("double")
    agg = per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(c * F.log(c)).alias("clogc"),
    )
    big_n = F.col("n_words").cast("double")
    h = F.log(big_n) - F.col("clogc") / big_n
    return agg.select(
        "doc_id",
        "n_words",
        "n_distinct",
        F.round(h, 4).alias("entropy"),
        F.round(
            F.when(
                F.col("n_distinct") > 1,
                h / F.log(F.col("n_distinct").cast("double")),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("norm_entropy"),
    ).orderBy("doc_id")


Q145_SQL = """
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
per AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY doc_id, w),
agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clogc
  FROM per GROUP BY doc_id
)
SELECT doc_id, n_words, n_distinct,
       round(ln(CAST(n_words AS DOUBLE)) - clogc / n_words, 4) AS entropy,
       round(CASE WHEN n_distinct > 1
                  THEN (ln(CAST(n_words AS DOUBLE)) - clogc / n_words)
                       / ln(CAST(n_distinct AS DOUBLE))
                  ELSE 0.0 END, 4) AS norm_entropy
FROM agg
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q159 — IDF-weighted Jaccard near-dup pairs: plain Jaccard (q41)
# treats boilerplate bigrams ("of the") and distinctive ones equally;
# the weighted variant scores overlap by information content
# (w = ln(N/df)), which is how production near-dup verification
# separates true duplicates from shared-template pages. Shape is the
# inverted-index candidate join: explode distinct grams, equi-join on
# the GRAM key (shuffle rows = posting-list entries, never doc x doc),
# aggregate intersection weight per pair, then combine with the two
# broadcast doc-weight totals. IDF terms are rounded to DECIMAL(27,8)
# BEFORE summation, so both engines fold exactly the same numbers in
# any order. Boilerplate control IS the scale control: grams appearing
# in more than WJ_DF_FRAC of the corpus are excluded from the
# definition entirely (their IDF is lowest and their posting lists are
# the quadratic hazard — a df-D gram alone yields D^2/2 candidate
# pairs). The cap is relative, so it tightens absolutely as the corpus
# grows; measured at sf0.1 it cuts the pair join ~25x. The oracle
# applies the identical cap — exactness is preserved because the cap
# is part of the operator's semantics, not an approximation of it.
# ---------------------------------------------------------------------------
WJ_TAU = 0.25
WJ_DF_FRAC = 0.05


def q159_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", _words(F.col("text")).alias("words"))
        .select("doc_id", _bigrams(F.col("words")).alias("grams"))
    )
    grams = docs.select("doc_id", F.explode("grams").alias("gram"))
    # N as a 1-row aggregate broadcast (same anchor pattern as q83's
    # `corpus` relation) — NOT a driver-side docs.count(), which would
    # fire an eager extra full scan before the real job even plans.
    corpus = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    w = F.round(
        F.log(F.col("n_docs") / F.col("_df").cast("double")), 8
    ).cast("decimal(27,8)")
    gram_w = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(corpus))
        .where(F.col("_df") <= F.col("n_docs") * WJ_DF_FRAC)
        .select("gram", w.alias("w"))
    )
    weighted = grams.join(gram_w, "gram")
    doc_w = weighted.groupBy("doc_id").agg(F.sum("w").alias("w_doc"))
    a = weighted.select(F.col("doc_id").alias("id_a"), "gram", "w")
    b = weighted.select(F.col("doc_id").alias("id_b"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum("w").alias("w_ab"))
    )
    wa = doc_w.select(F.col("doc_id").alias("id_a"), F.col("w_doc").alias("w_a"))
    wb = doc_w.select(F.col("doc_id").alias("id_b"), F.col("w_doc").alias("w_b"))
    wj = F.col("w_ab").cast("double") / (
        F.col("w_a").cast("double")
        + F.col("w_b").cast("double")
        - F.col("w_ab").cast("double")
    )
    return (
        inter.join(F.broadcast(wa), "id_a")
        .join(F.broadcast(wb), "id_b")
        .select("id_a", "id_b", F.round(wj, 4).alias("weighted_jaccard"))
        .where(F.col("weighted_jaccard") >= WJ_TAU)
        .orderBy("id_a", "id_b")
    )


Q159_SQL = f"""
WITH g0 AS (
  SELECT doc_id,
         unnest(list_distinct([words[i] || ' ' || words[i+1]
                               for i in generate_series(1, len(words) - 1)])) AS gram
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
gram_w AS (
  SELECT gram,
         CAST(round(ln((SELECT n_docs FROM n) / count(*)), 8) AS DECIMAL(27,8)) AS w
  FROM g0 GROUP BY gram
  HAVING count(*) <= (SELECT n_docs FROM n) * {WJ_DF_FRAC}
),
weighted AS (SELECT g0.doc_id, g0.gram, gram_w.w FROM g0 JOIN gram_w USING (gram)),
doc_w AS (SELECT doc_id, sum(w) AS w_doc FROM weighted GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w) AS w_ab
  FROM weighted a JOIN weighted b USING (gram)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT i.id_a, i.id_b,
         round(CAST(i.w_ab AS DOUBLE)
               / (CAST(wa.w_doc AS DOUBLE) + CAST(wb.w_doc AS DOUBLE)
                  - CAST(i.w_ab AS DOUBLE)), 4) AS weighted_jaccard
  FROM inter i
  JOIN doc_w wa ON wa.doc_id = i.id_a
  JOIN doc_w wb ON wb.doc_id = i.id_b
)
SELECT id_a, id_b, weighted_jaccard
FROM scored
WHERE weighted_jaccard >= {WJ_TAU}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# q165 — containment near-dup (asymmetric): C(A->B) = |grams(A) ∩
# grams(B)| / |grams(A)|. Jaccard misses subset duplication — a doc
# embedded whole inside a larger one scores low symmetric overlap but
# containment ~1. This is the quote/boilerplate-inclusion detector
# production dedup runs alongside q159. Same scale shape as q159: the
# inverted-index join on the GRAM key with the relative document-
# frequency cap (grams in > CONTAIN_DF_FRAC of docs are excluded from
# the gram set — the cap is part of the operator semantics and applied
# identically in the oracle, so exactness is preserved; it is also what
# kills the quadratic posting-list hazard at 100 TB). Output is
# DIRECTED pairs (id_a contained-in id_b); n_grams_a is the capped
# denominator. Integer intersect / integer denominator -> one double
# division: bit-identical across engines.
# ---------------------------------------------------------------------------
CONTAIN_TAU = 0.5
CONTAIN_DF_FRAC = WJ_DF_FRAC


def q165_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", _words(F.col("text")).alias("words"))
        .select("doc_id", _bigrams(F.col("words")).alias("grams"))
    )
    grams = docs.select("doc_id", F.explode("grams").alias("gram"))
    corpus = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    kept = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(corpus))
        .where(F.col("_df") <= F.col("n_docs") * CONTAIN_DF_FRAC)
        .select("gram")
    )
    posting = grams.join(kept, "gram")
    sizes = posting.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    a = posting.select(F.col("doc_id").alias("id_a"), "gram")
    b = posting.select(F.col("doc_id").alias("id_b"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(
        F.col("doc_id").alias("id_a"), F.col("n_grams").alias("n_grams_a")
    )
    return (
        inter.join(F.broadcast(na), "id_a")
        .select(
            "id_a",
            "id_b",
            "n_grams_a",
            F.round(
                F.col("inter").cast("double") / F.col("n_grams_a").cast("double"),
                4,
            ).alias("containment"),
        )
        .where(F.col("containment") >= CONTAIN_TAU)
        .orderBy("id_a", "id_b")
    )


Q165_SQL = f"""
WITH g0 AS (
  SELECT doc_id,
         unnest(list_distinct([words[i] || ' ' || words[i+1]
                               for i in generate_series(1, len(words) - 1)])) AS gram
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
kept AS (
  SELECT gram FROM g0 GROUP BY gram
  HAVING count(*) <= (SELECT n_docs FROM n) * {CONTAIN_DF_FRAC}
),
posting AS (SELECT g0.doc_id, g0.gram FROM g0 JOIN kept USING (gram)),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
  FROM posting GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM posting a JOIN posting b USING (gram)
  WHERE a.doc_id != b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b, s.n_grams AS n_grams_a,
       round(CAST(i.inter AS DOUBLE) / CAST(s.n_grams AS DOUBLE), 4)
           AS containment
FROM inter i JOIN sizes s ON s.doc_id = i.id_a
WHERE CAST(i.inter AS DOUBLE) / CAST(s.n_grams AS DOUBLE) >= {CONTAIN_TAU}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# q181 — near-dup explanation: for every q159 surviving pair, the top
# EXPLAIN_K shared grams by IDF weight — the "why is this a duplicate"
# evidence a reviewer needs before bulk-deleting at corpus scale
# (weighted-overlap scores alone are unauditable). Reuses q159's exact
# machinery (same df cap, same rounded DECIMAL weights) and attaches
# the shared-gram detail only to SURVIVING pairs via a semi-join-shaped
# inner join on (id_a, id_b) — the per-pair explode never happens for
# the pairs the threshold killed. Top-k per pair is a WindowGroupLimit.
# ---------------------------------------------------------------------------
EXPLAIN_K = 3


def q181_neardup_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q159_weighted_jaccard(spark, sf_dir).select(
        "id_a", "id_b", "weighted_jaccard"
    )
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", _words(F.col("text")).alias("words"))
        .select("doc_id", _bigrams(F.col("words")).alias("grams"))
    )
    grams = docs.select("doc_id", F.explode("grams").alias("gram"))
    corpus = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    w = F.round(
        F.log(F.col("n_docs") / F.col("_df").cast("double")), 8
    ).cast("decimal(27,8)")
    gram_w = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(corpus))
        .where(F.col("_df") <= F.col("n_docs") * WJ_DF_FRAC)
        .select("gram", w.alias("w"))
    )
    weighted = grams.join(gram_w, "gram")
    a = weighted.select(F.col("doc_id").alias("id_a"), "gram", "w")
    b = weighted.select(F.col("doc_id").alias("id_b"), "gram")
    shared = (
        a.join(b, "gram")
        .join(F.broadcast(pairs), ["id_a", "id_b"])
    )
    wk = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("w").desc(), "gram"
    )
    return (
        shared.withColumn("rk", F.row_number().over(wk).cast("bigint"))
        .where(F.col("rk") <= EXPLAIN_K)
        .select(
            "id_a",
            "id_b",
            "weighted_jaccard",
            "rk",
            "gram",
            F.col("w").cast("double").alias("gram_idf"),
        )
        .orderBy("id_a", "id_b", "rk")
    )


Q181_SQL = f"""
WITH pairs AS ({Q159_SQL.replace("ORDER BY id_a, id_b", "")}),
g0 AS (
  SELECT doc_id,
         unnest(list_distinct([words[i] || ' ' || words[i+1]
                               for i in generate_series(1, len(words) - 1)])) AS gram
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
gram_w AS (
  SELECT gram,
         CAST(round(ln((SELECT n_docs FROM n) / count(*)), 8) AS DECIMAL(27,8)) AS w
  FROM g0 GROUP BY gram
  HAVING count(*) <= (SELECT n_docs FROM n) * {WJ_DF_FRAC}
),
weighted AS (SELECT g0.doc_id, g0.gram, gram_w.w FROM g0 JOIN gram_w USING (gram)),
shared AS (
  SELECT p.id_a, p.id_b, p.weighted_jaccard, a.gram, a.w
  FROM weighted a
  JOIN weighted b ON a.gram = b.gram
  JOIN pairs p ON p.id_a = a.doc_id AND p.id_b = b.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id_a, id_b
                               ORDER BY w DESC, gram) AS rk
  FROM shared
)
SELECT id_a, id_b, weighted_jaccard, CAST(rk AS BIGINT) AS rk, gram,
       CAST(w AS DOUBLE) AS gram_idf
FROM ranked
WHERE rk <= {EXPLAIN_K}
ORDER BY id_a, id_b, rk
"""


# ---------------------------------------------------------------------------
# q179 — PII inventory by source: per-source counts of PII-pattern
# matches (emails, digit runs), documents affected, and the match rate
# — the compliance dashboard that decides which SOURCES need q57's
# redaction pass before training (doc-level redaction is q57; this is
# the corpus-level triage view). One scan with the same proven regex
# pair, one partial-aggregated groupBy on source; integer counts, one
# double division per rate.
# ---------------------------------------------------------------------------
def q179_pii_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_emails = F.regexp_count("text", F.lit(EMAIL_RE))
    n_digits = F.regexp_count("text", F.lit(DIGITS_RE))
    per = docs.select(
        "source", n_emails.alias("ne"), n_digits.alias("nd")
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ne").cast("bigint").alias("n_emails"),
            F.sum("nd").cast("bigint").alias("n_digit_runs"),
            F.sum(((F.col("ne") + F.col("nd")) > 0).cast("bigint"))
            .cast("bigint")
            .alias("n_docs_with_pii"),
        )
        .select(
            "source",
            "n_docs",
            "n_emails",
            "n_digit_runs",
            "n_docs_with_pii",
            F.round(
                F.col("n_docs_with_pii").cast("double")
                / F.col("n_docs").cast("double"),
                4,
            ).alias("pii_doc_rate"),
        )
        .orderBy("source")
    )


Q179_SQL = f"""
WITH per AS (
  SELECT source,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne,
         len(regexp_extract_all(text, '{DIGITS_RE}')) AS nd
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ne) AS BIGINT) AS n_emails,
       CAST(sum(nd) AS BIGINT) AS n_digit_runs,
       CAST(sum(CASE WHEN ne + nd > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_with_pii,
       round(CAST(sum(CASE WHEN ne + nd > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS pii_doc_rate
FROM per
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q172 — language-ID confusion matrix: q37's stopword predictor scored
# against the corpus's labeled `lang` column — (true lang x predicted)
# counts and the within-language share. The classifier-QA loop every
# production lang-ID heuristic needs: the diagonal share IS the
# per-language recall, and off-diagonal mass shows which languages the
# stopword lists confuse. One scan re-deriving the q37 prediction
# expression (no join back to q37's output), one shuffle on the tiny
# (lang, predicted) key space, share via a per-lang window over ≤
# |langs|+1 rows. Integer counts; the share is one double division.
# ---------------------------------------------------------------------------
def q172_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn(
        "words", _words(F.col("text"))
    )
    words = F.col("words")
    n_words = F.size(words)
    ratios = {}
    for lang, sw in STOPWORDS.items():
        hits = F.size(F.filter(words, lambda w: w.isin(sw)))
        ratios[lang] = F.round(hits / n_words, 4)
    best_ratio = F.greatest(*ratios.values())
    predicted = F.lit("unknown")
    for lang in reversed(list(STOPWORDS)):
        predicted = F.when(
            (ratios[lang] == best_ratio) & (best_ratio >= 0.02), F.lit(lang)
        ).otherwise(predicted)
    pairs = docs.select("lang", predicted.alias("predicted_lang"))
    counts = pairs.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return (
        counts.select(
            "lang",
            "predicted_lang",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(w).cast("double"),
                4,
            ).alias("share_of_lang"),
        )
        .orderBy("lang", "predicted_lang")
    )


def _q172_sql() -> str:
    return f"""
WITH pred AS (SELECT doc_id, predicted_lang FROM ({_q37_sql()})),
joined AS (
  SELECT d.lang, p.predicted_lang
  FROM documents d JOIN pred p USING (doc_id)
),
counts AS (
  SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM joined GROUP BY lang, predicted_lang
)
SELECT lang, predicted_lang, n_docs,
       round(CAST(n_docs AS DOUBLE)
             / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 4)
           AS share_of_lang
FROM counts
ORDER BY lang, predicted_lang
"""


# ---------------------------------------------------------------------------
# q166 — tokenizer fertility by language: chars-per-token and
# regex-BPE-ish-tokens-per-whitespace-token, aggregated per lang. The
# tokenizer-budget planning metric — fertility decides how many TEXT
# bytes a fixed token budget buys per language, and a lang whose
# fertility drifts signals tokenizer mismatch. Reuses q39's exact token
# definitions (whitespace + TOKEN_RE). One narrow scan, one partial-
# aggregated groupBy on lang; integer sums -> single double divisions,
# bit-identical across engines.
# ---------------------------------------------------------------------------
def q166_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    lower = F.lower("text")
    per = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("chars"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws"),
        F.regexp_count(lower, F.lit(TOKEN_RE)).cast("bigint").alias("bpe"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("chars").cast("bigint").alias("total_chars"),
            F.sum("ws").cast("bigint").alias("total_ws_tokens"),
            F.sum("bpe").cast("bigint").alias("total_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_chars",
            "total_ws_tokens",
            "total_bpe_tokens",
            F.round(
                F.col("total_chars").cast("double")
                / F.col("total_bpe_tokens").cast("double"),
                4,
            ).alias("chars_per_bpe"),
            F.round(
                F.col("total_bpe_tokens").cast("double")
                / F.col("total_ws_tokens").cast("double"),
                4,
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


Q166_SQL = f"""
WITH per AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT) AS bpe
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST(sum(ws) AS BIGINT) AS total_ws_tokens,
       CAST(sum(bpe) AS BIGINT) AS total_bpe_tokens,
       round(CAST(sum(chars) AS DOUBLE) / CAST(sum(bpe) AS DOUBLE), 4)
           AS chars_per_bpe,
       round(CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 4)
           AS fertility
FROM per
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# q190 — compression-ratio proxy per source: distinct/total 4-gram and
# type/token ratios — the cheap stand-in for the "gzip compressibility"
# quality signal used by web-corpus curation (highly repetitive =
# highly compressible = low-value training text; cf. Gopher's
# repetition filters, which q64 applies per document — this is the
# SOURCE-level roll-up that decides whether a whole crawl slice is
# boilerplate). Totals come from array arithmetic WITHOUT exploding
# (one narrow agg); only the distinct counts explode, and those grams
# shuffle once each with map-side partial distinct. At 100 TB the
# shuffle carries (source, gram) pairs only — never document bodies.
# ---------------------------------------------------------------------------
COMPRESS_N = 4


def q190_compression_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "source", _words(F.col("text")).alias("words")
    )
    n = F.size("words")
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(n).cast("bigint").alias("n_words"),
        F.sum(F.greatest(n - (COMPRESS_N - 1), F.lit(0)))
        .cast("bigint")
        .alias("n_grams"),
    )
    grams = (
        docs.where(n >= COMPRESS_N)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - COMPRESS_N),
                    lambda i: F.concat_ws(
                        " ", F.slice("words", i + 1, COMPRESS_N)
                    ),
                )
            ).alias("gram"),
        )
        .groupBy("source")
        .agg(F.countDistinct("gram").cast("bigint").alias("n_grams_distinct"))
    )
    words = (
        docs.select("source", F.explode("words").alias("word"))
        .groupBy("source")
        .agg(F.countDistinct("word").cast("bigint").alias("n_words_distinct"))
    )
    return (
        totals.join(grams, "source", "left")
        .join(words, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_grams",
            F.coalesce("n_grams_distinct", F.lit(0)).alias("n_grams_distinct"),
            F.coalesce("n_words_distinct", F.lit(0)).alias("n_words_distinct"),
            F.round(
                1 - F.coalesce("n_grams_distinct", F.lit(0)) / F.col("n_grams"),
                4,
            ).alias("gram_redundancy"),
            F.round(
                F.coalesce("n_words_distinct", F.lit(0)) / F.col("n_words"), 4
            ).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


Q190_SQL = f"""
WITH base AS (
  SELECT source, string_split(lower(text), ' ') AS words FROM documents
),
totals AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(words)) AS BIGINT) AS n_words,
         CAST(sum(greatest(len(words) - {COMPRESS_N - 1}, 0)) AS BIGINT)
             AS n_grams
  FROM base GROUP BY source
),
grams AS (
  SELECT source,
         CAST(count(DISTINCT gram) AS BIGINT) AS n_grams_distinct
  FROM (
    SELECT source,
           unnest(list_transform(
             generate_series(0, len(words) - {COMPRESS_N}),
             i -> array_to_string(words[i + 1 : i + {COMPRESS_N}], ' ')
           )) AS gram
    FROM base
    WHERE len(words) >= {COMPRESS_N}
  )
  GROUP BY source
),
w AS (
  SELECT source, CAST(count(DISTINCT word) AS BIGINT) AS n_words_distinct
  FROM (SELECT source, unnest(words) AS word FROM base)
  GROUP BY source
)
SELECT t.source, n_docs, n_words, n_grams,
       coalesce(n_grams_distinct, 0) AS n_grams_distinct,
       coalesce(n_words_distinct, 0) AS n_words_distinct,
       round(1 - coalesce(n_grams_distinct, 0) / CAST(n_grams AS DOUBLE), 4)
           AS gram_redundancy,
       round(coalesce(n_words_distinct, 0) / CAST(n_words AS DOUBLE), 4)
           AS type_token_ratio
FROM totals t
LEFT JOIN grams g ON t.source = g.source
LEFT JOIN w ON t.source = w.source
ORDER BY t.source
"""


# ---------------------------------------------------------------------------
# q252 — readability scoring (Flesch reading-ease with a vowel-group
# syllable proxy): words, sentences and syllable estimates per
# document, rolled up per source. The curation screen q38/q93 lack:
# Gopher-style filters catch degenerate TEXT SHAPE, readability
# catches register (legalese vs conversational) — a routine mixture
# lever in pretraining-data recipes. Everything is scan-side
# ``regexp_count`` arithmetic (JVM codegen, no UDF, no shuffle before
# the per-source combine); syllables ~= [aeiouy]+ groups — the
# standard cheap proxy, identical regex semantics on both engines.
# Sentences are floored at 1 so headline-only docs don't divide by 0.
# ---------------------------------------------------------------------------
def q252_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.lower(F.col("text"))
    words = F.regexp_count(t, F.lit("[a-z0-9]+"))
    sents = F.greatest(F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1))
    syll = F.regexp_count(t, F.lit("[aeiouy]+"))
    flesch = (
        F.lit(206.835)
        - 1.015 * (words.cast("double") / sents.cast("double"))
        - 84.6 * (syll.cast("double") / words.cast("double"))
    )
    per_doc = (
        load(spark, sf_dir, "documents")
        .where(F.length("text") > 0)
        .select(
            "source",
            words.alias("w"),
            sents.alias("s"),
            syll.alias("y"),
            flesch.alias("flesch"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (F.sum("w") / F.sum("s")).alias("words_per_sentence"),
            (F.sum("y") / F.sum("w")).alias("syllables_per_word"),
            F.avg("flesch").alias("avg_flesch"),
        )
        .orderBy("source")
    )


Q252_SQL = """
WITH per_doc AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
  FROM documents WHERE length(text) > 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       sum(w) / CAST(sum(s) AS DOUBLE) AS words_per_sentence,
       sum(y) / CAST(sum(w) AS DOUBLE) AS syllables_per_word,
       avg(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                   - 84.6 * (y / CAST(w AS DOUBLE))) AS avg_flesch
FROM per_doc
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q258 — BPE pair statistics: global counts of ADJACENT CHARACTER
# PAIRS inside words — exactly the statistic the first BPE merge
# iteration maximizes (Sennrich et al. 2016). Running it over a corpus
# answers "what would the tokenizer learn first here" and detects
# corpus drift tokenizer-side (a shifted top-pair table means shifted
# character statistics). Distinct from q146 PMI (word-level
# co-occurrence): this is character-level within words. Plan: words
# explode scan-side (split), each word emits its len-1 bigrams via a
# sequence/substr transform (all JVM expressions), and ONE hash
# aggregate counts pairs — at 100 TB the pair domain is ~1k keys so
# map-side combine collapses virtually all traffic before the
# exchange. Top 20 by (count desc, pair) is a TakeOrdered, no global
# sort.
# ---------------------------------------------------------------------------
BPE_TOP_PAIRS = 20


def q258_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w"))
        .where(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair"),
        "w",
    )
    total = pairs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        pairs.groupBy("pair")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("w").cast("bigint").alias("n_distinct_words"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "pair",
            "n_occurrences",
            "n_distinct_words",
            (F.col("n_occurrences") / F.col("n_total")).alias("share"),
        )
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(BPE_TOP_PAIRS)
    )


Q258_SQL = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
keep AS (SELECT w FROM words WHERE length(w) >= 2),
pairs AS (
  SELECT w, unnest([substr(w, i, 2) for i in generate_series(1, length(w) - 1)]) AS pair
  FROM keep
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM pairs)
SELECT pair,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_words,
       count(*) / (SELECT n_total FROM tot) AS share
FROM pairs
GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT {BPE_TOP_PAIRS}
"""


# ---------------------------------------------------------------------------
# q295 — per-source lexical diversity: type-token ratio, hapax ratio,
# and the Simpson repeat index over whitespace unigrams. Every output
# is an exact integer ratio (no logs, no engine-math dependence —
# entropy lives in q145): TTR = types/tokens, hapax = once-seen types
# / types, simpson = Σ c(c-1) / (n(n-1)) (probability two random
# tokens from the source are the same type). Curation use: sources
# with collapsing TTR / high simpson are template farms.
# Scale: one groupBy(source, token) then one groupBy(source) — both
# map-side combinable; no windows, no broadcast of row-scale data.
# ---------------------------------------------------------------------------
def q295_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    per = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = per.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("n_hapax"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("rep_pairs"),
    )
    nt = F.col("n_tokens").cast("double")
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        (F.col("n_types").cast("double") / nt).alias("ttr"),
        (
            F.col("n_hapax").cast("double") / F.col("n_types").cast("double")
        ).alias("hapax_ratio"),
        (F.col("rep_pairs").cast("double") / (nt * (nt - F.lit(1.0)))).alias(
            "simpson"
        ),
    ).orderBy("source")


Q295_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents
),
per AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, w
),
agg AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(coalesce(sum(CASE WHEN c = 1 THEN 1 END), 0) AS BIGINT)
           AS n_hapax,
         CAST(sum(c * (c - 1)) AS BIGINT) AS rep_pairs
  FROM per GROUP BY source
)
SELECT source, n_tokens, n_types,
       CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
       CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_ratio,
       CAST(rep_pairs AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0))
         AS simpson
FROM agg
ORDER BY source
"""


# ---------------------------------------------------------------------------
# q296 — character-trigram LM outlier scoring (the fastText/CCNet-
# style LM proxy, char-level so it is OOV-robust where q121's word
# unigrams are not): train add-one-smoothed trigram logprobs on the
# WHOLE corpus (one pass), score every document by its mean trigram
# logprob, return the bottom-K outliers (mojibake, binary splatter,
# wrong-language docs sink). Per-trigram logp is rounded to 8 dp at
# the VOCAB level before the per-doc sum (the q208 discipline: makes
# the summands identical decimals on both engines so summation-order
# float drift cannot reach the 4-dp hash).
# Scale: vocab agg is Heaps-law small -> broadcast join onto the
# trigram stream; the stream itself shuffles once for the per-doc agg;
# bottom-K is a TakeOrdered, no global sort.
# ---------------------------------------------------------------------------
TRIGRAM_BOTTOM_K = 20


def q296_char_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    tris = docs.where(F.length("t") >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 2),
                lambda i: F.col("t").substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    vocab = tris.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    consts = vocab.agg(
        F.sum("c").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("_v"),
    )
    scored = vocab.crossJoin(F.broadcast(consts)).select(
        "g",
        F.round(
            F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("_n") + F.col("_v")).cast("double")
            ),
            8,
        ).alias("logp"),
    )
    per_doc = (
        tris.join(F.broadcast(scored), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.avg("logp").alias("avg_logp"),
        )
    )
    # order on the 8-dp-rounded mean: identical documents sum the same
    # decimal terms in different orders (1e-16 drift) — rounding makes
    # boundary ties exact so doc_id breaks them identically on both
    # engines.
    return (
        per_doc.select("doc_id", "n_trigrams", "avg_logp")
        .orderBy(F.round(F.col("avg_logp"), 8), "doc_id")
        .limit(TRIGRAM_BOTTOM_K)
    )


Q296_SQL = f"""
WITH d AS (
  SELECT doc_id, lower(text) AS t FROM documents WHERE len(lower(text)) >= 3
),
tris AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 2),
                               i -> t[i:i+2])) AS g
  FROM d
),
vocab AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM tris GROUP BY g),
consts AS (
  SELECT CAST(sum(c) AS BIGINT) AS _n, CAST(count(*) AS BIGINT) AS _v
  FROM vocab
),
scored AS (
  SELECT g,
         round(ln(CAST(c + 1 AS DOUBLE) / CAST(_n + _v AS DOUBLE)), 8)
           AS logp
  FROM vocab, consts
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       avg(logp) AS avg_logp
FROM tris JOIN scored USING (g)
GROUP BY doc_id
ORDER BY round(avg(logp), 8), doc_id
LIMIT {TRIGRAM_BOTTOM_K}
"""


# ---------------------------------------------------------------------------
# q331 — pairwise Jensen-Shannon divergence between source token
# distributions (the symmetric, bounded [0, ln2] companion to q95's
# per-language KL over lengths): restricted to the global top-50
# vocabulary with add-half smoothing, so every distribution lives on
# the SAME bounded support and the pair matrix is exact. The corpus-
# mixing readout: which sources are interchangeable (low JSD) and
# which contribute genuinely different text (high JSD) — the input a
# q80/q162-style mixer needs before setting weights.
# Scale: token counts are one groupBy; the vocab is a 50-row
# broadcast; the pair computation is |S|^2 x 50 rows on the bounded
# source dimension — never scans text twice.
# ---------------------------------------------------------------------------
JSD_VOCAB = 50
JSD_SMOOTH = 0.5


def q331_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    ).where(F.length("tok") > 0)
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(JSD_VOCAB)
        .select("tok")
    )
    st = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sources = docs.select("source").distinct()
    grid = sources.crossJoin(F.broadcast(vocab))
    filled = grid.join(st, ["source", "tok"], "left").select(
        "source", "tok", F.coalesce("c", F.lit(0)).alias("c")
    )
    totals = filled.groupBy("source").agg(F.sum("c").alias("tot"))
    probs = filled.join(totals, "source").select(
        "source",
        "tok",
        (
            (F.col("c") + F.lit(JSD_SMOOTH))
            / (F.col("tot") + F.lit(JSD_SMOOTH * JSD_VOCAB)).cast("double")
        ).alias("p"),
    )
    a = probs.select(
        F.col("source").alias("src_a"), "tok", F.col("p").alias("pa")
    )
    b = probs.select(
        F.col("source").alias("src_b"), "tok", F.col("p").alias("pb")
    )
    pair_terms = a.join(b, "tok").where(F.col("src_a") < F.col("src_b"))
    m = (F.col("pa") + F.col("pb")) / 2
    return (
        pair_terms.groupBy("src_a", "src_b")
        .agg(
            F.round(
                F.sum(
                    F.col("pa") / 2 * F.log(F.col("pa") / m)
                    + F.col("pb") / 2 * F.log(F.col("pb") / m)
                ),
                4,
            ).alias("jsd")
        )
        .orderBy("src_a", "src_b")
    )


Q331_SQL = f"""
WITH toks AS (
  SELECT source, tok
  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents)
  WHERE length(tok) > 0
),
vocab AS (
  SELECT tok FROM toks GROUP BY tok
  ORDER BY count(*) DESC, tok LIMIT {JSD_VOCAB}
),
st AS (
  SELECT source, tok, count(*) AS c
  FROM toks JOIN vocab USING (tok)
  GROUP BY source, tok
),
grid AS (
  SELECT s.source, v.tok
  FROM (SELECT DISTINCT source FROM documents) s, vocab v
),
filled AS (
  SELECT g.source, g.tok, coalesce(st.c, 0) AS c
  FROM grid g LEFT JOIN st ON st.source = g.source AND st.tok = g.tok
),
totals AS (SELECT source, sum(c) AS tot FROM filled GROUP BY source),
probs AS (
  SELECT f.source, f.tok,
         (f.c + {JSD_SMOOTH}) / CAST(t.tot + {JSD_SMOOTH * JSD_VOCAB}
                                     AS DOUBLE) AS p
  FROM filled f JOIN totals t USING (source)
)
SELECT a.source AS src_a, b.source AS src_b,
       round(sum(a.p / 2 * ln(a.p / ((a.p + b.p) / 2))
                 + b.p / 2 * ln(b.p / ((a.p + b.p) / 2))), 4) AS jsd
FROM probs a JOIN probs b ON a.tok = b.tok AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY src_a, src_b
"""


QUERIES = {
    "q331_js_divergence": q331_js_divergence,
    "q295_lexical_diversity": q295_lexical_diversity,
    "q296_char_trigram_lm": q296_char_trigram_lm,
    "q37_lang_id": q37_lang_id,
    "q38_text_quality": q38_text_quality,
    "q39_token_count": q39_token_count,
    "q40_fingerprint": q40_fingerprint,
    "q41_ngram_jaccard": q41_ngram_jaccard,
    "q57_redact_pii": q57_redact_pii,
    "q63_corpus_stats": q63_corpus_stats,
    "q64_repetition_ratio": q64_repetition_ratio,
    "q65_contamination": q65_contamination,
    "q74_curation_pipeline": q74_curation_pipeline,
    "q145_token_entropy": q145_token_entropy,
    "q159_weighted_jaccard": q159_weighted_jaccard,
    "q165_containment": q165_containment,
    "q166_tokenizer_fertility": q166_tokenizer_fertility,
    "q172_lang_confusion": q172_lang_confusion,
    "q179_pii_inventory": q179_pii_inventory,
    "q181_neardup_explain": q181_neardup_explain,
    "q190_compression_proxy": q190_compression_proxy,
    "q252_readability": q252_readability,
    "q258_bpe_pair_stats": q258_bpe_pair_stats,
}

ORACLE = {
    "q331_js_divergence": Q331_SQL,
    "q37_lang_id": _q37_sql(),
    "q295_lexical_diversity": Q295_SQL,
    "q296_char_trigram_lm": Q296_SQL,
    "q38_text_quality": Q38_SQL,
    "q39_token_count": Q39_SQL,
    "q40_fingerprint": Q40_SQL,
    "q41_ngram_jaccard": Q41_SQL,
    "q57_redact_pii": Q57_SQL,
    "q63_corpus_stats": Q63_SQL,
    "q64_repetition_ratio": Q64_SQL,
    "q65_contamination": Q65_SQL,
    "q74_curation_pipeline": Q74_SQL,
    "q145_token_entropy": Q145_SQL,
    "q159_weighted_jaccard": Q159_SQL,
    "q165_containment": Q165_SQL,
    "q166_tokenizer_fertility": Q166_SQL,
    "q172_lang_confusion": _q172_sql(),
    "q179_pii_inventory": Q179_SQL,
    "q181_neardup_explain": Q181_SQL,
    "q190_compression_proxy": Q190_SQL,
    "q252_readability": Q252_SQL,
    "q258_bpe_pair_stats": Q258_SQL,
}
