"""End-to-end RAG query pipeline — reference §3.2 (``POST /chat``):
embed question → top-k retrieve (R17) → context assembly (R18) →
prompt construction (R19) → LLM call (R20) → chat-log append (R21).

Q53 runs the whole chain batch-wise for the 5 fixture query vectors and
is oracle-matched END TO END through the prompt string; the LLM stage
is a deterministic stand-in (the real Groq call, ``app.py:423-432``, is
non-deterministic and excluded from the correctness contract per
SURVEY §2.B — ``llm_answer_stage`` shows the external-UDF shape).

Prompt template mirrors the reference's grounding contract
(``app.py:412-421``): context block + question + "answer only from
context, else say you don't know".

Scale: the only wide operations are the top-k window (bounded per
query) and the context collect_list (k rows per query) — everything
else is narrow string projection. The LLM stage batches through
mapInPandas with per-executor rate limiting in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .vector import Q25_SQL, q25_knn_l2
from ..tables import load

PROMPT_HEADER = "Answer the question using ONLY the context below. If the answer is not in the context, say: I don't know."


def retrieve_with_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top-13 L2 hits joined to documents, assembled per query."""
    hits = q25_knn_l2(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    joined = hits.join(docs, hits.vec_id == docs.doc_id, "inner")
    return joined.groupBy("q_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dist", "vec_id", "text"))),
                lambda s: s["text"],
            ),
            "\n\n",
        ).alias("context")
    )


def build_prompt(df: DataFrame, question_col="question", context_col="context") -> DataFrame:
    """R19: prompt template as a format_string projection."""
    return df.withColumn(
        "prompt",
        F.format_string(
            "%s\n\nContext:\n%s\n\nQuestion: %s\nAnswer:",
            F.lit(PROMPT_HEADER),
            F.col(context_col),
            F.col(question_col),
        ),
    )


def stub_answer(df: DataFrame) -> DataFrame:
    """Deterministic LLM stand-in: echo the first 60 chars of context
    (empty context -> the grounded refusal, mirroring the template)."""
    return df.withColumn(
        "answer",
        F.when(F.length("context") > 0, F.substring("context", 1, 60)).otherwise(
            F.lit("I don't know")
        ),
    )


def llm_answer_stage(
    df: DataFrame,
    model: str = "llama-3.1-8b-instant",
    prompt_col: str = "prompt",
    max_tokens: int = 128,
) -> DataFrame:
    """R20: external chat-completion call batched via mapInPandas,
    against ANY OpenAI-compatible endpoint (vLLM, llama.cpp server,
    Groq's OpenAI surface, ...). Credential-gated — NOT part of the
    correctness contract (nondeterministic external service, SURVEY
    §2.B), but the wiring is real and smoke-tested by the opt-in
    ``pytest -m realmodel`` suite when an endpoint is configured.

    Configuration (env, read on the EXECUTOR — standard practice is to
    ship them via spark.executorEnv):
      OPENAI_BASE_URL  e.g. http://localhost:8000/v1  (required)
      OPENAI_API_KEY   bearer token (optional for local servers)
    stdlib urllib only — no client package dependency.
    """
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema]
        + ["answer string"]
    )

    def _complete(base_url: str, api_key: str, prompt: str) -> str:
        import json
        import urllib.request

        req = urllib.request.Request(
            base_url.rstrip("/") + "/chat/completions",
            data=json.dumps(
                {
                    "model": model,
                    "messages": [{"role": "user", "content": prompt}],
                    "max_tokens": max_tokens,
                    "temperature": 0,
                }
            ).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                **(
                    {"Authorization": f"Bearer {api_key}"} if api_key else {}
                ),
            },
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        return body["choices"][0]["message"]["content"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        base_url = os.environ.get("OPENAI_BASE_URL", "")
        api_key = os.environ.get("OPENAI_API_KEY", "")
        if not base_url:
            raise NotImplementedError(
                "no OPENAI_BASE_URL configured; use stub_answer for "
                "deterministic runs"
            )
        for pdf in batches:
            pdf = pdf.copy()
            pdf["answer"] = [
                _complete(base_url, api_key, p) for p in pdf[prompt_col]
            ]
            yield pdf

    return df.mapInPandas(gen, schema)


def q53_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = retrieve_with_context(spark, sf_dir)
    with_q = ctx.withColumn(
        "question", F.format_string("What does query %s relate to?", F.col("q_id"))
    )
    out = stub_answer(build_prompt(with_q))
    return out.select(
        "q_id",
        "question",
        F.length("context").cast("bigint").alias("context_len"),
        "prompt",
        "answer",
    ).orderBy("q_id")


_HEADER_SQL = PROMPT_HEADER.replace("'", "''")

Q53_SQL = f"""
WITH hits AS ({Q25_SQL.replace("ORDER BY q_id, rn", "")}),
ctx AS (
  SELECT q_id,
         string_agg(text, chr(10) || chr(10) ORDER BY dist, vec_id) AS context
  FROM hits JOIN documents ON hits.vec_id = documents.doc_id
  GROUP BY q_id
),
built AS (
  SELECT q_id,
         printf('What does query %d relate to?', q_id) AS question,
         context,
         '{_HEADER_SQL}' || chr(10) || chr(10) || 'Context:' || chr(10) || context
           || chr(10) || chr(10) || 'Question: ' || printf('What does query %d relate to?', q_id)
           || chr(10) || 'Answer:' AS prompt
  FROM ctx
)
SELECT q_id, question,
       CAST(length(context) AS BIGINT) AS context_len,
       prompt,
       CASE WHEN length(context) > 0 THEN substring(context, 1, 60)
            ELSE 'I don''t know' END AS answer
FROM built
ORDER BY q_id
"""


# ---------------------------------------------------------------------------
# R21 chat-log record format — byte-exact parity with the reference's
# append format (app.py:436-443), including its quirks: the stray space
# after the Timestamp line's newline, "User Email:" label, and a
# 50-underscore separator. Timestamp is a column (the reference stamps
# datetime.now; here it's data so the record is deterministic).
# ---------------------------------------------------------------------------
CHATLOG_TS = "2026-01-09T00:00:00+00:00"  # fixed stamp for the t2 fixture


def format_chatlog_record(ts_iso, email, question, answer):
    return F.concat(
        F.lit("Timestamp:"), ts_iso, F.lit("\n "),
        F.lit("User Email:"), email, F.lit("\n"),
        F.lit("Question:"), question, F.lit("\n"),
        F.lit("Answer:"), answer, F.lit("\n"),
        F.lit("_" * 50 + "\n"),
    )


def q62_chatlog_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    qa = q53_rag_pipeline(spark, sf_dir)
    return qa.select(
        "q_id",
        format_chatlog_record(
            F.lit(CHATLOG_TS),
            F.lit("user@example.com"),
            F.col("question"),
            F.col("answer"),
        ).alias("log_record"),
    ).orderBy("q_id")


Q62_SQL = f"""
WITH qa AS ({Q53_SQL.replace("ORDER BY q_id", "")})
SELECT q_id,
       'Timestamp:{CHATLOG_TS}' || chr(10) || ' ' ||
       'User Email:user@example.com' || chr(10) ||
       'Question:' || question || chr(10) ||
       'Answer:' || answer || chr(10) ||
       repeat('_', 50) || chr(10) AS log_record
FROM qa
ORDER BY q_id
"""


def write_chatlog_text(df: DataFrame, out_dir: str) -> None:
    """Append the formatted records as a text file — the reference's
    chat_logs/chat_log.txt sink as a distributed text write."""
    df.select(F.col("log_record").alias("value")).write.mode("append").text(out_dir)


QUERIES = {
    "q53_rag_pipeline": q53_rag_pipeline,
    "q62_chatlog_format": q62_chatlog_format,
}

ORACLE = {
    "q53_rag_pipeline": Q53_SQL,
    "q62_chatlog_format": Q62_SQL,
}
