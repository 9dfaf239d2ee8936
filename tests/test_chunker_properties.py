"""Hypothesis property tests for the recursive chunker (SURVEY §5.2:
"chunker property tests ... rather than chasing LangChain
bit-compatibility")."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from generative_ai_vector_db_spark.operators.chunker import recursive_chunks

text_strategy = st.text(
    alphabet=st.sampled_from("ab \n"),
    max_size=2000,
)


@settings(max_examples=200, deadline=None)
@given(t=text_strategy, size=st.integers(20, 200))
def test_chunks_bounded_and_contiguous(t, size):
    overlap = size // 5
    chunks = recursive_chunks(t, size=size, overlap=overlap)
    for c in chunks:
        assert len(c) <= size
        assert c.strip()  # blank-chunk filter (reference :127)
        assert c in t  # every chunk is a contiguous span of the input


@settings(max_examples=200, deadline=None)
@given(t=text_strategy)
def test_short_text_is_single_chunk(t):
    chunks = recursive_chunks(t, size=5000, overlap=100)
    if t.strip():
        assert chunks == [t]
    else:
        assert chunks == []


@settings(max_examples=100, deadline=None)
@given(words=st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), max_size=200))
def test_word_coverage(words):
    t = " ".join(f"{w}{i}" for i, w in enumerate(words))
    chunks = recursive_chunks(t, size=80, overlap=16)
    joined = " ".join(chunks)
    for i, w in enumerate(words):
        assert f"{w}{i}" in joined


def test_pandas_udf_path_equals_scalar(spark, sf_dir):
    """The Arrow-batched chunk_udf must produce exactly the scalar
    recursive_chunks output for every fixture document (the round-5
    advice swap is a serialization change, not a semantic one)."""
    from generative_ai_vector_db_spark.operators import chunker
    from generative_ai_vector_db_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: r["chunks"]
        for r in docs.select(
            "doc_id", chunker.chunk_udf(chunker.SIZE, 30)("text").alias("chunks")
        ).collect()
    }
    for r in docs.collect():
        want = chunker.recursive_chunks(r["text"] or "", chunker.SIZE, 30)
        assert got[r["doc_id"]] == want, r["doc_id"]
