"""BM25 + hybrid RRF retrieval (operators/retrieval.py).

Covers: a hand-computed BM25 check on a toy corpus, the DuckDB-oracle
mirror for q83/q84 at both test SFs, and ranking invariants."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import pandas as pd
import pytest

from generative_ai_vector_db_spark.operators import retrieval

from .oracle_utils import compare_query


def test_bm25_hand_computed(spark):
    """3-doc toy corpus; contributions worked out from the formula
    idf = ln(1 + (N - df + .5)/(df + .5)), tf/(tf + k1*(1-b+b*dl/avgdl))."""
    tmp = tempfile.mkdtemp(prefix="bm25_toy_")
    try:
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "spark spark window",
                    "customer table row",
                    "the quick fox",
                ],
                "lang": ["en"] * 3,
                "source": ["s1", "s2", "s3"],
                "n_chars": [18, 18, 13],
            }
        )
        docs.to_parquet(os.path.join(tmp, "documents.parquet"))
        got = (
            retrieval.bm25_scores(spark, tmp)
            .toPandas()
            .set_index("doc_id")["score"]
            .to_dict()
        )
        # N=3, avgdl=3, every matched term has df=1
        idf = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
        tf2 = 2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 1.0))  # tf=2, dl/avgdl=1
        tf1 = 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 1.0))
        assert set(got) == {1, 2}  # doc 3 matches no query term
        assert got[1] == pytest.approx(idf * tf2 + idf * tf1, abs=1e-12)
        assert got[2] == pytest.approx(idf * tf1, abs=1e-12)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_q83_oracle_mirror(spark, sf_dir, sf_dir_t2):
    compare_query(
        spark, sf_dir, retrieval.q83_bm25_topk, retrieval.Q83_SQL, "q83"
    )
    compare_query(
        spark, sf_dir_t2, retrieval.q83_bm25_topk, retrieval.Q83_SQL, "q83@t2"
    )


def test_q84_oracle_mirror(spark, sf_dir, sf_dir_t2):
    compare_query(
        spark, sf_dir, retrieval.q84_hybrid_rrf, retrieval.Q84_SQL, "q84"
    )
    compare_query(
        spark, sf_dir_t2, retrieval.q84_hybrid_rrf, retrieval.Q84_SQL, "q84@t2"
    )


def test_q83_ranking_invariants(spark, sf_dir):
    pdf = retrieval.q83_bm25_topk(spark, sf_dir).toPandas()
    assert pdf["rn"].tolist() == list(range(1, len(pdf) + 1))
    assert len(pdf) <= retrieval.K
    assert (pdf["bm25"] > 0).all()
    assert (pdf["bm25"].diff().dropna() <= 0).all()  # descending


def test_q84_fusion_invariants(spark, sf_dir):
    pdf = retrieval.q84_hybrid_rrf(spark, sf_dir).toPandas()
    assert len(pdf) <= retrieval.K
    assert (pdf["rank_lex"] >= 1).all() and (pdf["rank_vec"] >= 1).all()
    want = (
        1.0 / (retrieval.RRF_K + pdf["rank_lex"])
        + 1.0 / (retrieval.RRF_K + pdf["rank_vec"])
    ).round(6)
    assert (pdf["rrf"] == want).all()
    assert (pdf["rrf"].diff().dropna() <= 0).all()


# ---------------------------------------------------------------------------
# q85-q88: dedup-corpus materialization, tf-idf keywords, vocab
# coverage, median-length curation — oracle mirrors + sanity.
# ---------------------------------------------------------------------------
def test_q85_q88_oracle_mirrors(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import corpus, dedup

    compare_query(
        spark, sf_dir, dedup.QUERIES["q85_dedup_corpus"],
        dedup.ORACLE["q85_dedup_corpus"], "q85",
    )
    compare_query(
        spark, sf_dir, retrieval.q86_tfidf_keywords, retrieval.Q86_SQL, "q86"
    )
    compare_query(
        spark, sf_dir, retrieval.q87_vocab_coverage, retrieval.Q87_SQL, "q87"
    )
    compare_query(
        spark, sf_dir, corpus.QUERIES["q88_median_length_filter"],
        corpus.ORACLE["q88_median_length_filter"], "q88",
    )


def test_q85_dedup_corpus_drops_cluster_members(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import dedup
    from generative_ai_vector_db_spark.tables import load

    kept = dedup.QUERIES["q85_dedup_corpus"](spark, sf_dir).toPandas()
    clusters = dedup.QUERIES["q76_dedup_clusters"](spark, sf_dir).toPandas()
    n_docs = load(spark, sf_dir, "documents").count()
    dropped = (~clusters["is_keeper"]).sum()
    assert len(kept) == n_docs - dropped
    non_keepers = set(clusters.loc[~clusters["is_keeper"], "doc_id"])
    assert not (set(kept["doc_id"]) & non_keepers)


def test_q144_q146_oracle_mirrors(spark, sf_dir):
    compare_query(
        spark, sf_dir, retrieval.q144_zipf_fit, retrieval.Q144_SQL, "q144"
    )
    compare_query(
        spark, sf_dir, retrieval.q146_pmi_collocations, retrieval.Q146_SQL, "q146"
    )


def test_q144_zipf_slope_negative(spark, sf_dir):
    """Rank-frequency on natural-ish text must slope downward, with a
    meaningful log-log linear fit over the top terms."""
    row = retrieval.q144_zipf_fit(spark, sf_dir).collect()[0]
    assert 2 <= row["n_terms"] <= retrieval.ZIPF_K  # vocab-capped at tiny SF
    assert row["slope"] < 0
    assert 0.0 <= row["r2"] <= 1.0


def test_q146_pmi_invariants(spark, sf_dir):
    pdf = retrieval.q146_pmi_collocations(spark, sf_dir).toPandas()
    assert len(pdf) == retrieval.PMI_TOP
    assert (pdf["n_pair"] >= retrieval.PMI_MIN_COUNT).all()
    assert (pdf["pmi"].diff().dropna() <= 0).all()  # ordered by pmi desc


def test_q87_coverage_monotone(spark, sf_dir):
    pdf = retrieval.q87_vocab_coverage(spark, sf_dir).toPandas()
    assert (pdf["coverage"].diff().dropna() > 0).all()
    assert pdf["coverage"].iloc[-1] <= 1.0
    assert (pdf["n"].diff().dropna() <= 0).all()


# ---------------------------------------------------------------------------
# q89 MMR re-ranking: distributed applyInPandas result == local greedy
# on the same candidate blocks, plus greedy invariants.
# ---------------------------------------------------------------------------
def test_q89_mmr_matches_local_reference(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.operators import vector
    from generative_ai_vector_db_spark.tables import load

    got = vector.q89_mmr_rerank(spark, sf_dir).toPandas()

    # rebuild the candidate blocks through the same stage-1 ops, then
    # run the greedy selection locally per query
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    cand = (
        vector._scored_pairs(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= vector.MMR_PREFILTER)
        .drop("rn", "dist")
        .join(
            load(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
            "vec_id",
        )
        .toPandas()
    )
    import pandas as pd

    want = (
        pd.concat(
            [
                vector._mmr_select(g.reset_index(drop=True))
                for _, g in cand.groupby("q_id")
            ]
        )
        .sort_values(["q_id", "mmr_rank"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["q_id", "mmr_rank"]).reset_index(drop=True)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["mmr_score"].tolist() == want["mmr_score"].tolist()


def test_q89_mmr_invariants(spark, sf_dir):
    from generative_ai_vector_db_spark.operators import vector

    pdf = vector.q89_mmr_rerank(spark, sf_dir).toPandas()
    for _, g in pdf.groupby("q_id"):
        assert len(g) == min(vector.K, vector.MMR_PREFILTER)
        assert g["vec_id"].is_unique
        assert g["mmr_rank"].tolist() == list(range(1, len(g) + 1))
        # greedy max is non-increasing round over round
        assert (g.sort_values("mmr_rank")["mmr_score"].diff().dropna() <= 1e-9).all()
        # first pick is pure relevance: the max-relevance candidate
        first = g.loc[g["mmr_rank"] == 1].iloc[0]
        assert first["relevance"] == g["relevance"].max()


# ---------------------------------------------------------------------------
# q161 second-stage rerank: oracle mirror + two-stage invariants.
# ---------------------------------------------------------------------------
def test_q161_oracle_mirror(spark, sf_dir):
    compare_query(
        spark, sf_dir,
        retrieval.QUERIES["q161_ce_rerank"],
        retrieval.ORACLE["q161_ce_rerank"],
        "q161",
    )


def test_q161_rerank_invariants(spark, sf_dir):
    cand = retrieval.q84_hybrid_rrf(spark, sf_dir).toPandas()
    got = retrieval.q161_ce_rerank(spark, sf_dir).toPandas()
    # stage 2 is a permutation of stage 1's candidate set — never adds
    # or drops a document
    assert sorted(got["doc_id"]) == sorted(cand["doc_id"])
    assert got["ce_rank"].tolist() == list(range(1, len(got) + 1))
    # rank moves are zero-sum
    assert got["moved"].sum() == 0
    # weights are a convex combination
    assert abs(retrieval.CE_W_VEC + retrieval.CE_W_LEX + retrieval.CE_W_COV - 1.0) < 1e-12
    # scores are bounded by the max of each (normalized) component
    assert (got["ce_score"] <= 1.0 + 1e-9).all()


@pytest.mark.parametrize("name", sorted(retrieval.ORACLE))
def test_retrieval_matches_oracle(spark, sf_dir, name):
    """Blanket mirror over every retrieval-module oracle twin."""
    compare_query(
        spark, sf_dir, retrieval.QUERIES[name], retrieval.ORACLE[name], name
    )
