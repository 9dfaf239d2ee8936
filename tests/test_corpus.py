"""Corpus-preparation operators (q79-q82) vs their DuckDB twins, plus
semantic invariants the hash-match alone doesn't show."""

from __future__ import annotations

import pytest

from generative_ai_vector_db_spark.operators import corpus

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(corpus.ORACLE))
def test_corpus_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, corpus.QUERIES[name], corpus.ORACLE[name], name)


def test_token_packing_offsets_consistent(spark, sf_dir):
    pdf = corpus.q79_token_packing(spark, sf_dir).toPandas()
    # offsets stay inside the budget and packs are dense per lang
    assert (pdf["pack_offset"] >= 0).all()
    assert (pdf["pack_offset"] < corpus.PACK_BUDGET).all()
    for _, g in pdf.groupby("lang"):
        # concatenate-and-chop: start offsets are the running token sum
        starts = (g["n_tokens"].cumsum() - g["n_tokens"]).tolist()
        assert (g["pack_id"] == [s // corpus.PACK_BUDGET for s in starts]).all()


def test_corpus_mixing_round_robin(spark, sf_dir):
    pdf = corpus.q80_corpus_mixing(spark, sf_dir).toPandas()
    # mix positions are unique and the first cycle covers every language
    assert pdf["mix_pos"].is_unique
    n_langs = pdf["lang"].nunique()
    first_cycle = pdf.sort_values("mix_pos").head(n_langs)
    assert first_cycle["lang"].nunique() == n_langs


def test_quantize_int8_range(spark, sf_dir):
    pdf = corpus.q81_embedding_quantize(spark, sf_dir).toPandas()
    assert (pdf["q_min"] >= -127).all()
    assert (pdf["q_max"] <= 127).all()
    # symmetric quantization maps the max-magnitude element to +/-127
    assert ((pdf["q_max"] == 127) | (pdf["q_min"] == -127)).all()


def test_decontam_flags_planted_overlaps(spark, sf_dir):
    pdf = corpus.q119_ngram_decontam(spark, sf_dir).toPandas()
    # only train docs appear, hits bounded by gram count
    assert (pdf["doc_id"] % corpus.EVAL_MOD != 0).all()
    assert (pdf["n_hits"] <= pdf["n_grams"]).all()
    assert (pdf["contaminated"] == (pdf["n_hits"] > 0)).all()
    # the fixture's planted near-duplicates straddle the split, so the
    # check is not vacuous
    assert pdf["contaminated"].any()
    assert not pdf["contaminated"].all()


def test_span_dedup_fraction_bounds(spark, sf_dir):
    pdf = corpus.q120_span_dedup(spark, sf_dir).toPandas()
    assert (pdf["n_dup_windows"] <= pdf["n_windows"]).all()
    assert ((pdf["dup_frac"] >= 0) & (pdf["dup_frac"] <= 1)).all()
    # planted near-dups produce duplicated spans; unique docs exist too
    assert (pdf["n_dup_windows"] > 0).any()
    assert (pdf["n_dup_windows"] == 0).any()


def test_unigram_logprob_is_proper(spark, sf_dir):
    pdf = corpus.q121_unigram_logprob(spark, sf_dir).toPandas()
    # log probabilities are negative and finite
    assert (pdf["avg_logprob"] < 0).all()
    assert pdf["avg_logprob"].notna().all()
    # every document scored
    assert len(pdf) == 500


def test_q221_mg_sketch_superset_guarantee(spark):
    """Capacity-starved regime (vocab >> C): the per-partition
    Misra-Gries union must (a) actually prune, and (b) retain every
    token with global frequency > N/C — the averaging guarantee the
    two-pass exactness rests on."""
    from pyspark.sql import functions as F

    hot = [f"hot{i}" for i in range(5)]
    rows = [(t,) for t in hot for _ in range(1000)]
    rows += [(f"rare{i:05d}",) for i in range(5000)]
    tokens = spark.createDataFrame(rows, "term string").repartition(8)
    n_total = len(rows)
    cand = set(
        r["term"]
        for r in tokens.mapInPandas(
            corpus._mg_sketch_partition, "term string"
        )
        .distinct()
        .collect()
    )
    vocab = 5 + 5000
    assert len(cand) < vocab  # the sketch pruned
    threshold = n_total / corpus.MG_CAPACITY
    for t in hot:
        assert 1000 > threshold and t in cand, t


def test_q221_fixture_is_exact_topk(spark, sf_dir):
    """On the fixture (vocab < capacity) the two-pass result equals the
    exact global top-k with exact counts."""
    from pyspark.sql import functions as F

    from generative_ai_vector_db_spark.tables import load

    got = corpus.q221_heavy_hitters(spark, sf_dir).toPandas()
    exact = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), "\\s+")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .count()
        .orderBy(F.col("count").desc(), "term")
        .limit(corpus.MG_TOPK)
        .toPandas()
    )
    assert got["term"].tolist() == exact["term"].tolist()
    assert got["n"].tolist() == exact["count"].tolist()
