"""Semantic checks for the round-8 curation additions, beyond the
oracle-parity hash: the bigram-LM filter must rank unseen-bigram
gibberish above fluent in-domain text (higher code length), and the
embedding-outlier audit must surface a planted far vector first.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.corpus import (
    LM_HELD_STRIDE,
    LM_PRUNE_MIN_COUNT,
    lm_bigram_score,
    lm_bigram_score_pruned,
)
from prueba_tecnica_http_client_etl_spark.operators.similarity import (
    OUTLIER_TOPK,
    embedding_outliers,
)


@pytest.fixture()
def lm_corpus_dir(spark, tmp_path):
    """Train docs repeat a small fluent phrase inventory; the held slice
    (doc_id % LM_HELD_STRIDE == 0) holds one fluent doc built from the
    same phrases and one gibberish doc sharing the vocabulary but no
    bigram (tokens reversed + shuffled pairing)."""
    phrases = [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine every single day",
        "practice makes perfect when the work is steady",
    ]
    rows = []
    doc_id = 1
    for rep in range(8):
        for p in phrases:
            while doc_id % LM_HELD_STRIDE == 0:
                doc_id += 1  # keep the training slice pure
            rows.append((doc_id, p, "en", "train"))
            doc_id += 1
    fluent = phrases[0] + " " + phrases[1]
    toks = (phrases[0] + " " + phrases[1]).split()
    gibberish = " ".join(toks[::2] + toks[1::2][::-1])  # same vocab, new bigrams
    rows.append((LM_HELD_STRIDE, fluent, "en", "held"))
    rows.append((2 * LM_HELD_STRIDE, gibberish, "en", "held"))
    # one train-side SINGLETON phrase (every repeated phrase above has
    # c12 = 8): its bigrams sit below LM_PRUNE_MIN_COUNT, and the third
    # held doc reuses one of them — trained under the full model, OOV
    # under the pruned one (test_lm_prune_only_raises_cost_and_bites)
    while doc_id % LM_HELD_STRIDE == 0:
        doc_id += 1
    rows.append((doc_id, "rare seam appears exactly once in training", "en", "train"))
    rows.append((3 * LM_HELD_STRIDE, "rare seam", "en", "held"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df = df.withColumn("n_chars", F.length("text"))
    d = tmp_path / "lm_sf"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    yield str(d)
    drain()


def test_lm_ranks_gibberish_above_fluent(spark, lm_corpus_dir):
    out = {r["doc_id"]: r for r in lm_bigram_score(spark, lm_corpus_dir).collect()}
    fluent, gib = out[LM_HELD_STRIDE], out[2 * LM_HELD_STRIDE]
    # the fluent doc's bigrams are all trained (except the one seam
    # between the two concatenated phrases) -> short codes; the
    # gibberish doc shares the vocabulary but almost no bigram
    assert fluent["n_oov_bigrams"] <= 1
    assert gib["n_oov_bigrams"] > gib["n_bigrams"] // 2
    assert gib["avg_bits"] > fluent["avg_bits"] + 1.0


def test_lm_prune_only_raises_cost_and_bites(spark, lm_corpus_dir):
    """The count-threshold prune can only LENGTHEN codes: a pruned
    bigram falls from bitlen(c1+V) - bitlen(c12+1) to the OOV floor
    bitlen(c1+V) - 1, so per-doc sum_bits (hence avg_bits) is
    monotonically >= the full model's, OOV counts can only grow, and
    the doc set / bigram counts are identical. On the test corpus the
    seam bigram between the two concatenated phrases is a train-side
    singleton, so the prune must actually bite (pruned model strictly
    smaller than full)."""
    full = {r["doc_id"]: r for r in lm_bigram_score(spark, lm_corpus_dir).collect()}
    pruned = {r["doc_id"]: r for r in lm_bigram_score_pruned(spark, lm_corpus_dir).collect()}
    assert set(full) == set(pruned)
    for did in full:
        f, p = full[did], pruned[did]
        assert p["n_bigrams"] == f["n_bigrams"]
        assert p["n_oov_bigrams"] >= f["n_oov_bigrams"]
        assert p["avg_bits"] >= f["avg_bits"]
    # the prune bites: some trained bigram is a singleton (c12 <
    # LM_PRUNE_MIN_COUNT), so at least one held doc scores more OOV
    assert any(
        pruned[d]["n_oov_bigrams"] > full[d]["n_oov_bigrams"] for d in full
    ), f"prune (min count {LM_PRUNE_MIN_COUNT}) never bit on the test corpus"


@pytest.fixture()
def outlier_corpus_dir(spark, tmp_path):
    """Label 0: 30 vectors tightly packed around a point, plus one
    planted far vector (vec_id 999). Label 1: a second tight cluster so
    the per-label grouping is exercised."""
    rows = []
    for i in range(30):
        rows.append((i, [1.0 + 0.001 * (i % 3), 2.0, -1.0, 0.5], 0))
    rows.append((999, [9.0, -9.0, 9.0, -9.0], 0))  # planted outlier
    for i in range(10):
        rows.append((100 + i, [-2.0, -2.0, 1.0 + 0.001 * i, 0.0], 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = tmp_path / "emb_sf"
    df.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    yield str(d)
    drain()


def test_planted_outlier_ranks_first(spark, outlier_corpus_dir):
    out = embedding_outliers(spark, outlier_corpus_dir).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r)
    assert by_label[0][0]["vec_id"] == 999  # the planted vector leads label 0
    # rank column is 1..OUTLIER_TOPK, per label, distances non-increasing
    for label, rws in by_label.items():
        assert [r["rk"] for r in rws] == list(range(1, len(rws) + 1))
        d2s = [r["d2"] for r in rws]
        assert d2s == sorted(d2s, reverse=True)
        assert len(rws) <= OUTLIER_TOPK
    # the planted outlier dwarfs the in-cluster spread
    assert by_label[0][0]["d2"] > 100 * by_label[0][1]["d2"]
