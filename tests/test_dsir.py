"""Semantic checks for dsir_importance beyond the oracle-parity hash:
docs sharing the target slice's n-gram distribution must score above
docs from a disjoint distribution, and the model must be the bounded
B-row table the 100 TB argument rests on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.corpus import (
    DSIR_BUCKETS,
    DSIR_TARGET_SOURCES,
    dsir_importance,
    dsir_model,
)

TGT = DSIR_TARGET_SOURCES[0]


@pytest.fixture()
def dsir_corpus_dir(spark, tmp_path):
    """Target slice (source in DSIR_TARGET_SOURCES) repeats phrase
    inventory A. The raw slice holds docs built from A (target-like)
    and docs built from a disjoint inventory B (off-target)."""
    a_phrases = [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine every single day",
    ]
    b_phrases = [
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
        "sed do eiusmod tempor incididunt ut labore et dolore",
    ]
    rows = []
    doc_id = 1
    for rep in range(6):
        for p in a_phrases:
            rows.append((doc_id, p, "en", TGT))
            doc_id += 1
    target_like = [(doc_id + i, a_phrases[i % 2], "en", "rawsrc") for i in range(4)]
    doc_id += 4
    off_target = [(doc_id + i, b_phrases[i % 2], "en", "rawsrc") for i in range(4)]
    rows += target_like + off_target
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df = df.withColumn("n_chars", F.length("text"))
    d = tmp_path / "dsir_sf"
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    yield str(d), [r[0] for r in target_like], [r[0] for r in off_target]
    drain()


def test_dsir_ranks_target_like_above_off_target(spark, dsir_corpus_dir):
    sf_dir, target_like, off_target = dsir_corpus_dir
    out = {r["doc_id"]: r for r in dsir_importance(spark, sf_dir).collect()}
    # every raw doc is scored, target docs are not
    assert set(out) == set(target_like) | set(off_target)
    worst_like = min(out[d]["avg_bits"] for d in target_like)
    best_off = max(out[d]["avg_bits"] for d in off_target)
    assert worst_like > best_off, (
        f"target-like floor {worst_like} should beat off-target ceiling {best_off}"
    )
    # target-like docs carry positive log weight (their grams dominate
    # the target model); disjoint-inventory docs are pulled negative by
    # the raw-model mass they alone carry
    assert all(out[d]["log2_w"] > 0 for d in target_like)


def test_dsir_model_is_bounded(spark, dsir_corpus_dir):
    """The scale story: the model is <= DSIR_BUCKETS rows no matter the
    corpus, every bucket in range, and totals are consistent with one
    count per feature occurrence."""
    sf_dir, _, _ = dsir_corpus_dir
    rows = dsir_model(spark, sf_dir).collect()
    assert len(rows) <= DSIR_BUCKETS
    assert all(0 <= r["b"] < DSIR_BUCKETS for r in rows)
    assert all(r["ct"] >= 0 and r["cq"] >= 0 and r["ct"] + r["cq"] > 0 for r in rows)
