"""corpus_split: the no-leakage invariant and partition-independence the
oracle hash can't express directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.corpus import corpus_split, corpus_split_stats
from prueba_tecnica_http_client_etl_spark.operators.dedup import docs_normalized
from tests.conftest import SF_SMOKE


def test_exact_duplicates_never_straddle_splits(spark):
    """Every digest (normalized-text md5) must map to exactly one split:
    the leakage-safety property the digest keying exists for. Runs at
    sf0.1 — the smallest scale whose corpus actually contains duplicate
    texts, so the property is exercised rather than vacuous."""
    sf = "/root/testdata/sf0.1"
    manifest = corpus_split(spark, sf)
    d = docs_normalized(spark, sf).select("doc_id", F.md5(F.col("norm")).alias("digest"))
    joined = manifest.join(d, "doc_id")
    per_digest = joined.groupBy("digest").agg(F.countDistinct("split").alias("n_splits"))
    assert per_digest.filter(F.col("n_splits") > 1).count() == 0
    # duplicates DO exist at this scale, so the invariant is non-vacuous
    assert d.groupBy("digest").count().filter(F.col("count") > 1).count() > 0


def test_split_covers_every_doc_once(spark):
    manifest = corpus_split(spark, SF_SMOKE)
    docs = docs_normalized(spark, SF_SMOKE)
    assert manifest.count() == docs.count()
    assert manifest.select("doc_id").distinct().count() == docs.count()
    assert set(r.split for r in manifest.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }


def test_assignment_is_partition_independent(spark):
    """The split is a pure function of content: recomputing under a
    different partitioning yields byte-identical assignments."""
    a = {r.doc_id: r.split for r in corpus_split(spark, SF_SMOKE).collect()}
    b = {
        r.doc_id: r.split
        for r in corpus_split(spark, SF_SMOKE).repartition(7).collect()
    }
    assert a == b


def test_stats_shares_sum_to_one_and_sizes_are_sane(spark):
    rows = corpus_split_stats(spark, SF_SMOKE).collect()
    total_share = sum(r.token_share for r in rows)
    assert abs(total_share - 1.0) < 1e-4
    by = {r.split: r for r in rows}
    # train must dominate under the 90/5/5 configuration
    assert by["train"].n_docs > by.get("val", by["train"]).n_docs or "val" not in by
    for r in rows:
        assert r.n_texts <= r.n_docs
