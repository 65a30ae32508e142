"""Prefix-filtered set-similarity join: losslessness (byte-equality with
the unfiltered operator) and the posting-volume reduction the filter
exists for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.dedup import (
    _prefix_postings,
    dedup_jaccard_prefix,
    dedup_ngram_jaccard,
    docs_normalized,
)


def test_prefix_filter_is_lossless(spark):
    """The PPJoin prefix + length filters may only prune candidates that
    cannot reach the threshold: verified output must be byte-identical
    to the unfiltered set-similarity join. Run at sf0.1 so real
    near-dup pairs exercise the equality."""
    sf = "/root/testdata/sf0.1"
    full = dedup_ngram_jaccard(spark, sf).collect()
    pref = dedup_jaccard_prefix(spark, sf).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, pref))
    assert len(full) > 0


def test_prefix_posting_table_is_smaller_without_ranking_shuffle(spark):
    """The point of the filter: fewer posting rows enter the pair join.
    At t=0.2 the prefix keeps ~(1 - t) of each doc's shingles. The
    ranking itself must be per-row array arithmetic — no Window (i.e.
    no posting shuffle+sort) anywhere in the prefix selection plan."""
    sf = "/root/testdata/sf0.01"
    base = docs_normalized(spark, sf).select("lang", "doc_id", "sh").withColumn(
        "n", F.size("sh")
    )
    full_postings = base.select(F.explode_outer("sh")).count()
    prefix = _prefix_postings(base)
    prefix_postings = prefix.count()
    assert prefix_postings < full_postings
    # ~80% retained at t=0.2 (+1 slack per doc for the ceil)
    assert prefix_postings / full_postings < 0.9
    plan = prefix._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


# --- pure-model property: the prefix-filter lemma itself ---------------------

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from prueba_tecnica_http_client_etl_spark.operators.dedup import NGRAM_T_DEN, NGRAM_T_NUM

_set = st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=40)
_T = Fraction(NGRAM_T_NUM, NGRAM_T_DEN)


def _prefix(s, order):
    """EXACT integer prefix length — the formula the operator uses
    (integer arithmetic, immune to the float-ceil boundary artifact
    test_prefix_length_boundary_is_exact demonstrates)."""
    ordered = sorted(s, key=lambda e: (order(e), e))
    n = len(s)
    keep = n - (n * NGRAM_T_NUM + NGRAM_T_DEN - 1) // NGRAM_T_DEN + 1
    return set(ordered[:keep])


@given(a=_set, b=_set, seed=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=400, deadline=None)
def test_prefix_lemma_model(a, b, seed):
    """Model check of the losslessness argument on random sets and a
    random-but-consistent global order: whenever J(A,B) >= t (exact
    rational comparison), the two prefixes share an element AND the
    integer cross-multiplied length filter passes — so the Spark/SQL
    candidate generation cannot drop a qualifying pair."""
    import hashlib

    def order(e):
        return hashlib.md5(f"{seed}:{e}".encode()).hexdigest()

    if Fraction(len(a & b), len(a | b)) >= _T:
        assert _prefix(a, order) & _prefix(b, order), (sorted(a), sorted(b))
        assert min(len(a), len(b)) * NGRAM_T_DEN >= max(len(a), len(b)) * NGRAM_T_NUM


def test_prefix_length_boundary_is_exact():
    """The integer prefix-length formula must equal the exact rational
    ceiling for every set size. A float ceil(t*n) is one ulp away from
    under-keeping the prefix at exact multiples of the threshold —
    t=1/5 happens to round safely at every realistic n, but e.g. t=9/14
    at n=42 does not (the product floats to 27.000000000000004, ceil 28,
    exact 27), so the operator must not owe its losslessness to
    per-threshold rounding luck."""
    import math

    for n in range(1, 5000):
        exact_ceil = -(-n * NGRAM_T_NUM // NGRAM_T_DEN)
        assert (n * NGRAM_T_NUM + NGRAM_T_DEN - 1) // NGRAM_T_DEN == exact_ceil
    # the float failure mode this formula avoids, at a nearby threshold:
    assert math.ceil((9 / 14) * 42) == 28 and -(-42 * 9 // 14) == 27


def test_hot_shingle_pair_volume_reduction(spark):
    """Adversarial hot-shingle corpus: 40 otherwise-disjoint docs share
    one boilerplate shingle ('all rights reserved', whose global 'pf:'
    hash sits at the 0.96 quantile — above every doc's (1-t)=0.8 keep
    quantile, so the prefix drops it from EVERY doc). The unfiltered
    posting join generates all 40*39/2 pairs through it; the prefix
    join must generate (near) none. This pins the rank mechanism the
    operator docstring describes: relief is total for high-ranking hot
    shingles, absent for low-ranking ones, (1-t)^2 in expectation.
    (Verified outputs agree trivially — no pair reaches the threshold —
    so the candidate volume IS the measurable difference.)"""
    from prueba_tecnica_http_client_etl_spark.functions import textprep as tp
    from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain, managed_persist

    n_docs = 40
    boiler = "all rights reserved"  # u60('pf:...') at the 0.96 quantile
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(20)) + " " + boiler)
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = managed_persist(
        docs.withColumn("norm", F.expr(tp.SPARK_NORM))
        .withColumn("toks", F.expr(tp.SPARK_TOKS))
        .withColumn("sh", F.expr(tp.SPARK_SHINGLES))
        .withColumn("lang", F.lit("en"))
        .select("lang", "doc_id", "sh")
        .withColumn("n", F.size("sh"))
    )
    try:
        full_pairs = (
            base.select("lang", "doc_id", F.explode_outer("sh").alias("s"))
            .alias("a")
            .join(
                base.select("lang", "doc_id", F.explode_outer("sh").alias("s")).alias("b"),
                ["lang", "s"],
            )
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id"), F.col("b.doc_id"))
            .distinct()
            .count()
        )
        prefix = _prefix_postings(base)
        pref_pairs = (
            prefix.alias("a")
            .join(prefix.alias("b"), ["lang", "s"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id"), F.col("b.doc_id"))
            .distinct()
            .count()
        )
        assert full_pairs == n_docs * (n_docs - 1) // 2
        # the 0.96-quantile shingle is out of every 0.8-quantile prefix;
        # filler shingles are doc-unique, so (near) zero pairs remain
        assert pref_pairs < 0.2 * full_pairs, (pref_pairs, full_pairs)
    finally:
        drain()
