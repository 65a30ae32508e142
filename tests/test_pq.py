"""Product-quantization tier: structural invariants the oracle-parity
hash can't see — code-table shape, broadcast boundaries in the ADC scan,
and the ADC-vs-rerank quality ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cachepool import managed_persist
from prueba_tecnica_http_client_etl_spark.operators import similarity as S
from tests.conftest import SF_SMOKE


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_codes_table_is_m_rows_per_vector(spark):
    """Encoding must assign exactly one code per (vector, subspace): the
    compressed representation is PQ_M code ids per vector, nothing more
    (a duplicate assignment would silently double-count in ADC sums)."""
    emb = managed_persist(S._quantized(spark, SF_SMOKE))
    cb = S._pq_codebook(emb)
    n_vec = emb.count()
    # codebook: exactly PQ_M x PQ_K entries, code ids 1..PQ_K in each sub
    cb_rows = cb.groupBy("sub").agg(
        F.count(F.lit(1)).alias("n"), F.min("code_id").alias("lo"), F.max("code_id").alias("hi")
    ).collect()
    assert len(cb_rows) == S.PQ_M
    for r in cb_rows:
        assert (r.n, r.lo, r.hi) == (S.PQ_K, 1, S.PQ_K)
    # one assignment per (vec, sub)
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id", "sub").orderBy("d2", "code_id")
    codes = (
        S._pq_subspaces(emb, "vec_id")
        .join(F.broadcast(cb), "sub")
        .withColumn("d2", F.expr(S._SPARK_SUB_SQDIST))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    assert codes.count() == n_vec * S.PQ_M
    assert codes.select("vec_id", "sub").distinct().count() == n_vec * S.PQ_M


def test_adc_scan_broadcasts_small_sides(spark):
    """The corpus-sized codes table is scanned exactly once per ADC
    pass and never shuffled against a corpus-sized side. Vectorized
    default (round 14): the per-query LUTs ride a pool broadcast into
    one MapInPandas over the per-vector codes — no join at all, no
    nested-loop. Relational twin: the codebook and the per-query LUT
    are broadcast-hash sides, never a sort-merge join."""
    plan = _physical(S.ann_pq_topk(spark, SF_SMOKE))
    assert "MapInPandas" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan

    from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain, managed_persist

    emb = managed_persist(S._quantized(spark, SF_SMOKE))
    rel = _physical(S._pq_scored(spark, SF_SMOKE, emb, canonical=False, vectorized=False))
    # LUT and codebook joins broadcast; the corpus-sized nbh join may
    # legitimately sort-merge (two corpus-sized sides) — only a
    # cartesian degeneration is forbidden
    assert "BroadcastHashJoin" in rel, rel
    assert "CartesianProduct" not in rel, rel
    drain()


def test_rerank_recall_dominates_adc_recall(spark):
    """The exact re-rank can only repair ADC mistakes, never introduce
    them: per query, rerank recall >= pure-ADC recall (both against the
    same brute-force baseline)."""
    adc = {
        r.query_id: r.recall_at_10 for r in S.ann_pq_recall(spark, SF_SMOKE).collect()
    }
    rer = {
        r.query_id: r.recall_at_10 for r in S.ann_pq_rerank_recall(spark, SF_SMOKE).collect()
    }
    assert set(adc) == set(rer) and adc
    for qid in adc:
        assert rer[qid] >= adc[qid], (qid, adc[qid], rer[qid])


def test_rerank_scores_match_brute_force_on_overlap(spark):
    """Candidates the rerank and the brute-force baseline both emit must
    carry bit-identical cosines — the exact stage IS the brute-force
    arithmetic restricted to the candidate pool."""
    emb = managed_persist(S._quantized(spark, SF_SMOKE))
    exact = {
        (r.query_id, r.neighbor_id): r.cosine_p1
        for r in S.ann_cosine_topk(spark, SF_SMOKE, emb=emb).collect()
    }
    rer = S.ann_pq_rerank(spark, SF_SMOKE, emb=emb).collect()
    overlap = [r for r in rer if (r.query_id, r.neighbor_id) in exact]
    assert overlap, "no overlap between rerank and brute force top-10"
    for r in overlap:
        assert r.cosine_p1 == exact[(r.query_id, r.neighbor_id)]


def test_undersized_codebook_guard_fires_even_on_empty_seeds(spark):
    """The under-sized-codebook guard must fail loudly for a degenerate
    corpus — INCLUDING the worst case of zero seed rows, where a guard
    filtering the joined seed set would evaluate over zero rows and pass
    silently (round-8 ADVICE): the assertion rides on the always-1-row
    seed-count aggregate instead."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    emb = S._quantized(spark, SF_SMOKE)
    # strip every seed row (vec_id % PQ_CB_STRIDE == 0) -> 0 seeds
    no_seeds = emb.filter(F.col("vec_id") % S.PQ_CB_STRIDE != 0)
    with pytest.raises(SparkRuntimeException, match="under-sized"):
        S._pq_codebook(no_seeds).collect()
    # and the ordinary under-sized (nonzero but < PQ_K seeds) case
    few_seeds = emb.filter(F.col("vec_id") <= S.PQ_CB_STRIDE * 3)
    with pytest.raises(SparkRuntimeException, match="under-sized"):
        S._pq_codebook(few_seeds).collect()
