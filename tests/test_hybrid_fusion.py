"""Hybrid retrieval fusion (RRF over the sparse and dense tiers): the
scaled-integer RRF arithmetic must be exact (no float division anywhere
in the ordering), the fused scores must equal the sum of the legs'
contributions recomputed independently, and both-leg agreement must
dominate equal single-leg ranks. Engine parity is covered by
tests/test_oracle_parity.py.
"""

from __future__ import annotations

from prueba_tecnica_http_client_etl_spark.operators import textops as T

from tests.conftest import SF_SMOKE


def test_rrf_scale_is_exact_for_every_rank():
    for r in range(1, T.HYBRID_TOPK + 1):
        assert T.HYBRID_RRF_SCALE % (T.HYBRID_RRF_K0 + r) == 0
    # and the worst-case fused score stays far inside BIGINT
    assert 2 * (T.HYBRID_RRF_SCALE // (T.HYBRID_RRF_K0 + 1)) < 2**62


def test_fused_scores_equal_recomputed_leg_contributions(spark):
    from prueba_tecnica_http_client_etl_spark.operators.similarity import (
        QUERY_STRIDE,
        ann_ivfpq_rerank,
    )

    def contrib(rank: int) -> int:
        return T.HYBRID_RRF_SCALE // (T.HYBRID_RRF_K0 + rank)

    dense = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in ann_ivfpq_rerank(spark, SF_SMOKE).collect()
    }
    sparse = {
        (r["doc_id"], r["neighbor_id"]): r["rank"]
        for r in T.sparse_doc_knn_approx(spark, SF_SMOKE).collect()
        if r["doc_id"] % QUERY_STRIDE == 0
    }
    expected: dict[tuple, list] = {}
    for key, rank in dense.items():
        expected.setdefault(key, []).append(contrib(rank))
    for key, rank in sparse.items():
        expected.setdefault(key, []).append(contrib(rank))

    fused = T.hybrid_doc_topk(spark, SF_SMOKE).collect()
    assert fused, "fusion produced no rows"
    for r in fused:
        key = (r["doc_id"], r["neighbor_id"])
        assert key in expected
        assert r["rrf_num"] == sum(expected[key]), key
        assert r["n_legs"] == len(expected[key]), key
    # per-query ordering: rrf_num non-increasing with rank
    by_q: dict[int, list] = {}
    for r in fused:
        by_q.setdefault(r["doc_id"], []).append((r["rank"], r["rrf_num"]))
    for q, rows in by_q.items():
        rows.sort()
        nums = [n for _, n in rows]
        assert nums == sorted(nums, reverse=True), q
    # agreement dominance at this K0/TOPK geometry: a neighbor both legs
    # rank LAST (2/(K0+10)) still outscores one a single leg ranks FIRST
    # (1/(K0+1)) — 2/70 > 1/61 in exact integers
    assert 2 * contrib(T.HYBRID_TOPK) > contrib(1)
