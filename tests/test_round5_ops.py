"""Semantic and plan-shape checks for the round-5 operators:
bpe_pair_counts (tokenizer-training bigram pass), domain_mixture_plan
(temperature-weighted source sampling), and dedup_survivors
(quality-aware duplicate-cluster survivor selection) — the invariants the
oracle hash can't see (tests/test_oracle_parity.py covers value parity).
"""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMOKE


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_pair_counts_is_take_ordered_and_consistent(spark):
    from prueba_tecnica_http_client_etl_spark.operators.corpus import (
        BPE_PAIR_TOPK,
        bpe_pair_counts,
    )

    df = bpe_pair_counts(spark, SF_SMOKE)
    # top-k must be per-partition heaps + driver merge, never a global sort
    assert "TakeOrderedAndProject" in _physical(df), _physical(df)
    rows = df.collect()
    assert 0 < len(rows) <= BPE_PAIR_TOPK
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.n_docs <= r.n_occurrences for r in rows)
    # a pair occurs at most (occurrences of its left unigram) times
    from prueba_tecnica_http_client_etl_spark.operators.corpus import vocab_topk

    uni = {r.tok: r.n_occurrences for r in vocab_topk(spark, SF_SMOKE).collect()}
    for r in rows:
        if r.pair_left in uni:
            assert r.n_occurrences <= uni[r.pair_left], r


def test_domain_mixture_plan_distributions_and_monotonicity(spark):
    from prueba_tecnica_http_client_etl_spark.operators.corpus import domain_mixture_plan

    rows = domain_mixture_plan(spark, SF_SMOKE).collect()
    assert rows, "empty plan"
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.temp_weight for r in rows) - 1.0) < 1e-4
    # temperature flattens the distribution: smaller raw share => larger
    # oversampling factor, up to the floor(sqrt) step granularity
    # (w = floor(sqrt(T)) makes near-equal sources tie unpredictably)
    by_share = sorted(rows, key=lambda r: r.tokens_total)
    factors = [r.sampling_factor for r in by_share]
    for earlier, later in zip(factors, factors[1:]):
        assert earlier >= later - 0.02, factors
    assert factors[0] > factors[-1], factors
    # mass conservation: temp_weight == sampling_factor * raw_share (to rounding)
    for r in rows:
        assert abs(r.temp_weight - r.sampling_factor * r.raw_share) < 5e-4, r


def test_dedup_survivors_one_keeper_per_cluster_best_score(spark):
    from prueba_tecnica_http_client_etl_spark.operators.curation import dedup_survivors
    from prueba_tecnica_http_client_etl_spark.operators.dedup import dedup_components

    rows = dedup_survivors(spark, SF_SMOKE).collect()
    assert rows, "no clusters at smoke scale — fixture drift"
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.component_id].append(r)
    for cid, members in clusters.items():
        keepers = [m for m in members if m.decision == "keep"]
        assert len(keepers) == 1, (cid, members)
        best = max(members, key=lambda m: (m.score, -m.doc_id))
        assert keepers[0].doc_id == best.doc_id, (cid, keepers[0], best)
        assert all(m.n_members == len(members) for m in members)
    # every clustered doc gets a decision: the member set IS the
    # components output
    comp_ids = {r.doc_id for r in dedup_components(spark, SF_SMOKE).collect()}
    assert {r.doc_id for r in rows} == comp_ids
