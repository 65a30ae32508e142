"""Bloom-prescreened decontamination: the prescreen must be LOSSLESS
(byte-equality with the exact check — a Bloom filter has no false
negatives, and false positives are removed by the exact verify join),
the bitmap must be session-memoized trained state, and the prescreen
must sit below the exact join in the physical plan.
"""

from __future__ import annotations

from prueba_tecnica_http_client_etl_spark.functions import artifacts as A
from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.curation import (
    contamination_bloom,
    contamination_check,
)
from tests.conftest import SF_SMOKE


def test_prescreen_is_lossless(spark):
    A.clear()
    drain()
    got = sorted(tuple(r) for r in contamination_bloom(spark, SF_SMOKE).collect())
    drain()
    want = sorted(tuple(r) for r in contamination_check(spark, SF_SMOKE).collect())
    assert got == want and len(got) > 0
    drain()


def test_bitmap_is_memoized_trained_state(spark):
    A.clear()
    drain()
    contamination_bloom(spark, SF_SMOKE).collect()
    from prueba_tecnica_http_client_etl_spark.operators import curation as Cu

    key = A.artifact_key(
        f"contamination_bloom_bitmap_m{Cu.BLOOM_BITS_LOG2}_k{Cu.BLOOM_K}",
        spark,
        SF_SMOKE,
        "documents",
    )
    assert key in A._STORE
    stored = A._STORE[key]
    n = len(A._STORE)
    drain()
    contamination_bloom(spark, SF_SMOKE).collect()
    assert A._STORE[key] is stored and len(A._STORE) == n
    A.clear()
    drain()


def test_prescreen_filter_sits_below_exact_join(spark):
    """The plan must test the broadcast bitmap (shiftright + element_at
    over the checkpointed 1-row array) BEFORE the probe-gram join — the
    whole point is that non-contaminated grams die map-side without
    ever probing the gram-string relation."""
    plan = (
        contamination_bloom(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "shiftright" in plan and "element_at" in plan, plan
    # the bitmap filter appears strictly below (after, in the printed
    # tree) the join that brings in the probe grams on 'gram'
    join_at = plan.index("Join")
    assert plan.index("shiftright") > join_at, plan
    A.clear()
    drain()


def test_losslessness_survives_a_saturated_filter(spark, monkeypatch):
    """Adversarial FP pressure: shrink the filter to 64 bits / 1 hash so
    false positives actually flow through the prescreen in volume — the
    output must STILL be byte-equal to the exact check (the verify join
    removes every FP), and the geometry-keyed artifact must not collide
    with the production-geometry bitmap cached by other tests."""
    from prueba_tecnica_http_client_etl_spark.operators import curation as Cu

    A.clear()
    drain()
    want = sorted(tuple(r) for r in contamination_check(spark, SF_SMOKE).collect())
    drain()
    monkeypatch.setattr(Cu, "BLOOM_BITS_LOG2", 6)
    monkeypatch.setattr(Cu, "BLOOM_K", 1)
    got = sorted(tuple(r) for r in Cu.contamination_bloom(spark, SF_SMOKE).collect())
    assert got == want
    tiny_key = A.artifact_key(
        "contamination_bloom_bitmap_m6_k1", spark, SF_SMOKE, "documents"
    )
    assert tiny_key in A._STORE
    # the tiny filter really is saturated (near-every word nonzero),
    # i.e. this test exercised genuine FP pass-throughs
    [row] = A._STORE[tiny_key].collect()
    assert sum(1 for w in row["bf"] if w != 0) >= 1
    A.clear()
    drain()
