"""Relative hot-band-value valve for the perceptual Hamming tiers
(operators/multimodal.py banded_hot_values): on an adversarial corpus
where >60% of items hash identically (black frames), every band bucket
they share must be refused before pair generation, genuine near-dups
outside the hot buckets must survive, the audit counters must be exact,
and the recall gate must PRICE the refusal instead of hiding it. The
threshold is relative (max(floor, 8x uniform expectation)) because
14-bit band buckets grow linearly with the corpus by design — a fixed
cap would eventually drop every bucket at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401  (fixture frames)

from prueba_tecnica_http_client_etl_spark.operators.multimodal import (
    _PH_BV_ABS_FLOOR,
    _band_recall_audit,
    _banded_hamming_pairs,
    _PH_HAMMING_K,
    banded_hot_values,
)

N_BLACK = 100  # identical-hash items, > _PH_BV_ABS_FLOOR
BLACK_HASH = 0
NEAR_A, NEAR_B = 200, 210  # both % 10 == 0 -> in the audit's probe stride
H_A = 0x2A5F3C19E7B44
H_B = H_A ^ 0b101  # Hamming 2, inside band 0 only


@pytest.fixture(scope="module")
def adversarial_sigs(spark):
    rows = [(d, BLACK_HASH) for d in range(N_BLACK)]
    rows += [(NEAR_A, H_A), (NEAR_B, H_B)]
    return spark.createDataFrame(rows, "doc_id long, phash long")


def test_hot_buckets_detected_with_relative_threshold(adversarial_sigs):
    hot = banded_hot_values(adversarial_sigs).collect()
    # all 4 bands of the black hash are 0 -> 4 hot buckets of N_BLACK
    # (+2 where the near pair's band value is also 0 — it is not)
    assert len(hot) == 4
    assert all(r["bv"] == 0 and r["bucket_size"] == N_BLACK for r in hot)
    assert N_BLACK > _PH_BV_ABS_FLOOR  # the fixture really is over the floor


def test_valved_pairs_refuse_black_bucket_keep_genuine(adversarial_sigs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in _banded_hamming_pairs(adversarial_sigs, _PH_HAMMING_K).collect()
    }
    assert pairs == {(NEAR_A, NEAR_B): 2}


def test_band_audit_prices_the_refusal_exactly(adversarial_sigs):
    [a] = _band_recall_audit(adversarial_sigs).collect()
    assert a["n_hot_buckets"] == 4
    assert a["n_docs_affected"] == N_BLACK
    assert a["n_pairs_dropped"] == 4 * N_BLACK * (N_BLACK - 1) // 2
    # truth (brute force over the probe stride) includes the black
    # pairs; found does not -> recall strictly below 1 and computed
    # against the full truth, never the post-valve truth
    assert a["n_true"] > a["n_found"]
    assert 0 < a["recall"] < 1.0
    # the genuine near pair is in both sides
    assert a["n_hits"] >= 1


def test_valve_inert_on_clean_corpus(spark):
    """At certification scale the threshold sits far above every
    natural bucket: zero hot buckets on the real signature artifacts
    (both modalities)."""
    from prueba_tecnica_http_client_etl_spark.operators.multimodal import (
        _audio_fp_sigs,
        _phash_sigs,
    )

    sf = "/root/testdata/sf0.001"
    assert banded_hot_values(_phash_sigs(spark, sf)).count() == 0
    assert banded_hot_values(_audio_fp_sigs(spark, sf)).count() == 0
