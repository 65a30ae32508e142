"""In-engine quality-classifier training (greedy decision-list
distillation of the rule gate): the exact split search must recover the
gate's own thresholds from labels alone, the per-step accounting must be
internally consistent, and the served learned gate must agree with the
rule gate except at integer-grid boundary docs. Engine parity is covered
by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from prueba_tecnica_http_client_etl_spark.operators import curation as Cu

from tests.conftest import SF_SMOKE


def test_trainer_recovers_gate_thresholds(spark):
    """The gate's labels are threshold rules on these features; the
    split search must find cuts EQUIVALENT to them on the integer grid
    (measured: dr_s < 350, n_tokens < 24, sr_s > 120 — the gate's exact
    constants scaled by QT_RATIO_SCALE)."""
    rows = {r["feature"]: r for r in Cu.quality_train(spark, SF_SMOKE).collect()}
    assert set(rows) == {"n_tokens", "dr_s", "sr_s"}
    assert rows["n_tokens"]["direction"] == "lt"
    assert rows["n_tokens"]["threshold"] == Cu.MIN_TOKENS
    assert rows["dr_s"]["direction"] == "lt"
    assert rows["dr_s"]["threshold"] == int(Cu.MIN_DISTINCT_RATIO * Cu.QT_RATIO_SCALE)
    assert rows["sr_s"]["direction"] == "gt"
    assert rows["sr_s"]["threshold"] == int(Cu.MAX_STOPWORD_RATIO * Cu.QT_RATIO_SCALE)


def test_training_accounting_is_consistent(spark):
    rows = sorted(Cu.quality_train(spark, SF_SMOKE).collect(), key=lambda r: r["step"])
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    prev_correct = -1
    for r in rows:
        assert r["net"] == r["n_fired_drop"] - r["n_fired_keep"] > 0
        # each accepted step strictly improves training accuracy
        assert r["n_correct"] > prev_correct
        prev_correct = r["n_correct"]
        assert 0.0 < r["accuracy"] <= 1.0


def test_learned_gate_agreement(spark):
    out = Cu.quality_gate_learned(spark, SF_SMOKE).collect()
    assert len(out) == 500
    disagree = [r for r in out if not r["agree"]]
    # distillation is near-perfect; the residue is the integer-grid
    # boundary (scaled ratio cannot represent the double threshold)
    assert len(disagree) <= 3, [r["doc_id"] for r in disagree]
    for r in out:
        assert r["agree"] == (r["rule_decision"] == r["learned_decision"])
        if r["learned_decision"] == "keep":
            assert r["learned_reason"] == "ok"
        else:
            assert r["learned_reason"] in {"n_tokens", "dr_s", "sr_s"}
