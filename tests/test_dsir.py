"""Semantic checks for dsir_importance beyond the oracle-parity hash:
docs sharing the target slice's n-gram distribution must score above
docs from a disjoint distribution, and the model must be the bounded
B-row table the 100 TB argument rests on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import hashlib

from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.corpus import (
    DSIR_BUCKETS,
    DSIR_TARGET_SOURCES,
    dsir_importance,
    dsir_model,
    dsir_resample_plan,
    dsir_sample,
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


def test_dsir_sample_is_the_plan_applied(spark, dsir_corpus_dir):
    """dsir_sample must be EXACTLY the resample plan's Bernoulli rule —
    recomputed here from first principles (python md5, no Spark
    expressions): keep doc d iff
    u60('dsirsmp:' + doc_id) mod 2^sb < accept_num[log2_w(d)]."""
    sf_dir, _, _ = dsir_corpus_dir
    scores = {r["doc_id"]: r["log2_w"] for r in dsir_importance(spark, sf_dir).collect()}
    plan = {r["log2_w"]: r for r in dsir_resample_plan(spark, sf_dir).collect()}
    n_total = sum(r["n_docs"] for r in plan.values())
    sb = min(40, 62 - n_total.bit_length())
    expected = set()
    for d, lw in scores.items():
        draw = int(hashlib.md5(f"dsirsmp:{d}".encode()).hexdigest()[:15], 16) % (1 << sb)
        if draw < plan[lw]["accept_num"]:
            expected.add(d)
    out = dsir_sample(spark, sf_dir).collect()
    assert {r["doc_id"] for r in out} == expected
    # waterfilling semantics carried through: at-or-above-threshold
    # buckets keep every doc (accept_num == 2^sb), and the per-row
    # accept_num column matches the doc's bucket in the plan
    thr = next(iter(plan.values()))["threshold_log2"]
    kept = {r["doc_id"] for r in out}
    assert {d for d, lw in scores.items() if lw >= thr} <= kept
    assert all(r["accept_num"] == plan[r["log2_w"]]["accept_num"] for r in out)
    # the plan's own budget contract: expected kept never exceeds target
    exp_total = sum(r["n_docs"] * r["accept_num"] for r in plan.values()) / (1 << sb)
    assert exp_total <= n_total // 4 + 1e-9


def test_dsir_waterfill_oracle_grid_covers_observed_spread(spark):
    """Round-11 ADVICE: SQL_DSIR_RESAMPLE_PLAN's DuckDB twin uses a
    fixed range(0, 4096) candidate grid (DuckDB's range() cannot take
    lateral column endpoints) while Spark sizes the grid from the data
    as sequence(l_min, l_max + 64) — they silently diverge if the
    log2_w spread ever exceeds 4096 - 64. Guard the precondition on
    every corpus the oracle actually runs against (the sf0.01 gate and
    the sf0.1 parity-sweep scale)."""
    from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain

    for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        lo, hi = (
            dsir_importance(spark, sf).agg(F.min("log2_w"), F.max("log2_w")).first()
        )
        assert hi - lo + 64 < 4096, f"{sf}: spread {hi - lo} outgrew the oracle grid"
        drain()


def test_dsir_model_is_bounded(spark, dsir_corpus_dir):
    """The scale story: the model is <= DSIR_BUCKETS rows no matter the
    corpus, every bucket in range, and totals are consistent with one
    count per feature occurrence."""
    sf_dir, _, _ = dsir_corpus_dir
    rows = dsir_model(spark, sf_dir).collect()
    assert len(rows) <= DSIR_BUCKETS
    assert all(0 <= r["b"] < DSIR_BUCKETS for r in rows)
    assert all(r["ct"] >= 0 and r["cq"] >= 0 and r["ct"] + r["cq"] > 0 for r in rows)


def test_dsir_select_handles_unseen_weight_buckets(spark):
    """Round-12 ADVICE: a doc whose weight bucket did not exist at
    plan-build time must NOT be silently inner-joined away. Unseen
    buckets evaluate the same total acceptance rule against the frozen
    (threshold_log2, sb): above threshold -> kept with probability 1;
    more than sb doubling-steps below -> acceptance 0."""
    from prueba_tecnica_http_client_etl_spark.operators.corpus import (
        _waterfill_plan,
        dsir_select_docs,
    )

    w = spark.createDataFrame(
        [(0, 40), (3, 8), (6, 2)], "log2_w long, n_docs long"
    )
    plan = _waterfill_plan(w, keep_sb=True).select(
        "log2_w", "accept_num", "sb", "threshold_log2"
    )
    row = plan.first()
    thr, sb = int(row.threshold_log2), int(row.sb)

    above = thr + 7  # unseen, above threshold: keep-all
    below = thr - sb - 5  # unseen, beyond the dyadic range: drop-all
    scores = spark.createDataFrame(
        [(i, above) for i in range(1, 21)] + [(100 + i, below) for i in range(1, 21)],
        "doc_id long, log2_w long",
    )
    kept = dsir_select_docs(scores, plan).collect()
    assert sorted(r.doc_id for r in kept) == list(range(1, 21))
    assert all(r.accept_num == (1 << sb) for r in kept)
    # and seen buckets keep behaving exactly as the frozen plan says
    seen = spark.createDataFrame([(500, 6)], "doc_id long, log2_w long")
    got = dsir_select_docs(seen, plan).collect()
    plan_6 = {r.log2_w: r.accept_num for r in plan.collect()}[6]
    assert [r.accept_num for r in got] in ([], [plan_6])
