"""Streaming quality gate: per-batch quarantine split must carry the batch
gate's exact decisions across micro-batch boundaries, and the per-batch
overwrite must make replays idempotent."""

from __future__ import annotations

import json

from prueba_tecnica_http_client_etl_spark.streaming import quality_stream as QS


def _doc(doc_id, text, lang="en", source="unit"):
    return {"doc_id": doc_id, "text": text, "lang": lang, "source": source}


def _write_batches(tmp_path):
    d = tmp_path / "docs_in"
    d.mkdir()
    long_ok = " ".join(f"w{i}" for i in range(40))  # 40 distinct tokens: keep
    repeat = " ".join(["dup"] * 40)  # low diversity: drop
    short = "too short"  # < MIN_TOKENS: drop
    (d / "a.jsonl").write_text("\n".join(json.dumps(r) for r in [
        _doc(1, long_ok), _doc(2, short)]))
    (d / "b.jsonl").write_text("\n".join(json.dumps(r) for r in [
        _doc(3, repeat), _doc(4, long_ok + " extra tail words here"),
        # round-12 review: a raw-JSONL doc with a MISSING text field must
        # quarantine as too_short, never sail through as 'ok' (null text
        # made every threshold NULL and fell to the otherwise branch)
        {"doc_id": 5, "lang": "en", "source": "unit"}]))
    return d


def test_cross_batch_decisions_match_batch_gate(spark, tmp_path):
    d = _write_batches(tmp_path)
    out = QS.run_quality_quarantine(
        spark,
        str(d),
        str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[1].decision == "keep" and rows[1].reason == "ok"
    assert rows[2].decision == "drop" and rows[2].reason == "too_short"
    assert rows[3].decision == "drop" and rows[3].reason == "low_diversity"
    assert rows[4].decision == "keep"
    assert rows[5].decision == "drop" and rows[5].reason == "too_short"
    # batch gate parity: _scored on the same static frame gives identical rows
    static = spark.createDataFrame(
        [(i, t.get("text"), t["lang"], t["source"]) for i, t in
         ((r["doc_id"], r) for r in map(json.loads, (
             line for f in sorted(d.iterdir()) for line in f.read_text().splitlines()))) ],
        "doc_id long, text string, lang string, source string",
    )
    batch_rows = {r.doc_id: r for r in QS._scored(static).collect()}
    for i in rows:
        assert (rows[i].decision, rows[i].reason) == (
            batch_rows[i].decision, batch_rows[i].reason)
    # both layers partitioned by discovered batch_id; the two files landed
    # in different micro-batches
    assert out.select("batch_id").distinct().count() >= 2
    # round-12 verdict item 4: the read-back union carries no global sort
    # (every consumer compares order-independently)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan


def test_quarantine_replay_is_idempotent(spark, tmp_path):
    """Re-running the drained stream over the same input+checkpoint adds
    no new batches and leaves the layer contents unchanged (per-batch
    overwrite + checkpoint dedupe = effectively exactly-once)."""
    d = _write_batches(tmp_path)
    kwargs = dict(checkpoint=str(tmp_path / "ckpt"), one_file_per_batch=True)
    first = QS.run_quality_quarantine(spark, str(d), str(tmp_path / "out"), **kwargs)
    n1 = first.count()
    again = QS.run_quality_quarantine(spark, str(d), str(tmp_path / "out"), **kwargs)
    assert again.count() == n1
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, first.collect()))
