"""Streaming PII scrub: multi-batch output must be byte-equal to the
one-shot batch scrub (pii_scrub), and replay must be idempotent — the
decomposability contract the registry oracle relies on. Also pins the
scale shape: the per-batch plan is a pure JVM projection (no Python
eval, no shuffle, no global sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.curation import pii_scrub
from prueba_tecnica_http_client_etl_spark.streaming.pii_stream import (
    _dirtied_batch,
    run_pii_scrub,
)
from tests.conftest import SF_SMOKE

COLS = ["doc_id", "n_emails", "n_phones", "n_ips", "redacted_fp", "n_chars_clean"]


def _stage_docs(spark, tmp_path, n_files=4):
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    path = str(tmp_path / "docs")
    (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .repartition(n_files)
        .write.mode("overwrite")
        .json(path)
    )
    return path


def test_multi_batch_scrub_equals_batch_scrub(spark, tmp_path):
    """one_file_per_batch forces >1 micro-batch; the scrubbed union must
    still be byte-identical to pii_scrub's one-shot output — counts and
    redaction are per-doc pure functions of the document row."""
    inp = _stage_docs(spark, tmp_path)
    out = run_pii_scrub(
        spark,
        inp,
        str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(tuple(r) for r in out.select(*COLS).collect())
    want = sorted(tuple(r) for r in pii_scrub(spark, SF_SMOKE).collect())
    assert got == want and len(got) > 0
    # the fixture must exercise every redaction class end-to-end
    by_kind = out.agg(
        F.sum("n_emails"), F.sum("n_phones"), F.sum("n_ips")
    ).first()
    assert all(v > 0 for v in by_kind), by_kind


def test_replay_is_idempotent(spark, tmp_path):
    """A second availableNow run over the same input and a FRESH
    checkpoint must converge to identical scrub files (foreachBatch
    overwrites its batch_id partition)."""
    inp = _stage_docs(spark, tmp_path)
    out1 = run_pii_scrub(
        spark, inp, str(tmp_path / "o1"), checkpoint=str(tmp_path / "c1")
    )
    rows1 = sorted(tuple(r) for r in out1.drop("batch_id").collect())
    out2 = run_pii_scrub(
        spark, inp, str(tmp_path / "o1"), checkpoint=str(tmp_path / "c2")
    )
    rows2 = sorted(tuple(r) for r in out2.drop("batch_id").collect())
    assert rows1 == rows2


def test_per_batch_plan_is_map_side_only(spark):
    """The per-batch scrub must stay a single JVM projection: no
    BatchEvalPython (row-at-a-time Python), no Exchange (shuffle), no
    range-partitioned sort — the shape that makes the front-door gate
    embarrassingly parallel at any scale."""
    from prueba_tecnica_http_client_etl_spark.operators.curation import scrub_pii_docs
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    batch = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    df = scrub_pii_docs(_dirtied_batch(batch), ordered=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
