"""Streaming DSIR gate: multi-batch importance weights must be
byte-equal to the one-shot batch selector (dsir_importance), and replay
must be idempotent — the decomposability contract the registry oracle
relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.corpus import (
    DSIR_TARGET_SOURCES,
    dsir_importance,
    dsir_model,
    dsir_totals,
)
from prueba_tecnica_http_client_etl_spark.streaming.dsir_stream import run_dsir_score
from tests.conftest import SF_SMOKE


def _stage_raw(spark, tmp_path, n_files=4):
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    path = str(tmp_path / "raw")
    (
        load_table(spark, SF_SMOKE, "documents")
        .filter(~F.col("source").isin(*DSIR_TARGET_SOURCES))
        .select("doc_id", "text")
        .repartition(n_files)
        .write.mode("overwrite")
        .json(path)
    )
    return path


def test_multi_batch_weights_equal_batch_selector(spark, tmp_path):
    """one_file_per_batch forces >1 micro-batch; the weight union must
    still be byte-identical to dsir_importance's one-shot output — the
    weights are per-doc functions of the FROZEN model only."""
    model = dsir_model(spark, SF_SMOKE)
    inp = _stage_raw(spark, tmp_path)
    out = run_dsir_score(
        spark,
        inp,
        str(tmp_path / "out"),
        model=model,
        totals=dsir_totals(model),
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(tuple(r) for r in out.select("doc_id", "n_feat", "log2_w", "avg_bits").collect())
    want = sorted(tuple(r) for r in dsir_importance(spark, SF_SMOKE).collect())
    assert got == want
    drain()


def test_multi_batch_selection_equals_batch_sampler(spark, tmp_path):
    """The streaming SELECTION gate: scored + plan-filtered per
    micro-batch, the kept union must be byte-identical to the one-shot
    dsir_sample — keep/drop is a per-doc function of the FROZEN
    (model, plan) only, and no rejected doc may leak through."""
    from prueba_tecnica_http_client_etl_spark.operators.corpus import (
        dsir_accept_plan,
        dsir_sample,
    )
    from prueba_tecnica_http_client_etl_spark.streaming.dsir_stream import run_dsir_sample

    model = dsir_model(spark, SF_SMOKE)
    inp = _stage_raw(spark, tmp_path)
    out = run_dsir_sample(
        spark,
        inp,
        str(tmp_path / "out"),
        model=model,
        totals=dsir_totals(model),
        plan=dsir_accept_plan(spark, SF_SMOKE),
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(tuple(r) for r in out.select("doc_id", "log2_w", "accept_num").collect())
    want = sorted(tuple(r) for r in dsir_sample(spark, SF_SMOKE).collect())
    assert got == want
    # and the gate actually rejects: kept is a strict subset of scored
    assert len(got) < dsir_importance(spark, SF_SMOKE).count()
    drain()


def test_replay_is_idempotent(spark, tmp_path):
    """A second availableNow run over the same input and a FRESH
    checkpoint must converge to the identical score files (foreachBatch
    overwrites its batch_id partition)."""
    model = dsir_model(spark, SF_SMOKE)
    inp = _stage_raw(spark, tmp_path)
    kw = dict(model=model, totals=dsir_totals(model))
    out1 = run_dsir_score(
        spark, inp, str(tmp_path / "o1"), checkpoint=str(tmp_path / "c1"), **kw
    )
    rows1 = sorted(tuple(r) for r in out1.drop("batch_id").collect())
    out2 = run_dsir_score(
        spark, inp, str(tmp_path / "o1"), checkpoint=str(tmp_path / "c2"), **kw
    )
    rows2 = sorted(tuple(r) for r in out2.drop("batch_id").collect())
    assert rows1 == rows2
    drain()
