"""Composed ingest admission gate stream: the micro-batch union must be
byte-equal to evaluating the whole arrival set at once (every column is
a per-doc pure function of frozen state), replay must be idempotent,
and the gate must actually discriminate (multiple verdicts/reasons and
both admission outcomes at the smoke scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.corpus import bpe_merge_list
from prueba_tecnica_http_client_etl_spark.operators.curation import (
    PROBE_STRIDE,
    bloom_trained_state,
)
from prueba_tecnica_http_client_etl_spark.operators.dedup import (
    INCREMENTAL_STRIDE,
    docs_normalized,
)
from prueba_tecnica_http_client_etl_spark.plans.lsh_index import build_lsh_index
from prueba_tecnica_http_client_etl_spark.schemas import load_table
from prueba_tecnica_http_client_etl_spark.streaming.ingest_gate_stream import (
    ingest_gate_batch,
    run_ingest_gate,
)
from tests.conftest import SF_SMOKE

PREFIX = "t_ingate_ix"


def _arrivals(spark):
    return load_table(spark, SF_SMOKE, "documents").filter(
        (F.col("doc_id") % INCREMENTAL_STRIDE == 0)
        & (F.col("doc_id") % PROBE_STRIDE != 0)
    )


def _frozen_state(spark):
    if not all(
        spark.catalog.tableExists(f"`{PREFIX}_{s}`")
        for s in ("digests", "bands", "shingles")
    ):
        build_lsh_index(
            docs_normalized(spark, SF_SMOKE).filter(
                F.col("doc_id") % INCREMENTAL_STRIDE != 0
            ),
            prefix=PREFIX,
        )
    bf_row, probes, m_log2 = bloom_trained_state(spark, SF_SMOKE)
    return dict(
        index_prefix=PREFIX,
        bf_row=bf_row,
        probes=probes.localCheckpoint(eager=True),
        m_log2=m_log2,
        merges=bpe_merge_list(spark, SF_SMOKE),
    )


def _stage(spark, tmp_path, n_files=4):
    path = str(tmp_path / "arrivals")
    _arrivals(spark).select("doc_id", "text").repartition(n_files).write.mode(
        "overwrite"
    ).json(path)
    return path


def test_multi_batch_equals_one_shot_gate(spark, tmp_path):
    state = _frozen_state(spark)
    inp = _stage(spark, tmp_path)
    out = run_ingest_gate(
        spark,
        inp,
        str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
        **state,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(tuple(r) for r in out.drop("batch_id").collect())
    want = sorted(
        tuple(r)
        for r in ingest_gate_batch(
            _arrivals(spark).select("doc_id", "text"), **state
        ).collect()
    )
    assert got == want and got
    # the gate discriminates at the smoke scale: both admission
    # outcomes, several dedup verdicts, contamination fires somewhere
    by_col = list(zip(*got))
    assert set(by_col[6]) == {True, False}
    assert len(set(by_col[4])) >= 2, set(by_col[4])
    assert any(c == 1 for c in by_col[3]), "contamination leg never fired"
    assert any(r != "ok" for r in by_col[1]), "quality leg never fired"
    assert all(s >= 0 for s in by_col[5])
    drain()


def test_replay_is_idempotent(spark, tmp_path):
    state = _frozen_state(spark)
    inp = _stage(spark, tmp_path)
    out1 = run_ingest_gate(
        spark, inp, str(tmp_path / "o1"), checkpoint=str(tmp_path / "c1"), **state
    )
    rows1 = sorted(tuple(r) for r in out1.drop("batch_id").collect())
    out2 = run_ingest_gate(
        spark, inp, str(tmp_path / "o1"), checkpoint=str(tmp_path / "c2"), **state
    )
    rows2 = sorted(tuple(r) for r in out2.drop("batch_id").collect())
    assert rows1 == rows2 and rows1
    drain()
