"""Streaming persisted-index probe: multi-batch verdicts must be
byte-equal to the one-shot batch probe (dedup_incremental), and replay
must be idempotent.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.dedup import (
    INCREMENTAL_STRIDE,
    dedup_incremental,
    docs_normalized,
)
from prueba_tecnica_http_client_etl_spark.plans.lsh_index import build_lsh_index
from prueba_tecnica_http_client_etl_spark.streaming.index_probe_stream import run_index_probe
from tests.conftest import SF_SMOKE


def _stage_incoming(spark, tmp_path, n_files=4):
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    path = str(tmp_path / "incoming")
    (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") % INCREMENTAL_STRIDE == 0)
        .select("doc_id", "text")
        .repartition(n_files)
        .write.mode("overwrite")
        .json(path)
    )
    return path


def test_multi_batch_probe_equals_batch_incremental(spark, tmp_path):
    """one_file_per_batch forces >1 micro-batch; the verdict union must
    still be byte-identical to dedup_incremental's one-shot output —
    the decomposability contract the registry oracle relies on."""
    prefix = "t_probeix_eq"
    build_lsh_index(
        docs_normalized(spark, SF_SMOKE).filter(F.col("doc_id") % INCREMENTAL_STRIDE != 0),
        prefix=prefix,
    )
    inp = _stage_incoming(spark, tmp_path)
    out = run_index_probe(
        spark,
        inp,
        str(tmp_path / "out"),
        index_prefix=prefix,
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(
        (r.doc_id, r.verdict, r.n_near_candidates)
        for r in out.select("doc_id", "verdict", "n_near_candidates").collect()
    )
    want = sorted(
        (r.doc_id, r.verdict, r.n_near_candidates)
        for r in dedup_incremental(spark, SF_SMOKE).collect()
    )
    assert got == want and len(want) > 0


def test_probe_replay_is_idempotent(spark, tmp_path):
    """Re-running against the same checkpoint replays no new batches and
    leaves the verdict layer unchanged (the overwrite-per-batch
    contract)."""
    prefix = "t_probeix_idem"
    build_lsh_index(
        docs_normalized(spark, SF_SMOKE).filter(F.col("doc_id") % INCREMENTAL_STRIDE != 0),
        prefix=prefix,
    )
    inp = _stage_incoming(spark, tmp_path)
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = run_index_probe(spark, inp, out_root, index_prefix=prefix, checkpoint=ckpt)
    rows1 = sorted(map(tuple, first.collect()))
    second = run_index_probe(spark, inp, out_root, index_prefix=prefix, checkpoint=ckpt)
    rows2 = sorted(map(tuple, second.collect()))
    assert rows1 == rows2 and len(rows1) > 0
