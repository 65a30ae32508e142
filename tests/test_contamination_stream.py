"""Streaming Bloom-prescreened decontamination: multi-batch output must
be byte-equal to the one-shot batch check (contamination_check — the
prescreen is lossless, so also to contamination_bloom), and replay must
be idempotent — the decomposability contract the registry oracle relies
on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions import artifacts as A
from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.curation import (
    PROBE_STRIDE,
    bloom_trained_state,
    contamination_check,
)
from prueba_tecnica_http_client_etl_spark.streaming.contamination_stream import (
    run_contamination,
)
from tests.conftest import SF_SMOKE


def _stage_corpus(spark, tmp_path, n_files=4):
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    path = str(tmp_path / "corpus")
    (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") % PROBE_STRIDE != 0)
        .select("doc_id", "text")
        .repartition(n_files)
        .write.mode("overwrite")
        .json(path)
    )
    return path


def test_multi_batch_equals_batch_check(spark, tmp_path):
    """one_file_per_batch forces >1 micro-batch; the contamination union
    must still be byte-identical to contamination_check's one-shot
    output — per-doc results are functions of the FROZEN probe set only,
    and the Bloom prescreen has no false negatives."""
    bf_row, probes, m_log2 = bloom_trained_state(spark, SF_SMOKE)
    inp = _stage_corpus(spark, tmp_path)
    out = run_contamination(
        spark,
        inp,
        str(tmp_path / "out"),
        bf_row=bf_row,
        probes=probes,
        m_log2=m_log2,
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(
        tuple(r) for r in out.select("doc_id", "n_grams", "n_overlap", "contamination").collect()
    )
    want = sorted(tuple(r) for r in contamination_check(spark, SF_SMOKE).collect())
    assert got == want and len(got) > 0
    A.clear()
    drain()


def test_replay_is_idempotent(spark, tmp_path):
    """A second availableNow run over the same input and a FRESH
    checkpoint must converge to the identical score files (foreachBatch
    overwrites its batch_id partition)."""
    bf_row, probes, m_log2 = bloom_trained_state(spark, SF_SMOKE)
    inp = _stage_corpus(spark, tmp_path)
    kw = dict(bf_row=bf_row, probes=probes, m_log2=m_log2)
    out1 = run_contamination(
        spark, inp, str(tmp_path / "o1"), checkpoint=str(tmp_path / "c1"), **kw
    )
    rows1 = sorted(tuple(r) for r in out1.drop("batch_id").collect())
    out2 = run_contamination(
        spark, inp, str(tmp_path / "o1"), checkpoint=str(tmp_path / "c2"), **kw
    )
    rows2 = sorted(tuple(r) for r in out2.drop("batch_id").collect())
    assert rows1 == rows2
    A.clear()
    drain()
