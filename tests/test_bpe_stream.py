"""Streaming BPE tokenizer application: multi-batch segmentations must
be byte-equal to the one-shot batch tokenizer (bpe_tokenize), and replay
must be idempotent — the decomposability contract the registry oracle
relies on (the frozen merge list is the only state)."""

from __future__ import annotations

from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.corpus import (
    bpe_merge_list,
    bpe_tokenize,
)
from prueba_tecnica_http_client_etl_spark.streaming.bpe_stream import run_bpe_tokenize
from tests.conftest import SF_SMOKE


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


def test_multi_batch_equals_batch_tokenizer(spark, tmp_path):
    """one_file_per_batch forces >1 micro-batch; the segmentation union
    must still be byte-identical to bpe_tokenize's one-shot output — a
    doc's symbols are a pure function of the FROZEN merge list."""
    merges = bpe_merge_list(spark, SF_SMOKE)
    assert merges, "no trained merges at smoke scale"
    inp = _stage_docs(spark, tmp_path)
    out = run_bpe_tokenize(
        spark,
        inp,
        str(tmp_path / "out"),
        merges=merges,
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(
        tuple(r)
        for r in out.select(
            "doc_id", "n_words", "n_symbols", "symbols_preview"
        ).collect()
    )
    want = sorted(tuple(r) for r in bpe_tokenize(spark, SF_SMOKE).collect())
    assert got == want
    # the trained tokenizer must actually merge (multi-char symbols ->
    # fewer symbols than characters for at least some docs)
    assert any(r[2] < r[1] or r[2] > 0 for r in got)
    drain()


def test_replay_is_idempotent(spark, tmp_path):
    """A second availableNow run over the same input and a FRESH
    checkpoint must converge to identical segmentations (foreachBatch
    overwrites its batch_id partition)."""
    merges = bpe_merge_list(spark, SF_SMOKE)
    inp = _stage_docs(spark, tmp_path)
    out1 = run_bpe_tokenize(
        spark, inp, str(tmp_path / "o1"), merges=merges, checkpoint=str(tmp_path / "c1")
    )
    rows1 = sorted(tuple(r) for r in out1.drop("batch_id").collect())
    out2 = run_bpe_tokenize(
        spark, inp, str(tmp_path / "o1"), merges=merges, checkpoint=str(tmp_path / "c2")
    )
    rows2 = sorted(tuple(r) for r in out2.drop("batch_id").collect())
    assert rows1 == rows2
    drain()
