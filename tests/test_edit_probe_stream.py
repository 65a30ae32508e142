"""Streaming edit-distance probe: multi-batch output must equal probing
the whole incoming set at once (= the symmetrized batch
dedup_edit_distance pair set), and replay must be idempotent — the
decomposability contract the registry oracle relies on.
"""

from __future__ import annotations

from prueba_tecnica_http_client_etl_spark.operators.dedup import dedup_edit_distance
from prueba_tecnica_http_client_etl_spark.streaming.edit_probe_stream import run_edit_probe
from tests.conftest import SF_CORRECTNESS

COLS = ["doc_id", "neighbor_id", "len_self", "len_neighbor", "edit_distance"]


def _stage_docs(spark, tmp_path, n_files=4):
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    path = str(tmp_path / "docs")
    (
        load_table(spark, SF_CORRECTNESS, "documents")
        .select("doc_id", "text")
        .repartition(n_files)
        .write.mode("overwrite")
        .json(path)
    )
    return path


def _symmetrized_batch_pairs(spark):
    rows = dedup_edit_distance(spark, SF_CORRECTNESS).collect()
    out = []
    for r in rows:
        out.append((r.doc_a, r.doc_b, r.len_a, r.len_b, r.edit_distance))
        out.append((r.doc_b, r.doc_a, r.len_b, r.len_a, r.edit_distance))
    return sorted(out)


def test_multi_batch_probe_equals_symmetrized_batch_pairs(spark, tmp_path):
    """one_file_per_batch forces >1 micro-batch; the hit union must still
    equal the symmetrized batch pair set — hits are per-doc pure
    functions of the frozen corpus artifacts, never of batch peers.
    Run at sf0.01 where real near-dup pairs exist (24 -> 48 hits)."""
    inp = _stage_docs(spark, tmp_path)
    out = run_edit_probe(
        spark,
        inp,
        str(tmp_path / "out"),
        sf_dir=SF_CORRECTNESS,
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(tuple(r) for r in out.select(*COLS).collect())
    want = _symmetrized_batch_pairs(spark)
    assert got == want and len(got) > 0


def test_replay_is_idempotent(spark, tmp_path):
    """A second availableNow run over the same input and a FRESH
    checkpoint must converge to identical hit files (foreachBatch
    overwrites its batch_id partition)."""
    inp = _stage_docs(spark, tmp_path)
    out1 = run_edit_probe(
        spark, inp, str(tmp_path / "o1"), sf_dir=SF_CORRECTNESS, checkpoint=str(tmp_path / "c1")
    )
    rows1 = sorted(tuple(r) for r in out1.drop("batch_id").collect())
    out2 = run_edit_probe(
        spark, inp, str(tmp_path / "o1"), sf_dir=SF_CORRECTNESS, checkpoint=str(tmp_path / "c2")
    )
    rows2 = sorted(tuple(r) for r in out2.drop("batch_id").collect())
    assert rows1 == rows2
