"""Streaming perceptual-image probe: multi-batch verdicts must equal
the one-shot batch probe of the same arrival set against the same
frozen signature index (the decomposability contract the registry
oracle relies on), and all three verdict branches must fire.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.multimodal import (
    SPARK_PH_PROBE_COND,
    _phash_bands,
    _phash_sigs,
)
from prueba_tecnica_http_client_etl_spark.streaming.image_probe_stream import (
    probe_phash_batch,
    run_image_probe,
)
from tests.conftest import SF_SMOKE


def _stage_arrivals(spark, tmp_path, n_files=4):
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    path = str(tmp_path / "arrivals")
    (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.expr(SPARK_PH_PROBE_COND))
        .select("doc_id")
        .repartition(n_files)
        .write.mode("overwrite")
        .json(path)
    )
    return path


def test_multi_batch_probe_equals_one_shot(spark, tmp_path):
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    index_bands = _phash_bands(
        _phash_sigs(spark, SF_SMOKE).filter(~F.expr(SPARK_PH_PROBE_COND))
    )
    inp = _stage_arrivals(spark, tmp_path)
    out = run_image_probe(
        spark,
        inp,
        str(tmp_path / "out"),
        index_bands=index_bands,
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(
        (r.doc_id, r.verdict, r.n_band_candidates, r.min_hamming)
        for r in out.select(
            "doc_id", "verdict", "n_band_candidates", "min_hamming"
        ).collect()
    )
    one_shot = probe_phash_batch(
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.expr(SPARK_PH_PROBE_COND))
        .select("doc_id"),
        index_bands,
    )
    want = sorted(
        (r.doc_id, r.verdict, r.n_band_candidates, r.min_hamming)
        for r in one_shot.collect()
    )
    assert got == want
    verdicts = {v for _, v, _, _ in got}
    assert verdicts == {"exact_dup", "near_dup", "novel"}, verdicts


def test_image_probe_replay_is_idempotent(spark, tmp_path):
    """Re-running against the same checkpoint replays no new batches
    and leaves the verdict layer unchanged (the overwrite-per-batch
    runner contract)."""
    index_bands = _phash_bands(
        _phash_sigs(spark, SF_SMOKE).filter(~F.expr(SPARK_PH_PROBE_COND))
    )
    inp = _stage_arrivals(spark, tmp_path)
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = run_image_probe(spark, inp, out_root, index_bands=index_bands, checkpoint=ckpt)
    rows1 = sorted(map(tuple, first.collect()))
    second = run_image_probe(spark, inp, out_root, index_bands=index_bands, checkpoint=ckpt)
    rows2 = sorted(map(tuple, second.collect()))
    assert rows1 == rows2 and len(rows1) > 0


def test_audio_probe_multi_batch_equals_one_shot(spark, tmp_path):
    """The audio twin (run_audio_probe): multi-batch verdicts equal the
    one-shot probe with the audio signature mapper, all three branches
    fire — the 15th hash-certified stream's decomposability contract."""
    from prueba_tecnica_http_client_etl_spark.operators.multimodal import (
        _audio_fp_batches,
        _audio_fp_sigs,
    )
    from prueba_tecnica_http_client_etl_spark.schemas import load_table
    from prueba_tecnica_http_client_etl_spark.streaming.image_probe_stream import (
        run_audio_probe,
    )

    index_bands = _phash_bands(
        _audio_fp_sigs(spark, SF_SMOKE).filter(~F.expr(SPARK_PH_PROBE_COND))
    )
    inp = _stage_arrivals(spark, tmp_path)
    out = run_audio_probe(
        spark,
        inp,
        str(tmp_path / "out"),
        index_bands=index_bands,
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(
        (r.doc_id, r.verdict, r.n_band_candidates, r.min_hamming)
        for r in out.select(
            "doc_id", "verdict", "n_band_candidates", "min_hamming"
        ).collect()
    )
    one_shot = probe_phash_batch(
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.expr(SPARK_PH_PROBE_COND))
        .select("doc_id"),
        index_bands,
        sig_batches=_audio_fp_batches,
    )
    want = sorted(
        (r.doc_id, r.verdict, r.n_band_candidates, r.min_hamming)
        for r in one_shot.collect()
    )
    assert got == want
    verdicts = {v for _, v, _, _ in got}
    assert verdicts == {"exact_dup", "near_dup", "novel"}, verdicts


def test_video_probe_multi_batch_equals_one_shot(spark, tmp_path):
    """The video containment twin (run_video_probe): multi-batch
    verdicts equal the one-shot probe of the same arrival set against
    the same frozen frame index, and both verdict branches fire — the
    16th hash-certified stream's decomposability contract."""
    from prueba_tecnica_http_client_etl_spark.operators.multimodal import _video_fhd
    from prueba_tecnica_http_client_etl_spark.schemas import load_table
    from prueba_tecnica_http_client_etl_spark.streaming.video_probe_stream import (
        probe_video_batch,
        run_video_probe,
    )

    ix_fhd = (
        _video_fhd(spark, SF_SMOKE)
        .filter(~F.expr(SPARK_PH_PROBE_COND))
        .localCheckpoint(eager=True)
    )
    ix_sizes = (
        ix_fhd.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    inp = _stage_arrivals(spark, tmp_path)
    out = run_video_probe(
        spark,
        inp,
        str(tmp_path / "out"),
        index_fhd=ix_fhd,
        index_sizes=ix_sizes,
        checkpoint=str(tmp_path / "ckpt"),
        one_file_per_batch=True,
    )
    assert out.select("batch_id").distinct().count() > 1, "stream must run multi-batch"
    got = sorted(
        (r.doc_id, r.verdict, r.n_candidates, r.best_containment)
        for r in out.select(
            "doc_id", "verdict", "n_candidates", "best_containment"
        ).collect()
    )
    one_shot = probe_video_batch(
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.expr(SPARK_PH_PROBE_COND))
        .select("doc_id"),
        ix_fhd,
        ix_sizes,
    )
    want = sorted(
        (r.doc_id, r.verdict, r.n_candidates, r.best_containment)
        for r in one_shot.collect()
    )
    assert got == want
    verdicts = {v for _, v, _, _ in got}
    assert verdicts == {"near_dup", "novel"}, verdicts
