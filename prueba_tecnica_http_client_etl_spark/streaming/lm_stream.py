"""Streaming bigram-LM quality gate — the ingest-time shape of the
CCNet-style filter (operators/corpus.py::lm_bigram_score): the model is
trained ONCE per corpus snapshot (lm_train_model over the train slice),
and each arriving micro-batch of documents is scored against it
(lm_score_docs) — per-batch cost is |batch| bigrams joined to the fixed
model, independent of how much has already streamed.

Scores reference ONLY the frozen model — never other in-flight
documents — so they are per-document pure functions: the union of
per-batch scores is byte-identical to scoring the whole held set at
once, regardless of batching. That decomposability is what lets the
registry certify this stream against lm_bigram_score's batch oracle SQL
(the strongest check a stream can carry) — the same argument as
dedup_index_probe_stream's probe-only verdicts.

Idempotence: foreachBatch is at-least-once, so the score sink
overwrites its batch_id-derived partition directory — a replayed batch
converges to identical files (the run_with_quarantine contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textprep as tp
from ..operators.corpus import lm_score_docs

DOC_SCHEMA = "doc_id long, text string"


def _prepped_batch(docs: DataFrame) -> DataFrame:
    """(doc_id, toks) from a raw (doc_id, text) micro-batch — the same
    normalize/tokenize expressions as docs_normalized, applied to
    streaming rows."""
    return (
        docs.withColumn("norm", F.expr(tp.SPARK_NORM))
        .withColumn("toks", F.expr(tp.SPARK_TOKS))
        .select("doc_id", "toks")
    )


def run_lm_score(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    *,
    c12: DataFrame,
    c1: DataFrame,
    vocab: DataFrame,
    checkpoint: str,
    one_file_per_batch: bool = False,
) -> DataFrame:
    """Drive the document file stream to completion (availableNow),
    scoring every micro-batch against the frozen (c12, c1, vocab) model
    frames and writing scores partitioned by batch_id with idempotent
    per-batch overwrite. The model frames should be persisted by the
    caller (each micro-batch joins them). Returns the read-back union
    (doc_id, n_bigrams, n_oov_bigrams, avg_bits, batch_id)."""
    from .runner import run_transform_stream

    return run_transform_stream(
        spark,
        input_path,
        out_root,
        schema=DOC_SCHEMA,
        layer="scores",
        checkpoint=checkpoint,
        transform=lambda batch: lm_score_docs(_prepped_batch(batch), c12, c1, vocab),
        one_file_per_batch=one_file_per_batch,
    )
