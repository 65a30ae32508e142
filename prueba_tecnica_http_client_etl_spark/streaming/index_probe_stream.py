"""Streaming probe of the persisted MinHash-LSH dedup index — the shape a
production crawler ingest loop actually runs: the index is built ONCE
(plans/lsh_index.build_lsh_index, bucketed catalog tables), and each
arriving micro-batch of documents is probed against it for
exact_dup / near_dup / novel verdicts (plans/lsh_index.probe_lsh_index —
the per-batch cost is |batch| x bands lookups, independent of corpus
size, and the index side never shuffles).

Verdicts reference ONLY the index — never other in-flight documents — so
they are per-document pure functions: the union of per-batch verdicts is
byte-identical to probing the whole incoming set at once, regardless of
how the stream batches it. That decomposability is what lets the registry
certify this stream against dedup_incremental's batch oracle SQL (the
strongest check a stream can carry), and it is also the operational
contract that makes the pipeline safe to scale out: any partitioning of
arrivals yields the same verdicts.

Idempotence: foreachBatch is at-least-once, so the verdict sink
overwrites its batch_id-derived partition directory — a replayed batch
converges to identical files (the run_with_quarantine contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textprep as tp
from ..plans.lsh_index import probe_lsh_index

DOC_SCHEMA = "doc_id long, text string"


def _prepped_batch(docs: DataFrame) -> DataFrame:
    """(doc_id, norm, sh) from a raw (doc_id, text) micro-batch — the
    same normalize/shingle expressions as docs_normalized, applied to
    streaming rows."""
    return (
        docs.withColumn("norm", F.expr(tp.SPARK_NORM))
        .withColumn("toks", F.expr(tp.SPARK_TOKS))
        .withColumn("sh", F.expr(tp.SPARK_SHINGLES))
    )


def run_index_probe(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    *,
    index_prefix: str,
    checkpoint: str,
    one_file_per_batch: bool = False,
) -> DataFrame:
    """Drive the document file stream to completion (availableNow),
    probing every micro-batch against the persisted `{index_prefix}_*`
    index tables and writing verdicts partitioned by batch_id with
    idempotent per-batch overwrite. Returns the read-back union
    (doc_id, verdict, n_near_candidates, batch_id).

    drain_pool_per_batch: probe_lsh_index pools its batch persist for
    drain at the NEXT registry-level query — which never comes
    mid-stream, so a continuous ingest loop would pin one batch-sized
    cached frame per micro-batch (round-12 review); the per-batch drain
    keeps storage bounded. ordered=False: the parquet write discards
    ordering, so the batch operator's final sort is per-micro-batch
    tax."""
    from .runner import run_transform_stream

    return run_transform_stream(
        spark,
        input_path,
        out_root,
        schema=DOC_SCHEMA,
        layer="verdicts",
        checkpoint=checkpoint,
        transform=lambda batch: probe_lsh_index(
            spark, _prepped_batch(batch), prefix=index_prefix, ordered=False
        ),
        one_file_per_batch=one_file_per_batch,
        drain_pool_per_batch=True,
    )
