"""Streaming ANN probe of the persisted IVF-PQ code index — the vector
tier's crawler-ingest loop, completing the probe-stream symmetry (LSH
digests, edit distance, image, audio, video... and now embeddings):
the two-stage code index (plans/pq_index.py) is built ONCE per corpus
snapshot and FROZEN; each arriving micro-batch of query ids fetches its
vectors and serves top-k neighbors through probe_pq_index — ADC over
the probed cells' 40-bit codes, then an exact re-rank over pruned
point-lookups of full vectors.

Results reference ONLY the frozen index — never other in-flight
queries — so each query's top-k is a pure function of (its vector, the
index): the union of per-batch outputs is byte-identical to probing
the whole query set at once, which is exactly ann_ivfpq_rerank on the
same corpus and quantizer (tests/test_pq_index.py pins the one-shot
equality; tests/test_ann_probe_stream.py pins the batching). That
decomposability is what lets the registry certify this stream against
SQL_ANN_IVFPQ_RERANK (rows+schema+hash — the strongest check a stream
can carry).

Arrival vectors come from the index's own refine store (`{prefix}_vecs`
— the arrivals here are corpus members, the same stand-in device as the
image probe re-synthesizing its PGMs); a production ingest would carry
the vectors in the batch and skip that join. Per-batch cost: |batch| x
|cents| coarse ranking + the probed cells' bucket-pruned code scan +
|batch| x pool point lookups — independent of how much has already
streamed. The per-batch transform persists its probe frame, so the
runner drains the cachepool per batch (bounded stream state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "vec_id long"


def ann_probe_batch(
    batch: DataFrame, *, prefix: str, frozen: tuple | None = None
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine_p1) for one micro-batch of
    arriving query ids against the frozen code index — probe_pq_index
    verbatim (the serving kernel), vectors fetched from the refine
    store by LITERAL id set: the batch ids are driver-bounded (the
    probe-batch contract), so the fetch is a bucket-pruned point
    lookup, never a store scan — a broadcast join would read the whole
    refine store per micro-batch at corpus scale.

    `frozen` is the pre-collected (centroid rows, codebook arrays)
    probe state from plans.pq_index.collect_pq_probe_state: the stream
    driver collects it ONCE and threads it through every micro-batch —
    re-collecting per batch cost ~2 driver collect jobs + 4 catalog
    round-trips per batch of state that never changes between re-trains
    (round-18 verdict item 1; the ingest_gate_stream frozen-state
    pattern applied here)."""
    from ..plans.pq_index import probe_pq_index

    spark = batch.sparkSession
    ids = sorted(r.vec_id for r in batch.select("vec_id").distinct().collect())
    queries = spark.table(f"{prefix}_vecs").filter(F.col("vec_id").isin(ids))
    return probe_pq_index(spark, queries, prefix=prefix, rerank=True, _frozen=frozen)


def run_ann_probe(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    *,
    prefix: str,
    checkpoint: str,
    one_file_per_batch: bool = False,
) -> DataFrame:
    """Drive the query-id file stream to completion (availableNow),
    probing every micro-batch against the frozen code index with
    idempotent per-batch overwrite. Returns the read-back union
    (query_id, neighbor_id, rank, cosine_p1, batch_id).

    The frozen probe state (centroids + codebook) is collected HERE,
    once per stream run, and threaded into every micro-batch — the
    per-batch path re-derives only what actually depends on the batch."""
    from ..plans.pq_index import collect_pq_probe_state
    from .runner import run_transform_stream

    frozen = collect_pq_probe_state(spark, prefix=prefix)
    return run_transform_stream(
        spark,
        input_path,
        out_root,
        schema=DOC_SCHEMA,
        layer="neighbors",
        checkpoint=checkpoint,
        transform=lambda batch: ann_probe_batch(batch, prefix=prefix, frozen=frozen),
        one_file_per_batch=one_file_per_batch,
        drain_pool_per_batch=True,
    )
