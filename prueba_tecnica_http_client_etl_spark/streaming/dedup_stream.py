"""Streaming exact deduplication — the streaming tier of
operators/dedup.dedup_exact (driver north star: dedup as a first-class
training-data-pipeline operator; the reference is strictly batch).

An unbounded document stream is deduplicated on the md5 digest of the
normalized text with `dropDuplicates`: Spark keeps one state entry per
distinct digest (hash-partitioned on the digest — the same shuffle key the
batch variant groups on) and emits only the FIRST document seen per
digest; later copies, in the same or any later micro-batch, are dropped.

State contract at 100 TB: exact global dedup requires O(|distinct docs|)
state by definition — that is what the batch job pays as a shuffle, held
here as a state store instead. For unbounded retention use
`dropDuplicatesWithinWatermark` (bounded by the event-time horizon) or
periodic state checkpointing/compaction; kept exact-global here so the
finite replay matches the batch `dedup_exact` group count exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textprep as tp

DOC_SCHEMA = "doc_id long, text string"


def dedup_stream(docs: DataFrame) -> DataFrame:
    """document stream (doc_id, text) -> first-occurrence stream keyed on
    the normalized-text digest (same normalization as the batch dedup)."""
    return docs.select(
        "doc_id", F.md5(F.expr(tp.SPARK_NORM)).alias("norm_md5")
    ).dropDuplicates(["norm_md5"])


def run_files_to_memory(
    spark: SparkSession, input_path: str, *, table_name: str, one_file_per_batch: bool = False
) -> DataFrame:
    """Drive the file stream to completion (availableNow) into a memory
    sink; one file per micro-batch exercises cross-batch suppression."""
    from .tuning import stream_shuffle

    reader = spark.readStream.schema(DOC_SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    out = dedup_stream(reader.json(input_path))
    with stream_shuffle(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(table_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table_name)
