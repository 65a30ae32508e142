"""Training-shard writer — the sink side of sequence packing.

`operators/corpus.py::sequence_pack_ids` produces loader-ready bins; a
training run doesn't read one giant table, it reads SHARDS: bounded-size
files a data-loader worker can claim atomically, partitioned by source so
mixture sampling (operators/corpus.py::domain_mixture_plan) can draw
per-domain without scanning others. This module writes that layout and
derives the shard manifest a loader indexes.

Scale shape: the write is one pass over the packed table —
`partitionBy(source)` gives directory-level domain pruning and
`maxRecordsPerFile` bounds every shard (the 100 TB knob: bins are
fixed-token-count rows, so a record cap IS a token-count cap per shard —
size shards so one fits a loader worker's read buffer). The manifest is a
per-file aggregate over `input_file_name()`, grouped map-side per shard.

Reference: no counterpart (/root/reference writes monolithic per-run CSVs,
SURVEY.md §2.2); completes the §2.8 corpus-preparation tier end-to-end:
tokenize -> pack -> shard -> manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_packed_shards(
    packed: DataFrame, out_dir: str, *, max_bins_per_file: int = 1024
) -> None:
    """Write a (source, bin_id, ...) packed table as per-source shard files
    of at most `max_bins_per_file` bins each."""
    (
        packed.write.mode("overwrite")
        .option("maxRecordsPerFile", max_bins_per_file)
        .partitionBy("source")
        .parquet(out_dir)
    )


def shard_manifest(spark, out_dir: str, *, quality_col: str = "n_oov_bin") -> DataFrame:
    """Per-shard index over a written shard directory: bin range, bin/token
    totals and a summed quality column per file — what a data loader reads
    to plan an epoch without opening the shards themselves. `quality_col`
    names the packed table's per-bin quality counter: `n_oov_bin` for the
    word-dictionary packing (sequence_pack_ids), `n_merged_bin` for the
    trained-BPE packing (sequence_pack_bpe_ids)."""
    files = spark.read.parquet(out_dir).withColumn("shard", F.input_file_name())
    quality_out = {"n_oov_bin": "n_oov", "n_merged_bin": "n_merged"}.get(
        quality_col, quality_col
    )
    return (
        files.groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("n_tokens_bin").alias("n_tokens"),
            F.sum(quality_col).alias(quality_out),
            F.min("bin_id").alias("bin_lo"),
            F.max("bin_id").alias("bin_hi"),
        )
        .orderBy("source", "bin_lo")
    )
