"""The shared foreachBatch runner scaffold (round-12 verdict item 5).

Every file-fed stream in this package runs the same drain loop: a
schema'd JSONL directory source, an availableNow trigger, a foreachBatch
sink that writes each micro-batch to `batch_id`-derived parquet
partition directories with overwrite (foreachBatch alone is
at-least-once — a crash between writes replays the batch; per-batch
overwrite makes the replay converge to identical files, i.e.
effectively exactly-once end-to-end), and a read-back of the layer(s)
once the stream drains. Before this module each runner carried its own
copy of that scaffold; the five copies had already drifted once (the
per-batch cachepool drain existed only in the index-probe runner).

The scaffold is deliberately dumb: per-stream semantics (the transform,
the layer splits, which frozen frames each batch joins) stay in the
stream modules where their docstrings and oracles live.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession


def drain_json_file_stream(
    spark: SparkSession,
    input_path: str,
    *,
    schema,
    checkpoint: str,
    write_batch: Callable[[DataFrame, int], None],
    one_file_per_batch: bool = False,
    reader_options: dict[str, str] | None = None,
    tuned_shuffle: bool = True,
) -> None:
    """Drive a schema'd JSONL file stream to completion (availableNow)
    through `write_batch`, under the stream-sized shuffle tuning
    (tuning.stream_shuffle) unless opted out. Blocks until drained."""
    reader = spark.readStream.schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.json(input_path)

    def _start() -> None:
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if tuned_shuffle:
        from .tuning import stream_shuffle

        with stream_shuffle(spark):
            _start()
    else:
        _start()


def run_transform_stream(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    *,
    schema,
    layer: str,
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame],
    one_file_per_batch: bool = False,
    drain_pool_per_batch: bool = False,
) -> DataFrame:
    """The single-layer pattern: each micro-batch maps through
    `transform` and overwrites `{out_root}/{layer}/batch_id={id}`;
    returns the read-back union with `batch_id` as a discovered
    partition column.

    `drain_pool_per_batch` drains the cachepool after each batch write —
    for transforms that pool a per-batch persist (probe_lsh_index): the
    registry-level drain never comes mid-stream, so a continuous ingest
    loop would otherwise pin one batch-sized cached frame per micro-batch
    (round-12 review)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df)
        out.write.mode("overwrite").parquet(f"{out_root}/{layer}/batch_id={batch_id}")
        if drain_pool_per_batch:
            from ..functions.cachepool import drain

            drain()

    drain_json_file_stream(
        spark,
        input_path,
        schema=schema,
        checkpoint=checkpoint,
        write_batch=write_batch,
        one_file_per_batch=one_file_per_batch,
    )
    return spark.read.parquet(f"{out_root}/{layer}")


def run_split_stream(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    *,
    schema,
    checkpoint: str,
    layers: Sequence[tuple[str, Column, Callable[[DataFrame], DataFrame]]],
    prepare: Callable[[DataFrame], DataFrame] | None = None,
    one_file_per_batch: bool = False,
    reader_options: dict[str, str] | None = None,
    tuned_shuffle: bool = True,
) -> None:
    """The multi-sink split pattern (one scan, N sinks): each micro-batch
    runs `prepare` once, is persisted so one evaluation feeds every sink,
    and each (layer, predicate, project) in `layers` overwrites its own
    `{out_root}/{layer}/batch_id={id}` directory. Callers read back the
    layers they need (counts, unions) — the split shapes differ per
    stream, the scaffold does not."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        prepped = prepare(batch_df) if prepare is not None else batch_df
        prepped.persist()  # one evaluation feeds all sinks
        try:
            for layer, predicate, project in layers:
                (
                    project(prepped.filter(predicate))
                    .write.mode("overwrite")  # idempotent under checkpoint replay
                    .parquet(f"{out_root}/{layer}/batch_id={batch_id}")
                )
        finally:
            # a failed sink write must not leak the pinned batch frame
            # (each stream retry would pin another copy until GC)
            prepped.unpersist()

    drain_json_file_stream(
        spark,
        input_path,
        schema=schema,
        checkpoint=checkpoint,
        write_batch=write_batch,
        one_file_per_batch=one_file_per_batch,
        reader_options=reader_options,
        tuned_shuffle=tuned_shuffle,
    )
