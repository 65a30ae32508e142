"""SparkSession factory tuned for the target execution model.

Tests/bench run on local[N] (single JVM), but every knob here is chosen so
the same plans hold on a 1000-executor cluster at 100 TB:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned partition counts.
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescePartitions makes the initial number a ceiling, not a constant.
- UTC session timezone: oracle comparisons (DuckDB is UTC-naive) and
  deterministic date derivation.
- Arrow enabled: every Python-boundary crossing (pandas UDFs, toPandas)
  is columnar-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "prueba-tecnica-etl-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cores = default_parallelism()
    shuffle = shuffle_partitions if shuffle_partitions is not None else max(cores, 8)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet TIMESTAMP(NANOS); read as INT64 once at session
        # build so table loads never mutate shared session conf mid-query.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Single-JVM local mode: the driver heap IS the executor heap. 16g on
        # the 128 GiB harness box keeps 32 concurrent tasks' join/sort buffers
        # out of GC churn — suite timings showed intermittent multi-second
        # pauses (different victim queries each run) at 8g.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
