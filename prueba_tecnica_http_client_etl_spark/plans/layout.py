"""Physical data layout strategies (SURVEY.md §3/§4: the reference's
"write CSV, read CSV" stage boundaries, re-expressed as layouts that
actually matter at 100 TB).

Three tools:

- Medallion persistence (bronze/silver/gold): the reference pipeline's
  restartability contract — each stage's output is a parquet layer, so a
  failed downstream stage re-reads instead of recomputing
  (reference README.md:22-46 chains 4 scripts via files on disk).
- Partitioned writes: gold tables partition on their natural pruning key
  (`date_utc`) so date-range queries touch only matching directories —
  partition pruning is the 100 TB equivalent of the reference's
  one-file-per-run layout.
- Bucketed writes: fact tables bucketed on their join key make
  fact-fact joins shuffle-free (both sides are already hash-partitioned
  on disk). The test suite proves the orders x lineitem join plan
  contains NO Exchange when both sides are bucketed on orderkey.

Bucketing requires the table catalog (`saveAsTable`); plain
`.parquet(path)` writes cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BRONZE, SILVER, GOLD = "bronze", "silver", "gold"


def write_layer(df: DataFrame, root: str, layer: str, name: str, *, partition_by: list[str] | None = None) -> str:
    """Persist a DataFrame as `<root>/<layer>/<name>` parquet; returns the
    path. Partition columns become directory levels (pruning keys)."""
    path = f"{root}/{layer}/{name}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def read_layer(spark: SparkSession, root: str, layer: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{root}/{layer}/{name}")


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Register `df` as a bucketed catalog table. Joins/aggregations whose
    keys are a superset of `bucket_cols` read both sides pre-partitioned:
    no Exchange in the plan. `n_buckets` should be sized so one bucket of
    the biggest table fits an executor's working memory at target scale
    (e.g. 100 TB / 8192 buckets ~= 12 GB per bucket pre-compression)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


STAGE_SUFFIX = "__compact_stage"


def heal_staged_swap(spark: SparkSession, table: str) -> bool:
    """Recover a `replace_table_staged` swap that crashed between its
    DROP and RENAME steps: the stage table holds the COMPLETE rewrite
    (it was durably written and verified before the drop), so renaming
    it into place finishes the interrupted swap. Returns True when a
    heal happened. Compaction callers run this preamble for every table
    they maintain, so a crashed compaction self-heals on the next run."""
    stage = table + STAGE_SUFFIX
    if not spark.catalog.tableExists(f"`{table}`") and spark.catalog.tableExists(f"`{stage}`"):
        spark.sql(f"ALTER TABLE `{stage}` RENAME TO `{table}`")
        return True
    return False


def replace_table_staged(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str] | None = None,
    n_buckets: int | None = None,
) -> None:
    """Crash-safe rewrite of a catalog table from a plan that READS that
    table (compaction's shape). saveAsTable(overwrite) on the table
    itself is drop-then-write — and staging the sole copy through
    localCheckpoint (non-reliable executor/driver memory blocks) means a
    crash or lost block mid-rewrite destroys the index (round-12 ADVICE:
    the exact in-place-rewrite hazard compaction.py's _refuse_overlap
    refuses for parquet dirs). Instead:

    1. write the full rewrite DURABLY to `{table}__compact_stage`
       (reading the original is fine — it's a different table);
    2. DROP the original;
    3. ALTER TABLE RENAME the stage into place (metadata-only; the
       bucket spec and data move with it).

    Crash windows: before (2) the original is untouched and
    authoritative (the stale stage is dropped at the start of the next
    rewrite); between (2) and (3) the stage holds the complete rewrite
    and `heal_staged_swap` renames it into place. At no point is the
    only copy of the index in volatile storage."""
    spark = df.sparkSession
    stage = table + STAGE_SUFFIX
    spark.sql(f"DROP TABLE IF EXISTS `{stage}`")
    from .lsh_index import _clear_orphaned_location

    _clear_orphaned_location(spark, stage)
    writer = df.write.mode("overwrite").format("parquet")
    if bucket_cols:
        if n_buckets is None:
            raise ValueError("bucket_cols requires n_buckets")
        writer = writer.bucketBy(n_buckets, *bucket_cols)
    writer.saveAsTable(stage)
    spark.sql(f"DROP TABLE `{table}`")
    spark.sql(f"ALTER TABLE `{stage}` RENAME TO `{table}`")


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains an Exchange (shuffle) node —
    the assertion primitive for co-location tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
