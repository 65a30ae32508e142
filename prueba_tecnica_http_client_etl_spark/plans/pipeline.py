"""End-to-end medallion pipeline orchestrator — the reference's four
file-chained scripts (reference README.md:22-46: generate -> KPI ->
report, plus the unexecuted Pentaho design 'CSV Input -> Filter Rows ->
Staging -> Fact', README.md:165-178) formalized as restartable parquet
layers:

  bronze: raw stringly-typed log, exactly as ingested (replayable)
  silver: cleaned typed log (P1-P7 applied; quarantine carried separately)
  gold:   KPI fact table (partitioned by date_utc for pruning) +
          per-endpoint report + global metrics

Each stage reads the previous layer from disk, so any stage can rerun
without upstream recomputation — the property the reference got from its
intermediate files, here with columnar storage, schema enforcement, and
partition pruning. `run()` returns the paths + row counts + data-quality
counters as a manifest.

Manifest metrics come from `DataFrame.observe` (Spark's Observation API):
each layer's counts and quality counters are accumulated DURING its write
action, so the manifest costs zero extra scans — at 100 TB the previous
count()-per-layer approach re-read every layer once just to fill the
manifest.

At 100 TB: bronze/silver append per ingestion window (partition by load
date), gold is rebuilt per window via dynamic partition overwrite —
`spark.sql.sources.partitionOverwriteMode=dynamic` — never a full
rewrite.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_http_log
from ..operators.kpi import kpi_daily
from ..operators.report import DEFAULT_P90_THRESHOLD, global_metrics, report_by_endpoint
from . import layout as L


@dataclass
class PipelineManifest:
    bronze_path: str
    silver_path: str
    gold_kpi_path: str
    gold_report_path: str
    gold_global_path: str
    rows: dict[str, int]
    quality: dict[str, int] = field(default_factory=dict)


def run(
    spark: SparkSession,
    raw_log: DataFrame,
    root: str,
    *,
    p90_threshold: float = DEFAULT_P90_THRESHOLD,
) -> PipelineManifest:
    """raw stringly-typed log DataFrame -> bronze/silver/gold layers."""
    obs = {name: Observation(name) for name in ("bronze", "silver", "gold_kpi", "gold_report", "gold_global")}
    n = F.count(F.lit(1)).alias("rows")

    bronze = L.write_layer(raw_log.observe(obs["bronze"], n), root, L.BRONZE, "http_log")

    silver_df = clean_http_log(L.read_layer(spark, root, L.BRONZE, "http_log")).observe(
        obs["silver"],
        n,
        # quality counters ride the same write action: cast failures are
        # data (flag coupling, SURVEY §4.3 #1), so count them here
        F.sum((F.col("parse_result") != "ok").cast("long")).alias("parse_errors"),
        F.sum((F.col("status_code") == 0).cast("long")).alias("status_cast_failures"),
    )
    silver = L.write_layer(silver_df, root, L.SILVER, "http_log_clean")

    clean = L.read_layer(spark, root, L.SILVER, "http_log_clean")
    kpi_df = kpi_daily(clean).observe(obs["gold_kpi"], n)
    gold_kpi = L.write_layer(kpi_df, root, L.GOLD, "kpi_daily", partition_by=["date_utc"])

    # partition-type inference turns the yyyy-MM-dd STRING key into a
    # DATE and moves it to the last column position on read-back
    # (round-12 review) — restore kpi_daily's documented 9-column string
    # contract so gold readers and direct kpi_daily frames agree
    # (schema-compare, union, hash).
    kpi = (
        L.read_layer(spark, root, L.GOLD, "kpi_daily")
        .withColumn("date_utc", F.col("date_utc").cast("string"))
        .select(*kpi_df.columns)
    )
    gold_report = L.write_layer(
        report_by_endpoint(kpi, p90_threshold=p90_threshold).observe(obs["gold_report"], n),
        root,
        L.GOLD,
        "report_endpoint",
    )
    gold_global = L.write_layer(
        global_metrics(kpi).observe(obs["gold_global"], n), root, L.GOLD, "global_metrics"
    )

    rows = {name: o.get["rows"] for name, o in obs.items()}
    silver_metrics = obs["silver"].get
    quality = {
        "parse_errors": silver_metrics["parse_errors"] or 0,
        "status_cast_failures": silver_metrics["status_cast_failures"] or 0,
    }
    return PipelineManifest(bronze, silver, gold_kpi, gold_report, gold_global, rows, quality)
