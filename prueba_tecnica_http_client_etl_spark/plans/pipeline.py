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
partition pruning. `run()` returns the paths + row counts as a manifest.

At 100 TB: bronze/silver append per ingestion window (partition by load
date), gold is rebuilt per window via dynamic partition overwrite —
`spark.sql.sources.partitionOverwriteMode=dynamic` — never a full
rewrite.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

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


def run(
    spark: SparkSession,
    raw_log: DataFrame,
    root: str,
    *,
    p90_threshold: float = DEFAULT_P90_THRESHOLD,
) -> PipelineManifest:
    """raw stringly-typed log DataFrame -> bronze/silver/gold layers."""
    bronze = L.write_layer(raw_log, root, L.BRONZE, "http_log")

    silver_df = clean_http_log(L.read_layer(spark, root, L.BRONZE, "http_log"))
    silver = L.write_layer(silver_df, root, L.SILVER, "http_log_clean")

    clean = L.read_layer(spark, root, L.SILVER, "http_log_clean")
    kpi_df = kpi_daily(clean)
    gold_kpi = L.write_layer(kpi_df, root, L.GOLD, "kpi_daily", partition_by=["date_utc"])

    kpi = L.read_layer(spark, root, L.GOLD, "kpi_daily")
    gold_report = L.write_layer(
        report_by_endpoint(kpi, p90_threshold=p90_threshold), root, L.GOLD, "report_endpoint"
    )
    gold_global = L.write_layer(global_metrics(kpi), root, L.GOLD, "global_metrics")

    rows = {
        "bronze": L.read_layer(spark, root, L.BRONZE, "http_log").count(),
        "silver": L.read_layer(spark, root, L.SILVER, "http_log_clean").count(),
        "gold_kpi": L.read_layer(spark, root, L.GOLD, "kpi_daily").count(),
        "gold_report": L.read_layer(spark, root, L.GOLD, "report_endpoint").count(),
        "gold_global": L.read_layer(spark, root, L.GOLD, "global_metrics").count(),
    }
    return PipelineManifest(bronze, silver, gold_kpi, gold_report, gold_global, rows)
