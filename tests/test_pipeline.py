"""Medallion pipeline: every layer lands on disk, stages rerun from the
previous layer, and the gold KPI layer is date-partitioned."""

from __future__ import annotations

from pathlib import Path

from prueba_tecnica_http_client_etl_spark.plans import pipeline as P
from prueba_tecnica_http_client_etl_spark.schemas import KPI_COLUMNS
from prueba_tecnica_http_client_etl_spark.sources.synthetic import generate_http_log


def test_pipeline_layers(spark, tmp_path: Path):
    raw = generate_http_log(spark, n=300, seed=7)
    m = P.run(spark, raw, str(tmp_path))

    assert m.rows["bronze"] == 300
    # silver drops only null-key rows; generator emits none
    assert m.rows["silver"] == 300
    assert m.rows["gold_kpi"] > 0
    assert m.rows["gold_global"] == 1

    # observed quality counters (no extra scans): the generator injects
    # ~5% parse errors, and they must reconcile with the gold layer's
    # accounting
    from prueba_tecnica_http_client_etl_spark.plans import layout as L2

    kpi_rows = L2.read_layer(spark, str(tmp_path), L2.GOLD, "kpi_daily").collect()
    assert m.quality["parse_errors"] == sum(r.parse_errors for r in kpi_rows)
    assert m.quality["status_cast_failures"] >= 0

    # gold KPI is partitioned by date_utc (directory-level pruning keys)
    parts = [p.name for p in (tmp_path / "gold" / "kpi_daily").iterdir() if p.is_dir()]
    assert parts and all(p.startswith("date_utc=") for p in parts)

    # restartability: the report stage reruns from the gold layer alone
    from prueba_tecnica_http_client_etl_spark.operators.report import report_by_endpoint
    from prueba_tecnica_http_client_etl_spark.plans import layout as L

    kpi = L.read_layer(spark, str(tmp_path), L.GOLD, "kpi_daily")
    assert sorted(kpi.columns) == sorted(KPI_COLUMNS)  # partition col round-trips
    assert report_by_endpoint(kpi).count() == m.rows["gold_report"]


def test_gold_kpi_contract_restored_in_run(spark, tmp_path: Path):
    """Round-12 review: partition-type inference turns the yyyy-MM-dd
    string key into a DATE and moves it last on read-back. run() must
    restore kpi_daily's documented contract before the report stage so
    gold consumers and direct kpi_daily frames agree — pin the restored
    schema (name order AND date_utc's string type) via the same path
    run() uses internally."""
    from pyspark.sql import functions as F

    from prueba_tecnica_http_client_etl_spark.operators.kpi import kpi_daily
    from prueba_tecnica_http_client_etl_spark.functions.cleaning import clean_http_log
    from prueba_tecnica_http_client_etl_spark.plans import layout as L

    raw = generate_http_log(spark, n=200, seed=11)
    P.run(spark, raw, str(tmp_path))
    want = kpi_daily(clean_http_log(raw))
    restored = (
        L.read_layer(spark, str(tmp_path), L.GOLD, "kpi_daily")
        .withColumn("date_utc", F.col("date_utc").cast("string"))
        .select(*want.columns)
    )
    assert restored.columns == want.columns
    assert [f.dataType for f in restored.schema.fields] == [
        f.dataType for f in want.schema.fields
    ]
    assert sorted(map(tuple, restored.collect())) == sorted(map(tuple, want.collect()))
