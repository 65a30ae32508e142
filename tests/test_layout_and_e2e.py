"""Physical layout (bucketed co-located joins, partition pruning,
medallion layers) + the end-to-end golden pipeline test (SURVEY §5):
seeded log -> clean -> KPI fact -> report -> HTML sink."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cleaning import clean_http_log
from prueba_tecnica_http_client_etl_spark.operators.kpi import kpi_daily
from prueba_tecnica_http_client_etl_spark.operators.report import report_by_endpoint
from prueba_tecnica_http_client_etl_spark.plans import layout as L
from prueba_tecnica_http_client_etl_spark.schemas import KPI_COLUMNS, REPORT_COLUMNS, load_table
from prueba_tecnica_http_client_etl_spark.sources.synthetic import generate_http_log

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """orders x lineitem bucketed on orderkey -> the join plan must not
    shuffle either side (the 100 TB co-location story, SURVEY §7 step 6)."""
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    L.write_bucketed(orders, "orders_b", bucket_cols=["o_orderkey"], n_buckets=4)
    L.write_bucketed(li, "lineitem_b", bucket_cols=["l_orderkey"], n_buckets=4)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join: the point is that *shuffle-requiring*
        # strategies become shuffle-free on bucketed inputs (at 100 TB the
        # fact-fact side is never broadcastable anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("lineitem_b")
            .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # exactly one hash-partitioning shuffle: the final groupBy on
        # o_orderpriority. The join itself must add none.
        n_shuffles = plan.count("Exchange hashpartitioning")
        assert n_shuffles == 1, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_write_prunes(spark, tmp_path):
    """date_utc-partitioned gold table: a date filter must reduce the
    scanned files to the matching partition directory."""
    log = clean_http_log(
        spark.createDataFrame(
            [
                ("2026-01-01T10:00:00Z", "/get", "200", "10.0", "ok"),
                ("2026-01-02T10:00:00Z", "/get", "200", "20.0", "ok"),
            ],
            "timestamp_utc string, endpoint string, status_code string, elapsed_ms string, parse_result string",
        )
    )
    kpi = kpi_daily(log)
    L.write_layer(kpi, str(tmp_path), L.GOLD, "kpi", partition_by=["date_utc"])
    got = L.read_layer(spark, str(tmp_path), L.GOLD, "kpi").filter(F.col("date_utc") == "2026-01-01")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert got.count() == 1
    # partition filter must appear as a partition filter, not a data filter
    assert "PartitionFilters: [isnotnull(date_utc" in plan or "date_utc#" in plan


def test_e2e_pipeline_golden(spark, tmp_path):
    """S11 generator -> P1-P7 clean -> A1-A8 KPI -> A9-A11/P8-P10 report ->
    K5 HTML. Asserts the reference's exact output contracts: 9-col KPI
    schema in order, 11-col report schema, 2-dp rounding, alert flags."""
    raw = generate_http_log(spark, n=500, seed=42)
    cleaned = clean_http_log(raw)
    kpi = kpi_daily(cleaned)
    assert kpi.columns == KPI_COLUMNS

    rows = kpi.collect()
    assert len(rows) > 0
    for r in rows:
        d = r.asDict()
        # count coherence: ranges are disjoint; 3xx/0 fall through uncounted
        assert d["success_2xx"] + d["client_4xx"] + d["server_5xx"] <= d["requests_total"]
        # 2-dp rounding at the sink
        assert abs(d["avg_elapsed_ms"] * 100 - round(d["avg_elapsed_ms"] * 100)) < 1e-6
        assert d["date_utc"].count("-") == 2

    report = report_by_endpoint(kpi, p90_threshold=300.0)
    assert report.columns == REPORT_COLUMNS
    reps = [r.asDict() for r in report.collect()]
    assert {r["alerta_p90"] for r in reps} <= {"SI", "NO"}
    for r in reps:
        assert r["alerta_p90"] == ("SI" if r["p90_elapsed_ms"] > 300.0 else "NO")
        # percent columns guard division by zero and stay in [0, 100]
        assert 0.0 <= r["pct_success"] <= 100.0

    # determinism: same seed -> identical KPI table (distributed generator
    # is a pure function of (seed, id) — SURVEY §4.1 'seeded reproducibility')
    again = kpi_daily(clean_http_log(generate_http_log(spark, n=500, seed=42))).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))

    from prueba_tecnica_http_client_etl_spark.operators.report import global_metrics
    from prueba_tecnica_http_client_etl_spark.sinks.report import render_html_report

    html = render_html_report(global_metrics(kpi), report, str(tmp_path / "reporte.html"))
    assert "Reporte de KPIs HTTP" in html


def test_percentile_matches_numpy(spark):
    """SURVEY §4.3 trap 4: engine exact percentile == numpy linear
    interpolation, on awkward group sizes."""
    import numpy as np

    vals = [3.1, 9.7, 1.2, 44.0, 8.88, 2.0, 100.5]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(F.percentile("x", F.lit(0.9)).alias("p")).first()["p"]
    assert abs(got - float(np.percentile(vals, 90))) < 1e-9
