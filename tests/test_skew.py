"""Skew-salting: the two-stage salted aggregation must match the direct
groupBy exactly, and actually spread a hot key over multiple salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.skew import salted_agg, with_salt


def test_salted_agg_matches_direct(spark):
    # one pathological key holding ~90% of rows + a long tail
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v double")

    got = {
        r["k"]: r.asDict()
        for r in salted_agg(
            df, ["k"], {"n": ("count", "v"), "total": ("sum", "v"), "mx": ("max", "v")}, n_salts=8
        ).collect()
    }
    want = {
        r["k"]: r.asDict()
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"], k
        assert abs(got[k]["total"] - want[k]["total"]) < 1e-9, k
        assert got[k]["mx"] == want[k]["mx"], k


def test_salt_spreads_hot_key(spark):
    df = spark.createDataFrame([("hot", float(i)) for i in range(1000)], "k string, v double")
    n_salts_used = (
        with_salt(df, 8).filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_salts_used >= 6  # content-derived salt spreads the hot key


def test_registered_salted_query_plan_is_two_stage(spark):
    """The registered event_value_by_type_salted query must actually run
    the two-stage plan: an aggregate keyed on (event_type, _salt) below
    the final aggregate keyed on event_type alone."""
    from prueba_tecnica_http_client_etl_spark.operators.analytics import event_value_by_type_salted

    df = event_value_by_type_salted(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    agg_lines = [ln for ln in plan.splitlines() if "Aggregate" in ln]
    salted_stage = [ln for ln in agg_lines if "_salt" in ln]
    merge_stage = [ln for ln in agg_lines if "_salt" not in ln and "event_type" in ln]
    assert salted_stage, plan
    assert merge_stage, plan


def test_salt_is_deterministic(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
    s1 = sorted(map(tuple, with_salt(df, 16).collect()))
    s2 = sorted(map(tuple, with_salt(df.repartition(7), 16).collect()))
    assert s1 == s2  # pure function of row content, not partitioning
