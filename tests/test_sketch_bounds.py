"""Bounded-error certification of the sketch tiers (round-14 verdict
item 4): the three approx queries no longer emit engine-specific sketch
values — they validate each sketch against its PUBLISHED error contract
in-plan and emit a boolean verdict alongside exact, hash-certifiable
counterparts. These tests pin the bound semantics on constructed inputs
(oracle parity at sf0.001/sf0.01 covers the real corpus)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.kpi import (
    P90_APPROX_ACCURACY,
    kpi_daily_p90_bound,
)
from prueba_tecnica_http_client_etl_spark.operators.analytics import (
    customer_value_deciles_approx,
)
from prueba_tecnica_http_client_etl_spark.registry import (
    HLL_BOUND_SIGMAS,
    HLL_RSD,
    q_events_distinct_users_approx,
)

SF = "/root/testdata/sf0.01"


def _toy_log(spark, values, date="2024-01-01", ep="/a"):
    return spark.createDataFrame(
        [(date, ep, float(v)) for v in values],
        "date_utc string, endpoint_base string, elapsed_ms double",
    )


def test_p90_bound_exact_matches_numpy_and_verdict_true(spark):
    """On a 1..100 toy group the sketch (accuracy 10000 >> N) is exact,
    the exact column must equal numpy's linear-interpolated p90, and the
    rank verdict must hold."""
    vals = list(range(1, 101))
    rows = kpi_daily_p90_bound(_toy_log(spark, vals)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.requests_total == 100
    expected = float(np.percentile(np.array(vals, dtype=float), 90))
    assert r.p90_exact == round(expected, 2)
    assert r.p90_rank_in_bound is True


def test_p90_rank_interval_logic_accepts_only_contract_ranks(spark):
    """The acceptance region is the documented rank band: recompute it
    driver-side for every group of the real corpus's KPI table and check
    the operator's verdicts match (all true AND the recomputation agrees,
    so a future edit that widens the band silently will be caught)."""
    from prueba_tecnica_http_client_etl_spark.registry import _events_clean_log

    log = _events_clean_log(spark, SF).select(
        "date_utc", "endpoint_base", "elapsed_ms"
    )
    out = {
        (r.date_utc, r.endpoint_base): r
        for r in kpi_daily_p90_bound(_events_clean_log(spark, SF)).collect()
    }
    grp = (
        log.groupBy("date_utc", "endpoint_base")
        .agg(
            F.collect_list("elapsed_ms").alias("xs"),
            F.percentile_approx(
                "elapsed_ms", F.lit(0.9), F.lit(P90_APPROX_ACCURACY)
            ).alias("sketch"),
        )
        .collect()
    )
    eps = 1.0 / P90_APPROX_ACCURACY
    for g in grp:
        xs = sorted(g.xs)
        n = len(xs)
        cnt_lt = sum(1 for x in xs if x < g.sketch)
        cnt_le = sum(1 for x in xs if x <= g.sketch)
        expected = (cnt_le >= (0.9 - eps) * n - 1.0) and (
            cnt_lt + 1 <= (0.9 + eps) * n + 1.0
        )
        r = out[(g.date_utc, g.endpoint_base)]
        assert r.p90_rank_in_bound == expected
        assert expected, f"sketch out of contract for {g.date_utc}/{g.endpoint_base}"


def test_hll_bound_formula_and_verdict(spark):
    """Recompute the HLL acceptance bound driver-side from exact counts
    and Spark's own estimate; the emitted verdict must equal it (and be
    true on this corpus — measured deviation is 0.0-0.2 sigma)."""
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    ev = load_table(spark, SF, "events")
    est = {
        r.event_type: (r.a, r.e)
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("a"),
            F.count_distinct("user_id").alias("e"),
        )
        .collect()
    }
    for r in q_events_distinct_users_approx(spark, SF).collect():
        a, e = est[r.event_type]
        assert r.n_users == e
        assert r.hll_in_bound == (abs(a - e) <= HLL_BOUND_SIGMAS * HLL_RSD * e + 2.0)
        assert r.hll_in_bound is True


def test_decile_bound_survives_heavy_ties(spark, tmp_path):
    """All-identical spends are the tie worst case: every customer lands
    in one value-bucket (ntile would split them 10 ways), and the
    in-plan tie term (max_tie) must absorb exactly that deviation —
    verdict true, all 10 deciles present, n_total exact."""
    n = 40
    orders = spark.createDataFrame(
        [(i, 100.0) for i in range(n)], "o_custkey long, o_totalprice double"
    )
    sf = str(tmp_path / "tied")
    orders.write.parquet(f"{sf}/orders.parquet")
    rows = customer_value_deciles_approx(spark, sf).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert all(r.n_total == n for r in rows)
    assert all(r.count_in_bound for r in rows)


def test_decile_bound_true_on_distinct_spends(spark):
    rows = customer_value_deciles_approx(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert all(r.count_in_bound for r in rows)
    assert len({r.n_total for r in rows}) == 1


def test_decile_bound_on_an_empty_orders_table(spark, tmp_path):
    """Degenerate corpus: zero orders. Both engines must emit the same
    10-row frame (n_total 0, empty buckets trivially in bound) — Spark's
    sum/max aggregate to NULL over zero rows where DuckDB's count(*)
    yields 0, so the operator coalesces."""
    import duckdb

    empty = spark.createDataFrame([], "o_custkey long, o_totalprice double")
    sf = str(tmp_path / "empty_orders")
    empty.write.parquet(f"{sf}/orders.parquet")
    rows = customer_value_deciles_approx(spark, sf).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    assert all(r.n_total == 0 and r.count_in_bound for r in rows)
    from prueba_tecnica_http_client_etl_spark.operators.analytics import (
        SQL_CUSTOMER_VALUE_DECILES_APPROX,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet/*.parquet')"
    )
    drows = con.sql(SQL_CUSTOMER_VALUE_DECILES_APPROX).fetchall()
    assert [(r.decile, r.n_total, r.count_in_bound) for r in rows] == [
        (int(d), int(n), bool(b)) for d, n, b in drows
    ]
