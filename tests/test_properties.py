"""Property tests for the §4.3 semantics traps: random dirty rows through
clean -> KPI must preserve the reference's accounting invariants
(SURVEY §5). One Spark job per example is slow, so each example is a
whole batch of rows."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cleaning import clean_http_log
from prueba_tecnica_http_client_etl_spark.operators.kpi import kpi_daily

_ts = st.one_of(
    st.none(),
    st.just("2026-01-01T10:00:00Z"),
    st.just("2026-01-02T23:59:59Z"),
    st.just("garbage-not-a-ts"),
)
_ep = st.one_of(
    st.none(),
    st.sampled_from(["/get", "/get?x=1", "/status/403", "/status/500?a=b", "/basic-auth/u/p", "/xml"]),
)
_status = st.one_of(st.none(), st.sampled_from(["200", "301", "404", "500", "999", "abc", ""]))
_elapsed = st.one_of(st.none(), st.sampled_from(["50.5", "0", "-3.25", "nan?", "1e3", "xx"]))
_pr = st.one_of(st.none(), st.sampled_from(["ok", "error", "weird"]))

_row = st.tuples(_ts, _ep, _status, _elapsed, _pr)


@given(rows=st.lists(_row, min_size=1, max_size=40))
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kpi_accounting_invariants(spark, rows):
    raw = spark.createDataFrame(
        rows, "timestamp_utc string, endpoint string, status_code string, elapsed_ms string, parse_result string"
    )
    cleaned = clean_http_log(raw)
    kpis = [r.asDict() for r in kpi_daily(cleaned).collect()]

    n_kept = sum(1 for r in rows if r[0] is not None and r[1] is not None)
    # P2: only null-key rows are dropped — never coercion failures
    assert sum(k["requests_total"] for k in kpis) == n_kept

    for k in kpis:
        # classes are disjoint inclusive ranges; 3xx/999/cast-0 fall through
        assert k["success_2xx"] + k["client_4xx"] + k["server_5xx"] <= k["requests_total"]
        # parse_errors counts != 'ok' (trap 2), so it bounds every flavor of
        # badness: explicit 'error', 'weird', null->default, failed casts
        assert 0 <= k["parse_errors"] <= k["requests_total"]
        # normalized endpoints never retain query strings or collapsed suffixes
        assert "?" not in k["endpoint_base"]
        assert not k["endpoint_base"].startswith("/status/")

    # trap 1: any row with an unparseable status or elapsed MUST be a parse
    # error even if its own parse_result said 'ok'
    def int_ok(s):
        try:
            int(s)
            return True
        except (TypeError, ValueError):
            return False

    def float_ok(s):
        try:
            float(s)
            return True
        except (TypeError, ValueError):
            return False

    n_forced = sum(
        1
        for r in rows
        if r[0] is not None and r[1] is not None and (not int_ok(r[2]) or not float_ok(r[3]) or r[4] is None)
    )
    n_explicit = sum(
        1
        for r in rows
        if r[0] is not None and r[1] is not None and int_ok(r[2]) and float_ok(r[3]) and r[4] not in (None, "ok")
    )
    assert sum(k["parse_errors"] for k in kpis) == n_forced + n_explicit


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=10_000, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_percentile_parity_with_numpy(spark, vals):
    """trap 4: Spark exact percentile == numpy linear interpolation for
    arbitrary group sizes/values."""
    import numpy as np

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(F.percentile("x", F.lit(0.9)).alias("p")).first()["p"]
    want = float(np.percentile(np.array(vals, dtype="float64"), 90))
    assert got == want or abs(got - want) < 1e-9 * max(1.0, abs(want))

# --- source_overlap_matrix's JVM-side pair generation -------------------------

_src_lists = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1, max_size=8, unique=True
)


@given(srcs=st.lists(_src_lists, min_size=1, max_size=12))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_overlap_pair_expr_equals_combinations(spark, srcs):
    """The flatten/transform/slice pair expression (textops.
    source_overlap_matrix) must emit exactly itertools.combinations of
    each sorted source set — the property the whole no-join rewrite
    rests on."""
    import itertools

    from pyspark.sql import functions as F

    pair_expr = (
        "flatten(transform(srcs, (x, i) -> "
        "transform(slice(srcs, i + 2, size(srcs)), y -> struct(x AS a, y AS b))))"
    )
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(srcs)], "row_id long, srcs array<string>"
    )
    got = {
        (r.row_id, r.p.a, r.p.b)
        for r in df.select("row_id", F.explode_outer(F.expr(pair_expr)).alias("p")).collect()
        if r.p is not None
    }
    want = {
        (i, a, b)
        for i, s in enumerate(srcs)
        for a, b in itertools.combinations(sorted(s), 2)
    }
    assert got == want
