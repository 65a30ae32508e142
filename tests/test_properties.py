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


_bucket = st.tuples(st.integers(min_value=-80, max_value=10), st.integers(min_value=1, max_value=500))


@given(buckets=st.lists(_bucket, min_size=1, max_size=25, unique_by=lambda b: b[0]))
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_waterfill_plan_invariants(spark, buckets):
    """Random weight-bucket distributions through _waterfill_plan: the
    expected sample must never exceed the floor(n * NUM/DEN) budget,
    the threshold must be MINIMAL (one step looser overshoots), rates
    must be exactly min(1, 2^(l - t*)) modulo the documented 2^-sb
    truncation, and bucket accounting must conserve the input."""
    from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
    from prueba_tecnica_http_client_etl_spark.operators.corpus import (
        DSIR_RESAMPLE_DEN,
        DSIR_RESAMPLE_NUM,
        _waterfill_plan,
    )

    w = spark.createDataFrame(buckets, "log2_w long, n_docs long")
    rows = _waterfill_plan(w).collect()
    drain()
    assert sorted(r.log2_w for r in rows) == sorted(b[0] for b in buckets)
    got = {r.log2_w: r for r in rows}
    n_total = sum(n for _, n in buckets)
    sb = min(40, 62 - len(bin(n_total)) + 2)  # bitlen via bin() minus '0b'
    target = (n_total * DSIR_RESAMPLE_NUM) // DSIR_RESAMPLE_DEN
    t_star = rows[0].threshold_log2

    def kept_scaled(t: int) -> int:
        tot = 0
        for l, n in buckets:
            if l >= t:
                tot += n << sb
            elif t - l <= sb:
                tot += n << (sb - (t - l))
        return tot

    assert kept_scaled(t_star) <= target << sb
    assert kept_scaled(t_star - 1) > target << sb  # minimality
    for l, n in buckets:
        r = got[l]
        assert r.n_docs == n and r.threshold_log2 == t_star
        if l >= t_star:
            assert r.accept_num == 1 << sb and r.accept_rate == 1.0
        elif t_star - l <= sb:
            assert r.accept_num == 1 << (sb - (t_star - l))
        else:
            assert r.accept_num == 0


@given(
    shards=st.lists(
        st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=30),
        min_size=1,
        max_size=4,
    ),
    cap=st.integers(min_value=1, max_value=300),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_next_fit_audit_matches_sequential_replay(spark, shards, cap):
    """Random shards of random doc lengths through _next_fit_audit at a
    random context size: per-shard results must equal a pure-Python
    replay of the same truncate-then-next-fit rule, and the greedy bin
    count must sit between the concat lower bound and docs-per-bin
    upper bound."""
    import math

    from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
    from prueba_tecnica_http_client_etl_spark.operators.corpus import _next_fit_audit

    data = [
        (f"s{si}", di, n)
        for si, ns in enumerate(shards)
        for di, n in enumerate(ns)
    ]
    d = spark.createDataFrame(data, "source string, doc_id long, n_tokens long")
    rows = {r.source: r for r in _next_fit_audit(d, cap).collect()}
    drain()
    assert len(rows) == len(shards)
    for si, ns in enumerate(shards):
        m = [min(x, cap) for x in ns]
        fill, bins = 0, 0
        for x in m:
            if bins == 0 or fill + x > cap:
                bins, fill = bins + 1, x
            else:
                fill += x
        r = rows[f"s{si}"]
        assert (r.n_docs, r.n_tokens, r.n_trunc_tokens) == (len(ns), sum(ns), sum(ns) - sum(m))
        assert r.n_bins == bins
        assert r.n_bins_concat == (sum(m) + cap - 1) // cap
        assert r.n_bins_concat <= r.n_bins <= len(ns)
        assert r.waste_tokens == bins * cap - sum(m)
        assert r.utilization == math.floor(sum(m) / (bins * cap) * 1e6 + 0.5) / 1e6


@given(
    shards=st.lists(
        st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=30),
        min_size=1,
        max_size=4,
    ),
    cap=st.integers(min_value=1, max_value=300),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ffd_audit_matches_sequential_replay(spark, shards, cap):
    """Random shards through _ffd_audit at a random context size: the
    per-shard FFD bin count must equal a pure-Python replay of the
    truncate-then-first-fit-decreasing rule, the embedded next-fit
    column must replay the streaming rule, and the ordering invariant
    concat lower bound <= FFD <= next-fit <= docs must hold (FFD never
    loses to the streaming baseline)."""
    import math

    from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
    from prueba_tecnica_http_client_etl_spark.operators.corpus import _ffd_audit

    data = [
        (f"s{si}", di, n)
        for si, ns in enumerate(shards)
        for di, n in enumerate(ns)
    ]
    d = spark.createDataFrame(data, "source string, doc_id long, n_tokens long")
    rows = {r.source: r for r in _ffd_audit(d, cap).collect()}
    drain()
    assert len(rows) == len(shards)
    for si, ns in enumerate(shards):
        m = [min(x, cap) for x in ns]
        fill, nf = 0, 0
        for x in m:
            if nf == 0 or fill + x > cap:
                nf, fill = nf + 1, x
            else:
                fill += x
        fills: list[int] = []
        for x in sorted(m, reverse=True):
            for i, f in enumerate(fills):
                if f + x <= cap:
                    fills[i] = f + x
                    break
            else:
                fills.append(x)
        r = rows[f"s{si}"]
        assert (r.n_docs, r.n_tokens, r.n_trunc_tokens) == (len(ns), sum(ns), sum(ns) - sum(m))
        assert (r.n_bins_ffd, r.n_bins_nextfit, r.bins_saved) == (
            len(fills),
            nf,
            nf - len(fills),
        )
        assert r.n_bins_concat <= r.n_bins_ffd <= r.n_bins_nextfit <= len(ns)
        assert r.waste_tokens == len(fills) * cap - sum(m)
        assert r.utilization == math.floor(sum(m) / (len(fills) * cap) * 1e6 + 0.5) / 1e6
