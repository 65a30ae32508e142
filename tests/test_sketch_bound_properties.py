"""Property tests for the round-15 bounded-error certification MATH —
pure Python (no Spark session): the rank-interval acceptance predicate of
kpi_daily_p90_bound and the tie-mass bucket-deviation bound of
customer_value_deciles_approx, exercised over hypothesis-generated
multisets (ties included) rather than the single corpus the oracle sees."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from prueba_tecnica_http_client_etl_spark.operators.kpi import P90_APPROX_ACCURACY
from prueba_tecnica_http_client_etl_spark.operators.analytics import (
    DECILE_APPROX_ACCURACY,
)

EPS_P90 = 1.0 / P90_APPROX_ACCURACY
EPS_DEC = 1.0 / DECILE_APPROX_ACCURACY


def _p90_in_bound(values, v):
    """The operator's acceptance predicate, reimplemented."""
    n = len(values)
    cnt_lt = sum(1 for x in values if x < v)
    cnt_le = sum(1 for x in values if x <= v)
    return (cnt_le >= (0.9 - EPS_P90) * n - 1.0) and (
        cnt_lt + 1 <= (0.9 + EPS_P90) * n + 1.0
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=400))
def test_p90_predicate_is_the_interval_overlap(values):
    """The acceptance predicate must equal an INDEPENDENTLY formulated
    interval-overlap test: v's rank interval [cnt_lt+1, cnt_le] (every
    rank v occupies under ties) intersects the acceptance band
    [0.9N - epsN - 1, 0.9N + epsN + 1] iff max(lo) <= min(hi). The
    operator's two-inequality form and this max/min form are different
    expressions of the same set — a flipped fudge term or inverted band
    in either breaks the equality. Also: the exact p90 order statistic
    (rank ceil(0.9N)) must always be accepted (a contract-honoring
    sketch can never fail certification), including under heavy ties."""
    n = len(values)
    s = sorted(values)
    band_lo = 0.9 * n - EPS_P90 * n - 1.0
    band_hi = 0.9 * n + EPS_P90 * n + 1.0
    for v in set(values):
        cnt_lt = sum(1 for x in values if x < v)
        cnt_le = sum(1 for x in values if x <= v)
        overlap = max(float(cnt_lt + 1), band_lo) <= min(float(cnt_le), band_hi)
        assert _p90_in_bound(values, v) == overlap, (v, cnt_lt, cnt_le, n)
    # the true exact p90 order statistic always touches the band
    k = max(0, min(n - 1, math.ceil(0.9 * n) - 1))
    assert _p90_in_bound(values, s[k])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=50, max_size=500))
def test_p90_predicate_rejects_far_off_elements(values):
    """Completeness direction: with enough distinct mass below the band,
    the minimum element (rank interval anchored at 1) is rejected — the
    predicate does discriminate, it is not vacuously true."""
    n = len(values)
    v = min(values)
    cnt_le = sum(1 for x in values if x <= v)
    if cnt_le < (0.9 - EPS_P90) * n - 1.0:
        assert not _p90_in_bound(values, v)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(1, 40).flatmap(
            lambda tie: st.tuples(st.integers(0, 10_000), st.just(tie))
        ),
        min_size=1,
        max_size=60,
    )
)
def test_decile_bucket_deviation_bound_holds_under_ties(groups):
    """The in-plan bound 2*(eps*N + max_tie + 1) must cover the bucket
    deviation produced by value-based bucketing with EXACT cut points
    (rank error 0 <= eps*N, the contract's best case — the sketch's rank
    error only widens buckets by what the eps term covers). Hypothesis
    drives arbitrary tie structures, including the all-one-value corpus
    where ntile would split ties but cut points cannot."""
    spends = []
    for val, tie in groups:
        spends.extend([val] * tie)
    n = len(spends)
    s = sorted(spends, reverse=True)  # decile 1 = top spenders
    max_tie = max(Counter(spends).values())
    # exact decile cut points in the operator's orientation: cuts[i] =
    # the (i/10)-quantile of the ASCENDING distribution, discrete
    asc = sorted(spends)
    cuts = [asc[min(n - 1, max(0, math.ceil(i / 10 * n) - 1))] for i in range(1, 10)]
    buckets = Counter()
    for x in spends:
        d = 1 + sum(1 for c in cuts if x < c)
        buckets[d] += 1
    slack = 2.0 * (EPS_DEC * n + max_tie + 1)
    for d in range(1, 11):
        assert abs(buckets.get(d, 0) - n / 10.0) <= slack, (
            d,
            buckets.get(d, 0),
            n,
            max_tie,
        )
