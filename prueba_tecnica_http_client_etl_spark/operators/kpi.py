"""Level-1 KPI aggregation (SURVEY.md §2.4 A1-A8).

clean log -> per-(date_utc, endpoint_base) KPI fact table with the exact
9-column schema of reference src/calcular_kpi.py:124-134.

Scale notes (the reference buffers every elapsed value per group in a
Python list — O(N) memory, reference src/calcular_kpi.py:15,:25):
- The conditional counts and avg are classic partial aggregates: Spark
  computes map-side partials, shuffling only one row per (group,
  partition) — at 100 TB the shuffle is proportional to group count, not
  row count.
- Exact percentile is the one order-statistic: Spark's `percentile` is an
  ObjectHashAggregate that spills, matching numpy's linear interpolation
  (oracle parity, SURVEY §4.3 #4). For the 100 TB tier `kpi_daily_approx`
  swaps in `percentile_approx` (KLL-style sketch, bounded memory,
  mergeable map-side) — the single biggest algorithmic upgrade over the
  reference; documented as approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable import exact_avg, round2, sql_exact_avg, sql_round2
from ..schemas import KPI_COLUMNS


def _count_if(cond) -> F.Column:
    """count_if as a sum of 0/1 — partial-aggregatable, codegen-friendly."""
    return F.sum(F.when(cond, 1).otherwise(0))


def kpi_aggregates(exact_percentile: bool = True) -> list[F.Column]:
    """A2-A8 aggregate expressions over a cleaned log.

    2xx/4xx/5xx are inclusive ranges; 3xx and the invalid-cast 0 fall
    through uncounted but still contribute to requests_total
    (reference src/calcular_kpi.py:26-31). parse_errors counts
    parse_result != 'ok' — not == 'error' (reference :33-34).
    """
    status = F.col("status_code")
    p90 = (
        F.percentile(F.col("elapsed_ms"), F.lit(0.9))
        if exact_percentile
        else F.percentile_approx(F.col("elapsed_ms"), F.lit(0.9), F.lit(10000))
    )
    return [
        F.count(F.lit(1)).alias("requests_total"),
        _count_if(status.between(200, 299)).alias("success_2xx"),
        _count_if(status.between(400, 499)).alias("client_4xx"),
        _count_if(status.between(500, 599)).alias("server_5xx"),
        _count_if(F.col("parse_result") != "ok").alias("parse_errors"),
        # exact_avg (cents fixed-point): elapsed_ms values are <=2-dp doubles,
        # so integerizing at scale 100 is lossless, and the integer sum is
        # order-independent — plain double avg can differ in the last ulp
        # across engines/partitionings and flip the floor-based round2 at a
        # tie boundary.
        round2(exact_avg(F.col("elapsed_ms"), 100)).alias("avg_elapsed_ms"),
        round2(p90).alias("p90_elapsed_ms"),
    ]


def kpi_daily(clean_log: DataFrame, *, exact_percentile: bool = True) -> DataFrame:
    """A1-A8 + O1: group by (date_utc, endpoint_base), 7 aggregates,
    composite ascending sort, 2-dp rounding at the sink
    (reference src/calcular_kpi.py:86-153)."""
    return (
        clean_log.groupBy("date_utc", "endpoint_base")
        .agg(*kpi_aggregates(exact_percentile))
        .select(*KPI_COLUMNS)
        .orderBy("date_utc", "endpoint_base")
    )


P90_APPROX_ACCURACY = 10_000  # percentile_approx accuracy; 1/accuracy = published rank-error fraction


def kpi_daily_p90_bound(clean_log: DataFrame) -> DataFrame:
    """The bounded-error certification of the A8 sketch tier
    (kpi_daily_approx_p90). Sketch OUTPUTS are engine-specific (DuckDB's
    approx_quantile is a different sketch), so the sketch value itself
    can never be hash-certified — but its PUBLISHED CONTRACT can:
    Spark's percentile_approx(col, p, accuracy) returns an element of
    the dataset whose rank is within eps*N of the target rank, where
    eps = 1/accuracy (the documented guarantee of the underlying
    Greenwald-Khanna summary). This query validates that contract
    IN-PLAN — count the sketch value's exact rank interval
    [cnt_lt + 1, cnt_le] and check it intersects
    [(0.9 - eps)*N - 1, (0.9 + eps)*N + 1] (the +-1 absorbs the
    rank-targeting convention at tiny N) — and emits only
    engine-portable columns: the group keys, N, the EXACT p90 (already
    certified bit-equal to DuckDB's quantile_cont by kpi_daily), and
    the boolean verdict, which the DuckDB twin asserts TRUE.

    Scale shape: one grouped pass for (N, exact, sketch), then the
    |groups|-row aggregate broadcasts back onto the log for the rank
    counts — the map-side work stays one conditional count per row; no
    extra shuffle of the fact table. (The exact percentile here is the
    certification cost, paid at gate scale; the production sketch tier
    at 100 TB runs percentile_approx alone — bounded memory, mergeable
    map-side — with this query as its standing contract check.)"""
    from ..functions.cachepool import managed_persist

    keys = ["date_utc", "endpoint_base"]
    # two consumers read the cleaned log (the grouped sketch/exact pass
    # and the rank-count join-back): persist it once — the interpreted
    # log-line parse is the query's dominant cost, and without the pool
    # persist it ran twice (bench: 5.5 -> ~3 s warm at sf0.1)
    clean_log = managed_persist(clean_log)
    grp = clean_log.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("requests_total"),
        round2(F.percentile(F.col("elapsed_ms"), F.lit(0.9))).alias("p90_exact"),
        F.percentile_approx(
            F.col("elapsed_ms"), F.lit(0.9), F.lit(P90_APPROX_ACCURACY)
        ).alias("p90_sketch"),
    )
    ranks = (
        clean_log.select(*keys, "elapsed_ms")
        .join(F.broadcast(grp), keys)
        .groupBy(*keys)
        .agg(
            F.max("requests_total").alias("requests_total"),
            F.max("p90_exact").alias("p90_exact"),
            _count_if(F.col("elapsed_ms") < F.col("p90_sketch")).alias("cnt_lt"),
            _count_if(F.col("elapsed_ms") <= F.col("p90_sketch")).alias("cnt_le"),
        )
    )
    n = F.col("requests_total").cast("double")
    eps = 1.0 / P90_APPROX_ACCURACY
    in_bound = (
        F.col("cnt_le").cast("double") >= (0.9 - eps) * n - 1.0
    ) & ((F.col("cnt_lt") + 1).cast("double") <= (0.9 + eps) * n + 1.0)
    return ranks.select(
        *keys,
        "requests_total",
        "p90_exact",
        in_bound.alias("p90_rank_in_bound"),
    ).orderBy(*keys)


def sql_kpi_daily_p90_bound(source: str = "clean_log") -> str:
    """DuckDB twin of kpi_daily_p90_bound: the exact columns recomputed
    independently, the contract verdict asserted TRUE."""
    p902 = sql_round2("quantile_cont(elapsed_ms, 0.9)")
    return f"""
SELECT date_utc, endpoint_base,
  count(*) AS requests_total,
  {p902} AS p90_exact,
  TRUE AS p90_rank_in_bound
FROM {source}
GROUP BY date_utc, endpoint_base
ORDER BY date_utc, endpoint_base"""


def sql_kpi_daily_select(source: str = "clean_log", include_p90: bool = True) -> str:
    """DuckDB twin of kpi_daily (depends on a clean_log CTE/view).

    include_p90=False is the kpi_daily_stream oracle: the stream's p90
    is a percentile_approx sketch whose VALUE is engine-specific, so the
    stream's driver-certified projection is the 8 exact columns. (The
    batch sketch tier kpi_daily_approx_p90 is certified differently —
    via kpi_daily_p90_bound's in-plan rank-error contract check; the
    per-micro-batch stream does not pay that rank join.)"""
    avg2 = sql_round2(sql_exact_avg("elapsed_ms", 100))
    p902 = sql_round2("quantile_cont(elapsed_ms, 0.9)")
    p90_line = f",\n  {p902} AS p90_elapsed_ms" if include_p90 else ""
    return f"""
SELECT
  date_utc,
  endpoint_base,
  count(*) AS requests_total,
  CAST(sum(CASE WHEN status_code BETWEEN 200 AND 299 THEN 1 ELSE 0 END) AS BIGINT) AS success_2xx,
  CAST(sum(CASE WHEN status_code BETWEEN 400 AND 499 THEN 1 ELSE 0 END) AS BIGINT) AS client_4xx,
  CAST(sum(CASE WHEN status_code BETWEEN 500 AND 599 THEN 1 ELSE 0 END) AS BIGINT) AS server_5xx,
  CAST(sum(CASE WHEN parse_result <> 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS parse_errors,
  {avg2} AS avg_elapsed_ms{p90_line}
FROM {source}
GROUP BY date_utc, endpoint_base
ORDER BY date_utc, endpoint_base"""
