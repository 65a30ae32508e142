"""Deterministic synthetic HTTP-log sources (SURVEY.md §2.1 S11).

Two generators:

1. `generate_http_log(spark, n, seed)` — the reference generator
   (reference src/generar_datos.py:16-79) re-expressed distributed: the
   reference walks one sequential `random.Random(seed)`, which cannot be
   parallelized; here every field is a pure function of (seed, row id) via
   the portable 60-bit MD5 hash, so the output is identical under any
   partitioning, task retry, or cluster size. `spark.range(n)` scales to
   any n with no driver materialization.

2. `http_log_from_events(events)` + `sql_http_log_cte()` — derives a raw
   *stringly-typed, deliberately dirtied* HTTP log from the driver's
   `events` table, exercising every coercion path of the cleaning layer
   (FIXTURES.md A1 dirty variant): null timestamps/endpoints, non-numeric
   status/elapsed, null and non-'ok' parse_result, query strings and
   variable path suffixes. The SQL twin lets the DuckDB oracle reproduce
   the identical log, making the whole clean->aggregate pipeline
   hash-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import salted, sql_salted

# Reference endpoint universe (reference src/generar_datos.py:9) widened
# with the variable-suffix and query-string shapes the normalizer must
# collapse (reference src/calcular_kpi.py:56-71).
ENDPOINTS = [
    "/get",
    "/post",
    "/status/403",
    "/basic-auth/usuario_test/clave123",
    "/cookies",
    "/xml",
    "/redirect-to?url=/get",
]

# Corruption moduli for the dirty log (arbitrary primes; one independent
# hash stream each so corruptions are uncorrelated).
MOD_TS_NULL = 53
MOD_EP_NULL = 59
MOD_STATUS_BAD = 37
MOD_ELAPSED_BAD = 41
MOD_PR_NULL = 29

STATUS_4XX = [400, 401, 404, 429]
STATUS_5XX = [500, 502, 503]


def _status_from_r(r, ep_idx):
    """88% 200 / 8% 4xx / 4% 5xx; /status/403 pinned (generar_datos.py:29-42)."""
    return (
        F.when(ep_idx == 2, F.lit(403))
        .when(r < 88, F.lit(200))
        .when(r < 96, F.element_at(F.array(*[F.lit(s) for s in STATUS_4XX]), ((r - 88) % 4 + 1).cast("int")))
        .otherwise(F.element_at(F.array(*[F.lit(s) for s in STATUS_5XX]), ((r - 96) % 3 + 1).cast("int")))
    )


def generate_http_log(spark: SparkSession, n: int, seed: int = 42, *, numPartitions: int | None = None) -> DataFrame:
    """S11 — n clean log records, deterministic under any parallelism.

    Matches the reference distributions (status mix, 5% parse errors,
    elapsed U(50,800) 2dp, trailing-3-days timestamps) but anchors "now"
    to a fixed epoch so runs are reproducible end-to-end.
    """
    ids = spark.range(0, n, 1, numPartitions) if numPartitions else spark.range(n)
    key = F.concat_ws(":", F.lit(str(seed)), F.col("id"))

    def stream(tag: str):
        return salted(tag, key)

    anchor = F.lit("2026-01-04 00:00:00").cast("timestamp")  # fixed "now"
    ts_offset = stream("ts") % (3 * 24 * 3600)
    ep_idx = (stream("ep") % 7).cast("int")
    r = stream("status") % 100
    elapsed = (stream("elapsed") % 75000) / 100.0 + 50.0  # U(50, 800) 2dp
    return ids.select(
        F.date_format(
            F.timestamp_add("SECOND", (-ts_offset).cast("int"), anchor), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("timestamp_utc"),
        F.element_at(F.array(*[F.lit(e.split("?", 1)[0]) for e in ENDPOINTS]), ep_idx + 1).alias("endpoint"),
        _status_from_r(r, ep_idx).alias("status_code"),
        elapsed.alias("elapsed_ms"),
        F.when(stream("parse") % 100 < 5, F.lit("error")).otherwise(F.lit("ok")).alias("parse_result"),
    )


def http_log_from_events(events: DataFrame) -> DataFrame:
    """Dirty raw log derived deterministically from the events table.

    Column mapping (FIXTURES.md B): ts -> timestamp_utc, value -> elapsed,
    event_id -> the hash-stream key for endpoints/status/corruption.
    All values are pure functions of (event_id, ts, value) so the DuckDB
    CTE from `sql_http_log_cte()` reproduces them bit-for-bit.

    Spread: callers that feed this from a scan with fewer splits than
    cores go through registry._spread_narrow_scan (round 19), which
    repartitions CONDITIONALLY — only when the scan cannot split (the
    local single-row-group fixture). An UNCONDITIONAL repartition here
    was measured and rejected in an earlier round: at scale the events
    scan has thousands of splits and a flat pre-spread would cost a full
    exchange of the fact table for nothing.
    """
    ev = events.select(
        "event_id",
        "ts",
        "value",
        (salted("ep", "event_id") % 7).cast("int").alias("ep_idx"),
        (salted("status", "event_id") % 100).alias("r"),
        F.floor(F.col("value") * 100).cast("long").alias("elapsed_int"),
        (salted("c_ts", "event_id") % MOD_TS_NULL).alias("c_ts"),
        (salted("c_ep", "event_id") % MOD_EP_NULL).alias("c_ep"),
        (salted("c_status", "event_id") % MOD_STATUS_BAD).alias("c_status"),
        (salted("c_elapsed", "event_id") % MOD_ELAPSED_BAD).alias("c_elapsed"),
        (salted("c_pr", "event_id") % MOD_PR_NULL).alias("c_pr"),
        (salted("parse", "event_id") % 100).alias("pr_r"),
    )
    return ev.select(
        F.when(F.col("c_ts") == 0, F.lit(None).cast("string"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .alias("timestamp_utc"),
        F.when(F.col("c_ep") == 0, F.lit(None).cast("string"))
        .otherwise(F.element_at(F.array(*[F.lit(e) for e in ENDPOINTS]), F.col("ep_idx") + 1))
        .alias("endpoint"),
        F.when(F.col("c_status") == 0, F.lit("N/A"))
        .otherwise(_status_from_r(F.col("r"), F.col("ep_idx")).cast("string"))
        .alias("status_code"),
        F.when(F.col("c_elapsed") == 0, F.lit("slow"))
        .otherwise(F.col("elapsed_int").cast("string"))
        .alias("elapsed_ms"),
        F.when(F.col("c_pr") == 0, F.lit(None).cast("string"))
        .when(F.col("pr_r") < 5, F.lit("error"))
        .when(F.col("pr_r") == 5, F.lit("warn"))
        .otherwise(F.lit("ok"))
        .alias("parse_result"),
    )


def sql_http_log_cte() -> str:
    """DuckDB CTE ('http_log') that mirrors http_log_from_events(events)."""

    def s(tag: str) -> str:
        return sql_salted(tag, "event_id")

    ep_list = "[" + ", ".join(f"'{e}'" for e in ENDPOINTS) + "]"
    s4 = "[" + ", ".join(str(x) for x in STATUS_4XX) + "]"
    s5 = "[" + ", ".join(str(x) for x in STATUS_5XX) + "]"
    return f"""
ev AS (
  SELECT
    event_id, ts, value,
    CAST({s('ep')} % 7 AS INT) AS ep_idx,
    {s('status')} % 100 AS r,
    CAST(floor(value * 100) AS BIGINT) AS elapsed_int,
    {s('c_ts')} % {MOD_TS_NULL} AS c_ts,
    {s('c_ep')} % {MOD_EP_NULL} AS c_ep,
    {s('c_status')} % {MOD_STATUS_BAD} AS c_status,
    {s('c_elapsed')} % {MOD_ELAPSED_BAD} AS c_elapsed,
    {s('c_pr')} % {MOD_PR_NULL} AS c_pr,
    {s('parse')} % 100 AS pr_r
  FROM events
),
http_log AS (
  SELECT
    CASE WHEN c_ts = 0 THEN NULL ELSE strftime(ts, '%Y-%m-%dT%H:%M:%SZ') END AS timestamp_utc,
    CASE WHEN c_ep = 0 THEN NULL ELSE {ep_list}[ep_idx + 1] END AS endpoint,
    CASE WHEN c_status = 0 THEN 'N/A'
         ELSE CAST(CASE WHEN ep_idx = 2 THEN 403
                        WHEN r < 88 THEN 200
                        WHEN r < 96 THEN {s4}[CAST((r - 88) % 4 AS INT) + 1]
                        ELSE {s5}[CAST((r - 96) % 3 AS INT) + 1] END AS VARCHAR)
    END AS status_code,
    CASE WHEN c_elapsed = 0 THEN 'slow' ELSE CAST(elapsed_int AS VARCHAR) END AS elapsed_ms,
    CASE WHEN c_pr = 0 THEN NULL
         WHEN pr_r < 5 THEN 'error'
         WHEN pr_r = 5 THEN 'warn'
         ELSE 'ok' END AS parse_result
  FROM ev
)"""


def sql_clean_log_cte() -> str:
    """DuckDB CTE ('clean_log') mirroring functions.cleaning.clean_http_log.

    Depends on the 'http_log' CTE from sql_http_log_cte().
    """
    return """
clean_log AS (
  SELECT
    strftime(strptime(timestamp_utc, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%d') AS date_utc,
    CASE WHEN starts_with(string_split(endpoint, '?')[1], '/status/') THEN '/status'
         WHEN starts_with(string_split(endpoint, '?')[1], '/basic-auth/') THEN '/basic-auth'
         ELSE string_split(endpoint, '?')[1] END AS endpoint_base,
    COALESCE(TRY_CAST(status_code AS INT), 0) AS status_code,
    COALESCE(TRY_CAST(elapsed_ms AS DOUBLE), 0.0) AS elapsed_ms,
    CASE WHEN TRY_CAST(status_code AS INT) IS NULL OR TRY_CAST(elapsed_ms AS DOUBLE) IS NULL
         THEN 'error' ELSE COALESCE(parse_result, 'error') END AS parse_result
  FROM http_log
  WHERE timestamp_utc IS NOT NULL AND endpoint IS NOT NULL
)"""
