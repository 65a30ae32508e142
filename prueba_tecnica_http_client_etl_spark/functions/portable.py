"""Engine-portable deterministic primitives.

Several operators (synthetic data generation, MinHash/SimHash dedup,
deterministic sampling) need per-row pseudo-randomness that is

  (a) deterministic under ANY partitioning / task retry — so it must be a
      pure function of row values, never of partition index or RNG state
      (Spark's F.rand(seed) is only partition-stable; a repartition changes
      results), and
  (b) reproducible by the DuckDB oracle — so it must be built from
      functions both engines define identically.

MD5 is the common denominator: both Spark (`F.md5`) and DuckDB (`md5`)
produce the same lowercase hex digest for the same UTF-8 string. We take the
first 15 hex chars (60 bits, always < 2^60 so it fits a signed 64-bit int in
both engines) as a uniform integer. Each logical "random stream" salts the
input with a distinct tag.

Rounding: Spark's `round()` on DOUBLE goes through BigDecimal HALF_UP of the
exact binary value while DuckDB's rounds the shortest decimal representation
— they disagree on ties (e.g. 2.675). `round2()` here is
floor(x*100 + 0.5)/100 computed in IEEE double, bit-identical in both
engines for the non-negative values this engine rounds.

Each helper has a Python (Column) form and a `sql_*` twin that emits the
equivalent DuckDB SQL snippet, so Spark query and oracle derive from one
definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def u60(col: Column | str) -> Column:
    """Uniform 60-bit non-negative int from a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_u60(expr: str) -> str:
    """DuckDB twin of u60 over a VARCHAR SQL expression."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def salted(tag: str, col: Column | str) -> Column:
    """60-bit hash of '<tag>:<value>' — one independent stream per tag."""
    c = F.col(col) if isinstance(col, str) else col
    return u60(F.concat(F.lit(tag + ":"), c.cast("string")))


def sql_salted(tag: str, expr: str) -> str:
    return sql_u60(f"'{tag}:' || CAST({expr} AS VARCHAR)")


def round2(col: Column | str) -> Column:
    """Portable 2-dp rounding: floor(x*100 + 0.5)/100 (non-negative x)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)) / 100


def sql_round2(expr: str) -> str:
    return f"(floor(({expr}) * 100 + 0.5) / 100)"


def exact_sum(col: Column, scale: int = 100) -> Column:
    """Order-independent double sum: integerize each summand (fixed-point,
    e.g. cents) BEFORE summing, so the aggregate is an exact integer sum —
    identical under any partitioning, and identical to the oracle (DuckDB
    associates windowed/grouped double sums differently, e.g. via segment
    trees, so plain double sums differ in the last ulp and can flip a
    rounding). Per-row double arithmetic is deterministic; only the
    summation order isn't."""
    return F.sum(F.floor(col * scale + F.lit(0.5)).cast("long")).cast("double") / scale


def sql_exact_sum(expr: str, scale: int = 100) -> str:
    return f"(CAST(sum(CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)) AS DOUBLE) / {scale})"


def exact_avg(col: Column, scale: int = 100) -> Column:
    """Order-independent mean: exact integer sum / count."""
    return exact_sum(col, scale) / F.count(F.lit(1))


def sql_exact_avg(expr: str, scale: int = 100) -> str:
    return f"({sql_exact_sum(expr, scale)} / count(*))"


def epoch_seconds(col: Column | str) -> Column:
    """Timestamp -> fractional epoch seconds, NTZ-safe (NTZ interpreted as
    UTC wall clock, matching DuckDB's naive-timestamp epoch())."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def roundn(col: Column | str, n: int) -> Column:
    """Portable n-dp rounding (non-negative x)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = 10**n
    return F.floor(c * scale + F.lit(0.5)) / scale


def sql_roundn(expr: str, n: int) -> str:
    scale = 10**n
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
