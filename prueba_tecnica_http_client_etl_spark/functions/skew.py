"""Skew-mitigation primitives for heavy-hitter keys (SURVEY §7 'salting
for skew').

AQE's skewJoin/coalesce handles most runtime skew automatically (on in
session.py), but two cases still need manual salting at 100 TB:

- aggregation on a key where one value holds a double-digit percentage of
  all rows (AQE splits skewed *join* partitions, not aggregation groups);
- clusters running without AQE, or sinks requiring a fixed partitioning.

`salted_agg` runs the classic two-stage plan: stage 1 aggregates on
(key, salt) — spreading a hot key over `n_salts` reducers — stage 2
merges the partials on the key alone. Correct for any aggregate with a
partial/merge decomposition (sum/count/min/max here).

The salt is derived from row content (xxhash64 of all columns), never
from RNG or partition id, so retries/replans produce identical splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic row-content salt in [0, n_salts)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, tuple[str, Column | str]], *, n_salts: int = 16) -> DataFrame:
    """Two-stage skew-safe aggregation.

    aggs maps output column -> (fn, input column), fn in sum|count|min|max.
    Example: salted_agg(ev, ["user_id"], {"n": ("count", "event_id"),
    "total": ("sum", "value")}).
    """
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(c) if fn == "count" else getattr(F, fn)(c)).alias(out)
            for out, (fn, c) in aggs.items()
        ]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )
    return stage2
