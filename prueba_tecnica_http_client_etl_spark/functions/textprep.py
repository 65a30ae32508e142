"""Shared text-preparation expressions for the LLM-data-pipeline operators
(dedup, similarity, text analysis) — each as a Spark SQL expression string
plus its DuckDB twin, so query and oracle derive from one definition.

Normalization contract (both engines, bit-identical):
  norm     = regexp-collapse whitespace of lower(trim(text))
  toks     = norm split on single space (no empty tokens by construction)
  shingles = distinct 3-word shingles; docs with <3 tokens fall back to
             the whole normalized text as a single shingle

Hashing uses the md5-based `u60` primitive from portable.py (same 60-bit
integer in Spark and DuckDB), salted per logical stream ('mh<i>:', 'sh:',
'fp:'), so MinHash/SimHash/fingerprints are pure functions of the text —
deterministic under any partitioning, task retry, or engine.
"""

from __future__ import annotations

# --- normalization -----------------------------------------------------------

# Spark: regexp_replace replaces all matches by default.
SPARK_NORM = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
# DuckDB: needs the 'g' flag for replace-all.
DUCK_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

SPARK_TOKS = "split(norm, ' ')"
DUCK_TOKS = "string_split(norm, ' ')"

# 3-word shingles, distinct. Spark arrays are 0-based, DuckDB 1-based.
SPARK_SHINGLES = (
    "array_distinct(CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
    "ELSE array(norm) END)"
)
DUCK_SHINGLES = (
    "list_distinct(CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(len(toks) - 2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) "
    "ELSE [norm] END)"
)


def spark_u60_of(expr: str) -> str:
    """60-bit md5 hash of a string expression (Spark SQL snippet)."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def duck_u60_of(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# --- MinHash -----------------------------------------------------------------

NUM_MINHASHES = 16
LSH_BANDS = 4
LSH_ROWS = NUM_MINHASHES // LSH_BANDS


def spark_minhash(i: int, shingles_col: str = "sh") -> str:
    """i-th MinHash: min over shingles of u60('mh<i>:' || shingle)."""
    hashed = spark_u60_of(f"concat('mh{i}:', s)")
    return f"array_min(transform({shingles_col}, s -> {hashed}))"


def duck_minhash(i: int, shingles_col: str = "sh") -> str:
    hashed = duck_u60_of(f"'mh{i}:' || s")
    return f"list_min(list_transform({shingles_col}, s -> {hashed}))"


def spark_band_hash(band: int) -> str:
    """LSH band signature: md5 over the band's minhash values."""
    parts = ", ".join(f"cast(mh{band * LSH_ROWS + r} as string)" for r in range(LSH_ROWS))
    return f"md5(concat_ws(',', {parts}))"


def duck_band_hash(band: int) -> str:
    parts = " || ',' || ".join(f"CAST(mh{band * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS))
    return f"md5({parts})"
