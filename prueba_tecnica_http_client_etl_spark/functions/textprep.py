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

# Double hashing (Broder-style): two md5 streams per shingle, the i-th
# permutation is h1 + i*h2 — 2 md5 evaluations per shingle instead of 16.
# h2 is reduced mod 2^56 so h1 + 15*h2 < 2^60 + 2^60 stays far from BIGINT
# overflow in both engines.
H2_MOD = 1 << 56


# Spark computes the pairs via explode + codegen aggregates
# (operators/dedup.py::_minhash_signatures); DuckDB stays in list form.
def duck_hash_pairs(shingles_col: str = "sh") -> str:
    h1 = duck_u60_of("'mha:' || s")
    h2 = duck_u60_of("'mhb:' || s")
    return f"list_transform({shingles_col}, s -> {{'h1': {h1}, 'h2': ({h2} % {H2_MOD})}})"


def duck_minhash(i: int, pairs_col: str = "hp") -> str:
    """i-th MinHash over the precomputed (h1, h2) pair list."""
    return f"list_min(list_transform({pairs_col}, p -> p.h1 + {i} * p.h2))"


def spark_band_hash(band: int) -> str:
    """LSH band signature: md5 over the band's minhash values."""
    parts = ", ".join(f"cast(mh{band * LSH_ROWS + r} as string)" for r in range(LSH_ROWS))
    return f"md5(concat_ws(',', {parts}))"


def duck_band_hash(band: int) -> str:
    parts = " || ',' || ".join(f"CAST(mh{band * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS))
    return f"md5({parts})"
