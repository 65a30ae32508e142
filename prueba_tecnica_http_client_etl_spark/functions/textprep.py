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
LSH_BANDS = 8
LSH_ROWS = NUM_MINHASHES // LSH_BANDS

# Permutation family: pairwise-independent linear hashes over the Mersenne
# prime field P = 2^31 - 1. One md5 per shingle gives the base point
# x = u60('mh:'+s) mod P; the i-th permutation is (A_i*x + B_i) mod P with
# fixed per-permutation coefficients derived from md5 at import time (plain
# integer literals by the time they reach either engine). A_i < 2^31 and
# x < 2^31 keep the product < 2^62 — exact BIGINT in both engines.
#
# This replaced the earlier Broder-style double hashing (h1 + i*h2): the
# minhash_calibration audit measured its permutations as strongly
# CORRELATED — the min was dominated by globally-small (h1, h2) shingles,
# so candidate pairs with true J ~ 0.01 showed 0.67 mean signature
# agreement (~50:1 false-positive candidates at sf0.1), and near-identical
# docs differing exactly in the min-achieving shingle missed ALL bands
# together (measured recall 0.92 at sf0.01, missing pairs of true J 0.90
# and 0.955; 0.992 at sf0.1, missing 2 of 256). With independent
# permutations the per-permutation agreement probability is J exactly;
# banding moved from 4x4 to 8x2 so the s-curve midpoint (1/b)^(1/r) ~ 0.35
# targets the 0.5 verify threshold with P[candidate | J=0.5] ~ 0.90 and
# P[miss | J=0.9] ~ (1-0.81)^8 ~ 2e-6. Measured after the change
# (exact inverted-index ground truth): recall 1.0000 at BOTH sf0.01
# (25/25) and sf0.1 (256/256); false-positive candidates 138 -> 8 at
# sf0.01 and 12,890 -> 939 at sf0.1 (13.7x less exact-verify join work —
# the dominant LSH cost at 100 TB); calibration bins now track J
# (bin-9 mean_est 0.9691 vs mean_exact 0.9733 at sf0.1).
MH_P = (1 << 31) - 1


def _mh_coef(tag: str, i: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:15], 16)


MH_A = [(_mh_coef("mh_a", i) % (MH_P - 1)) + 1 for i in range(NUM_MINHASHES)]
MH_B = [_mh_coef("mh_b", i) % MH_P for i in range(NUM_MINHASHES)]


# Spark computes the base hashes via explode + codegen aggregates
# (operators/dedup.py::_minhash_signatures); DuckDB stays in list form.
def duck_shingle_hashes(shingles_col: str = "sh") -> str:
    """Base-point list: one 31-bit field element per shingle."""
    return f"list_transform({shingles_col}, s -> {duck_u60_of(chr(39) + 'mh:' + chr(39) + ' || s')} % {MH_P})"


def duck_minhash(i: int, hashes_col: str = "hp") -> str:
    """i-th MinHash: min of the i-th linear permutation over the base list."""
    return f"list_min(list_transform({hashes_col}, x -> ({MH_A[i]} * x + {MH_B[i]}) % {MH_P}))"


def spark_band_hash(band: int) -> str:
    """LSH band signature: md5 over the band's minhash values."""
    parts = ", ".join(f"cast(mh{band * LSH_ROWS + r} as string)" for r in range(LSH_ROWS))
    return f"md5(concat_ws(',', {parts}))"


def duck_band_hash(band: int) -> str:
    parts = " || ',' || ".join(f"CAST(mh{band * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS))
    return f"md5({parts})"
