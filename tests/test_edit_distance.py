"""Edit-distance near-dup tier: blocking losslessness (equality with the
unblocked all-pairs form), the short-tier bucket-cover lemma, and the
no-cartesian plan shape the blocking exists for.
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.dedup import (
    EDIT_MAX_DIST,
    EDIT_SHORT_MAX_SHINGLES,
    _edit_meta,
    dedup_edit_distance,
)


def test_edit_blocking_is_lossless(spark):
    """The shared-shingle + short-tier candidate generation may only prune
    pairs that cannot be within EDIT_MAX_DIST: the verified output must
    equal the unblocked all-pairs band-join. Run at sf0.01 where real
    near-dup pairs exist (24 of them) so the equality has teeth."""
    sf = "/root/testdata/sf0.01"
    blocked = sorted(map(tuple, dedup_edit_distance(spark, sf).collect()))
    meta = _edit_meta(spark, sf)
    a = meta.select(
        F.col("doc_id").alias("doc_a"), F.col("norm").alias("na"), F.col("nlen").alias("len_a")
    )
    b = meta.select(
        F.col("doc_id").alias("doc_b"), F.col("norm").alias("nb"), F.col("nlen").alias("len_b")
    )
    naive = (
        a.join(
            b,
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= EDIT_MAX_DIST),
        )
        .withColumn("ed", F.levenshtein(F.col("na"), F.col("nb"), EDIT_MAX_DIST))
        .filter((F.col("ed") >= 0) & (F.col("ed") <= EDIT_MAX_DIST))
        .select("doc_a", "doc_b", "len_a", "len_b", F.col("ed").cast("long").alias("edit_distance"))
    )
    assert blocked == sorted(map(tuple, naive.collect()))
    assert len(blocked) > 0


def test_edit_pairs_respect_the_contract(spark):
    """Every emitted pair is ordered, inside the length band, and at a
    distance that a direct re-computation confirms."""
    sf = "/root/testdata/sf0.01"
    rows = dedup_edit_distance(spark, sf).collect()
    texts = {
        r["doc_id"]: r["norm"] for r in _edit_meta(spark, sf).select("doc_id", "norm").collect()
    }
    for r in rows:
        assert r.doc_a < r.doc_b
        assert abs(r.len_a - r.len_b) <= EDIT_MAX_DIST
        assert 0 <= r.edit_distance <= EDIT_MAX_DIST
        na, nb = texts[r.doc_a], texts[r.doc_b]
        assert _levenshtein(na, nb, EDIT_MAX_DIST + 1) == r.edit_distance


def _levenshtein(a: str, b: str, cap: int) -> int:
    """Plain reference DP (banded only by the early-exit cap)."""
    if abs(len(a) - len(b)) >= cap:
        return cap
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        if min(cur) >= cap:
            return cap
        prev = cur
    return min(prev[-1], cap)


def test_no_cartesian_in_the_executed_plan(spark):
    """The point of the blocking: candidate generation is equi-joins on
    shingle / bucket keys — no CartesianProduct or nested-loop join may
    appear anywhere in the plan."""
    plan = (
        dedup_edit_distance(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


# --- pure-model property: the short-tier bucket-cover lemma -------------------

_K = EDIT_MAX_DIST


@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=-_K, max_value=_K))
def test_short_tier_buckets_cover_the_length_band(la, delta):
    """Each doc posts floor(len/(k+1)) and its successor; any pair with
    |Δlen| <= k must collide on at least one posted key (the blocking is
    a COVER, so dropping either key would lose pairs)."""
    lb = la + delta
    if lb < 0:
        return
    ka = {la // (_K + 1), la // (_K + 1) + 1}
    kb = {lb // (_K + 1), lb // (_K + 1) + 1}
    assert ka & kb


def test_short_floor_matches_the_derivation():
    """2*q*k with q=3 token shingles — the floor the losslessness comment
    derives; a silent constant drift would invalidate the lemma."""
    assert EDIT_SHORT_MAX_SHINGLES == 2 * 3 * EDIT_MAX_DIST


def test_ultra_floor_matches_the_q1_derivation():
    """The token tier is the q=1 instance of the same lemma: a char edit
    destroys at most 2 token occurrences, so only docs with <= 2k
    distinct tokens may fall through to the length-bucket ultra tier."""
    from prueba_tecnica_http_client_etl_spark.operators.dedup import EDIT_ULTRA_MAX_TOKENS

    assert EDIT_ULTRA_MAX_TOKENS == 2 * EDIT_MAX_DIST


# --- pure-model property: the q-gram survival lemmas themselves ---------------
#
# The blocking's losslessness rests on two claims about CHARACTER edits:
# (shingle lemma) a pair within edit distance k where either side has
# > 2qk distinct 3-token shingles shares a shingle; (token lemma) where
# either side has > 2k distinct tokens, shares a token. Both are
# exercised here directly: random base strings over a tiny alphabet get
# <= k random character edits (insert/delete/substitute, spaces
# included, so tokens split and merge), and whenever the floor condition
# holds the derived sets must intersect.

import random as _random


def _toks(s: str) -> list[str]:
    return [t for t in " ".join(s.split()).split(" ") if t]


def _shingles(toks: list[str]) -> set[str]:
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


@given(
    st.integers(min_value=0, max_value=10_000_000),
    st.integers(min_value=0, max_value=_K),
)
def test_edit_survival_lemmas_on_random_edits(seed, n_edits):
    rng = _random.Random(seed)
    alphabet = "ab x"  # tiny alphabet makes token splits/merges frequent
    base = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 120)))
    edited = list(base)
    for _ in range(n_edits):
        op = rng.choice("ids")
        pos = rng.randrange(len(edited) + 1) if op == "i" else (
            rng.randrange(len(edited)) if edited else 0
        )
        if op == "i":
            edited.insert(pos, rng.choice(alphabet))
        elif edited and op == "d":
            del edited[pos]
        elif edited:
            edited[pos] = rng.choice(alphabet)
    other = "".join(edited)
    ta, tb = _toks(base), _toks(other)
    if not ta or not tb:
        return
    sa, sb = _shingles(ta), _shingles(tb)
    da, db = set(ta), set(tb)
    # true edit distance <= n_edits by construction
    if max(len(sa), len(sb)) > 2 * 3 * _K:
        assert sa & sb, (base, other)
    if max(len(da), len(db)) > 2 * _K:
        assert da & db, (base, other)
