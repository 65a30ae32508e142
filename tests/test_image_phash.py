"""Perceptual image dedup (dHash + Hamming-band blocking): the real
PGM pixel decoder must agree with the arithmetic cell grid the DuckDB
oracle recomputes, malformed containers must raise (never silently
zero), the banding must be pigeonhole-lossless at the threshold, and
the Spark pair plan must not broadcast a corpus-sized side.

Spark-vs-DuckDB value parity for both registered queries is covered by
tests/test_oracle_parity.py like every other operator.
"""

from __future__ import annotations

import pytest

from prueba_tecnica_http_client_etl_spark.operators import multimodal as M

from tests.conftest import SF_SMOKE


def _ref_hash(doc_id: int) -> int:
    """dHash straight from the arithmetic cell grid — no byte parsing."""
    v = M._ph_cell_grid(doc_id)
    h = 0
    for cy in range(M._PH_GRID):
        for cx in range(M._PH_GRID - 1):
            if v[cy, cx + 1] > v[cy, cx]:
                h |= 1 << (cy * (M._PH_GRID - 1) + cx)
    return h


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_decoder_matches_arithmetic_grid():
    # covers comment headers (%11), all perturbation variants (%4), and
    # both parities of the base pattern
    for doc_id in list(range(48)) + [110, 121, 132, 495, 4996]:
        payload = M.build_grid_image_payload(doc_id)
        assert M.phash_of_payload(payload) == _ref_hash(doc_id), doc_id


def test_malformed_pgm_raises():
    good = M.build_grid_image_payload(7)
    for bad in (
        b"P4" + good[2:],              # wrong magic
        good[:10],                     # truncated header
        good[: len(good) - 5],         # truncated pixel data
        b"P5\n0 32\n255\n",            # zero width
        b"P5\n32 32\n70000\n" + b"\0" * 2048,  # 16-bit maxval out of scope
        b"P5\nxx 32\n255\n" + b"\0" * 2048,    # junk header token
        # non-whitespace byte after maxval: consuming it would shift
        # every pixel by one (ADVICE r16 — raise, never misparse)
        b"P5\n32 32\n255!" + b"\0" * 1024,
    ):
        with pytest.raises(ValueError):
            M.phash_of_payload(bad)


def test_family_structure_and_bands():
    """Variants of a family stay within a few bits (the base-vs-variant
    pairs within the lossless threshold), all their differing bits live
    in band 0, and unrelated images sit far apart."""
    for base in range(40):
        h0 = _ref_hash(base * M._PH_GROUP)
        for k in range(1, M._PH_GROUP):
            hk = _ref_hash(base * M._PH_GROUP + k)
            assert _ham(h0, hk) <= 2  # one perturbed cell = at most 2 bits
            # diffs confined to band 0 (perturbation cells are in rows 0-1)
            assert (h0 ^ hk) >> M._PH_BAND_BITS == 0
    far = [_ham(_ref_hash(i * 4), _ref_hash(1000 + i * 4)) for i in range(50)]
    assert min(far) > M._PH_AUDIT_K  # families never collide with strangers


def test_banding_is_pigeonhole_lossless():
    """Any pair within Hamming <= _PH_HAMMING_K shares at least one of
    the _PH_BANDS exact band values (the candidate-generation contract);
    checked over every within-threshold pair of the first 400 docs."""
    mask = (1 << M._PH_BAND_BITS) - 1
    sigs = [_ref_hash(d) for d in range(400)]

    def bands(h):
        return [(h >> (M._PH_BAND_BITS * b)) & mask for b in range(M._PH_BANDS)]

    checked = 0
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            if _ham(sigs[i], sigs[j]) <= M._PH_HAMMING_K:
                assert any(x == y for x, y in zip(bands(sigs[i]), bands(sigs[j])))
                checked += 1
    assert checked > 100  # the corpus genuinely exercises the property


def _assert_pair_join_never_broadcasts(plan: str) -> None:
    """The corpus-sized band self-join must stay a merge join; the ONLY
    broadcast allowed is the valve's LeftAnti against the (tiny) hot
    bucket set — an Inner broadcast would be Catalyst auto-broadcasting
    a corpus-scaling side off a small-cached-size estimate (the
    round-14 lesson)."""
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "LeftAnti" in line, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_phash_pair_plan_avoids_corpus_broadcast(spark):
    """Both sides of the band self-join scale with the corpus; the merge
    hints must hold against Catalyst's small-cached-size broadcast
    estimate (the round-14 auto-broadcast lesson)."""
    plan = M.dedup_image_phash(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    _assert_pair_join_never_broadcasts(plan)
    assert "MapInPandas" in plan or "TableCacheQueryStage" in plan or "Scan ExistingRDD" in plan


# --- audio envelope fingerprint (shares the banding machinery) ---------------


def test_audio_decoder_matches_arithmetic_envelope():
    def ref(doc_id: int) -> int:
        base, k = divmod(doc_id, M._PH_GROUP)
        means = []
        for f in range(M._AF_FRAMES):
            a = M._af_frame_amp(base, f)
            if k in M._AF_PERT and M._AF_PERT[k] == f:
                a = (a + 128) % M._PH_VMOD
            means.append(a)
        h = 0
        for row in range(M._PH_GRID):
            for i in range(M._PH_GRID - 1):
                if means[row * M._PH_GRID + i + 1] > means[row * M._PH_GRID + i]:
                    h |= 1 << (row * (M._PH_GRID - 1) + i)
        return h

    for doc_id in list(range(48)) + [497, 4999]:
        payload = M.build_tone_wav_payload(doc_id)
        assert M.audio_fingerprint_of_payload(payload) == ref(doc_id), doc_id


def test_audio_fingerprint_rejects_malformed_and_wrong_formats():
    good = M.build_tone_wav_payload(7)
    for bad in (
        good[:40],                       # truncated
        b"RIFX" + good[4:],              # wrong magic
        M.build_audio_payload(8),        # real WAV but 16-bit stereo-ish
    ):
        with pytest.raises(ValueError):
            M.audio_fingerprint_of_payload(bad)


def test_audio_families_confined_to_band_zero():
    for base in range(30):
        h0 = M.audio_fingerprint_of_payload(M.build_tone_wav_payload(base * 4))
        for k in range(1, 4):
            hk = M.audio_fingerprint_of_payload(M.build_tone_wav_payload(base * 4 + k))
            assert bin(h0 ^ hk).count("1") <= 2
            assert (h0 ^ hk) >> M._PH_BAND_BITS == 0


def test_audio_pair_plan_avoids_corpus_broadcast(spark):
    """Same guard as the image tier — the shared _banded_hamming_pairs
    plan must keep its merge hints against both signature artifacts."""
    plan = (
        M.dedup_audio_fingerprint(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    _assert_pair_join_never_broadcasts(plan)


# --- video frame-containment dedup --------------------------------------------


def test_video_container_walker_contract():
    good = M.build_video_payload(5)
    hashes = M.video_frame_hashes(good)
    assert len(hashes) == M._VID_FRAMES - M._VID_TRUNC * (5 % M._PH_GROUP)
    for bad in (
        b"XID0" + good[4:],            # wrong magic
        good[:30],                     # truncated frame table
        good + b"\x00",                # trailing bytes
        good[:8] + b"\xff\xff\xff\xff" + good[12:],  # lying frame length
    ):
        with pytest.raises(ValueError):
            M.video_frame_hashes(bad)


def test_video_family_containment_structure():
    """Variant k truncates 2k frames and swaps one for noise: family
    pairs must sit at containment >= 0.88 while cross-family videos
    share zero fingerprints."""
    H = {d: set(M.video_frame_hashes(M.build_video_payload(d))) for d in range(16)}
    for base in range(2):
        ids = [base * 4 + k for k in range(4)]
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                sh, mn = len(H[a] & H[b]), min(len(H[a]), len(H[b]))
                assert sh * 10 >= 7 * mn, (a, b, sh, mn)
    assert not (H[0] | H[1] | H[2] | H[3]) & (H[4] | H[5] | H[6] | H[7])
