"""Semantic and plan-shape checks for the round-5 operators:
bpe_pair_counts (tokenizer-training bigram pass), domain_mixture_plan
(temperature-weighted source sampling), and dedup_survivors
(quality-aware duplicate-cluster survivor selection) — the invariants the
oracle hash can't see (tests/test_oracle_parity.py covers value parity).
"""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMOKE


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_pair_counts_is_take_ordered_and_consistent(spark):
    from prueba_tecnica_http_client_etl_spark.operators.corpus import (
        BPE_PAIR_TOPK,
        bpe_pair_counts,
    )

    df = bpe_pair_counts(spark, SF_SMOKE)
    # top-k must be per-partition heaps + driver merge, never a global sort
    assert "TakeOrderedAndProject" in _physical(df), _physical(df)
    rows = df.collect()
    assert 0 < len(rows) <= BPE_PAIR_TOPK
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.n_docs <= r.n_occurrences for r in rows)
    # a pair occurs at most (occurrences of its left unigram) times
    from prueba_tecnica_http_client_etl_spark.operators.corpus import vocab_topk

    uni = {r.tok: r.n_occurrences for r in vocab_topk(spark, SF_SMOKE).collect()}
    for r in rows:
        if r.pair_left in uni:
            assert r.n_occurrences <= uni[r.pair_left], r


def test_domain_mixture_plan_distributions_and_monotonicity(spark):
    from prueba_tecnica_http_client_etl_spark.operators.corpus import domain_mixture_plan

    rows = domain_mixture_plan(spark, SF_SMOKE).collect()
    assert rows, "empty plan"
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.temp_weight for r in rows) - 1.0) < 1e-4
    # temperature flattens the distribution: smaller raw share => larger
    # oversampling factor, up to the floor(sqrt) step granularity
    # (w = floor(sqrt(T)) makes near-equal sources tie unpredictably)
    by_share = sorted(rows, key=lambda r: r.tokens_total)
    factors = [r.sampling_factor for r in by_share]
    for earlier, later in zip(factors, factors[1:]):
        assert earlier >= later - 0.02, factors
    assert factors[0] > factors[-1], factors
    # mass conservation: temp_weight == sampling_factor * raw_share (to rounding)
    for r in rows:
        assert abs(r.temp_weight - r.sampling_factor * r.raw_share) < 5e-4, r


def test_dedup_survivors_one_keeper_per_cluster_best_score(spark):
    from prueba_tecnica_http_client_etl_spark.operators.curation import dedup_survivors
    from prueba_tecnica_http_client_etl_spark.operators.dedup import dedup_components

    rows = dedup_survivors(spark, SF_SMOKE).collect()
    assert rows, "no clusters at smoke scale — fixture drift"
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.component_id].append(r)
    for cid, members in clusters.items():
        keepers = [m for m in members if m.decision == "keep"]
        assert len(keepers) == 1, (cid, members)
        best = max(members, key=lambda m: (m.score, -m.doc_id))
        assert keepers[0].doc_id == best.doc_id, (cid, keepers[0], best)
        assert all(m.n_members == len(members) for m in members)
    # every clustered doc gets a decision: the member set IS the
    # components output
    comp_ids = {r.doc_id for r in dedup_components(spark, SF_SMOKE).collect()}
    assert {r.doc_id for r in rows} == comp_ids


def test_source_overlap_matrix_symmetric_bounds(spark):
    from prueba_tecnica_http_client_etl_spark.operators.textops import (
        source_overlap_matrix,
    )

    df = source_overlap_matrix(spark, SF_SMOKE)
    # the per-source totals are tiny dims: both sides must broadcast
    plan = _physical(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    rows = df.collect()
    assert rows, "no overlapping source pairs at smoke scale"
    for r in rows:
        assert r.source_a < r.source_b, r
        assert 0 < r.n_common <= min(r.n_a, r.n_b), r
        denom = r.n_a + r.n_b - r.n_common
        assert abs(r.jaccard - r.n_common / denom) < 1e-6, r
    # ordered pairs are unique
    keys = [(r.source_a, r.source_b) for r in rows]
    assert len(keys) == len(set(keys))


def test_doc_commonness_exact_totals(spark):
    from prueba_tecnica_http_client_etl_spark.operators.textops import doc_commonness
    from prueba_tecnica_http_client_etl_spark.operators.dedup import docs_normalized

    rows = doc_commonness(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.toks
        for r in docs_normalized(spark, SF_SMOKE).select("doc_id", "toks").collect()
    }
    assert {r.doc_id for r in rows} == set(docs)
    # recompute the exact-integer contract in plain Python
    from collections import Counter

    vocab = Counter(t for toks in docs.values() for t in toks)
    for r in rows:
        toks = docs[r.doc_id]
        assert r.n_tokens == len(toks), r
        assert r.freq_sum == sum(vocab[t] for t in toks), r
        assert abs(r.mean_tok_freq - r.freq_sum / r.n_tokens) < 1e-3, r


def test_duplicate_rate_by_source_against_exact_dedup(spark):
    from prueba_tecnica_http_client_etl_spark.operators.dedup import (
        dedup_exact,
        duplicate_rate_by_source,
        docs_normalized,
    )

    rows = duplicate_rate_by_source(spark, SF_SMOKE).collect()
    n_docs_total = docs_normalized(spark, SF_SMOKE).count()
    exact = dedup_exact(spark, SF_SMOKE).collect()
    # cross-operator invariant: total dups == sum over digests of (n-1)
    total_dups_expected = sum(r.n_copies - 1 for r in exact)
    assert sum(r.n_exact_dups for r in rows) == total_dups_expected
    assert sum(r.n_docs for r in rows) == n_docs_total
    for r in rows:
        assert 0 <= r.n_exact_dups < r.n_docs, r
        assert r.n_distinct_texts + r.n_exact_dups >= r.n_docs, r
        assert abs(r.dup_rate - r.n_exact_dups / r.n_docs) < 1e-6, r


def test_dedup_cluster_sizes_consistent_with_components(spark):
    from collections import Counter

    from prueba_tecnica_http_client_etl_spark.operators.dedup import (
        dedup_cluster_sizes,
        dedup_components,
    )

    rows = dedup_cluster_sizes(spark, SF_SMOKE).collect()
    comp = dedup_components(spark, SF_SMOKE).collect()
    sizes = Counter(Counter(r.component_id for r in comp).values())
    assert {r.cluster_size: r.n_clusters for r in rows} == dict(sizes)
    for r in rows:
        assert r.cluster_size >= 2  # a cluster needs at least one dup pair
        assert r.n_docs == r.cluster_size * r.n_clusters
    assert sum(r.n_docs for r in rows) == len(comp)


def test_pii_stats_by_source_totals_match_pii_scrub(spark):
    from prueba_tecnica_http_client_etl_spark.operators.curation import (
        pii_scrub,
        pii_stats_by_source,
    )

    rows = pii_stats_by_source(spark, SF_SMOKE).collect()
    docs = pii_scrub(spark, SF_SMOKE).collect()
    assert sum(r.n_emails for r in rows) == sum(d.n_emails for d in docs)
    assert sum(r.n_phones for r in rows) == sum(d.n_phones for d in docs)
    assert sum(r.n_ips for r in rows) == sum(d.n_ips for d in docs)
    n_with = sum(1 for d in docs if d.n_emails + d.n_phones + d.n_ips > 0)
    assert sum(r.n_docs_with_pii for r in rows) == n_with
    for r in rows:
        assert 0 <= r.n_docs_with_pii <= r.n_docs
        assert abs(r.pii_doc_rate - r.n_docs_with_pii / r.n_docs) < 1e-6


def test_lang_confusion_is_complete_partition(spark):
    from collections import Counter

    from prueba_tecnica_http_client_etl_spark.operators.textops import (
        lang_confusion,
        lang_id,
    )

    rows = lang_confusion(spark, SF_SMOKE).collect()
    pred = lang_id(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rows) == len(pred)
    cells = Counter((p.labeled_lang, p.predicted_lang) for p in pred)
    assert {(r.labeled_lang, r.predicted_lang): r.n_docs for r in rows} == dict(cells)
    # per-labeled-class rates sum to 1
    from collections import defaultdict

    by_label = defaultdict(float)
    for r in rows:
        by_label[r.labeled_lang] += r.rate_in_class
    assert all(abs(v - 1.0) < 1e-4 for v in by_label.values()), dict(by_label)


def test_image_decode_stats_real_parser_round_trip(spark):
    from prueba_tecnica_http_client_etl_spark.operators.multimodal import (
        _COMMENT_MOD,
        _TOPDOWN_MOD,
        _TWO_BYTE_MOD,
        build_image_payload,
        decode_image,
        image_decode_stats,
    )

    # Python-level: every geometry variant round-trips through the real
    # parser (comments, 2-byte samples, top-down BMPs, row padding)
    for doc_id in list(range(0, 60)) + [3 * 5 * 7 * 11, 105, 210, 330]:
        meta = decode_image(build_image_payload(doc_id))
        assert meta["width"] == doc_id % 29 + 2, doc_id
        assert meta["height"] == doc_id % 17 + 2, doc_id
        k = doc_id % 3
        assert meta["fmt"] == {0: "ppm", 1: "pgm", 2: "bmp"}[k], doc_id
    # corrupted payloads must NOT silently parse
    import pytest as _pytest

    good = build_image_payload(0)
    with _pytest.raises(ValueError):
        decode_image(good[: len(good) // 2])  # truncated pixels
    with _pytest.raises(ValueError):
        decode_image(b"GIF89a not supported")

    # Spark-level: the aggregate covers all three formats and every doc
    rows = image_decode_stats(spark, SF_SMOKE).collect()
    assert {r.fmt for r in rows} == {"ppm", "pgm", "bmp"}
    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_images for r in rows) == n_docs
