"""Streaming exact dedup: duplicates must be suppressed across micro-batch
boundaries (state store), not just within one batch. The cross-batch
survivor is the earlier batch's doc; WITHIN a batch the survivor is
arbitrary (module docstring) — the assertions here check the digest set
and membership, never a specific within-batch winner."""

from __future__ import annotations

import json

from prueba_tecnica_http_client_etl_spark.streaming import dedup_stream as DS


def test_cross_batch_duplicate_suppression(spark, tmp_path):
    d = tmp_path / "docs_in"
    d.mkdir()
    # batch 1: two distinct texts (one with whitespace noise)
    (d / "a.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "hello  world"},
                {"doc_id": 2, "text": "other text"},
            ]
        )
    )
    # batch 2: doc 3 duplicates doc 1 after normalization; doc 4 is new
    (d / "b.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 3, "text": "Hello World"},
                {"doc_id": 4, "text": "fresh content"},
            ]
        )
    )
    got = DS.run_files_to_memory(
        spark, str(d), table_name="dedup_stream_test", one_file_per_batch=True
    ).collect()
    by_doc = {r["doc_id"] for r in got}
    # docs 1 and 3 share a normalized text: exactly one survives — whichever
    # batch ran first (the file source orders batches by listing, not name) —
    # and the other is dropped by the cross-batch state store.
    assert len(by_doc & {1, 3}) == 1
    assert {2, 4} <= by_doc
    assert len(got) == 3


def _ttl_corpus(tmp_path, n_per_file=10):
    """Three time-clustered files of DISTINCT texts: event times are
    synthesized from doc_id (timestamp_seconds), so the clusters sit
    ~11 days apart — far beyond a 1-second dedup horizon.

    ORDERING IS LOAD-BEARING (round-11 ADVICE): the tight-horizon
    test's completeness assertion (every digest emitted) holds only if
    FileStreamSource batches these files oldest-event-time-first — a
    later-time file processed first would advance the watermark past
    the earlier clusters and their rows would be dropped as late. The
    source picks files by modification time (default latestFirst=false
    = oldest mtime first), so we pin STRICTLY INCREASING mtimes in
    event-time order instead of relying on write-speed timing."""
    import os

    d = tmp_path / "ttl_in"
    d.mkdir()
    for fi, base in enumerate([0, 1_000_000, 2_000_000]):
        f = d / f"f{fi}.jsonl"
        f.write_text(
            "\n".join(
                json.dumps({"doc_id": base + i, "text": f"unique text {base + i}"})
                for i in range(n_per_file)
            )
        )
        t = 1_700_000_000 + fi * 10
        os.utime(f, (t, t))
    return str(d), 3 * n_per_file


def test_ttl_dedup_matches_batch_when_window_covers_replay(spark, tmp_path):
    """With the delay exceeding the replay's whole event-time span the
    TTL variant must behave exactly like the unbounded one: nothing
    evicted (state rows == distinct digests), every digest emitted
    once."""
    path, n_digests = _ttl_corpus(tmp_path)
    got, progress = DS.run_files_to_memory_ttl(
        spark, path, table_name="ttl_wide_test", delay="3650 days", one_file_per_batch=True
    )
    assert got.count() == n_digests
    assert progress["stateOperators"][0]["numRowsTotal"] == n_digests


def test_ttl_dedup_actually_evicts_state(spark, tmp_path):
    """With a 1-second horizon over clusters ~11 days apart, the
    watermark must evict expired digests between micro-batches: the
    final state store holds strictly fewer rows than the digests seen —
    the boundedness that makes this variant deployable on an unbounded
    stream (the exact-global variant's state only ever grows). All
    texts are distinct, so with the oldest-first batch order pinned by
    _ttl_corpus's mtimes no row is ever late and the emitted set is
    complete."""
    path, n_digests = _ttl_corpus(tmp_path)
    got, progress = DS.run_files_to_memory_ttl(
        spark, path, table_name="ttl_tight_test", delay="1 second", one_file_per_batch=True
    )
    assert got.count() == n_digests
    state_rows = progress["stateOperators"][0]["numRowsTotal"]
    # any batch order leaves at most the last batch's cluster plus the
    # tail of the max-time cluster alive; never the full digest set
    assert state_rows < n_digests, progress["stateOperators"][0]
    assert state_rows >= 1


def test_null_text_docs_are_filtered_not_collapsed(spark, tmp_path):
    """Round-12 review: docs with a missing/null text field hash to a
    NULL digest; dropDuplicates would collapse ALL of them onto one
    surviving row as if they were copies of each other. They carry no
    content identity and must be filtered out instead."""
    d = tmp_path / "null_docs_in"
    d.mkdir()
    (d / "a.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1},
                {"doc_id": 2, "text": None},
                {"doc_id": 3, "text": "real content here"},
            ]
        )
    )
    got = DS.run_files_to_memory(
        spark, str(d), table_name="dedup_null_test"
    ).collect()
    assert {r["doc_id"] for r in got} == {3}
    assert all(r["norm_md5"] is not None for r in got)
