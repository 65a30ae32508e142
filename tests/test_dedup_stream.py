"""Streaming exact dedup: duplicates must be suppressed across micro-batch
boundaries (state store), not just within one batch, and the surviving row
must be the first occurrence."""

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
