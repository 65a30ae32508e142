"""Streaming KPI pipeline (SURVEY §7 step 7): the stream over a finite
JSONL directory must reproduce the batch cleaning + aggregation semantics,
with p90 approximate (documented divergence — exact percentile is not
incrementalizable)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cleaning import clean_http_log
from prueba_tecnica_http_client_etl_spark.streaming import kpi_stream as KS


ROWS = [
    # day 1, /get: two clean rows + one 4xx
    {"timestamp_utc": "2026-01-01T10:00:00Z", "endpoint": "/get", "status_code": "200", "elapsed_ms": "100.0", "parse_result": "ok"},
    {"timestamp_utc": "2026-01-01T11:00:00Z", "endpoint": "/get?x=1", "status_code": "200", "elapsed_ms": "200.0", "parse_result": "ok"},
    {"timestamp_utc": "2026-01-01T12:00:00Z", "endpoint": "/get", "status_code": "404", "elapsed_ms": "300.0", "parse_result": "ok"},
    # day 1, /status/...: collapsed base + 5xx + bad cast (-> error flag)
    {"timestamp_utc": "2026-01-01T13:00:00Z", "endpoint": "/status/500", "status_code": "500", "elapsed_ms": "50.0", "parse_result": "ok"},
    {"timestamp_utc": "2026-01-01T14:00:00Z", "endpoint": "/status/403", "status_code": "not_an_int", "elapsed_ms": "60.0", "parse_result": "ok"},
    # day 2: null parse_result -> 'error'; dropped row (null endpoint)
    {"timestamp_utc": "2026-01-02T09:00:00Z", "endpoint": "/post", "status_code": "201", "elapsed_ms": "80.0", "parse_result": None},
    {"timestamp_utc": "2026-01-02T09:30:00Z", "endpoint": None, "status_code": "200", "elapsed_ms": "10.0", "parse_result": "ok"},
]


@pytest.fixture(scope="module")
def stream_result(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    # two files -> at least two input splits for the directory source
    (d / "a.jsonl").write_text("\n".join(json.dumps(r) for r in ROWS[:4]))
    (d / "b.jsonl").write_text("\n".join(json.dumps(r) for r in ROWS[4:]))
    return KS.run_to_memory(spark, str(d), table_name="kpi_stream_test").collect()


def _by_key(rows):
    return {(r["date_utc"], r["endpoint_base"]): r.asDict() for r in rows}


def test_stream_matches_batch_counts(stream_result, spark):
    got = _by_key(stream_result)
    assert set(got) == {
        ("2026-01-01", "/get"),
        ("2026-01-01", "/status"),
        ("2026-01-02", "/post"),
    }
    g = got[("2026-01-01", "/get")]
    assert (g["requests_total"], g["success_2xx"], g["client_4xx"], g["server_5xx"]) == (3, 2, 1, 0)
    s = got[("2026-01-01", "/status")]
    # bad int cast -> status 0 (unclassified) + parse_result forced 'error'
    assert (s["requests_total"], s["success_2xx"], s["server_5xx"], s["parse_errors"]) == (2, 0, 1, 1)
    p = got[("2026-01-02", "/post")]
    # null parse_result -> 'error' (P7); null-endpoint row dropped (P2)
    assert (p["requests_total"], p["parse_errors"]) == (1, 1)


def test_streaming_quarantine_split(spark, tmp_path):
    """foreachBatch multi-sink: one scan, clean rows to silver, malformed
    lines to quarantine, exactly-once per batch."""
    good = json.dumps(ROWS[0])
    bad = '{"timestamp_utc": broken'
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join([good, bad, good]))
    (d / "b.jsonl").write_text("\n".join([good, bad]))
    counts = KS.run_with_quarantine(
        spark, str(d), str(tmp_path / "out"), checkpoint=str(tmp_path / "ckpt")
    )
    assert counts == {"silver": 3, "quarantine": 2}
    quarantined = {r["raw"] for r in spark.read.parquet(str(tmp_path / "out/quarantine")).collect()}
    assert quarantined == {bad}


def test_stream_agg_values_match_batch_engine(stream_result, spark):
    """avg must equal the batch engine's exactly; approx p90 must agree at
    this tiny cardinality (sketch is exact below its compression size)."""
    raw = spark.createDataFrame(
        [tuple(r.get(k) for k in ("timestamp_utc", "endpoint", "status_code", "elapsed_ms", "parse_result")) for r in ROWS],
        "timestamp_utc string, endpoint string, status_code string, elapsed_ms string, parse_result string",
    )
    from prueba_tecnica_http_client_etl_spark.operators.kpi import kpi_daily

    batch = {(r["date_utc"], r["endpoint_base"]): r.asDict() for r in kpi_daily(clean_http_log(raw)).collect()}
    got = _by_key(stream_result)
    assert set(got) == set(batch)
    for k, b in batch.items():
        assert abs(got[k]["avg_elapsed_ms"] - b["avg_elapsed_ms"]) < 1e-9, k


def test_stream_run_dirs_unique_and_age_bounded(tmp_path, monkeypatch):
    """Run output/checkpoint dirs are UNIQUE per invocation (a concurrent
    session's live checkpoint must never be cleared mid-query) under a
    root keyed by (kind, sf); disk stays bounded because superseded run
    dirs past the staleness window are swept on the next invocation."""
    import os
    import tempfile

    from prueba_tecnica_http_client_etl_spark import registry

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = str(tmp_path / "sf0.01")
    out1, ckpt1 = registry._stream_run_dirs(sf, "probe_test")
    (Path(out1) / "part-0000.parquet").write_text("x")
    (Path(ckpt1) / "offsets").mkdir()
    out2, ckpt2 = registry._stream_run_dirs(sf, "probe_test")
    # a fresh invocation gets its OWN dirs and leaves the live run intact
    assert out2 != out1 and ckpt2 != ckpt1
    assert (Path(out1) / "part-0000.parquet").exists()
    root = Path(out1).parent.parent
    assert Path(out2).parent.parent == root  # same (kind, sf) root
    assert len(list(root.iterdir())) == 2
    # a FINISHED run (marked _DONE) older than the staleness window is
    # swept on the next call
    old_run = Path(out1).parent
    registry._finish_stream_run(out1)
    assert (old_run / registry._RUN_DONE_MARKER).exists()
    import time

    hour_ago = time.time() - registry._STAGING_STALE_AFTER_S - 60
    os.utime(old_run, (hour_ago, hour_ago))
    # a marker-LESS sibling of the same age may be a concurrent
    # session's LIVE run (checkpoint writes never refresh the run dir's
    # own mtime) and must survive the normal threshold...
    live_run = Path(out2).parent
    os.utime(live_run, (hour_ago, hour_ago))
    registry._stream_run_dirs(sf, "probe_test")
    assert not old_run.exists()
    assert live_run.exists()
    # ...but a marker-less dir past the orphan threshold (a crashed run
    # that never marked) is still reclaimed — disk stays bounded
    ancient = time.time() - registry._ORPHAN_RUN_STALE_AFTER_S - 60
    os.utime(live_run, (ancient, ancient))
    registry._stream_run_dirs(sf, "probe_test")
    assert not live_run.exists()
    # distinct kinds / scale factors never collide
    out3, _ = registry._stream_run_dirs(str(tmp_path / "sf0.1"), "probe_test")
    out4, _ = registry._stream_run_dirs(sf, "other_kind")
    assert len({Path(p).parent.parent for p in (out1, out3, out4)}) == 3
