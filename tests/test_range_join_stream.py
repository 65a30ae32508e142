"""Stream-stream interval join: the watermarked views x purchases band
join must buffer across micro-batch boundaries (a purchase arriving
batches after its view still joins) and, on a finite replay, emit exactly
the batch band join's pair set.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.analytics import RANGE_JOIN_WINDOW_S
from prueba_tecnica_http_client_etl_spark.schemas import load_table
from prueba_tecnica_http_client_etl_spark.streaming import range_join_stream as RJ
from tests.conftest import SF_SMOKE

BASE = 1_700_000_000  # any fixed epoch anchor


def _ev(eid, uid, dt, etype):
    return {"event_id": eid, "user_id": uid, "ts_s": BASE + dt, "event_type": etype}


def test_cross_batch_band_join(spark, tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    # batch file 1: a view for users 1 and 2
    (d / "a.jsonl").write_text(
        "\n".join(json.dumps(r) for r in [_ev(10, 1, 0, "view"), _ev(11, 2, 0, "view")])
    )
    # batch file 2: user 1 purchases inside the band; user 2 outside it;
    # user 3 purchases with no view at all
    (d / "b.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                _ev(20, 1, RANGE_JOIN_WINDOW_S // 2, "purchase"),
                _ev(21, 2, RANGE_JOIN_WINDOW_S + 1, "purchase"),
                _ev(22, 3, 10, "purchase"),
            ]
        )
    )
    got = RJ.run_files_to_memory(
        spark, str(d), table_name="rjoin_stream_test", one_file_per_batch=True
    ).collect()
    assert [(r.view_id, r.user_id, r.gap_s) for r in got] == [(10, 1, float(RANGE_JOIN_WINDOW_S // 2))]


def test_finite_replay_matches_batch_pairs(spark, tmp_path):
    """Replaying the events table through the stream join yields exactly
    the batch operator's pre-aggregation pair set (watermark delay spans
    the replay, so no row is dropped as late)."""
    d = tmp_path / "events_replay"
    (
        load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", F.col("ts").cast("double").alias("ts_s"), "event_type")
        .coalesce(2)
        .write.mode("overwrite")
        .json(str(d))
    )
    got = RJ.run_files_to_memory(spark, str(d), table_name="rjoin_replay_test").collect()

    ev = load_table(spark, SF_SMOKE, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").cast("double").alias("vts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").cast("double").alias("pts")
    )
    expected = (
        v.join(p, (F.col("user_id") == F.col("p_user")))
        .filter((F.col("pts") > F.col("vts")) & (F.col("pts") <= F.col("vts") + RANGE_JOIN_WINDOW_S))
        .select("view_id", "user_id", (F.col("pts") - F.col("vts")).alias("gap_s"))
        .collect()
    )
    assert sorted((r.view_id, r.user_id, r.gap_s) for r in got) == sorted(
        (r.view_id, r.user_id, r.gap_s) for r in expected
    )
