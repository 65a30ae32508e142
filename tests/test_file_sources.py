"""S1/S2 file scans: permissive corrupt-record quarantine, FAILFAST
parity with the reference's fail-fast contract, blank-line skipping, and
the typed KPI CSV round-trip."""

from __future__ import annotations

import pytest

from prueba_tecnica_http_client_etl_spark.operators.kpi import kpi_daily
from prueba_tecnica_http_client_etl_spark.functions.cleaning import clean_http_log
from prueba_tecnica_http_client_etl_spark.sinks.files import write_kpi_csv
from prueba_tecnica_http_client_etl_spark.sources import files as FSRC

GOOD = '{"timestamp_utc": "2026-01-01T10:00:00Z", "endpoint": "/get", "status_code": "200", "elapsed_ms": "10.5", "parse_result": "ok"}'
BAD = '{"timestamp_utc": broken'


def test_permissive_scan_quarantines_corrupt(spark, tmp_path):
    (tmp_path / "log.jsonl").write_text("\n".join([GOOD, "", "   ", BAD, GOOD]))
    df = FSRC.read_log_jsonl(spark, str(tmp_path / "log.jsonl"))
    clean, corrupt = FSRC.split_corrupt(df)
    # blank lines skipped (reference calcular_kpi.py:78-79); bad line kept as data
    assert clean.count() == 2
    assert [r["raw"] for r in corrupt.collect()] == [BAD]
    # the clean side feeds the normal pipeline
    assert kpi_daily(clean_http_log(clean)).count() == 1


def test_strict_scan_fail_fast(spark, tmp_path):
    (tmp_path / "log.jsonl").write_text("\n".join([GOOD, BAD]))
    with pytest.raises(Exception) as exc:
        FSRC.read_log_jsonl(spark, str(tmp_path / "log.jsonl"), strict=True).collect()
    # the reference raises ValueError with a line number
    # (calcular_kpi.py:80-83); Spark's FAILFAST names the malformed record
    assert "FAILFAST" in str(exc.value) or "Malformed" in str(exc.value)


def test_kpi_csv_round_trip(spark, tmp_path):
    raw = spark.createDataFrame(
        [("2026-01-01T10:00:00Z", "/get", "200", "10.5", "ok"),
         ("2026-01-01T11:00:00Z", "/get", "503", "99.5", "ok")],
        "timestamp_utc string, endpoint string, status_code string, elapsed_ms string, parse_result string",
    )
    kpi = kpi_daily(clean_http_log(raw))
    write_kpi_csv(kpi, str(tmp_path / "kpi"), single_file=True)
    back = FSRC.read_kpi_csv(spark, str(tmp_path / "kpi"))
    assert back.schema == kpi.schema or [f.name for f in back.schema.fields] == [f.name for f in kpi.schema.fields]
    got = back.collect()[0].asDict()
    assert got["requests_total"] == 2 and got["server_5xx"] == 1
    assert abs(got["avg_elapsed_ms"] - 55.0) < 1e-9


def test_strict_parity_reports_reference_line_number(spark, tmp_path):
    """The reference fail-fasts with `JSON mal formado en línea {N}: {e}`
    counting ALL physical lines from 1 including blanks (calcular_kpi.py
    enumerate(start=1) + blank skip). Line 5 below is the first malformed
    one; the message must carry exactly that number and json's own detail."""
    import json

    lines = [GOOD, "", GOOD, "   ", BAD, GOOD, BAD]
    (tmp_path / "log.jsonl").write_text("\n".join(lines))
    with pytest.raises(ValueError) as exc:
        FSRC.read_log_jsonl_strict_parity(spark, str(tmp_path / "log.jsonl"))
    try:
        json.loads(BAD)
    except json.JSONDecodeError as e:
        expected_detail = str(e)
    assert str(exc.value) == f"JSON mal formado en línea 5: {expected_detail}"


def test_strict_parity_passes_clean_file(spark, tmp_path):
    (tmp_path / "log.jsonl").write_text("\n".join([GOOD, "", GOOD]))
    df = FSRC.read_log_jsonl_strict_parity(spark, str(tmp_path / "log.jsonl"))
    assert df.count() == 2


def test_strict_parity_accepts_nan_like_python_json(spark, tmp_path):
    """Round-12 review: Spark's try_parse_json rejects NaN/Infinity while
    the reference's json.loads ACCEPTS them — the validator must side
    with json.loads (the JVM check is only a prescreen), so a NaN line
    passes validation, and a genuinely malformed line AFTER it still
    raises with its own line number."""
    import json

    nan_line = '{"timestamp_utc": "2026-01-01T10:00:00Z", "endpoint": "/get", "status_code": 200, "elapsed_ms": NaN, "parse_result": "ok"}'
    json.loads(nan_line)  # precondition: the reference's decoder accepts it
    (tmp_path / "ok.jsonl").write_text("\n".join([GOOD, nan_line, GOOD]))
    FSRC.validate_jsonl_lines(spark, str(tmp_path / "ok.jsonl"))  # must not raise

    (tmp_path / "bad.jsonl").write_text("\n".join([nan_line, BAD]))
    with pytest.raises(ValueError, match="JSON mal formado en línea 2"):
        FSRC.validate_jsonl_lines(spark, str(tmp_path / "bad.jsonl"))
