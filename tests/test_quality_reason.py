"""Shared quality-reason helper contract: a null-toks document (raw
JSONL with a missing text field is the real producer) must quarantine as
too_short in BOTH engines — the guard lives in the shared helper so the
batch gate, quality_score, curation_pipeline, and the streaming gate all
agree (round-12 review: null toks made every threshold NULL, every
when() branch falsy, and the document fell through otherwise('ok'))."""

from __future__ import annotations

import duckdb

from prueba_tecnica_http_client_etl_spark.operators import curation as Cu


def test_null_toks_quarantines_too_short_spark(spark):
    d = spark.createDataFrame(
        [
            (1, "unit", "en", None, None),
            (2, "unit", "en", "", []),
            (3, "unit", "en", "x y", ["x", "y"]),
        ],
        "doc_id long, source string, lang string, norm string, toks array<string>",
    )
    rows = {r.doc_id: r for r in Cu.with_quality_reason(d).collect()}
    assert rows[1].n_tokens == 0 and rows[1].reason == "too_short"
    assert rows[2].n_tokens == 0 and rows[2].reason == "too_short"
    assert rows[3].n_tokens == 2 and rows[3].reason == "too_short"  # < MIN_TOKENS


def test_null_toks_quarantines_too_short_duckdb():
    """The DuckDB twin (sql_quality_cte) makes the same decision for a
    NULL list: COALESCE(len(toks), 0) -> 0 -> too_short wins before the
    NULL ratio branches are consulted."""
    sql = f"""
WITH sh_t AS (
  SELECT * FROM (VALUES
    (1::BIGINT, 'unit', 'en', NULL, NULL::VARCHAR[]),
    (2::BIGINT, 'unit', 'en', '', []::VARCHAR[]),
    (3::BIGINT, 'unit', 'en', 'x y', ['x', 'y'])
  ) AS t(doc_id, source, lang, norm, toks)
),
{Cu.sql_quality_cte()}
SELECT doc_id, n_tokens, reason FROM r ORDER BY doc_id"""
    out = duckdb.sql(sql).fetchall()
    assert out == [(1, 0, "too_short"), (2, 0, "too_short"), (3, 2, "too_short")]
