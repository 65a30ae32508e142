"""Local replica of the driver's correctness gate: for every registered
query with an oracle, run the Spark DataFrame and the DuckDB SQL on the
same parquet tables and require identical row counts, column sets, and
(order-insensitively) identical values.

Comparison is strict: doubles must match bit-for-bit after each side's own
rounding — the same bar as the driver's value-hash.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMOKE


def _normalize(rows, columns):
    """Rows -> sorted list of tuples over name-sorted columns, with
    canonical scalar representations (mirror of a value-hash)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return float(v)
        if isinstance(v, int):
            return float(v) if abs(v) < 2**52 else v
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _spark_result(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return rows, cols


def _duck_result(duck, sql):
    cur = duck.sql(sql)
    cols = list(cur.columns)
    rows = cur.fetchall()
    return rows, cols


def all_query_names():
    from prueba_tecnica_http_client_etl_spark import registry

    return sorted(registry.queries())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, duck, name):
    from prueba_tecnica_http_client_etl_spark import registry

    q = registry.queries()[name]
    oracle = registry.oracle_sql().get(name)

    s_rows, s_cols = _spark_result(spark, q, SF_SMOKE)
    if oracle is None:
        # rows-only check, like the driver's weaker gate
        assert len(s_rows) >= 0
        return

    d_rows, d_cols = _duck_result(duck, oracle)

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"

    s_norm = _normalize(s_rows, s_cols)
    d_norm = _normalize(d_rows, d_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first 3: {mismatches[:3]}"
