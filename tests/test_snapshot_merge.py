"""snapshot_merge key-space safety (round-12 review): the insert-id
offset derives from max(doc_id), so synthesized insert keys can never
collide with real base keys and no base row is ever misclassified as
'inserted' — regardless of how large the snapshot's doc_ids grow. The
old fixed 1,000,000 offset failed both ways on this corpus (base id
1,000,025 was labeled 'inserted'; the insert derived from doc 25 landed
ON 1,000,025, and the version tie made the surviving text
nondeterministic)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from prueba_tecnica_http_client_etl_spark.operators.analytics import (
    SQL_SNAPSHOT_MERGE,
    snapshot_merge,
)

_IDS = [3, 10, 25, 999_999, 1_000_000, 1_000_025]


def _write_docs(tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array(_IDS, pa.int64()),
            "text": [f"document body {i}" for i in _IDS],
            "lang": ["en"] * len(_IDS),
            "source": ["unit"] * len(_IDS),
            "n_chars": pa.array([len(f"document body {i}") for i in _IDS], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_insert_ids_never_collide_with_large_base_ids(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    rows = {r.doc_id: r for r in snapshot_merge(spark, sf_dir).collect()}
    mx = max(_IDS)
    # every base key survives exactly once, never as 'inserted'
    for i in _IDS:
        assert rows[i].action == ("updated" if i % 10 == 0 else "kept"), rows[i]
    # inserts land strictly above the base key space, one per %25 doc
    inserted = {i: r for i, r in rows.items() if r.action == "inserted"}
    assert set(inserted) == {i + mx + 1 for i in _IDS if i % 25 == 0}
    assert all(i > mx for i in inserted)
    # the update beat the base on its shared key
    assert rows[10].version == 2 and rows[1_000_000].version == 2

    # cross-engine parity on the adversarial corpus
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.sql(SQL_SNAPSHOT_MERGE).fetchall()
    got = [tuple(r) for r in snapshot_merge(spark, sf_dir).collect()]
    assert got == [tuple(r) for r in want]
