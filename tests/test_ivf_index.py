"""Persisted IVF index lifecycle (plans/ivf_index.py): probe results must
be bit-identical to ann_ivf_topk on the same corpus, and the inverted
lists must be read bucketed (no index-side shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.similarity import (
    QUERY_STRIDE,
    _quantized,
    ann_ivf_topk,
)
from prueba_tecnica_http_client_etl_spark.plans import ivf_index as IVF
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def built(spark):
    emb = _quantized(spark, SF_SMOKE).persist()
    IVF.build_ivf_index(emb, prefix="t_ivfidx", n_buckets=4)
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    yield queries
    emb.unpersist()


def test_probe_matches_ann_ivf_topk(spark, built):
    probe = IVF.probe_ivf_index(spark, built, prefix="t_ivfidx").collect()
    inline = ann_ivf_topk(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in inline]
    assert probe, "no query results at smoke scale"


def test_probe_reads_bucketed_cells(spark, built):
    df = IVF.probe_ivf_index(spark, built, prefix="t_ivfidx")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan
    assert "t_ivfidx_cells" in plan


@pytest.fixture(scope="module")
def built_labeled(spark):
    emb = _quantized(spark, SF_SMOKE).persist()
    IVF.build_ivf_index(emb, prefix="t_ivfidx_lbl", n_buckets=4, carry_cols=("label",))
    yield emb
    emb.unpersist()


def test_filtered_probe_matches_ann_filtered_topk(spark, built_labeled):
    """Per-label scan-filtered probes over the persisted index must
    reproduce ann_filtered_topk (the join-key pre-filter tier) exactly:
    same quantizer, same nprobe, same label predicate — two physical
    strategies, one answer."""
    from prueba_tecnica_http_client_etl_spark.operators.similarity import (
        FILTERED_NPROBE,
        ann_filtered_topk,
    )

    inline = ann_filtered_topk(spark, SF_SMOKE)
    expected = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine_p1) for r in inline.collect()
    )
    got = []
    for (lbl,) in built_labeled.select("label").distinct().collect():
        queries = built_labeled.filter(
            (F.col("vec_id") % QUERY_STRIDE == 0) & (F.col("label") == lbl)
        )
        probe = IVF.probe_ivf_index(
            spark, queries, prefix="t_ivfidx_lbl", nprobe=FILTERED_NPROBE, label=lbl
        )
        got.extend((r.query_id, r.neighbor_id, r.rank, r.cosine_p1) for r in probe.collect())
    assert sorted(got) == expected
    assert expected, "no filtered results at smoke scale"


def test_filtered_probe_pushes_label_to_cells_scan(spark, built_labeled):
    """The label predicate must reach the inverted-list parquet scan
    (PushedFilters) — scan-side filtering is the point of carrying the
    payload column into the index: a selective filter cuts index I/O,
    not just candidate count."""
    queries = built_labeled.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    df = IVF.probe_ivf_index(spark, queries, prefix="t_ivfidx_lbl", label=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan.split("t_ivfidx_lbl_cells", 1)[1]
    pushed = scan.split("PushedFilters: [", 1)[1].split("]")[0]
    assert "label" in pushed, pushed
    assert "SelectedBucketsCount" in plan, plan


def test_trained_filtered_probe_matches_ann_filtered_learned_topk(spark):
    """Trained quantizer + scan-side label filter over the persisted
    index must reproduce ann_filtered_learned_topk exactly — the full
    production composition (train once, persist the index, serve
    filtered probes from it) against the inline join-key tier: two
    physical strategies, one answer, now for the learned quantizer
    too."""
    from prueba_tecnica_http_client_etl_spark.functions import artifacts as A
    from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
    from prueba_tecnica_http_client_etl_spark.operators.similarity import (
        FILTERED_NPROBE,
        _coarse_centroids,
        ann_filtered_learned_topk,
    )

    emb = _quantized(spark, SF_SMOKE).persist()
    cents = _coarse_centroids(spark, SF_SMOKE, emb, canonical=False).select(
        "cent_id",
        "qc",
        F.sqrt(
            F.expr("aggregate(qc, cast(0 as bigint), (acc, v) -> acc + v * v)").cast("double")
        ).alias("nc"),
    )
    IVF.build_ivf_index(
        emb, prefix="t_ivfidx_lrn", n_buckets=4, cents=cents, carry_cols=("label",)
    )
    inline = ann_filtered_learned_topk(spark, SF_SMOKE)
    expected = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cosine_p1) for r in inline.collect()
    )
    got = []
    for (lbl,) in emb.select("label").distinct().collect():
        queries = emb.filter(
            (F.col("vec_id") % QUERY_STRIDE == 0) & (F.col("label") == lbl)
        )
        probe = IVF.probe_ivf_index(
            spark, queries, prefix="t_ivfidx_lrn", nprobe=FILTERED_NPROBE, label=lbl
        )
        got.extend((r.query_id, r.neighbor_id, r.rank, r.cosine_p1) for r in probe.collect())
    assert sorted(got) == expected
    assert expected, "no filtered results at smoke scale"
    emb.unpersist()
    A.clear()
    drain()


def test_append_then_probe_equals_one_shot_build(spark):
    """The ingest ACCEPT step: after append(B) under the frozen
    quantizer, probing must be byte-identical to probing an index built
    from A union B in one shot under the SAME quantizer — assignment is
    a per-vector function of the centroids, so append-grown and rebuilt
    indexes are interchangeable. The appended vectors must actually be
    reachable (some appear as neighbors), and the probe must still read
    the cells bucketed after the append."""
    emb = _quantized(spark, SF_SMOKE).persist()
    try:
        part = F.col("vec_id") % 5
        a, b = emb.filter(part != 1), emb.filter(part == 1)
        queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        # freeze the quantizer on the BASE corpus and reuse it for the
        # one-shot rebuild (the default strided seeds over A union B
        # would differ — the contract is same-quantizer equivalence)
        IVF.build_ivf_index(a, prefix="t_ivfapp", n_buckets=4)
        cents = [tuple(r) for r in spark.table("t_ivfapp_cents").collect()]
        IVF.append_to_ivf_index(b, prefix="t_ivfapp")
        got = IVF.probe_ivf_index(spark, queries, prefix="t_ivfapp").collect()

        cents_df = spark.createDataFrame(cents, spark.table("t_ivfapp_cents").schema)
        IVF.build_ivf_index(
            a.unionByName(b), prefix="t_ivfapp2", n_buckets=4, cents=cents_df
        )
        want = IVF.probe_ivf_index(spark, queries, prefix="t_ivfapp2").collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        appended_ids = {r.vec_id for r in b.select("vec_id").collect()}
        assert any(r.neighbor_id in appended_ids for r in got), (
            "appended vectors never surface as neighbors"
        )
        plan = (
            IVF.probe_ivf_index(spark, queries, prefix="t_ivfapp")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount" in plan, plan
    finally:
        emb.unpersist()


def test_compact_heals_retried_append_duplicates(spark):
    """At-least-once ingest heal (the IVF sibling of the LSH compact
    contract): appending the SAME batch twice — a retry after a
    mid-append failure — duplicates inverted-list rows, and a duplicate
    is not mere count inflation here: the probe ranks the same neighbor
    twice, so it occupies a top-k slot and EVICTS a genuine neighbor.
    compact_ivf_index must restore byte-identical probes to the
    never-duplicated index, preserve the bucket spec (bucketed probe
    join still prunes), and report the balance scalars."""
    emb = _quantized(spark, SF_SMOKE).persist()
    try:
        part = F.col("vec_id") % 5
        a, b = emb.filter(part != 1), emb.filter(part == 1)
        queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        IVF.build_ivf_index(a, prefix="t_ivfcmp", n_buckets=4)
        IVF.append_to_ivf_index(b, prefix="t_ivfcmp")
        want = [tuple(r) for r in IVF.probe_ivf_index(spark, queries, prefix="t_ivfcmp").collect()]

        IVF.append_to_ivf_index(b, prefix="t_ivfcmp")  # the retry
        dup = [tuple(r) for r in IVF.probe_ivf_index(spark, queries, prefix="t_ivfcmp").collect()]
        # the defect is real: some query's top-k now carries a duplicate
        # neighbor (and therefore differs from the clean index)
        seen = {}
        has_dup = False
        for q, n, _rank, _cos in dup:
            has_dup = has_dup or (q, n) in seen
            seen[(q, n)] = True
        assert has_dup and dup != want, "retried append produced no duplicate symptom"

        stats = IVF.compact_ivf_index(spark, prefix="t_ivfcmp")
        healed = [tuple(r) for r in IVF.probe_ivf_index(spark, queries, prefix="t_ivfcmp").collect()]
        assert healed == want
        n_b = b.count()
        assert stats["rows_before"] == stats["rows_after"] + n_b
        assert stats["rows_after"] == a.count() + n_b
        assert stats["n_cells"] >= 1 and stats["max_cell"] >= stats["mean_cell"]
        plan = (
            IVF.probe_ivf_index(spark, queries, prefix="t_ivfcmp")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount" in plan, plan
    finally:
        emb.unpersist()


def test_probe_vectorized_matches_relational_exactly(spark, built):
    """The numpy query-side quantizer ranking (round-14) must be
    byte-identical to the relational cross-join + window rank — the
    _ivf_assign stable-argsort argument applied to the persisted-index
    probe — and must keep the bucketed cells read (no index shuffle)."""
    fast = IVF.probe_ivf_index(spark, built, prefix="t_ivfidx", vectorized=True)
    slow = IVF.probe_ivf_index(spark, built, prefix="t_ivfidx", vectorized=False)
    f_rows = [tuple(r) for r in fast.collect()]
    assert f_rows == [tuple(r) for r in slow.collect()] and f_rows
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan
