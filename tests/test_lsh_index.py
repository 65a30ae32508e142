"""Persisted LSH index lifecycle (plans/lsh_index.py): build-once /
probe-per-batch must reproduce dedup_incremental's verdicts exactly, and
the probe joins must read the index tables bucketed (no index-side
shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators.dedup import (
    INCREMENTAL_STRIDE,
    dedup_incremental,
    docs_normalized,
)
from prueba_tecnica_http_client_etl_spark.plans import lsh_index as LI
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def built_index(spark):
    docs = docs_normalized(spark, SF_SMOKE).select("doc_id", "norm", "sh")
    is_incoming = F.col("doc_id") % INCREMENTAL_STRIDE == 0
    LI.build_lsh_index(docs.filter(~is_incoming), prefix="t_lshidx", n_buckets=4)
    return docs.filter(is_incoming)


def test_probe_matches_dedup_incremental(spark, built_index):
    probe = LI.probe_lsh_index(spark, built_index, prefix="t_lshidx").collect()
    inline = dedup_incremental(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in inline]
    # fixture sanity: both the near tier and the pass-through occur at
    # smoke scale (the incoming stride carries no byte-identical copies,
    # so exact_dup legitimately may not appear)
    verdicts = {r.verdict for r in probe}
    assert {"near_dup", "novel"} <= verdicts <= {"exact_dup", "near_dup", "novel"}, verdicts


def test_probe_reads_bucketed_index(spark, built_index):
    df = LI.probe_lsh_index(spark, built_index, prefix="t_lshidx")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every index-table scan must select buckets (bucketed read, not a
    # plain file scan that would need an index-side shuffle)
    assert "SelectedBucketsCount" in plan, plan
    assert "t_lshidx_bands" in plan and "t_lshidx_shingles" in plan


def test_append_then_probe_equals_one_shot_build(spark):
    """The ingest-loop ACCEPT step: after append(B), probing C must be
    byte-identical to probing C against an index built from A union B
    in one shot (no hot buckets in this natural corpus, so the deferred
    cap cannot diverge) — append-grown and rebuilt indexes are
    interchangeable. And the append must actually matter: against the
    A-only index, C docs near-duplicating B docs would pass as novel."""
    docs = docs_normalized(spark, SF_SMOKE).select("doc_id", "norm", "sh")
    part = F.col("doc_id") % 3
    a, b, c = docs.filter(part == 0), docs.filter(part == 1), docs.filter(part == 2)

    LI.build_lsh_index(a, prefix="t_appgrow", n_buckets=4)
    before = LI.probe_lsh_index(spark, c, prefix="t_appgrow").collect()
    LI.append_to_lsh_index(b, prefix="t_appgrow", n_buckets=4)
    got = LI.probe_lsh_index(spark, c, prefix="t_appgrow").collect()

    LI.build_lsh_index(a.unionByName(b), prefix="t_oneshot", n_buckets=4)
    want = LI.probe_lsh_index(spark, c, prefix="t_oneshot").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    flagged = lambda rows: {r.doc_id for r in rows if r.verdict != "novel"}  # noqa: E731
    assert flagged(before) < flagged(got), "append must surface B-dependent dups"
    # appends keep the bucketed layout: probe still bucket-prunes
    plan = (
        LI.probe_lsh_index(spark, c, prefix="t_appgrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SelectedBucketsCount" in plan, plan


def test_compact_recaps_hot_buckets_grown_by_appends(spark):
    """append defers the hot-bucket cap (its docstring contract); the
    compaction pass re-applies it over the accumulated band table:
    boilerplate appended past LSH_MAX_BUCKET must be dropped, genuine
    near-dup bands kept, and the post-compaction probe must equal a
    one-shot capped build over the full corpus."""
    from pyspark.sql import functions as F2

    from prueba_tecnica_http_client_etl_spark.functions import textprep as tp

    boiler = "the quick brown fox jumps over the lazy dog again and again " * 5
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    near_b = near_a + " omicron"
    base = [(i, boiler) for i in range(5)] + [(100, near_a)]
    grow = [(20 + i, boiler) for i in range(25)]
    probe_rows = [(300, boiler), (301, near_b), (302, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11")]

    def prepped(rows):
        return (
            spark.createDataFrame(rows, "doc_id long, text string")
            .withColumn("norm", F2.expr(tp.SPARK_NORM))
            .withColumn("toks", F2.expr(tp.SPARK_TOKS))
            .withColumn("sh", F2.expr(tp.SPARK_SHINGLES))
            .select("doc_id", "norm", "sh")
        )

    LI.build_lsh_index(prepped(base), prefix="t_compact", n_buckets=4)
    LI.append_to_lsh_index(prepped(grow), prefix="t_compact", n_buckets=4)
    dropped = LI.compact_lsh_index_bands(spark, prefix="t_compact", n_buckets=4)
    assert dropped == tp.LSH_BANDS  # every boiler band bucket went hot

    got = LI.probe_lsh_index(spark, prepped(probe_rows), prefix="t_compact").collect()
    LI.build_lsh_index(prepped(base + grow), prefix="t_compact2", n_buckets=4)
    want = LI.probe_lsh_index(spark, prepped(probe_rows), prefix="t_compact2").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    by_doc = {r.doc_id: r.verdict for r in got}
    # the boiler probe is still an exact_dup (digest tier is cap-free);
    # the genuine near-dup pair survives the cap; the filler is novel
    assert by_doc == {300: "exact_dup", 301: "near_dup", 302: "novel"}
    # and compaction is idempotent once the table is capped
    assert LI.compact_lsh_index_bands(spark, prefix="t_compact", n_buckets=4) == 0
