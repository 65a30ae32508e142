"""Compaction plan: content conservation, file-count sizing, clustering
(disjoint per-file key ranges + footer-stats pruning), and the in-place
refusal guard.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.plans.compaction import (
    compact_table,
    compaction_plan,
    file_key_ranges,
)
from prueba_tecnica_http_client_etl_spark.schemas import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def fragmented(spark, tmp_path):
    """events written as 64 tiny files — the streaming-sink shape."""
    src = str(tmp_path / "frag")
    load_table(spark, SF_SMOKE, "events").repartition(64).write.parquet(src)
    return src


def _content_hash(spark, path):
    df = spark.read.parquet(path)
    # bit_xor: order-independent and overflow-free under ANSI mode
    return (
        df.select(F.xxhash64(*sorted(df.columns)).alias("x"))
        .agg(F.expr("bit_xor(x)").alias("h"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )


def test_compaction_reduces_files_and_conserves_content(spark, fragmented, tmp_path):
    dest = str(tmp_path / "compact")
    before = _content_hash(spark, fragmented)
    manifest = compact_table(spark, fragmented, dest, target_file_bytes=1 << 30)
    after = _content_hash(spark, dest)
    assert (after.h, after.n) == (before.h, before.n)
    assert manifest["n_files"] == 64
    assert manifest["needs_compaction"] is True
    assert manifest["n_files_after"] == 1  # everything fits one 1 GiB target
    assert manifest["n_files_after"] < manifest["n_files"]


def test_plan_is_metadata_only_and_sized_by_target(fragmented):
    plan_big = compaction_plan(fragmented, target_file_bytes=1 << 30)
    plan_small = compaction_plan(fragmented, target_file_bytes=16 << 10)
    assert plan_big["n_target_files"] == 1
    assert plan_small["n_target_files"] > plan_big["n_target_files"]
    assert plan_big["total_bytes"] == plan_small["total_bytes"] > 0


def test_clustered_rewrite_has_disjoint_file_ranges(spark, fragmented, tmp_path):
    dest = str(tmp_path / "clustered")
    compact_table(
        spark, fragmented, dest, target_file_bytes=24 << 10, cluster_by=["user_id"]
    )
    ranges = file_key_ranges(spark, dest, "user_id").collect()
    assert len(ranges) > 1, "need multiple files to prove clustering"
    # range-partitioned + sorted => consecutive files' ranges don't interleave
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev.k_max <= cur.k_min


def test_clustered_scan_prunes_row_groups(spark, fragmented, tmp_path):
    """A selective filter on the cluster key must report fewer scanned
    rows on the clustered copy than the fragmented one (parquet footer
    min/max pruning doing its job)."""
    dest = str(tmp_path / "clustered2")
    compact_table(
        spark, fragmented, dest, target_file_bytes=24 << 10, cluster_by=["user_id"]
    )
    lo = spark.read.parquet(dest).agg(F.min("user_id")).collect()[0][0]
    clustered = spark.read.parquet(dest).filter(F.col("user_id") == lo)
    # correctness of the pruned scan
    frag = spark.read.parquet(fragmented).filter(F.col("user_id") == lo)
    assert clustered.count() == frag.count() > 0
    plan = clustered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan


def test_refuses_in_place_rewrite(spark, fragmented):
    with pytest.raises(ValueError, match="in-place"):
        compact_table(spark, fragmented, fragmented)


def test_refuses_nested_rewrite(spark, fragmented, tmp_path):
    """dest inside src overlaps the lazy read with the overwrite; src
    inside dest would be deleted by the overwrite cleanup. Both refused."""
    with pytest.raises(ValueError, match="overlapping"):
        compact_table(spark, fragmented, os.path.join(fragmented, "sub"))
    with pytest.raises(ValueError, match="overlapping"):
        compact_table(spark, fragmented, os.path.dirname(fragmented))


def _mean_span(spark, path, col):
    """Average per-file (max-min) span of `col`, normalized by the global
    span — 1.0 means files carry no locality in this column."""
    ranges = file_key_ranges(spark, path, col).collect()
    lo = min(r.k_min for r in ranges)
    hi = max(r.k_max for r in ranges)
    global_span = (hi - lo) or 1
    spans = [(r.k_max - r.k_min) / global_span for r in ranges]
    return sum(spans) / len(spans), len(ranges)


def test_zorder_gives_locality_in_both_dimensions(spark, fragmented, tmp_path):
    """Single-column clustering leaves the second column spanning the
    whole domain per file; the Morton rewrite must carry substantial
    locality in BOTH user_id and event_id simultaneously."""
    from prueba_tecnica_http_client_etl_spark.plans.compaction import zorder_table

    single = str(tmp_path / "single")
    compact_table(spark, fragmented, single, target_file_bytes=12 << 10, cluster_by=["user_id"])
    zorder = str(tmp_path / "zorder")
    manifest = zorder_table(
        spark, fragmented, zorder, zorder_by=["user_id", "event_id"], target_file_bytes=12 << 10
    )
    assert manifest["zordered_on"] == ["user_id", "event_id"]

    s_user, n_single = _mean_span(spark, single, "user_id")
    s_event, _ = _mean_span(spark, single, "event_id")
    z_user, n_z = _mean_span(spark, zorder, "user_id")
    z_event, _ = _mean_span(spark, zorder, "event_id")
    assert n_single > 2 and n_z > 2, "need several files to measure locality"
    # single-column clustering: tight on user_id, no locality on event_id
    assert s_user < 0.5 and s_event > 0.8, (s_user, s_event)
    # z-order: meaningful locality in BOTH dimensions at once
    assert z_user < 0.8 and z_event < 0.8, (z_user, z_event)
    # the metric that matters for filters on EITHER column is the WORST
    # dimension: single-column clustering leaves it ~global (no pruning
    # possible); z-order bounds it
    assert max(z_user, z_event) < max(s_user, s_event) * 0.7, (
        z_user,
        z_event,
        s_user,
        s_event,
    )


def test_zorder_conserves_content_and_refuses_overlap(spark, fragmented, tmp_path):
    from prueba_tecnica_http_client_etl_spark.plans.compaction import zorder_table

    dest = str(tmp_path / "z2")
    before = _content_hash(spark, fragmented)
    zorder_table(spark, fragmented, dest, zorder_by=["user_id", "event_id"])
    after = _content_hash(spark, dest)
    assert (after.h, after.n) == (before.h, before.n)
    # __zkey must not leak into the written schema
    assert "__zkey" not in spark.read.parquet(dest).columns
    with pytest.raises(ValueError, match="overlapping"):
        zorder_table(spark, fragmented, fragmented + "/sub", zorder_by=["user_id", "event_id"])
    # dimension-arity contract: ValueError (not a strippable assert),
    # raised before any source read
    with pytest.raises(ValueError, match="exactly 2 columns"):
        zorder_table(spark, fragmented, str(tmp_path / "z3"), zorder_by=["user_id"])
    with pytest.raises(ValueError, match="exactly 2 columns"):
        zorder_table(
            spark, fragmented, str(tmp_path / "z4"), zorder_by=["user_id", "event_id", "ts"]
        )
