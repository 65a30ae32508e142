"""Persisted video frame-fingerprint index lifecycle — the durable form
of the frozen state the video containment probe stream reads, completing
index-lifecycle coverage for all three perceptual modalities (image /
audio: plans/phash_index.py; video: this module).

    build_video_index(fhd, prefix="vid")          # once / on compaction
    probe_video_index(spark, batch_fhd, prefix="vid")  # per batch
    append_to_video_index(novel_fhd, prefix="vid")     # accept novel

Two catalog tables, each bucketed on its probe key:

- `{prefix}_vframes` (doc_id, fh)  bucketed by fh   (the inverted index)
- `{prefix}_vsizes`  (doc_id, n)   bucketed by doc_id

The sizes table is DERIVED state (distinct-frame count per video) kept
alongside the frames so a probe never re-aggregates the whole index:
appends write the batch's own sizes, and because a video's frames are
ingested atomically (one append call carries whole videos), per-video
counts never need merging across appends — the equivalence test pins
probe(build(A) + append(B)) == probe(build(A + B)) byte-for-byte.

Like the probe stream (streaming/video_probe_stream.py), the index is
deliberately UNVALVED: a probe against a hot fingerprint's bucket costs
its membership per arriving video (linear, not the s^2 batch-pair
blowup operators/multimodal.py's _VID_FH_MAX_DF valve refuses), and an
arriving re-upload should see its verdict against boilerplate-heavy
index videos rather than a silent 'novel'. At 100 TB the frame table
holds ~24 two-long rows per video; per-batch probe cost is
|batch frames| bucketed lookups plus a bounded per-candidate aggregate,
independent of corpus size.

Reference: no counterpart (SURVEY.md §2.8 multimodal tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import _VID_CONTAIN_DEN, _VID_CONTAIN_NUM
from .layout import write_bucketed
from .lsh_index import _clear_orphaned_location, _require_index, _table_n_buckets


def build_video_index(fhd: DataFrame, *, prefix: str, n_buckets: int = 8) -> None:
    """Materialize the two index tables for `fhd`, a DISTINCT
    (doc_id, fh) frame-fingerprint table (operators/multimodal.py
    _video_fhd is the canonical producer). Rebuild-in-place is safe:
    saveAsTable(overwrite) swaps atomically and an orphaned location
    from a crashed build is cleared first."""
    spark = fhd.sparkSession
    for suffix in ("vframes", "vsizes"):
        _clear_orphaned_location(spark, f"{prefix}_{suffix}")
    d = fhd.select("doc_id", "fh").persist()
    try:
        write_bucketed(d, f"{prefix}_vframes", bucket_cols=["fh"], n_buckets=n_buckets)
        write_bucketed(
            d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
            f"{prefix}_vsizes",
            bucket_cols=["doc_id"],
            n_buckets=n_buckets,
        )
    finally:
        d.unpersist()


def append_to_video_index(fhd: DataFrame, *, prefix: str) -> None:
    """ACCEPT a probed batch (whole videos — a video's frames must all
    ride one append, which is what the ingest loop naturally does) into
    the index. Bucket specs are read FROM the catalog; a missing table
    fails loudly instead of mode('append') silently creating a parallel
    index. At-least-once like every index append here: a retried append
    can duplicate frame rows (harmless to verdicts — the probe's shared
    counts read DISTINCT frames per pair via the input contract, but
    duplicated size rows WOULD double a count, so sizes are written
    last and a rebuild is the heal after a suspected partial append)."""
    spark = fhd.sparkSession
    _require_index(spark, prefix, ("vframes", "vsizes"))
    d = fhd.select("doc_id", "fh").persist()
    try:
        d.write.mode("append").format("parquet").bucketBy(
            _table_n_buckets(spark, f"{prefix}_vframes"), "fh"
        ).saveAsTable(f"{prefix}_vframes")
        d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).write.mode(
            "append"
        ).format("parquet").bucketBy(
            _table_n_buckets(spark, f"{prefix}_vsizes"), "doc_id"
        ).saveAsTable(f"{prefix}_vsizes")
    finally:
        d.unpersist()


def probe_video_index(
    spark: SparkSession, fhd: DataFrame, *, prefix: str, ordered: bool = True
) -> DataFrame:
    """Containment verdict per batch video against the persisted index:
    near_dup when some index video clears the exact rational threshold
    on shared distinct frames, else novel — the streaming probe's
    verdict semantics and schema verbatim ((doc_id, verdict,
    n_candidates, best_containment); the probe-vs-stream equality is
    the contract test). Only the batch side shuffles: the candidate
    join hits the frame table bucketed on fh."""
    from ..functions.cachepool import managed_persist
    from ..functions.portable import roundn

    _require_index(spark, prefix, ("vframes", "vsizes"))
    inc = managed_persist(fhd.select("doc_id", "fh").distinct())
    pn = inc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("pn"))
    ix = spark.table(f"{prefix}_vframes").select(F.col("doc_id").alias("ix_id"), "fh")
    inn = spark.table(f"{prefix}_vsizes").select(
        F.col("doc_id").alias("ix_id"), F.col("n").alias("ixn")
    )
    shared = (
        inc.join(ix, "fh").groupBy("doc_id", "ix_id").agg(F.count(F.lit(1)).alias("ns"))
    )
    scored = (
        shared.join(pn, "doc_id")
        .join(inn, "ix_id")
        .select("doc_id", "ns", F.least("pn", "ixn").alias("mn"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max(F.col("ns").cast("double") / F.col("mn").cast("double")).alias("best_raw"),
        F.max(
            (F.col("ns") * _VID_CONTAIN_DEN >= F.col("mn") * _VID_CONTAIN_NUM).cast("int")
        ).alias("has_near"),
    )
    out = (
        inc.select("doc_id")
        .distinct()
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("has_near") == 1, F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
            F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias("n_candidates"),
            roundn(F.col("best_raw"), 4).alias("best_containment"),
        )
    )
    return out.orderBy("doc_id") if ordered else out
