"""Streaming edit-distance probe against a FROZEN corpus — the ingest-time
twin of operators/dedup.dedup_edit_distance: the corpus's shingle posting
table and verify metadata are built once per snapshot (the same session
trained artifacts the batch tier reads), and each arriving micro-batch of
documents is probed against them for Levenshtein-near-dup hits
(doc_id, neighbor_id, lengths, exact distance).

Per-doc hits reference ONLY the frozen corpus state — never other
in-flight documents — so they are per-document pure functions: the union
of per-batch hits equals probing the whole incoming set at once,
regardless of batching. That decomposability certifies the stream against
the SYMMETRIZED batch oracle (every (a,b) pair of dedup_edit_distance
seen from both ends), the same argument as the LSH index-probe stream.

The probe keeps the batch tier's lossless blocking, sided for streaming:
- long tier: the arriving doc's shingles equi-join the corpus posting
  index — by the k(q+1) lemma any within-distance pair where EITHER side
  clears the shingle floor shares a shingle, and the posting index holds
  ALL corpus docs, so only both-short pairs can escape;
- token tier: arriving short docs' distinct tokens equi-join the corpus's
  short-doc token postings (the q=1 lemma — covers short pairs where
  either side has > 2k distinct tokens);
- ultra tier: arriving BOTH-ultra docs emit their (k+1)-wide length
  bucket and its successor and equi-join the corpus's ultra-doc bucket
  keys (the bucket-cover lemma, hypothesis-tested in
  tests/test_edit_distance.py);
- verify: |Δlen| <= k band then Spark's threshold (banded O(k·n))
  Levenshtein on candidates only.

Per-batch cost is |batch| x posting fanout, independent of corpus size in
the same way the LSH probe is; the corpus side reads pinned checkpointed
blocks and never re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textprep as tp
from ..operators.dedup import (
    EDIT_MAX_DIST,
    EDIT_SHORT_MAX_SHINGLES,
    EDIT_ULTRA_MAX_TOKENS,
    _edit_meta,
    _edit_postings,
)

DOC_SCHEMA = "doc_id long, text string"


def _prepped_batch(docs: DataFrame) -> DataFrame:
    """(doc_id, norm, nlen, n_sh, sh) from a raw (doc_id, text)
    micro-batch — the same normalize/shingle expressions as
    docs_normalized, applied to streaming rows.

    The sized repartition below the lambda columns is the
    docs_normalized discipline: a replayed batch arrives as ONE file =
    one input partition, and without the spread every interpreted
    normalize/shingle lambda would run in a single task."""
    from ..session import default_parallelism

    return (
        docs.repartition(default_parallelism(), F.col("doc_id"))
        .withColumn("norm", F.expr(tp.SPARK_NORM))
        .withColumn("toks", F.expr(tp.SPARK_TOKS))
        .withColumn("sh", F.expr(tp.SPARK_SHINGLES))
        .select(
            "doc_id",
            "norm",
            F.length("norm").cast("long").alias("nlen"),
            F.size("sh").alias("n_sh"),
            F.size(F.array_distinct("toks")).alias("n_dtok"),
            F.array_distinct("toks").alias("dtoks"),
            "sh",
        )
    )


def probe_edit_batch(spark: SparkSession, batch: DataFrame, sf_dir: str) -> DataFrame:
    """Edit-near-dup hits of one prepped micro-batch against the frozen
    corpus artifacts: (doc_id, neighbor_id, len_self, len_neighbor,
    edit_distance), self-pairs excluded.

    The batch is pool-persisted here because FOUR consumers read it
    (shingle explode, token tier, ultra tier, verify side) and its
    normalize/shingle lambdas are the per-row cost: without the persist,
    Catalyst pushes each tier's computed-column filter (n_sh, n_dtok)
    below the batch's repartition and re-runs the whole interpreted
    lambda chain in the scan's single input task — the round-3
    explode-generator trap, rediscovered by the round-15 probe profile
    (the token tier alone was 11.6 of the 12.5 s one-shot probe; with
    the persist the one-shot probe is 2.7 s and the registered stream
    query dropped 4.8 -> 2.7 s warm). The stream runner drains the pool
    after every micro-batch (drain_pool_per_batch), so state stays
    bounded in a continuous ingest loop."""
    from ..functions.cachepool import managed_persist

    batch = managed_persist(batch)
    k = EDIT_MAX_DIST
    post = _edit_postings(spark, sf_dir).select(
        F.col("doc_id").alias("neighbor_id"), F.col("nlen").alias("lb"), "s"
    )
    bx = batch.select("doc_id", "nlen", F.explode_outer("sh").alias("s"))
    long_cand = (
        bx.join(post, "s")
        .filter(
            (F.col("doc_id") != F.col("neighbor_id"))
            & (F.abs(F.col("nlen") - F.col("lb")) <= k)
        )
        .select("doc_id", "neighbor_id")
        .distinct()
    )
    meta = _edit_meta(spark, sf_dir)
    tok_b = batch.filter(F.col("n_sh") <= EDIT_SHORT_MAX_SHINGLES).select(
        "doc_id", "nlen", F.explode_outer("dtoks").alias("t")
    )
    tok_c = meta.filter(F.col("n_sh") <= EDIT_SHORT_MAX_SHINGLES).select(
        F.col("doc_id").alias("neighbor_id"),
        F.col("nlen").alias("lb"),
        F.explode_outer("dtoks_short").alias("t"),
    )
    token_cand = (
        tok_b.join(tok_c, "t")
        .filter(
            (F.col("doc_id") != F.col("neighbor_id"))
            & (F.abs(F.col("nlen") - F.col("lb")) <= k)
        )
        .select("doc_id", "neighbor_id")
        .distinct()
    )
    # One bucket expression PER FRAME, bound to that frame's own nlen
    # (round-14 ADVICE: a single unbound F.col("nlen") expression reused
    # on both sides only resolved against meta by name coincidence — a
    # rename of either column would silently rebind or break).
    def _len_buckets(nlen_col):
        b = F.floor(nlen_col / (k + 1))
        return F.explode(F.array(b, b + 1)).alias("bkt")

    ultra_b = (
        batch.filter(F.col("n_dtok") <= EDIT_ULTRA_MAX_TOKENS)
        .select("doc_id", _len_buckets(batch["nlen"]))
    )
    ultra_c = (
        meta.filter(F.col("n_dtok") <= EDIT_ULTRA_MAX_TOKENS)
        .select(
            F.col("doc_id").alias("neighbor_id"),
            _len_buckets(meta["nlen"]),
        )
    )
    ultra_cand = (
        ultra_b.join(ultra_c, "bkt")
        .filter(F.col("doc_id") != F.col("neighbor_id"))
        .select("doc_id", "neighbor_id")
        .distinct()
    )
    cand = long_cand.unionByName(token_cand).unionByName(ultra_cand).distinct()
    own = batch.select("doc_id", F.col("norm").alias("na"), F.col("nlen").alias("len_self"))
    other = meta.select(
        F.col("doc_id").alias("neighbor_id"),
        F.col("norm").alias("nb"),
        F.col("nlen").alias("len_neighbor"),
    )
    return (
        cand.join(own, "doc_id")
        .join(other, "neighbor_id")
        .filter(F.abs(F.col("len_self") - F.col("len_neighbor")) <= k)
        .withColumn("ed", F.levenshtein(F.col("na"), F.col("nb"), k))
        .filter((F.col("ed") >= 0) & (F.col("ed") <= k))
        .select(
            "doc_id",
            "neighbor_id",
            "len_self",
            "len_neighbor",
            F.col("ed").cast("long").alias("edit_distance"),
        )
    )


def run_edit_probe(
    spark: SparkSession,
    input_path: str,
    out_root: str,
    *,
    sf_dir: str,
    checkpoint: str,
    one_file_per_batch: bool = False,
) -> DataFrame:
    """Drive the document file stream to completion (availableNow),
    probing every micro-batch against the frozen corpus edit-index
    artifacts and writing hits partitioned by batch_id with idempotent
    per-batch overwrite. Returns the read-back union.

    The corpus artifacts are materialized BEFORE the stream starts (one
    training job); per-batch plans then read pinned blocks only.
    drain_pool_per_batch keeps any operator-internal persists bounded in
    a continuous ingest loop."""
    from .runner import run_transform_stream

    _edit_postings(spark, sf_dir).count()
    _edit_meta(spark, sf_dir).count()
    return run_transform_stream(
        spark,
        input_path,
        out_root,
        schema=DOC_SCHEMA,
        layer="hits",
        checkpoint=checkpoint,
        transform=lambda batch: probe_edit_batch(spark, _prepped_batch(batch), sf_dir),
        one_file_per_batch=one_file_per_batch,
        drain_pool_per_batch=True,
    )
