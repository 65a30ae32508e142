"""Session-scoped trained-artifact store (the in-session analog of the
persisted index plans).

A production pipeline trains its quantizers, codebooks, ANN ground-truth
audit tables, and duplicate-cluster labels ONCE per corpus snapshot and
persists them (plans/lsh_index.py and plans/ivf_index.py are the on-disk
forms); serving and audit queries then read the artifact instead of
re-deriving it. The registry's queries are self-contained by contract
(each is callable cold), so the FIRST query that needs an artifact
builds it; later queries in the same session reuse the materialized
frame. Reuse is bit-identical to retraining by construction: every
builder is deterministic (integer state, portable rounding, md5-derived
randomness), so the stored frame holds exactly the rows a fresh build
would produce — the driver's hash oracle certifies memoized results the
same way it certifies fresh ones, and tests/test_artifacts.py asserts
memoized == fresh directly.

Only TRAINED STATE is stored (centroids, codes, cluster labels, the
brute-force ground truth an audit compares against) — never a query's
output: each consumer still runs its own probe/rank/aggregate plan on
top of the artifact, exactly as it would over the persisted on-disk
form.

Keying: (builder name, absolute sf_dir, source-file mtime, Spark
application id). The mtime component retrains on a changed corpus
snapshot; the application id drops artifacts whose SparkContext died
(their checkpoint blocks die with it). The store is bounded FIFO —
evicting an entry only releases the frame reference; the ContextCleaner
frees its localCheckpoint blocks when the frame is garbage-collected.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_MAX_ENTRIES = 32
_STORE: "OrderedDict[tuple, DataFrame]" = OrderedDict()


def artifact_key(
    name: str, spark: SparkSession, sf_dir: str, table: str = "documents"
) -> tuple:
    """Identity of a trained artifact: WHAT was trained (name), on WHICH
    corpus snapshot (sf_dir + the source table's mtime), in WHICH Spark
    application (checkpoint blocks are application-scoped)."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    return (name, os.path.abspath(sf_dir), mtime, spark.sparkContext.applicationId)


def trained_artifact(key: tuple, build: Callable[[], DataFrame]) -> DataFrame:
    """Return the artifact for `key`, building + materializing it on
    first use. localCheckpoint(eager) truncates lineage AND pins the
    rows: the stored frame never recomputes (its blocks are the only
    source), so every consumer across queries reads the same bytes.
    NEVER pool these frames in cachepool — unpersist would free a
    checkpointed frame's only source (see cachepool's contract)."""
    df = _STORE.get(key)
    if df is None:
        df = build().localCheckpoint(eager=True)
        _STORE[key] = df
        while len(_STORE) > _MAX_ENTRIES:
            _STORE.popitem(last=False)
    return df


def clear() -> None:
    """Drop every stored artifact (tests / forced retrain); block
    cleanup is GC-driven via the ContextCleaner."""
    _STORE.clear()
