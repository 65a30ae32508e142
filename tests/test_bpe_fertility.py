"""Tokenizer fertility/coverage monitor (bpe_fertility_by_source): the
structural invariants of BPE segmentation per source, and the alphabet
OOV path — characters absent from the TRAIN split's frozen alphabet
must surface as OOV occurrences (the natural corpus is all-ASCII across
splits, so the OOV leg needs an injected drift doc to be exercised)."""

from __future__ import annotations

import pyspark.sql.functions as F

from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.corpus import (
    SPLIT_TRAIN_PCT,
    bpe_fertility_by_source,
)
from prueba_tecnica_http_client_etl_spark.schemas import load_table
from tests.conftest import SF_SMOKE


def test_fertility_invariants_natural_corpus(spark):
    rows = bpe_fertility_by_source(spark, SF_SMOKE).collect()
    assert rows, "no sources"
    assert [r.source for r in rows] == sorted(r.source for r in rows)
    for r in rows:
        # merges only ever shrink the symbol stream; every word is >= 1
        # symbol; char accounting covers every symbol character
        assert r.n_words <= r.n_symbols <= r.n_chars, r
        assert 0 <= r.oov_char_occurrences <= r.n_chars, r
        assert r.symbols_per_word >= 1.0, r
        assert 0.0 < r.symbols_per_char <= 1.0, r
    # the trained tokenizer must actually merge somewhere
    assert any(r.n_merged_symbols > 0 for r in rows)
    # train and val/test share the ASCII alphabet in the synthetic
    # corpus: OOV is structurally zero here (the injected-drift test
    # below is what exercises the non-zero leg)
    assert all(r.oov_char_occurrences == 0 for r in rows)
    drain()


def _nontrain_text(spark, base: str) -> str:
    """A variant of `base` whose digest-keyed split lands OUTSIDE the
    train slice (u >= SPLIT_TRAIN_PCT) — the split is a pure function of
    the normalized text, so candidates are probed with the same salted
    expression the operator uses."""
    from prueba_tecnica_http_client_etl_spark.functions import textprep as tp
    from prueba_tecnica_http_client_etl_spark.functions.portable import salted

    # vary with COMMON letters only ('e'/'t' padding): a digit or rare
    # letter in the suffix would itself be alphabet-OOV and contaminate
    # the expected count
    cands = spark.createDataFrame(
        [(f"{base} {'et' * (i + 1)}",) for i in range(64)], "text string"
    )
    u = salted("split", F.md5(F.expr(tp.SPARK_NORM))) % 100
    hit = cands.select("text", u.alias("u")).filter(
        F.col("u") >= SPLIT_TRAIN_PCT
    ).limit(1).collect()
    assert hit, "no candidate text landed outside the train split"
    return hit[0].text


def test_alphabet_oov_detects_drift(spark, tmp_path):
    """A val/test-split document carrying characters the train slice has
    never seen must surface them as OOV occurrences for its source only
    — the drift signal the monitor exists for."""
    import re

    from prueba_tecnica_http_client_etl_spark.functions import textprep as tp
    from prueba_tecnica_http_client_etl_spark.functions.portable import salted

    novel = _nontrain_text(spark, "omega ωωω drift probe text")
    assert novel.count("ω") == 3
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    extra = spark.createDataFrame(
        [(10**6, novel, "en", "zz_drift", len(novel))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf_drift")
    aug = docs.unionByName(extra)
    aug.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    # independent expectation: python set logic over the collected corpus
    # (only the split key reuses the salted expression — it IS the split)
    u = salted("split", F.md5(F.expr(tp.SPARK_NORM))) % 100
    collected = aug.select("source", "text", u.alias("u")).collect()
    chars = lambda t: re.sub(r"\s+", " ", t.strip().lower()).replace(" ", "")
    train_alpha = {ch for r in collected if r.u < SPLIT_TRAIN_PCT for ch in chars(r.text)}
    want_oov: dict[str, int] = {}
    for r in collected:
        want_oov[r.source] = want_oov.get(r.source, 0) + sum(
            1 for ch in chars(r.text) if ch not in train_alpha
        )

    rows = {r.source: r for r in bpe_fertility_by_source(spark, sf).collect()}
    assert {s: r.oov_char_occurrences for s, r in rows.items()} == want_oov
    drift = rows["zz_drift"]
    # the injected val/test-only ω is OOV by construction
    assert "ω" not in train_alpha and drift.oov_char_occurrences >= 3
    assert drift.oov_char_rate > 0.0
    drain()
