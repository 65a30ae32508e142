"""Full corpus-build funnel (corpus_build_funnel): the per-source row
must be an exact conservation identity over the staged corpus, and each
stage's attribution must agree with the canonical stage query computed
independently."""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.functions.cachepool import drain
from prueba_tecnica_http_client_etl_spark.operators.curation import (
    PROBE_STRIDE,
    contamination_check,
    corpus_build_funnel,
    dedup_survivors,
    with_quality_reason,
)
from prueba_tecnica_http_client_etl_spark.operators.dedup import docs_normalized
from tests.conftest import SF_SMOKE


def test_conservation_and_stage_attribution(spark):
    rows = corpus_build_funnel(spark, SF_SMOKE).collect()
    assert rows and [r.source for r in rows] == sorted(r.source for r in rows)
    for r in rows:
        # every document lands in exactly one funnel stage
        assert r.n_docs_in == (
            r.n_probe_holdout
            + r.n_drop_quality
            + r.n_drop_neardup
            + r.n_drop_contaminated
            + r.n_val
            + r.n_test
            + r.n_docs_packed
        ), r
        assert 0 <= r.n_tokens_packed <= r.n_tokens_in, r
        # packed docs segment to at least one symbol per word-token is
        # not guaranteed (empty-string tokens), but symbols require docs
        assert (r.n_symbols_packed > 0) <= (r.n_docs_packed > 0), r
        # bin accounting: ceil(n_symbols / CONTEXT_TOKENS)
        from prueba_tecnica_http_client_etl_spark.operators.curation import (
            PIPELINE_CONTEXT_TOKENS,
        )

        want_bins = (
            0
            if r.n_symbols_packed == 0
            else (r.n_symbols_packed - 1) // PIPELINE_CONTEXT_TOKENS + 1
        )
        assert r.n_bins == want_bins, r

    # global cross-checks against the canonical stage queries, computed
    # independently of the funnel's stage CASE
    tot = {c: sum(getattr(r, c) for r in rows) for c in rows[0].asDict()
           if c != "source"}
    d = with_quality_reason(docs_normalized(spark, SF_SMOKE)).select(
        "doc_id", "reason"
    )
    n_probe = d.filter(F.col("doc_id") % PROBE_STRIDE == 0).count()
    assert tot["n_probe_holdout"] == n_probe
    n_quality = d.filter(
        (F.col("doc_id") % PROBE_STRIDE != 0) & (F.col("reason") != "ok")
    ).count()
    assert tot["n_drop_quality"] == n_quality
    # near-dup drops: canonical drop decisions among quality-ok non-probe
    ok = d.filter((F.col("doc_id") % PROBE_STRIDE != 0) & (F.col("reason") == "ok"))
    drops = dedup_survivors(spark, SF_SMOKE).filter(F.col("decision") == "drop")
    assert tot["n_drop_neardup"] == ok.join(drops, "doc_id").count()
    # contamination drops: flagged docs surviving the first three stages
    surv3 = ok.join(drops, "doc_id", "left_anti")
    flagged = contamination_check(spark, SF_SMOKE).select("doc_id")
    assert tot["n_drop_contaminated"] == surv3.join(flagged, "doc_id").count()
    drain()
