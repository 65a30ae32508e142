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
