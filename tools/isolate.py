#!/usr/bin/env python
"""Per-query isolation harness (guide §1): time one or more registered
queries with the noop sink on a fresh session, optionally several shots,
and optionally dump .explain("formatted") to a file.

Usage:
    python tools/isolate.py QUERY [QUERY...] [--shots N] [--explain DIR] [--suffix TAG]

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32) — same contract as bench.py.

This is a developer tool, not part of the driver contract; bench.py
remains the only artifact the driver runs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--shots", type=int, default=2)
    ap.add_argument("--explain", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before", help="explain file suffix")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from prueba_tecnica_http_client_etl_spark.session import get_spark
    from prueba_tecnica_http_client_etl_spark import registry

    spark = get_spark("isolate")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py so shot 1 is comparable
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    n_workers = int(os.environ["SPARK_GRAFT_CPUS"])
    spark.range(n_workers * 100).repartition(n_workers).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as _F

    _r = spark.read.parquet(f"{sf_dir}/region.parquet")
    _r.join(_F.broadcast(_r.select(_F.col("r_regionkey").alias("k"))),
            _r.r_regionkey == _F.col("k")).write.format("noop").mode("overwrite").save()

    all_queries = registry.queries()
    for name in args.queries:
        fn = all_queries[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = Path(args.explain) / f"{name}_{args.suffix}.txt"
            out.write_text(plan)
            print(f"explain -> {out}")
        times = []
        for shot in range(args.shots):
            spark.catalog.clearCache()
            for q in spark.streams.active:
                q.stop()
            spark.range(10_000).selectExpr("count(*)").collect()
            spark.sparkContext.setJobDescription(f"{name} shot{shot}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: {times} min={min(times)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
