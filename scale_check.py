"""Scale-trend spot check (judge round-6 item 7): time flagship queries
at sf0.1 and at a generated sf1 (10x) replica, and report per-query
scaling factors — the first direct evidence that the plans' claimed
linearity holds across a decade of data.

The sf1 input is DERIVED from /root/testdata/sf0.1 (never synthesized
from scratch — TESTDATA.md's tables remain the ground truth): each fact
table is unioned 10x with per-replica KEY SHIFTS so join relationships,
group cardinalities and per-key densities are preserved:

- events:    event_id/user_id shifted -> 10x events, 10x users, same
             per-user density (sessionization/window semantics intact)
- documents: doc_id shifted, a per-replica suffix appended to text so
             exact-dedup finds no cross-replica duplicates (10x docs,
             same duplicate-rate per replica)
- lineitem/orders: orderkey shifted in lockstep (joins intact);
  customer: custkey shifted in lockstep with o_custkey
- dims (region/nation/supplier/part) and embeddings copy unshifted

Queries chosen for the check are exactly the ones whose semantics are
invariant under this replication (map/agg/join/window over shifted
keys). Dedup/ANN tiers are deliberately excluded: replicating text or
vectors 10x changes the PROBLEM (near-duplicate density), not just the
size, so their scaling is measured by their own documented ladders
instead.

Usage:  python scale_check.py            # generates replica if missing
        SPARK_GRAFT_SF1_DIR=...         # override replica location
"""

from __future__ import annotations

import json
import os
import sys
import time

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1_replica")
REPLICAS = 10

FLAGSHIPS = [
    "clean_coerce",
    "kpi_daily",
    "kpi_global_exact",
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "events_hourly_window",
    "latest_event_per_user",
    "dedup_exact",
    "quality_score",
]


def build_replica(spark) -> None:
    """10x key-shifted union of sf0.1, written once — gated on a
    whole-replica _REPLICA_DONE marker written after ALL tables succeed
    (per-table _SUCCESS files alone can't tell a complete replica from
    one that crashed between tables)."""
    from pyspark.sql import functions as F

    from prueba_tecnica_http_client_etl_spark.schemas import load_table

    if os.path.exists(os.path.join(SF1, "_REPLICA_DONE")):
        return
    os.makedirs(SF1, exist_ok=True)

    def shifted_union(name: str, shifts: dict[str, int], text_suffix: bool = False):
        base = load_table(spark, SF01, name)
        parts = []
        for i in range(REPLICAS):
            df = base
            for col, span in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * span))
            if text_suffix and i > 0:
                df = df.withColumn("text", F.concat(F.col("text"), F.lit(f" __r{i}")))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(SF1, f"{name}.parquet"))

    def spans(name: str, cols: list[str]) -> dict[str, int]:
        from pyspark.sql import functions as F

        row = (
            load_table(spark, SF01, name)
            .agg(*[(F.max(c) + 1).alias(c) for c in cols])
            .collect()[0]
        )
        return {c: int(row[c]) for c in cols}

    ev = spans("events", ["event_id", "user_id"])
    shifted_union("events", ev)
    shifted_union("documents", spans("documents", ["doc_id"]), text_suffix=True)
    # the custkey span must come from CUSTOMER, not orders: the corpus
    # deliberately contains customers without orders, so max(o_custkey)
    # can be below max(c_custkey) and an orders-derived span would make
    # replicas' customer keys overlap (duplicate primary keys). One span
    # shifts both sides so the FK relationship is preserved.
    cust_span = spans("customer", ["c_custkey"])["c_custkey"]
    okey_span = spans("orders", ["o_orderkey"])["o_orderkey"]
    shifted_union("lineitem", {"l_orderkey": okey_span})
    shifted_union("orders", {"o_orderkey": okey_span, "o_custkey": cust_span})
    shifted_union("customer", {"c_custkey": cust_span})
    for dim in ("region", "nation", "supplier", "part", "embeddings"):
        load_table(spark, SF01, dim).write.mode("overwrite").parquet(
            os.path.join(SF1, f"{dim}.parquet")
        )
    with open(os.path.join(SF1, "_REPLICA_DONE"), "w") as f:
        f.write(f"replicas={REPLICAS} from={SF01}\n")


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from prueba_tecnica_http_client_etl_spark import registry
    from prueba_tecnica_http_client_etl_spark.session import get_spark

    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)

    qs = registry.queries()

    def timed(name: str, sf_dir: str) -> float:
        # min of 2: the second shot sheds plan-compile cost
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    # warm workers / footers outside the timed region (bench.py convention)
    qs["dedup_exact"](spark, SF01).collect()
    results = {}
    for name in FLAGSHIPS:
        t_small = timed(name, SF01)
        t_big = timed(name, SF1)
        results[name] = {
            "sf0.1_s": round(t_small, 2),
            "sf1_s": round(t_big, 2),
            "factor": round(t_big / t_small, 2),
        }
        print(f"{name}: sf0.1 {t_small:.2f}s  sf1 {t_big:.2f}s  x{t_big / t_small:.2f}", flush=True)
    print(json.dumps({"scale_check": results, "replicas": REPLICAS}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
