"""PySpark-native analytics engine with the data-processing capabilities of
the reference ETL pipeline (Wadecaps/prueba-tecnica-http-client-etl).

Spark-first design: every operator is declared through the DataFrame / SQL
API so Catalyst + Tungsten pick the physical strategy (predicate pushdown,
column pruning, partial aggregation, AQE, broadcast joins). Python UDFs are
reserved for the genuinely non-relational paths (HTTP fetch, binary decode),
and there they are Arrow-batched (mapInPandas), never row-at-a-time.

Layout:
    functions/   reusable column expressions (cleaning, text, vectors, portable hashing)
    operators/   relational operators: KPI aggregation, report roll-up, analytics,
                 dedup, similarity search, text stats, multimodal plumbing
    sources/     scans: JSONL/CSV readers, deterministic synthetic generator,
                 HTTP source layer (retry/auth/cookies/redirect)
    sinks/       writers: JSONL/CSV/text/JSON + driver-side HTML/PNG report
    plans/       end-to-end pipeline compositions (bronze -> silver -> gold)
    streaming/   Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
