"""File scan sources (SURVEY.md §2.1 S1-S2).

S1 — JSONL scan. The reference streams a JSONL file line-by-line, skips
blank lines, and fail-fasts with a line number on malformed JSON
(reference src/calcular_kpi.py:74-83). Two Spark modes:

- permissive (default): malformed lines become rows with the original
  text in `_corrupt_record` and NULL fields — corruption is *data*, the
  same philosophy as the cast-failure-as-data cleaning layer. At 100 TB
  one bad line must never kill the job; count/quarantine them instead.
- strict: FAILFAST reproduces the reference's fail-fast contract
  (Spark reports file+offset rather than a line number).

Blank-line behavior matches the reference: Spark's JSON reader drops
whitespace-only lines in both modes.

S2 — CSV scan with the explicit KPI schema: no inference pass (a full
extra scan at scale), exact 9-column typing (reference
src/generar_reporte.py:262 relies on pandas inference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import KPI_SCHEMA, LOG_SCHEMA

CORRUPT_COL = "_corrupt_record"


def read_log_jsonl(spark: SparkSession, path: str, *, strict: bool = False) -> DataFrame:
    """S1: JSONL call-log scan with the explicit LOG_SCHEMA."""
    if strict:
        return spark.read.schema(LOG_SCHEMA).option("mode", "FAILFAST").json(path)
    schema = T.StructType(LOG_SCHEMA.fields + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partition a permissive scan into (clean rows, quarantined rows).
    The quarantine side keeps the raw text for replay/debugging.

    The scan is cached first: Spark disallows queries whose referenced
    columns are *only* `_corrupt_record` (the JSON parser would have
    nothing to fail on), and caching the parsed result is the
    documented pattern. At 100 TB, don't split lazily like this — write
    both sides in one pass (foreachBatch / multi-sink) instead of
    caching a full scan."""
    df = df.cache()
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(F.col(CORRUPT_COL).alias("raw"))
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt


def read_kpi_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: KPI fact-table scan, explicitly typed (no inference job)."""
    return spark.read.option("header", True).schema(KPI_SCHEMA).csv(path)
