"""Readers: parquet test-corpus tables + bronze JSON (batch & stream).

Reference parity:
- S1 streaming JSON directory scan (gcs_bronze_to_silver.py:511-517):
  schema-declared, recursive, PERMISSIVE, rate-limited micro-batches.
- S2 batch JSON scan (gcs_bronze_to_silver_batch.py:511-516).
- S4 file-provenance column: topic derived from the file path
  (gcs_bronze_to_silver.py:520-521) — `input_file_name` + regexp.

Scale notes: schema is always declared (no inference pass over 100 TB);
PERMISSIVE mode turns malformed records into nulls instead of failing a
1000-executor job; `maxFilesPerTrigger` bounds micro-batch size so state
and shuffle stay predictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from news_lakehouse_spark.schemas import NEWS_SCHEMA, TESTDATA_TABLES


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one test-corpus parquet table (columnar, pushdown-enabled).

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark has
    no native type for — read it as raw nanos (legacy conf, runtime-
    settable) and truncate to microseconds, matching how DuckDB's
    TIMESTAMP_NS → TIMESTAMP cast truncates on the oracle side.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several corpus tables at once; default = all of them."""
    names = names or TESTDATA_TABLES
    return {n: read_table(spark, sf_dir, n) for n in names}


def read_bronze_batch(
    spark: SparkSession,
    path: str,
    schema: T.StructType = NEWS_SCHEMA,
) -> DataFrame:
    """Batch JSON directory scan (S2)."""
    return (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def read_bronze_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = NEWS_SCHEMA,
    max_files_per_trigger: int = 500,
) -> DataFrame:
    """Streaming JSON directory scan (S1) — file source micro-batches."""
    return (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def with_path_provenance(
    df: DataFrame,
    pattern: str = r"/vnexpress/([^/]+)/",
    col_name: str = "topic",
) -> DataFrame:
    """Derive a provenance column from the source file path (S4)."""
    return df.withColumn(
        col_name, F.regexp_extract(F.input_file_name(), pattern, 1)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV scan with a declared schema (never inferSchema — at 100 TB
    inference is a full extra pass). PERMISSIVE mirrors the JSON
    ingest contract: malformed rows become nulls, not job failures."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
        .csv(path)
    )


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
) -> DataFrame:
    """Binary-file scan for multimodal ingest: one row per file with
    (path, modificationTime, length, content binary).

    The `binaryFile` source is the entry point for image/audio/video
    corpora (no reference analog — the reference ingests text JSON
    only). Scale notes: each file must fit in one task's memory, so
    `max_bytes` pushes a `length <= N` filter that the source evaluates
    from file status BEFORE reading content (binaryFile supports
    predicate pushdown on length/path/modificationTime) — oversized
    blobs are skipped at listing time, not after a 5 GB read. Glob
    filtering likewise happens during listing via pathGlobFilter.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    df = r.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df
