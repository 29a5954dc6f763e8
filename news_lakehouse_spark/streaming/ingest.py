"""Streaming bronze → silver ingestion (reference T1-T3, S11).

File-source micro-batches (`maxFilesPerTrigger`), checkpoint-based
exactly-once, and a `foreachBatch` that runs the full 10-table silver
derivation + keyed upsert per epoch — idempotent because identity is
content-hashed and the sink MERGEs on those keys
(gcs_bronze_to_silver.py:392-496,511-573).

At scale: each epoch's work is bounded by the file-trigger cap, and the
upsert's anti-join shuffles only the delta against the affected
partitions of the target (see operators.merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from news_lakehouse_spark.metrics import pipeline_metrics
from news_lakehouse_spark.operators.merge import upsert_parquet_table
from news_lakehouse_spark.plans.silver import build_silver_tables
from news_lakehouse_spark.schemas import NEWS_SCHEMA
from news_lakehouse_spark.sources.readers import read_bronze_stream

# Merge keys per silver table (reference MERGE ONs, b2s:457-490).
SILVER_KEYS: dict[str, list[str]] = {
    "authors": ["AuthorID"],
    "topics": ["TopicID"],
    "subtopics": ["SubTopicID"],
    "keywords": ["KeywordID"],
    "references_table": ["ReferenceID"],
    "articles": ["ArticleID"],
    "article_keywords": ["ArticleID", "KeywordID"],
    "article_references": ["ArticleID", "ReferenceID"],
    "comments": ["CommentID"],
    "comment_interactions": ["CommentInteractionID"],
}
# Link tables get insert-only merges (S9, b2s:476-490).
INSERT_ONLY = {"article_keywords", "article_references"}


def upsert_silver_batch(
    spark: SparkSession, batch_df: DataFrame, out_dir: str
) -> None:
    """One micro-batch epoch: derive all silver tables, upsert each.

    Mirrors upsert_batch (b2s:392-496): empty-batch guard → persist →
    10 derivations (each already dropna+dropDuplicates-guarded) →
    per-table keyed merge → unpersist.
    """
    if batch_df.isEmpty():
        return
    batch_df.persist()
    try:
        with pipeline_metrics("bronze_to_silver_batch") as m:
            # the persist means this count is a cache read, not a second
            # source scan — the one place a records metric is free
            m.records = batch_df.count()
            tables = build_silver_tables(batch_df, require_ts=True)
            for name, df in tables.items():
                with pipeline_metrics(f"upsert_{name}"):
                    upsert_parquet_table(
                        spark,
                        df,
                        f"{out_dir}/{name}",
                        keys=SILVER_KEYS[name],
                        insert_only=name in INSERT_ONLY,
                    )
    finally:
        batch_df.unpersist()


def run_bronze_to_silver_stream(
    spark: SparkSession,
    bronze_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = NEWS_SCHEMA,
    max_files_per_trigger: int = 500,
    await_termination: bool = False,
):
    """Start the streaming bronze→silver job; returns the query handle.

    Callers in tests use query.processAllAvailable() to drive it
    synchronously over fixture drops.
    """
    stream = read_bronze_stream(spark, bronze_dir, schema, max_files_per_trigger)
    query = (
        stream.writeStream.foreachBatch(
            lambda df, _epoch: upsert_silver_batch(spark, df, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
