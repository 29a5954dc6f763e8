"""Declared schemas.

Bronze news schema mirrors the reference's hand-written StructType
(reference: spark_jobs/schema.py:3-27): one JSON object per crawled
article, nested top-comments, and `interaction_details` kept as a
STRING that holds a stringified JSON object (the crawler emits an
object, the declared string type makes Spark stringify it; the silver
job re-parses with from_json — reference gcs_bronze_to_silver.py:371-376).

Test-corpus schemas (region..embeddings) document the driver-generated
parquet tables under /root/testdata (see FIXTURES.md §A) so queries and
oracles are written against exact names/types.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- bronze ---------------------------------------------------------------

TOP_COMMENT_STRUCT = T.StructType(
    [
        T.StructField("commenter_name", T.StringType(), True),
        T.StructField("comment_content", T.StringType(), True),
        T.StructField("total_likes", T.IntegerType(), True),
        # stringified JSON object, e.g. '{"like":"12","love":"3"}'
        T.StructField("interaction_details", T.StringType(), True),
    ]
)

NEWS_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("sub_topic", T.StringType(), True),
        T.StructField("publish_date", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("main_content", T.StringType(), True),
        T.StructField("keywords", T.ArrayType(T.StringType()), True),
        T.StructField("references", T.ArrayType(T.StringType()), True),
        T.StructField("comment_count", T.IntegerType(), True),
        T.StructField("top_comments", T.ArrayType(TOP_COMMENT_STRUCT), True),
        T.StructField("ingested_at", T.StringType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("day", T.IntegerType(), True),
    ]
)

# --- test corpus ----------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
