"""news_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference news-lakehouse ETL
pipeline (hoangduong14/news_lakehouse), extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication,
similarity search, multimodal column plumbing, and text analysis.

Layout
------
- ``session``    : SparkSession factory with scale-sane defaults.
- ``schemas``    : bronze news schema + test-corpus table schemas.
- ``functions``  : scalar column kits (keys, timestamps, text, json maps).
- ``operators``  : relational / dataflow operators (dedupe, similarity,
                   merge/upsert, windows, text metrics, multimodal).
- ``plans``      : end-to-end pipelines (bronze→silver, silver→gold star
                   schema, serving flat view).
- ``sources``    : readers (batch/stream JSON, parquet tables) and
                   writers (partitioned serving export).
- ``streaming``  : Structured Streaming ingestion + watermarked windows.

Everything is expressed with the DataFrame/SQL API so Catalyst handles
predicate pushdown, column pruning, join planning and AQE; Python UDFs
are avoided in hot paths (the reference's one UDF is re-expressed with
built-in expressions, see ``functions.timestamps``).
"""

__version__ = "0.1.0"
