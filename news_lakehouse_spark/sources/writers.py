"""Writers: partitioned serving export (reference S13 analog).

The reference full-refreshes gold tables into BigQuery with day
partitioning + clustering (gold_to_bigquery.py:118-142). Offline, the
idiomatic Spark equivalent is a partitioned parquet export: partition
columns give partition pruning to downstream readers, and sorting
within partitions plays the role of clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def serving_export(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Full-refresh export to partitioned parquet (WRITE_TRUNCATE analog)."""
    out = df
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles the data ONCE at write time: two tables
    bucketed on the same key with the same bucket count join with NO
    exchange on either side — at 100 TB this converts the nightly
    fact-fact join from a full network shuffle into a zipped local
    join (tests/test_bucketing.py pins the exchange-free plan).
    Sorting within buckets additionally removes the join's sort step.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table_name)
