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
