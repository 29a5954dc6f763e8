"""Drain runner for stream-stream watermarked joins.

The join operator itself is ``streaming.windows.stream_stream_interval_join``
(both sides watermarked + a time-range condition = a provable state
purge horizon); this module wires it to real file streams and a memory
sink so the driver's oracle gate can check a streamed interval join
against the equivalent batch SQL (inner stream-stream joins emit
exactly the batch result). The reference has no streaming joins (its
only streaming op is the Auto-Loader-style file ingest,
news_stream_ingest.py:24-87); this is an extension the incremental
100 TB pipeline shape needs: correlating two event streams without
holding either stream's history in state. The state-bound test lives
in tests/test_streaming.py.
"""

from __future__ import annotations

from news_lakehouse_spark.session import borrows_session_conf
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@borrows_session_conf(**{"spark.sql.legacy.parquet.nanosAsLong": "true"})
def run_interval_join_over_dir(
    spark: SparkSession,
    parquet_path: str,
    checkpoint_dir: str,
    query_name: str = "stream_join",
    left_type: str = "view",
    right_type: str = "purchase",
    within: str = "4 hours",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Drain one events directory through the stream-stream interval
    join (both sides read the SAME files, filtered by event_type) with
    Trigger.AvailableNow into a memory sink; return the joined rows.
    Single-source fan-out is the conversion-funnel shape: one physical
    stream, two logical streams. ``how='left_outer'`` adds the
    funnel-drop rows (left events with no right match within the
    interval, nulls on the right) for every left row whose no-match
    status the FINAL watermark can prove — the terminal no-data
    micro-batch AvailableNow runs after the last data batch flushes
    exactly those rows from state.

    events.ts is parquet TIMESTAMP(NANOS) in the test corpus — read as
    raw nanos and truncated to micros, same contract as
    sources.readers.read_table.
    """
    import os

    from news_lakehouse_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    schema = spark.read.parquet(parquet_path).schema

    def open_stream():
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        if os.path.isfile(parquet_path.replace("file://", "")):
            reader = reader.option(
                "pathGlobFilter", os.path.basename(parquet_path)
            )
            stream = reader.parquet(os.path.dirname(parquet_path))
        else:
            stream = reader.parquet(parquet_path)
        if dict(stream.dtypes).get("ts") == "bigint":
            stream = stream.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
        # Watermarks require TIMESTAMP (with zone); parquet NTZ
        # timestamps cast losslessly under the UTC session timezone.
        if dict(stream.dtypes).get("ts") == "timestamp_ntz":
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        return stream.select("user_id", "event_id", "ts", "event_type")

    joined = stream_stream_interval_join(
        open_stream().filter(F.col("event_type") == left_type).drop("event_type"),
        open_stream().filter(F.col("event_type") == right_type).drop("event_type"),
        key="user_id",
        watermark=watermark,
        interval=within,
        how=how,
    )
    # Size the state-store partition count from the input like AQE
    # would size a batch shuffle (streaming/statesize.py): a
    # stream-stream join runs FOUR store instances per partition and
    # every micro-batch pays a fixed commit cost per instance, so a
    # session-core-count default overpays ~core/n_adaptive x on small
    # drains while a TB-scale stream still gets the session ceiling.
    # Results are partition-count-invariant (oracle-pinned); restarts
    # keep the checkpoint's original count by Spark's own contract.
    from news_lakehouse_spark.streaming.statesize import (
        adaptive_state_partitions,
    )

    n_parts = adaptive_state_partitions(spark, parquet_path, scans=2)
    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key)
    spark.conf.set(key, str(n_parts))
    try:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, prior)
    return spark.table(query_name)


@borrows_session_conf(**{"spark.sql.legacy.parquet.nanosAsLong": "true"})
def run_stream_dedup_over_dir(
    spark: SparkSession,
    parquet_path: str,
    checkpoint_dir: str,
    query_name: str = "stream_dedup",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drain a DOUBLED events stream (the same files read as two
    streams, unioned — every event arrives twice, the duplicated-
    delivery shape an at-least-once upstream produces) through
    ``streaming.windows.dedupe_stream_within_watermark`` on event_id
    with Trigger.AvailableNow into a memory sink. The result must be
    exactly the distinct events — the batch oracle. State is bounded
    by the watermark (the eviction property dropDuplicates-without-
    watermark lacks); the state-bound test lives in tests/.
    """
    import os

    from news_lakehouse_spark.streaming.windows import (
        dedupe_stream_within_watermark,
    )

    schema = spark.read.parquet(parquet_path).schema

    def open_stream():
        reader = spark.readStream.schema(schema)
        if os.path.isfile(parquet_path.replace("file://", "")):
            reader = reader.option(
                "pathGlobFilter", os.path.basename(parquet_path)
            )
            stream = reader.parquet(os.path.dirname(parquet_path))
        else:
            stream = reader.parquet(parquet_path)
        if dict(stream.dtypes).get("ts") == "bigint":
            stream = stream.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
        if dict(stream.dtypes).get("ts") == "timestamp_ntz":
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        return stream.select(
            "event_id", "user_id", "ts", "event_type", "value"
        )

    doubled = open_stream().unionByName(open_stream())
    deduped = dedupe_stream_within_watermark(
        doubled, ["event_id"], ts_col="ts", watermark=watermark
    )
    # input-adaptive state partitions (see run_interval_join_over_dir)
    from news_lakehouse_spark.streaming.statesize import (
        adaptive_state_partitions,
    )

    n_parts = adaptive_state_partitions(spark, parquet_path, scans=2)
    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key)
    spark.conf.set(key, str(n_parts))
    try:
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, prior)
    return spark.table(query_name)
