"""applyInPandasWithState: per-user running stats across micro-batches."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def test_state_survives_across_micro_batches(spark):
    from news_lakehouse_spark.streaming.stateful import run_user_stats_over_dir

    data_dir = tempfile.mkdtemp(prefix="events_stream_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        rows1 = [(1, 10.0, "2024-01-01 10:00:00"), (2, 5.0, "2024-01-01 10:01:00")]
        rows2 = [(1, 2.5, "2024-01-01 11:00:00"), (3, 1.0, "2024-01-01 11:30:00")]
        for i, rows in enumerate([rows1, rows2]):
            df = spark.createDataFrame(
                rows, "user_id long, value double, ts string"
            ).select("user_id", "value", F.col("ts").cast("timestamp"))
            df.coalesce(1).write.parquet(f"{data_dir}/part{i}")
        # flatten: move part files into data_dir as separate files
        files = []
        for i in range(2):
            sub = f"{data_dir}/part{i}"
            [pq] = [f for f in os.listdir(sub) if f.endswith(".parquet")]
            shutil.move(f"{sub}/{pq}", f"{data_dir}/batch{i}.parquet")
            shutil.rmtree(sub)
        # one file per micro-batch → user 1's state must carry across
        out = run_user_stats_over_dir(
            spark,
            data_dir,
            ckpt,
            query_name="t_state_mb",
            max_files_per_trigger=1,
        )
        got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in out.collect()}
        assert got == {1: (2, 12.5), 2: (1, 5.0), 3: (1, 1.0)}
        ts = {r["user_id"]: str(r["last_ts"]) for r in out.collect()}
        assert ts[1].startswith("2024-01-01 11:00")
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_dedupe_within_watermark_streaming(spark):
    from news_lakehouse_spark.streaming.windows import (
        dedupe_stream_within_watermark,
    )

    data_dir = tempfile.mkdtemp(prefix="dedup_stream_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_dedup_")
    try:
        # duplicate event_id 1 appears in both files, 2 min apart —
        # within the 10-minute watermark it must be dropped once
        rows1 = [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:01:00")]
        rows2 = [(1, "2024-01-01 10:02:00"), (3, "2024-01-01 10:03:00")]
        for i, rows in enumerate([rows1, rows2]):
            df = spark.createDataFrame(rows, "event_id long, ts string").select(
                "event_id", F.col("ts").cast("timestamp")
            )
            df.coalesce(1).write.parquet(f"{data_dir}/b{i}")
            sub = f"{data_dir}/b{i}"
            [pq] = [f for f in os.listdir(sub) if f.endswith(".parquet")]
            shutil.move(f"{sub}/{pq}", f"{data_dir}/file{i}.parquet")
            shutil.rmtree(sub)

        schema = spark.read.parquet(f"{data_dir}/file0.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(data_dir)
        )
        deduped = dedupe_stream_within_watermark(
            stream, ["event_id"], "ts", "10 minutes"
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_dedup_wm")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(r["event_id"] for r in spark.table("t_dedup_wm").collect())
        assert got == [1, 2, 3]
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
