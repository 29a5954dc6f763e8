"""Watermarked event-time windows + sessionization.

The reference has no event-time windowing (SURVEY §2.8 — absent);
this is the extension surface the category implies, over the `events`
fixture. Batch and streaming share the same expressions: `F.window`
works in both modes, so the windowed aggregation below is the
streaming operator, testable as a batch query with an exact SQL
oracle (time_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding) window counts + value sums per event_type.

    With a watermark (streaming), late rows beyond the bound are
    dropped and state is evicted — constant memory at any stream rate.
    """
    src = events
    if watermark:
        src = src.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        src.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions per user (batch form: lag + cumulative sum).

    session boundary where ts - lag(ts) > gap; session_seq = running
    count of boundaries per user. Streaming twin: session_window().
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    flagged = events.withColumn(
        "_new_session",
        (
            F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(w).cast("long")
            > F.lit(gap_seconds)
        ).cast("int"),
    ).withColumn(
        "session_seq",
        F.sum(F.coalesce(F.col("_new_session"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.drop("_new_session")
