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


def _ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; parquet fixtures read as
    TIMESTAMP_NTZ under Spark's NTZ inference. The session timezone is
    pinned to UTC (session.py), so the cast only changes the type tag,
    never the instant."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


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
        src = _ensure_event_time(src, ts_col).withWatermark(ts_col, watermark)
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
            # double cast tolerates TIMESTAMP_NTZ (NTZ → bigint is illegal)
            F.col(ts_col).cast("timestamp").cast("long")
            - F.lag(F.col(ts_col)).over(w).cast("timestamp").cast("long")
            > F.lit(gap_seconds)
        ).cast("int"),
    ).withColumn(
        "session_seq",
        F.sum(F.coalesce(F.col("_new_session"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.drop("_new_session")


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native session windows (F.session_window): per-user sessions
    closed after ``gap`` of inactivity.

    The streaming twin of ``sessionize`` — in streaming mode the
    watermark both admits late data and lets the state store evict
    closed sessions (bounded state at any stream rate). Works in batch
    too, which is how the oracle checks it.
    """
    src = events
    if watermark:
        src = _ensure_event_time(src, ts_col).withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), user_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedupe_stream_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with bounded state (T-family extension).

    dropDuplicatesWithinWatermark keeps each key's state only until the
    watermark passes it — the production-safe form of streaming dedup:
    plain dropDuplicates on a stream grows state forever, which is
    exactly the failure mode a 100 TB/day feed hits first. Duplicates
    arriving within the watermark window are suppressed; a re-emit
    after state eviction is the documented trade (at-least-once dedup,
    not exactly-once over all history — pair with the keyed MERGE sink
    in operators/merge.py for end-to-end idempotency).
    """
    return (
        _ensure_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    interval: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within a time interval (T-family).

    Matches right rows whose timestamp falls in
    [left_ts, left_ts + interval], with BOTH sides watermarked — the
    condition Structured Streaming needs to evict join state: the
    watermark bounds how late a match can arrive, the interval bounds
    how far apart matched rows may be, and together they give the
    state store a provable purge horizon (unbounded state otherwise,
    the stream-stream join's classic OOM).

    ``how='left_outer'`` additionally emits each unmatched left row
    ONCE, with nulls on the right — the conversion-funnel-drop shape
    (views with no purchase within the interval). Emission is
    watermark-driven: a left row surfaces as unmatched only when the
    global watermark proves no matching right row can still arrive
    (left_ts + interval < watermark), so rows near the head of the
    stream stay pending until more data advances the watermark —
    inherent to the semantics, not a buffering artifact.
    ``how='full_outer'`` also emits unmatched RIGHT rows (orphaned
    purchases) once their horizon passes (right_ts < watermark: any
    still-arriving left row would have left_ts ≥ watermark > right_ts
    and could no longer satisfy left_ts ≤ right_ts).

    Columns are prefixed l_/r_ (except the join key) because both
    sides usually share names.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(
            f"how must be 'inner', 'left_outer' or 'full_outer', got {how!r}"
        )
    l = _ensure_event_time(left, left_ts).withWatermark(left_ts, watermark).select(
        F.col(key),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c != key
        ],
    )
    r = _ensure_event_time(right, right_ts).withWatermark(right_ts, watermark).select(
        F.col(key).alias("__rk"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != key
        ],
    )
    cond = (
        (F.col(key) == F.col("__rk"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {interval}"))
    )
    out = l.join(r, cond, how)
    if how == "full_outer":
        # unmatched-right rows carry their key in __rk only
        out = out.withColumn(key, F.coalesce(F.col(key), F.col("__rk")))
    return out.drop("__rk")
