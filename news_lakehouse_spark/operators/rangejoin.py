"""Bucketized range join — point-in-interval joins without a cross product.

The reference has no range/theta joins (SURVEY §2.3 — absent); Spark
plans a raw `p.ts BETWEEN r.start AND r.end` predicate as
BroadcastNestedLoopJoin (quadratic, and broadcast-bound). The scalable
form maps both sides onto fixed-width time buckets and equi-joins on
the bucket id:

- each point lands in exactly one bucket;
- each range explodes to the buckets it overlaps (span/width rows —
  pick ``bucket_width_seconds`` near the typical range length so the
  blow-up is O(1));
- the bucket equi-join shuffles/broadcasts like any other join, then
  the exact containment predicate filters within the bucket.

Hot buckets (rush-hour skew) are ordinary join skew — AQE skew-join
splitting applies, unlike a nested-loop plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def _micros(col: str) -> F.Column:
    """Epoch microseconds, tolerant of TIMESTAMP_NTZ inputs.

    ``unix_micros`` rejects TIMESTAMP_NTZ; the cast interprets naive
    values in the session timezone (pinned to UTC by build_session), so
    the mapping is deterministic and monotone for both join sides.
    """
    return F.unix_micros(F.col(col).cast("timestamp"))


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    point_ts: str,
    range_start: str,
    range_end: str,
    bucket_width_seconds: int = 1800,
) -> DataFrame:
    """Inner join: point rows × range rows with
    ``range_start <= point_ts < range_end``.

    Column names must be disjoint between the two inputs (pre-alias);
    output carries all columns from both sides.
    """
    width_us = F.lit(int(bucket_width_seconds) * 1_000_000)
    p = points.withColumn(_BUCKET, F.floor(_micros(point_ts) / width_us))
    # end is exclusive: the last covered bucket holds end - 1µs
    r = ranges.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(_micros(range_start) / width_us),
                F.floor((_micros(range_end) - 1) / width_us),
            )
        ),
    )
    return (
        p.join(r, _BUCKET)
        .filter(
            (F.col(point_ts) >= F.col(range_start))
            & (F.col(point_ts) < F.col(range_end))
        )
        .drop(_BUCKET)
    )
