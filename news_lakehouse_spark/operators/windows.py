"""Window-based operators: deterministic dedup + top-k per group.

The reference dedupes with dropDuplicates (arbitrary survivor —
SURVEY §2.5 W1) before every MERGE to avoid cardinality violations
(gcs_bronze_to_silver.py:426-446). Our engine offers the deterministic
variant: row_number over (partition by keys, order by tiebreak) == 1,
so re-runs and oracle comparisons are stable.

Scale note: both are a single hash-shuffle on the key columns; the
window variant additionally sorts within each partition. At 100 TB
prefer the window form only when survivor identity matters — otherwise
dropDuplicates lets AQE use partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedupe_latest(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Keep exactly one row per key: first row under ``order_by``."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_last(
    df: DataFrame,
    partition_by: list[str],
    ts_col: str,
    condition: Column,
    value: Column,
    out_col: str,
    tiebreak: list[Column] | None = None,
) -> DataFrame:
    """As-of lookup: latest ``value`` (rows where ``condition``) at or
    before each row's ``ts_col``, per partition key.

    Spark has no native as-of join; the scalable form is a single
    window scan over the interleaved stream — one shuffle on the
    partition key, O(n) per partition — instead of the quadratic
    inequality join (guide: as-of via bucketize/merge_asof; this is
    the pure-DataFrame variant).

    Uses last(..., ignorenulls) so the *most recent* qualifying value
    wins regardless of whether ``value`` is monotone in ``ts_col``
    (max() would silently pick the largest, not the latest). Ordering
    ties on ``ts_col`` are not deterministic — pass extra ordering
    columns via ``tiebreak`` (e.g. a unique id) when duplicates exist.
    """
    order = [F.col(ts_col), *(tiebreak or [])]
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col, F.last(F.when(condition, value), ignorenulls=True).over(w)
    )


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group (reference O2: first-N comments per article).

    row_number (not rank) so ties never inflate k; callers must include
    a unique tiebreaker in ``order_by`` for determinism.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
