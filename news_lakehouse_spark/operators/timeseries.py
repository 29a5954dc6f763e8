"""Sliding-window time-series similarity search over event streams.

Pattern matching against user event-value series (cf. "Time Series
Similarity Search for Streaming Data in Distributed Systems", EDBT
2019): find the k windows, across every user's chronological value
sequence, closest to a query pattern under squared euclidean distance.

Spark-first shape:

- each user's series materializes ONCE as an ordered array (one
  shuffle on user_id — the grouping a per-entity time series needs
  anyway; per-entity history is bounded, the cross-corpus union is
  not, which is exactly when arrays-per-key beat a row-per-point
  self-join);
- windows and distances are higher-order functions over that array
  (transform over the start index, aggregate over the offsets) —
  row-local JVM codegen, no explode of (n_points × window) rows and
  no shuffle;
- only (user, start, distance) triples explode, and the global top-k
  is TakeOrderedAndProject — per-partition partial top-k, never a
  full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_window_topk(
    events: DataFrame,
    query: list[float],
    k: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k windows most similar to ``query`` (squared euclidean).

    Windows are length-len(query) runs of each user's values ordered
    by (ts, id). Output: (user_col, win_start 1-based, dist round-6),
    ranked by (dist, user, start) for a deterministic k-set.
    """
    m = len(query)
    q = F.array(*[F.lit(float(v)) for v in query])
    series = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(ts_col, id_col, val_col))
        ).alias("__pts")
    )
    arr = F.transform("__pts", lambda p: p[val_col])
    dist = lambda i: F.aggregate(  # noqa: E731
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.pow(F.element_at(arr, (i + j).cast("int")) - F.element_at(q, (j + 1).cast("int")), 2),
    )
    wins = series.filter(F.size("__pts") >= m).select(
        user_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__pts") - m + 1),
                lambda i: F.struct(
                    i.cast("int").alias("win_start"), dist(i).alias("__d")
                ),
            )
        ).alias("w"),
    )
    return (
        wins.select(
            user_col,
            F.col("w.win_start").alias("win_start"),
            F.round("w.__d", 6).alias("dist"),
        )
        .orderBy("dist", user_col, "win_start")
        .limit(k)
    )
