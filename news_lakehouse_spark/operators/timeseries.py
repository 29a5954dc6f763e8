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
    from news_lakehouse_spark.operators.dedupe import _shifted_zip

    m = len(query)
    series = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(ts_col, id_col, val_col))
        ).alias("__pts")
    )
    # Window rows come from ONE posexplode of the zip of m shifted
    # slices of the value series — the previous form indexed the
    # values array from INSIDE nested lambdas (element_at(arr, i+j)
    # where arr was itself a transform over __pts), which interpreted
    # HOF evaluation re-runs per (window, offset) term: O(len·m·len)
    # per user. Here the series expression evaluates once per user
    # row, each window row carries only its m doubles, and the
    # distance is a plain codegen'd expression per row.
    vals = series.filter(F.size("__pts") >= m).select(
        user_col,
        F.transform("__pts", lambda p: p[val_col]).alias("__vals"),
    )
    wins = vals.select(
        user_col,
        F.posexplode(_shifted_zip(F.col("__vals"), m)).alias("__i", "__w"),
    )
    # identical fold order to the previous F.aggregate (0.0 + t0 + t1
    # + …), so the double — and its round(6) — is bit-identical
    d = F.lit(0.0)
    for j in range(m):
        d = d + F.pow(F.col("__w")[f"w{j}"] - F.lit(float(query[j])), 2)
    return (
        wins.select(
            user_col,
            (F.col("__i") + 1).cast("int").alias("win_start"),
            F.round(d, 6).alias("dist"),
        )
        .orderBy("dist", user_col, "win_start")
        .limit(k)
    )


def resample_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    step_seconds: int,
    sum_cols: list[str] | None = None,
    fill: str = "ffill",
) -> DataFrame:
    """Fixed-step resample + gap densification per key — the
    time-series regularization every downstream model wants (equal-
    spaced buckets, no missing steps), done without a driver loop.

    Buckets = floor(epoch/step)*step per key; ``n_events`` counts rows
    per bucket and each of ``sum_cols`` sums into ``sum_<c>``. The
    DENSE grid comes from per-key min/max bucket + ``F.sequence`` +
    explode — generated JVM-side, distributed on the key, never
    collected. Gaps get ``n_events = 0``; sums are forward-filled from
    the last observed bucket (``fill="ffill"``, a running
    last-non-null window over the already-bucketed rows — state is one
    row per key) or left NULL (``fill="null"``). Two keyed shuffles
    total (bucket agg, then the per-key window); the grid join
    broadcasts nothing and moves only bucket-level rows, so cost
    follows keys × steps, not raw events.
    """
    if fill not in ("ffill", "null"):
        raise ValueError(f"unknown fill mode {fill!r}")
    sum_cols = list(sum_cols or [])
    ts = F.col(ts_col).cast("timestamp")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(ts) / step_seconds).cast("long") * step_seconds
    )
    aggs = [F.count("*").alias("n_events")] + [
        F.sum(F.col(c).cast("double")).alias(f"sum_{c}") for c in sum_cols
    ]
    per_bucket = (
        df.withColumn("__bucket", bucket)
        .groupBy(*key_cols, "__bucket")
        .agg(*aggs)
    )
    grid = (
        per_bucket.groupBy(*key_cols)
        .agg(F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(
                    "__lo", "__hi", F.expr(f"INTERVAL {step_seconds} SECOND")
                )
            ).alias("__bucket"),
        )
    )
    out = grid.join(per_bucket, [*key_cols, "__bucket"], "left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0))
    )
    if fill == "ffill" and sum_cols:
        from pyspark.sql import Window

        w = (
            Window.partitionBy(*key_cols)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in sum_cols:
            out = out.withColumn(
                f"sum_{c}", F.last(f"sum_{c}", ignorenulls=True).over(w)
            )
    return out.withColumnRenamed("__bucket", "bucket")


def grouped_linear_fit(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key ordinary-least-squares line fit (slope, intercept, r2,
    n) — thousands of tiny models in ONE aggregation, the grouped-
    model-fit shape (per-entity trend, drift detection, per-domain
    quality slope) that does NOT need applyInPandas: OLS closed form
    is five sufficient statistics (n, Σx, Σy, Σxy, Σx²(+Σy² for r²)),
    so the whole thing is a single map-side-combinable groupBy — one
    keyed shuffle of 6 doubles per key, whatever the row count.

    Rows with NULL x or y are skipped; keys with fewer than 2 points
    or zero x-variance return NULL slope/intercept/r2 (a vertical or
    single-point fit has no line), with ``n`` still reported.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    d = df.filter(x.isNotNull() & y.isNotNull())
    # covar_samp/var_samp/corr are Spark's numerically-stable streaming
    # moments (centered updates, not raw power sums — raw Σxy/Σx² lose
    # the answer's low digits once sums grow, which showed up as
    # oracle hash flips at sf0.1), and they stay map-side combinable.
    agg = d.groupBy(*key_cols).agg(
        F.count("*").alias("n"),
        F.avg(x).alias("_mx"),
        F.avg(y).alias("_my"),
        F.covar_samp(x, y).alias("_cxy"),
        F.var_samp(x).alias("_vx"),
        F.corr(x, y).alias("_r"),
    )
    ok = (F.col("n") >= 2) & (F.col("_vx") > 0)
    slope = F.when(ok, F.col("_cxy") / F.col("_vx"))
    intercept = F.when(
        ok, F.col("_my") - F.col("_cxy") / F.col("_vx") * F.col("_mx")
    )
    r2 = F.when(ok, F.col("_r") * F.col("_r"))
    return agg.select(
        *key_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
