"""Deterministic hash-based sampling and train/test splits.

A training-data pipeline needs REPRODUCIBLE sampling: `df.sample()` is
seed-stable only for a fixed partitioning, so any upstream change
(file count, AQE coalescing) silently reshuffles the sample. Hashing
the row's stable key instead makes membership a pure function of the
data: the same row lands in the same split on any cluster, any
partitioning, any engine — which also makes it cross-engine
verifiable (sha2 has a DuckDB twin; see queries.x_train_test_split).

hash_fraction(key) = first 15 hex chars of sha2-256 parsed as int,
scaled to [0, 1). 60 uniform bits — granular enough for ppm-level
sampling rates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits; keeps the parse inside a signed 64-bit long.
_HASH_SPACE = float(1 << 60)


def hash_fraction(*key_cols: Column | str, salt: str = "") -> Column:
    """Uniform [0, 1) value derived from sha2-256 of the key columns.

    ``salt`` decorrelates independent sampling decisions over the same
    key (e.g. a 1% sample AND a train/test split must not interact).
    """
    from news_lakehouse_spark.functions.keys import sha2_prefix_long

    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    # NULL key columns get an explicit sentinel: concat_ws silently
    # SKIPS nulls, which would collapse ('x', NULL) and (NULL, 'x')
    # onto one hash and move whole families of rows together. Values
    # containing the separator can still collide — use separator-free
    # keys (ids, hashes) or pre-hash each column.
    enc = [F.coalesce(c.cast("string"), F.lit("\u2400")) for c in cols]
    src = F.concat_ws("||", F.lit(salt), *enc)
    return sha2_prefix_long(src, 15) / F.lit(_HASH_SPACE)


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~fraction of rows, membership a pure function of the key.

    No shuffle, no seed, no partitioning sensitivity: the filter is a
    per-row hash compare the scan evaluates in place.
    """
    return df.filter(hash_fraction(*key_cols, salt=salt) < fraction)


def train_test_split(
    df: DataFrame,
    key_cols: list[str],
    test_fraction: float = 0.1,
    val_fraction: float = 0.0,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to train/val/test by key hash.

    Split boundaries are half-open intervals of the hash line, so the
    assignment is stable under corpus growth: adding documents never
    moves an existing document between splits (the property random
    splits lack, and the one that prevents train/test contamination
    across dataset versions).
    """
    h = hash_fraction(*key_cols, salt=salt)
    expr = (
        F.when(h < test_fraction, F.lit("test"))
        .when(h < test_fraction + val_fraction, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    key_cols: list[str] | None = None,
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-group deterministic sampling (corpus rebalancing).

    fractions maps group value -> keep rate; groups not listed keep
    ``default_fraction``. Same hash-line membership as
    deterministic_sample, so the sample is stable under partitioning
    and growth — the property a language-balancing pass needs when the
    corpus is rebuilt weekly. The fraction lookup is a literal map
    expression (broadcast-free, evaluated in the scan).

    ``key_cols`` must identify rows (e.g. the event/document id):
    hashing the group column alone would give every row in a group the
    same hash, keeping 100% or 0% of the group instead of a fraction.
    """
    if not key_cols:
        raise ValueError(
            "key_cols must name row-identifying columns; hashing only "
            f"the group column {group_col!r} keeps each group entirely "
            "or not at all, never a fraction"
        )
    keys = key_cols
    pairs: list[Column] = []
    for k, v in sorted(fractions.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(float(v)))
    frac = F.coalesce(
        # try_element_at: a group value absent from the map must mean
        # "use the default", not an ANSI MAP_KEY_DOES_NOT_EXIST error
        F.try_element_at(F.create_map(*pairs), F.col(group_col).cast("string")),
        F.lit(float(default_fraction)),
    )
    return df.filter(hash_fraction(*keys, salt=salt) < frac)


def quantile_bucket(
    df: DataFrame,
    col: str,
    n_buckets: int = 10,
    out_col: str = "bucket",
) -> DataFrame:
    """Assign 1..n quantile-threshold buckets for ``col``.

    Scale-correct alternative to a global ntile(): ntile needs a
    single-partition window over the whole table; this computes the
    (n-1) interior quantile THRESHOLDS in one aggregate (exact
    percentile here; swap percentile_approx at 100 TB — the bucket
    expression is unchanged) and assigns buckets with a broadcast
    compare, so the table itself never shuffles. Bucket = 1 + number
    of thresholds strictly below the value (ties land in the lower
    bucket — threshold semantics, not equal-count semantics).
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    thresholds = df.agg(
        F.percentile(col, F.array(*[F.lit(q) for q in qs])).alias("__t")
    )
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + F.when(
            F.col(col) > F.element_at("__t", i + 1), 1
        ).otherwise(0)
    return (
        df.join(F.broadcast(thresholds))
        .withColumn(out_col, bucket.cast("int"))
        .drop("__t")
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_cols: list[str] | None = None,
    salt: str = "mixture",
    kept_col: str = "kept",
) -> DataFrame:
    """Rebalance a corpus to a target mixture (domain reweighting).

    ``weights`` maps stratum value → unnormalized target weight; the
    output marks, per row, whether it survives downsampling to the
    LARGEST corpus achievable at exactly those proportions without
    upsampling: T = min_s(n_s / p_s) rows total, keep_s = ⌊p_s·T⌋ per
    stratum (p_s = normalized weight). Strata not in ``weights`` are
    dropped. This is the static mixture-balancing step of a
    pretraining data pipeline (cf. The Pile's per-source epochs,
    DoReMi's reweighted sampling — arXiv:2101.00027, 2305.10429).

    Selection is rank-based on the deterministic hash line
    (row_number over (hash, key) per stratum ≤ keep_s): exact counts,
    reproducible on any partitioning, any engine. The per-stratum
    window is one shuffle on ``strata_col``; at 100 TB with few huge
    strata, swap the ranking for a hash-threshold filter at rate
    keep_s/n_s (shuffle-free scan filter, binomially-approximate
    counts) — the hash line and keep_s math are unchanged.
    """
    from pyspark.sql import Window

    if not key_cols:
        raise ValueError(
            "key_cols must name row-identifying columns: hashing only "
            f"the stratum column {strata_col!r} makes every in-stratum "
            "rank a tie, so the kept set depends on partition order"
        )
    keys = key_cols
    wpairs: list[Column] = []
    for k, v in sorted(weights.items()):
        wpairs.append(F.lit(k))
        wpairs.append(F.lit(float(v)))
    wsum = float(sum(weights.values()))
    # try_element_at: strata outside ``weights`` drop via the p-filter
    # below; under ANSI a plain element_at would error instead
    w_col = F.try_element_at(F.create_map(*wpairs), F.col(strata_col).cast("string"))

    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    counts = counts.withColumn("__p", w_col / F.lit(wsum)).filter(
        F.col("__p").isNotNull() & (F.col("__p") > 0)
    )
    # feasible total: the binding stratum runs out first. For that
    # stratum p·T is integral in exact arithmetic — the +1e-9 keeps
    # float round-off from flooring it down (mirrored in the oracle).
    wall = Window.partitionBy()
    keeps = counts.select(
        strata_col,
        F.floor(
            F.col("__p") * F.min(F.col("__n") / F.col("__p")).over(wall) + 1e-9
        )
        .cast("long")
        .alias("__keep"),
    )
    u = hash_fraction(*keys, salt=salt)
    rank = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(u, *keys)
    )
    return (
        df.join(F.broadcast(keeps), strata_col, "inner")
        .withColumn(kept_col, (rank <= F.col("__keep")).cast("int"))
        .drop("__keep")
    )
