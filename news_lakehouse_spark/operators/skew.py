"""Skew mitigation: salted aggregation and salted join.

At 100 TB a groupBy key with 3 distinct values (or one viral join key)
sends entire key populations to single reducers. AQE skew-join
splitting handles sort-merge joins; these operators cover the cases it
doesn't:

- ``salted_aggregate`` — two-stage decomposable aggregation: stage 1
  groups on (keys, salt) so every reducer sees ≤ 1/salt of a hot key,
  stage 2 combines the per-salt partials. count/sum/min/max decompose
  exactly (count re-sums, avg = sum/count at the end).
- ``salted_join`` — left-side rows get a salt in [0, salt); the right
  side is replicated salt× with each copy tagged. The hot key's rows
  then spread over `salt` reducers. Results are identical to the
  plain join (salt is a partitioning artifact, joined on key+salt).

Salts derive from per-row plan-stable values, not rand(): identical
results on task retry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def _row_salt(df: DataFrame, salt: int) -> Column:
    # plan-stable pseudo-random per-row value; any distribution works,
    # the join/agg result does not depend on it.
    return F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(salt),
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: list[str] | None = None,
    count_alias: str = "n_rows",
    salt: int = 16,
) -> DataFrame:
    """groupBy(keys) with count + sums, skew-safe via two-stage salt.

    Equivalent to ``df.groupBy(keys).agg(count(*), sum(c)...)`` — the
    salt only bounds per-reducer key volume. (Spark's own partial
    aggregation already combines map-side; explicit salting matters
    when the per-key *distinct-value* state of later stages, or a
    non-combinable agg, concentrates on few reducers.)
    """
    sums = sums or []
    stage1 = df.withColumn(_SALT, _row_salt(df, salt)).groupBy(*keys, _SALT).agg(
        F.count("*").alias("__cnt"),
        *[F.sum(c).alias(f"__sum_{c}") for c in sums],
    )
    return stage1.groupBy(*keys).agg(
        F.sum("__cnt").alias(count_alias),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sums],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted and the
    right side replicated ``salt``×.

    Use when the right side is too big to broadcast and a handful of
    join keys dominate the left. Right-side blow-up is salt×, so keep
    the right side the smaller input.

    ``how`` is restricted to flavors where replicating the right side
    preserves plain-join semantics: with right/full outer joins each
    unmatched right row would surface once per salt copy (salt×
    duplicates), so those are rejected rather than silently wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only; "
            f"'{how}' would duplicate unmatched right rows salt x"
        )
    l_salted = left.withColumn(_SALT, _row_salt(left, salt))
    r_replicated = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return l_salted.join(r_replicated, [*on, _SALT], how).drop(_SALT)


def key_skew_stats(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Key-distribution skew profile: the diagnostic that decides when
    ``salted_join``/``salted_aggregate`` (or AQE skew splitting) is
    worth its replication cost.

    Emits the ``top_n`` heaviest keys with count, corpus share, and
    skew-vs-mean ratio (cnt / mean-rows-per-key over ALL keys; ~1 ⇒
    uniform, ≫1 ⇒ that key floods one reducer — the ratio is also the
    natural salt factor for it).

    Plan: one map-side-combined groupBy(keys) count (the profile's one
    real shuffle — same cost class as the aggregation being diagnosed),
    a 1-row global summary joined back by broadcast, and TakeOrdered
    for the top-N (never a global sort). Ties break on key ascending
    so the profile is deterministic.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    summary = counts.agg(
        F.count("*").alias("__n_keys"), F.sum("cnt").alias("__n_rows")
    )
    w = (
        counts.crossJoin(F.broadcast(summary))
        .select(
            *key_cols,
            F.col("cnt"),
            F.round(F.col("cnt") / F.col("__n_rows"), 6).alias("share"),
            F.round(F.col("cnt") * F.col("__n_keys") / F.col("__n_rows"), 4).alias(
                "skew_vs_mean"
            ),
        )
        .orderBy(F.col("cnt").desc(), *[F.col(k).asc() for k in key_cols])
        .limit(top_n)
    )
    ranked = w.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), *[F.col(k).asc() for k in key_cols])
        ),
    )
    return ranked.select(*key_cols, "rank", "cnt", "share", "skew_vs_mean")
