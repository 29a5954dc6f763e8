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
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    src = F.concat_ws("||", F.lit(salt), *cols)
    return (
        F.conv(F.substring(F.sha2(src, 256), 1, 15), 16, 10).cast("long")
        / F.lit(_HASH_SPACE)
    )


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
