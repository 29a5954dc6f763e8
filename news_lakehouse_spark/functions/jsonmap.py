"""Stringified-JSON map columns (reference N4-N6).

The crawler emits `interaction_details` as a JSON object while the
declared type is STRING, so the column arrives as a stringified JSON
map; the silver job re-parses and explodes it
(gcs_bronze_to_silver.py:371-385):

  N4 from_json(str, MAP<STRING,STRING>)
  N5 transform_values(map, (k,v) -> coalesce(try_cast(v AS INT), 0))
  N6 explode_outer(map_entries(map)) → one (key, value) row per entry

The driver's `events.props` column has the same shape. All higher-order
built-ins — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAP_SS = T.MapType(T.StringType(), T.StringType())


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_json_map(col: Column | str) -> Column:
    """N4: stringified JSON object → MAP<STRING,STRING> (NULL on bad JSON)."""
    return F.from_json(_c(col), _MAP_SS)


def int_map_values(col: Column | str) -> Column:
    """N5: value-cast the map to INT, non-numeric → 0."""
    return F.transform_values(
        _c(col), lambda _k, v: F.coalesce(v.try_cast("int"), F.lit(0))
    )


def explode_map_entries(
    df: DataFrame,
    map_col: Column | str,
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """N6: map → one row per (key, value) entry, NULL-map rows kept."""
    entry = F.explode_outer(F.map_entries(_c(map_col)))
    return df.select("*", entry.alias("_entry")).select(
        *df.columns,
        F.col("_entry.key").alias(key_name),
        F.col("_entry.value").alias(value_name),
    )
