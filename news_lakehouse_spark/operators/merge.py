"""MERGE / upsert semantics without a lakehouse jar.

Reference parity (SURVEY §2.1 S8-S10): Iceberg `MERGE INTO` in three
flavors — update+insert (silver entity/fact tables,
gcs_bronze_to_silver.py:457-475), insert-only (link tables, :476-490),
and column-explicit gold merges (gcs_silver_to_gold.py:373-824).

Plain Spark-on-parquet has no MERGE, so we express the same semantics
relationally:

  upsert(target, source, keys)  =  source ∪ (target ⟕̸ source)
                                 =  source.unionByName(target.join(source, keys, 'left_anti'))

i.e. every source row wins (the UPDATE SET * branch), target rows
without a source match survive, and new source keys are inserts. The
insert-only flavor is the dual: target ∪ (source anti target).

The MERGE_CARDINALITY_VIOLATION guard the reference implements with
dropna+dropDuplicates before every merge (b2s:426-446) is enforced here
by deduping the source on the merge keys first.

Scale notes: the anti join shuffles both sides on the merge keys — at
100 TB this is the dominant cost, so `upsert_parquet_table` restricts
the rewrite to affected partitions (dynamic partition overwrite) when a
partition column is declared; with small deltas Catalyst broadcasts the
source side of the anti join automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _guard_source(source: DataFrame, keys: list[str], order_by: list[Column] | None) -> DataFrame:
    """Key-completeness + cardinality guard (reference b2s:426-446)."""
    guarded = source.dropna(subset=keys)
    if order_by:
        from news_lakehouse_spark.operators.windows import dedupe_latest

        return dedupe_latest(guarded, keys, order_by)
    return guarded.dropDuplicates(keys)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_by: list[Column] | None = None,
) -> DataFrame:
    """MERGE ... WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT * (S8)."""
    src = _guard_source(source.select(*target.columns), keys, order_by)
    untouched = target.join(src.select(*keys), on=keys, how="left_anti")
    return src.unionByName(untouched)


def merge_insert_only(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
) -> DataFrame:
    """MERGE ... WHEN NOT MATCHED INSERT * — link-table flavor (S9)."""
    src = _guard_source(source.select(*target.columns), keys, None)
    new_rows = src.join(target.select(*keys), on=keys, how="left_anti")
    return target.unionByName(new_rows)


def upsert_parquet_table(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
    insert_only: bool = False,
    order_by: list[Column] | None = None,
) -> None:
    """Materialized upsert into a parquet table directory.

    First write creates the table. Subsequent writes read the current
    snapshot, apply merge semantics, and rewrite — only the partitions
    containing affected keys when ``partition_by`` is set (the
    dynamic-partition-overwrite analog of an Iceberg copy-on-write
    MERGE commit).
    """
    try:
        target = spark.read.parquet(path)
        exists = True
    except Exception:
        exists = False

    if not exists:
        merged = _guard_source(source, keys, order_by)
        writer = merged.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        return

    if partition_by:
        # Restrict the rewrite to partitions the source touches.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        parts = [r.asDict() for r in source.select(*partition_by).distinct().collect()]
        cond = None
        for p in parts:
            c = None
            for k, v in p.items():
                e = F.col(k).eqNullSafe(F.lit(v))
                c = e if c is None else (c & e)
            cond = c if cond is None else (cond | c)
        affected_target = target.filter(cond) if cond is not None else target.limit(0)
        fn = merge_insert_only if insert_only else merge_upsert
        merged = (
            fn(affected_target, source, keys)
            if insert_only
            else fn(affected_target, source, keys, order_by)
        )
        # localCheckpoint breaks the read-from/write-to-same-path cycle.
        merged.localCheckpoint(eager=True).write.mode("overwrite").partitionBy(
            *partition_by
        ).parquet(path)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    else:
        fn = merge_insert_only if insert_only else merge_upsert
        merged = (
            fn(target, source, keys)
            if insert_only
            else fn(target, source, keys, order_by)
        )
        # Parquet can't overwrite a path being read → stage via local checkpoint.
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
