"""Catalog / table-management layer.

Reference parity:
- S6 DDL & namespace management (CREATE NAMESPACE / CREATE TABLE IF
  NOT EXISTS ... USING iceberg, b2s:73-158, s2g:150-322) → managed
  parquet table directories under a warehouse root + registered views.
- S7 existence probe (DESCRIBE + limit(1) in try/except,
  s2g:100-109) → spark.catalog.tableExists / filesystem probe.
- S5 FS directory listing for topic autodetect (b2s:216-237, via
  JVM Hadoop FileSystem) → plain listing of child dirs.
- S12 temp-view staging for MERGE sources (b2s:453-454) →
  create/drop temp views.

The reference's Iceberg catalog is a jar we don't ship offline; a
warehouse of partitioned parquet directories + the merge layer in
operators.merge reproduces the same table semantics (SURVEY §7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetWarehouse:
    """A namespace of managed parquet tables rooted at a directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def create_namespace(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def list_tables(self) -> list[str]:
        """S5 analog: child-directory listing of the namespace.

        Retried like the reference's GCS topic autodetect
        (gcs_bronze_to_silver.py:216, 3 attempts fixed-wait) — listing
        an object store is the flakiest call in the pipeline; local FS
        just never trips it.
        """
        from news_lakehouse_spark.metrics import with_retry

        def _list() -> list[str]:
            if not os.path.isdir(self.root):
                return []
            return sorted(
                d
                for d in os.listdir(self.root)
                if os.path.isdir(os.path.join(self.root, d))
            )

        return with_retry(_list, attempts=3, wait_s=2.0, retry_on=(OSError,))

    def table_exists(self, table: str) -> bool:
        """S7: cheap existence probe without reading data."""
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        try:
            self.spark.read.parquet(p).schema
            return True
        except Exception:
            return False

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def write(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(table))

    def upsert(
        self,
        table: str,
        source: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
        insert_only: bool = False,
    ) -> None:
        from news_lakehouse_spark.operators.merge import upsert_parquet_table

        upsert_parquet_table(
            self.spark,
            source,
            self.path(table),
            keys,
            partition_by=partition_by,
            insert_only=insert_only,
        )

    def versioned(self, table: str):
        """The ACID flavor of a managed table: manifest-committed,
        time-travelable (sources/transaction.py) — the parquet analog of
        the reference's Iceberg snapshots."""
        from news_lakehouse_spark.sources.transaction import VersionedParquetTable

        return VersionedParquetTable(self.spark, self.path(table))

    def register_views(self, prefix: str = "") -> None:
        """S12 analog: expose every table as a temp view for spark.sql."""
        for t in self.list_tables():
            self.read(t).createOrReplaceTempView(f"{prefix}{t}")

    def register_versioned_view(
        self, table: str, version=None, name: str | None = None
    ) -> str:
        """SQL access to a versioned-table snapshot — time travel from
        ``spark.sql`` (the Iceberg ``VERSION AS OF`` analog on the
        manifest layer). ``version`` accepts a number or a tag;
        omitted = latest. The view is named ``table`` for the live
        snapshot or ``table_v<N>`` for a pinned one (override with
        ``name``). Returns the view name. The view captures the
        resolved snapshot's FILE LIST, so later commits don't leak in
        — re-register to follow the head."""
        t = self.versioned(table)
        resolved = t._resolve_version(version)
        view = name or (
            table if version is None else f"{table}_v{resolved}"
        )
        t.read(version=version).createOrReplaceTempView(view)
        return view
