"""Manifest-based atomic commits + time travel for the parquet warehouse.

Closes the last non-environment-blocked fidelity gap vs the reference:
its MERGEs commit Iceberg snapshots (gcs_bronze_to_silver.py:50,457-475
registers IcebergSparkSessionExtensions and every MERGE INTO commits a
new table snapshot with read isolation + time travel). The plain-parquet
emulation in operators/merge.py rewrites partition directories in place,
so a crash mid-rewrite can leave a partially-updated table and history
is lost. This module adds the Iceberg/Delta commit protocol on plain
parquet:

  table/
    _manifests/000000000001.json   # one immutable manifest per version
    _manifests/000000000002.json
    data/c000000000001-<nonce>/... # one immutable data dir per commit
    data/c000000000002-<nonce>/date=2020-01-01/part-*.parquet

A manifest is the FULL list of live data files for that version (plus
the schema and partition spec). Commit protocol, in order:

  1. write new data files into a fresh commit directory (never touching
     live files);
  2. write the new manifest to a temp name;
  3. publish it with an atomic create-exclusive link to
     ``_manifests/{N}.json``.

The current version is simply the highest published manifest. A crash
at any point before step 3 leaves only orphan files that no manifest
references — every reader still sees the previous version clean (the
crash-injection test in tests/test_transaction.py). Two writers racing
to version N: exactly one link() wins, the loser gets
``ConcurrentCommitError`` and re-derives its merge from the winner's
snapshot (optimistic concurrency, same as Iceberg's metadata CAS and
Delta's LogStore create-exclusive).

Time travel: ``read(version=N)`` reads any retained manifest;
``history()`` lists them; ``vacuum(keep_last)`` drops old manifests and
deletes data files no retained manifest references.

Scale notes (100 TB): manifests are driver-side JSON listing file paths
— at 128 MB/file a 100 TB table is ~800k entries, a few tens of MB of
JSON, same order as a Delta checkpoint; the seam to shard manifests per
partition is `_load_manifest`/`_publish`. Reads hand Spark explicit
file lists grouped by commit dir with `basePath` set, so partition
columns still parse from paths and partition/predicate pruning applies
per group. Merges read old files and write ONLY new directories — no
read-rewrite cycle, hence no localCheckpoint barrier (unlike the
in-place emulation) and old versions stay readable during the write.
The create-exclusive publish uses os.link, atomic on POSIX/NFS/HDFS-
mounted paths; on S3-like stores swap `_publish` for a conditional PUT.
"""

from __future__ import annotations

import json
import os
import uuid
from collections import defaultdict
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first; re-derive and retry."""


def _escape_fn(spark: SparkSession):
    """Spark's own partition-path escaping, so manifest partition
    fragments match the directory names Spark wrote."""
    jvm = spark._jvm
    try:
        return jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    except Exception:  # pragma: no cover - API drift fallback
        return lambda s: s


def partition_suffix(spark: SparkSession, partition_by: list[str], part: dict) -> str:
    """`date=2020-01-01/region=ASIA` fragment for one partition tuple,
    using Spark's escaping and NULL convention."""
    esc = _escape_fn(spark)
    return "/".join(
        f"{c}={'__HIVE_DEFAULT_PARTITION__' if part[c] is None else esc(str(part[c]))}"
        for c in partition_by
    )


def _file_partition_fragment(rel_path: str) -> str:
    """Partition fragment of a manifest file path:
    data/c...-nonce/<frag...>/part-x.parquet → '<frag...>' ('' if none)."""
    segs = rel_path.split("/")
    return "/".join(segs[2:-1])


class VersionedParquetTable:
    """A parquet table with atomic, versioned, time-travelable commits."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # --- manifest bookkeeping -------------------------------------------

    def _manifest_dir(self) -> str:
        return os.path.join(self.path, _MANIFEST_DIR)

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir(), f"{version:012d}.json")

    def versions(self) -> list[int]:
        d = self._manifest_dir()
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.endswith(".json") and not name.startswith("."):
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def exists(self) -> bool:
        return self.latest_version() is not None

    def _load_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """Manifest metadata per retained version, oldest first."""
        return [
            {k: m[k] for k in ("version", "parent", "operation", "num_files")}
            for m in (self._load_manifest(v) for v in self.versions())
        ]

    def _publish(self, manifest: dict) -> None:
        """Atomic create-exclusive publish of a manifest (step 3)."""
        d = self._manifest_dir()
        os.makedirs(d, exist_ok=True)
        final = self._manifest_path(manifest["version"])
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic; fails iff version already exists
        except FileExistsError as e:
            raise ConcurrentCommitError(
                f"version {manifest['version']} was committed concurrently"
            ) from e
        finally:
            os.unlink(tmp)

    # --- data files ------------------------------------------------------

    def _write_commit(
        self,
        df: DataFrame,
        version: int,
        partition_by: list[str] | None,
    ) -> list[str]:
        """Step 1: write df into a fresh immutable commit dir; return the
        manifest-relative paths of the files written."""
        commit = f"c{version:012d}-{uuid.uuid4().hex[:8]}"
        abs_dir = os.path.join(self.path, _DATA_DIR, commit)
        writer = df.write.mode("error")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(abs_dir)
        files = []
        for root, _dirs, names in os.walk(abs_dir):
            for name in names:
                if name.endswith(".parquet") and not name.startswith((".", "_")):
                    rel = os.path.relpath(os.path.join(root, name), self.path)
                    files.append(rel)
        return sorted(files)

    # --- reads -----------------------------------------------------------

    def read(
        self,
        version: int | None = None,
        partition_filter: dict | None = None,
    ) -> DataFrame:
        """Snapshot read; ``version`` time-travels to any retained one.

        ``partition_filter`` ({col: value_or_values, ...}) prunes at
        the MANIFEST level: files whose path fragment doesn't match
        never reach Spark's listing — the Iceberg-manifest analog that
        matters when a 100 TB table is 800k files and the query wants
        one date (directory-listing pruning still costs a full listing
        first). A list/set/tuple value keeps files matching ANY of the
        values (an IN filter). Filter values render through Spark's own
        path escaping, so they match exactly what the writer produced.
        """
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        man = self._load_manifest(v)
        schema = StructType.fromJson(man["schema"])
        files_list = man["files"]
        if partition_filter:
            spec = man["partition_by"]
            unknown = [c for c in partition_filter if c not in spec]
            if unknown:
                raise ValueError(
                    f"partition_filter columns {unknown} are not in the "
                    f"table's partition spec {spec}"
                )
            esc = _escape_fn(self.spark)

            def frag(c, val):
                return f"{c}={'__HIVE_DEFAULT_PARTITION__' if val is None else esc(str(val))}"

            want = [
                {frag(c, v) for v in (val if isinstance(val, (list, set, tuple)) else [val])}
                for c, val in partition_filter.items()
            ]
            files_list = [
                rel
                for rel in files_list
                if all(alts & set(rel.split("/")[2:-1]) for alts in want)
            ]
        if not files_list:
            return self.spark.createDataFrame([], schema)
        return self._read_files(files_list, bool(man["partition_by"]), schema)

    def _read_files(
        self, rels: list[str], partitioned: bool, schema: StructType
    ) -> DataFrame:
        """Read an explicit manifest file list, grouped by commit dir so
        `basePath` parses partition columns from paths, then pinned to
        the given schema's column order and types (path-inferred
        partition types would otherwise drift, e.g. a numeric string
        reading back int; columns absent from older commits null-fill)."""
        groups: dict[str, list[str]] = defaultdict(list)
        for rel in rels:
            commit_dir = "/".join(rel.split("/")[:2])
            groups[commit_dir].append(os.path.join(self.path, rel))
        parts = []
        for commit_dir, files in sorted(groups.items()):
            reader = self.spark.read.option("mergeSchema", "true")
            if partitioned:
                reader = reader.option(
                    "basePath", os.path.join(self.path, commit_dir)
                )
            parts.append(reader.parquet(*files))
        df = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )
        for f in schema.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Row-level change feed between two retained versions — the
        Iceberg incremental-read analog that lets a downstream pipeline
        process only the delta of a 100 TB table.

        Reads ONLY files that differ between the two manifests (files
        carried by reference contribute nothing), then removes the
        rewritten-but-unchanged rows with exceptAll, so the cost scales
        with the churn, not the table. Output: to_version's schema plus
        ``_change_type`` ('insert' | 'delete'); an update appears as a
        delete of the old image plus an insert of the new one.
        """
        to_v = self.latest_version() if to_version is None else to_version
        man_a = self._load_manifest(from_version)
        man_b = self._load_manifest(to_v)
        schema = StructType.fromJson(man_b["schema"])
        set_a, set_b = set(man_a["files"]), set(man_b["files"])
        only_a = sorted(set_a - set_b)
        only_b = sorted(set_b - set_a)
        empty = self.spark.createDataFrame([], schema)
        removed = (
            self._read_files(only_a, bool(man_a["partition_by"]), schema)
            if only_a
            else empty
        )
        added = (
            self._read_files(only_b, bool(man_b["partition_by"]), schema)
            if only_b
            else empty
        )
        return (
            added.exceptAll(removed)
            .withColumn("_change_type", F.lit("insert"))
            .unionByName(
                removed.exceptAll(added).withColumn("_change_type", F.lit("delete"))
            )
        )

    # --- commits ---------------------------------------------------------

    def _commit(
        self,
        df: DataFrame,
        files: list[str],
        parent: int | None,
        partition_by: list[str] | None,
        operation: str,
    ) -> int:
        version = (parent or 0) + 1
        self._publish(
            {
                "version": version,
                "parent": parent,
                "operation": operation,
                "partition_by": partition_by or [],
                "schema": df.schema.jsonValue(),
                "files": files,
                "num_files": len(files),
            }
        )
        return version

    def write(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        operation: str = "overwrite",
    ) -> int:
        """CREATE / INSERT OVERWRITE: a full new snapshot (old versions
        remain readable until vacuumed)."""
        parent = self.latest_version()
        if parent is not None and partition_by is None:
            partition_by = self._load_manifest(parent)["partition_by"] or None
        version = (parent or 0) + 1
        files = self._write_commit(df, version, partition_by)
        return self._commit(df, files, parent, partition_by, operation)

    def write_audit_publish(
        self,
        df: DataFrame,
        rules: list,
        partition_by: list[str] | None = None,
        operation: str = "wap-overwrite",
    ) -> int:
        """Write-Audit-Publish: stage the snapshot's data files, audit
        the STAGED files, publish the manifest only if every
        expectation holds (the Iceberg WAP pattern, here on the
        manifest layer directly).

        The audit reads back the files just written — what is checked
        is byte-for-byte what readers would see, catching write-path
        corruption a pre-write check can't (type coercion, partition
        value rendering). A failed audit raises
        ``operators.validate.enforce``'s ValueError and publishes
        NOTHING: no manifest references the staged commit dir, readers
        never see it, and ``vacuum()`` reclaims it as an orphan.
        ``rules`` is a list of ``operators.validate.Rule``.
        """
        from news_lakehouse_spark.operators.validate import enforce

        parent = self.latest_version()
        if parent is not None and partition_by is None:
            partition_by = self._load_manifest(parent)["partition_by"] or None
        version = (parent or 0) + 1
        files = self._write_commit(df, version, partition_by)
        staged = self._read_files(files, bool(partition_by), df.schema)
        enforce(staged, rules)
        return self._commit(df, files, parent, partition_by, operation)

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
        insert_only: bool = False,
        order_by: list[Column] | None = None,
        evolve_schema: bool = False,
        retries: int = 2,
    ) -> int:
        """Atomic MERGE commit (S8/S9 semantics from operators/merge.py).

        Partitioned tables rewrite only commits' files in AFFECTED
        partitions — untouched partitions' files carry over into the new
        manifest by reference, exactly Iceberg's copy-on-write MERGE. A
        partition emptied by keys moving out simply has no file in the
        new manifest (no directory deletion needed, unlike the in-place
        emulation). Returns the committed version.
        """
        from news_lakehouse_spark.operators.merge import (
            _guard_source,
            merge_insert_only,
            merge_upsert,
        )

        last_err: Exception | None = None
        for _attempt in range(retries + 1):
            parent = self.latest_version()
            if parent is None:
                merged = _guard_source(source, keys, order_by)
                version = 1
                files = self._write_commit(merged, version, partition_by)
                try:
                    return self._commit(
                        merged, files, None, partition_by, "create"
                    )
                except ConcurrentCommitError as e:
                    last_err = e
                    continue

            man = self._load_manifest(parent)
            committed_spec = man["partition_by"] or None
            if partition_by is not None and list(partition_by) != (
                committed_spec or []
            ):
                # A spec that differs from the manifest's would render
                # affected-partition fragments that never match the old
                # manifest's paths: every old file would carry over by
                # reference and updated keys would duplicate. Refuse —
                # repartitioning an existing table is a rewrite
                # (write()), not a merge.
                raise ValueError(
                    f"merge partition_by={list(partition_by)} conflicts with "
                    f"the committed partition spec {committed_spec or []}; "
                    "use write() to change a table's partitioning"
                )
            spec = committed_spec
            target = self.read(parent)

            if spec:
                src_keys = source.dropna(subset=keys).select(*keys).distinct()
                new_parts = source.select(*spec).distinct()
                old_parts = (
                    target.join(F.broadcast(src_keys), on=keys, how="left_semi")
                    .select(*spec)
                    .distinct()
                )
                parts = [
                    r.asDict()
                    for r in new_parts.unionByName(old_parts).distinct().collect()
                ]
                cond = None
                for p in parts:
                    c = None
                    for k, v in p.items():
                        e = F.col(k).eqNullSafe(F.lit(v))
                        c = e if c is None else (c & e)
                    cond = c if cond is None else (cond | c)
                affected = target.filter(cond) if cond is not None else target.limit(0)
                merged = (
                    merge_insert_only(affected, source, keys, evolve_schema=evolve_schema)
                    if insert_only
                    else merge_upsert(
                        affected, source, keys, order_by, evolve_schema=evolve_schema
                    )
                )
                version = parent + 1
                new_files = self._write_commit(merged, version, spec)
                affected_frags = {
                    partition_suffix(self.spark, spec, p) for p in parts
                }
                carried = [
                    f
                    for f in man["files"]
                    if _file_partition_fragment(f) not in affected_frags
                ]
                files = sorted(carried + new_files)
            else:
                merged = (
                    merge_insert_only(target, source, keys, evolve_schema=evolve_schema)
                    if insert_only
                    else merge_upsert(
                        target, source, keys, order_by, evolve_schema=evolve_schema
                    )
                )
                version = parent + 1
                files = self._write_commit(merged, version, None)
            try:
                return self._commit(merged, files, parent, spec, "merge")
            except ConcurrentCommitError as e:
                last_err = e  # loser of the race: re-derive from winner
        raise last_err  # type: ignore[misc]

    # --- maintenance -----------------------------------------------------

    def compact(self, target_file_bytes: int = 128 * 1024 * 1024) -> int:
        """Crash-safe small-file compaction: rewrite the current
        snapshot into a fresh commit sized from the ACTUAL live bytes
        and publish it as a new version — readers never see a partial
        rewrite (the in-place compact_parquet_table cannot promise
        that), and the pre-compaction version stays time-travelable
        until vacuumed. Partitioned tables cluster by the partition
        columns (one file per partition); unpartitioned tables split at
        ``target_file_bytes``. Returns the committed version.
        """
        import math

        parent = self.latest_version()
        if parent is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        man = self._load_manifest(parent)
        spec = man["partition_by"] or None
        df = self.read(parent)
        if spec:
            out = df.repartition(*[F.col(c) for c in spec])
        else:
            total = sum(
                os.path.getsize(os.path.join(self.path, rel))
                for rel in man["files"]
            )
            out = df.repartition(max(1, math.ceil(total / target_file_bytes)))
        version = parent + 1
        files = self._write_commit(out, version, spec)
        return self._commit(out, files, parent, spec, "compact")

    def vacuum(
        self, keep_last: int = 1, grace_seconds: float = 3600.0
    ) -> dict[str, int]:
        """Drop all but the newest ``keep_last`` manifests and delete data
        files no retained manifest references (orphans from crashed
        commits included). Returns counts.

        Unreferenced files YOUNGER than ``grace_seconds`` (mtime) are
        kept: a concurrent writer's freshly staged commit dir is
        unreferenced until its manifest publishes, and deleting it
        mid-commit would corrupt that commit — the Delta VACUUM
        retention-window rule. Pass ``grace_seconds=0`` only when no
        writer can be in flight (zero-retention vacuum)."""
        import time

        cutoff = time.time() - max(grace_seconds, 0.0)
        vs = self.versions()
        if not vs:
            return {"manifests_dropped": 0, "files_deleted": 0}
        keep = set(vs[-max(keep_last, 1):])
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._load_manifest(v)["files"])
        dropped = 0
        for v in vs:
            if v not in keep:
                os.unlink(self._manifest_path(v))
                dropped += 1
        deleted = 0
        data_root = os.path.join(self.path, _DATA_DIR)
        for root, _dirs, names in os.walk(data_root, topdown=False):
            for name in names:
                abs_f = os.path.join(root, name)
                rel = os.path.relpath(abs_f, self.path)
                if rel not in referenced:
                    if os.path.getmtime(abs_f) > cutoff:
                        continue  # possibly a writer's in-flight staging
                    os.unlink(abs_f)
                    if name.endswith(".parquet") and not name.startswith((".", "_")):
                        deleted += 1
            if not os.listdir(root):
                os.rmdir(root)
        return {"manifests_dropped": dropped, "files_deleted": deleted}
