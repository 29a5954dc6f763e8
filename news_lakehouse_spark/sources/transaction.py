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
    data/c000000000002-<nonce>/__p_date=2020-01-01/part-*.parquet

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
partition is `_load_manifest`/`_publish`. Reads hand Spark ONE explicit
file list as a single parquet relation (partition values are stored in
the files as data columns, `__p_<col>=v` dirs exist only for manifest
pruning), so plan size is independent of history depth and predicate
pruning applies uniformly. Merges read old files and write ONLY new
directories — no
read-rewrite cycle, hence no localCheckpoint barrier (unlike the
in-place emulation) and old versions stay readable during the write.
The create-exclusive publish uses os.link, atomic on POSIX/NFS/HDFS-
mounted paths; on S3-like stores swap `_publish` for a conditional PUT.
"""

from __future__ import annotations

import json
import os
import uuid
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

# File-level column-stat collection (Iceberg manifest column bounds):
# cap how many columns get stats and how long a stored string bound may
# be, so the manifest stays metadata-sized at 800k files.
_STATS_MAX_COLUMNS = 32
_STATS_MAX_STR = 64

# Spark simpleString type tags eligible for min/max stats. Nested,
# binary, and interval types never get bounds (same as Iceberg's
# default metrics config skipping them for pruning purposes).
_STATS_ORDERED_PREFIXES = ("timestamp", "decimal")
_STATS_ORDERED_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "boolean", "date",
}


def _stats_type_tag(data_type) -> str | None:
    s = data_type.simpleString()
    if s in _STATS_ORDERED_TYPES or s.startswith(_STATS_ORDERED_PREFIXES):
        return s
    return None


def _truncate_upper(s: str, limit: int = _STATS_MAX_STR) -> str | None:
    """Shorten a string UPPER bound while keeping it an upper bound:
    take the prefix and increment its last code point (Iceberg's
    truncate-and-increment). Returns None when no valid bound exists."""
    if len(s) <= limit:
        return s
    prefix = s[:limit]
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def _json_bound(value, tag: str, upper: bool):
    """Serialize one min/max bound JSON-natively, WIDENED where the
    representation could tighten it (floats from Decimal; truncated
    strings). A widened bound can only keep extra files — never drop a
    matching one."""
    import datetime as dt
    import math

    if value is None:
        return None
    if tag == "date":
        return value.isoformat() if isinstance(value, dt.date) else str(value)
    if tag.startswith("timestamp"):
        if isinstance(value, dt.datetime):
            return value.strftime("%Y-%m-%d %H:%M:%S.%f")
        return str(value)
    if tag == "string":
        s = str(value)
        if upper:
            return _truncate_upper(s)
        return s[:_STATS_MAX_STR]  # a prefix is always a valid lower bound
    if tag == "boolean":
        return bool(value)
    if tag in ("tinyint", "smallint", "int", "bigint"):
        return int(value)
    # float/double/decimal → float, nudged outward one ulp
    f = float(value)
    if math.isnan(f):
        return None
    return math.nextafter(f, math.inf if upper else -math.inf)


def _norm_pred_value(value, tag: str):
    """Render a predicate value into the same JSON-native ordering
    domain as the stored bounds."""
    import datetime as dt

    if value is None:
        return None
    if tag == "date":
        if isinstance(value, dt.datetime):
            value = value.date()
        if isinstance(value, dt.date):
            return value.isoformat()
        return dt.date.fromisoformat(str(value)).isoformat()
    if tag.startswith("timestamp"):
        if isinstance(value, dt.date) and not isinstance(value, dt.datetime):
            value = dt.datetime(value.year, value.month, value.day)
        if not isinstance(value, dt.datetime):
            value = dt.datetime.fromisoformat(str(value))
        return value.strftime("%Y-%m-%d %H:%M:%S.%f")
    if tag == "string":
        return str(value)
    if tag == "boolean":
        return bool(value)
    if tag in ("tinyint", "smallint", "int", "bigint"):
        return int(value)
    return float(value)


def _file_may_match(col_stats, op: str, value) -> bool:
    """Conservative file-level test: False ONLY when the file's bounds
    PROVE no row can satisfy `col op value`. Missing stats keep the
    file."""
    if col_stats is None:
        return True
    mn, mx, null_count, row_count = col_stats
    if mn is None or mx is None:
        # No bounds recorded. An all-null file can't satisfy any
        # comparison (SQL comparisons with NULL are never true).
        return not (
            null_count is not None
            and row_count is not None
            and null_count == row_count
        )
    try:
        if op in ("=", "=="):
            return mn <= value <= mx
        if op == "<":
            return mn < value
        if op == "<=":
            return mn <= value
        if op == ">":
            return mx > value
        if op == ">=":
            return mx >= value
        if op == "in":
            return any(mn <= v <= mx for v in value)
        if op == "between":
            lo, hi = value
            return not (mx < lo or mn > hi)
    except TypeError:
        return True  # incomparable → keep
    raise ValueError(f"unsupported stats predicate op {op!r}")


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
    """`__p_date=2020-01-01/__p_region=ASIA` fragment for one partition
    tuple, using Spark's escaping and NULL convention. Directory names
    carry the ``__p_`` prefix because commits write partition values
    BOTH as data columns and as directories (see ``_write_commit``) —
    the prefix keeps Spark's writer from stripping the real column."""
    esc = _escape_fn(spark)
    return "/".join(
        f"__p_{c}={'__HIVE_DEFAULT_PARTITION__' if part[c] is None else esc(str(part[c]))}"
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
        manifest-relative paths of the files written.

        Partition values are stored BOTH ways: as ordinary data columns
        inside every file AND as ``__p_<col>=value`` directories (a
        shadow copy of each partition column feeds the writer, so the
        real column stays in the file). Directories give the manifest
        its partition-pruning fragments; in-file values let ``read()``
        scan ANY set of files from ANY mix of commits as ONE parquet
        relation with no per-commit ``basePath`` groups — without this,
        a snapshot read unions one reader per commit dir and plan cost
        grows linearly with table history (the depth probe caught
        per-commit merge time doubling between 10 and 50 versions).
        Iceberg makes the same trade: identity partition values are
        readable from metadata, not parsed from paths.
        """
        commit = f"c{version:012d}-{uuid.uuid4().hex[:8]}"
        abs_dir = os.path.join(self.path, _DATA_DIR, commit)
        out = df
        writer_partitions = None
        if partition_by:
            writer_partitions = [f"__p_{c}" for c in partition_by]
            for c in partition_by:
                out = out.withColumn(f"__p_{c}", F.col(c))
        writer = out.write.mode("error")
        if writer_partitions:
            writer = writer.partitionBy(*writer_partitions)
        writer.parquet(abs_dir)
        files = []
        for root, _dirs, names in os.walk(abs_dir):
            for name in names:
                if name.endswith(".parquet") and not name.startswith((".", "_")):
                    rel = os.path.relpath(os.path.join(root, name), self.path)
                    files.append(rel)
        return sorted(files)

    def _collect_stats(
        self,
        files: list[str],
        schema: StructType,
        prior: dict | None = None,
    ) -> tuple[dict, dict]:
        """Per-file column min/max/null-count from parquet FOOTERS (no
        data scan) for up to ``_STATS_MAX_COLUMNS`` primitive columns —
        the Iceberg manifest column-bounds analog that lets reads prune
        data files on non-partition predicates.

        Files present in ``prior`` (a parent manifest's stats) carry
        their stats by reference — a merge re-reads footers only for
        the files it wrote. Driver-side footer reads are metadata-sized
        (a few KB each); at 100 TB the same loop runs where Iceberg
        runs it: collected from write tasks at commit time — this
        method is that seam.
        """
        import pyarrow.parquet as pq

        stat_types: dict[str, str] = {}
        for f in schema.fields:
            tag = _stats_type_tag(f.dataType)
            if tag is not None:
                stat_types[f.name] = tag
            if len(stat_types) >= _STATS_MAX_COLUMNS:
                break
        prior = prior or {}
        stats: dict[str, dict] = {}
        for rel in files:
            if rel in prior:
                stats[rel] = prior[rel]
                continue
            md = pq.ParquetFile(os.path.join(self.path, rel)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            per_col: dict[str, list] = {}
            for col, tag in stat_types.items():
                ci = names.get(col)
                if ci is None:  # partition column (in path, not file)
                    continue
                mn = mx = None
                nulls, rows, ok = 0, 0, True
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    rows += rg.num_rows
                    st = rg.column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        if st is not None and st.null_count is not None:
                            nulls += st.null_count
                        continue
                    nulls += st.null_count or 0
                    try:
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                    except TypeError:
                        ok = False
                if ok and mn is not None:
                    lo = _json_bound(mn, tag, upper=False)
                    hi = _json_bound(mx, tag, upper=True)
                    if lo is not None and hi is not None:
                        per_col[col] = [lo, hi, nulls, rows]
                        continue
                if rows and nulls == rows:
                    per_col[col] = [None, None, nulls, rows]  # all-null file
            stats[rel] = per_col
        return stats, stat_types

    # --- reads -----------------------------------------------------------

    def files_for(
        self,
        version: int | None = None,
        partition_filter: dict | None = None,
        predicate: list[tuple] | None = None,
    ) -> list[str]:
        """Scan-plan a snapshot: the manifest file list after partition
        pruning AND column-bounds pruning — what `read()` hands Spark.

        ``predicate`` is a list of ``(col, op, value)`` conditions,
        ANDed; ops: ``= < <= > >= in between`` (``in`` takes a list,
        ``between`` an inclusive (lo, hi) pair). Pruning is
        conservative: a file drops only when its stored min/max PROVE
        no row matches; files or columns without stats are kept. The
        caller still applies the real row filter — bounds pruning is a
        scan-planning optimization, exactly Iceberg's.
        """
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        man = self._load_manifest(v)
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
                return f"__p_{c}={'__HIVE_DEFAULT_PARTITION__' if val is None else esc(str(val))}"

            want = [
                {frag(c, v) for v in (val if isinstance(val, (list, set, tuple)) else [val])}
                for c, val in partition_filter.items()
            ]
            files_list = [
                rel
                for rel in files_list
                if all(alts & set(rel.split("/")[2:-1]) for alts in want)
            ]
        if predicate:
            stats = man.get("stats", {})
            stat_types = man.get("stat_types", {})
            conds = []
            for col, op, value in predicate:
                tag = stat_types.get(col)
                if tag is None:
                    continue  # no bounds for this column → can't prune on it
                if op == "in":
                    value = [_norm_pred_value(x, tag) for x in value]
                elif op == "between":
                    value = tuple(_norm_pred_value(x, tag) for x in value)
                else:
                    value = _norm_pred_value(value, tag)
                conds.append((col, op, value))
            files_list = [
                rel
                for rel in files_list
                if all(
                    _file_may_match(stats.get(rel, {}).get(col), op, value)
                    for col, op, value in conds
                )
            ]
        return files_list

    def read(
        self,
        version: int | None = None,
        partition_filter: dict | None = None,
        predicate: list[tuple] | None = None,
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

        ``predicate`` ([(col, op, value), ...], ANDed) additionally
        prunes on the manifest's per-file column min/max bounds — the
        Iceberg scan-planning analog for NON-partition columns (see
        ``files_for``). Pruning is conservative; callers still apply
        the row-level filter.
        """
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        man = self._load_manifest(v)
        schema = StructType.fromJson(man["schema"])
        files_list = self.files_for(v, partition_filter, predicate)
        if not files_list:
            return self.spark.createDataFrame([], schema)
        return self._read_files(files_list, schema)

    def _read_files(self, rels: list[str], schema: StructType) -> DataFrame:
        """Read an explicit manifest file list as ONE parquet relation,
        pinned to the given schema's column order and types (columns
        absent from older commits null-fill via mergeSchema + the final
        cast-select). Partition values live inside the files (see
        ``_write_commit``), so no basePath/path parsing is needed and
        the plan is a single scan node no matter how many commits the
        snapshot spans — table history depth never bloats read plans."""
        df = self.spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.path, rel) for rel in rels]
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
            self._read_files(only_a, schema)
            if only_a
            else empty
        )
        added = (
            self._read_files(only_b, schema)
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
        prior_stats: dict | None = None,
    ) -> int:
        version = (parent or 0) + 1
        stats, stat_types = self._collect_stats(files, df.schema, prior_stats)
        self._publish(
            {
                "version": version,
                "parent": parent,
                "operation": operation,
                "partition_by": partition_by or [],
                "schema": df.schema.jsonValue(),
                "files": files,
                "num_files": len(files),
                "stats": stats,
                "stat_types": stat_types,
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
        staged = self._read_files(files, df.schema)
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
            filter_to_partitions,
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
                affected = filter_to_partitions(target, parts, spec)
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
                try:
                    return self._commit(
                        merged, files, parent, spec, "merge",
                        prior_stats=man.get("stats"),
                    )
                except ConcurrentCommitError as e:
                    last_err = e  # loser of the race: re-derive from winner
                    continue
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

    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        cluster_by: list[str] | None = None,
    ) -> int:
        """Crash-safe small-file compaction: rewrite the current
        snapshot into a fresh commit sized from the ACTUAL live bytes
        and publish it as a new version — readers never see a partial
        rewrite (the in-place compact_parquet_table cannot promise
        that), and the pre-compaction version stays time-travelable
        until vacuumed. Partitioned tables cluster by the partition
        columns (one file per partition); unpartitioned tables split at
        ``target_file_bytes``. Returns the committed version.

        ``cluster_by`` additionally RANGE-clusters the rewrite on the
        given columns (repartitionByRange + sortWithinPartitions — the
        Delta ``OPTIMIZE ZORDER``/Iceberg sort-order analog): after a
        clustered compact, each file's min/max bounds for those columns
        are near-disjoint, so the manifest's column-bounds pruning
        (``files_for(predicate=...)``) drops most files for selective
        predicates instead of none. The write itself is no more
        expensive than a plain compact (same one shuffle, now ranged);
        the payoff repeats on every subsequent read. For multi-column
        locality use one interleaved key (functions.zorder) as the
        cluster column.
        """
        import math

        parent = self.latest_version()
        if parent is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        man = self._load_manifest(parent)
        spec = man["partition_by"] or None
        df = self.read(parent)
        total = sum(
            os.path.getsize(os.path.join(self.path, rel))
            for rel in man["files"]
        )
        n_files = max(1, math.ceil(total / target_file_bytes))
        if cluster_by:
            cols = [F.col(c) for c in cluster_by]
            out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(
                *cols
            )
        elif spec:
            out = df.repartition(*[F.col(c) for c in spec])
        else:
            out = df.repartition(n_files)
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
