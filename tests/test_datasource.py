"""`versioned_table` PySpark DataSource: the transaction layer under
Structured Streaming's OWN lifecycle (offsets in Spark's checkpoint
log, availableNow triggers) plus the batch/time-travel flavor.

The reference streams with `spark.readStream` over cloud JSON into an
Iceberg table (gcs_bronze_to_silver.py:50,160-233); Delta/Iceberg also
expose the table itself as a streaming source — sources/datasource.py
is that parity surface, and these tests pin the Delta-readStream
semantics: snapshot-then-tail, append commits stream, change commits
fail loudly unless skipChangeCommits, checkpoint resume is
exactly-once.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from news_lakehouse_spark.sources.datasource import (
    await_drain,
    register_versioned_table_source,
)
from news_lakehouse_spark.sources.transaction import VersionedParquetTable


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [Row(k=1, d="a", v=10), Row(k=2, d="b", v=20)]
        )
    )
    register_versioned_table_source(spark)
    return t


def _drain(spark, t, ckpt, out, skip=False):
    def start():
        r = spark.readStream.format("versioned_table").option("path", t.path)
        if skip:
            r = r.option("skipChangeCommits", "true")
        return (
            r.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # loaded-host python-worker connect-back retry (exactly-once via
    # the checkpoint; see sources/datasource.await_drain)
    await_drain(start, timeout=120)


def test_stream_snapshot_then_appends_exactly_once(spark, table, tmp_path):
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    table.append(spark.createDataFrame([Row(k=3, d="c", v=30)]))
    _drain(spark, table, ckpt, out)
    got = spark.read.parquet(out)
    assert _rows(got) == {(1, "a", 10), (2, "b", 20), (3, "c", 30)}

    # tail: only the new append arrives on the checkpoint resume
    table.append(spark.createDataFrame([Row(k=4, d="d", v=40)]))
    _drain(spark, table, ckpt, out)
    assert _rows(spark.read.parquet(out)) == {
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
    }
    # no new commits -> a further drain delivers nothing (exactly-once:
    # row multiset unchanged, not just the set)
    _drain(spark, table, ckpt, out)
    assert spark.read.parquet(out).count() == 4


def test_stream_change_commit_fails_unless_skipped(spark, table, tmp_path):
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _drain(spark, table, ckpt, out)
    table.merge(spark.createDataFrame([Row(k=1, d="a", v=99)]), ["k"])
    with pytest.raises(Exception, match="skipChangeCommits"):
        _drain(spark, table, ckpt, out)
    # Delta-parity option: the rewrite is skipped, the stream lives on
    _drain(spark, table, ckpt, out, skip=True)
    table.append(spark.createDataFrame([Row(k=5, d="e", v=50)]))
    _drain(spark, table, ckpt, out, skip=True)
    assert _rows(spark.read.parquet(out)) == {
        (1, "a", 10), (2, "b", 20), (5, "e", 50),
    }


def test_stream_projects_old_epoch_files_by_fid(spark, tmp_path):
    """A fresh stream started after a rename+widen+add: snapshot files
    written under the OLD epoch project to the pinned (endpoint)
    schema by field id — renamed values land in the renamed column,
    added columns null-fill, widened ints cast (pyarrow-side)."""
    table = VersionedParquetTable(spark, str(tmp_path / "t"))
    table.append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, d string, v int"
        )
    )
    register_versioned_table_source(spark)
    table.rename_column("v", "amount")
    table.widen_column("amount", "long")
    table.add_column("flag", "boolean")
    table.append(
        spark.createDataFrame([Row(k=3, d="c", amount=30, flag=True)])
    )
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _drain(spark, table, ckpt, out)
    got = spark.read.parquet(out)
    assert got.columns == ["k", "d", "amount", "flag"]
    assert dict(got.dtypes)["amount"] == "bigint"
    assert _rows(got) == {
        (1, "a", 10, None), (2, "b", 20, None), (3, "c", 30, True),
    }


def test_starting_version_tails_only(spark, table, tmp_path):
    v = table.latest_version()
    table.append(spark.createDataFrame([Row(k=3, d="c", v=30)]))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    await_drain(
        lambda: (
            spark.readStream.format("versioned_table")
            .option("path", table.path)
            .option("startingVersion", str(v))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        ),
        timeout=120,
    )
    assert _rows(spark.read.parquet(out)) == {(3, "c", 30)}


def test_batch_read_and_time_travel(spark, table):
    table.append(spark.createDataFrame([Row(k=3, d="c", v=30)]))
    cur = spark.read.format("versioned_table").option(
        "path", table.path
    ).load()
    assert _rows(cur) == _rows(table.read())
    old = (
        spark.read.format("versioned_table")
        .option("path", table.path)
        .option("version", "1")
        .load()
    )
    assert _rows(old) == {(1, "a", 10), (2, "b", 20)}


def test_batch_read_refuses_mor_deletes(spark, table):
    from pyspark.sql import Row as _R
    table.delete_keys(spark.createDataFrame([_R(k=1)]))
    with pytest.raises(Exception, match="delete sidecars"):
        spark.read.format("versioned_table").option(
            "path", table.path
        ).load().collect()


def test_add_files_registers_external_parquet(spark, table):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ext = os.path.join(table.path, "ext1.parquet")
    pq.write_table(
        pa.table({"k": [7], "d": ["z"], "v": [70]}).cast(
            pa.schema(
                [("k", pa.int64()), ("d", pa.string()), ("v", pa.int64())]
            )
        ),
        ext,
    )
    v = table.add_files([ext])
    assert v == 2
    assert not os.path.exists(ext)  # moved, not copied
    assert (7, "z", 70) in _rows(table.read())
    assert table.history()[-1]["operation"] == "append"
    # commit stats were collected for the registered file
    assert table.metadata_aggregate(["k"])["columns"]["k"]["max"] == 7
    # schema mismatch refuses
    bad = os.path.join(table.path, "bad.parquet")
    pq.write_table(pa.table({"k": [1]}), bad)
    with pytest.raises(ValueError, match="does not match"):
        table.add_files([bad])


def test_batch_write_format_appends(spark, table):
    (
        spark.createDataFrame([Row(k=9, d="y", v=90)])
        .write.format("versioned_table")
        .option("path", table.path)
        .mode("append")
        .save()
    )
    assert (9, "y", 90) in _rows(table.read())
    assert table.latest_version() == 2
    with pytest.raises(Exception, match="append-only"):
        (
            spark.createDataFrame([Row(k=9, d="y", v=90)])
            .write.format("versioned_table")
            .option("path", table.path)
            .mode("overwrite")
            .save()
        )


def test_stream_sink_appends_exactly_once(spark, table, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame([Row(k=5, d="e", v=50)]).write.parquet(src)

    def run():
        await_drain(
            lambda: (
                spark.readStream.schema("k long, d string, v long")
                .parquet(src)
                .writeStream.format("versioned_table")
                .option("path", table.path)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            ),
            timeout=120,
        )

    run()
    assert (5, "e", 50) in _rows(table.read())
    v_after = table.latest_version()
    props = table.snapshot_properties(v_after)
    assert props["vt_sink_id"] == "default"
    assert props["vt_sink_batch"] == "0"
    # re-running the drained stream must not duplicate anything
    run()
    assert table.latest_version() == v_after
    assert [r for r in table.read().collect() if r["k"] == 5] != []
    assert table.read().count() == 3


def test_stream_sink_replayed_batch_discards(spark, table, tmp_path):
    """A crash AFTER the table commit but BEFORE Spark records the
    batch in its offset log replays the same batchId; the sink must
    recognize it and drop the staged files instead of re-appending."""
    import glob

    from news_lakehouse_spark.sources.datasource import (
        VersionedTableStreamWriter,
        _StagedFiles,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq
    import json as _json

    schema_json = _json.dumps(
        spark.createDataFrame([Row(k=1, d="a", v=1)]).schema.jsonValue()
    )
    w = VersionedTableStreamWriter(
        schema_json, {"path": table.path}, overwrite=False
    )
    staging = os.path.join(table.path, "data", "_staging")
    os.makedirs(staging, exist_ok=True)

    def stage(k):
        p = os.path.join(staging, f"part-test-{k}.parquet")
        pq.write_table(
            pa.table(
                {"k": pa.array([k], pa.int64()),
                 "d": pa.array(["s"]),
                 "v": pa.array([k * 10], pa.int64())}
            ),
            p,
        )
        return p

    w.commit([_StagedFiles([stage(100)])], batchId=0)
    assert (100, "s", 1000) in _rows(table.read())
    v = table.latest_version()
    # replay of batch 0 (fresh writer instance = post-crash state)
    w2 = VersionedTableStreamWriter(
        schema_json, {"path": table.path}, overwrite=False
    )
    replay = stage(100)
    w2.commit([_StagedFiles([replay])], batchId=0)
    assert table.latest_version() == v  # no new commit
    assert not os.path.exists(replay)  # staged file discarded
    assert table.read().count() == 3
    # next batch applies normally
    w2.commit([_StagedFiles([stage(101)])], batchId=1)
    assert (101, "s", 1010) in _rows(table.read())
    assert not glob.glob(os.path.join(staging, "*.parquet"))


def test_stream_sink_refuses_partitioned_and_schema_drift(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "pt"))
    t.merge(
        spark.createDataFrame([Row(k=1, d="a", v=10)]),
        ["k"],
        partition_by=["d"],
    )
    register_versioned_table_source(spark)
    with pytest.raises(Exception, match="partitioned"):
        (
            spark.createDataFrame([Row(k=2, d="b", v=20)])
            .write.format("versioned_table")
            .option("path", t.path)
            .mode("append")
            .save()
        )
    t2 = VersionedParquetTable(spark, str(tmp_path / "ut"))
    t2.append(spark.createDataFrame([Row(k=1, d="a", v=10)]))
    with pytest.raises(Exception, match="does not match"):
        (
            spark.createDataFrame([Row(k=2, other=1)])
            .write.format("versioned_table")
            .option("path", t2.path)
            .mode("append")
            .save()
        )


def test_table_to_table_streaming_pipeline(spark, table, tmp_path):
    """The full lifecycle composition: readStream versioned_table ->
    transform -> writeStream versioned_table, checkpoint-resumed. The
    reference's bronze->silver hop expressed entirely inside
    Structured Streaming against the table layer on both ends."""
    tgt = VersionedParquetTable(spark, str(tmp_path / "tgt"))
    tgt.append(
        spark.createDataFrame([], "k bigint, d string, v bigint")
    )
    ckpt = str(tmp_path / "ck")

    def drain():
        await_drain(
            lambda: (
                spark.readStream.format("versioned_table")
                .option("path", table.path)
                .load()
                .withColumn("v", (2 * F.col("v")).cast("long"))
                .writeStream.format("versioned_table")
                .option("path", tgt.path)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            ),
            timeout=120,
        )

    drain()  # snapshot batch: k=1,2 doubled
    assert _rows(tgt.read()) == {(1, "a", 20), (2, "b", 40)}
    table.append(spark.createDataFrame([Row(k=3, d="c", v=30)]))
    drain()  # resumed tail: only the new append flows
    assert _rows(tgt.read()) == {(1, "a", 20), (2, "b", 40), (3, "c", 60)}
    drain()  # idle: no new target version
    v = tgt.latest_version()
    drain()
    assert tgt.latest_version() == v


def test_stream_sink_fails_loud_on_mid_stream_evolution(spark, table, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame([Row(k=10, d="x", v=100)]).write.parquet(src)

    def drain():
        await_drain(
            lambda: (
                spark.readStream.schema("k long, d string, v long")
                .parquet(src)
                .writeStream.format("versioned_table")
                .option("path", table.path)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            ),
            timeout=120,
        )

    drain()
    assert (10, "x", 100) in _rows(table.read())
    # the table evolves underneath the stream: the next batch's files
    # no longer match -> the sink refuses instead of misregistering
    table.rename_column("v", "val")
    spark.createDataFrame([Row(k=11, d="y", v=110)]).write.mode(
        "append"
    ).parquet(src)
    with pytest.raises(Exception, match="does not match"):
        drain()


def test_vacuum_reclaims_orphaned_staging(spark, table):
    import time

    staging = os.path.join(table.path, "data", "_staging")
    os.makedirs(staging, exist_ok=True)
    orphan = os.path.join(staging, "part-crashed.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    table.vacuum(keep_last=1, grace_seconds=3600)
    assert not os.path.exists(orphan)


def test_add_files_rejects_duplicate_basenames(spark, table, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    a = str(tmp_path / "a"); b = str(tmp_path / "b")
    os.makedirs(a); os.makedirs(b)
    for d in (a, b):
        pq.write_table(
            pa.table({"k": pa.array([1], pa.int64()),
                      "d": pa.array(["x"]),
                      "v": pa.array([1], pa.int64())}),
            os.path.join(d, "part.parquet"),
        )
    with pytest.raises(ValueError, match="duplicate file basenames"):
        table.add_files([os.path.join(a, "part.parquet"),
                         os.path.join(b, "part.parquet")])
