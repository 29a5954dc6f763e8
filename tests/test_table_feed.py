"""Streaming source over the versioned table (streaming/table_feed.py).

The exactly-once contract is the point (r7 verdict #1): each commit
span's delta is delivered once under a pinned batch id; crashes before
OR after the handler replay the identical span; the replica subscriber
converges to the source with no duplicates and no lost rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from news_lakehouse_spark.sources.transaction import VersionedParquetTable
from news_lakehouse_spark.streaming.table_feed import (
    TableChangeFeed,
    feed_into_replica,
)


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, d=d, v=v) for k, d, v in rows])


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def src(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "src"))
    t.merge(_df(spark, [(1, "a", 10), (2, "b", 20)]), ["k"])
    return t


def test_feed_delivers_snapshot_then_deltas(spark, src, tmp_path):
    feed = TableChangeFeed(src, str(tmp_path / "ckpt"))
    got = []
    feed.process_available(
        lambda df, bid, span: got.append((bid, span, _rows(df)))
    )
    assert got == [
        (0, (None, 1), {(1, "a", 10, "insert"), (2, "b", 20, "insert")})
    ]
    # caught up: a second drain delivers nothing
    assert feed.process_available(lambda *a: got.append(a)) == []
    # two more commits → one incremental batch spanning both
    src.merge(_df(spark, [(2, "b", 99), (3, "c", 30)]), ["k"])
    src.delete_keys(spark.createDataFrame([Row(k=1)]))
    out = []
    feed.process_available(
        lambda df, bid, span: out.append((bid, span, _rows(df)))
    )
    assert len(out) == 1
    bid, span, rows = out[0]
    assert (bid, span) == (1, (1, 3))
    assert rows == {
        (2, "b", 20, "delete"),
        (2, "b", 99, "insert"),
        (3, "c", 30, "insert"),
        (1, "a", 10, "delete"),
    }


def test_feed_chunks_by_max_versions(spark, src, tmp_path):
    src.merge(_df(spark, [(3, "c", 30)]), ["k"])
    src.merge(_df(spark, [(4, "d", 40)]), ["k"])
    feed = TableChangeFeed(src, str(tmp_path / "ckpt"), initial=1)
    spans = []
    feed.process_available(
        lambda df, bid, span: spans.append((bid, span)),
        max_versions_per_batch=1,
    )
    assert spans == [(0, (1, 2)), (1, (2, 3))]  # one commit per batch


def test_feed_crash_before_cursor_commit_replays_same_span(
    spark, src, tmp_path, monkeypatch
):
    """Crash AFTER the handler succeeded but BEFORE the cursor commit:
    the restart redelivers the identical span under the identical
    batch id (the intent pinned it), never a widened one — even though
    a NEW commit landed in between."""
    ckpt = str(tmp_path / "ckpt")
    feed = TableChangeFeed(src, ckpt)
    feed.process_available(lambda *a: None)  # snapshot delivered
    src.merge(_df(spark, [(3, "c", 30)]), ["k"])

    real_commit = TableChangeFeed._commit
    monkeypatch.setattr(
        TableChangeFeed,
        "_commit",
        lambda self, v, b: (_ for _ in ()).throw(OSError("disk gone")),
    )
    with pytest.raises(OSError):
        feed.process_available(lambda *a: None)
    monkeypatch.setattr(TableChangeFeed, "_commit", real_commit)

    # a commit lands while we were down
    src.merge(_df(spark, [(4, "d", 40)]), ["k"])
    restarted = TableChangeFeed(src, ckpt)  # fresh instance = restart
    got = []
    restarted.process_available(
        lambda df, bid, span: got.append((bid, span, _rows(df)))
    )
    # batch 1 replays EXACTLY (1,2]; the new commit is batch 2
    assert [(b, s) for b, s, _ in got] == [(1, (1, 2)), (2, (2, 3))]
    assert got[0][2] == {(3, "c", 30, "insert")}
    assert got[1][2] == {(4, "d", 40, "insert")}


def test_feed_crash_inside_handler_replays(spark, src, tmp_path):
    """Crash INSIDE the handler (nothing delivered downstream): the
    restart replays the same batch; nothing is skipped or doubled."""
    ckpt = str(tmp_path / "ckpt")
    feed = TableChangeFeed(src, ckpt)
    feed.process_available(lambda *a: None)
    src.merge(_df(spark, [(3, "c", 30)]), ["k"])

    def boom(df, bid, span):
        raise RuntimeError("sink crashed")

    with pytest.raises(RuntimeError, match="sink crashed"):
        feed.process_available(boom)
    got = []
    TableChangeFeed(src, ckpt).process_available(
        lambda df, bid, span: got.append((bid, span, _rows(df)))
    )
    assert got == [(1, (1, 2), {(3, "c", 30, "insert")})]


def test_feed_into_replica_exactly_once_across_crash(
    spark, tmp_path, monkeypatch
):
    """The silver→gold subscriber: crash between the replica apply and
    the cursor commit forces a redelivery; the batch-id dedup in the
    replica's commit properties skips it — the replica converges with
    exactly one application per batch."""
    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    rep = VersionedParquetTable(spark, str(tmp_path / "rep"))
    ckpt = str(tmp_path / "ckpt")
    src.merge(_df(spark, [(1, "a", 10), (2, "b", 20)]), ["k"])
    feed_into_replica(src, rep, ["k"], ckpt)
    assert _rows(rep.read()) == _rows(src.read())

    src.merge(_df(spark, [(2, "b", 99), (3, "c", 30)]), ["k"])
    src.delete_keys(spark.createDataFrame([Row(k=1)]))

    # crash after the replica applied but before the cursor advanced
    real_commit = TableChangeFeed._commit
    state = {"applied": 0}

    def crashing_commit(self, v, b):
        if b >= 1:
            raise OSError("crash before cursor commit")
        return real_commit(self, v, b)

    monkeypatch.setattr(TableChangeFeed, "_commit", crashing_commit)
    with pytest.raises(OSError):
        feed_into_replica(src, rep, ["k"], ckpt)
    monkeypatch.setattr(TableChangeFeed, "_commit", real_commit)
    applied_versions = rep.versions()

    # restart: the batch redelivers but the replica's feed_batch_id
    # dedup skips the re-apply — no new replica commits for it
    feed_into_replica(src, rep, ["k"], ckpt)
    assert rep.versions() == applied_versions
    assert _rows(rep.read()) == _rows(src.read())
    assert _rows(rep.read()) == {(2, "b", 99), (3, "c", 30)}

    # and the subscription keeps going afterwards
    src.merge(_df(spark, [(4, "d", 40)]), ["k"])
    feed_into_replica(src, rep, ["k"], ckpt)
    assert _rows(rep.read()) == _rows(src.read())


def test_feed_initial_at_current_version_waits_for_new_commits(
    spark, src, tmp_path
):
    """initial=<current version> subscribes a consumer that already
    holds the snapshot (seeded by time travel): nothing delivers until
    the NEXT commit, whose delta then arrives alone."""
    feed = TableChangeFeed(src, str(tmp_path / "ckpt"), initial=1)
    assert feed.process_available(lambda *a: pytest.fail("early")) == []
    src.merge(_df(spark, [(1, "a", 77)]), ["k"])
    got = []
    feed.process_available(
        lambda df, bid, span: got.append((bid, span, _rows(df)))
    )
    assert got == [
        (0, (1, 2), {(1, "a", 10, "delete"), (1, "a", 77, "insert")})
    ]


def test_feed_span_across_compaction_delivers_only_churn(spark, src, tmp_path):
    """A compact() landing between drains is content-preserving: the
    feed's span across it must deliver only the real merges' churn —
    never the compaction's full rewrite (changes_plan skips it)."""
    feed = TableChangeFeed(src, str(tmp_path / "ckpt"))
    feed.process_available(lambda *a: None)  # snapshot at v1
    src.merge(_df(spark, [(3, "c", 30)]), ["k"])
    src.compact()  # rewrites the whole table, changes nothing
    src.merge(_df(spark, [(4, "d", 40)]), ["k"])
    got = []
    feed.process_available(
        lambda df, bid, span: got.append((bid, span, _rows(df)))
    )
    assert len(got) == 1
    bid, span, rows = got[0]
    assert span == (1, 4)
    assert rows == {(3, "c", 30, "insert"), (4, "d", 40, "insert")}


def test_feed_survives_source_schema_evolution(spark, tmp_path):
    """A span crossing source-side rename/widen/add/drop mirrors the
    same metadata-only evolution onto the replica before applying the
    endpoint-schema feed — including a renamed KEY column (Delta's
    readStream simply breaks here)."""
    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    rep = VersionedParquetTable(spark, str(tmp_path / "rep"))
    ckpt = str(tmp_path / "ckpt")
    src.merge(_df(spark, [(1, "a", 10), (2, "b", 20)]), ["k"])
    feed_into_replica(src, rep, ["k"], ckpt)

    src.rename_column("v", "amount")
    src.rename_column("k", "key")  # the KEY column itself
    src.add_column("flag", "boolean")
    src.drop_column("d")
    src.merge(
        spark.createDataFrame([Row(key=3, amount=30, flag=True)]),
        ["key"],
    )
    feed_into_replica(src, rep, ["k"], ckpt)  # caller's stale key name
    assert rep.read().columns == src.read().columns
    assert _rows(rep.read()) == _rows(src.read())
    assert _rows(rep.read()) == {
        (1, 10, None),
        (2, 20, None),
        (3, 30, True),
    }
    # and the subscription keeps going under the new names
    src.merge(
        spark.createDataFrame([Row(key=4, amount=40, flag=False)]),
        ["key"],
    )
    feed_into_replica(src, rep, ["key"], ckpt)
    assert _rows(rep.read()) == _rows(src.read())


def test_sync_from_survives_source_rename(spark, tmp_path):
    """sync_from's cursor span crossing a source rename mirrors the
    evolution and keeps syncing — O(churn), no full re-copy."""
    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    rep = VersionedParquetTable(spark, str(tmp_path / "rep"))
    src.merge(_df(spark, [(1, "a", 10)]), ["k"])
    rep.sync_from(src, ["k"])
    src.rename_column("v", "amount")
    src.merge(
        spark.createDataFrame([Row(k=2, d="b", amount=20)]), ["k"]
    )
    rep.sync_from(src, ["k"])
    assert rep.read().columns == src.read().columns
    assert _rows(rep.read()) == {(1, "a", 10), (2, "b", 20)}


def test_feed_cursor_vacuumed_past_fails_loud(spark, src, tmp_path):
    """Retention contract (docs/table_layer.md): a subscriber whose
    cursor was vacuumed past fails LOUDLY on the next drain (missing
    manifest), never silently skips data — re-seed with a fresh
    checkpoint then."""
    feed = TableChangeFeed(src, str(tmp_path / "ckpt"))
    feed.process_available(lambda *a: None)  # cursor at v1
    for i in range(4):
        src.merge(_df(spark, [(10 + i, "x", i)]), ["k"])
    src.vacuum(keep_last=2, grace_seconds=0)  # v1 manifest gone
    with pytest.raises(FileNotFoundError):
        feed.process_available(lambda *a: None)
    # re-seed: fresh checkpoint full-snapshots and resumes
    fresh = TableChangeFeed(src, str(tmp_path / "ckpt2"))
    got = []
    fresh.process_available(lambda df, bid, span: got.append(_rows(df)))
    assert len(got) == 1 and len(got[0]) == 6  # 2 original + 4 merged


def test_feed_mirrors_widen_and_nested_evolution(spark, tmp_path):
    """Mirroring covers type widening (incl. through later batches)
    and NESTED struct evolution: a source widening a column and
    renaming a field inside an array<struct> mid-subscription keeps
    the replica applying cleanly."""
    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    rep = VersionedParquetTable(spark, str(tmp_path / "rep"))
    ckpt = str(tmp_path / "ckpt")
    src.merge(
        spark.sql(
            "SELECT k, CAST(k*10 AS INT) AS v,"
            " array(named_struct('author', concat('u', k))) AS c"
            " FROM VALUES (1), (2) AS t(k)"
        ),
        ["k"],
    )
    feed_into_replica(src, rep, ["k"], ckpt)
    src.widen_column("v", "bigint")
    src.rename_column("c.element.author", "user")
    src.merge(
        spark.sql(
            "SELECT 3 AS k, CAST(8589934592 AS BIGINT) AS v,"
            " array(named_struct('user', 'u3')) AS c"
        ),
        ["k"],
    )
    feed_into_replica(src, rep, ["k"], ckpt)
    assert dict(rep.read().dtypes) == dict(src.read().dtypes)
    got = {
        r["k"]: (r["v"], r["c"][0]["user"]) for r in rep.read().collect()
    }
    assert got == {1: (10, "u1"), 2: (20, "u2"), 3: (8589934592, "u3")}


def test_feed_crash_during_snapshot_batch_replays_snapshot(
    spark, src, tmp_path
):
    """Crash while the INITIAL snapshot batch is in flight: the intent
    pinned (None, v] under batch 0, so the restart replays the
    snapshot exactly once — even when new commits landed meanwhile
    (they arrive as batch 1, not folded into the snapshot)."""
    ckpt = str(tmp_path / "ckpt")
    feed = TableChangeFeed(src, ckpt)

    def boom(df, bid, span):
        raise RuntimeError("sink crashed mid-snapshot")

    with pytest.raises(RuntimeError):
        feed.process_available(boom)
    src.merge(_df(spark, [(3, "c", 30)]), ["k"])  # lands while down
    got = []
    TableChangeFeed(src, ckpt).process_available(
        lambda df, bid, span: got.append((bid, span, _rows(df)))
    )
    assert [(b, s) for b, s, _ in got] == [(0, (None, 1)), (1, (1, 2))]
    assert got[0][2] == {(1, "a", 10, "insert"), (2, "b", 20, "insert")}
    assert got[1][2] == {(3, "c", 30, "insert")}


def test_process_available_pins_latest_at_entry(spark, src, tmp_path):
    """advice r8 (low): Trigger.AvailableNow must terminate at the
    versions that existed when draining began — a handler (or any
    concurrent writer) committing to the source mid-drain must not
    keep the drain alive forever."""
    feed = TableChangeFeed(src, str(tmp_path / "ckpt"), initial=1)
    src.merge(_df(spark, [(3, "c", 30)]), ["k"])  # v2
    src.merge(_df(spark, [(4, "d", 40)]), ["k"])  # v3
    n = [0]

    def handler(df, bid, span):
        n[0] += 1
        src.merge(_df(spark, [(100 + n[0], "z", 1)]), ["k"])

    got = feed.process_available(handler, max_versions_per_batch=1)
    assert [i["to"] for i in got] == [2, 3]  # pinned; new commits wait


def test_feed_reseed_fresh_checkpoint_not_mistaken_for_replay(
    spark, tmp_path
):
    """advice r8 (medium): sink dedup is scoped by (feed_id, batch_id).
    A re-seeded feed (fresh checkpoint, batch ids restarting at 0)
    must APPLY its snapshot and later batches even though the replica
    once recorded higher ordinals under the old checkpoint's feed."""
    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    rep = VersionedParquetTable(spark, str(tmp_path / "rep"))
    src.merge(_df(spark, [(1, "a", 10)]), ["k"])
    feed_into_replica(src, rep, ["k"], str(tmp_path / "ck1"))
    src.merge(_df(spark, [(2, "b", 20)]), ["k"])
    src.merge(_df(spark, [(3, "c", 30)]), ["k"])
    feed_into_replica(
        src, rep, ["k"], str(tmp_path / "ck1"), max_versions_per_batch=1
    )  # replica's newest recorded ordinal is now batch 2
    # upstream vacuums past the cursor → documented recovery: re-seed
    # with a FRESH checkpoint; ids restart at 0
    src.merge(_df(spark, [(4, "d", 40)]), ["k"])
    feed_into_replica(src, rep, ["k"], str(tmp_path / "ck2"))
    assert _rows(rep.read()) == _rows(src.read())  # snapshot applied
    src.merge(_df(spark, [(5, "e", 50)]), ["k"])
    feed_into_replica(src, rep, ["k"], str(tmp_path / "ck2"))
    assert _rows(rep.read()) == _rows(src.read())  # deltas keep flowing


def test_last_feed_batch_resolved_once_per_drain(
    spark, tmp_path, monkeypatch
):
    """r8 verdict #7: the replica-properties scan runs ONCE per
    feed_into_replica call, not once per batch — a long drain must not
    pay O(batches × retained-versions) driver reads."""
    import news_lakehouse_spark.streaming.table_feed as tf

    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    rep = VersionedParquetTable(spark, str(tmp_path / "rep"))
    src.merge(_df(spark, [(1, "a", 10)]), ["k"])
    tf.feed_into_replica(src, rep, ["k"], str(tmp_path / "ck"))  # snapshot
    for k in (2, 3, 4):
        src.merge(_df(spark, [(k, "x", k * 10)]), ["k"])
    calls = [0]
    real = tf._last_feed_batch

    def counted(replica, feed_id=None):
        calls[0] += 1
        return real(replica, feed_id)

    monkeypatch.setattr(tf, "_last_feed_batch", counted)
    got = tf.feed_into_replica(
        src, rep, ["k"], str(tmp_path / "ck"), max_versions_per_batch=1
    )
    assert len(got) == 3  # three single-commit batches
    assert calls[0] == 1
    assert _rows(rep.read()) == _rows(src.read())


def test_feed_bytes_bound_isolates_big_commit_and_coalesces_tiny(
    spark, tmp_path
):
    """r8 verdict #6: max_bytes_per_batch bounds a batch by CHURN
    BYTES — a single over-budget commit is delivered alone (commits
    are the atomicity unit) while consecutive tiny commits coalesce
    up to the budget. Partitioned source so each commit's churn is
    its own partition's files."""
    import hashlib as _hl

    def pdf(rows):
        return spark.createDataFrame(
            [Row(k=k, d=d, p=p) for k, d, p in rows]
        )

    src = VersionedParquetTable(spark, str(tmp_path / "psrc"))
    src.merge(pdf([(1, "seed", "x")]), ["k"], partition_by=["d"])  # v1
    big = pdf(
        [
            (1000 + i, "big", _hl.sha256(str(i).encode()).hexdigest() * 8)
            for i in range(5000)
        ]
    )
    src.merge(big, ["k"])  # v2: one big commit
    for k in (3, 4, 5, 6):
        src.merge(pdf([(k, f"t{k}", "y")]), ["k"])  # v3..v6 tiny

    def added_bytes(v):
        prev = set(src._manifest_files_stats(src._load_root(v - 1))[0])
        cur = set(src._manifest_files_stats(src._load_root(v))[0])
        return sum(src._file_sizes(sorted(cur - prev)).values())

    tiny_total = sum(added_bytes(v) for v in (3, 4, 5, 6))
    assert added_bytes(2) > tiny_total  # fixture sanity
    feed = TableChangeFeed(src, str(tmp_path / "ckpt"), initial=1)
    spans = []
    feed.process_available(
        lambda df, bid, span: spans.append(span),
        max_bytes_per_batch=tiny_total,
    )
    assert spans == [(1, 2), (2, 6)]


def test_run_continuous_converges_with_concurrent_writer(
    spark, tmp_path
):
    """r8 verdict #6: the processingTime-style runner follows a source
    under live concurrent commits to convergence, exactly once."""
    import threading

    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    rep = VersionedParquetTable(spark, str(tmp_path / "rep"))
    src.merge(_df(spark, [(0, "seed", 0)]), ["k"])

    def writer():
        for k in range(1, 6):
            src.merge(_df(spark, [(k, "w", k * 10)]), ["k"])

    th = threading.Thread(target=writer)
    th.start()
    got = feed_into_replica(
        src,
        rep,
        ["k"],
        str(tmp_path / "ck"),
        continuous=True,
        poll_interval=0.05,
        idle_stop_after=20,
    )
    th.join()
    # one final catch-up drain in case the runner went idle before the
    # writer's last commit landed
    got += feed_into_replica(src, rep, ["k"], str(tmp_path / "ck"))
    assert _rows(rep.read()) == _rows(src.read())
    bids = [i["batch_id"] for i in got]
    assert bids == sorted(set(bids))  # no duplicate deliveries


def test_feed_mirrors_partition_spec_opt_in(spark, tmp_path):
    """mirror_partition_spec=True clones source spec evolution onto
    the replica at each span endpoint; the default leaves the
    replica's layout alone (a per-table choice)."""
    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    rep = VersionedParquetTable(spark, str(tmp_path / "rep"))
    ckpt = str(tmp_path / "ckpt")
    src.merge(_df(spark, [(1, "a", 10), (2, "b", 20)]), ["k"])
    feed_into_replica(src, rep, ["k"], ckpt)  # snapshot copies spec ([])

    src.set_partition_spec(["d"])
    src.merge(_df(spark, [(3, "c", 30)]), ["k"])
    feed_into_replica(src, rep, ["k"], ckpt)  # default: layout untouched
    assert rep._load_manifest(rep.latest_version())["partition_by"] == []

    src.merge(_df(spark, [(4, "d", 40)]), ["k"])
    feed_into_replica(src, rep, ["k"], ckpt, mirror_partition_spec=True)
    assert (
        rep._load_manifest(rep.latest_version())["partition_by"] == ["d"]
    )
    assert _rows(rep.read()) == _rows(src.read())
