"""Checkpointed streaming source over a versioned table (T4/S16).

The Delta ``spark.readStream.table(...)`` analog for
``sources.transaction.VersionedParquetTable``: subscribe to a table's
commit history and receive each commit span's ROW-LEVEL delta exactly
once through a foreachBatch-style handler, resuming from a persisted
version cursor after a crash or restart.

Reference parity: the reference's silver→gold hop re-reads silver
tables in full every run (gcs_silver_to_gold.py:347-352 — daily
``spark.table("silver.*")`` scans). At 100 TB that full re-read is the
whole cost of the pipeline; this source replaces it with an O(churn)
incremental feed — the downstream job processes only what the
upstream's commits actually changed (r7 verdict #1).

Exactly-once contract — the Structured Streaming offset-WAL design,
re-expressed on the manifest layer:

1. PLAN: before the handler runs, the feed writes an INTENT record
   (batch id + exact version span) to the checkpoint with an atomic
   rename. The span is thereby pinned: a crash mid-batch replays
   EXACTLY this span under EXACTLY this batch id, never a widened one
   that would make the sink's "seen this batch id" dedup skip rows
   (the classic at-least-once hole when offsets are chosen after the
   fact).
2. PROCESS: the handler receives ``(delta_df, batch_id, (from_v,
   to_v))``. ``delta_df`` is ``changes()`` output (row schema +
   ``_change_type``), so cost scales with the span's churn, not the
   table.
3. COMMIT: only after the handler returns does the cursor advance
   (atomic rename again). Crash between 2 and 3 → redelivery of the
   identical batch; a sink that is idempotent per batch id (the
   foreachBatch contract — ``feed_into_replica`` below records the
   batch id in the replica's commit properties and skips replays)
   yields exactly-once end-to-end effect.

Retention interplay: the cursor references upstream versions, so the
upstream's ``vacuum`` retention must cover the subscriber's maximum
lag — the same contract ``sync_from`` documents for its cursor. A
vacuumed-past cursor surfaces as ``changes()`` failing on a missing
manifest; re-seed with a fresh checkpoint (full snapshot) then. Batch
ids restart at 0 on a re-seed, so the sink-side dedup key is
(feed_id, batch_id): every checkpoint instance mints a uuid at
creation and ordinals are compared within it only (advice r8).

Delivery modes: ``process_available`` is Trigger.AvailableNow (drain
to the versions that existed at entry, pinned once, then return);
``run_continuous`` is the processingTime-trigger analog (poll with
idle backoff, deliver forever).

Scale posture: everything here is metadata-sized driver work (two tiny
JSON files per batch) around ``changes()``, whose plan reads only the
span's churned files with compaction commits skipped — no full-table
scan anywhere, no state in the Spark job itself.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, functions as F

from news_lakehouse_spark.sources.transaction import VersionedParquetTable

_CURSOR = "cursor.json"
_INTENT = "intent.json"
_FEED_ID = "feed_id.json"


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


class TableChangeFeed:
    """Incremental subscription to a ``VersionedParquetTable``.

    ``initial='snapshot'`` (default) delivers the table's CURRENT
    snapshot as an all-insert batch first — the Delta readStream
    initial-snapshot behavior — then commit deltas. ``initial=<int>``
    starts the cursor at that RETAINED version instead, delivering
    only changes committed after it (``changes()`` spans are
    (from, to], so the named version's own content is excluded — a
    consumer that already holds it, e.g. seeded by time travel).
    """

    def __init__(
        self,
        table: VersionedParquetTable,
        checkpoint_dir: str,
        initial: str | int = "snapshot",
    ):
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.initial = initial
        os.makedirs(checkpoint_dir, exist_ok=True)

    # --- checkpoint state -------------------------------------------------

    def feed_id(self) -> str:
        """Stable uuid minted when this CHECKPOINT was created (advice
        r8): sink-side batch-id dedup must be scoped to a checkpoint
        instance, because the documented recovery from a vacuumed-past
        cursor is a re-seed with a FRESH checkpoint — which restarts
        batch ids at 0. A bare-ordinal compare would then skip the
        re-seed snapshot and every batch up to the replica's old max
        id, leaving the replica permanently stale. (feed_id, batch_id)
        makes each checkpoint's ordinals their own dedup space."""
        path = os.path.join(self.checkpoint_dir, _FEED_ID)
        rec = _read_json(path)
        if rec is None:
            rec = {"feed_id": uuid.uuid4().hex}
            _atomic_write_json(path, rec)
        return rec["feed_id"]

    def cursor(self) -> dict | None:
        """Last COMMITTED position: {'version': v, 'batch_id': b}, or
        None before the first delivered batch."""
        return _read_json(os.path.join(self.checkpoint_dir, _CURSOR))

    def _commit(self, version: int, batch_id: int) -> None:
        _atomic_write_json(
            os.path.join(self.checkpoint_dir, _CURSOR),
            {"version": version, "batch_id": batch_id},
        )

    def _plan_intent(self, intent: dict) -> None:
        _atomic_write_json(
            os.path.join(self.checkpoint_dir, _INTENT), intent
        )

    def _pending_intent(self) -> dict | None:
        """The planned-but-uncommitted batch, if any: an intent whose
        batch id is ahead of the committed cursor (a stale intent from
        a batch that DID commit is ignored)."""
        intent = _read_json(os.path.join(self.checkpoint_dir, _INTENT))
        if intent is None:
            return None
        cur = self.cursor()
        if cur is not None and intent["batch_id"] <= cur["batch_id"]:
            return None
        return intent

    # --- delivery ---------------------------------------------------------

    def _batch_df(self, intent: dict) -> DataFrame:
        if intent.get("mode") == "snapshot":
            return self.table.read(version=intent["to"]).withColumn(
                "_change_type", F.lit("insert")
            )
        return self.table.changes(intent["from"], intent["to"])

    def _span_end(
        self,
        cur_v: int,
        latest: int,
        max_versions: int | None,
        max_bytes: int | None,
    ) -> int:
        """Last version of the next batch's span. ``max_versions`` is
        the maxFilesPerTrigger-style count bound; ``max_bytes`` bounds
        the span's CHURN BYTES (manifest file sizes of per-commit added
        files, compaction commits excluded — they contribute nothing to
        the feed), which is the bound that actually matters when commit
        sizes vary 1000× (r8 verdict #6). A single over-sized commit is
        still delivered alone — commits are the atomicity unit — while
        consecutive tiny commits coalesce up to the budget."""
        to_v = (
            latest
            if max_versions is None
            else min(latest, cur_v + max_versions)
        )
        if max_bytes is None or to_v <= cur_v:
            return to_v
        try:
            t = self.table
            prev = set(t._manifest_files_stats(t._load_root(cur_v))[0])
            end, total = cur_v, 0
            for v in range(cur_v + 1, to_v + 1):
                root = t._load_root(v)
                files = set(t._manifest_files_stats(root)[0])
                if root["operation"] != "compact":
                    added = sorted(files - prev)
                    sz = (
                        sum(t._file_sizes(added).values()) if added else 0
                    )
                    if end > cur_v and total + sz > max_bytes:
                        break
                    total += sz
                end = v
                prev = files
            return max(end, cur_v + 1)
        except FileNotFoundError:
            # an intermediate manifest was vacuumed: byte-sizing the
            # walk is impossible; fall back to the count bound
            return to_v

    def process_available(
        self,
        handler,
        max_versions_per_batch: int | None = None,
        max_bytes_per_batch: int | None = None,
    ) -> list[dict]:
        """Drain every committed-but-undelivered span through
        ``handler(delta_df, batch_id, (from_v, to_v))`` —
        Trigger.AvailableNow semantics: ``latest_version()`` is pinned
        ONCE at entry, so the call terminates at the versions that
        existed when draining began even while a concurrent writer
        keeps committing (advice r8 — re-reading latest per batch kept
        the drain from ever returning under continuous commits; the
        continuous mode is ``run_continuous``). Returns the list of
        delivered intents (empty when already caught up).

        ``max_versions_per_batch`` bounds per-batch churn by commit
        count (one commit per batch at 1) — the maxFilesPerTrigger
        analog; ``max_bytes_per_batch`` bounds it by churn bytes (see
        ``_span_end``).
        """
        delivered: list[dict] = []
        replay = self._pending_intent()
        if replay is not None:  # crashed mid-batch: redeliver verbatim
            self._deliver(replay, handler)
            delivered.append(replay)
        latest = self.table.latest_version()
        if latest is None:
            return delivered
        cur = self.cursor()
        if cur is None:
            if self.initial == "snapshot":
                intent = {
                    "batch_id": 0,
                    "mode": "snapshot",
                    "from": None,
                    "to": latest,
                }
                self._plan_intent(intent)
                self._deliver(intent, handler)
                delivered.append(intent)
                cur = self.cursor()
            else:
                start = int(self.initial)
                self._commit(start, -1)
                cur = self.cursor()
        while cur["version"] < latest:
            to_v = self._span_end(
                cur["version"],
                latest,
                max_versions_per_batch,
                max_bytes_per_batch,
            )
            intent = {
                "batch_id": cur["batch_id"] + 1,
                "from": cur["version"],
                "to": to_v,
            }
            self._plan_intent(intent)
            self._deliver(intent, handler)
            delivered.append(intent)
            cur = self.cursor()
        return delivered

    def run_continuous(
        self,
        handler,
        poll_interval: float = 1.0,
        *,
        max_versions_per_batch: int | None = None,
        max_bytes_per_batch: int | None = None,
        should_stop=None,
        idle_stop_after: int | None = None,
        max_backoff: float | None = None,
    ) -> list[dict]:
        """Continuous (processingTime-trigger style) subscription loop
        (r8 verdict #6): drain with ``process_available``, sleep
        ``poll_interval`` when idle with exponential backoff (capped at
        ``max_backoff``, default 8× the interval), repeat. A drain that
        delivered something re-polls immediately — a hot upstream is
        followed at full speed; an idle one costs a couple of manifest
        ``os.stat`` calls per poll. Stops when ``should_stop()`` returns
        true (checked between drains) or after ``idle_stop_after``
        consecutive empty drains; otherwise runs forever. All work is
        metadata-sized driver polling around the O(churn) feed — no
        Spark job runs while idle."""
        import time as _t

        delivered: list[dict] = []
        idle = 0
        backoff = poll_interval
        cap = max_backoff if max_backoff is not None else poll_interval * 8
        while True:
            if should_stop is not None and should_stop():
                return delivered
            got = self.process_available(
                handler,
                max_versions_per_batch=max_versions_per_batch,
                max_bytes_per_batch=max_bytes_per_batch,
            )
            delivered.extend(got)
            if got:
                idle = 0
                backoff = poll_interval
                continue  # caught up? re-check immediately
            idle += 1
            if idle_stop_after is not None and idle >= idle_stop_after:
                return delivered
            _t.sleep(backoff)
            backoff = min(backoff * 2, cap)

    def _deliver(self, intent: dict, handler) -> None:
        handler(
            self._batch_df(intent),
            intent["batch_id"],
            (intent["from"], intent["to"]),
        )
        self._commit(intent["to"], intent["batch_id"])


def _span_renames(
    source: VersionedParquetTable, from_v: int, to_v: int
) -> dict[str, str]:
    """Top-level old→new column names across a source version span,
    diffed by field id — the key-column fix-up for subscriptions
    crossing a rename. Independent of what mirroring actually applied
    (a replayed span's mirror is a no-op but the keys still need
    mapping)."""
    from news_lakehouse_spark.sources.transaction import _field_fid

    ra = source._load_root(source._resolve_version(from_v))
    rb = source._load_root(source._resolve_version(to_v))
    if "schemas" not in rb:
        return {}
    if "schemas" in ra:
        fields_a = ra["schema"]["fields"]
    else:  # span crosses the epoch upgrade: epoch 0 names = legacy
        names_a = {f["name"] for f in ra["schema"]["fields"]}
        fields_a = [
            f for f in rb["schemas"]["0"]["fields"] if f["name"] in names_a
        ]
    fa = {_field_fid(f): f["name"] for f in fields_a}
    fb = {_field_fid(f): f["name"] for f in rb["schema"]["fields"]}
    return {
        fa[i]: fb[i] for i in fa if i in fb and fa[i] != fb[i]
    }


def _last_feed_batch(
    replica: VersionedParquetTable, feed_id: str | None = None
) -> int | None:
    """Newest recorded feed batch id in the replica's retained commit
    properties — the sink-side dedup key for redelivered batches. Same
    newest-first O(retained-versions) scan and retention contract as
    sync_from's cursor. With ``feed_id``, only batches recorded by THAT
    checkpoint instance count (advice r8): a re-seeded feed (fresh
    checkpoint after a vacuumed-past cursor) restarts batch ids at 0,
    and its snapshot must not be skipped because an OLD feed once
    recorded a higher ordinal. Records written before feed-id scoping
    existed carry no id and match any feed — a pre-upgrade replica
    keeps deduping its in-flight feed; re-seeding such a replica means
    starting it fresh (documented limitation)."""
    if not replica.exists():
        return None
    for v in reversed(replica.versions()):
        props = replica.snapshot_properties(v) or {}
        b = props.get("feed_batch_id")
        if b is None:
            continue
        rec_fid = props.get("feed_id")
        if feed_id is not None and rec_fid is not None and rec_fid != feed_id:
            continue  # another checkpoint instance's ordinal space
        return int(b)
    return None


def feed_into_replica(
    source: VersionedParquetTable,
    replica: VersionedParquetTable,
    keys: list[str],
    checkpoint_dir: str,
    order_by=None,
    max_versions_per_batch: int | None = None,
    max_bytes_per_batch: int | None = None,
    continuous: bool = False,
    poll_interval: float = 0.2,
    should_stop=None,
    idle_stop_after: int | None = None,
    mirror_partition_spec: bool = False,
) -> list[dict]:
    """The silver→gold subscriber: drain ``source``'s change feed into
    ``replica`` with exactly-once effect. The initial snapshot batch
    full-writes the replica (copying the source's partition spec);
    every later batch is an O(churn) ``apply_changes``. Each applying
    commit records (feed_id, batch_id) in its properties, so a
    redelivered batch (crash between handler and cursor commit) is
    detected and SKIPPED — idempotence by dedup, not just by replay-
    safety — while a RE-SEEDED feed (fresh checkpoint, fresh feed_id,
    batch ids restarting at 0) is applied, not mistaken for a replay
    (advice r8). The newest applied id is resolved from the replica
    ONCE per call and tracked in memory thereafter (r8 verdict #7 — a
    long drain no longer pays O(batches × retained-versions) driver
    scans). A span crossing source-side SCHEMA EVOLUTION first replays
    the same (metadata-only, idempotent) evolution on the replica —
    ``mirror_evolution_from`` — so the feed's endpoint-schema rows
    apply cleanly and renamed key columns keep working (``keys`` may
    name them by either the old or the new name). With
    ``mirror_partition_spec`` the replica additionally clones the
    source's partition spec at each span's endpoint
    (``mirror_partition_spec_from`` — opt-in because layout is a
    per-table choice; a spec change in a churn-free span lands with
    the next delivered batch). With ``continuous``
    the drain loops (``run_continuous``) until ``should_stop`` /
    ``idle_stop_after``. Returns the delivered intents."""
    feed = TableChangeFeed(source, checkpoint_dir)
    fid = feed.feed_id()
    state = {"last": _last_feed_batch(replica, fid)}

    def handler(df: DataFrame, batch_id: int, span) -> None:
        if state["last"] is not None and state["last"] >= batch_id:
            return  # already applied; crashed before cursor commit
        props = {
            "feed_batch_id": batch_id,
            "feed_id": fid,
            "feed_to_version": span[1],
        }
        if span[0] is None:  # initial snapshot
            root = source._load_root(span[1])
            replica.write(
                df.drop("_change_type"),
                partition_by=root["partition_by"] or None,
                operation="feed-snapshot",
                properties=props,
            )
        else:
            replica.mirror_evolution_from(
                source,
                span[0],
                span[1],
                include_partition_spec=mirror_partition_spec,
            )
            renames = _span_renames(source, span[0], span[1])
            batch_keys = [renames.get(k, k) for k in keys]
            replica.apply_changes(
                df, batch_keys, order_by=order_by, properties=props
            )
        state["last"] = batch_id

    if continuous:
        return feed.run_continuous(
            handler,
            poll_interval,
            max_versions_per_batch=max_versions_per_batch,
            max_bytes_per_batch=max_bytes_per_batch,
            should_stop=should_stop,
            idle_stop_after=idle_stop_after,
        )
    return feed.process_available(
        handler,
        max_versions_per_batch=max_versions_per_batch,
        max_bytes_per_batch=max_bytes_per_batch,
    )
