"""Property-based tests (hypothesis): batched per example-set so each
hypothesis example costs one Spark job over a small DataFrame, not a
job per value."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from news_lakehouse_spark.functions.timestamps import parse_epoch, parse_timestamp_any

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# epoch seconds between 1990 and 2100 (the 10-digit regime), and the
# same instants as 13-digit millis
_epoch_s = st.integers(min_value=631_152_000, max_value=4_102_444_800)


@given(st.lists(_epoch_s, min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_epoch_seconds_and_millis_agree(spark, xs):
    df = spark.createDataFrame(
        [(str(x), str(x * 1000)) for x in xs], "s string, ms string"
    )
    out = df.select(
        parse_epoch("s").alias("from_s"), parse_epoch("ms").alias("from_ms")
    ).collect()
    for x, r in zip(xs, out):
        assert r["from_s"] == r["from_ms"], x
        assert r["from_s"] == dt.datetime.utcfromtimestamp(x), x


@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2099, 12, 31)
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_cascade_parses_iso_strings(spark, ts):
    ts = [t.replace(microsecond=0) for t in ts]
    df = spark.createDataFrame(
        [(t.strftime("%Y-%m-%dT%H:%M:%S"),) for t in ts], "raw string"
    )
    out = df.select(parse_timestamp_any("raw").alias("p")).collect()
    for t, r in zip(ts, out):
        assert r["p"] == t, t


@given(st.lists(st.text(alphabet="abcdefgh ", min_size=0, max_size=40), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_word_count_nonnegative_and_bounded(spark, texts):
    from news_lakehouse_spark.functions.text import word_count

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(F.col("text"), word_count("text").alias("wc")).collect()
    for r in out:
        # reference semantics: size(split('', ' ')) == 1 — word_count of
        # whitespace-only text is 1, never 0 (SURVEY §7 edge note)
        assert 1 <= r["wc"] <= len(r["text"]) + 1


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000_000), st.integers(1, 5000)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_pack_sequences_conservation_properties(spark, rows):
    from news_lakehouse_spark.operators.packing import pack_sequences

    budget = 1024
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    packs = pack_sequences(df, "doc_id", "n_tok", budget=budget, num_partitions=2)
    got = packs.collect()
    lens = dict(rows)
    seen: list[int] = []
    for p in got:
        seen.extend(p["doc_ids"])
        assert p["total_tokens"] == sum(lens[i] for i in p["doc_ids"])
        if p["n_docs"] > 1:
            assert p["total_tokens"] <= budget
    # every doc exactly once, token totals conserved
    assert sorted(seen) == sorted(lens)
    assert sum(p["total_tokens"] for p in got) == sum(lens.values())


@given(
    st.lists(st.integers(0, 1_000_000), min_size=1, max_size=50, unique=True),
    st.floats(min_value=0.05, max_value=0.95),
)
@settings(**_SETTINGS)
def test_hash_fraction_split_is_stable_under_growth(spark, keys, frac):
    """Adding rows never moves an existing row across the split
    boundary — the contamination-prevention property."""
    from news_lakehouse_spark.operators.sampling import train_test_split

    half = keys[: max(1, len(keys) // 2)]
    small = spark.createDataFrame([(k,) for k in half], "k long")
    big = spark.createDataFrame([(k,) for k in keys], "k long")
    s1 = {
        r["k"]: r["split"]
        for r in train_test_split(small, ["k"], test_fraction=frac).collect()
    }
    s2 = {
        r["k"]: r["split"]
        for r in train_test_split(big, ["k"], test_fraction=frac).collect()
    }
    for k, v in s1.items():
        assert s2[k] == v


@given(
    st.lists(
        st.tuples(st.integers(0, 100_000), st.sampled_from(["a", "b", "c"])),
        min_size=6,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_mixture_sample_never_upsamples_and_conserves_rows(spark, rows):
    from news_lakehouse_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(rows, ["doc_id", "src"])
    out = mixture_sample(
        df, "src", {"a": 2.0, "b": 1.0, "c": 1.0}, key_cols=["doc_id"]
    ).collect()
    # one verdict per input row; kept is 0/1; no stratum over-drawn
    assert len(out) == len(rows)
    from collections import Counter

    kept = Counter(r["src"] for r in out if r["kept"] == 1)
    sizes = Counter(s for _, s in rows)
    for s, n in kept.items():
        assert n <= sizes[s]


@given(
    st.lists(
        st.tuples(st.integers(0, 120), st.sampled_from(["view", "click"])),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.tuples(st.integers(0, 120), st.sampled_from(["view", "click"])),
        min_size=1,
        max_size=15,
    ),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_watermark_drops_late_rows_identically_to_batch_replay(
    spark, tmp_path_factory, batch1, batch2
):
    """Streaming watermark semantics vs a batch replay model. Spark
    keeps TWO watermarks per micro-batch (SPARK-24634): late events in
    batch k are filtered with the PREVIOUS batch's watermark
    (max event time over batches 0..k-2, minus delay) while state
    eviction uses the current one (batches 0..k-1). The replay model
    mirrors the late-filter: a row is dropped iff its window end is
    at-or-below that lagged watermark; all surviving rows aggregate
    identically. The sentinel batch pushes the final watermark past
    every real window so append mode flushes them.
    """
    import os
    import time as _time

    from news_lakehouse_spark.streaming.windows import windowed_event_counts

    tmp = tmp_path_factory.mktemp("wm")
    base = 1_700_000_000
    win_s, delay_s = 300, 600
    # +1s jitter keeps window ends (multiples of 300) off the exact
    # watermark values, so the <=-vs-< eviction boundary never bites
    mk = lambda offs: [
        (i, base + m * 60 + 1, t) for i, (m, t) in enumerate(offs)
    ]
    sentinel = [(999, base + 10 * 86400 + 1, "zz_sentinel")]
    # the advancer batch commits batch1's max into the LAGGED filter
    # watermark, so batch2's late rows actually face it (with only
    # two real batches the two-batch lag would never filter anything)
    advancer = [(998, base + (max(m for m, _ in batch1) + 1) * 60 + 1, "view")]
    files = [mk(batch1), advancer, mk(batch2), sentinel]
    src = tmp / "src"
    os.makedirs(src)
    for k, rows in enumerate(files):
        df = spark.createDataFrame(
            [(i, ts, t) for i, ts, t in rows], "event_id long, sec long, event_type string"
        ).select("event_id", F.timestamp_seconds("sec").alias("ts"), "event_type")
        p = str(src / f"f{k}")
        df.coalesce(1).write.parquet(p)
        # file-source ordering is by modification time — force it
        for root, _, names in os.walk(p):
            for nm in names:
                os.utime(os.path.join(root, nm), (1_000_000 + k, 1_000_000 + k))
        os.utime(p, (1_000_000 + k, 1_000_000 + k))

    schema = "event_id long, ts timestamp, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    agg = windowed_event_counts(
        stream.withColumn("value", F.lit(1.0)),
        f"{win_s} seconds",
        watermark=f"{delay_s} seconds",
    )
    name = f"wm_out_{int(_time.time() * 1000) % 10**9}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (int(r["window_start"].timestamp()), r["event_type"]): r["n_events"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r["event_type"] != "zz_sentinel"
    }

    # batch replay model of the two-watermark semantics
    expected: dict[tuple[int, str], int] = {}
    maxes: list[int] = []  # max event time per processed batch
    for k, rows in enumerate(files):
        # late-event filter: previous batch's watermark = max over
        # batches 0..k-2, minus delay (None before any commit cycle)
        wm_late = max(maxes[: k - 1]) - delay_s if k >= 2 else None
        for _, ts, t in rows:
            w_start = ts // win_s * win_s
            if wm_late is not None and w_start + win_s <= wm_late:
                continue  # late beyond watermark: dropped
            if t != "zz_sentinel":
                k2 = (w_start, t)
                expected[k2] = expected.get(k2, 0) + 1
        maxes.append(max(ts for _, ts, _ in rows))
    assert got == expected


# --- nested schema evolution: model-based property -----------------------
#
# A random subsequence of nested evolution ops (rename/widen/add/drop on
# struct-in-array and plain-struct fields) applied to a versioned table
# must leave read() equal to a plain-Python model of the same ops applied
# to the original rows: renames carry values, widens keep them, adds read
# NULL for pre-existing rows, drops disappear. Exercises the dotted-path
# mutators and the by-nested-fid read projection as one system.

_EVOLUTION_OPS = [
    ("rename", "s.a", "a2"),
    ("widen", "s.c", "bigint"),
    ("add", "s.d", "string"),
    ("drop", "s.b", None),
    ("rename", "arr.element.x", "xx"),
    ("add", "arr.element.z", "boolean"),
    ("drop", "arr.element.y", None),
]


@given(st.sets(st.sampled_from(range(len(_EVOLUTION_OPS)))))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_nested_evolution_matches_model(spark, tmp_path_factory, picks):
    from news_lakehouse_spark.sources.transaction import (
        VersionedParquetTable,
    )

    ops = [_EVOLUTION_OPS[i] for i in sorted(picks)]
    base = tmp_path_factory.mktemp("nested_prop")
    t = VersionedParquetTable(spark, str(base / "t"))
    df = spark.sql(
        "SELECT k, named_struct('a', CAST(k AS INT), 'b', concat('b', k),"
        " 'c', CAST(k*10 AS INT)) AS s,"
        " array(named_struct('x', CAST(k AS INT), 'y', concat('y', k)))"
        " AS arr FROM VALUES (1), (2), (3) AS v(k)"
    )
    t.merge(df, ["k"])

    # python model of the same rows
    model = {
        k: {
            "s": {"a": k, "b": f"b{k}", "c": k * 10},
            "arr": [{"x": k, "y": f"y{k}"}],
        }
        for k in (1, 2, 3)
    }

    def model_apply(op, path, arg):
        top, *rest = path.split(".")
        for row in model.values():
            targets = (
                [row["s"]] if top == "s"
                else row["arr"]  # rest[0] == 'element'
            )
            leaf = rest[-1]
            for tgt in targets:
                if op == "rename":
                    tgt[arg] = tgt.pop(leaf)
                elif op == "add":
                    tgt[leaf] = None
                elif op == "drop":
                    tgt.pop(leaf)
                # widen keeps values

    for op, path, arg in ops:
        if op == "rename":
            t.rename_column(path, arg)
        elif op == "widen":
            t.widen_column(path, arg)
        elif op == "add":
            t.add_column(path, arg)
        elif op == "drop":
            t.drop_column(path, None)
        model_apply(op, path, arg)

    got = {
        r["k"]: {
            "s": r["s"].asDict(),
            "arr": [e.asDict() for e in r["arr"]],
        }
        for r in t.read().collect()
    }
    assert got == model
