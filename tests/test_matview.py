"""Incremental materialized aggregate views (operators/matview.py).

The contract under test is EQUIVALENCE: after any sequence of source
commits, an incrementally-refreshed view must equal a from-scratch
aggregate of the source's live snapshot — including SQL null
semantics for sum/avg and min/max survival under deletes (the
rescan-affected-groups rule). The reference's gold layer recomputes
these aggregates from the full corpus every run
(gcs_silver_to_gold.py); the view refreshes in O(churn).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from news_lakehouse_spark.operators.matview import IncrementalAggView
from news_lakehouse_spark.sources.transaction import VersionedParquetTable


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, g=g, v=v) for k, g, v in rows],
        schema="k int, g string, v int",
    )


def _full(df):
    return df.groupBy("g").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("v").alias("sum_v"),
        F.avg("v").alias("avg_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def pair(spark, tmp_path):
    src = VersionedParquetTable(spark, str(tmp_path / "src"))
    view = IncrementalAggView(
        spark,
        str(tmp_path / "view"),
        group_by=["g"],
        sum_cols=["v"],
        minmax_cols=["v"],
    )
    return src, view


def _assert_converged(src, view):
    got = _rows(
        view.read().select(
            "g", "cnt", "sum_v", "avg_v", "min_v", "max_v"
        )
    )
    want = _rows(
        _full(src.read()).select(
            "g", "cnt", "sum_v", "avg_v", "min_v", "max_v"
        )
    )
    assert got == want


def test_full_build_then_incremental_refresh(spark, pair):
    src, view = pair
    src.merge(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]), ["k"])
    assert view.refresh(src) == 1
    _assert_converged(src, view)

    # update (2: 20->99), insert (4), cross-group move (3: b->a)
    src.merge(_df(spark, [(2, "a", 99), (4, "b", 7), (3, "a", 5)]), ["k"])
    assert view.refresh(src) == 2
    _assert_converged(src, view)
    # the refresh commit is a MERGE on the view table, not a rebuild
    assert view.table.history()[-1]["operation"] == "merge"


def test_delete_rescans_minmax_and_zero_groups_vanish(spark, pair):
    src, view = pair
    src.merge(
        _df(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 1)]),
        ["k"],
    )
    view.refresh(src)
    # delete the current max of 'a' AND all of 'b'
    src.delete_keys(spark.createDataFrame([Row(k=3), Row(k=4)]))
    view.refresh(src)
    _assert_converged(src, view)
    got = {r["g"]: (r["min_v"], r["max_v"]) for r in view.read().collect()}
    assert got == {"a": (10, 20)}  # max fell back to 20; 'b' gone

    # revival of a dead group starts clean (no stale extrema)
    src.merge(_df(spark, [(5, "b", 42)]), ["k"])
    view.refresh(src)
    _assert_converged(src, view)
    assert {r["g"] for r in view.read().collect()} == {"a", "b"}


def test_null_measures_keep_sql_semantics(spark, pair):
    src, view = pair
    src.merge(
        _df(spark, [(1, "a", None), (2, "a", 6), (3, "c", None)]), ["k"]
    )
    view.refresh(src)
    _assert_converged(src, view)
    # delete the only non-null value of 'a' -> sum/avg revert to NULL
    src.delete_keys(spark.createDataFrame([Row(k=2)]))
    view.refresh(src)
    _assert_converged(src, view)
    a = {r["g"]: r for r in view.read().collect()}
    assert a["a"]["cnt"] == 1 and a["a"]["sum_v"] is None
    assert a["c"]["sum_v"] is None and a["c"]["avg_v"] is None


def test_refresh_is_idempotent_and_noop_on_synced(spark, pair):
    """Crash-retry contract: the sync cursor rides the refresh commit
    itself, so re-refreshing at the same source version is a no-op and
    never double-applies a delta."""
    src, view = pair
    src.merge(_df(spark, [(1, "a", 10)]), ["k"])
    view.refresh(src)
    src.merge(_df(spark, [(2, "a", 30)]), ["k"])
    v_after = view.refresh(src)
    history_len = len(view.table.versions())
    assert view.refresh(src) == v_after  # already synced
    assert len(view.table.versions()) == history_len  # no new commit
    _assert_converged(src, view)
    assert view.synced_version() == src.latest_version()


def test_view_is_itself_versioned(spark, pair):
    """The view is a VersionedParquetTable: time travel + its own
    change feed work, so downstreams can follow the VIEW
    incrementally."""
    src, view = pair
    src.merge(_df(spark, [(1, "a", 10), (2, "b", 1)]), ["k"])
    view.refresh(src)
    src.merge(_df(spark, [(3, "a", 20)]), ["k"])
    view.refresh(src)
    # v1 of the view still shows the old aggregate
    old = {r["g"]: r["cnt"] for r in view.read(version=1).collect()}
    assert old == {"a": 1, "b": 1}
    feed = view.table.changes(1)
    # only group 'a' changed between view versions
    assert {r["g"] for r in feed.collect()} == {"a"}
