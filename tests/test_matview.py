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


# --- join IVM (IncrementalJoinAggView) ------------------------------------


def _orders_df(spark, rows):
    # (order key, customer key, price)
    return spark.createDataFrame(
        [Row(ok=ok, ck=ck, price=p) for ok, ck, p in rows],
        schema="ok int, ck int, price int",
    )


def _cust_df(spark, rows):
    return spark.createDataFrame(
        [Row(ck=ck, seg=s) for ck, s in rows],
        schema="ck int, seg string",
    )


def _join_full(l, r):
    return (
        l.join(r, on="ck", how="inner")
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("price").alias("sum_price"))
    )


def test_join_ivm_matches_full_recompute(spark, tmp_path):
    from news_lakehouse_spark.operators.matview import IncrementalJoinAggView

    orders = VersionedParquetTable(spark, str(tmp_path / "l"))
    cust = VersionedParquetTable(spark, str(tmp_path / "r"))
    orders.merge(
        _orders_df(spark, [(i, i % 5, 10 * i) for i in range(1, 21)]), ["ok"]
    )
    cust.merge(
        _cust_df(spark, [(c, "AB"[c % 2]) for c in range(5)]), ["ck"]
    )
    view = IncrementalJoinAggView(
        spark, str(tmp_path / "v"), join_keys=["ck"], group_by=["seg"],
        sum_cols=["price"],
    )
    view.refresh(orders, cust)
    assert _rows(view.read().select("seg", "cnt", "sum_price")) == _rows(
        _join_full(orders.read(), cust.read())
    )

    # churn BOTH sides: reprice some orders, move a customer's segment,
    # add a new order for a new customer, delete an order
    orders.merge(
        _orders_df(spark, [(3, 3, 999), (21, 4, 777)]), ["ok"]
    )
    orders.delete_keys(_orders_df(spark, [(7, 2, 0)]).select("ok"), ["ok"])
    cust.merge(_cust_df(spark, [(1, "MOVED")]), ["ck"])
    view.refresh(orders, cust)
    assert _rows(view.read().select("seg", "cnt", "sum_price")) == _rows(
        _join_full(orders.read(), cust.read())
    )
    # refresh recorded both synced versions; a no-op refresh is a no-op
    vv = view.synced_versions()
    assert vv == (orders.latest_version(), cust.latest_version())
    assert view.refresh(orders, cust) == vv


def test_join_ivm_one_sided_churn_and_group_death(spark, tmp_path):
    from news_lakehouse_spark.operators.matview import IncrementalJoinAggView

    orders = VersionedParquetTable(spark, str(tmp_path / "l"))
    cust = VersionedParquetTable(spark, str(tmp_path / "r"))
    orders.merge(_orders_df(spark, [(1, 0, 100), (2, 1, 200)]), ["ok"])
    cust.merge(_cust_df(spark, [(0, "X"), (1, "Y")]), ["ck"])
    view = IncrementalJoinAggView(
        spark, str(tmp_path / "v"), join_keys=["ck"], group_by=["seg"],
        sum_cols=["price"],
    )
    view.refresh(orders, cust)
    # delete the only Y order: group Y must disappear from read()
    orders.delete_keys(_orders_df(spark, [(2, 1, 0)]).select("ok"), ["ok"])
    view.refresh(orders, cust)
    assert _rows(view.read().select("seg", "cnt", "sum_price")) == {
        ("X", 1, 100)
    }
    # right-side-only churn next: move customer 0 into a new segment
    cust.merge(_cust_df(spark, [(0, "Z")]), ["ck"])
    view.refresh(orders, cust)
    assert _rows(view.read().select("seg", "cnt", "sum_price")) == {
        ("Z", 1, 100)
    }


def test_join_ivm_rejects_column_clash(spark, tmp_path):
    from news_lakehouse_spark.operators.matview import IncrementalJoinAggView

    l = VersionedParquetTable(spark, str(tmp_path / "l"))
    r = VersionedParquetTable(spark, str(tmp_path / "r"))
    l.merge(_orders_df(spark, [(1, 0, 1)]), ["ok"])
    r.merge(
        spark.createDataFrame([Row(ck=0, price=5)], "ck int, price int"),
        ["ck"],
    )
    view = IncrementalJoinAggView(
        spark, str(tmp_path / "v"), join_keys=["ck"], group_by=["price"],
    )
    with pytest.raises(ValueError, match="both sides"):
        view.refresh(l, r)
