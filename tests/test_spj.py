"""Storage-partitioned join: shuffle-free when bucket specs align,
transparent Catalyst fallback when they don't, identical semantics
either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_lakehouse_spark.operators.spj import storage_partitioned_join
from news_lakehouse_spark.sources.transaction import VersionedParquetTable


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def _orders(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("ok"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(40))).alias("ck"),
        (F.col("id") * 3 + 1).cast("double").alias("price"),
    )


def _custs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("ck"),
        F.concat(F.lit("cust#"), F.col("id")).alias("name"),
        (F.col("id") % 5).cast("int").alias("segment"),
    )


@pytest.fixture()
def tables(spark, tmp_path):
    lt = VersionedParquetTable(spark, str(tmp_path / "orders"))
    rt = VersionedParquetTable(spark, str(tmp_path / "custs"))
    lt.write(_orders(spark), partition_by=["bucket(4, ck)"])
    rt.write(_custs(spark), partition_by=["bucket(4, ck)"])
    return lt, rt


def _no_exchange(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan


def test_spj_inner_matches_catalyst_and_never_shuffles(spark, tables):
    lt, rt = tables
    st = {}
    out = storage_partitioned_join(lt, rt, [("ck", "ck")], stats=st)
    assert st["strategy"] == "spj" and st["n_buckets"] == 4
    exp = _orders(spark).alias("l").join(
        _custs(spark).alias("r"), "ck", "inner"
    ).select("ok", "ck", "price", "name", "segment")
    got = out.select("ok", "ck", "price", "name", "segment")
    assert _rows(got) == _rows(exp)
    assert _no_exchange(out), "SPJ join plan must carry zero exchanges"
    # filter + projection on top stay exchange-free too (the query shape
    # x_bucket_join asserts in-plan)
    sliced = out.filter(F.col("segment") == 2).select("ok", "name")
    assert _no_exchange(sliced)
    assert _rows(sliced) == _rows(
        exp.filter(F.col("segment") == 2).select("ok", "name")
    )


def test_spj_left_join_null_fills(spark, tmp_path):
    lt = VersionedParquetTable(spark, str(tmp_path / "l"))
    rt = VersionedParquetTable(spark, str(tmp_path / "r"))
    lt.write(_orders(spark), partition_by=["bucket(4, ck)"])
    # right side covers only half the key space -> unmatched left rows
    rt.write(
        _custs(spark).filter(F.col("ck") < 20),
        partition_by=["bucket(4, ck)"],
    )
    st = {}
    out = storage_partitioned_join(
        lt, rt, "ck", how="left", stats=st
    )
    assert st["strategy"] == "spj"
    exp = _orders(spark).join(
        _custs(spark).filter(F.col("ck") < 20), "ck", "left"
    ).select(*out.columns)
    assert _rows(out) == _rows(exp)
    assert _no_exchange(out)


def test_spj_column_pruning_and_key_pairs(spark, tmp_path):
    lt = VersionedParquetTable(spark, str(tmp_path / "l"))
    rt = VersionedParquetTable(spark, str(tmp_path / "r"))
    lt.write(_orders(spark), partition_by=["bucket(8, ck)"])
    rt.write(
        _custs(spark).withColumnRenamed("ck", "cust_id"),
        partition_by=["bucket(8, cust_id)"],
    )
    st = {}
    out = storage_partitioned_join(
        lt,
        rt,
        [("ck", "cust_id")],
        left_columns=["ok", "ck"],
        right_columns=["name"],
        stats=st,
    )
    assert st["strategy"] == "spj"
    assert out.columns == ["ok", "ck", "name"]
    exp = (
        _orders(spark)
        .join(
            _custs(spark).withColumnRenamed("ck", "cust_id"),
            F.col("ck") == F.col("cust_id"),
        )
        .select("ok", "ck", "name")
    )
    assert _rows(out) == _rows(exp)
    assert _no_exchange(out)


def test_spj_fallbacks_keep_semantics(spark, tmp_path):
    # 1) bucket counts differ
    lt = VersionedParquetTable(spark, str(tmp_path / "l1"))
    rt = VersionedParquetTable(spark, str(tmp_path / "r1"))
    lt.write(_orders(spark), partition_by=["bucket(4, ck)"])
    rt.write(_custs(spark), partition_by=["bucket(8, ck)"])
    st = {}
    out = storage_partitioned_join(lt, rt, "ck", stats=st)
    assert st["strategy"] == "shuffle" and "differ" in st["reason"]
    exp = _orders(spark).join(_custs(spark), "ck").select(*out.columns)
    assert _rows(out) == _rows(exp)

    # 2) no bucket transform on the join key
    lt2 = VersionedParquetTable(spark, str(tmp_path / "l2"))
    rt2 = VersionedParquetTable(spark, str(tmp_path / "r2"))
    lt2.write(_orders(spark))
    rt2.write(_custs(spark), partition_by=["bucket(4, ck)"])
    st = {}
    out2 = storage_partitioned_join(lt2, rt2, "ck", stats=st)
    assert st["strategy"] == "shuffle"
    assert _rows(out2) == _rows(exp)

    # 3) pending MOR deletes on one side
    lt3 = VersionedParquetTable(spark, str(tmp_path / "l3"))
    rt3 = VersionedParquetTable(spark, str(tmp_path / "r3"))
    lt3.write(_orders(spark), partition_by=["bucket(4, ck)"])
    rt3.write(_custs(spark), partition_by=["bucket(4, ck)"])
    rt3.delete_keys(spark.createDataFrame([(3,)], "ck bigint"), ["ck"])
    st = {}
    out3 = storage_partitioned_join(lt3, rt3, "ck", stats=st)
    assert st["strategy"] == "shuffle" and "delete" in st["reason"]
    exp3 = (
        _orders(spark)
        .join(_custs(spark).filter(F.col("ck") != 3), "ck")
        .select(*out3.columns)
    )
    assert _rows(out3) == _rows(exp3)

    # 4) a live file written before the bucket spec
    lt4 = VersionedParquetTable(spark, str(tmp_path / "l4"))
    rt4 = VersionedParquetTable(spark, str(tmp_path / "r4"))
    lt4.write(_orders(spark))  # unpartitioned first commit
    lt4.set_partition_spec(["bucket(4, ck)"])
    lt4.append(_orders(spark).withColumn("ok", F.col("ok") + 1000))
    rt4.write(_custs(spark), partition_by=["bucket(4, ck)"])
    st = {}
    out4 = storage_partitioned_join(lt4, rt4, "ck", stats=st)
    assert st["strategy"] == "shuffle" and "predates" in st["reason"]
    both = _orders(spark).unionByName(
        _orders(spark).withColumn("ok", F.col("ok") + 1000)
    )
    assert _rows(out4) == _rows(
        both.join(_custs(spark), "ck").select(*out4.columns)
    )


def test_spj_predicate_pushdown_both_paths(spark, tables):
    lt, rt = tables
    lp = [("price", ">", 300.0)]
    rp = [("segment", "in", [1, 3]), ("ck", "between", (5, 35))]
    exp = (
        _orders(spark)
        .filter(F.col("price") > 300.0)
        .join(
            _custs(spark).filter(
                F.col("segment").isin(1, 3) & F.col("ck").between(5, 35)
            ),
            "ck",
        )
        .select("ok", "ck", "price", "name", "segment")
    )
    st = {}
    out = storage_partitioned_join(
        lt, rt, "ck", left_predicate=lp, right_predicate=rp, stats=st
    )
    assert st["strategy"] == "spj"
    got = out.select("ok", "ck", "price", "name", "segment")
    assert _rows(got) == _rows(exp)
    assert _no_exchange(out)

    # left join: the right predicate filters BEFORE the join, so rows
    # matching the key but failing the predicate null-fill
    st = {}
    outl = storage_partitioned_join(
        lt, rt, "ck", how="left", right_predicate=rp, stats=st
    )
    expl = _orders(spark).join(
        _custs(spark).filter(
            F.col("segment").isin(1, 3) & F.col("ck").between(5, 35)
        ),
        "ck",
        "left",
    ).select(*outl.columns)
    assert _rows(outl) == _rows(expl)

    # same predicates through the fallback path match too
    rt8 = VersionedParquetTable(spark, rt.path + "_n8")
    rt8.write(_custs(spark), partition_by=["bucket(8, ck)"])
    st = {}
    outf = storage_partitioned_join(
        lt, rt8, "ck", left_predicate=lp, right_predicate=rp, stats=st
    )
    assert st["strategy"] == "shuffle"
    assert _rows(outf.select("ok", "ck", "price", "name", "segment")) == _rows(exp)

    with pytest.raises(ValueError, match="unsupported predicate"):
        storage_partitioned_join(
            lt, rt, "ck", left_predicate=[("price", "like", "x")]
        )


def test_spj_rejects_ambiguous_and_bad_args(spark, tables):
    lt, rt = tables
    with pytest.raises(ValueError, match="how"):
        storage_partitioned_join(lt, rt, "ck", how="full")
    with pytest.raises(ValueError, match="unknown"):
        storage_partitioned_join(lt, rt, [("ck", "nope")])
    lt2 = VersionedParquetTable(lt.spark, lt.path)
    with pytest.raises(ValueError, match="ambiguous"):
        # both sides carry a non-key overlapping name when joining a
        # table to itself without column selections
        storage_partitioned_join(lt2, lt2, "ck")


def test_spa_matches_catalyst_and_never_shuffles(spark, tmp_path):
    from news_lakehouse_spark.operators.spj import storage_partitioned_agg

    t = VersionedParquetTable(spark, str(tmp_path / "t"))
    df = _orders(spark).withColumn(
        # null prices + a null grouping key: Spark keeps null groups,
        # counts must skip null values
        "price",
        F.when(F.col("ok") % 7 == 0, None).otherwise(F.col("price")),
    ).withColumn(
        "ck", F.when(F.col("ok") % 31 == 0, None).otherwise(F.col("ck"))
    )
    t.write(df, partition_by=["bucket(4, ck)"])
    st = {}
    out = storage_partitioned_agg(
        t,
        ["ck"],
        {
            "n": (None, "count"),
            "n_price": ("price", "count"),
            "total": ("price", "sum"),
            "hi": ("price", "max"),
            "lo": ("price", "min"),
            "mean": ("price", "avg"),
        },
        stats=st,
    )
    assert st["strategy"] == "spa" and st["n_buckets"] == 4
    exp = df.groupBy("ck").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("price").alias("n_price"),
        F.sum("price").alias("total"),
        F.max("price").alias("hi"),
        F.min("price").alias("lo"),
        F.avg("price").alias("mean"),
    )
    # count_distinct: exact per bucket (groups never span buckets) and
    # null-excluding, matching F.count_distinct
    std = {}
    outd = storage_partitioned_agg(
        t, ["ck"], {"d": ("price", "count_distinct")}, stats=std
    )
    assert std["strategy"] == "spa"
    assert _rows(outd) == _rows(
        df.groupBy("ck").agg(F.count_distinct("price").alias("d"))
    )
    r = lambda d: sorted(
        (
            (x[0], x[1], x[2], None if x[3] is None else round(x[3], 6),
             x[4], x[5], None if x[6] is None else round(x[6], 6))
            for x in (tuple(row) for row in d.collect())
        ),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    assert r(out) == r(exp)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # multi-column grouping (bucket col + another) stays bucket-local
    st = {}
    out2 = storage_partitioned_agg(
        t, ["ck", "ok"], {"n": (None, "count")}, stats=st
    )
    assert st["strategy"] == "spa"
    exp2 = df.groupBy("ck", "ok").agg(F.count(F.lit(1)).alias("n"))
    assert _rows(out2) == _rows(exp2)

    # predicate filters before aggregation on both paths
    st = {}
    out3 = storage_partitioned_agg(
        t, ["ck"], {"total": ("price", "sum")},
        predicate=[("price", ">", 100.0)], stats=st,
    )
    assert st["strategy"] == "spa"
    exp3 = (
        df.filter(F.col("price") > 100.0)
        .groupBy("ck").agg(F.sum("price").alias("total"))
    )
    assert _rows(out3) == _rows(exp3)

    # fallback: grouping on a non-bucketed column
    st = {}
    out4 = storage_partitioned_agg(
        t, ["ok"], {"n": (None, "count")}, stats=st
    )
    assert st["strategy"] == "shuffle"
    assert _rows(out4) == _rows(
        df.groupBy("ok").agg(F.count(F.lit(1)).alias("n"))
    )

    with pytest.raises(ValueError, match="fn must be"):
        storage_partitioned_agg(t, ["ck"], {"x": ("price", "median")})
    with pytest.raises(ValueError, match="unknown"):
        storage_partitioned_agg(t, ["nope"], {"n": (None, "count")})
