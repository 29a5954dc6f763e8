"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``news_lakehouse_spark.queries``; this module
stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the serving flat view
    rolled up to (region, month) — scan → 3 broadcast joins → agg →
    sort, the gold-layer shape of the reference pipeline."""
    from news_lakehouse_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    o = read_table(spark, sf, "orders")
    c = read_table(spark, sf, "customer")
    n = read_table(spark, sf, "nation")
    r = read_table(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.date_trunc("month", "o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("region", "order_month")
    )


def _last_verified_rounds() -> dict[str, int]:
    """query name -> newest round with a GREEN driver CORRECTNESS row
    (0 = never verified). Read from the committed CORRECTNESS_r*.json
    files, so the ordering below is deterministic per round."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2
    (+ extensions), ordered STALEST-FIRST: the driver oracle-checks
    only the first 50 entries per round, so rotating never-verified
    queries first and then by oldest green round guarantees every
    query re-verifies on a bounded cadence instead of the head of the
    registry monopolizing the window."""
    from news_lakehouse_spark.queries import QUERIES

    last = _last_verified_rounds()
    names = list(QUERIES)
    order = sorted(range(len(names)), key=lambda i: (last.get(names[i], 0), i))
    return {names[i]: QUERIES[names[i]] for i in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted keys are rows-only checks."""
    from news_lakehouse_spark.queries import ORACLES

    return dict(ORACLES)
