"""Bench a subset of queries with bench.py's exact methodology
(noop sink over every column, min over N runs, BENCH_LEAN set).

Usage: python tools/minibench.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_RUNS (5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    os.environ["SPARK_GRAFT_BENCH_LEAN"] = "1"
    from news_lakehouse_spark.queries import PHASE_TIMINGS, QUERIES
    from news_lakehouse_spark.session import build_session

    spark = build_session("minibench")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(256, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, "id long"
    ).count()
    out = {}
    for name in names:
        best = float("inf")
        QUERIES[name](spark, sf_dir).count()  # warm
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: min of {runs} runs {best:.3f}s", file=sys.stderr)
    print(json.dumps({"queries": out, "phases": PHASE_TIMINGS}))


if __name__ == "__main__":
    main()
