"""Per-method wall-clock profiler for the table-layer query paths.

Wraps the expensive VersionedParquetTable methods (and a few module
functions) with timers, runs the named registry queries once each
(noop sink), and prints cumulative seconds + call counts per method —
the measurement step (guide §1) for deciding where the per-commit /
per-feed constants actually go.

Usage: python tools/profile_methods.py x_cdc_replicate x_ivm_refresh
"""

from __future__ import annotations

import functools
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC: dict[str, list] = defaultdict(lambda: [0.0, 0])
STACK: list[str] = []


def wrap(cls, name):
    fn = getattr(cls, name)

    @functools.wraps(fn)
    def timed(*a, **kw):
        label = f"{cls.__name__}.{name}" if hasattr(cls, "__name__") else name
        STACK.append(label)
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            STACK.pop()
            ACC[label][0] += dt
            ACC[label][1] += 1
            # exclusive-ish: charge parents nothing extra (we print
            # inclusive; nesting is visible from the method names)

    setattr(cls, name, timed)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_BENCH_LEAN"] = "1"
    from news_lakehouse_spark.queries import QUERIES
    from news_lakehouse_spark.session import build_session
    from news_lakehouse_spark.sources import transaction as tx
    from news_lakehouse_spark.operators import matview

    T = tx.VersionedParquetTable
    for m in [
        "changes",
        "changes_plan",
        "merge",
        "delete_keys",
        "apply_changes",
        "write",
        "append",
        "_write_commit",
        "_collect_stats",
        "_commit",
        "_publish",
        "_enforce_constraints",
        "read",
        "_read_files",
        "mirror_evolution_from",
    ]:
        wrap(T, m)
    for m in ["refresh", "_apply_delta"]:
        wrap(matview.IncrementalAggView, m)
    for m in ["refresh", "_pruned_read"]:
        wrap(matview.IncrementalJoinAggView, m)

    spark = build_session("profile")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(256, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, "id long"
    ).count()

    for name in sys.argv[1:]:
        ACC.clear()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        total = time.perf_counter() - t0
        print(f"\n=== {name}: {total:.3f}s total ===")
        for label, (sec, cnt) in sorted(
            ACC.items(), key=lambda kv: -kv[1][0]
        ):
            print(f"  {label:45s} {sec:7.3f}s  x{cnt}")


if __name__ == "__main__":
    main()
