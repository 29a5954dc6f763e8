"""Job-level profile of one registry query via the Spark event log.

Runs the named query once (noop sink) with the event log enabled,
then prints every Spark job's duration and description — the §1
measurement that shows how many driver actions a table-layer
operation really runs and what each costs.

Usage: python tools/profile_jobs.py <query> [<query>...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_BENCH_LEAN"] = "1"
    log_dir = "/tmp/spark-events-profile"
    import shutil
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    from news_lakehouse_spark.queries import QUERIES
    from news_lakehouse_spark.session import build_session

    spark = build_session(
        "profile_jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(256, numPartitions=int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, "id long"
    ).count()

    marks = {}
    for name in sys.argv[1:]:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        marks[name] = (t0 * 1000, time.time() * 1000)
    spark.stop()

    ev_lines = []
    for root, _dirs, names in os.walk(log_dir):
        for n in names:
            if n.startswith(("events", "local-")) or "eventLog" in n or n.endswith(".inprogress") or re.match(r"events_", n):
                ev_lines.append(os.path.join(root, n))
    if not ev_lines:  # fall back: any regular file in the tree
        for root, _dirs, names in os.walk(log_dir):
            ev_lines.extend(os.path.join(root, n) for n in names if not n.startswith("."))
    jobs = {}
    import itertools
    def lines():
        for p in ev_lines:
            with open(p) as fh:
                yield from fh
    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:90]
                    or (ev["Stage Infos"][-1]["Stage Name"][:90] if ev.get("Stage Infos") else ""),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
    for name, (m0, m1) in marks.items():
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("end") and j["start"] >= m0 and j["end"] <= m1 + 500
        ]
        total = sum(j["end"] - j["start"] for _, j in sel) / 1000
        print(f"\n=== {name}: {len(sel)} jobs, {total:.3f}s job time, "
              f"{(m1-m0)/1000:.3f}s wall ===")
        prev_end = m0
        for jid, j in sel:
            gap = (j["start"] - prev_end) / 1000
            dur = (j["end"] - j["start"]) / 1000
            prev_end = j["end"]
            print(f"  job {jid:4d} {dur:7.3f}s (gap {gap:6.3f}s)  {j['desc']}")


if __name__ == "__main__":
    main()
