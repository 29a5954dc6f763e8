"""Capture the COMMIT-INPUT plans of a table-layer query.

The registry row for a CDC/feed query returns a replica aggregate, so
its own `.explain` never shows the change-feed subtree — the plans
that matter are the frames each commit WRITES. This tool monkeypatches
``VersionedParquetTable._write_commit`` to dump every commit input's
formatted plan while the named query runs, concatenated in commit
order.

Usage:
    python tools/capture_apply_plan.py <suffix> <query> [<query>...]

Writes plans/r12/<query>_commits_<suffix>.txt (override the dir with
SPARK_GRAFT_PLANS_DIR). Run from the tree whose code should be
captured (a worktree at the pre-change commit for "before").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r12",
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    os.environ["SPARK_GRAFT_BENCH_LEAN"] = "1"

    from news_lakehouse_spark.plans.audit import formatted_plan
    from news_lakehouse_spark.queries import QUERIES
    from news_lakehouse_spark.session import build_session
    from news_lakehouse_spark.sources import transaction as tx

    plans: list[str] = []
    orig = tx.VersionedParquetTable._write_commit

    def spying(self, df, version, partition_by):
        plans.append(
            f"--- commit v{version} at {os.path.basename(self.path)} "
            f"(partition_by={partition_by}) ---\n"
            + formatted_plan(df)
        )
        return orig(self, df, version, partition_by)

    tx.VersionedParquetTable._write_commit = spying
    spark = build_session("capture_apply_plan")
    for name in names:
        plans.clear()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        path = os.path.join(out_dir, f"{name}_commits_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — explain(formatted) of every commit's WRITE "
                f"input, in commit order, sf_dir={sf_dir}\n\n"
            )
            fh.write("\n\n".join(plans))
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
