"""Capture `.explain("formatted")` for named queries into plans/r12/ (default).

Usage:
    python tools/capture_plans.py <suffix> <query> [<query> ...]

Writes plans/r12/<query>_<suffix>.txt (suffix = "before" | "after").
Each query is executed first so the captured plan is the AQE FINAL
plan (same convention as tools/explain_audit.py / PLANS.md).

Run from the tree whose code should be captured (a worktree at the
pre-change commit for "before", the working tree for "after").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_lakehouse_spark.plans.audit import formatted_plan  # noqa: E402
from news_lakehouse_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "plans", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    from news_lakehouse_spark.session import build_session

    spark = build_session("capture_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        df.collect()  # AQE final plan
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain(formatted), AQE final plan, "
                     f"sf_dir={sf_dir}\n\n")
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
