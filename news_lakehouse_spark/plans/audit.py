"""Plan-audit helpers: capture and summarize AQE final physical plans.

`explain("formatted")` on an executed AQE query prints the Final Plan
tree, the Initial Plan tree, then one details block per operator id
(both trees' ids mixed). The audit keeps only operators reachable from
the Final Plan tree, so counts reflect what actually ran after runtime
re-optimization.
"""

from __future__ import annotations

import contextlib
import io
import re


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def final_plan_blocks(plan: str) -> list[str]:
    """Operator-details blocks belonging to the (AQE) final plan."""
    details_start = re.search(r"\n\n\(\d+\) ", plan)
    tree = plan[: details_start.start()] if details_start else plan
    details = plan[details_start.start() :] if details_start else ""
    if "== Final Plan ==" in tree:
        tree = tree.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    ids = set(re.findall(r"\((\d+)\)", tree))
    blocks = re.split(r"\n(?=\(\d+\) )", details)
    out = []
    for b in blocks:
        m = re.match(r"\((\d+)\) ", b)
        if m and (not ids or m.group(1) in ids):
            out.append(b)
    return out


def audit_plan(plan: str) -> dict:
    blocks = final_plan_blocks(plan)
    heads = [b.splitlines()[0] for b in blocks]

    def count(op_pattern: str) -> int:
        return sum(1 for h in heads if re.match(rf"\(\d+\) (?:{op_pattern})\b", h))

    scan_blocks = [b for b in blocks if re.match(r"\(\d+\) Scan parquet", b)]
    pushed = [
        m.group(1)
        for b in scan_blocks
        for m in [re.search(r"PushedFilters: \[([^\]]*)\]", b)]
        if m
    ]
    read_schemas = [
        m.group(1)
        for b in scan_blocks
        for m in [re.search(r"ReadSchema: struct<([^>]*)>", b)]
        if m
    ]
    return {
        "exchanges": count("Exchange"),
        "bhj": count("BroadcastHashJoin"),
        "smj": count("SortMergeJoin"),
        "nlj": count("BroadcastNestedLoopJoin|CartesianProduct"),
        "codegen_spans": len(
            set(
                m.group(1)
                for h in heads
                for m in [re.search(r"\[codegen id : (\d+)\]", h)]
                if m
            )
        ),
        "python_ops": count(
            "ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas"
            "|FlatMapGroupsInPandasWithState|PythonMapInArrow"
        ),
        "scans": len(scan_blocks),
        "scans_with_pushdown": sum(1 for p in pushed if p.strip()),
        "read_cols": [len([c for c in s.split(",") if c]) for s in read_schemas],
    }
