"""Declarative data-quality expectations (dbt-test / Deequ-style gate).

The reference enforces quality inline (mandatory-field gates P4,
key-completeness P6 before every MERGE); this generalizes those into a
declarative rule set evaluated in ONE aggregate pass:

    rules = [not_null("o_orderkey"), unique(["o_orderkey"]),
             in_range("o_totalprice", 0, None),
             accepted_values("o_orderstatus", ["O", "F", "P"])]
    report = validate_expectations(df, rules)   # rule → violation count

Row-level rules compile to sum(CASE WHEN violated) columns inside a
single groupBy().agg() — one scan, map-side partial aggregation, no
per-rule jobs (Deequ's core trick). Uniqueness is the exception: it
needs a groupBy on the key, so each unique() rule adds one keyed
aggregation whose shuffle carries only the key columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # "row" | "unique"
    violated: Column | None = None  # row-level predicate (true == bad)
    key_cols: tuple[str, ...] = ()


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "row", F.col(col).isNull())


def non_blank(col: str) -> Rule:
    c = F.col(col)
    return Rule(
        f"non_blank({col})", "row", c.isNull() | (F.trim(c) == "")
    )


def in_range(col: str, lo=None, hi=None) -> Rule:
    c = F.col(col)
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (c < lo)
    if hi is not None:
        bad = bad | (c > hi)
    # null passes range checks — pair with not_null to reject nulls
    return Rule(f"in_range({col})", "row", c.isNotNull() & bad)


def accepted_values(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(
        f"accepted_values({col})", "row", c.isNotNull() & ~c.isin(values)
    )


def matches_regex(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(
        f"matches_regex({col})", "row", c.isNotNull() & ~c.rlike(pattern)
    )


def unique(key_cols: list[str]) -> Rule:
    return Rule(f"unique({','.join(key_cols)})", "unique", None, tuple(key_cols))


def validate_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, violations) — one row per rule, violation row counts.

    All row-level rules share a single aggregate scan; each unique()
    rule adds one key-only groupBy (duplicate rows counted in excess of
    the first occurrence, dbt-style).
    """
    row_rules = [r for r in rules if r.kind == "row"]
    uniq_rules = [r for r in rules if r.kind == "unique"]
    parts: list[DataFrame] = []
    if row_rules:
        agg = df.agg(
            *[
                # coalesce: sum over an empty frame is NULL, not 0
                F.coalesce(F.sum(F.when(r.violated, 1).otherwise(0)), F.lit(0))
                .cast("long")
                .alias(f"c{i}")
                for i, r in enumerate(row_rules)
            ]
        )
        stacked = " , ".join(
            f"'{r.name.replace(chr(39), '')}', c{i}" for i, r in enumerate(row_rules)
        )
        parts.append(
            agg.selectExpr(
                f"stack({len(row_rules)}, {stacked}) as (rule, violations)"
            )
        )
    for r in uniq_rules:
        dup = (
            df.groupBy(*r.key_cols)
            .agg(F.count("*").alias("n"))
            .agg(
                F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                .cast("long")
                .alias("violations")
            )
            .select(F.lit(r.name).alias("rule"), "violations")
        )
        parts.append(dup)
    if not parts:
        raise ValueError("no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def enforce(df: DataFrame, rules: list[Rule]) -> None:
    """Hard gate: raise ValueError listing every violated rule.

    The P4/P6-style usage — call before a MERGE to refuse bad batches.
    """
    bad = [
        (r["rule"], r["violations"])
        for r in validate_expectations(df, rules).collect()
        if r["violations"] > 0
    ]
    if bad:
        detail = ", ".join(f"{name}: {n}" for name, n in bad)
        raise ValueError(f"expectations violated — {detail}")
