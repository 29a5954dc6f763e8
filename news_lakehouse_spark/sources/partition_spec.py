"""Hidden partitioning: Iceberg-style partition TRANSFORMS.

The reference pipeline partitions its silver tables by raw columns
(``gcs_bronze_to_silver.py`` partitionBy on publish date); Hive-style
identity partitioning makes the USER responsible for deriving and
filtering the partition column — the classic ``WHERE date(ts) = …``
full-scan footgun. Iceberg's answer is hidden partitioning: the table
SPEC declares a transform of a source column (``days(ts)``,
``bucket(16, id)``), writes derive the partition value automatically,
and scan planning derives partition pruning from predicates on the
RAW column — queries never mention the partition field at all.

This module is the transform vocabulary for
``VersionedParquetTable``'s partition specs. A spec entry is either a
plain column name (identity) or a transform string::

    ["o_orderstatus", "days(o_orderdate)", "bucket(8, o_custkey)",
     "truncate(4, o_clerk)"]

Transforms (names follow Iceberg; singular aliases accepted):

===============  ======================  ==========================
spec entry       partition field name    value
===============  ======================  ==========================
``col``          ``col``                 the column value
``years(c)``     ``c_year``              ``year(c)`` (int)
``months(c)``    ``c_month``             ``'yyyy-MM'`` string
``days(c)``      ``c_day``               ``'yyyy-MM-dd'`` string
``hours(c)``     ``c_hour``              ``'yyyy-MM-dd-HH'`` string
``bucket(n,c)``  ``c_bucket<n>``         ``pmod(xxhash64(c), n)``
``truncate(w,c)``  ``c_trunc<w>``        ints: ``c - pmod(c, w)``;
                                         strings: ``substring(c,1,w)``

Parameterized transforms carry the param in the field name so that a
``set_partition_spec`` changing only the param (``bucket(8,c)`` →
``bucket(16,c)``) can never alias old-param path segments into
new-param fragment tests — files written under a different param keep
a differently-named segment and are pruned conservatively (kept).
===============  ======================  ==========================

``bucket`` uses Spark's ``xxhash64`` (not Iceberg's murmur3): values
hash identically across this engine's write path, bloom sidecars and
driver-side probes (``_spark_hashes``), which is the property pruning
needs; cross-ENGINE layout compatibility is explicitly not a goal.

Scale notes: every transform is a pure whole-stage-codegen expression
(no UDF, no shuffle beyond the write's own partitioning); time
transforms render as zero-padded strings so LEXICAL order equals
chronological order — that is what lets scan planning turn a raw
``BETWEEN`` on the source column into a fragment-string range test
without parsing dates (``fragment_tests``). ``truncate`` on ints and
``years`` compare numerically.
"""

from __future__ import annotations

import re
from typing import Callable, NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PartitionField",
    "parse_partition_spec",
    "field_expr",
    "spec_exprs",
    "fragment_tests",
]

_TRANSFORM_RE = re.compile(r"^\s*(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)\s*$")

_SUFFIX = {
    "years": "year",
    "months": "month",
    "days": "day",
    "hours": "hour",
    "bucket": "bucket",
    "truncate": "trunc",
}
_ALIASES = {"year": "years", "month": "months", "day": "days", "hour": "hours"}
_NEEDS_PARAM = {"bucket", "truncate"}


class PartitionField(NamedTuple):
    """One parsed spec entry. ``name`` is the partition field name
    (path segment ``__p_<name>=…`` and key in partition dicts /
    filters); ``source`` the data column it derives from."""

    spec: str        # original spec string, stored in the manifest
    name: str        # derived field name, e.g. "o_orderdate_day"
    source: str      # source data column
    transform: str   # identity | years | months | days | hours | bucket | truncate
    param: int | None


def parse_partition_spec(spec: list[str] | None) -> list[PartitionField]:
    """Parse manifest/user spec strings; identity entries pass through
    (full backward compatibility with plain-column specs)."""
    fields: list[PartitionField] = []
    for s in spec or []:
        m = _TRANSFORM_RE.match(s)
        if not m:
            fields.append(PartitionField(s, s.strip(), s.strip(), "identity", None))
            continue
        t, param, col = m.group(1).lower(), m.group(2), m.group(3)
        t = _ALIASES.get(t, t)
        if t not in _SUFFIX:
            raise ValueError(
                f"unknown partition transform {m.group(1)!r} in {s!r}; "
                f"supported: {sorted(_SUFFIX)} (+ singular aliases)"
            )
        if t in _NEEDS_PARAM:
            if param is None:
                raise ValueError(f"{t} needs a width/count: {t}(N, col)")
            if int(param) < 1:
                raise ValueError(f"{t} width/count must be >= 1: {s!r}")
        elif param is not None:
            raise ValueError(f"{m.group(1)} takes one column argument: {s!r}")
        # Parameterized transforms encode the param in the field name
        # (bucket(8,c) -> c_bucket8, truncate(100,k) -> k_trunc100):
        # after a set_partition_spec that changes only the param, old
        # files keep segments derived under the OLD param, and a
        # same-named segment would let fragment tests compare new-param
        # test values against old-param derivations (silent wrong
        # pruning / missed merge overlap).  Distinct names make the
        # fragment matcher treat old-spec files conservatively (absent
        # segment = keep), which is always correct.
        suffix = _SUFFIX[t] + (param or "")
        fields.append(
            PartitionField(
                s, f"{col}_{suffix}", col, t,
                int(param) if param else None,
            )
        )
    names = [f.name for f in fields]
    if len(set(names)) != len(names):
        raise ValueError(f"partition spec has duplicate field names: {names}")
    return fields


def field_expr(f: PartitionField, dtype=None) -> Column:
    """The transform as a codegen expression over the source column.
    ``dtype`` (the source column's Spark type) is required only for
    ``truncate``, which is width-prefix on strings and
    floor-to-multiple on integers."""
    c = F.col(f.source)
    if f.transform == "identity":
        return c
    if f.transform == "years":
        return F.year(c)
    if f.transform == "months":
        return F.date_format(c, "yyyy-MM")
    if f.transform == "days":
        return F.date_format(c, "yyyy-MM-dd")
    if f.transform == "hours":
        return F.date_format(c, "yyyy-MM-dd-HH")
    if f.transform == "bucket":
        return F.pmod(F.xxhash64(c), F.lit(f.param))
    if f.transform == "truncate":
        tag = dtype.typeName() if dtype is not None else "string"
        if tag in ("byte", "short", "integer", "long"):
            return c - F.pmod(c, F.lit(f.param))
        if tag == "string":
            return F.substring(c, 1, f.param)
        raise ValueError(
            f"truncate() supports string and integral columns, not "
            f"{tag} ({f.source})"
        )
    raise AssertionError(f.transform)


def spec_exprs(df: DataFrame, fields: list[PartitionField]) -> list[Column]:
    """Aliased transform expressions for ``df`` — what a write derives
    and what merge's affected-partition probe selects."""
    types = {fld.name: fld.dataType for fld in df.schema.fields}
    out = []
    for f in fields:
        if f.source not in types:
            raise ValueError(
                f"partition spec entry {f.spec!r}: source column "
                f"{f.source!r} is not in the frame ({list(types)})"
            )
        out.append(field_expr(f, types[f.source]).alias(f.name))
    return out


def _py_transform(f: PartitionField, v):
    """Driver-side twin of ``field_expr`` for time/truncate transforms
    (bucket goes through Spark — see fragment_tests). ``v`` is a
    predicate value (datetime/date/str/int)."""
    if f.transform == "years":
        return v.year if hasattr(v, "year") else int(str(v)[:4])
    if f.transform == "months":
        return str(v)[:7]
    if f.transform == "days":
        return str(v)[:10]
    if f.transform == "hours":
        if hasattr(v, "strftime"):
            return v.strftime("%Y-%m-%d-%H")
        return str(v)[:13].replace(" ", "-").replace("T", "-")
    if f.transform == "truncate":
        if isinstance(v, str):
            return v[: f.param]
        return v - (v % f.param)  # Python % is non-negative for w > 0
    raise AssertionError(f.transform)


_MONOTONE = {"years", "months", "days", "hours", "truncate"}


def fragment_tests(
    fields: list[PartitionField],
    predicate: list[tuple],
    hash_values: Callable[[str, list], list],
) -> list[tuple[str, Callable]]:
    """Derive fragment-level pruning tests from predicates on RAW
    source columns — the hidden-partitioning payoff: ``WHERE ts
    BETWEEN a AND b`` prunes ``days(ts)`` directories without the
    query (or the stats) ever mentioning the partition field.

    Returns ``[(field_name, test(frag_value_str) -> bool), ...]``; a
    file survives only if every test passes on its fragment value for
    that field (files lacking the segment — older spec — are kept by
    the caller, same conservative rule as ``_frag_matches``).

    Monotone transforms (time + truncate) map ``= in between < <= >
    >=`` to range tests on the RENDERED value (lexical for the
    zero-padded string forms, numeric for years/int-truncate);
    inequalities widen to the containing partition (< v → <= T(v)),
    conservative by construction. ``bucket`` derives equality/IN only,
    via ``hash_values`` (the table's Spark-typed xxhash64 probe, so
    driver and writer hash identically).
    """
    by_source: dict[str, list[PartitionField]] = {}
    for f in fields:
        if f.transform != "identity":
            by_source.setdefault(f.source, []).append(f)
    tests: list[tuple[str, Callable]] = []
    for col, op, value in predicate:
        for f in by_source.get(col, []):
            numeric = f.transform == "years" or (
                f.transform == "truncate" and not isinstance(
                    (value[0] if isinstance(value, (list, tuple)) else value),
                    str,
                )
            )

            def cast(s, numeric=numeric):
                return int(s) if numeric else s

            if f.transform == "bucket":
                if op in ("=", "==", "in"):
                    vals = list(value) if op == "in" else [value]
                    hs = [h for h in hash_values(col, vals) if h is not None]
                    want = {str(h % f.param) for h in hs}
                    if want:
                        tests.append((f.name, lambda s, w=want: s in w))
                continue
            if f.transform not in _MONOTONE:
                continue
            try:
                if op in ("=", "=="):
                    t = _py_transform(f, value)
                    tests.append((f.name, lambda s, t=t, c=cast: c(s) == t))
                elif op == "in":
                    ts = {_py_transform(f, v) for v in value}
                    tests.append((f.name, lambda s, ts=ts, c=cast: c(s) in ts))
                elif op == "between":
                    lo, hi = (_py_transform(f, value[0]),
                              _py_transform(f, value[1]))
                    tests.append(
                        (f.name, lambda s, lo=lo, hi=hi, c=cast: lo <= c(s) <= hi)
                    )
                elif op in ("<", "<="):
                    hi = _py_transform(f, value)
                    tests.append((f.name, lambda s, hi=hi, c=cast: c(s) <= hi))
                elif op in (">", ">="):
                    lo = _py_transform(f, value)
                    tests.append((f.name, lambda s, lo=lo, c=cast: c(s) >= lo))
            except (TypeError, ValueError):
                continue  # underivable value shape → no pruning, never wrong
    return tests
