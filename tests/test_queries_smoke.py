"""Smoke: every driver query runs at sf0.001 with a stable schema, and
entry() returns rows. The full oracle comparison lives in
tools/verify_oracle.py (run at sf0.01)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_all_queries_run(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
