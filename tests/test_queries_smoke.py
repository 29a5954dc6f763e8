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


def test_driver_window_covers_unverified_and_rotates_stalest_first():
    """Rotation guard: the driver oracle-checks only the first 50
    queries() entries per round. queries() orders the registry
    stalest-first from the committed CORRECTNESS records, so (a) every
    never-verified query sits inside the window, (b) the window holds
    exactly the least-recently-green queries — no entry outside it is
    staler than one inside — and (c) with a 50/round window nothing can
    strand unverified behind the head (this re-opened in round 3 when
    new queries were appended behind a fixed window)."""
    registry = list(entrymod.queries())
    last = entrymod._last_verified_rounds()
    window, rest = registry[:50], registry[50:]
    stranded = [n for n in rest if last.get(n, 0) == 0]
    assert not stranded, (
        "never-verified queries outside the driver window: "
        f"{stranded} — queries() rotation is broken"
    )
    if rest:
        assert max(last.get(n, 0) for n in window) <= min(
            last.get(n, 0) for n in rest
        ), "window is not the stalest-50 prefix"
        assert len(set(window)) == 50
    # Surface long-stale queries: with rotation and a ~150-query
    # registry, nothing should go more than ceil(N/50)=3 full rounds
    # without a green driver row once it has had one window slot.
    current = max(last.values(), default=0)
    overdue = [
        n
        for n in rest
        if 0 < last.get(n, 0) <= current - 4
    ]
    assert not overdue, (
        f"queries stale more than 3 rounds sit outside the window: {overdue}"
    )
