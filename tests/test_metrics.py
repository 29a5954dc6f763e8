"""Metrics hooks (C4) and retry wrapper (C3)."""
from __future__ import annotations

import logging

import pytest

from news_lakehouse_spark.metrics import (
    JobMetrics,
    pipeline_metrics,
    run_with_metrics,
    with_retry,
)


def test_pipeline_metrics_success_and_records():
    got: list[JobMetrics] = []
    with pipeline_metrics("job_a", sink=got.append, layer="silver") as m:
        m.records = 42
    assert len(got) == 1
    m = got[0]
    assert m.job_name == "job_a" and m.success and m.records == 42
    assert m.labels == {"layer": "silver"}
    assert m.duration_s >= 0


def test_pipeline_metrics_reports_failure_then_reraises():
    got: list[JobMetrics] = []
    with pytest.raises(ValueError):
        with pipeline_metrics("job_b", sink=got.append):
            raise ValueError("boom")
    assert len(got) == 1 and not got[0].success


def test_run_with_metrics_extractor_errors_are_swallowed():
    got: list[JobMetrics] = []
    result = run_with_metrics(
        "job_c",
        lambda x: x * 2,
        21,
        records_extractor=lambda r: 1 / 0,
        sink=got.append,
    )
    assert result == 42
    assert got[0].success and got[0].records is None


def test_with_retry_recovers_then_gives_up(caplog):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    with caplog.at_level(logging.WARNING, logger="news_lakehouse_spark.metrics"):
        assert with_retry(flaky, attempts=3, wait_s=0.0, retry_on=(OSError,)) == "ok"
    assert calls["n"] == 3

    def always_bad():
        raise OSError("permanent")

    with pytest.raises(OSError, match="permanent"):
        with_retry(always_bad, attempts=2, wait_s=0.0, retry_on=(OSError,))

    # non-retryable exception types propagate immediately
    calls["n"] = 0

    def wrong_type():
        calls["n"] += 1
        raise KeyError("nope")

    with pytest.raises(KeyError):
        with_retry(wrong_type, attempts=3, wait_s=0.0, retry_on=(OSError,))
    assert calls["n"] == 1
