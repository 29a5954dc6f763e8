"""Property-based tests (hypothesis): batched per example-set so each
hypothesis example costs one Spark job over a small DataFrame, not a
job per value."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from news_lakehouse_spark.functions.timestamps import parse_epoch, parse_timestamp_any

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# epoch seconds between 1990 and 2100 (the 10-digit regime), and the
# same instants as 13-digit millis
_epoch_s = st.integers(min_value=631_152_000, max_value=4_102_444_800)


@given(st.lists(_epoch_s, min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_epoch_seconds_and_millis_agree(spark, xs):
    df = spark.createDataFrame(
        [(str(x), str(x * 1000)) for x in xs], "s string, ms string"
    )
    out = df.select(
        parse_epoch("s").alias("from_s"), parse_epoch("ms").alias("from_ms")
    ).collect()
    for x, r in zip(xs, out):
        assert r["from_s"] == r["from_ms"], x
        assert r["from_s"] == dt.datetime.utcfromtimestamp(x), x


@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2099, 12, 31)
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_cascade_parses_iso_strings(spark, ts):
    ts = [t.replace(microsecond=0) for t in ts]
    df = spark.createDataFrame(
        [(t.strftime("%Y-%m-%dT%H:%M:%S"),) for t in ts], "raw string"
    )
    out = df.select(parse_timestamp_any("raw").alias("p")).collect()
    for t, r in zip(ts, out):
        assert r["p"] == t, t


@given(st.lists(st.text(alphabet="abcdefgh ", min_size=0, max_size=40), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_word_count_nonnegative_and_bounded(spark, texts):
    from news_lakehouse_spark.functions.text import word_count

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(F.col("text"), word_count("text").alias("wc")).collect()
    for r in out:
        # reference semantics: size(split('', ' ')) == 1 — word_count of
        # whitespace-only text is 1, never 0 (SURVEY §7 edge note)
        assert 1 <= r["wc"] <= len(r["text"]) + 1
