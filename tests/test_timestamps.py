"""D1-D3 parsing semantics, incl. parity with a faithful
re-implementation of the reference's Python UDF
(_normalize_vn_datetime_str, gcs_bronze_to_silver.py:163-211)."""

from __future__ import annotations

import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from news_lakehouse_spark.functions.timestamps import (
    normalize_vn_datetime,
    parse_epoch,
    parse_timestamp_any,
)

# faithful port of the reference UDF (for parity testing only — the
# engine itself uses the native expression in normalize_vn_datetime)
_WEEKDAY_RE = re.compile(
    r"^\s*(?:th(?:ứ|u)\s*(?:hai|ba|t(?:ư|u)|n(?:ă|a)m|s(?:á|a)u|b(?:ả|a)y)|ch(?:ủ|u)\s*nh(?:ậ|a)t)\s*,\s*",
    flags=re.IGNORECASE,
)
_GMT_RE = re.compile(
    r"\(?\s*gmt\s*([+-])\s*(\d{1,2})(?::\s*(\d{2}))?\s*\)?", flags=re.IGNORECASE
)


def reference_udf(s):
    if not s:
        return None
    txt = str(s).strip()
    txt = _WEEKDAY_RE.sub("", txt)
    tz = "+00:00"
    m = _GMT_RE.search(txt)
    if m:
        sign = m.group(1) or "+"
        hh = int(m.group(2))
        mm = m.group(3) or "00"
        tz = f"{sign}{hh:02d}:{mm}"
        txt = _GMT_RE.sub("", txt)
    txt = re.sub(r",\s*", " ", txt, count=1)
    txt = txt.replace(",", " ").strip()
    m = re.search(r"(\d{1,2})/(\d{1,2})/(\d{4})\s+(\d{1,2}):(\d{2})", txt)
    if not m:
        return None
    d, mo, year, hh, mi = (
        int(m.group(1)),
        int(m.group(2)),
        m.group(3),
        int(m.group(4)),
        m.group(5),
    )
    return f"{d:02d}/{mo:02d}/{year} {hh:02d}:{mi} {tz}"


VN_CASES = [
    "Thứ sáu, 10/10/2025, 14:27 (GMT+7)",
    "Chủ nhật, 1/2/2025, 09:05 (GMT+7)",
    "thu hai, 03/04/2024, 23:59 (GMT-3)",
    "10/10/2025, 14:27",
    "10/10/2025 14:27",
    "02/03/2024 10:11:22",
    "5/6/2024, 7:08 GMT+5:30",
    "garbage",
    "2024-01-01T00:00:00",
    "",
    None,
]


def test_vn_normalizer_parity(spark):
    df = spark.createDataFrame([(c,) for c in VN_CASES], ["s"])
    got = [
        r["norm"]
        for r in df.select(normalize_vn_datetime("s").alias("norm")).collect()
    ]
    expected = []
    for c in VN_CASES:
        e = reference_udf(c)
        # native form doesn't zero-pad d/m (parser is pad-insensitive);
        # compare after parsing both through the same strptime
        expected.append(e)
    for raw, g, e in zip(VN_CASES, got, expected):
        if e is None:
            assert g is None, f"{raw!r}: native={g!r}, udf=None"
        else:
            assert g is not None, f"{raw!r}: native=None, udf={e!r}"
            fmt = "%d/%m/%Y %H:%M %z"

            def norm_parse(x):
                d, t, tz = x.split(" ")
                dd, mm, yy = d.split("/")
                return datetime.strptime(
                    f"{int(dd):02d}/{int(mm):02d}/{yy} {t} {tz}", fmt
                )

            assert norm_parse(g) == norm_parse(e), f"{raw!r}: {g!r} vs {e!r}"


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1700000000", datetime(2023, 11, 14, 22, 13, 20)),
        # millis: reference truncates to whole seconds (b2s:538-546)
        ("1700000000999", datetime(2023, 11, 14, 22, 13, 20)),
        ("9999999999", datetime(2286, 11, 20, 17, 46, 39)),
        ("garbage", None),
        ("12345678901234", None),  # >13 digits → not an epoch
    ],
)
def test_epoch_disambiguation(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], ["s"])
    got = df.select(parse_epoch("s").alias("ts")).collect()[0]["ts"]
    assert got == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("2024-01-02T03:04:05+00:00", datetime(2024, 1, 2, 3, 4, 5)),
        ("2024-01-02T03:04:05.123Z", datetime(2024, 1, 2, 3, 4, 5, 123000)),
        ("2024-01-02T03:04:05", datetime(2024, 1, 2, 3, 4, 5)),
        # VN path: seconds dropped, +00:00 default
        ("02/03/2024 10:11:22", datetime(2024, 3, 2, 10, 11)),
        ("Thứ sáu, 10/10/2025, 14:27 (GMT+7)", datetime(2025, 10, 10, 7, 27)),
        ("1700000000", datetime(2023, 11, 14, 22, 13, 20)),
        ("not a date", None),
    ],
)
def test_full_cascade(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], ["s"])
    got = df.select(parse_timestamp_any("s").alias("ts")).collect()[0]["ts"]
    assert got == expected
