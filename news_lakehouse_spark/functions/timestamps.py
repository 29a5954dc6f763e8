"""Timestamp parsing kit — the reference's dirtiest semantics, native.

Reference parity (SURVEY §2.7 D1-D4):
- D1 multi-format cascade: coalesce of to_timestamp over ~10 formats
  (ISO with/without millis/offset/'Z', dd/MM/yyyy variants, bare
  fallback) — gcs_bronze_to_silver.py:548-561.
- D2 epoch disambiguation: digit strings ≤13 chars are epochs;
  values > 9_999_999_999 are milliseconds (divide by 1000), else
  seconds — gcs_bronze_to_silver.py:538-546.
- D3 Vietnamese datetime normalizer — THE ONLY PYTHON UDF IN THE
  REFERENCE (gcs_bronze_to_silver.py:163-211): strips the Vietnamese
  weekday prefix ("Thứ sáu, ..."), converts "(GMT+7)" to a "+07:00"
  offset, reformats to dd/MM/yyyy HH:mm +HH:MM. We re-express it with
  built-in regexp/format expressions so it stays JVM-side and
  codegen-able — at 100 TB a per-row Python UDF on the ingest path is
  the single worst serialization tax, so eliminating it is the point.
  A UDF-parity test (tests/test_timestamps.py) pins equivalence.

All parsers use try_to_timestamp semantics (NULL on mismatch, never
fail the job) to match PERMISSIVE ingest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# D1 cascade formats, most-specific first (reference order b2s:548-560).
TS_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "dd/MM/yyyy HH:mm:ss XXX",
    "dd/MM/yyyy HH:mm XXX",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _attempt_guard(c: Column, fmt: str) -> Column | None:
    """A NECESSARY condition for ``fmt`` to parse ``c`` — a cheap
    contains() on a literal the pattern requires verbatim. When the
    guard is false the parse attempt *provably* returns NULL, so
    skipping it is result-identical; when true the attempt runs
    unchanged. This turns the 12-branch cascade's worst case (a row
    paying every failed DateTimeFormatter parse) into at most the
    attempts whose separator family matches the string.

    Guard soundness assumption (advice r11): every quoted ``'T'`` and
    every bare ``/`` or ``-`` separator appearing in a pattern is
    treated as MANDATORY in the input — true for all of Spark's
    current datetime pattern grammar (separators outside [a-zA-Z] are
    literal and never optional). A caller-supplied format whose
    separator could legally be absent from a parseable input (no such
    pattern exists today) must not be routed through this guard."""
    if "'T'" in fmt:
        return c.contains("T")  # literal 'T' must appear in the input
    if "/" in fmt:
        return c.contains("/")  # literal '/' must appear
    if "-" in fmt:
        return c.contains("-")  # literal '-' must appear
    return None


def parse_timestamp_formats(col: Column | str, formats: tuple[str, ...] = TS_FORMATS) -> Column:
    """D1: first format that parses wins; bare to_timestamp as fallback.

    Each attempt is wrapped in a literal-separator guard
    (:func:`_attempt_guard`): a false guard yields NULL exactly like
    the failed parse it replaces, so the coalesce result is
    bit-identical while a typical dirty row now runs 1-6 real parse
    attempts instead of up to 12 (tests/test_timestamps.py pins
    cascade semantics; the D1 oracle pins it end-to-end).
    """
    c = _c(col)
    attempts = []
    for f in formats:
        att = F.try_to_timestamp(c, F.lit(f))
        g = _attempt_guard(c, f)
        attempts.append(F.when(g, att) if g is not None else att)
    attempts.append(F.try_to_timestamp(c))
    return F.coalesce(*attempts)


def parse_epoch(col: Column | str) -> Column:
    """D2: epoch-second vs epoch-millisecond disambiguation.

    A string of ≤13 chars castable to BIGINT is an epoch; values above
    9_999_999_999 are milliseconds. Reference parity (b2s:538-546):
    the millis branch divides by 1000 and CASTS TO LONG before
    from_unixtime, so sub-second precision is intentionally dropped —
    every epoch parse lands on a whole second.
    """
    c = _c(col)
    as_long = c.try_cast("bigint")
    is_epoch = as_long.isNotNull() & (F.length(F.trim(c)) <= 13)
    seconds = F.when(
        as_long > F.lit(9_999_999_999), (as_long / 1000).cast("long")
    ).otherwise(as_long)
    return F.when(is_epoch, F.timestamp_seconds(seconds)).otherwise(
        F.lit(None).cast("timestamp")
    )


# --- D3: Vietnamese datetime normalizer, UDF-free ------------------------
#
# Reference UDF contract (_normalize_vn_datetime_str, b2s:170-208):
# - strip an optional Vietnamese weekday prefix ("Thứ sáu,", "Chủ nhật,")
# - a GMT marker ("(GMT+7)", "gmt-3:30", parens optional) becomes the
#   offset; DEFAULT offset when absent is +00:00
# - then match d/M/yyyy + H:mm anywhere in the remainder — SECONDS ARE
#   NOT CAPTURED and are dropped
# - output 'dd/MM/yyyy HH:mm +HH:MM'; None when no date+time match.

# commas count as separators: the UDF rewrites ',' → ' ' before matching
_DT_RE = r"(\d{1,2}/\d{1,2}/\d{4})[,\s]+(\d{1,2}:\d{2})"
_TZ_SIGN_RE = r"(?i)\(?\s*gmt\s*([+-])\s*\d{1,2}(?::\s*\d{2})?\s*\)?"
_TZ_HH_RE = r"(?i)\(?\s*gmt\s*[+-]\s*(\d{1,2})(?::\s*\d{2})?\s*\)?"
_TZ_MM_RE = r"(?i)\(?\s*gmt\s*[+-]\s*\d{1,2}:\s*(\d{2})\s*\)?"


def normalize_vn_datetime(col: Column | str) -> Column:
    """Rewrite 'Thứ sáu, 10/10/2025, 14:27 (GMT+7)' → '10/10/2025 14:27 +07:00'.

    Native regexp/format chain replacing the reference's Python UDF
    (gcs_bronze_to_silver.py:163-211) — JVM-side, codegen-able, no
    per-row Python. tests/test_timestamps.py pins parity against a
    faithful re-implementation of the UDF.
    """
    c = _c(col)
    # strip the GMT marker first so the d/M/yyyy H:mm search sees the
    # same remainder the UDF sees
    stripped = F.regexp_replace(c, _TZ_SIGN_RE.replace("([+-])", "[+-]"), " ")
    date_part = F.regexp_extract(stripped, _DT_RE, 1)
    time_part = F.regexp_extract(stripped, _DT_RE, 2)
    sign = F.regexp_extract(c, _TZ_SIGN_RE, 1)
    tz_hh = F.regexp_extract(c, _TZ_HH_RE, 1).try_cast("int")
    tz_mm = F.regexp_extract(c, _TZ_MM_RE, 1)
    offset = F.when(
        tz_hh.isNotNull(),
        F.concat(
            sign,
            F.format_string("%02d", tz_hh),
            F.lit(":"),
            F.when(F.length(tz_mm) > 0, tz_mm).otherwise(F.lit("00")),
        ),
    ).otherwise(F.lit("+00:00"))  # reference default (b2s:181)
    ok = (F.length(date_part) > 0) & (F.length(time_part) > 0)
    return F.when(ok, F.concat_ws(" ", date_part, time_part, offset))


def parse_vn_datetime(col: Column | str) -> Column:
    """Normalize then parse (d/M/yyyy H:mm with explicit offset)."""
    norm = normalize_vn_datetime(col)
    return F.try_to_timestamp(norm, F.lit("d/M/yyyy H:mm XXX"))


def parse_timestamp_any(col: Column | str) -> Column:
    """Full reference cascade: epoch → VN normalized → format cascade.

    Mirrors publish_raw_norm/publish_ts derivation
    (gcs_bronze_to_silver.py:528-561): epoch strings first, then the
    Vietnamese normalizer, then the multi-format cascade.
    """
    c = _c(col)
    # The VN normalizer's match requires a d/M/yyyy group, so a string
    # without '/' can never produce a non-NULL parse — guard the whole
    # 6-regex branch behind one contains() (result-identical: NULL
    # either way; the GMT strip replaces with ' ', never inserts '/').
    vn = F.when(c.contains("/"), parse_vn_datetime(c))
    return F.coalesce(parse_epoch(c), vn, parse_timestamp_formats(c))
