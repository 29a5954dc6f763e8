"""Key / identity functions.

Reference parity (SURVEY §1.3):
- Silver natural-key hashing: sha2-256 of trimmed text, composites
  joined with "||" (gcs_bronze_to_silver.py:294-301, 343-347).
- Gold surrogate keys: xxhash64(naturalKey) → BIGINT
  (gcs_silver_to_gold.py:400,422,448-449,...).
- "Full-safe" variant: NULL/blank natural keys map to the sentinel -1
  (gcs_silver_to_gold_1.py:99-103,692-706).
- Int date key y*10000 + m*100 + d (gcs_silver_to_gold.py:95-97).

All built-in JVM expressions — no Python in the hot path; content-hash
keys parallelize embarrassingly and never need a global id service,
which is what makes them the right identity scheme at 100 TB.

Note (kept for fidelity, documented as in SURVEY §1.3): xxhash64 can in
principle emit -1 for a real key, colliding with the sentinel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _trimmed(cols: tuple[Column | str, ...]) -> list[Column]:
    return [F.trim(F.col(c) if isinstance(c, str) else c) for c in cols]


def sha2_prefix_long(src: Column, n_hex: int) -> Column:
    """First ``n_hex`` hex chars of sha2-256 parsed as a long.

    THE engine-portable hash idiom of this package (DuckDB twin:
    ``CAST('0x' || substr(sha256(x), 1, n) AS BIGINT)`` or strpos
    nibble arithmetic). One definition so the portability contract —
    and any fix to it — lives in one place; callers build their own
    source encoding (salts/separators) and keep n_hex ≤ 15 so the
    parse stays inside a signed 64-bit long.
    """
    if n_hex > 15:
        raise ValueError("n_hex must be <= 15 to fit a signed long")
    return F.conv(F.substring(F.sha2(src, 256), 1, n_hex), 16, 10).cast("long")


def sha2_key(*cols: Column | str, sep: str = "||") -> Column:
    """Content-hash id: sha2-256 hex of trimmed parts joined by ``sep``."""
    parts = _trimmed(cols)
    src = parts[0] if len(parts) == 1 else F.concat_ws(sep, *parts)
    return F.sha2(src, 256)


def surrogate_key(*cols: Column | str) -> Column:
    """Gold surrogate key: xxhash64 of the natural key columns."""
    return F.xxhash64(*_trimmed(cols))


def surrogate_key_safe(*cols: Column | str, sentinel: int = -1) -> Column:
    """xxhash64 surrogate key mapping NULL/blank natural keys to -1."""
    parts = _trimmed(cols)
    blank = None
    for p in parts:
        cond = p.isNull() | (F.length(p) == 0)
        blank = cond if blank is None else (blank | cond)
    return F.when(blank, F.lit(sentinel).cast("long")).otherwise(F.xxhash64(*parts))


def date_key(d: Column | str, sentinel: int = -1) -> Column:
    """yyyymmdd INT key; NULL date → sentinel (full-safe variant)."""
    col = F.col(d) if isinstance(d, str) else d
    key = (F.year(col) * 10000 + F.month(col) * 100 + F.dayofmonth(col)).cast("int")
    return F.when(col.isNull(), F.lit(sentinel)).otherwise(key)
