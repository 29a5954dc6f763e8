"""Text scalar functions.

Reference parity:
- P3 blank normalization: when(length(trim(c))>0, trim(c)) else NULL
  (gcs_bronze_to_silver.py:263-264,300,521-522).
- F7 word count: size(split(regexp_replace(content, '\\s+', ' '), ' '))
  (gcs_silver_to_gold.py:585-588). Note the reference edge case kept
  for fidelity: the empty string counts as 1 "word"
  (size(split("", " ")) == 1) — documented in SURVEY §7.
- M1 read-time estimate: words / 220.0 (gcs_silver_to_gold.py:593-595).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORDS_PER_MINUTE = 220.0


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_blank(col: Column | str) -> Column:
    """Trim; empty/whitespace-only → NULL."""
    t = F.trim(_c(col))
    return F.when(F.length(t) > 0, t).otherwise(F.lit(None))


def word_count(col: Column | str) -> Column:
    """Whitespace word count (reference semantics, '' → 1)."""
    return F.size(F.split(F.regexp_replace(_c(col), r"\s+", " "), " "))


def read_time_minutes(col: Column | str, wpm: float = WORDS_PER_MINUTE) -> Column:
    """Estimated read time in minutes (DOUBLE)."""
    return word_count(col) / F.lit(wpm)
