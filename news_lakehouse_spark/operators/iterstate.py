"""Lineage truncation for iterative operators (PageRank, BFS,
star connected components, propagation): one helper that picks the
right checkpoint flavor for the deployment.

Iterative DataFrame algorithms must materialize each round's state
and CUT the logical plan, or round N's plan embeds rounds 1..N-1 —
exponential plan growth, re-execution on failure, and eventual
analyzer blow-up.  Two ways to cut:

* ``localCheckpoint(eager=True)`` — blocks live in executor
  block-manager storage.  Fast (no DFS round-trip) and right for
  local mode and short jobs, but the blocks are pinned to specific
  executors: ONE executor loss invalidates the checkpoint and kills
  the job.  Not acceptable for a multi-hour 1000-executor run.
* ``checkpoint(eager=True)`` — state lands on the RELIABLE checkpoint
  filesystem (``spark.sparkContext.setCheckpointDir``, typically the
  object store / HDFS).  Each round pays one write+read of the
  node-sized state; in exchange the job survives executor loss and
  dynamic-allocation churn — the 100 TB mode.

``truncate_lineage`` auto-selects: reliable when the session has a
checkpoint dir configured, local otherwise.  Operators need no
flag-plumbing — a cluster job opts in with one line at startup::

    spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")

Results are bit-identical across both modes (pinned by
tests/test_graph.py): checkpointing changes where state is stored,
never its value — the operators' integer arithmetic guarantees the
rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["truncate_lineage"]


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage: reliable
    ``checkpoint`` when the SparkContext has a checkpoint dir,
    ``localCheckpoint`` otherwise (see module docstring)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
