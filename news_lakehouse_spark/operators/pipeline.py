"""End-to-end corpus curation pipeline as ONE composed plan.

The stages a pretraining-data pipeline chains — term-blocklist gate,
quality-rule gate, exact near-identity dedup — composed the way they
must be composed at 100 TB: every per-row signal (blocklist hits,
quality metrics, content fingerprint) evaluates in a SINGLE scan of
the corpus, and the only shuffle in the whole pipeline is the
fingerprint-partitioned window that elects dedup survivors. Running
the stages as separate passes joined back on doc id — the naive
composition — would scan the corpus three times and shuffle it twice
more for the joins.

Drop accounting is per-stage (blocked / drop_reason / is_dup), the
way curation pipelines report their funnel (cf. C4, RefinedWeb,
Gopher's rule tables). Dedup runs AFTER the gates (standard order:
cheap row-local filters shrink the corpus before the shuffle), and a
document only counts as a duplicate against other GATE-SURVIVING
documents — the survivor election uses a gate-conditional min over
each fingerprint group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_lakehouse_spark.operators.dedupe import normalized_text
from news_lakehouse_spark.operators.textmetrics import (
    blocklist_hits,
    corpus_drop_reason_column,
    quality_metric_columns,
)


def corpus_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: list[str],
) -> DataFrame:
    """Per-document funnel verdicts for the curation pipeline.

    Output: (id_col, blocked, drop_reason, is_dup, final_kept) —
    ``blocked`` if the normalized token set intersects ``blocklist``;
    ``drop_reason`` the first failing quality rule (null if none);
    ``is_dup`` if an earlier gate-surviving doc shares the content
    fingerprint; ``final_kept`` if all three stages pass.
    """
    blocked = (blocklist_hits(text_col, blocklist) > 0).cast("int")
    metrics = quality_metric_columns(text_col)
    row = df.select(
        F.col(id_col),
        blocked.alias("blocked"),
        *[c.alias(name) for name, c in metrics.items()],
        F.sha2(normalized_text(text_col), 256).alias("__fp"),
    ).withColumn("drop_reason", corpus_drop_reason_column())

    eligible = (F.col("blocked") == 0) & F.col("drop_reason").isNull()
    survivor = F.min(F.when(eligible, F.col(id_col))).over(
        Window.partitionBy("__fp")
    )
    return row.select(
        id_col,
        "blocked",
        "drop_reason",
        (eligible & (F.col(id_col) != survivor)).cast("int").alias("is_dup"),
        (eligible & (F.col(id_col) == survivor)).cast("int").alias("final_kept"),
    )
