"""Incremental gold refresh — delta-driven star-schema maintenance.

The reference rebuilds every gold table from all of silver each run
(gcs_silver_to_gold.py full refresh). At 100 TB that is the single
most expensive nightly job in the pipeline, and its cost is O(corpus)
regardless of how little changed. This module is the scale path the
reference lacks: given the silver delta of one ingest batch, refresh
gold in O(delta).

Semantics per table kind:

- Article-scoped facts (publication, keyword, reference, comment
  activity, interaction detail): DELETE-AND-INSERT scoped to the
  changed articles. Upsert alone is wrong for child-grain facts — an
  article whose keyword was REMOVED would keep the stale
  (article, keyword) row; deleting the changed articles' whole fact
  slice first makes the refresh idempotent and removal-correct.
- Dimensions: rebuilt from the delta and MERGEd by natural key
  (insert-or-update); dims here are pure functions of the natural key
  so rows for unchanged members are untouched. dim_date is
  insert-only (calendar attributes never change).

Equivalence contract (pinned by tests/test_incremental.py):
incremental refresh after each batch == full rebuild over the union,
because a bronze batch always carries the complete state of every
article it mentions (the same property the silver MERGE relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_lakehouse_spark.functions.keys import surrogate_key_safe
from news_lakehouse_spark.operators.merge import upsert_parquet_table
from news_lakehouse_spark.plans.gold import (
    build_gold_dimensions,
    build_gold_facts,
)

#: merge keys per gold table
FACT_KEYS: dict[str, list[str]] = {
    "fact_article_publication": ["ArticleKey"],
    "fact_article_keyword": ["ArticleKey", "KeywordKey"],
    "fact_article_reference": ["ArticleKey", "ReferenceSourceKey"],
    "fact_top_comment_activity": ["CommentKey"],
    "fact_top_comment_interaction_detail": ["CommentInteractionKey"],
}
#: the column scoping each fact to its article slice
FACT_SCOPE: dict[str, str] = {
    "fact_article_publication": "ArticleKey",
    "fact_article_keyword": "ArticleKey",
    "fact_article_reference": "ArticleKey",
    "fact_top_comment_activity": "ArticleKey",
    "fact_top_comment_interaction_detail": "ArticleKey",
}
DIM_KEYS: dict[str, list[str]] = {
    "dim_date": ["DateKey"],
    "dim_author": ["AuthorKey"],
    "dim_topic": ["TopicKey"],
    "dim_sub_topic": ["SubTopicKey"],
    "dim_keyword": ["KeywordKey"],
    "dim_reference_source": ["ReferenceSourceKey"],
    "dim_interaction_type": ["InteractionTypeKey"],
}


def _replace_scope(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    scope_col: str,
    scope_keys: DataFrame,
) -> None:
    """Delete target rows whose ``scope_col`` is in ``scope_keys``,
    then insert ``source``. The scope side broadcasts (it is the
    changed-article set — delta-sized), so the target is one anti-join
    scan, never shuffled on its own size."""
    from news_lakehouse_spark.operators.merge import path_exists

    if path_exists(spark, path):
        # a real read/analysis failure must PROPAGATE: swallowing it
        # would overwrite the accumulated table with just this delta
        target = spark.read.parquet(path)
        kept = target.join(
            F.broadcast(scope_keys.withColumnRenamed(scope_keys.columns[0], scope_col)),
            scope_col,
            "left_anti",
        )
        merged = kept.unionByName(source)
    else:  # first run — nothing to scope out
        merged = source
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)


def refresh_gold_incremental(
    spark: SparkSession,
    silver_delta: dict[str, DataFrame],
    gold_root: str,
) -> dict[str, int]:
    """Refresh all gold tables from one batch's silver delta.

    Returns rows written per table (the delta sizes — a metrics hook
    caller can log them). ``silver_delta`` must carry the complete
    silver state of every article it mentions, which is exactly what
    streaming/ingest.py's per-batch build_silver_tables produces.
    """
    from news_lakehouse_spark.metrics import pipeline_metrics

    written: dict[str, int] = {}
    changed_articles = (
        silver_delta["articles"]
        .select(surrogate_key_safe("ArticleID").alias("ArticleKey"))
        .distinct()
    )

    # metrics mirror the reference's per-ETL wrapper
    # (airflow/config/metrics_utils.py:9-55): one timed record per gold
    # table plus one for the whole refresh, row counts attached from
    # the count the write already needed — never a second pass.
    with pipeline_metrics("refresh_gold_incremental") as whole:
        dims = build_gold_dimensions(silver_delta)
        for name, df in dims.items():
            with pipeline_metrics(f"gold_{name}", table=name) as m:
                # checkpoint once: the write and the row-count metric
                # share one computation of the delta transformation
                staged = df.localCheckpoint(eager=True)
                upsert_parquet_table(
                    spark,
                    staged,
                    f"{gold_root}/{name}",
                    keys=DIM_KEYS[name],
                    insert_only=(name == "dim_date"),
                )
                written[name] = m.records = staged.count()

        facts = build_gold_facts(silver_delta)
        for name, df in facts.items():
            with pipeline_metrics(f"gold_{name}", table=name) as m:
                staged = df.localCheckpoint(eager=True)
                _replace_scope(
                    spark,
                    staged,
                    f"{gold_root}/{name}",
                    FACT_SCOPE[name],
                    changed_articles,
                )
                written[name] = m.records = staged.count()
        whole.records = sum(written.values())
    return written
