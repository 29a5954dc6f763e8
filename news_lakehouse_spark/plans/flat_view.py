"""Serving flat view (reference S14: vw_articles_flat, g2bq:185-209).

fact_article_publication LEFT JOIN dim_author / dim_topic /
dim_sub_topic — the one denormalized table a BI tool reads. All three
dim joins broadcast (dims are orders of magnitude smaller than the
fact at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def articles_flat_view(
    fact_article_publication: DataFrame,
    dim_author: DataFrame,
    dim_topic: DataFrame,
    dim_sub_topic: DataFrame,
) -> DataFrame:
    f = fact_article_publication
    return (
        f.join(
            F.broadcast(dim_author.select("AuthorKey", "AuthorName")),
            "AuthorKey",
            "left",
        )
        .join(
            F.broadcast(dim_topic.select("TopicKey", "TopicName")), "TopicKey", "left"
        )
        .join(
            F.broadcast(dim_sub_topic.select("SubTopicKey", "SubTopicName")),
            "SubTopicKey",
            "left",
        )
        .select(
            "Article_NK",
            "PublicationDateKey",
            "PublicationHour",
            "AuthorName",
            "TopicName",
            "SubTopicName",
            "OpinionCount",
            "WordCount",
            "CharacterCount",
            "EstimatedReadTimeMinutes",
            "KeywordCount",
            "ReferenceCount",
        )
    )
