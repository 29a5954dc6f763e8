"""Bronze → silver derivations (reference gcs_bronze_to_silver.py).

From one permissively-parsed bronze article DataFrame, derive the 10
silver tables (DDL reference b2s:73-158; derivations b2s:242-387):

entity/dim: authors, topics, subtopics, keywords, references_table
fact:       articles (partitioned by date)
link:       article_keywords, article_references
child:      comments, comment_interactions

Identity is content-hashed (sha2-256 of trimmed natural keys,
composites joined "||" — b2s:294-301,343-347), so every derivation is
embarrassingly parallel: no id service, no global ordering, safe at
100 TB. Each derivation ends with the reference's pre-merge guard
(dropna on keys + dropDuplicates — b2s:426-446).

The row gate (b2s:399-403): rows must have a non-blank url; the
streaming flavor additionally requires a parsed publish_ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_lakehouse_spark.functions.jsonmap import int_map_values, parse_json_map
from news_lakehouse_spark.functions.keys import sha2_key
from news_lakehouse_spark.functions.text import normalize_blank
from news_lakehouse_spark.functions.timestamps import parse_timestamp_any

SILVER_TABLES = (
    "authors",
    "topics",
    "subtopics",
    "keywords",
    "references_table",
    "articles",
    "article_keywords",
    "article_references",
    "comments",
    "comment_interactions",
)


def normalize_bronze(raw: DataFrame, require_ts: bool = False) -> DataFrame:
    """Blank-normalize text fields, parse publish_ts, apply the row gate."""
    df = (
        raw.withColumn("url", normalize_blank("url"))
        .withColumn("title", normalize_blank("title"))
        .withColumn("author", normalize_blank("author"))
        .withColumn("topic", normalize_blank("topic"))
        .withColumn("sub_topic", normalize_blank("sub_topic"))
        .withColumn("publish_ts", parse_timestamp_any("publish_date"))
        .withColumn("date", F.to_date("publish_ts"))
        .withColumn("hour", F.hour("publish_ts"))
    )
    gate = df["url"].isNotNull()
    if require_ts:
        gate = gate & df["publish_ts"].isNotNull()
    return df.filter(gate)


def make_authors(n: DataFrame) -> DataFrame:
    return (
        n.select(F.trim("author").alias("AuthorName"))
        .filter(F.col("AuthorName").isNotNull() & (F.col("AuthorName") != ""))
        .select(sha2_key("AuthorName").alias("AuthorID"), "AuthorName")
        .dropna(subset=["AuthorID"])
        .dropDuplicates(["AuthorID"])
    )


def make_topics(n: DataFrame) -> DataFrame:
    return (
        n.select(F.trim("topic").alias("TopicName"))
        .filter(F.col("TopicName").isNotNull() & (F.col("TopicName") != ""))
        .select(sha2_key("TopicName").alias("TopicID"), "TopicName")
        .dropna(subset=["TopicID"])
        .dropDuplicates(["TopicID"])
    )


def make_subtopics(n: DataFrame) -> DataFrame:
    base = (
        n.select(
            F.trim("sub_topic").alias("SubTopicName"),
            F.trim("topic").alias("TopicName"),
        )
        .filter(F.col("SubTopicName").isNotNull() & (F.col("SubTopicName") != ""))
        .withColumn("TopicID", sha2_key("TopicName"))
        # composite id: sha2(SubTopicName || TopicID) — reference b2s:269
        .withColumn("SubTopicID", sha2_key("SubTopicName", "TopicID"))
    )
    return (
        base.select("SubTopicID", "SubTopicName", "TopicID")
        .dropna(subset=["SubTopicID"])
        .dropDuplicates(["SubTopicID"])
    )


def make_keywords(n: DataFrame) -> DataFrame:
    return (
        n.select(F.explode_outer("keywords").alias("kw"))
        .select(normalize_blank("kw").alias("KeywordText"))
        .filter(F.col("KeywordText").isNotNull())
        .select(sha2_key("KeywordText").alias("KeywordID"), "KeywordText")
        .dropDuplicates(["KeywordID"])
    )


def make_references(n: DataFrame) -> DataFrame:
    return (
        n.select(F.explode_outer("references").alias("ref"))
        .select(normalize_blank("ref").alias("ReferenceText"))
        .filter(F.col("ReferenceText").isNotNull())
        .select(sha2_key("ReferenceText").alias("ReferenceID"), "ReferenceText")
        .dropDuplicates(["ReferenceID"])
    )


def make_articles(n: DataFrame) -> DataFrame:
    return (
        n.select(
            sha2_key("url").alias("ArticleID"),
            F.col("title").alias("Title"),
            F.trim("url").alias("URL"),
            F.col("description").alias("Description"),
            F.col("publish_ts").alias("PublicationDate"),
            F.col("main_content").alias("MainContent"),
            F.coalesce(F.col("comment_count").cast("int"), F.lit(0)).alias(
                "OpinionCount"
            ),
            F.when(F.col("author").isNotNull(), sha2_key("author")).alias("AuthorID"),
            F.when(F.col("topic").isNotNull(), sha2_key("topic")).alias("TopicID"),
            # Reference parity (b2s:300-301): concat_ws SKIPS nulls, so a
            # null/blank sub_topic yields sha2(TopicID) — a non-null id
            # with no dim row (gold maps it to the UNKNOWN member) — and
            # null topic too yields sha2(''). Not a bug to fix: matching
            # it keeps silver row-compatible with reference lakes.
            F.sha2(
                F.concat_ws(
                    "||",
                    F.when(
                        F.length(F.trim("sub_topic")) > 0, F.trim("sub_topic")
                    ),
                    F.when(F.col("topic").isNotNull(), sha2_key("topic")),
                ),
                256,
            ).alias("SubTopicID"),
            "date",
            "hour",
        )
        .dropna(subset=["ArticleID"])
        .dropDuplicates(["ArticleID"])
    )


def make_article_keywords(n: DataFrame) -> DataFrame:
    return (
        n.select(sha2_key("url").alias("ArticleID"), F.explode_outer("keywords").alias("kw"))
        .withColumn("kw", normalize_blank("kw"))
        .filter(F.col("kw").isNotNull())
        .select("ArticleID", sha2_key("kw").alias("KeywordID"))
        .dropna(subset=["ArticleID", "KeywordID"])
        .dropDuplicates(["ArticleID", "KeywordID"])
    )


def make_article_references(n: DataFrame) -> DataFrame:
    return (
        n.select(sha2_key("url").alias("ArticleID"), F.explode_outer("references").alias("ref"))
        .withColumn("ref", normalize_blank("ref"))
        .filter(F.col("ref").isNotNull())
        .select("ArticleID", sha2_key("ref").alias("ReferenceID"))
        .dropna(subset=["ArticleID", "ReferenceID"])
        .dropDuplicates(["ArticleID", "ReferenceID"])
    )


def _exploded_comments(n: DataFrame) -> DataFrame:
    return n.select(
        sha2_key("url").alias("ArticleID"),
        F.explode_outer("top_comments").alias("c"),
    ).filter(F.col("c").isNotNull())


def make_comments(n: DataFrame) -> DataFrame:
    c = _exploded_comments(n)
    return (
        c.select(
            # CommentID = sha2(ArticleID || name || content) — b2s:343-347
            # concat_ws skips NULL parts, matching the reference's id
            # contract (b2s:343-347)
            sha2_key(
                F.col("ArticleID"),
                F.col("c.commenter_name"),
                F.col("c.comment_content"),
            ).alias("CommentID"),
            "ArticleID",
            F.trim(F.col("c.commenter_name")).alias("CommenterName"),
            F.col("c.comment_content").alias("CommentContent"),
            F.coalesce(F.col("c.total_likes").cast("int"), F.lit(0)).alias("TotalLikes"),
        )
        .dropna(subset=["CommentID", "ArticleID"])
        .dropDuplicates(["CommentID"])
    )


def make_comment_interactions(n: DataFrame) -> DataFrame:
    c = _exploded_comments(n)
    with_id = c.select(
        sha2_key(
            F.col("ArticleID"),
            F.col("c.commenter_name"),
            F.col("c.comment_content"),
        ).alias("CommentID"),
        F.col("c.interaction_details").alias("details"),
    )
    # stringified JSON map → int values → entries (N4-N6, b2s:371-385)
    # Reference parity (b2s:381-383): the ID hashes the RAW interaction
    # key and the display column is the raw key too — normalization to
    # lower(trim(..)) happens in gold's dim_interaction_type
    # (s2g:520,788), not here. A silver lake produced by this plan is
    # row-compatible with a reference-produced one. Deliberate
    # divergence: rows whose interaction map is empty are dropped here
    # (the reference keeps a null-typed row per empty map).
    entries = (
        with_id.withColumn("m", int_map_values(parse_json_map("details")))
        .select("CommentID", F.explode_outer(F.map_entries("m")).alias("e"))
        .filter(F.col("e").isNotNull())
        .select(
            "CommentID",
            F.col("e.key").alias("InteractionType"),
            F.col("e.value").alias("InteractionCount"),
        )
    )
    return (
        entries.select(
            F.sha2(
                F.concat_ws("||", F.col("CommentID"), F.col("InteractionType")), 256
            ).alias("CommentInteractionID"),
            "CommentID",
            "InteractionType",
            "InteractionCount",
        )
        .dropna(subset=["CommentInteractionID"])
        .dropDuplicates(["CommentInteractionID"])
    )


def build_silver_tables(raw: DataFrame, require_ts: bool = False) -> dict[str, DataFrame]:
    """All 10 silver tables from one bronze DataFrame.

    The normalized batch is persisted by callers that materialize all
    tables (reference persists MEMORY_AND_DISK across the 10
    derivations — b2s:409,495).
    """
    n = normalize_bronze(raw, require_ts=require_ts)
    return {
        "authors": make_authors(n),
        "topics": make_topics(n),
        "subtopics": make_subtopics(n),
        "keywords": make_keywords(n),
        "references_table": make_references(n),
        "articles": make_articles(n),
        "article_keywords": make_article_keywords(n),
        "article_references": make_article_references(n),
        "comments": make_comments(n),
        "comment_interactions": make_comment_interactions(n),
    }
