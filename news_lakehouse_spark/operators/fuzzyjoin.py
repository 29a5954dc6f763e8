"""Set-similarity (fuzzy) JOIN between two tables on a text column.

Entity-resolution / record-linkage primitive the reference lacks and a
training-data pipeline wants (match crawl records to a canonical list,
link near-identical titles across sources): join rows whose TOKEN SETS
overlap enough (Jaccard >= threshold), without the cross product.

Plan shape (the standard inverted-index set-similarity join):
tokenize both sides (JVM-side split/explode, distinct tokens), drop
tokens whose document frequency exceeds ``max_df`` (stop-word postings
generate candidate pairs quadratically while contributing to pairs
that almost never pass a meaningful threshold — the same df cap the
n-gram dedup family uses; dropped tokens still count in the set sizes,
so a surviving pair's score is a LOWER BOUND on its true Jaccard —
with the cap above the corpus's max df the join is exact), equi-join
postings on the token
(one keyed shuffle, candidate count = sum of posting-list cross sizes),
count intersections per candidate pair with one aggregation, and
verify |L ∩ R| / (|L| + |R| - |L ∩ R|) >= threshold against the exact
per-row set sizes. Everything is columnar JVM work — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_sets(df: DataFrame, id_col: str, text_col: str, side: str):
    toks = df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+"),
                lambda t: t != "",
            )
        ).alias("__toks"),
    )
    sizes = toks.select(f"{side}_id", F.size("__toks").alias(f"{side}_size"))
    postings = toks.select(
        f"{side}_id", F.explode("__toks").alias("token")
    )
    return sizes, postings


def fuzzy_token_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    threshold: float = 0.6,
    max_df: int = 1000,
) -> DataFrame:
    """(left_id, right_id, jaccard) for every cross-table pair whose
    token-set Jaccard similarity >= ``threshold`` (rounded to 6).

    ``max_df`` caps posting-list length ON THE RIGHT side's document
    frequency (the indexed side): tokens appearing in more than that
    many right rows generate no candidates. Set sizes stay FULL, so a
    surviving pair's score is a lower bound on its true Jaccard (exact
    when none of its shared tokens were capped); pairs whose overlap
    needed capped tokens are the stated recall trade. Set
    ``max_df`` above the right corpus's max token df for an exact
    join.
    """
    l_sizes, l_post = _token_sets(left, left_id, left_text, "l")
    r_sizes, r_post = _token_sets(right, right_id, right_text, "r")
    df_counts = r_post.groupBy("token").agg(F.count("*").alias("__df"))
    r_indexed = r_post.join(
        df_counts.filter(F.col("__df") <= max_df).select("token"), "token"
    )
    inter = (
        l_post.join(r_indexed, "token")
        .groupBy("l_id", "r_id")
        .agg(F.count("*").alias("__common"))
    )
    scored = (
        inter.join(l_sizes, "l_id")
        .join(r_sizes, "r_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__common")
                / (F.col("l_size") + F.col("r_size") - F.col("__common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return scored.select(
        F.col("l_id").alias(left_id + "_l"),
        F.col("r_id").alias(right_id + "_r"),
        "jaccard",
    )
