"""Keyword search scoring (TF-IDF / BM25) over a document corpus.

No reference analog (the reference serves via BigQuery); this is the
retrieval primitive a training-data pipeline uses for targeted corpus
slicing ("all documents about X") and for dedup triage. Lucene's BM25
formulation (idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

Scale shape: the exploded token stream is filtered to the query's
terms BEFORE any shuffle — the aggregation carries only (doc, term)
rows for matching terms, not the corpus vocabulary. Corpus stats are
two scalars (N, avgdl) and a df row per query term; both join back
via broadcast, so the corpus is scanned exactly twice (once for
lengths, once for matches) and never shuffled whole.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_lakehouse_spark.operators.dedupe import normalized_text


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score per document for a bag-of-words query.

    Returns (id, n_matched_terms, score) for every document matching at
    least one query term — no top-k cutoff, so results are exactly
    reproducible (a float-tied cutoff is not).
    """
    terms = sorted({t.lower() for t in query_terms})
    words = df.select(
        F.col(id_col),
        F.split(normalized_text(text_col), " ").alias("__ws"),
    ).select(
        F.col(id_col),
        F.size(F.filter("__ws", lambda w: F.length(w) > 0)).alias("dl"),
        "__ws",
    )
    # corpus stats: one row (N, avgdl) — broadcast, never collected
    stats = words.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # explode AFTER the isin filter: array_intersect-style pre-filter
    # keeps non-matching tokens out of the explode entirely
    matches = (
        words.select(
            F.col(id_col),
            "dl",
            F.explode(
                F.filter("__ws", lambda w: w.isin(terms))
            ).alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = matches.groupBy("term").agg(
        F.count("*").alias("doc_freq")
    )
    scored = (
        matches.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("doc_freq") + 0.5)
                / (F.col("doc_freq") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_matched_terms"),
            F.round(F.sum("term_score"), 6).alias("score"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 5,
    min_term_len: int = 3,
) -> DataFrame:
    """Top-N TF-IDF terms per document (smoothed idf = ln(N/(1+df))+1).

    The full (doc, term) matrix shuffles — unlike bm25_scores this is
    vocabulary-scale work by definition. tf is the RAW in-document term
    count (no max-tf/length normalization — scores are comparable
    within a document, not across documents of different lengths); ties
    broken lexicographically for determinism.
    """
    from news_lakehouse_spark.operators.windows import top_k_per_group

    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(text_col), " ")).alias("term"),
    ).filter(F.length("term") >= min_term_len)
    tf = tokens.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log(F.col("n_docs") / (F.lit(1.0) + F.col("doc_freq"))) + 1.0),
                6,
            ),
        )
        .select(id_col, "term", "tf", "tfidf")
    )
    return top_k_per_group(
        scored,
        [id_col],
        [F.col("tfidf").desc(), F.col("term").asc()],
        top_n,
    )
