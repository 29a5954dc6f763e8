"""Set-similarity (fuzzy) JOIN between two tables on a text column.

Entity-resolution / record-linkage primitive the reference lacks and a
training-data pipeline wants (match crawl records to a canonical list,
link near-identical titles across sources): join rows whose TOKEN SETS
overlap enough (Jaccard >= threshold), without the cross product.

Plan shape (prefix-filtered inverted-index set-similarity join — the
ppjoin/AllPairs candidate cut, Bayardo et al. WWW'07 / Xiao et al.
WWW'08, re-expressed as DataFrame ops):

1. tokenize both sides (JVM-side split/explode, distinct tokens);
2. order every set by ascending document frequency (rare tokens
   first) and index ONLY each set's PREFIX — its first
   |s| - ceil(t*|s|) + 1 tokens. Two sets with Jaccard >= t must
   share a token inside both prefixes (pigeonhole on the overlap
   bound |L∩R| >= ceil(t*|L|)), so the cut is EXACT while shrinking
   posting lists by ~t/(1+t) and, because rare tokens sort first,
   moving the surviving postings to the shortest lists;
3. equi-join prefix postings on the token (one keyed shuffle,
   candidate count = sum of PREFIX posting-list cross sizes);
4. verify each distinct candidate pair against the FULL token arrays
   (size(array_intersect)) — surviving pairs carry their exact
   Jaccard.

Everything is columnar JVM work — no UDFs. Tokens whose right-side
document frequency exceeds ``max_df`` generate no candidates (the
same stop-word cap the n-gram dedup family uses); with the cap above
the corpus's max df the join is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Subtracted before ceil() so float noise in t*|s| (e.g. 0.8*5 ->
# 4.000000000000001) can never round a prefix one token SHORT, which
# would silently drop true pairs. One-in-1e9 slack errs long (extra
# candidates), never wrong.
_CEIL_EPS = 1e-9

TOKEN_PATTERN = r"[^\p{L}\p{N}]+"
"""Unicode letters+digits tokenizer, lowercased. The DuckDB oracle in
queries.py uses the same ``\\p{L}\\p{N}`` classes (RE2 supports them),
so the SQL twin tokenizes identically on non-ASCII text — keep the
two in lockstep (advice r6)."""


def _token_sets(df: DataFrame, id_col: str, text_col: str, side: str):
    toks = df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_PATTERN),
                lambda t: t != "",
            )
        ).alias(f"{side}_toks"),
    ).withColumn(f"{side}_size", F.size(f"{side}_toks"))
    postings = toks.select(
        f"{side}_id",
        f"{side}_size",
        F.explode(f"{side}_toks").alias("token"),
    )
    return toks, postings


def _prefix(postings: DataFrame, side: str, threshold: float) -> DataFrame:
    """Keep each set's first |s| - ceil(t*|s|) + 1 tokens under the
    global (df asc, token asc) order — the exact prefix-filter cut."""
    w = Window.partitionBy(f"{side}_id").orderBy(
        F.col("__df").asc_nulls_first(), F.col("token").asc()
    )
    plen = (
        F.col(f"{side}_size")
        - F.ceil(F.col(f"{side}_size") * threshold - _CEIL_EPS).cast("int")
        + 1
    )
    return (
        postings.withColumn("__pos", F.row_number().over(w))
        .filter(F.col("__pos") <= plen)
        .drop("__pos")
    )


def _candidate_pairs(
    l_post: DataFrame,
    r_post: DataFrame,
    threshold: float,
    max_df: int,
    prefix_filter: bool = True,
) -> DataFrame:
    """Distinct (l_id, r_id) candidates from the inverted index; with
    ``prefix_filter`` only prefix postings join (exact — see module
    docstring), without it every posting joins (the pre-r7 plan,
    kept for the equivalence test)."""
    df_counts = r_post.groupBy("token").agg(F.count("*").alias("__df"))
    if prefix_filter:
        # positions use the FULL df order (capped tokens keep their
        # prefix slots — dropping them before ranking would promote
        # later tokens into the prefix, which stays correct but
        # regrows lists; dropping them after ranking is both correct
        # and the intended cap)
        l_indexed = l_post.join(df_counts, "token", "left").withColumn(
            "__df", F.coalesce(F.col("__df"), F.lit(0))
        )
        r_indexed = r_post.join(df_counts, "token")
        cand = _prefix(l_indexed, "l", threshold).join(
            _prefix(r_indexed, "r", threshold).filter(
                F.col("__df") <= max_df
            ),
            "token",
        )
    else:
        cand = l_post.join(
            r_post.join(
                df_counts.filter(F.col("__df") <= max_df).select("token"),
                "token",
            ),
            "token",
        )
    return cand.select("l_id", "r_id").distinct()


def fuzzy_token_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    threshold: float = 0.6,
    max_df: int = 1000,
    prefix_filter: bool = True,
) -> DataFrame:
    """(left_id, right_id, jaccard) for every cross-table pair whose
    token-set Jaccard similarity >= ``threshold`` (rounded to 6,
    EXACT — candidates verify against the full token arrays).

    ``max_df`` caps posting-list length ON THE RIGHT side's document
    frequency (the indexed side): tokens appearing in more than that
    many right rows generate no candidates, so pairs whose only shared
    tokens are capped are the stated recall trade (pairs that DO
    surface still score their true Jaccard). Set ``max_df`` above the
    right corpus's max token df for an exact join.

    ``prefix_filter`` (default on) applies the ppjoin prefix cut —
    identical output, materially fewer candidates; off exists for
    tests and measurement.
    """
    l_toks, l_post = _token_sets(left, left_id, left_text, "l")
    r_toks, r_post = _token_sets(right, right_id, right_text, "r")
    cand = _candidate_pairs(l_post, r_post, threshold, max_df, prefix_filter)
    scored = (
        cand.join(l_toks, "l_id")
        .join(r_toks, "r_id")
        .withColumn(
            "__common", F.size(F.array_intersect("l_toks", "r_toks"))
        )
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
