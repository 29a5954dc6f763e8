"""Set-similarity (fuzzy) JOIN between two tables on a text column.

Entity-resolution / record-linkage primitive the reference lacks and a
training-data pipeline wants (match crawl records to a canonical list,
link near-identical titles across sources): join rows whose TOKEN SETS
overlap enough (Jaccard >= threshold), without the cross product.

Two plans, both exact, chosen by ``prefix_filter``:

- **direct** (default): tokenize both sides (JVM split/explode,
  distinct tokens), equi-join postings on the token (one keyed
  shuffle), count intersections per pair in ONE aggregation riding
  the per-posting set sizes — no distinct pass, no array
  materialization. Cost ∝ Σ_token l_df·r_df (the candidate count).
- **prefix cut** (the ppjoin/AllPairs filter, Bayardo et al. WWW'07 /
  Xiao et al. WWW'08): order every set by ascending document
  frequency and index ONLY its first |s| − ⌈t·|s|⌉ + 1 tokens; two
  sets with Jaccard ≥ t must share a token inside both prefixes
  (pigeonhole on the overlap bound |L∩R| ≥ ⌈t·|L|⌉), so the cut is
  exact; surviving candidate pairs verify against the full token
  arrays (size(array_intersect)) for true Jaccard. This bounds the
  quadratic worst case (stopword-heavy corpora, low thresholds,
  uncapped vocabularies) at the price of two per-set ranking
  shuffles + per-candidate array work.
- ``prefix_filter=None`` auto-chooses: one vocab-sized aggregate
  computes the direct plan's exact candidate count up front and the
  cut engages only past a real blowup.

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


PREFIX_BLOWUP_FACTOR = 64
PREFIX_MIN_CANDIDATES = 20_000_000
"""Auto mode takes the prefix cut only when the DIRECT plan's exact
candidate count (Σ_token l_df·r_df over uncapped tokens, one small agg
over the two vocab-sized df tables) is both large in absolute terms
AND a blowup multiple of the posting count — the stopword-heavy /
low-threshold / uncapped-at-100TB regime where the postings join goes
quadratic. Below that, the direct plan (intersections counted straight
out of the postings join, no distinct, no array materialization) is
the cheap one: measured 3x faster at sf0.1, where the near-dup fixture
explodes candidate COUNT mildly but the cut removes almost none (true
pairs share rare tokens too)."""


def _estimate_direct_candidates(
    l_post: DataFrame, df_counts: DataFrame, max_df: int
) -> tuple[int, int]:
    """(exact candidate-row count of the direct plan, total postings)
    from the vocab-sized df tables — cost ~ one keyed agg over the
    vocabulary, independent of the candidate count itself."""
    est = (
        l_post.groupBy("token")
        .agg(F.count("*").alias("__ldf"))
        .join(df_counts.filter(F.col("__df") <= max_df), "token")
        .agg(
            F.sum(F.col("__ldf") * F.col("__df")).alias("cand"),
            F.sum("__ldf").alias("lp"),
            F.sum("__df").alias("rp"),
        )
        .first()
    )
    return int(est["cand"] or 0), max(int(est["lp"] or 0) + int(est["rp"] or 0), 1)


def _candidate_pairs(
    l_post: DataFrame,
    r_post: DataFrame,
    threshold: float,
    max_df: int,
    prefix_filter: bool | None = None,
) -> DataFrame:
    """Distinct (l_id, r_id) candidates from the inverted index; with
    ``prefix_filter`` only prefix postings join (exact — see module
    docstring), without it every posting joins. ``None`` picks per
    corpus (see PREFIX_BLOWUP_FACTOR)."""
    df_counts = r_post.groupBy("token").agg(F.count("*").alias("__df"))
    if prefix_filter is None:
        cand_est, postings = _estimate_direct_candidates(
            l_post, df_counts, max_df
        )
        prefix_filter = cand_est > max(
            PREFIX_BLOWUP_FACTOR * postings, PREFIX_MIN_CANDIDATES
        )
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
    prefix_filter: bool | None = False,
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

    ``prefix_filter``: False (default) runs the DIRECT plan —
    intersections counted straight out of the postings join, one keyed
    agg, no distinct, no array materialization; True forces the ppjoin
    prefix cut (per-set df-ascending ranking, prefix-only candidate
    join, exact-Jaccard array verification); None auto-chooses — one
    vocab-sized aggregate computes the direct plan's exact candidate
    count up front and the cut engages only past a genuine blowup
    (PREFIX_BLOWUP_FACTOR / PREFIX_MIN_CANDIDATES). Output is
    identical across modes when ``max_df`` is unbinding (with a
    binding cap, direct scores a lower bound over uncapped shared
    tokens while prefix-surviving pairs score true Jaccard).

    Why direct is the default: the cut bounds the WORST case
    (stopword-heavy corpora, low thresholds, uncapped vocabularies go
    quadratic) but on high-true-pair-density corpora it removes few
    candidates while paying two ranking shuffles plus per-candidate
    array work — measured 3x slower than direct on the near-dup bench
    corpus. Auto spends one extra vocabulary pass to detect the
    quadratic regime; choose it when the corpus is unknown.
    """
    l_toks, l_post = _token_sets(left, left_id, left_text, "l")
    r_toks, r_post = _token_sets(right, right_id, right_text, "r")
    if prefix_filter is None:
        df_counts = r_post.groupBy("token").agg(F.count("*").alias("__df"))
        cand_est, postings = _estimate_direct_candidates(
            l_post, df_counts, max_df
        )
        prefix_filter = cand_est > max(
            PREFIX_BLOWUP_FACTOR * postings, PREFIX_MIN_CANDIDATES
        )
    if prefix_filter:
        cand = _candidate_pairs(l_post, r_post, threshold, max_df, True)
        scored = (
            cand.join(l_toks, "l_id")
            .join(r_toks, "r_id")
            .withColumn(
                "__common", F.size(F.array_intersect("l_toks", "r_toks"))
            )
        )
    else:
        df_counts = r_post.groupBy("token").agg(F.count("*").alias("__df"))
        r_indexed = r_post.join(
            df_counts.filter(F.col("__df") <= max_df).select("token"),
            "token",
        )
        scored = (
            l_post.join(r_indexed, "token")
            .groupBy("l_id", "r_id")
            .agg(
                F.count("*").alias("__common"),
                F.first("l_size").alias("l_size"),
                F.first("r_size").alias("r_size"),
            )
        )
    scored = scored.withColumn(
        "jaccard",
        F.round(
            F.col("__common")
            / (F.col("l_size") + F.col("r_size") - F.col("__common")),
            6,
        ),
    ).filter(F.col("jaccard") >= threshold)
    return scored.select(
        F.col("l_id").alias(left_id + "_l"),
        F.col("r_id").alias(right_id + "_r"),
        "jaccard",
    )
