"""Hashed linear text classifier — fastText-style model INFERENCE at
corpus scale (quality filtering, topic gating, language-pair routing).

The reference pipeline has no model-scoring stage (its quality gate is
rule-based: spark_jobs/gcs_bronze_to_silver.py field checks); this is
extension surface for the LLM-training-data pipeline, where the
standard corpus filter is a linear model over hashed bag-of-ngrams —
fastText (Joulin et al. 2016, arXiv:1607.01759) with the hashing trick
(Weinberger et al. 2009): exactly the CCNet / FineWeb quality-filter
shape.

Scale design — the model is BROADCAST STATE, the corpus never moves:

- Features are unigram+bigram hash buckets — xxhash64 by default,
  or the engine's portable sha2 line (functions.keys.sha2_prefix_long)
  when scores must reproduce outside Spark; no vocabulary, no
  fit-time state to ship, no OOV path.
- The weight vector rides into the plan as an array column bound once
  per row (a linear model is a few KB–MB); scoring is one
  ``transform`` + ``aggregate`` higher-order-function chain per row —
  zero shuffle, zero Python, zero joins: a 100 TB corpus scores in
  exactly one scan. HOFs evaluate interpreted (outside whole-stage
  codegen), so the per-feature constant matters: lambdas here touch
  only bound attributes and their own variables — an outer-expression
  reference would re-evaluate that subtree per element (the O(n^2)
  trap this module's git history documents).
- Summation happens in document feature ORDER (``aggregate`` folds
  left), so the float result is bit-deterministic and oracle-twinnable
  (same fold order in SQL's list_reduce).

Training is out of scope by design: models arrive from upstream
(fastText CLI, sklearn, a labeled eval harness); this module is the
inference operator those models need to run AT corpus scale.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from news_lakehouse_spark.functions.keys import sha2_prefix_long
from news_lakehouse_spark.operators.dedupe import normalized_text

#: Separator between salt and feature text inside the hash source.
#: Unit-separator control char: cannot appear in normalized_text
#: output (it is neither \p{L}, \p{N} nor space), so salted sources
#: never collide with feature content.
_SEP = ""


def hashed_ngram_buckets(
    text_col: Column | str,
    n_buckets: int,
    salt: str = "qc",
    ngram_max: int = 2,
    hash: str = "xxhash64",
) -> Column:
    """``array<bigint>`` of hashed ngram feature buckets for one row.

    Unigrams and (for ``ngram_max>=2``) bigrams over
    ``normalized_text`` tokens; each n-gram order gets its own salt so
    a unigram and a bigram never share a bucket stream. Pure per-row
    codegen — no explode, no shuffle.

    ``hash`` picks the bucket function: ``"xxhash64"`` (default) is
    the production path; ``"sha2"`` routes through the engine's
    portable sha2 line for cross-engine-reproducible bucketing
    (oracles, audits, replaying a model's features outside Spark).
    Measured at 20x corpus scale the sha2 path costs ~1.6-2x the
    xxhash64 path — interpreted higher-order-function evaluation (not
    hashing) dominates both, so the portable line is affordable where
    reproducibility matters and xxhash64 is simply never worse.
    """
    if ngram_max not in (1, 2):
        raise ValueError(f"ngram_max must be 1 or 2, got {ngram_max}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if hash not in ("xxhash64", "sha2"):
        raise ValueError(f"hash must be xxhash64 or sha2, got {hash!r}")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(normalized_text(c), " "), lambda t: t != F.lit(""))

    if hash == "xxhash64":

        def bucket(src: Column) -> Column:
            return F.pmod(F.xxhash64(src), F.lit(n_buckets))

    else:

        def bucket(src: Column) -> Column:
            return sha2_prefix_long(src, 15) % F.lit(n_buckets)

    uni = F.transform(
        toks, lambda t: bucket(F.concat_ws(_SEP, F.lit(salt + "1"), t))
    )
    if ngram_max == 1:
        return uni
    # Bigrams via zip_with over two shifted slices. Spark evaluates
    # higher-order functions INTERPRETED (no codegen), and a lambda
    # that references an outer expression — element_at(toks, i+1) —
    # re-evaluates that whole subtree per ELEMENT: O(tokens^2) per
    # document (measured 20x the linear plan at ~300 tokens/doc).
    # zip_with's lambda touches only its two element variables, so the
    # token array is evaluated a constant number of times per row.
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: bucket(
                F.concat_ws(
                    _SEP,
                    F.lit(salt + "2"),
                    F.concat_ws(" ", a, b),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.concat(uni, bi)


def hashed_linear_score(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    *,
    bias: float = 0.0,
    salt: str = "qc",
    ngram_max: int = 2,
    hash: str = "xxhash64",
    score_col: str = "score",
    n_features_col: str | None = None,
) -> DataFrame:
    """Append ``sigmoid(bias + mean(weights[bucket(f)]))`` per row.

    ``weights`` IS the model: ``len(weights)`` fixes the bucket count,
    and the vector is inlined into the plan as a literal array (the
    fastText mean-of-feature-embeddings forward pass, with 1-d
    embeddings = a linear model). Rows with no features score
    ``sigmoid(bias)``. A model is bound to its ``hash`` choice — score
    with the same function the model was trained/derived under.
    """
    if not weights:
        raise ValueError("weights must be a non-empty list (the model)")
    feats = hashed_ngram_buckets(text_col, len(weights), salt, ngram_max, hash)
    warr = F.array(*[F.lit(float(w)) for w in weights])
    # Stage through real columns so the interpreted HOF fold touches
    # BOUND attributes: feats evaluates once per row, and the weight
    # array is an O(1) row-field access inside the lambda instead of a
    # 512-element CreateArray per feature.
    tmp_f, tmp_w = "__qc_feats", "__qc_w"
    staged = df.withColumn(tmp_f, feats).withColumn(tmp_w, warr)
    fcol = F.col(tmp_f)
    n = F.size(fcol)
    total = F.aggregate(
        fcol,
        F.lit(0.0),
        lambda acc, b: acc
        + F.element_at(F.col(tmp_w), (b + F.lit(1)).cast("int")),
    )
    z = F.when(n > 0, F.lit(float(bias)) + total / n).otherwise(
        F.lit(float(bias))
    )
    out = staged.withColumn(score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
    if n_features_col is not None:
        out = out.withColumn(n_features_col, n.cast("int"))
    return out.drop(tmp_f, tmp_w)


def pseudo_weights(n_buckets: int, salt: str = "qcw") -> list[float]:
    """Deterministic pseudo-model: weight_b = U(b) - 0.5 with U the
    engine's sha2 hash line, reproducible in any engine (and in plain
    Python, here). Stands in for a trained model in tests/oracles —
    NOT a trained classifier.
    """
    space = float(16**15)
    return [
        int(hashlib.sha256(f"{salt}{_SEP}{b}".encode()).hexdigest()[:15], 16)
        / space
        - 0.5
        for b in range(n_buckets)
    ]
