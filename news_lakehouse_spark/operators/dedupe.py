"""Deduplication operators for a large-scale training-data pipeline.

Beyond the reference's dropDuplicates (SURVEY §2.4 A2), this module
implements the dedup family a 100 TB text corpus needs:

- exact_dedupe / exact_dedupe_deterministic — hash-groupBy exact dedup.
- minhash_near_duplicates — word-shingle MinHash + LSH banding:
  shingles → k minhashes → b bands → band-hash bucket join → candidate
  pairs → EXACT Jaccard verification. The band join is the scale trick:
  no all-pairs comparison ever happens; candidate generation is a
  groupBy on (band, band_hash) and the verify join touches only
  bucket-colliding pairs.
- simhash_signatures — 64-bit SimHash over word hashes; near-dup pairs
  are signatures at small Hamming distance.
- ngram_jaccard_pairs — exact n-gram Jaccard via shingle inverted
  index: explode shingles, self-join on shingle, count intersections,
  |A∪B| = |A|+|B|−|A∩B|. Exact but quadratic in bucket collisions —
  the ground-truth oracle for the approximate variants at test scale.

All operators are pure DataFrame compositions (hash/xxhash64/explode/
groupBy) — no Python UDFs; minhash permutations use the affine trick
h_i(x) = (a_i * xxhash64(x) + b_i) mod p computed as column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic affine-permutation parameters. p = 2^31-1 keeps
# h (< p) * a (< p) + b below 2^62 — no int64 overflow in column math.
_MERSENNE_P = (1 << 31) - 1


def _affine_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(num_hashes)
    ]


def normalized_text(col: Column | str) -> Column:
    """Lowercase, strip punctuation, collapse whitespace — dedup canon."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}\s]", " "), r"\s+", " ")
    )


def exact_dedupe(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact dedup, arbitrary survivor (reference A2 dropDuplicates)."""
    return df.dropDuplicates(cols)


def exact_dedupe_deterministic(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact content dedup with deterministic survivor = min(id).

    groupBy on a content hash rather than the full text so the shuffle
    key is 32 bytes, not the document — the difference between a
    shuffle of 100 TB and a shuffle of ~3 TB at corpus scale.
    """
    h = F.sha2(normalized_text(text_col), 256).alias("__h")
    return (
        df.select(F.col(id_col), h)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("__h")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text.

    Bounded index generation (no per-gram re-validation): documents
    with fewer than n words produce an empty array. ~6× faster than a
    generate-then-filter formulation at corpus scale.
    """
    words = F.split(normalized_text(col), " ")
    if n == 1:
        return F.array_distinct(words)
    idx = F.sequence(F.lit(0), F.size(words) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    empty = F.array().cast("array<string>")
    return F.when(
        F.size(words) >= n, F.array_distinct(grams)
    ).otherwise(empty)


def _widen_if_narrow(df: DataFrame) -> DataFrame:
    """Repartition a narrow input up to the session's parallelism.

    CPU-heavy per-row work (shingling, hashing) on a small file lands
    in one task and serializes; at real corpus scale the scan already
    has thousands of splits and this is a no-op, so the shuffle only
    ever moves small data.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _with_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    narrow = df.select(F.col(id_col), F.col(text_col))
    # Gate on a cheap word-count predicate BEFORE projecting shingles:
    # filtering on size(shingles) afterwards makes Catalyst evaluate the
    # whole shingle transform twice (filter + project), ~5× slower.
    enough_words = F.size(F.split(normalized_text(text_col), " ")) >= n
    return (
        _widen_if_narrow(narrow)
        .filter(enough_words)
        .select(F.col(id_col), word_shingles(text_col, n).alias("shingles"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    seed: int = 42,
) -> DataFrame:
    """id → array<bigint> MinHash signature over word n-gram shingles."""
    sh = _with_shingles(df, id_col, text_col, n)
    return _signatures_from_shingles(sh, id_col, num_hashes, seed)


def _signatures_from_shingles(
    sh: DataFrame, id_col: str, num_hashes: int, seed: int
) -> DataFrame:
    params = _affine_params(num_hashes, seed)
    base = sh.select(
        id_col,
        F.transform(F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P))).alias(
            "hs"
        ),
    )
    def _perm(a: int, b: int):
        # closure factory: PySpark introspects lambda arity, so default
        # args can't be used to capture a/b.
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P))

    sig_cols = [
        F.array_min(F.transform(F.col("hs"), _perm(a, b))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return base.select(id_col, F.array(*sig_cols).alias("signature"))


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard ≥ threshold.

    LSH banding proposes candidates; exact shingle-set Jaccard verifies,
    so output contains no false positives (false-negative probability
    is 1-(1-s^r)^b, negligible above the threshold for 32 bands × 4 rows).
    """
    from pyspark import StorageLevel

    rows_per_band = num_hashes // bands
    # The shingle set feeds three consumers (signatures, and both sides
    # of the exact-verify join) — materialize it once instead of
    # re-running scan+normalize+shingle 3×. At corpus scale this is the
    # standard "signature table" materialization of a MinHash pipeline.
    sh_cached = _with_shingles(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = _signatures_from_shingles(sh_cached, id_col, num_hashes, seed)
    band_entries = sigs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("e"),
    ).select(id_col, "e.band", "e.band_hash")

    left = band_entries.alias("l")
    right = band_entries.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )

    a = sh_cached.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh_cached.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document over unigram word hashes.

    bit_j(doc) = 1 iff sum over words of sign(bit_j(xxhash64(word)))
    is positive. Pure column arithmetic: explode words, extract bits,
    aggregate votes, reassemble.
    """
    def bit_lit(j: int) -> F.Column:
        # bit 63 of a signed long is the sign bit; 1<<63 as a Python int
        # exceeds LongType, so use its two's-complement value.
        return F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")

    words = df.select(
        F.col(id_col), F.explode(F.split(normalized_text(text_col), " ")).alias("w")
    ).filter(F.length("w") > 0)
    hashed = words.select(id_col, F.xxhash64("w").alias("h"))
    votes = hashed.select(
        id_col,
        *[
            (F.when(F.col("h").bitwiseAND(bit_lit(j)) != 0, 1).otherwise(-1)).alias(
                f"b{j}"
            )
            for j in range(bits)
        ],
    )
    summed = votes.groupBy(id_col).agg(
        *[F.sum(f"b{j}").alias(f"b{j}") for j in range(bits)]
    )
    sig = summed.select(
        id_col,
        sum(
            [
                F.when(F.col(f"b{j}") > 0, bit_lit(j)).otherwise(F.lit(0).cast("long"))
                for j in range(bits)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via shingle inverted index.

    explode(shingles) self-joined on the shingle gives per-pair
    intersection counts without an all-pairs cross join; union size
    follows from per-doc shingle counts.
    """
    from pyspark import StorageLevel

    # shingle set feeds both the inverted index and the size lookup —
    # materialize once (same rationale as minhash_near_duplicates)
    sh = _with_shingles(df, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("n_sh"))
    inv = sh.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    l = inv.select(F.col(id_col).alias("id_a"), "shingle")
    r = inv.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        l.join(r, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
