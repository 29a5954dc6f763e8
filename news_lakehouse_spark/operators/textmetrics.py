"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Extension surface (BASELINE.json north star) over the `documents`
table. Everything is built-in column math — regexp, split, array
higher-order functions — so it whole-stage-codegens and runs at scan
speed; there is no Python in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from news_lakehouse_spark.operators.dedupe import normalized_text

# Tiny per-language function-word lists for the n-gram/stopword
# language heuristic. Deliberately deterministic + SQL-expressible so
# the operator has an exact oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "por"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "que"),
    "vi": ("của", "và", "là", "có", "trong", "được", "cho", "không"),
}

_PUNCT_RE = r"[\p{P}\p{S}]"
# BPE-ish token regex: word pieces, numbers, or single non-space symbols.
TOKEN_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """BPE-ish tokenization: letters runs, digit runs, single symbols."""
    # idx=0: whole-match extraction (the pattern has no capture groups)
    return F.regexp_extract_all(_c(col), F.lit(TOKEN_RE), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(F.split(F.trim(_c(col)), r"\s+"))


def language_scores(
    df: DataFrame, id_col: str, text_col: str, markers: dict[str, tuple[str, ...]] | None = None
) -> DataFrame:
    """Per-language marker-word hit ratio + argmax language guess.

    score(lang) = |words ∩ markers(lang)| / |words|, computed with
    array_intersect on the distinct word set — one pass, no explode,
    no shuffle.
    """
    markers = markers or LANG_MARKERS
    words = F.array_distinct(F.split(normalized_text(text_col), " "))
    score_cols = [
        (
            F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in ms])))
            / F.greatest(F.size(words), F.lit(1))
        ).alias(f"score_{lang}")
        for lang, ms in markers.items()
    ]
    scored = df.select(F.col(id_col), *score_cols)
    # argmax via greatest + chained when (deterministic: first max wins
    # in dict order)
    langs = list(markers)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    guess = None
    for l in langs:
        cond = F.col(f"score_{l}") == best
        guess = F.when(cond, F.lit(l)) if guess is None else guess.when(cond, F.lit(l))
    return scored.withColumn("lang_guess", guess)


def quality_metric_columns(text_col: str) -> dict[str, Column]:
    """The quality-signal expressions, exposed so composed pipelines
    can evaluate them in the same scan as other per-row stages."""
    t = _c(text_col)
    words = F.split(normalized_text(text_col), " ")
    n_chars = F.length(t)
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(_PUNCT_RE), 0))
    stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    n_uniq = F.size(F.array_distinct(words))
    safe_words = F.greatest(n_words, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": (n_chars - n_words + 1) / safe_words.cast("double"),
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)).cast("double"),
        "stopword_ratio": n_stop / safe_words.cast("double"),
        "uniq_word_ratio": n_uniq / safe_words.cast("double"),
    }


def quality_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword / repetition quality signals.

    Columns: n_chars, n_words, avg_word_len, punct_ratio,
    stopword_ratio (en markers), uniq_word_ratio, quality_score — a
    simple monotone combination in [0, 1].
    """
    cols = quality_metric_columns(text_col)
    out = df.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
    )
    score = (
        F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.2
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.2
        + F.col("uniq_word_ratio") * 0.2
    )
    return out.withColumn("quality_score", F.round(score, 6))


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Word n-gram repetition signals (Gopher-style quality rules).

    Per document with ≥ n words: ``n_grams`` (total n-gram count),
    ``top_gram_frac`` (share of the single most repeated n-gram) and
    ``dup_gram_frac`` (1 − distinct/total) — high values flag
    boilerplate and degenerate generations.

    Shape: per-doc gram explode → two-stage hash agg. The first
    groupBy(id, gram) partially aggregates map-side, so the shuffle
    carries one row per *distinct* (doc, gram), not per occurrence —
    on repetitive documents (the interesting ones) that is the
    compressed representation.
    """
    from news_lakehouse_spark.operators.dedupe import _shifted_zip

    words = df.select(
        F.col(id_col), F.split(normalized_text(text_col), " ").alias("__ws")
    ).filter(F.size("__ws") >= n)
    # zip-of-shifted-slices, not element_at(__ws, i+j) from inside the
    # lambda: under the explode consumer Catalyst inlines __ws's
    # split+normalize subtree into the lambda and re-evaluates it per
    # element (see dedupe._shifted_zip)
    grams = words.select(
        F.col(id_col),
        F.explode(
            F.transform(
                _shifted_zip(F.col("__ws"), n),
                lambda x: F.concat_ws(
                    " ", *[x[f"w{j}"] for j in range(n)]
                ),
            )
        ).alias("__gram"),
    )
    counts = grams.groupBy(id_col, "__gram").agg(F.count("*").alias("__cnt"))
    agg = counts.groupBy(id_col).agg(
        F.sum("__cnt").alias("n_grams"),
        F.max("__cnt").alias("__top"),
        F.count("*").alias("__distinct"),
    )
    total = F.col("n_grams").cast("double")
    return agg.select(
        F.col(id_col),
        "n_grams",
        F.round(F.col("__top") / total, 6).alias("top_gram_frac"),
        F.round(1 - F.col("__distinct") / total, 6).alias("dup_gram_frac"),
    )


# PII patterns constrained to the Java-regex ∩ RE2 subset so the Spark
# plan and the DuckDB oracle compile the same automaton.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+\d{1,3} \d{3} \d{3} \d{3}", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Detect-and-mask PII spans (emails, phones, IPv4) in one scan.

    Emits per-pattern match counts (on the original text) plus
    ``redacted_text`` with every span replaced by its placeholder,
    applied in dict order (email first, so the numeric patterns never
    see addresses). Pure regexp column ops — whole-stage codegen, no
    Python, no shuffle.
    """
    patterns = patterns or PII_PATTERNS
    t = _c(text_col)
    count_cols = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(f"n_{name}")
        for name, (pat, _) in patterns.items()
    ]
    red = t
    for pat, repl in patterns.values():
        red = F.regexp_replace(red, pat, repl)
    return df.select(
        F.col(id_col), *count_cols, red.alias("redacted_text")
    )


# Default thresholds for the composite corpus filter (C4/Gopher-style
# keep/drop rules). Ordered: the first failing rule names the drop.
CORPUS_FILTER_RULES: tuple[tuple[str, str], ...] = (
    ("too_short", "n_words < 10"),
    ("too_long", "n_words > 20000"),
    ("word_len", "avg_word_len < 2.0 OR avg_word_len > 12.0"),
    ("punct", "punct_ratio > 0.2"),
    ("low_uniq", "uniq_word_ratio < 0.3"),
)


def corpus_filter(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite keep/drop corpus gate (C4/Gopher-style rule chain).

    Evaluates `quality_metrics` signals against fixed thresholds and
    emits ``keep`` plus ``drop_reason`` (the FIRST failing rule in
    `CORPUS_FILTER_RULES` order, null when kept). One scan, all
    codegen; rules are SQL fragments shared verbatim with the DuckDB
    oracle so the gate semantics are independently checkable.
    """
    m = quality_metrics(df, id_col, text_col)
    return m.select(
        F.col(id_col),
        "n_words",
        corpus_drop_reason_column().alias("drop_reason"),
    ).withColumn("keep", F.col("drop_reason").isNull())


def document_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical content fingerprint: sha2-256 of the normalized text.

    The whitespace/case/punctuation-insensitive identity used by exact
    dedup; pairs with simhash_signatures for the fuzzy variant.
    """
    return df.select(
        F.col(id_col),
        F.sha2(normalized_text(text_col), 256).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping word-window chunks
    (doc_id, chunk_idx, chunk_text, n_tokens) — the RAG / training-prep
    primitive.

    Stride = chunk_size - overlap; the last chunk is the remainder
    (never empty, never duplicated: a doc shorter than chunk_size is
    one chunk). Pure column math — the words array materializes once,
    chunk starts come from sequence(), and slices explode JVM-side; no
    Python boundary, no shuffle (chunking is embarrassingly row-local,
    which is exactly why it must NOT be a Pandas UDF at 100 TB).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    words = df.select(
        F.col(id_col),
        F.split(normalized_text(text_col), " ").alias("__ws"),
    ).select(
        F.col(id_col),
        F.filter("__ws", lambda w: F.length(w) > 0).alias("__ws"),
    )
    n = F.size("__ws")
    # starts: 0, stride, 2*stride, ... covering every word at least once
    last_start = F.greatest(
        F.lit(0), F.ceil((n - F.lit(chunk_size)) / F.lit(stride)).cast("int") * stride
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    chunks = words.filter(n > 0).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts, lambda s: F.slice("__ws", s + 1, chunk_size)
            )
        ).alias("chunk_idx", "__chunk"),
    )
    return chunks.select(
        F.col(id_col),
        "chunk_idx",
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").cast("int").alias("n_tokens"),
    )


def char_trigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document mean character-trigram log-probability — the
    KenLM-perplexity stand-in for corpus quality filtering.

    Self-trained: trigram counts over the whole corpus give a unigram-
    of-trigrams model; each document scores avg ln P(trigram). Garbled
    or off-distribution text scores sharply lower than corpus-typical
    text, which is the CCNet/Gopher quality-filter recipe (they use a
    pretrained 5-gram LM; the plumbing — train counts, broadcast-join
    scores, aggregate per doc — is identical, and a pretrained count
    table can be swapped in as a second input).

    Plan shape: one explode → groupBy(trigram) for training (vocab is
    alphabet³-bounded, so the model side is small and broadcasts); one
    explode → broadcast-join → per-doc avg for scoring. The corpus
    shuffles only on (doc, trigram) aggregation keys.
    """
    from news_lakehouse_spark.operators.dedupe import _shifted_zip

    norm = df.select(F.col(id_col), normalized_text(text_col).alias("__t")).filter(
        F.length("__t") >= 3
    )
    # split to the codepoint array once and window it (zip of 3
    # shifted slices): the previous substr(__t, i, 3) lambda both
    # re-scanned the string from byte 0 per window (O(len²)/doc in
    # UTF8String) and referenced the outer __t from inside the lambda
    # (the projection-inlining trap — see dedupe._shifted_zip). Same
    # trigrams: split/substr/length all index by code point.
    tri = norm.select(
        F.col(id_col),
        F.explode(
            F.transform(
                _shifted_zip(F.split("__t", ""), 3),
                lambda x: F.concat(x["w0"], x["w1"], x["w2"]),
            )
        ).alias("tg"),
    )
    # Aggregate BEFORE the shuffle (one explode, not two): per-doc
    # trigram counts feed both the model (summed per trigram) and the
    # scoring join, so the corpus explodes once and the shuffle
    # carries one row per distinct (doc, trigram) instead of per
    # occurrence. avg(lp) over occurrences == sum(c·lp)/sum(c); the
    # double's addition order changes, but Spark's avg order was
    # already partition-nondeterministic and the contract is the
    # round-6 value (oracle-verified at sf0.001/0.01/0.1).
    doc_tg = tri.groupBy(id_col, "tg").agg(F.count("*").alias("dc"))
    counts = doc_tg.groupBy("tg").agg(F.sum("dc").alias("c"))
    total = counts.agg(F.sum("c").alias("n"))
    model = counts.join(F.broadcast(total)).select(
        "tg", F.log(F.col("c") / F.col("n")).alias("lp")
    )
    return (
        doc_tg.join(F.broadcast(model), "tg")
        .groupBy(id_col)
        .agg(
            F.sum("dc").cast("long").alias("n_trigrams"),
            F.round(
                F.sum(F.col("dc") * F.col("lp")) / F.sum("dc"), 6
            ).alias("avg_logprob"),
        )
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    max_df: int = 3,
) -> DataFrame:
    """CCNet-style corpus-level boilerplate removal: drop paragraphs
    that repeat across >= max_df distinct documents, keep the rest in
    original order.

    "Paragraph" here is a non-overlapping `window`-word segment of the
    normalized text (the corpus has no newline structure; on a corpus
    with real paragraphs, split on newlines first and feed each line as
    a segment). Mirrors the paragraph-hash dedup step of CCNet /
    RefinedWeb cleaning: navboxes, cookie banners, and license blurbs
    recur verbatim across many pages and are removed before training.

    Output: (id, n_segments, n_removed, clean_text) for EVERY input
    document — a fully-boilerplate document survives with clean_text ''.

    Plan shape (scale notes): segments explode row-locally (no
    shuffle); document frequency is a groupBy on md5(segment) — a
    16-byte digest, never the segment text, so the shuffle carries
    32-hex-char keys regardless of window size; the keep/drop decision
    is a shuffle join on that same digest (both sides hash-partitioned
    on one key; AQE skew-split handles a pathological mega-paragraph);
    reassembly is a per-document array_sort over collect_list —
    state bounded by segments-per-doc, not corpus size. No Python
    anywhere.
    """
    words = df.select(
        F.col(id_col),
        F.filter(
            F.split(normalized_text(text_col), " "), lambda w: F.length(w) > 0
        ).alias("__ws"),
    )
    n = F.size("__ws")
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(window)
    )
    seg = words.filter(n > 0).select(
        F.col(id_col),
        F.posexplode(
            F.transform(starts, lambda s: F.slice("__ws", s + 1, window))
        ).alias("seg_idx", "__seg"),
    ).select(
        F.col(id_col),
        "seg_idx",
        F.array_join("__seg", " ").alias("para"),
        F.md5(F.array_join("__seg", " ")).alias("__h"),
    )
    freq = seg.groupBy("__h").agg(
        F.countDistinct(id_col).alias("__df")
    )
    flagged = seg.join(freq, "__h").select(
        F.col(id_col),
        "seg_idx",
        "para",
        (F.col("__df") >= max_df).alias("__drop"),
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum(F.col("__drop").cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("__drop"), F.struct("seg_idx", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        df.select(F.col(id_col))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def blocklist_hits(text_col: str, terms: list[str]) -> Column:
    """Count of distinct blocklisted terms in the normalized token set
    — the shared expression behind blocklist_filter and the composed
    curation pipeline (one definition, so the gates cannot drift)."""
    toks = F.array_distinct(
        F.filter(
            F.split(normalized_text(text_col), " "), lambda w: F.length(w) > 0
        )
    )
    return F.size(
        F.array_intersect(toks, F.array(*[F.lit(t) for t in sorted(terms)]))
    )


def corpus_drop_reason_column() -> Column:
    """First failing CORPUS_FILTER_RULES rule as a when-chain (null =
    kept); expects the quality_metric_columns names in scope."""
    chain = F.when(
        F.expr(CORPUS_FILTER_RULES[0][1]), F.lit(CORPUS_FILTER_RULES[0][0])
    )
    for name, cond in CORPUS_FILTER_RULES[1:]:
        chain = chain.when(F.expr(cond), F.lit(name))
    return chain


def blocklist_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
) -> DataFrame:
    """Term-blocklist gate (the C4-style "bad words" filter): mark each
    document by how many distinct blocklisted terms its normalized
    token set contains, kept = none.

    Pure column math — tokens never leave the JVM, the blocklist is a
    literal array (scan-local, no broadcast, no shuffle), so the
    filter is a single codegen'd pass regardless of corpus size. For
    blocklists too large for a literal (>10^4 terms), switch to a
    broadcast left_semi join on exploded tokens; the contract below is
    unchanged.
    """
    hits = blocklist_hits(text_col, terms)
    return df.select(
        F.col(id_col),
        hits.cast("int").alias("n_blocked_terms"),
        (hits == 0).cast("int").alias("kept"),
    )


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shannon entropy of each document's character distribution — the
    gibberish/compression-artifact signal (near-zero for repeated
    filler, anomalously high for random bytes; natural text sits in a
    narrow band).

    Row-local higher-order functions only (aggregate over the distinct
    char set, counting via filter) — O(distinct_chars × len) per row
    but ZERO shuffle and no explode: at 100 TB the per-doc char
    distribution must not become (corpus_len × 1 char) shuffle rows,
    which is what a groupBy(doc, char) formulation costs.
    """
    # regexp '.' matches a full code point in Java regex — unlike
    # split(text, ''), which yields UTF-16 code units and would halve
    # astral-plane characters (external engines count code points).
    # Materialized as a column attribute BEFORE any lambda touches it:
    # HOF lambda bodies re-evaluate their subtrees per element, so an
    # inline regexp would re-scan the document once per distinct char
    # (~50× the whole query's cost on typical text).
    staged = df.select(
        F.col(id_col),
        F.regexp_extract_all(_c(text_col), F.lit(r"(?s)."), 0).alias("__chars"),
    ).select(
        id_col,
        F.array_sort(F.col("__chars")).alias("__s"),
        F.size(F.col("__chars")).alias("__n"),
    )
    n = F.col("__n")
    # run-length counts from the SORTED array: boundary indices where
    # s[i] != s[i-1], then k_i = next_boundary - boundary. O(n log n)
    # per row instead of the naive O(distinct_chars × n) count-by-scan
    # (~10× on natural text). F.get is 0-based and null-safe, so the
    # i=0 boundary needs no guard (null != comparisons yield null,
    # which the OR with i=0 absorbs).
    bounds = F.when(
        n >= 1,
        F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda i: (i == 0)
            | ~F.get(F.col("__s"), i).eqNullSafe(F.get(F.col("__s"), i - 1)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    ks = F.zip_with(
        bounds,
        F.concat(F.slice(bounds, 2, F.greatest(F.size(bounds) - 1, F.lit(0))), F.array(n)),
        lambda a, b: b - a,
    )
    ent = F.aggregate(
        ks,
        F.lit(0.0),
        lambda acc, k: acc - (k / n) * F.log(k / n),
    )
    return staged.select(
        F.col(id_col),
        n.cast("int").alias("n_chars"),
        F.round(ent, 6).alias("char_entropy"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    top_k: int = 1000,
) -> DataFrame:
    """Top-k corpus vocabulary with cumulative coverage — the
    frequency table a tokenizer-training / vocab-sizing pass needs:
    for each of the k most frequent words, its count, corpus share,
    and the cumulative share of the vocabulary so far (how much of
    the token stream a k-word vocab covers).

    Scale shape: explode → map-side-combined count per word (one
    shuffle on the word), corpus total as a 1-row broadcast, and the
    top-k via orderBy+limit — a distributed TakeOrderedAndProject,
    never a global window over the full vocabulary. The cumulative
    sum runs over the k surviving rows only. Ties break
    lexicographically for engine-stable output.
    """
    from pyspark.sql import Window

    from news_lakehouse_spark.operators.dedupe import normalized_text

    words = df.select(
        F.explode(F.split(normalized_text(text_col), " ")).alias("word")
    ).filter(F.length("word") > 0)
    counts = words.groupBy("word").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    top = counts.orderBy(F.desc("n"), "word").limit(int(top_k))
    w = Window.orderBy(F.desc("n"), "word").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        top.join(F.broadcast(total))
        .select(
            F.row_number().over(Window.orderBy(F.desc("n"), "word")).alias("rank"),
            "word",
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(F.sum("n").over(w) / F.col("__total"), 6).alias("cum_share"),
        )
    )


def ngram_diversity(
    df: DataFrame, group_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-group n-gram type/token ratio — a corpus-diversity metric.

    distinct n-grams / total n-gram instances per group (source, dump,
    shard, ...). A heavily templated or boilerplate-ridden source
    re-uses the same n-grams and scores low; diverse prose scores near
    1. Used to rank sources for mixture weighting alongside the quality
    metrics.

    Scale shape: one scan, words array materialized once per row
    (see dedupe.shingles_of_words on why), NON-distinct n-gram list
    exploded, then a single groupBy(group, gram) pre-aggregation
    followed by the per-group rollup — the count-distinct is computed
    as a two-level aggregate (map-side combine on (group, gram)), so no
    per-key distinct set is ever buffered. Documents with fewer than n
    words contribute nothing.
    """
    from news_lakehouse_spark.operators.dedupe import normalized_text

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    words = df.select(
        F.col(group_col), F.split(normalized_text(text_col), " ").alias("__ws")
    ).filter(F.size("__ws") >= n)
    if n == 1:
        grams = words.select(group_col, F.explode("__ws").alias("__gram"))
    else:
        from news_lakehouse_spark.operators.dedupe import _shifted_zip

        # zip-of-shifted-slices, not slice(__ws, i+1, n) from inside
        # the lambda — see dedupe._shifted_zip for why
        grams = words.select(
            F.col(group_col),
            F.explode(
                F.transform(
                    _shifted_zip(F.col("__ws"), n),
                    lambda x: F.concat_ws(
                        " ", *[x[f"w{j}"] for j in range(n)]
                    ),
                )
            ).alias("__gram"),
        )
    per_gram = grams.groupBy(group_col, "__gram").agg(F.count("*").alias("__c"))
    return per_gram.groupBy(group_col).agg(
        F.sum("__c").alias("total_ngrams"),
        F.count("*").alias("distinct_ngrams"),
        F.round(F.count("*") / F.sum("__c"), 6).alias("diversity"),
    )
