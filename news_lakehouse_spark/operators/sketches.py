"""Count-Min sketch over a token stream — mergeable heavy-hitter
counting at corpus scale.

The sketch (Cormode & Muthukrishnan 2005) is a depth×width counter
grid; each occurrence increments one bucket per row (hash_r(token) mod
width), and a point estimate is the MIN over the depth rows. Two
properties make it the 100 TB counting structure:

- the grid is a groupBy((row, bucket)) count — map-side partial
  aggregation compresses every executor's contribution to ≤
  depth×width cells before the (tiny) shuffle, regardless of corpus
  size;
- grids from disjoint corpora merge by cell-wise addition, so
  incremental ingest just adds sketches.

Estimates are one-sided: est ≥ exact always (collisions only ADD);
est ≤ exact + ε·N with high probability (ε ≈ e/width). The oracle
contract in queries.x_cms_heavy_hitters pins exactly those bounds.

The row hashes reuse the engine-portable sha2 bucket scheme
(operators.importance) with a per-row salt, so an external engine can
reproduce the grid cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(token: Column, row: int, width: int) -> Column:
    from news_lakehouse_spark.functions.keys import sha2_prefix_long

    salted = F.concat_ws("#", F.lit(f"cms{row}"), token)
    return sha2_prefix_long(salted, 8) % width


def count_min_sketch(
    tokens: DataFrame,
    token_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch grid: one row per non-empty (row, bucket) cell.

    One scan, one tiny shuffle (map-side combined to ≤ depth×width
    rows per executor). Output: (row, bucket, cnt).
    """
    t = F.col(token_col)
    cells = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(t, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate each query token's frequency from the grid.

    The grid broadcasts (≤ depth×width cells); each query token joins
    its depth cells and takes the min — no shuffle of anything
    corpus-sized. Output: (token_col, est).
    """
    t = F.col(token_col)
    probes = queries.select(
        t.alias(token_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(t, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(token_col, "c.row", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def hll_daily_rollup(
    df: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Distinct counting via mergeable HLL sketches: build one Apache
    DataSketches HLL per (group, day), then union the day sketches per
    group and read the estimate.

    This is the 100 TB distinct-count pattern: each ingest increment
    materializes only its own day's fixed-size sketches (a few KB per
    group), and any coarser rollup — weekly, all-time, cross-source —
    is a cell-wise sketch union, never a re-scan of raw data. The HLL
    union is register-wise max, so the merged sketch is IDENTICAL to a
    sketch built over the raw union — merging loses nothing, which
    queries.x_hll_rollup pins with a merged≡direct equality bit.

    Output: (group, est_distinct long).
    """
    daily = df.groupBy(group_col, day_col).agg(
        F.hll_sketch_agg(value_col).alias("__sketch")
    )
    merged = daily.groupBy(group_col).agg(F.hll_union_agg("__sketch").alias("__sketch"))
    return merged.select(
        group_col, F.hll_sketch_estimate("__sketch").alias("est_distinct")
    )


def kll_daily_rollup(
    df: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
    ranks: tuple[float, ...] = (0.5, 0.95),
    k: int = 200,
) -> DataFrame:
    """Quantile estimation via mergeable KLL sketches (Karnin, Lang &
    Liberty 2016): build one Apache DataSketches KllDoublesSketch per
    (group, day), fold the day sketches per group, and read quantile
    estimates at the requested ranks.

    Same incremental-rollup shape as hll_daily_rollup: each ingest
    increment materializes only its own day's fixed-size sketches
    (O(k·log(n/k)) floats ≈ KBs at k=200), and coarser rollups merge
    sketches instead of re-scanning raw data — the 100 TB percentile
    pattern (exact `percentile` would shuffle every raw value).

    Spark exposes the KLL merge only as a binary scalar
    (kll_sketch_merge_double), not an aggregate, so the per-group fold
    runs JVM-side via F.aggregate over collect_list of the daily
    sketches. That keeps each group's merge on one executor and is
    bounded by days-per-group (≤366/year at a few KB each), NOT by row
    count — the documented assumption is a calendar-bounded day
    domain, the same bound the daily-partition layout itself implies.

    KLL quantiles carry a rank error ε ≈ 1.65% at k=200 (99%
    confidence): the returned value's TRUE rank lies in [p-ε, p+ε].
    queries.x_kll_rollup pins that contract against exact percentiles.

    Output: (group, p<rank·100> double ...).
    """
    daily = df.groupBy(group_col, day_col).agg(
        F.kll_sketch_agg_double(value_col, k).alias("__sketch")
    )
    per_group = daily.groupBy(group_col).agg(
        F.collect_list("__sketch").alias("__sketches")
    )
    merged = per_group.select(
        group_col,
        F.aggregate(
            F.slice(
                "__sketches", 2, F.greatest(F.size("__sketches") - 1, F.lit(0))
            ),
            F.element_at("__sketches", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("__sketch"),
    )
    quantiles = [
        F.kll_sketch_get_quantile_double("__sketch", F.lit(float(r))).alias(
            f"p{round(r * 100):d}"
        )
        for r in ranks
    ]
    return merged.select(group_col, *quantiles)


def exact_order_statistics(
    df: DataFrame,
    value_col: str,
    ps: tuple[float, ...] = (0.5,),
    accuracy: int = 100_000,
) -> DataFrame:
    """EXACT global order statistics — the value at rank ceil(p·n) —
    without ever globally sorting the table.

    Spark's exact ``percentile`` aggregate buffers every value in the
    aggregation state (fatal at 100 TB), and a global orderBy is a
    full-table range shuffle. This instead runs the classic
    distributed selection: a percentile_approx probe at p ± 2/accuracy
    brackets each answer (GK sketch rank error is a deterministic
    <= 1/accuracy), one exact aggregate counts rows below/inside every
    bracket, and only each ~6n/accuracy-row band (60k rows of a
    10^9-row table at the default) is ever sorted to read off the
    exact value. Bracketing is asserted, not assumed — a violation
    raises rather than returning a near-miss. Same boundary-band idea
    as sampling._cutoff_with_limits, specialized to global ranks.

    All requested ps SHARE one sketch+count scan and one edge-count
    scan (the per-p work is only the band branch), so the full-scan
    count is len(ps) + 2, not 3·len(ps) — at 100 TB the scans are the
    whole cost. The band filter is evaluated against a 1-row broadcast
    (runtime values cannot reach PushedFilters), so each band branch
    reads the single value column once and discards non-band rows in
    the scan stage.

    The result is the DISCRETE order statistic (quantile_disc), a real
    data value — reproducible bit-for-bit on any engine, unlike
    interpolated percentiles. Nulls are excluded from n and from
    ranking. Fully lazy: every intermediate is a 1-row broadcast, no
    driver collect.

    Returns a single row with one column ``p<100p>`` per requested p
    (p=0.5 -> p50, p=0.999 -> p99_9).
    """
    if not ps:
        raise ValueError("ps must name at least one quantile")
    for p in ps:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"p must be in (0, 1], got {p}")
    slack = 2.0 / accuracy
    names = [f"p{p * 100:g}".replace(".", "_") for p in ps]
    asks: list[float] = []
    for p in ps:
        asks += [max(0.0, p - slack), min(1.0, p + slack)]
    probe = df.agg(
        F.percentile_approx(value_col, asks, accuracy).alias("__b"),
        F.count(value_col).alias("__n"),
    )
    bounds = []
    for i, p in enumerate(ps):
        bounds += [
            F.element_at("__b", 2 * i + 1).alias(f"__lo{i}"),
            F.element_at("__b", 2 * i + 2).alias(f"__hi{i}"),
            F.ceil(F.lit(float(p)) * F.col("__n")).cast("long").alias(f"__k{i}"),
        ]
    probe = probe.select(*bounds)
    v = df.select(F.col(value_col).alias("__v")).join(F.broadcast(probe))
    aggs = []
    for i in range(len(ps)):
        aggs += [
            F.sum((F.col("__v") < F.col(f"__lo{i}")).cast("long")).alias(
                f"__c_lo{i}"
            ),
            F.sum((F.col("__v") <= F.col(f"__hi{i}")).cast("long")).alias(
                f"__c_hi{i}"
            ),
            F.first(f"__k{i}").alias(f"__k{i}"),
        ]
    edges = v.agg(*aggs)
    needs = edges.select(
        *[
            F.when(
                F.assert_true(
                    (F.col(f"__c_lo{i}") < F.col(f"__k{i}"))
                    & (F.col(f"__k{i}") <= F.col(f"__c_hi{i}")),
                    F.lit(
                        "exact_order_statistics band missed the rank - "
                        "rerun with a larger accuracy"
                    ),
                ).isNull(),
                F.col(f"__k{i}") - F.col(f"__c_lo{i}"),
            ).alias(f"__need{i}")
            for i in range(len(ps))
        ]
    )
    out: DataFrame | None = None
    for i, name in enumerate(names):
        band = v.filter(
            (F.col("__v") >= F.col(f"__lo{i}"))
            & (F.col("__v") <= F.col(f"__hi{i}"))
        ).join(F.broadcast(needs.select(f"__need{i}")))
        # Rank over DISTINCT band values with cumulative counts, not
        # rows: a value duplicated across the rank would otherwise pull
        # its entire duplicate mass into one sort task (ties are the
        # common pathology in price/length columns). The answer is the
        # smallest value whose cumulative count reaches the rank.
        counts = band.groupBy("__v").agg(
            F.count("*").alias("__c"), F.first(f"__need{i}").alias("__need")
        )
        cum = F.sum("__c").over(
            Window.orderBy("__v").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        pick = (
            counts.withColumn("__cum", cum)
            .agg(
                F.min(
                    F.when(F.col("__cum") >= F.col("__need"), F.col("__v"))
                ).alias(name)
            )
        )
        out = pick if out is None else out.crossJoin(F.broadcast(pick))
    return out


def exact_group_order_statistics(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float = 0.5,
    accuracy: int = 100_000,
    out_col: str | None = None,
) -> DataFrame:
    """EXACT per-group order statistic — the value at rank ceil(p·n_g)
    within every group — without sorting any group.

    Per-group twin of exact_order_statistics, and the exact
    counterpart of kll_daily_rollup's estimates. The ask rank p is the
    SAME for every group, so one grouped percentile_approx pass at
    p ± 2/accuracy brackets every group's answer simultaneously (GK
    rank error <= 1/accuracy is per-group); a second grouped aggregate
    counts each group's band edges exactly (bracketing asserted), and
    the per-group window sorts only the ~6·n_g/accuracy-row bands —
    never a whole group, the same skew-proof posture as
    sampling._cutoff_with_limits. Bounds broadcast, so groups must be
    a bounded domain (strata/sources/event types), the standing
    assumption of every grouped-rollup operator here.

    Output: (group, <out_col> ) with the discrete order statistic — a
    real data value, engine-reproducible bit-for-bit. Nulls excluded.
    """
    if not (0.0 < p <= 1.0):
        raise ValueError(f"p must be in (0, 1], got {p}")
    name = out_col or f"p{p * 100:g}".replace(".", "_")
    slack = 2.0 / accuracy
    probe = df.groupBy(group_col).agg(
        F.percentile_approx(
            value_col, [max(0.0, p - slack), min(1.0, p + slack)], accuracy
        ).alias("__b"),
        F.count(value_col).alias("__n"),
    )
    # A group whose value column is entirely NULL has __n = 0, NULL
    # sketch bounds, and no defined order statistic — drop it here (the
    # SQL equivalent also omits such groups) instead of feeding NULL
    # conditions into the bracketing assert, which would abort the job.
    limits = probe.filter(F.col("__n") > 0).select(
        group_col,
        F.element_at("__b", 1).alias("__lo"),
        F.element_at("__b", 2).alias("__hi"),
        F.ceil(F.lit(float(p)) * F.col("__n")).cast("long").alias("__k"),
    )
    base = df.select(group_col, F.col(value_col).alias("__v")).join(
        F.broadcast(limits), group_col
    )
    edges = base.groupBy(group_col).agg(
        F.sum((F.col("__v") < F.col("__lo")).cast("long")).alias("__c_lo"),
        F.sum((F.col("__v") <= F.col("__hi")).cast("long")).alias("__c_hi"),
        F.first("__k").alias("__k"),
    )
    needs = edges.select(
        group_col,
        F.when(
            F.assert_true(
                (F.col("__c_lo") < F.col("__k"))
                & (F.col("__k") <= F.col("__c_hi")),
                F.concat_ws(
                    " ",
                    F.lit("exact_group_order_statistics band missed the"),
                    F.lit("rank for group"),
                    F.col(group_col).cast("string"),
                    F.lit("- rerun with a larger accuracy"),
                ),
            ).isNull(),
            F.col("__k") - F.col("__c_lo"),
        ).alias("__need"),
    )
    band = base.filter(
        (F.col("__v") >= F.col("__lo")) & (F.col("__v") <= F.col("__hi"))
    ).join(F.broadcast(needs), group_col)
    # Distinct-value cumulative ranking (see exact_order_statistics):
    # duplicate-heavy values never pile a whole group's tie mass into
    # one window task.
    counts = band.groupBy(group_col, "__v").agg(
        F.count("*").alias("__c"), F.first("__need").alias("__need")
    )
    cum = F.sum("__c").over(
        Window.partitionBy(group_col)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        counts.withColumn("__cum", cum)
        .groupBy(group_col)
        .agg(
            F.min(
                F.when(F.col("__cum") >= F.col("__need"), F.col("__v"))
            ).alias(name)
        )
    )


def kmv_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch per group — the
    bottom-k theta-sketch family (Bar-Yossef et al. 2002): keep the k
    smallest hash values of the column's DISTINCT elements. Where HLL
    only unions, KMV supports INTERSECTION estimates (audience
    overlap between segments) because the kept hashes are a uniform
    sample of the distinct universe.

    Two-level min-k, the same partial-top-k shape as the cosine
    brute-force reducer: each input partition reduces its group's
    distinct hashes to its k smallest BEFORE the shuffle, so at most
    k x partitions values move per group regardless of cardinality.
    The hash is the engine-portable sha2 idiom (functions.keys), so an
    external engine — and the DuckDB oracle — reproduces the sketch
    value-for-value. Output: key cols + ``kmv`` (sorted array<long>,
    ≤ k entries; fewer means the group's true distinct count is below
    k and estimates become exact).
    """
    from news_lakehouse_spark.functions.keys import sha2_prefix_long

    h = sha2_prefix_long(
        F.concat_ws("#", F.lit("kmv"), F.col(value_col).cast("string")), 15
    )
    mink = F.slice(F.array_sort(F.collect_set("__h")), 1, k)
    lvl1 = (
        df.select(*key_cols, h.alias("__h"))
        .withColumn("__part", F.spark_partition_id())
        .groupBy(*key_cols, "__part")
        .agg(mink.alias("__hs"))
        .select(*key_cols, F.explode("__hs").alias("__h"))
    )
    return lvl1.groupBy(*key_cols).agg(mink.alias("kmv"))


# Hash domain of the 15-hex sha2 prefix: [0, 16^15).
_KMV_DOMAIN = float(16**15)


def kmv_distinct_estimate(kmv: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV array: exact size when the
    sketch is unsaturated (< k values — every distinct hash is
    present), else (k-1)/u_k with u_k the kth smallest hash normalized
    to (0,1]. Relative error ~ 1/sqrt(k-2)."""
    n = F.size(kmv)
    u_k = F.element_at(kmv, k) / F.lit(_KMV_DOMAIN)
    return F.when(n < k, n.cast("double")).otherwise((k - 1) / u_k)


def kmv_intersect_estimate(a: Column, b: Column, k: int) -> dict[str, Column]:
    """Intersection / union / Jaccard estimates from two same-k KMV
    arrays: the k smallest of the COMBINED hashes are a uniform sample
    of the union, so the fraction of that sample present in BOTH
    sketches estimates Jaccard, and intersection = jaccard x
    union_estimate. Returns {'union_est', 'jaccard_est',
    'intersect_est'} column expressions (all exact when both sketches
    are unsaturated)."""
    combined = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    k_eff = F.size(combined)
    u_k = F.element_at(combined, k) / F.lit(_KMV_DOMAIN)
    union_est = F.when(k_eff < k, k_eff.cast("double")).otherwise(
        (k - 1) / u_k
    )
    sample = F.when(k_eff < k, combined).otherwise(
        F.slice(combined, 1, k - 1)
    )
    both = F.size(F.array_intersect(F.array_intersect(sample, a), b))
    denom = F.when(k_eff < k, k_eff).otherwise(F.lit(k - 1))
    jaccard = both / denom
    return {
        "union_est": union_est,
        "jaccard_est": jaccard,
        "intersect_est": jaccard * union_est,
    }


def kmv_merge(kmv_col: Column, k: int) -> Column:
    """Aggregate expression merging grouped KMV sketches: the bottom-k
    of the union of all hashes — EXACTLY the sketch of the combined
    input (bottom-k is a lossless-merge summary, like HLL registers):
    daily sketches roll up to weekly/monthly without touching raw
    data, the property that makes a sketch a sketch."""
    return F.slice(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(kmv_col)))
        ),
        1,
        k,
    )
