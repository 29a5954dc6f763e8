"""Scale probe: run the heavy operators at 10-20x the bench fixture.

The sf0.1 bench answers "is it fast"; this answers "does the plan's
cost grow like it should". It replicates the sf0.1 tables with
key-offset copies into /tmp (documents/embeddings 20x, lineitem/orders
10x), runs the heaviest queries unchanged against both sizes, and
writes SCALE.md with wall times and the observed scaling exponent
log(t_big/t_small)/log(factor) — ~1.0 means linear in input size,
which is what every probed plan should be (near-dup pair OUTPUT grows
faster by construction: each replicated document gains 19 near-copies).

Replicas are near-duplicates, not byte-duplicates (a copy marker is
appended to text), so the dedup family does real similarity work, and
all surrogate keys are offset so joins stay key-unique.

Usage: python tools/scale_probe.py [base_sf_dir] (default sf0.1)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG_DIR = "/tmp/spark_graft_scale"

# query -> (driving table, replication factor of that table)
PROBES = {
    "q1_pricing_summary": ("lineitem", 10),
    "q3_shipping_priority": ("lineitem", 10),
    "q18_large_volume_customers": ("lineitem", 10),
    "a2_dedup_exact": ("documents", 20),
    "x_dedup_minhash_lsh": ("documents", 20),
    "x_dsir_weights": ("documents", 20),
    "x_corpus_pipeline": ("documents", 20),
    "x_cms_heavy_hitters": ("documents", 20),
    "x_bm25_search": ("documents", 20),
    "x_sim_topk_bruteforce": ("embeddings", 20),
    "x_semdedup": ("embeddings", 20),
    "w3_rolling_time_window": ("events", 10),
    # round-3 additions: TPC-H completion + label propagation
    "q9_product_type_profit": ("lineitem", 10),
    "q13_customer_distribution": ("orders", 10),
    "x_knn_classify": ("embeddings", 20),
    "x_substring_duplication": ("documents", 20),
    "x_embed_quantize": ("embeddings", 20),
    "x_substring_removal": ("documents", 20),
    "x_hll_rollup": ("events", 10),
    "x_kll_rollup": ("events", 10),
    "x_weighted_sample": ("documents", 20),
    "x_exact_percentile": ("lineitem", 10),
    "x_exact_group_median": ("events", 10),
    # round-4 additions: incremental semantic ingest + corpus analytics
    "x_semdedup_incremental": ("embeddings", 20),
    "x_ngram_diversity": ("documents", 20),
    # round-5 additions: versioned table layer at 10x data (each query
    # rebuilds its table from scratch per run, so the timing covers
    # commit + manifest + read work end-to-end)
    "x_time_travel": ("orders", 10),
    "x_table_changes": ("orders", 10),
    "x_stats_pruned_read": ("orders", 10),
    "x_changes_across_compact": ("orders", 10),
    # round-6 additions: merge-on-read delete (tombstone commit + MOR
    # read), bloom point lookup (sidecar build + pruned read), CDC
    # replication (feed-sized replica maintenance)
    "x_mor_delete": ("orders", 10),
    "x_bloom_point_lookup": ("orders", 10),
    "x_cdc_replicate": ("orders", 10),
    "x_ivm_refresh": ("orders", 10),
    # round-6 additions: metadata tables, partition evolution, PQ ANN
    "x_table_metadata": ("orders", 10),
    "x_partition_evolution": ("orders", 10),
    "x_sim_pq_topk": ("embeddings", 20),
    # round-6 late additions: maintenance, fuzzy join, resample, KMV,
    # incremental PQ index
    "x_partial_compact": ("orders", 10),
    "x_fuzzy_join": ("documents", 20),
    "x_resample_ffill": ("events", 10),
    "x_kmv_rollup": ("events", 10),
    "x_pq_index_incremental": ("embeddings", 20),
    # round-7 additions: field-id schema evolution (metadata-only
    # commits + mixed-epoch read) and the prefix-filtered fuzzy join
    # re-probe rides the existing x_fuzzy_join row
    "x_schema_evolution": ("orders", 10),
    # r8: nested-field evolution — same metadata-only mechanics, plus
    # the fid-mapped array<struct> read projection over mixed epochs
    "x_nested_evolution": ("orders", 10),
    # r8: z-order clustered compact + 2-D bounds pruning (in-plan
    # fewer-files assert must hold at 10x too)
    "x_zorder_pruned_read": ("orders", 10),
    # r9: large-star/small-star CC (chains grow 20x longer -> round
    # count must grow ~log, not linearly), metadata-only aggregates
    # (commit cost scales with data; the aggregate is metadata-sized)
    "x_cc_large_star": ("documents", 20),
    "x_metadata_agg": ("orders", 10),
    # x_quality_classifier is probed by classifier_probe below, not
    # via the registry query: the operator-level probe times BOTH
    # bucket paths (xxhash64 production default vs the sha2 oracle
    # line) on the same corpus, which the query (pinned to sha2 for
    # its oracle) cannot show.
    # x_source_overlap is NOT probed: its oracle-pinned max_df=100 band
    # (exact at fixture df <= 25) excises the 20x-replicated shingles
    # entirely, so the probe would time an empty output. Its inverted-
    # index plan is the same one x_dedup_minhash_lsh probes.
    # r9 graph + tokenizer family: PageRank cost = iterations x one
    # edge-shuffle (edges grow ~10x with lineitem); triangle wedge
    # join is bounded by degree orientation; BPE rounds scan the
    # corpus (20x chars -> ~linear per round, same #rounds)
    "x_pagerank": ("lineitem", 10),
    "x_pagerank_seeded": ("lineitem", 10),
    "x_triangle_count": ("lineitem", 10),
    "x_bpe_train": ("documents", 20),
    "x_bpe_tokenize": ("documents", 20),
    "x_bfs_distance": ("lineitem", 10),
}


def build_big(spark, base: str) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(BIG_DIR):
        shutil.rmtree(BIG_DIR)
    os.makedirs(BIG_DIR)

    def rep(table: str, factor: int, key_cols: list[str], text_col: str | None = None):
        df = spark.read.parquet(f"{base}/{table}.parquet")
        copies = df.crossJoin(
            spark.range(factor).select(F.col("id").alias("__copy"))
        )
        for k in key_cols:
            copies = copies.withColumn(
                k, (F.col(k) + F.col("__copy") * F.lit(1_000_000_000)).cast("long")
            )
        if text_col:
            copies = copies.withColumn(
                text_col,
                F.when(F.col("__copy") == 0, F.col(text_col)).otherwise(
                    F.concat(F.col(text_col), F.lit(" copyvariant"), F.col("__copy"))
                ),
            )
        copies.drop("__copy").write.mode("overwrite").parquet(
            f"{BIG_DIR}/{table}.parquet"
        )

    rep("documents", 20, ["doc_id"], text_col="text")
    rep("embeddings", 20, ["vec_id"])
    rep("events", 10, ["event_id"])
    rep("lineitem", 10, ["l_orderkey"])
    rep("orders", 10, ["o_orderkey"])
    # dims stay 1x — exactly the 100 TB shape (facts grow, dims don't)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{base}/{t}.parquet", f"{BIG_DIR}/{t}.parquet")


def depth_probe(spark, base: str) -> list[str]:
    """Manifest-DEPTH probe for the versioned table layer: the data
    probes above scale the rows; this scales the VERSION COUNT (10 vs
    50 commits) so manifest handling gets an exponent like every other
    family. Each commit merges one order-month partition (the
    realistic incremental shape: one partition rewritten, ~all files
    carried by reference), so per-commit data work is constant and any
    superlinear growth is manifest overhead. exp = log(t50/t10)/log(5):
    merge_total ~1 (linear in commits), time-travel read of an EARLY
    version / compact / stats-pruned read ~0 (depth-independent).
    changes(1, latest) grows with accumulated churn (~linear)."""
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from news_lakehouse_spark.sources.transaction import VersionedParquetTable

    orders = (
        spark.read.parquet(f"{base}/orders.parquet")
        .filter(F.col("o_orderkey") % 4 == 0)
        .select(
            "o_orderkey",
            F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
                "o_month"
            ),
            "o_totalprice",
        )
        .cache()
    )
    orders.count()
    months = sorted(
        r["o_month"] for r in orders.select("o_month").distinct().collect()
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn, reps: int = 3) -> float:
        best = math.inf
        for _ in range(reps):
            t0 = _time.perf_counter()
            fn()
            best = min(best, _time.perf_counter() - t0)
        return best

    metrics: dict[int, dict[str, float]] = {}
    for depth in (10, 50):
        path = tempfile.mkdtemp(prefix=f"nlh_depth{depth}_")
        shutil.rmtree(path)
        t = VersionedParquetTable(spark, path)
        t0 = _time.perf_counter()
        t.write(orders, partition_by=["o_month"])
        for i in range(depth - 1):
            m = months[i % len(months)]
            batch = orders.filter(F.col("o_month") == m).withColumn(
                "o_totalprice", F.col("o_totalprice") + i + 1
            )
            t.merge(batch, ["o_orderkey"])
        merge_total = _time.perf_counter() - t0
        metrics[depth] = {
            "merge_total": merge_total,
            "merge_per_commit": merge_total / depth,
            "time_travel_read_v2": timed(lambda: noop(t.read(version=2))),
            "stats_pruned_read": timed(
                lambda: noop(
                    t.read(predicate=[("o_totalprice", ">=", 300000.0)])
                )
            ),
            "changes_full_history": timed(
                lambda: noop(t.changes(1)), reps=2
            ),
            "compact": timed(lambda: t.compact(), reps=1),
        }
        shutil.rmtree(path)
    orders.unpersist()

    lines = [
        "",
        "## Manifest-depth probe (versioned table layer)",
        "",
        "Version count 10 vs 50 (5x), one order-month partition merged",
        "per commit at 1x data — per-commit data work constant, so the",
        "exponent isolates manifest/metadata overhead. exp =",
        "log(t50/t10)/log(5): merge_total ~1 = flat per-commit cost;",
        "reads/compact ~0 = depth-independent; changes(1, latest) scans",
        "accumulated churn so ~1 is expected.",
        "",
        "| metric | t@10 versions (s) | t@50 versions (s) | exp vs depth |",
        "|---|---|---|---|",
    ]
    for key in metrics[10]:
        a, b = metrics[10][key], metrics[50][key]
        exp = math.log(b / a) / math.log(5) if a > 0 else float("nan")
        lines.append(f"| {key} | {a:.2f} | {b:.2f} | {exp:.2f} |")
        print(lines[-1], file=sys.stderr)
    return lines


def evolution_probe(spark, base: str) -> list[str]:
    """Partition-evolution + partial-compaction probe: both must cost
    ~0 in TABLE size. Two tables share an IDENTICAL chosen month; the
    big one carries 16x the rows everywhere else. exp =
    log(t_big/t_small)/log(16): set_partition_spec (one manifest
    write) and compact(partitions=[chosen]) (reads only that month's
    files) ~0; full compact() ~1 is the contrast row — the cost
    partial compaction exists to avoid."""
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from news_lakehouse_spark.sources.transaction import VersionedParquetTable

    orders = spark.read.parquet(f"{base}/orders.parquet").select(
        "o_orderkey",
        F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
            "o_month"
        ),
        (F.col("o_orderkey") % 4).alias("o_kbin"),
        "o_totalprice",
    )
    chosen = orders.agg(F.min("o_month")).first()[0]
    small_df = orders.filter(F.col("o_orderkey") % 16 == 0)
    big_df = orders.filter(
        (F.col("o_month") != chosen) | (F.col("o_orderkey") % 16 == 0)
    )

    def timed(fn, reps: int = 3) -> float:
        best = math.inf
        for _ in range(reps):
            t0 = _time.perf_counter()
            fn()
            best = min(best, _time.perf_counter() - t0)
        return best

    metrics: dict[str, dict[str, float]] = {}
    for label, df in (("small", small_df), ("big", big_df)):
        path = tempfile.mkdtemp(prefix=f"nlh_evo_{label}_")
        shutil.rmtree(path)
        t = VersionedParquetTable(spark, path)
        t.write(df, partition_by=["o_month"])
        specs = [["o_month", "o_kbin"], ["o_month"]]
        state = {"i": 0}

        def evolve():
            t.set_partition_spec(specs[state["i"] % 2])
            state["i"] += 1

        metrics[label] = {
            "set_partition_spec": timed(evolve),
            "plan_compaction": timed(t.plan_compaction),
            "partial_compact_one_month": timed(
                lambda: t.compact(partitions=[{"o_month": chosen}]), reps=2
            ),
            "full_compact": timed(t.compact, reps=1),
        }
        shutil.rmtree(path)

    lines = [
        "",
        "## Partition-evolution + partial-compaction probe",
        "",
        "Two tables with an IDENTICAL chosen month; the big table is",
        "16x everywhere else. exp = log(t_big/t_small)/log(16):",
        "set_partition_spec is one manifest write and",
        "compact(partitions=[chosen]) reads only that month, so both",
        "~0 (flat in table size); full compact() rewrites the whole",
        "table and is the contrast row — at sf0.1 its absolute time is",
        "still part-dominated by fixed per-commit overhead, so read",
        "the partial-vs-full ABSOLUTE gap on the big table, not just",
        "the exponent. plan_compaction is metadata-only (manifest",
        "parse, no data read).",
        "",
        "| metric | t_small (s) | t_big (s) | exp vs 16x data |",
        "|---|---|---|---|",
    ]
    for key in metrics["small"]:
        a, b = metrics["small"][key], metrics["big"][key]
        exp = math.log(b / a) / math.log(16) if a > 0 else float("nan")
        lines.append(f"| {key} | {a:.3f} | {b:.3f} | {exp:.2f} |")
        print(lines[-1], file=sys.stderr)
    return lines


def classifier_probe(spark, base: str) -> list[str]:
    """Hashed-linear classifier at 1x vs 20x docs, BOTH bucket paths.

    The production question: inference is one scan of per-row codegen
    (transform+aggregate HOFs, broadcast literal weights) — wall time
    must grow ~linearly in corpus size (exp ~1 once the scan dominates
    fixed overhead), and the xxhash64 default must hold a large
    constant-factor lead over the sha2 oracle path (the reason it IS
    the default)."""
    from news_lakehouse_spark.operators.classify import (
        hashed_linear_score,
        pseudo_weights,
    )

    w = pseudo_weights(512)

    def t_of(sf_dir: str, hash: str) -> float:
        best = float("inf")
        for _ in range(3):
            df = spark.read.parquet(f"{sf_dir}/documents.parquet")
            t0 = time.perf_counter()
            hashed_linear_score(df, "text", w, hash=hash).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = []
    ratios = {}
    for h in ("xxhash64", "sha2"):
        small, big = t_of(base, h), t_of(BIG_DIR, h)
        exp = math.log(big / small) / math.log(20)
        ratios[h] = (small, big)
        rows.append(f"| {h} | {small:.2f} | {big:.2f} | {exp:.2f} |")
    lead = ratios["sha2"][1] / ratios["xxhash64"][1]
    return [
        "",
        "## Hashed-linear classifier probe (bucket-path cost, r9)",
        "",
        "Operator-level (not the registry query, which pins the sha2",
        "oracle path): one full-materialization scan per cell, min of",
        f"3. At 20x docs the sha2 line costs {lead:.1f}x the xxhash64",
        "default on this host — interpreted HOF evaluation dominates",
        "both paths (same plan shape: no shuffle, no Python), so the",
        "portable line stays affordable where reproducibility",
        "matters.",
        "",
        "| hash | t_1x (s) | t_20x (s) | exp |",
        "|---|---|---|---|",
        *rows,
    ]


def prefix_probe(spark, _base: str) -> list[str]:
    """ppjoin prefix cut in its BLOWUP regime (r7 verdict #5).

    The bench corpus never triggers the auto-chooser (its true-pair
    density means the cut removes little), so this probe builds the
    corpus shape the cut EXISTS for: every doc carries 10 global
    stopwords (df = N), 8 group tokens shared by its 5-doc near-dup
    group (the true pairs) and 1 unique token. At threshold 0.8 the
    prefix is the 4 RAREST tokens (unique + group — the stopwords rank
    last in the df-ascending order and fall out of every prefix), so
    prefix candidates are within-group only (~O(N)) while the direct
    plan's candidates are stopword-driven (~10·N²). Both plans remain
    EXACT — identical output, asserted below — the cut only changes
    the candidate set.

    Asserts in-plan: candidate count materially below direct (>100x
    here), identical result multiset, and the auto-chooser selecting
    the cut on the big fixture. Reported: exact candidate counts and
    full-join wall time for both plans at N and 3N (direct's time
    should grow ~quadratically = exp ~2 vs the probe's 3x factor;
    prefix ~linearly)."""
    import time as _time

    from pyspark.sql import functions as F

    from news_lakehouse_spark.operators.fuzzyjoin import (
        PREFIX_BLOWUP_FACTOR,
        PREFIX_MIN_CANDIDATES,
        _candidate_pairs,
        _estimate_direct_candidates,
        _token_sets,
        fuzzy_token_join,
    )

    stop = " ".join(f"stop{j}" for j in range(10))

    def fixture(n: int):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit(stop),
                # no underscores: the \p{L}\p{N} tokenizer splits on
                # them, which would shatter the group tokens into
                # high-df digit fragments
                *[
                    F.concat(
                        F.lit("g"),
                        (F.col("id") / 5).cast("long"),
                        F.lit(f"x{j}"),
                    )
                    for j in range(8)
                ],
                F.concat(F.lit("u"), F.col("id")),
            ).alias("text"),
        )

    n_small, factor = 2000, 3
    rows = []
    results = {}
    for n in (n_small, n_small * factor):
        docs = fixture(n).cache()
        docs.count()
        _, l_post = _token_sets(docs, "doc_id", "text", "l")
        _, r_post = _token_sets(docs, "doc_id", "text", "r")
        df_counts = r_post.groupBy("token").agg(F.count("*").alias("__df"))
        cand_direct, postings = _estimate_direct_candidates(
            l_post, df_counts, max_df=10**9
        )
        cand_prefix = _candidate_pairs(
            l_post, r_post, 0.8, 10**9, prefix_filter=True
        ).count()
        timings = {}
        out_counts = {}
        for mode in (True, False):
            t0 = _time.perf_counter()
            out_counts[mode] = fuzzy_token_join(
                docs, docs, "doc_id", "doc_id", "text", "text",
                threshold=0.8, max_df=10**9, prefix_filter=mode,
            ).count()
            timings[mode] = _time.perf_counter() - t0
        assert out_counts[True] == out_counts[False], (
            "prefix cut changed the result"
        )
        assert cand_prefix * 100 < cand_direct, (
            f"cut not material: {cand_prefix} vs {cand_direct}"
        )
        results[n] = (cand_direct, cand_prefix, timings)
        rows.append(
            f"| {n} docs self-join | {cand_direct} | {cand_prefix} "
            f"| {timings[False]:.2f} | {timings[True]:.2f} "
            f"| {out_counts[True]} |"
        )
        if n > n_small:  # auto-chooser must take the cut here
            assert cand_direct > max(
                PREFIX_BLOWUP_FACTOR * postings, PREFIX_MIN_CANDIDATES
            ), "fixture no longer reaches the auto-trigger"
        docs.unpersist()
    cd_s, cp_s, t_s = results[n_small]
    cd_b, cp_b, t_b = results[n_small * factor]
    exp_cd = math.log(cd_b / cd_s) / math.log(factor)
    exp_cp = math.log(cp_b / cp_s) / math.log(factor)
    exp_t_direct = math.log(t_b[False] / t_s[False]) / math.log(factor)
    exp_t_prefix = math.log(t_b[True] / t_s[True]) / math.log(factor)
    return [
        "",
        "## ppjoin prefix-cut blowup probe (fuzzy join, r7 verdict #5)",
        "",
        "Stopword-heavy fixture (10 global stopwords per doc, 5-doc",
        "near-dup groups, threshold 0.8) — the quadratic regime the",
        "direct plan cannot bound. Both plans are exact (identical",
        "output, asserted); candidates are the exact per-plan counts.",
        f"Candidate exponents vs the {factor}x doc factor: direct",
        f"{exp_cd:.2f} (quadratic — stopword-driven), prefix",
        f"{exp_cp:.2f} (linear — the stopwords fall out of every",
        f"prefix); candidate ratio at {n_small * factor} docs:",
        f"{cd_b / max(cp_b, 1):.0f}x. Wall-time exponents "
        f"direct {exp_t_direct:.2f} / prefix {exp_t_prefix:.2f}",
        "(32-way parallelism + fixed overhead damp the small-N wall",
        "clock below the candidate growth; the candidate counts are",
        "the scale-truth — at 100 TB the direct plan's shuffle IS its",
        "candidate count). The auto-chooser's exact candidate",
        "estimate takes the cut on this corpus (asserted against its",
        "thresholds).",
        "",
        "| fixture | direct cands | prefix cands | t_direct (s) "
        "| t_prefix (s) | true pairs |",
        "|---|---|---|---|---|---|",
        *rows,
    ]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])  # optional probe subset for iteration
    from news_lakehouse_spark.queries import QUERIES
    from news_lakehouse_spark.session import build_session

    spark = build_session("scale_probe")
    spark.range(1).count()
    build_big(spark, base)

    # Adaptive repetition: the exponent uses min-of-runs, so what
    # matters is how reproducible the MIN is, not the worst GC hiccup.
    # Keep sampling (>= min_runs, <= max_runs) until the two fastest
    # runs agree within `tol`; report spread as (2nd_min - min)/min —
    # the uncertainty band of the statistic the exponent is computed
    # from. Fixed 3 runs left sub-second queries with ±80-160% worst-
    # case bands that said nothing about the min's stability (r3 ask).
    min_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "4"))
    max_runs = int(os.environ.get("SPARK_GRAFT_PROBE_MAX_RUNS", "9"))
    tol = 0.15

    def run(name: str, sf_dir: str) -> tuple[float, float, int]:
        times: list[float] = []
        n = QUERIES[name](spark, sf_dir).count()
        while True:
            t0 = time.perf_counter()
            # noop sink = full-column materialization; count() lets
            # Catalyst prune final columns/joins and under-time (see
            # bench.py)
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
            if len(times) >= min_runs:
                best, second = sorted(times)[:2]
                if (second - best) / best <= tol or len(times) >= max_runs:
                    return best, (second - best) / best, n

    lines = [
        "# SCALE — 10-20x probe vs the sf0.1 bench fixture",
        "",
        f"Generated by tools/scale_probe.py. Facts replicated with offset keys",
        "(documents/embeddings 20x as near-duplicates, lineitem/orders/events",
        "10x); dims kept 1x — the 100 TB shape. exp = log(t_big/t_small)/",
        "log(factor): ~1 linear, <1 sublinear (fixed overhead amortizing),",
        ">1 superlinear (the thing to investigate; near-dup queries emit",
        "~19 extra true pairs per doc by construction, so their OUTPUT",
        "grows faster than input and exp > 1 is expected there).",
        "",
        f"Each timing is the min of {min_runs}-{max_runs} adaptive",
        "full-materialization runs (noop sink — every output column",
        "computed), sampled until the two fastest agree within 15%;",
        "`spread` is (2nd_min - min)/min — the stability band of the",
        "statistic the exponent is computed from (a worst-run band only",
        "measured GC hiccups, r3 ask).",
        "",
        "| query | factor | t_small (s) | t_big (s) | rows_big | exp | spread |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, (_table, factor) in PROBES.items():
        if only and name not in only:
            continue
        t_small, sp_small, _ = run(name, base)
        t_big, sp_big, n_big = run(name, BIG_DIR)
        exp = math.log(t_big / t_small) / math.log(factor)
        spread = max(sp_small, sp_big)
        lines.append(
            f"| {name} | {factor}x | {t_small:.2f} | {t_big:.2f} | {n_big} "
            f"| {exp:.2f} | ±{spread:.0%} |"
        )
        print(lines[-1], file=sys.stderr)

    if not only or "depth" in only:
        lines.extend(depth_probe(spark, base))
    if not only or "evolution" in only:
        lines.extend(evolution_probe(spark, base))
    if not only or "prefix" in only:
        lines.extend(prefix_probe(spark, base))
    if not only or "classifier" in only:
        lines.extend(classifier_probe(spark, base))

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    if only:  # subset iteration: print, don't clobber the full report
        print("\n".join(lines))
        return
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
