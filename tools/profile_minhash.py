"""Piecewise profile of the minhash-LSH pipeline at sf0.1 (guide §1):
times each sub-frame with the noop sink so the 2.1 s bench row can be
attributed to shingles / signatures / banding / candidate join /
exact verify."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def t(label, df, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:38s} {best:7.3f}s")
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from news_lakehouse_spark.operators import dedupe as D
    from news_lakehouse_spark.session import build_session
    from news_lakehouse_spark.sources.readers import read_table

    spark = build_session("profile_minhash")
    spark.range(256, numPartitions=32).mapInPandas(lambda i: i, "id long").count()
    d = read_table(spark, sf_dir, "documents")
    print("docs:", d.count())

    sh = D._with_hashed_shingles(d, "doc_id", "text", 3)
    t("shingles (uncached)", sh)
    shc = sh.persist(StorageLevel.MEMORY_AND_DISK)
    shc.count()
    sigs = D._signatures_from_shingles(shc, "doc_id", 128, 42)
    t("signatures (arrow, cached shingles)", sigs)
    bands = D._band_entries(sigs, "doc_id", 32, 4)
    t("band entries", bands)
    left, right = bands.alias("l"), bands.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .distinct()
    )
    t("candidates (band self-join+distinct)", cands)
    print("  n_candidates:", cands.count())
    full = D.minhash_near_duplicates(d, "doc_id", "text", 3, 128, 32, 0.8)
    t("full pipeline", full, runs=5)


if __name__ == "__main__":
    main()
