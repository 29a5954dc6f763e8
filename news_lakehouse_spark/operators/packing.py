"""Sequence packing: bin documents into fixed token budgets.

Training pipelines pack variable-length documents into fixed-size
context windows (e.g. 8192 tokens) to avoid padding waste. Optimal bin
packing is NP-hard and inherently sequential, so the distributed
design is PARTITION-LOCAL first-fit-decreasing: each partition packs
its own documents independently (no cross-partition bins, no shuffle
beyond the initial spread), which costs a few percent of fill
efficiency and buys linear scale-out — the standard trade every large
training-prep pipeline makes.

This is one of the few justified Python boundaries in the package
(see SURVEY §6 policy): packing is a sequential greedy fold that
column algebra cannot express; it runs as an Arrow-batched
mapInPandas. First-fit-DECREASING sorts, so each task materializes
its partition's (id, length) pairs — two machine words per document —
before folding; size partitions so that fits comfortably (1e8 docs ≈
a few GB per task is the practical ceiling; a streaming next-fit
variant would hold O(#bins) but give up the FFD fill guarantee).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "pack_id string, doc_ids array<long>, n_docs int, total_tokens long"
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """(pack_id, doc_ids, n_docs, total_tokens) bins with
    total_tokens <= budget; docs longer than budget get a singleton bin
    (truncation is the caller's policy decision, not the packer's).

    Deterministic for a fixed partitioning: rows are packed in
    descending length (first-fit-decreasing ~ 11/9 OPT); pass
    ``num_partitions`` to pin the hash partitioning when exact
    reproducibility across runs matters.
    """
    import pandas as pd

    src = df.select(F.col(id_col).alias("doc_id"), F.col(len_col).alias("n"))
    # fail loudly at plan time, not as a TypeError inside an executor's
    # sort: a NULL length is an upstream tokenization bug
    src = src.withColumn(
        "n",
        F.when(F.col("n").isNull(), F.raise_error(
            F.lit("pack_sequences: NULL token length (fix upstream tokenization)")
        )).otherwise(F.col("n")),
    )
    if num_partitions:
        src = src.repartition(num_partitions, "doc_id")

    def pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rows: list[tuple[int, int]] = []
        for pdf in batches:
            rows.extend(zip(pdf["doc_id"].tolist(), pdf["n"].tolist()))
        rows.sort(key=lambda r: (-r[1], r[0]))
        bins: list[list] = []  # [total, ids]
        for doc_id, n in rows:
            for b in bins:
                if b[0] + n <= budget:
                    b[0] += n
                    b[1].append(doc_id)
                    break
            else:
                bins.append([n, [doc_id]])  # oversize docs: singleton bin
        if not bins:
            # typed empties: default float64 columns break Arrow's
            # conversion to the declared list/int schema
            yield pd.DataFrame(
                {
                    "pack_id": pd.Series([], dtype=object),
                    "doc_ids": pd.Series([], dtype=object),
                    "n_docs": pd.Series([], dtype="int32"),
                    "total_tokens": pd.Series([], dtype="int64"),
                }
            )
            return
        yield pd.DataFrame(
            {
                "pack_id": [f"p{pid}_{i}" for i in range(len(bins))],
                # dtype=object: equal-length id lists otherwise collapse
                # into a 2-D numpy block Arrow cannot convert to list<long>
                "doc_ids": pd.Series(
                    [sorted(ids) for _, ids in bins], dtype=object
                ),
                "n_docs": [len(ids) for _, ids in bins],
                "total_tokens": [total for total, _ in bins],
            }
        )

    return src.mapInPandas(pack, schema=PACK_SCHEMA)
