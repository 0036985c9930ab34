"""Sequence packing for LLM training: lay documents end-to-end in a
deterministic order and cut the token stream into fixed-length training
sequences (GPT-style packing — documents may span sequence boundaries).

The core is a DISTRIBUTED prefix sum: a global window would funnel the
whole table through one task, so the offsets are computed in two levels —
range-partition by the order key, cumsum within each partition (window
partitioned by the partition id), then add per-partition totals prefixed
on the driver (P values, bounded by the partition count). The output is
invariant to where the sampled range boundaries land because range
partitioning preserves the global order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_sequences(df: DataFrame, n_tok_col: str = "n_tok",
                   order_col: str = "doc_id", seq_len: int = 2048,
                   num_parts: int | None = None) -> DataFrame:
    """Adds `start_offset` (the doc's first token's position in the
    packed global stream, 0-based) and `seq_id` (= start_offset div
    seq_len, the training sequence the doc starts in).

    Docs are ordered by `order_col` (must be unique for a deterministic
    pack). Scale shape: one range-partition shuffle + a per-partition
    window; the only driver materialization is the per-partition token
    totals (one row per partition). The ranged relation is persisted so
    the totals job and the output plan see the SAME partition-id
    assignment (AQE may otherwise re-coalesce the shuffle differently
    between the two jobs); the cache is dropped when the returned
    DataFrame is garbage-collected or the caller unpersists."""
    sc_parts = num_parts or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(sc_parts, F.col(order_col))
              .withColumn("_pid", F.spark_partition_id())
              .persist())
    totals = (ranged.groupBy("_pid")
              .agg(F.sum(n_tok_col).alias("_t"))
              .collect())
    base, prefix = 0, {}
    for r in sorted(totals, key=lambda r: r["_pid"]):
        prefix[r["_pid"]] = base
        base += r["_t"] or 0
    pref = F.coalesce(*[F.when(F.col("_pid") == pid, F.lit(off))
                        for pid, off in prefix.items()],
                      F.lit(0)) if prefix else F.lit(0)
    w = (Window.partitionBy("_pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = F.coalesce(F.sum(n_tok_col).over(w), F.lit(0))
    return (ranged
            .withColumn("start_offset", (pref + local).cast("bigint"))
            .withColumn("seq_id",
                        F.floor(F.col("start_offset") / seq_len))
            .drop("_pid"))
