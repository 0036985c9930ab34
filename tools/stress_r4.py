"""Round-4 stress validation: exact substring excision at volume.

Plants an identical BLOCK-token span into `--planted` documents of an
otherwise-unique random corpus, runs `substring_excise`, and asserts the
exact ground truth: the canonical planted doc keeps its block, every
other planted doc loses exactly BLOCK tokens, and untouched docs lose
nothing (the random surround makes cross-doc window collisions vanishingly
unlikely: 64-bit gram space vs ~n_docs·doc_len windows).

    python tools/stress_r4.py [--docs 300000] [--planted 2000]

Prints one JSON line; paste results into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK = 64      # planted span length (tokens)
DOC_LEN = 80    # tokens per doc
K = 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--planted", type=int, default=2_000)
    args = ap.parse_args()

    import pyspark.sql.functions as F
    from tbl_spark.pipelines.dedup import substring_excise
    from tbl_spark.session import get_spark

    spark = get_spark()
    cores = spark.sparkContext.defaultParallelism

    # unique surround: tokens derived from xxhash64(doc_id, position) —
    # executor-side generation, no driver materialization
    base = spark.range(args.docs).select(
        F.format_string("doc-%09d", F.col("id")).alias("doc_id"),
        F.col("id"))
    surround = F.expr(
        f"transform(sequence(1, {DOC_LEN}), "
        f"p -> xxhash64(id, p))")
    block = F.array(*[F.lit(7_000_000 + i) for i in range(BLOCK)])
    # every `stride`-th doc gets the block spliced at position 9
    stride = max(1, args.docs // args.planted)
    planted = F.col("id") % stride == 0
    toks = F.when(
        planted,
        F.concat(F.slice(surround, 1, 8), block,
                 F.slice(surround, 9, DOC_LEN - 8))) \
        .otherwise(surround)
    df = base.withColumn("tokens", toks).drop("id")

    t0 = time.perf_counter()
    out = substring_excise(df, k=K)
    agg = (out.select(
        F.sum("n_removed").alias("total_removed"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0))
        .alias("docs_touched"),
        F.min(F.when(F.col("n_removed") > 0, F.col("doc_id")))
        .alias("first_touched")).collect()[0])
    dt = time.perf_counter() - t0

    n_planted = (args.docs + stride - 1) // stride
    # canonical (lowest doc_id = doc-000000000) keeps its block; every
    # other planted doc loses exactly the BLOCK tokens
    expect_removed = (n_planted - 1) * BLOCK
    ok = (agg["total_removed"] == expect_removed
          and agg["docs_touched"] == n_planted - 1
          and agg["first_touched"] != "doc-000000000")
    print(json.dumps({
        "experiment": "substring_excise_stress",
        "docs": args.docs, "planted": n_planted,
        "total_tokens": args.docs * DOC_LEN + n_planted * BLOCK,
        "wall_sec": round(dt, 2),
        "tokens_per_sec": round(
            (args.docs * DOC_LEN + n_planted * BLOCK) / dt),
        "total_removed": agg["total_removed"],
        "expected_removed": expect_removed,
        "docs_touched": agg["docs_touched"],
        "cores": cores,
        "ground_truth_exact": ok,
    }))
    if not ok:
        raise SystemExit(2)


if __name__ == "__main__":
    main()
