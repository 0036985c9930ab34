"""Round-5 stress validation: corpus-level paragraph dedup at volume.

Builds a corpus of --docs documents x 4 paragraphs whose content is
unique per (doc, slot) (xxhash64-derived, executor-side — no driver
materialization), then plants ONE shared paragraph into every
``stride``-th document. Ground truth is exact: the lowest-id planted doc
keeps the shared paragraph, every other planted doc loses exactly one,
and no untouched doc loses anything.

    python tools/stress_r5.py [--docs 300000] [--planted 2000]

Prints one JSON line; paste results into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARED = "shared boilerplate paragraph every mirror copies verbatim"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--planted", type=int, default=2_000)
    args = ap.parse_args()

    import pyspark.sql.functions as F
    from tbl_spark.pipelines.dedup import paragraph_dedup
    from tbl_spark.session import get_spark

    spark = get_spark()
    stride = max(1, args.docs // args.planted)
    base = spark.range(args.docs)
    par = [F.concat(F.lit(f"p{j} "),
                    F.xxhash64(F.col("id"), F.lit(j)).cast("string"))
           for j in range(4)]
    planted = F.col("id") % stride == 0
    text = F.when(
        planted,
        F.concat_ws("\n\n", par[0], par[1], F.lit(SHARED), par[3])) \
        .otherwise(F.concat_ws("\n\n", *par))
    df = base.select(F.col("id").alias("doc_id"),
                     text.alias("text"))

    t0 = time.perf_counter()
    out = paragraph_dedup(df)
    agg = out.select(
        F.count("*").alias("rows"),
        F.sum("n_pars_removed").alias("removed"),
        F.sum(F.when(F.col("n_pars_removed") > 0, 1).otherwise(0))
        .alias("docs_touched"),
        F.min(F.when(F.col("n_pars_removed") > 0, F.col("doc_id")))
        .alias("first_touched"),
        F.sum(F.length("text")).alias("out_chars")).collect()[0]
    dt = time.perf_counter() - t0

    n_planted = (args.docs + stride - 1) // stride
    n_pars = args.docs * 4
    # every non-canonical planted doc loses exactly the shared paragraph
    # (plus its joining separator), nothing else changes
    src_chars = df.select(F.sum(F.length("text"))).collect()[0][0]
    expect_chars = src_chars - (n_planted - 1) * (len(SHARED) + 2)
    ok = (agg["rows"] == args.docs
          and agg["removed"] == n_planted - 1
          and agg["docs_touched"] == n_planted - 1
          and agg["first_touched"] != 0
          and agg["out_chars"] == expect_chars)
    print(json.dumps({
        "experiment": "paragraph_dedup_stress",
        "docs": args.docs, "paragraphs": n_pars,
        "planted": n_planted,
        "wall_sec": round(dt, 2),
        "paragraphs_per_sec": round(n_pars / dt),
        "removed": agg["removed"],
        "docs_touched": agg["docs_touched"],
        "chars_exact": agg["out_chars"] == expect_chars,
        "cores": spark.sparkContext.defaultParallelism,
        "ground_truth_exact": ok,
    }))
    if not ok:
        raise SystemExit(2)


if __name__ == "__main__":
    main()
