"""Round-3 stress validation: the NEW scale paths at local-stress size.

1. Encode a large token table into a chunk store (salted path), then
   DISTRIBUTED-compact it (driver plans, executors build waves) and
   verify the decode is still bit-identical row-for-row.
2. Hash-keyed exact_dedup over a large planted-duplicate corpus: verify
   the keep-min-id semantics at volume and report wall time.

    python tools/stress_r3.py [--docs 600000] [--dedup-docs 1000000]

Prints one JSON line per experiment; paste results into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600_000)
    ap.add_argument("--dedup-docs", type=int, default=1_000_000)
    ap.add_argument("--keep", action="store_true",
                    help="keep the scratch store on disk")
    args = ap.parse_args()

    import pyspark.sql.functions as F
    from tbl_spark.datagen import SPARK_SCHEMA_DDL, generate_df
    from tbl_spark.pipelines.dedup import exact_dedup
    from tbl_spark.session import get_spark
    from tbl_spark.store import ChunkStore, decode_from_store, encode_to_store

    spark = get_spark()
    cores = spark.sparkContext.defaultParallelism

    # -- experiment 1: distributed compaction at volume ---------------------
    root = "/tmp/tbl_stress_r3_store"
    shutil.rmtree(root, ignore_errors=True)
    store = ChunkStore(root)
    df = generate_df(spark, args.docs, 2 * cores)
    n_parts = max(48, 2 * cores)
    t0 = time.perf_counter()
    summary = encode_to_store(df, store, n_parts)
    t_encode = time.perf_counter() - t0

    t0 = time.perf_counter()
    waves = store.compact(wave_size=8, spark=spark)
    t_compact = time.perf_counter() - t0
    n_files = len(store.data_files())

    t0 = time.perf_counter()
    decoded = decode_from_store(store, spark, SPARK_SCHEMA_DDL)
    src = generate_df(spark, args.docs, 2 * cores)  # same seed → same rows
    n_equal = (decoded.alias("b").join(src.alias("a"), "doc_id")
               .filter(F.col("a.tokens") == F.col("b.tokens")).count())
    t_verify = time.perf_counter() - t0
    print(json.dumps({
        "experiment": "distributed_compaction",
        "docs": args.docs, "tokens": summary["n_values"],
        "parts": n_parts, "waves_written": waves,
        "data_files_after": n_files,
        "encode_sec": round(t_encode, 1),
        "compact_sec": round(t_compact, 1),
        "decode_verify_sec": round(t_verify, 1),
        "rows_bit_equal": n_equal, "rows_expected": args.docs,
    }))
    assert n_equal == args.docs, "decode mismatch after compaction"
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)

    # -- experiment 2: hash-keyed exact dedup at volume ---------------------
    # corpus: dedup-docs rows, every 4th row duplicates the text of the
    # row 3 before it → expected survivors = 3/4 of rows + originals
    n = args.dedup_docs
    base = spark.range(n).select(
        F.format_string("d%09d", F.col("id")).alias("doc_id"),
        F.concat(F.lit("document body "),
                 ((F.col("id") / 4).cast("long") * 4).cast("string"),
                 F.lit(" with shared text payload for dedup stress"))
        .alias("text"))
    # ids 4k,4k+1,4k+2,4k+3 share text → keep only min (4k) per group
    t0 = time.perf_counter()
    kept = exact_dedup(base).count()
    t_dedup = time.perf_counter() - t0
    expected = -(-n // 4)
    print(json.dumps({
        "experiment": "exact_dedup_hash_keyed",
        "docs": n, "kept": kept, "expected": expected,
        "dedup_sec": round(t_dedup, 1),
        "docs_per_sec": round(n / t_dedup),
    }))
    assert kept == expected, "dedup kept-count mismatch"


if __name__ == "__main__":
    main()
