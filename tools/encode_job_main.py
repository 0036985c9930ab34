"""Standalone encode job for spark-submit (north rule deployment path):

    spark-submit --master local[N] --py-files tbl_spark.zip \
        tools/encode_job_main.py --docs 40000 [--store DIR]

Inherits the master/executors from spark-submit (no master override), so
the same script runs unchanged on a real multi-executor cluster. Prints one
JSON line: {"cores", "docs", "tokens", "seconds", "tokens_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40_000)
    ap.add_argument("--num-parts", type=int, default=None)
    ap.add_argument("--gen-parts", type=int, default=None)
    ap.add_argument("--input", default=None,
                    help="parquet token table to encode (else generated)")
    ap.add_argument("--store", default=None)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--colocated", action="store_true",
                    help="zero-shuffle encode (chunks cut per scan task)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("tbl_spark-encode")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    cores = spark.sparkContext.defaultParallelism

    import pyspark.sql.functions as F
    from tbl_spark.datagen import generate_df
    from tbl_spark.encode import encode_chunks

    num_parts = args.num_parts or 16 * cores
    gen_parts = args.gen_parts or 4 * cores

    if args.warmup:
        # untimed: spin up every python worker (imports + allocator arenas)
        encode_chunks(generate_df(spark, 4 * cores * 100, cores),
                      2 * cores).count()

    df = spark.read.parquet(args.input) if args.input \
        else generate_df(spark, args.docs, gen_parts)
    t0 = time.perf_counter()
    if args.colocated and not args.store:
        from tbl_spark.encode import encode_chunks_colocated
        rows = (encode_chunks_colocated(df)
                .select("part_id", "column", "n_values", "enc_bytes",
                        "encode_ms").collect())
        tokens = sum(r["n_values"] for r in rows if r["column"] == "tokens")
        enc_bytes = sum(r["enc_bytes"] for r in rows)
    elif args.store and args.colocated:
        from tbl_spark.store import ChunkStore, encode_to_store_colocated
        summary = encode_to_store_colocated(df, ChunkStore(args.store))
        tokens = summary["n_values"]
        enc_bytes = summary["enc_bytes"]
    elif args.store:
        from tbl_spark.store import ChunkStore, encode_to_store
        summary = encode_to_store(df, ChunkStore(args.store), num_parts)
        tokens = summary["n_values"]
        enc_bytes = summary["enc_bytes"]
    else:
        # collect per-(part, column) metric rows (tiny — no blobs) so the
        # per-partition tokens/sec SPREAD is reportable: flat spread is the
        # direct evidence that the salted partitioning defused the Zipf
        # source skew (VERDICT r1 asked for this next to the efficiency).
        rows = (encode_chunks(df, num_parts)
                .select("part_id", "column", "n_values", "enc_bytes",
                        "encode_ms").collect())
        tokens = sum(r["n_values"] for r in rows if r["column"] == "tokens")
        enc_bytes = sum(r["enc_bytes"] for r in rows)
    dt = time.perf_counter() - t0

    out = {
        "cores": cores, "docs": args.docs, "num_parts": num_parts,
        "tokens": tokens, "enc_bytes": enc_bytes,
        "seconds": round(dt, 3),
        "tokens_per_sec": round(tokens / dt),
        "bytes_per_token": round(enc_bytes / tokens, 4),
    }
    if not args.store:
        part_tok = sorted(r["n_values"] for r in rows
                          if r["column"] == "tokens")
        part_rate = sorted(r["n_values"] / (r["encode_ms"] / 1000.0)
                           for r in rows
                           if r["column"] == "tokens" and r["encode_ms"] > 0)
        if part_rate:
            mid = len(part_rate) // 2
            out["part_tokens_min_med_max"] = [
                part_tok[0], part_tok[len(part_tok) // 2], part_tok[-1]]
            out["part_tokens_per_sec_min_med_max"] = [
                round(part_rate[0]), round(part_rate[mid]),
                round(part_rate[-1])]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
