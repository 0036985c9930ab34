"""Per-query isolation bench for optimization work (guide §1.1/§1.4).

NOT the driver contract — bench.py stays frozen. This harness times each
headline query in isolation with the SAME action bench.py uses (count()
for the operator queries, the agg/collect for the encode paths) plus an
optional noop-sink variant, reporting min-of-N so one polluted window
cannot hide a regression. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py \
        [query ...] [--reps N] [--noop]

With no query args, runs the full headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", 60_000))

HEADLINE = ["encode_tokens", "encode_colocated", "decode_tokens",
            "roundtrip_lineitem", "dedup_minhash_lsh", "ann_cosine_topk",
            "text_quality", "dedup_exact", "pipeline_curate_v2"]


def _session():
    from tbl_spark.session import get_spark
    return get_spark(cores=CPUS, shuffle_partitions=max(32, 4 * CPUS),
                     app_name="tbl_spark-bench-extra")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _stage_encode_input(spark):
    from tbl_spark.datagen import generate_df
    staging = f"/tmp/tbl_bench_input_{BENCH_DOCS}"
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        (generate_df(spark, BENCH_DOCS, max(CPUS, (2 * CPUS) // 4))
         .write.mode("overwrite").parquet(staging))
    return spark.read.parquet(staging)


def run_query(spark, name: str, noop: bool):
    """Returns a zero-arg callable reproducing bench.py's timed region."""
    import pyspark.sql.functions as F

    if name == "encode_tokens":
        from tbl_spark.encode import audition_codec_hints, encode_chunks
        df = _stage_encode_input(spark)
        hints = audition_codec_hints(df)

        def rep():
            return (encode_chunks(df, 2 * CPUS, codec_hints=hints)
                    .agg(F.sum("enc_bytes").alias("enc"),
                         F.sum(F.when(F.col("column") == "tokens",
                                      F.col("n_values"))).alias("tokens"))
                    .collect()[0])
        return rep

    if name == "encode_colocated":
        from tbl_spark.encode import (audition_codec_hints,
                                      encode_chunks_colocated)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
        spark.conf.set("spark.sql.files.openCostInBytes", "131072")
        df = _stage_encode_input(spark)
        hints = audition_codec_hints(df)

        def rep():
            return (encode_chunks_colocated(df, tokens_per_chunk=400_000,
                                            codec_hints=hints)
                    .agg(F.sum(F.when(F.col("column") == "tokens",
                                      F.col("n_values"))).alias("tokens"))
                    .collect()[0])
        return rep

    if name == "decode_tokens":
        from tbl_spark.datagen import SPARK_SCHEMA_DDL, generate_df
        from tbl_spark.decode import decode_chunks_colocated
        from tbl_spark.encode import encode_chunks
        chunks = encode_chunks(
            generate_df(spark, BENCH_DOCS // 2, CPUS), 4 * CPUS).cache()
        chunks.count()
        return lambda: decode_chunks_colocated(
            chunks, SPARK_SCHEMA_DDL).count()

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    fn = qs[name]
    if noop:
        return lambda: _noop(fn(spark, SF_DIR))
    return lambda: fn(spark, SF_DIR).count()


_CTRL_BUF = None
_CTRL_FLOOR = [None]


def _ctrl() -> float:
    """One run of bench.py's CPU steal-control kernel (~0.08 s clean)."""
    global _CTRL_BUF
    import numpy as np
    if _CTRL_BUF is None:
        _CTRL_BUF = np.arange(8_000_000, dtype=np.float64) * 1e-6
        float(np.sin(_CTRL_BUF).sum())
    t0 = time.perf_counter()
    float(np.sin(_CTRL_BUF).sum())
    dt = time.perf_counter() - t0
    f = _CTRL_FLOOR[0]
    _CTRL_FLOOR[0] = dt if f is None else min(f, dt)
    return dt


def _wait_clean(max_wait: float = 120.0) -> bool:
    """Block until a control run lands within 1.25x of the session floor
    (same bar as bench.py); returns False when max_wait expires dirty."""
    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait:
        c = min(_ctrl(), _ctrl())
        if c / _CTRL_FLOOR[0] <= 1.25:
            return True
        time.sleep(2.0)
    return False


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]
    noop = "--noop" in sys.argv
    gate = "--gate" in sys.argv
    names = args or HEADLINE
    spark = _session()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        rep = run_query(spark, name, noop)
        times = []
        dirty = 0
        for _ in range(reps):
            if gate and not _wait_clean():
                dirty += 1
            t0 = time.perf_counter()
            rep()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(times), "times": times}
        if gate:
            out[name]["dirty_reps"] = dirty
        print(f"{name}: min={min(times)} times={times} dirty={dirty}",
              file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
