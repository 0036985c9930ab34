"""Per-file dataset surgery: transform / merge N parquet files with tbl's
1:1 / N:1 output semantics and atomic single-file outputs.

The reference's data mode maps each input file to one output file
(inplace, same-dir renamed, re-rooted dir/tree — data.rs:52-103) and its
merge concatenates N files into one (parquet_merge.rs:12-72), all written
via the tmp+rename protocol (output.rs:141-176) while streaming bounded
record batches (parquet_merge.rs:60-63) — input size never hits memory.

Spark's native writer produces directories, so single-FILE outputs are
written by a mapInArrow task on the EXECUTOR: the plan is coalesced to one
partition, Arrow batches stream through a ParquetWriter into a staging
path, and os.replace commits atomically after the last batch — the same
protocol the chunk store uses (store.py). Nothing is ever materialized on
the driver, so a 50 GB input file costs one batch of memory, not one file.
Like the store, this assumes executors see the destination filesystem
(shared FS / mountpoint — local[] trivially qualifies).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from .outputs import OutputPathSpec, get_output_paths
from .transforms import TransformSpec, apply_transforms


def write_single_file(df: DataFrame, dst: str,
                      compression: str = "zstd") -> int:
    """Stream `df` into ONE parquet file at `dst`, executor-side, atomic.

    coalesce(1) (no shuffle) funnels the plan into a single task that
    writes batches as they arrive; global order, if the plan sorted, is
    preserved because coalesce concatenates partitions in index order.
    Returns the row count written."""
    stats_ddl = "path string, n_rows bigint"
    from pyspark.sql.pandas.types import to_arrow_schema
    empty_schema = to_arrow_schema(df.schema)  # closure-safe (no df ref)

    def run(batches):
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        tmp = f"{dst}.{uuid.uuid4().hex[:8]}_tmp"
        writer = None
        n = 0
        try:
            for batch in batches:
                if writer is None:
                    writer = pq.ParquetWriter(tmp, batch.schema,
                                              compression=compression)
                writer.write_batch(batch)
                n += batch.num_rows
            if writer is None:  # empty input still produces a valid file
                writer = pq.ParquetWriter(tmp, empty_schema,
                                          compression=compression)
        finally:
            if writer is not None:
                writer.close()
        os.replace(tmp, dst)  # commit point — readers never see partials
        yield pa.RecordBatch.from_arrays(
            [pa.array([dst]), pa.array([n], type=pa.int64())],
            names=["path", "n_rows"])

    rows = df.coalesce(1).mapInArrow(run, stats_ddl).collect()
    if not rows:  # zero-partition plan: the task never ran — still emit
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        tmp = f"{dst}.{uuid.uuid4().hex[:8]}_tmp"
        pq.write_table(empty_schema.empty_table(), tmp,
                       compression=compression)
        os.replace(tmp, dst)
        return 0
    return int(rows[0]["n_rows"])


def write_single_text(df: DataFrame, dst: str, fmt: str = "csv") -> int:
    """Stream `df` into ONE csv or json-lines file, executor-side, atomic
    — the reference's sink_csv/sink_json single-file semantics
    (output.rs:151-166). Binary columns are rendered as 0x-hex (the
    reference hex-encodes binaries for text formats, output.rs:96-126).
    Returns the row count."""
    import pyspark.sql.functions as F
    if fmt not in ("csv", "json"):
        raise ValueError(f"unsupported text format {fmt!r}")
    for name, t in df.dtypes:
        if t == "binary":
            df = df.withColumn(name, F.concat(
                F.lit("0x"), F.lower(F.hex(F.col(name)))))
    stats_ddl = "path string, n_rows bigint"

    def run(batches):
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        tmp = f"{dst}.{uuid.uuid4().hex[:8]}_tmp"
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            wrote_header = False
            for batch in batches:
                pdf = batch.to_pandas()
                if fmt == "csv":
                    pdf.to_csv(f, index=False, header=not wrote_header)
                    wrote_header = True
                else:  # json lines (polars sink_json default is NDJSON)
                    text = pdf.to_json(orient="records", lines=True)
                    f.write(text)
                    if text and not text.endswith("\n"):
                        f.write("\n")
                n += batch.num_rows
            if fmt == "csv" and not wrote_header:
                f.write(",".join(batch_names) + "\n")
        os.replace(tmp, dst)
        yield pa.RecordBatch.from_arrays(
            [pa.array([dst]), pa.array([n], type=pa.int64())],
            names=["path", "n_rows"])

    batch_names = df.columns
    rows = df.coalesce(1).mapInArrow(run, stats_ddl).collect()
    if not rows:  # zero-partition plan: still emit a valid (header) file
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        tmp = f"{dst}.{uuid.uuid4().hex[:8]}_tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            if fmt == "csv":
                f.write(",".join(batch_names) + "\n")
        os.replace(tmp, dst)
        return 0
    return int(rows[0]["n_rows"])


def transform_files(spark: SparkSession, inputs: list[str],
                    spec: TransformSpec, out_spec: OutputPathSpec,
                    compression: str = "zstd") -> list[tuple[str, str]]:
    """Apply the transform chain to each file independently; write each
    result as ONE parquet file at its planned output path (atomic).
    Inplace is crash-safe: the source is replaced only after the staging
    file is fully written."""
    pairs = get_output_paths(inputs, out_spec)
    for src, dst in pairs:
        df = apply_transforms(spark.read.parquet(src), spec)
        write_single_file(df, dst, compression)
    return pairs


def merge_files(spark: SparkSession, inputs: list[str], dst: str,
                compression: str = "zstd") -> int:
    """N:1 concatenation with strict schema equality (parquet_merge.rs:
    49-58): fail fast on mismatch before any write; atomic single-file
    output streamed executor-side. Returns row count."""
    from .transforms import merge
    dfs = [spark.read.parquet(p) for p in sorted(inputs)]
    merged = merge(dfs)
    return write_single_file(merged, dst, compression)
