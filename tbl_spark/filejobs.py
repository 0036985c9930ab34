"""Per-file dataset surgery: transform / merge N parquet files with tbl's
1:1 / N:1 output semantics and atomic single-file outputs.

The reference's data mode maps each input file to one output file
(inplace, same-dir renamed, re-rooted dir/tree — data.rs:52-103) and its
merge concatenates N files into one (parquet_merge.rs:12-72), all written
via the tmp+rename protocol (output.rs:141-176). Spark's native writer
produces directories, so single-FILE outputs go through Arrow
(df.toArrow → pyarrow writer → os.replace); per-file transforms keep each
file's row set independent, exactly like the reference's streaming
surgery."""

from __future__ import annotations

import os
import uuid

import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from .outputs import OutputPathSpec, get_output_paths
from .transforms import TransformSpec, apply_transforms


def _write_file_atomic(table, dst: str, compression: str = "zstd") -> None:
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    tmp = f"{dst}.{uuid.uuid4().hex[:8]}_tmp"
    pq.write_table(table, tmp, compression=compression)
    os.replace(tmp, dst)


def transform_files(spark: SparkSession, inputs: list[str],
                    spec: TransformSpec, out_spec: OutputPathSpec,
                    compression: str = "zstd") -> list[tuple[str, str]]:
    """Apply the transform chain to each file independently; write each
    result as ONE parquet file at its planned output path (atomic)."""
    pairs = get_output_paths(inputs, out_spec)
    for src, dst in pairs:
        df = apply_transforms(spark.read.parquet(src), spec)
        _write_file_atomic(df.toArrow(), dst, compression)
    return pairs


def merge_files(spark: SparkSession, inputs: list[str], dst: str,
                compression: str = "zstd") -> int:
    """N:1 concatenation with strict schema equality (parquet_merge.rs:
    49-58): fail fast on mismatch before any write; atomic single-file
    output. Returns row count."""
    from .transforms import merge
    dfs = [spark.read.parquet(p) for p in sorted(inputs)]
    merged = merge(dfs)
    table = merged.toArrow()
    _write_file_atomic(table, dst, compression)
    return len(table)
