"""Distributed per-column encode job.

One chunk = one (part_id, column) encoded blob. The encode runs as a
grouped Arrow UDF (``groupBy(part_id).applyInArrow``) — Spark's analog of
the reference's bounded record-batch streaming surgery
(crates/tbl-core/src/parquet/parquet_insert.rs:110-153) — so the whole
pipeline stays Arrow-vectorized with no per-row Python.

Scale notes (100 TB): the shuffle on part_id is the single shuffle of the
job; chunk size is controlled by `plan_num_parts` (tokens per chunk), so
each applyInArrow group is a bounded, executor-memory-sized unit, and the
number of groups (≫ cores) gives the scheduler room to balance. Skew is
pre-defused by the salted part_id (partitioning.py), with AQE as backup.
"""

from __future__ import annotations

import time

import pyarrow as pa
from pyspark.sql import DataFrame

from .arrowtypes import to_codec_input
from .codecs import blob_codec, encode_array
from .partitioning import PART_COL, with_part_id

CHUNK_SCHEMA_DDL = (
    "part_id int, column string, codec string, blob binary, "
    "n_rows bigint, n_values bigint, raw_bytes bigint, enc_bytes bigint, "
    "spark_type string, encode_ms double")

CHUNK_ARROW_SCHEMA = pa.schema([
    ("part_id", pa.int32()), ("column", pa.string()),
    ("codec", pa.string()), ("blob", pa.binary()),
    ("n_rows", pa.int64()), ("n_values", pa.int64()),
    ("raw_bytes", pa.int64()), ("enc_bytes", pa.int64()),
    ("spark_type", pa.string()), ("encode_ms", pa.float64()),
])


def encode_table(part_id: int, tbl: pa.Table,
                 spark_types: dict[str, str]) -> pa.Table:
    """Encode every column of one chunk's Arrow table → chunk rows."""
    rows = {k: [] for k in CHUNK_ARROW_SCHEMA.names}
    for name in tbl.column_names:
        if name == PART_COL:
            continue
        arr = tbl.column(name).combine_chunks()
        t0 = time.perf_counter()
        codec_input = to_codec_input(arr)
        blob = encode_array(codec_input, cache_key=name)
        ms = (time.perf_counter() - t0) * 1000.0
        n_values = len(arr)
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            n_values = len(arr.flatten())
        rows["part_id"].append(part_id)
        rows["column"].append(name)
        rows["codec"].append(blob_codec(blob))
        rows["blob"].append(blob)
        rows["n_rows"].append(len(arr))
        rows["n_values"].append(n_values)
        rows["raw_bytes"].append(arr.nbytes)
        rows["enc_bytes"].append(len(blob))
        rows["spark_type"].append(spark_types[name])
        rows["encode_ms"].append(ms)
    return pa.Table.from_pydict(rows, schema=CHUNK_ARROW_SCHEMA)


def encode_chunks(df: DataFrame, num_parts: int,
                  columns: list[str] | None = None,
                  salt_cols: tuple[str, ...] | None = None) -> DataFrame:
    """df (token table or any supported schema) → chunk DataFrame.

    `salt_cols` picks the chunk-assignment hash key (defaults to
    (source, doc_id) when present, else the full row — partitioning.py).
    Every SOURCE column, including any user column named `part_id`, is
    encoded; the internal key uses the reserved `__ts_part__` name."""
    if columns is not None:
        df = df.select(*columns)
    df = with_part_id(df, num_parts, salt_cols)
    spark_types = {f.name: f.dataType.simpleString()
                   for f in df.schema.fields if f.name != PART_COL}

    def encode_group(key: tuple, tbl: pa.Table) -> pa.Table:
        return encode_table(key[0].as_py(), tbl, spark_types)

    return df.groupBy(PART_COL).applyInArrow(encode_group, CHUNK_SCHEMA_DDL)
