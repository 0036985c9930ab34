"""Deterministic synthetic token-table generation (FIXTURES.md §1).

Input table shape fixed by BASELINE.json input_hint:
    doc_id: string, tokens: array<int32>, n_tok: int32, source: string

Generation is seeded per (seed, part) so any part can be produced
independently on any executor — the same rows come out whether the table is
built by the driver loop (test fixtures) or distributed via mapInArrow
(bench scale). The zstd-parquet copy written by `write_token_table` doubles
as the compression baseline artifact (the reference's sink default —
/root/reference/crates/tbl-cli/src/output.rs:157-173).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB = 50_257
SOURCES = ["web", "books", "arxiv", "wiki", "code", "news", "forum",
           "social", "legal", "patents", "papers", "reviews"]
_W = 1.0 / np.arange(1, len(SOURCES) + 1) ** 1.5
SOURCE_WEIGHTS = _W / _W.sum()  # head source ≈ 49% of rows → drives skew tests

ARROW_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string(), nullable=False),
    pa.field("tokens", pa.list_(pa.int32()), nullable=False),
    pa.field("n_tok", pa.int32(), nullable=False),
    pa.field("source", pa.string(), nullable=False),
])

SPARK_SCHEMA_DDL = ("doc_id string, tokens array<int>, n_tok int, "
                    "source string")


def generate_part(part: int, rows: int, seed: int = 42,
                  rows_per_part: int | None = None) -> pa.Table:
    """One deterministic part of the token table as an Arrow table."""
    rng = np.random.default_rng([seed, part])
    lens = np.clip(rng.lognormal(5.5, 1.0, rows), 1, 8192).astype(np.int64)
    src_idx = rng.choice(len(SOURCES), rows, p=SOURCE_WEIGHTS)

    if part == 0 and rows >= 8:  # FIXTURES.md edge rows at fixed indices
        lens[0] = 1          # minimum-length array
        lens[1] = 8192       # maximum-length array
        lens[2] = 512        # all-identical tokens (RLE best case)
        lens[3] = 1024       # strictly increasing (delta/bit-pack best case)
        lens[4] = 4          # contains 0 and int32 max
        lens[5] = lens[6] = 64  # duplicate arrays, distinct doc_ids

    flat = ((rng.zipf(1.2, int(lens.sum())) - 1) % VOCAB).astype(np.int32)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    if part == 0 and rows >= 8:
        flat[offsets[2]:offsets[3]] = 7
        flat[offsets[3]:offsets[4]] = np.arange(lens[3], dtype=np.int32)
        flat[offsets[4]:offsets[5]] = np.array(
            [0, 2**31 - 1, 0, 2**31 - 1], dtype=np.int32)
        flat[offsets[6]:offsets[7]] = flat[offsets[5]:offsets[6]]

    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()) if offsets[-1] < 2**31
        else pa.array(offsets, type=pa.int64()),
        pa.array(flat, type=pa.int32()))
    if tokens.type != pa.list_(pa.int32()):
        tokens = tokens.cast(pa.list_(pa.int32()))

    base = part * (rows_per_part if rows_per_part is not None else rows)
    global_idx = np.arange(base, base + rows, dtype=np.int64)
    src = pa.array(np.array(SOURCES, dtype=object)[src_idx], type=pa.string())
    idx_str = pc.utf8_lpad(pc.cast(pa.array(global_idx), pa.string()),
                           12, "0")
    doc_id = pc.binary_join_element_wise(src, idx_str, "-")

    return pa.Table.from_arrays(
        [doc_id, tokens, pa.array(lens.astype(np.int32)), src],
        schema=ARROW_SCHEMA)


def write_token_table(path: str, n_docs: int, n_parts: int = 4,
                      seed: int = 42, compression: str = "zstd") -> int:
    """Write the table as parquet files (the zstd baseline artifact).

    Returns total file bytes — the compressed size our codecs must beat.
    """
    os.makedirs(path, exist_ok=True)
    per = (n_docs + n_parts - 1) // n_parts
    total = 0
    for part in range(n_parts):
        rows = min(per, n_docs - part * per)
        if rows <= 0:
            break
        tbl = generate_part(part, rows, seed, rows_per_part=per)
        f = os.path.join(path, f"part-{part:05d}.parquet")
        pq.write_table(tbl, f, compression=compression)
        total += os.path.getsize(f)
    return total


def generate_df(spark, n_docs: int, n_parts: int, seed: int = 42):
    """Distributed generation: one task per part via mapInArrow."""
    per = (n_docs + n_parts - 1) // n_parts

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for part in batch.column(0).to_pylist():
                rows = min(per, n_docs - part * per)
                if rows <= 0:
                    continue
                tbl = generate_part(part, rows, seed, rows_per_part=per)
                yield from tbl.to_batches(max_chunksize=10_000)

    rng_df = spark.range(0, n_parts, 1, n_parts)
    return rng_df.mapInArrow(gen, SPARK_SCHEMA_DDL)
