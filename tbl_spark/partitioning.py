"""Explicit partitioning with skew defusal (north rule).

The token table's `source` column is Zipf-skewed (head source ≈ half the
rows). Chunk assignment is a salted hash of (source, doc_id): because
doc_id is part of the hash, rows of the hot source spread uniformly over
all chunks — the explicit analog of AQE skew-join splitting, and the
finished version of the reference's unimplemented `--partition-by` flags
(crates/tbl-cli/src/cli/args.rs:385-419, output.rs:181-189)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PART_COL = "part_id"
DEFAULT_TOKENS_PER_CHUNK = 4_000_000  # ≈16 MB of int32 tokens per chunk


def probe_skew(df: DataFrame, key: str = "source") -> dict[str, int]:
    """value_counts-style skew probe (transform.rs:609-623 analog):
    rows per key value, descending."""
    rows = df.groupBy(key).count().orderBy(F.desc("count")).collect()
    return {r[key]: r["count"] for r in rows}


def plan_num_parts(total_tokens: int,
                   tokens_per_chunk: int = DEFAULT_TOKENS_PER_CHUNK,
                   min_parts: int = 4) -> int:
    return max(min_parts, -(-total_tokens // tokens_per_chunk))


def with_part_id(df: DataFrame, num_parts: int,
                 salt_cols: tuple[str, ...] = ("source", "doc_id")) -> DataFrame:
    """Deterministic chunk id: pmod(xxhash64(source, doc_id), num_parts)."""
    if PART_COL in df.columns:
        return df
    return df.withColumn(
        PART_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
               F.lit(num_parts)).cast("int"))
