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

# Reserved INTERNAL column name for chunk assignment. A user table that
# legitimately contains a `part_id` column must survive encode→decode
# unchanged, so the engine's own key uses a name no sane schema carries and
# with_part_id refuses to run if the input already has it (ADVICE r1).
PART_COL = "__ts_part__"
DEFAULT_SALT_COLS = ("source", "doc_id")
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


def resolve_salt_cols(df: DataFrame,
                      salt_cols: tuple[str, ...] | None) -> tuple[str, ...]:
    """Pick the hash key: explicit > (source, doc_id) if present > all
    columns (still deterministic — full-row hash)."""
    if salt_cols:
        missing = [c for c in salt_cols if c not in df.columns]
        if missing:
            raise ValueError(f"salt columns not in schema: {missing}")
        return tuple(salt_cols)
    if all(c in df.columns for c in DEFAULT_SALT_COLS):
        return DEFAULT_SALT_COLS
    return tuple(df.columns)


def with_part_id(df: DataFrame, num_parts: int,
                 salt_cols: tuple[str, ...] | None = None) -> DataFrame:
    """Deterministic chunk id: pmod(xxhash64(*salt_cols), num_parts).

    Raises if the reserved internal column already exists instead of
    silently reusing arbitrary values as chunk ids."""
    if PART_COL in df.columns:
        raise ValueError(
            f"input schema already contains the reserved internal column "
            f"{PART_COL!r}; drop or rename it before encoding")
    salt_cols = resolve_salt_cols(df, salt_cols)
    return df.withColumn(
        PART_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
               F.lit(num_parts)).cast("int"))
