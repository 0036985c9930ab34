"""Deterministic stratified sampling — the domain-mixing step of a
training-data pipeline (sample each source/language/quality stratum at
its own rate, reproducibly).

The keep decision is a pure function of the row key: the top 60 bits of
md5(key) scaled to [0, 1) and compared against the stratum's rate. That
makes the sample (a) deterministic across reruns and cluster sizes,
(b) exactly re-derivable in any ANSI SQL engine (the driver's DuckDB
oracle recomputes it value-for-value), and (c) a pure map over the scan —
no shuffle, no RNG state, filter-pushdown friendly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MD5_60_MAX = float(1 << 60)   # 15 hex chars


def uniform_hash(key_col: str):
    """[0, 1) double from the top 60 bits of md5(key) — identical in
    Spark and DuckDB (CAST('0x' || substring(md5(k), 1, 15) AS UBIGINT)
    / 2^60), unlike xxhash64/rand which are engine-specific. Built on
    the same md5_60 expression the dedup oracles use, so the
    cross-engine contract lives in exactly one place."""
    from .dedup import _word_hash_expr
    h = _word_hash_expr(f"CAST({key_col} AS STRING)", "md5_60")
    return F.expr(h) / F.lit(_MD5_60_MAX)


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], key_col: str,
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row of stratum s with probability rates[s] (strata not
    in the dict fall back to default_rate), decided by the deterministic
    per-key uniform — so the same corpus always yields the same sample
    and a rerun after adding data only ADDS rows (old keys keep their
    old decision)."""
    u = uniform_hash(key_col)
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))) \
            .otherwise(rate)
    return df.filter(u < rate)
