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


def temperature_sample(df: DataFrame, strata_col: str, key_col: str,
                       temperature: float = 2.0,
                       weight_col: str | None = None,
                       scale: float = 1.0) -> DataFrame:
    """Temperature-based domain mixing (the standard multilingual/Pile
    resampling rule, public — e.g. Arivazhagan et al. 2019 §5, The Pile):
    target mixture weight w_s ∝ n_s^(1/T), where n_s is the stratum's
    size (row count, or the sum of `weight_col` — e.g. tokens). T=1
    keeps natural proportions; T→∞ approaches uniform domain weights.

    A filter-based sampler cannot upsample, so the realized budget is
    the largest N with N·w_s ≤ n_s for every stratum (N* = min_s n_s/w_s,
    scaled down by `scale`); per-stratum keep rate = N*·w_s/n_s, rounded
    to 9 digits so the rate arithmetic is reproducible cross-engine.
    The keep decision reuses the deterministic md5-60 per-key uniform —
    rerun-stable, cluster-size-independent, ANSI-SQL re-derivable.

    Scale shape: one tiny per-stratum aggregate (partial map-side), rate
    algebra via windows over that #strata-row frame, and a broadcast
    join back — the corpus itself is never shuffled."""
    from pyspark.sql import Window
    if not temperature > 0:   # 'not >' also rejects NaN
        raise ValueError(
            f"temperature must be > 0 (got {temperature}); T=1 keeps "
            "natural proportions, T>1 flattens toward uniform")
    if not scale > 0:
        raise ValueError(f"scale must be > 0 (got {scale}); values > 1 "
                         "saturate at each stratum's full size — a "
                         "filter-based sampler cannot upsample")
    w = (F.count("*") if weight_col is None
         else F.sum(weight_col)).cast("double")
    # NULL strata form their own stratum: an equi-join on the raw column
    # would silently drop every NULL-strata row (NULL never equals NULL),
    # so both sides key on a prefixed string — 'n' for the null stratum,
    # 'v:'+value otherwise (prefixing makes collision with a real value
    # impossible, and keeps the key printable in plan dumps)
    _k = "_ts_stratum_key"
    skey = F.when(F.col(strata_col).isNull(), F.lit("n")) \
        .otherwise(F.concat(F.lit("v:"),
                            F.col(strata_col).cast("string")))
    keyed = df.withColumn(_k, skey)
    everything = Window.partitionBy()   # the stats frame is #strata rows
    stats = (keyed.groupBy(_k).agg(w.alias("_n"))
             .withColumn("_p", F.pow("_n", 1.0 / float(temperature)))
             .withColumn("_w", F.col("_p") / F.sum("_p").over(everything))
             .withColumn("_nstar",
                         F.min(F.col("_n") / F.col("_w")).over(everything)))
    rates = stats.select(
        _k,
        F.round(F.least(F.lit(1.0),
                        F.lit(float(scale)) * F.col("_nstar")
                        * F.col("_w") / F.col("_n")), 9).alias("_rate"))
    u = uniform_hash(key_col)
    return (keyed.join(F.broadcast(rates), _k)
            .filter(u < F.col("_rate")).drop("_rate", _k))
