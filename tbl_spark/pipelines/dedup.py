"""Deduplication operators for large-scale training-data pipelines.

All variants are declarative DataFrame plans (shuffle on the dedup key or
LSH bucket only); nothing collects to the driver, so each scales by
partition count. Signatures are deterministic (fixed-seed hash mixing via
xxhash64), so reruns produce identical keep/drop decisions.

- exact_dedup:        hash-groupBy on content, keep min doc id
- minhash_lsh_dedup:  shingles → k minhashes → b bands → bucket join
- simhash_dedup:      64-bit sign-sum simhash, banded by 16-bit chunks
- ngram_jaccard_dedup: LSH candidates verified by exact n-gram Jaccard
- embedding_cosine_dedup: random-hyperplane LSH buckets + exact cosine
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per distinct content (one shuffle on content
    hash; Catalyst plans a partial min before the exchange)."""
    return (df.groupBy(text_col)
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, text_col))


def exact_dedup_tokens(df: DataFrame, tokens_col: str = "tokens",
                       id_col: str = "doc_id",
                       verify: bool = False) -> DataFrame:
    """Exact dedup of the token table itself: keep the smallest id per
    distinct token SEQUENCE. Shuffles 8-byte hashes, not the arrays —
    xxhash64 over array<int32> is computed map-side. With verify=True the
    full arrays are re-compared inside each hash bucket (collision odds
    are 2^-64 per pair; verify trades a fat shuffle for certainty)."""
    h = F.xxhash64(F.col(tokens_col))
    if verify:
        keep = (df.groupBy(h.alias("_h"), F.col(tokens_col))
                .agg(F.min(id_col).alias(id_col)).select(id_col))
    else:
        keep = (df.withColumn("_h", h).groupBy("_h")
                .agg(F.min(id_col).alias(id_col)).select(id_col))
    return df.join(keep, id_col, "left_semi")


def ngram_dedup_tokens(df: DataFrame, tokens_col: str = "tokens",
                       id_col: str = "doc_id", n: int = 8,
                       k: int = 32, bands: int = 8) -> DataFrame:
    """MinHash-LSH near-dedup directly over token-id sequences: shingles
    are n-grams of token ids (hashed via aggregate over a slice — no
    string materialization), then the standard banded minhash pipeline."""
    grams = F.expr(
        f"transform(sequence(1, greatest(1, size({tokens_col}) - {n - 1})),"
        f" i -> aggregate(slice({tokens_col}, i, {n}), 0L,"
        f" (acc, x) -> xxhash64(acc, x)))")
    ex = (df.select(F.col(id_col), F.explode(grams).alias("_h")))
    aggs = [F.min(F.xxhash64("_h", F.lit(i))).alias(f"_m{i}")
            for i in range(k)]
    sig = (ex.groupBy(id_col).agg(*aggs)
           .select(id_col, F.array(*[f"_m{i}" for i in range(k)])
                   .alias("minhash")))
    exploded = _band_explode(sig, "minhash", bands, k // bands)
    w = Window.partitionBy("band", "band_hash")
    drop_ids = (exploded.withColumn("_keep", F.min(id_col).over(w))
                .filter(F.col(id_col) != F.col("_keep"))
                .select(id_col).distinct())
    return df.join(drop_ids, id_col, "left_anti")


def _word_shingles(text_col: str, n: int = 5):
    """Array of word n-gram shingle strings (JVM-side, no UDF)."""
    words = F.split(F.col(text_col), r"\s+")
    return F.expr(
        f"transform(sequence(1, greatest(1, size(split({text_col}, "
        f"'\\\\s+')) - {n - 1})), "
        f"i -> concat_ws(' ', slice(split({text_col}, '\\\\s+'), i, {n})))"
    ), words


def minhash_signature(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 32,
                      shingle_n: int = 5) -> DataFrame:
    """(id, minhash: array<bigint>[k]) — min over shingles of
    xxhash64(shingle_hash, seed_i).

    Shape matters at scale: shingle strings are built and hashed exactly
    ONCE (explode → xxhash64), then k permutations re-hash the 64-bit
    value inside a groupBy with k min-aggregates. Catalyst's partial
    aggregation combines map-side, so the exchange carries one row per id,
    and the expensive string shingling is never re-inlined per permutation
    (separate column expressions would be re-evaluated k times —
    CollapseProject has no cross-expression CSE)."""
    shingles, _ = _word_shingles(text_col, shingle_n)
    ex = (df.select(F.col(id_col), F.explode(shingles).alias("_s"))
          .select(id_col, F.xxhash64("_s").alias("_h")))
    aggs = [F.min(F.xxhash64("_h", F.lit(i))).alias(f"_m{i}")
            for i in range(k)]
    return (ex.groupBy(id_col).agg(*aggs)
            .select(id_col, F.array(*[f"_m{i}" for i in range(k)])
                    .alias("minhash")))


def _band_explode(df: DataFrame, sig_col: str, bands: int,
                  rows_per_band: int) -> DataFrame:
    band_hashes = F.expr(
        f"transform(sequence(0, {bands - 1}), b -> aggregate("
        f"slice({sig_col}, b * {rows_per_band} + 1, {rows_per_band}), "
        f"CAST(b AS BIGINT), (acc, x) -> xxhash64(acc, x)))")
    return (df.withColumn("_bands", band_hashes)
            .select("*", F.posexplode("_bands").alias("band", "band_hash"))
            .drop("_bands"))


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 32, bands: int = 8,
                      shingle_n: int = 5) -> DataFrame:
    """Drop any doc that shares an LSH band bucket with a smaller-id doc.

    bands=8 × rows=4 over k=32 minhashes ⇒ candidate threshold ≈
    (1/8)^(1/4) ≈ 0.59 Jaccard. The only shuffles are the band-bucket
    window and the final distinct — no pairwise cross-join materializes.
    """
    rows_per_band = k // bands
    sig = minhash_signature(df, id_col, text_col, k, shingle_n)
    exploded = _band_explode(sig, "minhash", bands, rows_per_band)
    w = Window.partitionBy("band", "band_hash")
    dupped = exploded.withColumn("_keep", F.min(id_col).over(w))
    drop_ids = (dupped.filter(F.col(id_col) != F.col("_keep"))
                .select(id_col).distinct())
    return df.join(drop_ids, id_col, "left_anti")


def with_simhash(df: DataFrame, text_col: str = "text",
                 nbits: int = 64) -> DataFrame:
    """64-bit simhash: sign of per-bit sum of word-hash bits (JVM exprs)."""
    df = df.withColumn(
        "_whash", F.expr(f"transform(split({text_col}, '\\\\s+'), "
                         f"w -> xxhash64(w))"))
    bit_sums = [
        F.expr(f"aggregate(_whash, 0L, (acc, h) -> acc + "
               f"(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END))")
        for b in range(nbits)]
    sim = None
    for b, s in enumerate(bit_sums):
        bit_value = -(1 << 63) if b == 63 else (1 << b)  # Long.MIN for bit 63
        term = F.when(s > 0, F.lit(bit_value)).otherwise(F.lit(0))
        sim = term if sim is None else sim.bitwiseOR(term)
    return df.withColumn("simhash", sim.cast("bigint")).drop("_whash")


def simhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Near-dup if any of the four 16-bit simhash chunks matches
    (guarantees catching hamming distance ≤ 3)."""
    sim = with_simhash(df, text_col)
    chunks = F.array(*[
        F.xxhash64(F.lit(c),
                   F.shiftrightunsigned("simhash", 16 * c) % F.lit(1 << 16))
        for c in range(4)])
    exploded = (sim.withColumn("_chunks", chunks)
                .select(id_col, F.posexplode("_chunks")
                        .alias("band", "band_hash")))
    w = Window.partitionBy("band", "band_hash")
    drop_ids = (exploded.withColumn("_keep", F.min(id_col).over(w))
                .filter(F.col(id_col) != F.col("_keep"))
                .select(id_col).distinct())
    return df.join(drop_ids, id_col, "left_anti")


def ngram_jaccard_dedup(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.8,
                        shingle_n: int = 3, k: int = 32,
                        bands: int = 16) -> DataFrame:
    """LSH candidate pairs verified by EXACT n-gram Jaccard ≥ threshold.
    The cross-join only happens inside a band bucket (self-join on the
    bucket key), never globally."""
    shingles, _ = _word_shingles(text_col, shingle_n)
    base = df.select(id_col, F.array_distinct(shingles).alias("_sh"))
    sig = minhash_signature(df, id_col, text_col, k, shingle_n).join(
        base, id_col)
    exploded = _band_explode(sig, "minhash", bands, k // bands)
    left = exploded.select(F.col(id_col).alias("a_id"),
                           F.col("_sh").alias("a_sh"), "band", "band_hash")
    right = exploded.select(F.col(id_col).alias("b_id"),
                            F.col("_sh").alias("b_sh"), "band", "band_hash")
    pairs = (left.join(right, ["band", "band_hash"])
             .filter(F.col("a_id") < F.col("b_id"))
             .dropDuplicates(["a_id", "b_id"]))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    dups = pairs.filter(inter / union >= threshold)
    drop_ids = dups.select(F.col("b_id").alias(id_col)).distinct()
    return df.join(drop_ids, id_col, "left_anti")


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).normal(
        size=(nbits, dim)).astype(np.float32)


def embedding_cosine_dedup(df: DataFrame, vec_col: str = "embedding",
                           id_col: str = "vec_id", dim: int | None = None,
                           threshold: float = 0.95,
                           nbits: int = 16) -> DataFrame:
    """Random-hyperplane LSH bucket (16-bit sketch) + exact cosine inside
    the bucket via JVM array expressions. Deterministic hyperplanes."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, nbits)
    bit_terms = []
    for b in range(nbits):
        coeffs = F.array(*[F.lit(float(x)) for x in planes[b]])
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {{c}}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)".format(c="_c" + str(b)))
        bit_terms.append((f"_c{b}", coeffs, dot, b))
    out = df
    sketch = F.lit(0)
    for name, coeffs, dot, b in bit_terms:
        out = out.withColumn(name, coeffs)
        sketch = sketch + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    out = out.withColumn("_sketch", sketch).drop(
        *[name for name, _, _, _ in bit_terms])
    left = out.select(F.col(id_col).alias("a_id"),
                      F.col(vec_col).alias("a_v"), "_sketch")
    right = out.select(F.col(id_col).alias("b_id"),
                       F.col(vec_col).alias("b_v"), "_sketch")
    dot = F.expr("aggregate(zip_with(a_v, b_v, (x, y) -> CAST(x AS DOUBLE) "
                 "* y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    norm = (F.sqrt(F.expr(
        "aggregate(a_v, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * x)"))
        * F.sqrt(F.expr(
            "aggregate(b_v, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * x)")))
    pairs = (left.join(right, "_sketch")
             .filter(F.col("a_id") < F.col("b_id"))
             .withColumn("_cos", dot / norm))
    drop_ids = (pairs.filter(F.col("_cos") >= threshold)
                .select(F.col("b_id").alias(id_col)).distinct())
    return df.join(drop_ids, id_col, "left_anti")
