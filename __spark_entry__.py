"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one implemented operator from SURVEY.md §2 (or a
training-data pipeline op); ``oracle_sql()`` carries the DuckDB-equivalent
ANSI SQL where the op is SQL-expressible. Encode/decode roundtrip queries
use the identity SELECT as oracle — the whole codec engine must reproduce
the table bit-exactly for those to hash-match.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EN_STOP = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "that"]


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _roundtrip(spark: SparkSession, sf_dir: str, table: str,
               key_cols: list[str], num_parts: int = 32) -> DataFrame:
    """encode → decode identity pipeline over a testdata table."""
    from tbl_spark.decode import decode_chunks
    from tbl_spark.encode import encode_chunks
    df = _read(spark, sf_dir, table)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in df.schema.fields)
    salted = df.withColumn(
        "part_id",
        F.pmod(F.xxhash64(*key_cols), F.lit(num_parts)).cast("int"))
    return decode_chunks(encode_chunks(salted, num_parts), ddl)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full columnar encode→decode roundtrip of the documents
    table at sf0.001 (exercises codecs, salted partitioning, Arrow jobs)."""
    return _roundtrip(spark, "/root/testdata/sf0.001", "documents",
                      ["doc_id"])


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tbl_spark.pipelines import dedup, multimodal, similarity, textstats
    from tbl_spark.transforms import TransformSpec, apply_transforms, merge

    # -- relational surface (SURVEY.md §2.2/2.6/2.7) -------------------------

    def filter_sort_head(spark, sf):
        # tbl's fixed order runs head BEFORE sort (transform.rs:9-22), so a
        # deterministic top-k needs two passes: sort pass, then slice pass.
        li = _read(spark, sf, "lineitem")
        sorted_df = apply_transforms(li, TransformSpec(
            filters=["l_quantity>=30", "l_returnflag=A"],
            select=["l_orderkey", "l_linenumber", "l_quantity"],
            sort=["l_quantity:desc", "l_orderkey", "l_linenumber"]))
        return apply_transforms(sorted_df, TransformSpec(head=100))

    def value_counts_returnflag(spark, sf):
        li = _read(spark, sf, "lineitem")
        return apply_transforms(li, TransformSpec(
            value_counts="l_returnflag"))

    def replace_with_columns(spark, sf):
        o = _read(spark, sf, "orders")
        return apply_transforms(o, TransformSpec(
            with_columns=["flag:i32=7"],
            replace=["o_orderstatus.O=OPEN"],
            select=["o_orderkey", "o_orderstatus", "flag"]))

    def merge_union_counts(spark, sf):
        li = _read(spark, sf, "lineitem")
        return apply_transforms(merge([li, li]), TransformSpec(
            value_counts="l_linestatus"))

    def offset_slice(spark, sf):
        o = _read(spark, sf, "orders")
        return apply_transforms(o, TransformSpec(
            select=["o_orderkey", "o_totalprice"],
            sort=["o_orderkey"], offset=100, head=50))

    def select_cast_project(spark, sf):
        li = _read(spark, sf, "lineitem")
        return apply_transforms(li, TransformSpec(
            cast=["l_quantity=i32"],
            select=["l_orderkey", "l_linenumber", "l_quantity"],
            rename=["l_quantity=qty"]))

    def null_predicate_filter(spark, sf):
        e = _read(spark, sf, "events")
        return apply_transforms(e, TransformSpec(
            filters=["user_id.is_not_null", "value>=0"],
            select=["event_id", "user_id", "value"]))

    def sorted_tail(spark, sf):
        o = _read(spark, sf, "orders")
        sorted_df = apply_transforms(o, TransformSpec(
            select=["o_orderkey", "o_custkey"], sort=["o_orderkey"]))
        return apply_transforms(sorted_df, TransformSpec(tail=30))

    def nullify_set(spark, sf):
        o = _read(spark, sf, "orders")
        return apply_transforms(o, TransformSpec(
            set=["o_orderpriority=X"],
            nullify=["o_totalprice"],
            select=["o_orderkey", "o_orderpriority", "o_totalprice"]))

    # -- codec engine roundtrips (identity oracles) --------------------------

    def roundtrip_lineitem(spark, sf):
        return _roundtrip(spark, sf, "lineitem",
                          ["l_orderkey", "l_linenumber"])

    def roundtrip_events(spark, sf):
        return _roundtrip(spark, sf, "events", ["event_id"])

    def roundtrip_documents(spark, sf):
        return _roundtrip(spark, sf, "documents", ["doc_id"])

    def roundtrip_embeddings(spark, sf):
        rt = _roundtrip(spark, sf, "embeddings", ["vec_id"])
        return rt.select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            .alias("embedding_d"), "label")

    def encode_stats(spark, sf):
        from tbl_spark.encode import encode_chunks
        docs = _read(spark, sf, "documents").withColumn(
            "part_id", F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int"))
        chunks = encode_chunks(docs, 4)
        return (chunks.groupBy("column")
                .agg(F.sum("raw_bytes").alias("raw_bytes"),
                     F.sum("enc_bytes").alias("enc_bytes"),
                     F.sum("n_rows").alias("n_rows"))
                .orderBy("column"))

    # -- dedup ---------------------------------------------------------------

    def dedup_exact(spark, sf):
        return dedup.exact_dedup(_read(spark, sf, "documents"))

    def dedup_minhash_lsh(spark, sf):
        out = dedup.minhash_lsh_dedup(_read(spark, sf, "documents"))
        return out.select("doc_id").orderBy("doc_id")

    def dedup_simhash(spark, sf):
        out = dedup.simhash_dedup(_read(spark, sf, "documents"))
        return out.select("doc_id").orderBy("doc_id")

    def dedup_ngram_jaccard(spark, sf):
        out = dedup.ngram_jaccard_dedup(
            _read(spark, sf, "documents"), threshold=0.8)
        return out.select("doc_id").orderBy("doc_id")

    def dedup_embedding_cosine(spark, sf):
        out = dedup.embedding_cosine_dedup(
            _read(spark, sf, "embeddings"), threshold=0.98)
        return out.select("vec_id").orderBy("vec_id")

    # -- text analysis -------------------------------------------------------

    def text_token_count(spark, sf):
        docs = _read(spark, sf, "documents")
        return textstats.with_token_count(docs).select(
            "doc_id", "n_ws_tokens", "n_bpe_tokens")

    def text_quality(spark, sf):
        docs = _read(spark, sf, "documents")
        return textstats.with_quality_score(docs).select(
            "doc_id", "n_words", "punct_ratio", "stop_ratio", "quality")

    def text_lang_id(spark, sf):
        docs = _read(spark, sf, "documents")
        return textstats.with_lang_id(docs).select("doc_id", "lang_pred")

    def text_fingerprint(spark, sf):
        docs = _read(spark, sf, "documents")
        return textstats.with_fingerprint(docs).select(
            "doc_id", "fingerprint")

    # -- similarity search ---------------------------------------------------

    def ann_cosine_topk(spark, sf):
        emb = _read(spark, sf, "embeddings")
        q = emb.filter("vec_id = 1").select("embedding").first()[0]
        return similarity.brute_force_topk(emb, q, k=20)

    def ann_ivf_topk(spark, sf):
        emb = _read(spark, sf, "embeddings")
        q = emb.filter("vec_id = 1").select("embedding").first()[0]
        return similarity.ivf_topk(emb, q, k=20, nlist=8, nprobe=4)

    # -- multimodal plumbing -------------------------------------------------

    def media_features(spark, sf):
        docs = _read(spark, sf, "documents").orderBy("doc_id").limit(100)
        media = multimodal.attach_media(docs)
        return multimodal.extract_features(media, dim=16, fake_decode=True)

    return {
        "filter_sort_head": filter_sort_head,
        "value_counts_returnflag": value_counts_returnflag,
        "replace_with_columns": replace_with_columns,
        "merge_union_counts": merge_union_counts,
        "offset_slice": offset_slice,
        "select_cast_project": select_cast_project,
        "null_predicate_filter": null_predicate_filter,
        "sorted_tail": sorted_tail,
        "nullify_set": nullify_set,
        "roundtrip_lineitem": roundtrip_lineitem,
        "roundtrip_events": roundtrip_events,
        "roundtrip_documents": roundtrip_documents,
        "roundtrip_embeddings": roundtrip_embeddings,
        "encode_stats": encode_stats,
        "dedup_exact": dedup_exact,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_simhash": dedup_simhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_embedding_cosine": dedup_embedding_cosine,
        "text_token_count": text_token_count,
        "text_quality": text_quality,
        "text_lang_id": text_lang_id,
        "text_fingerprint": text_fingerprint,
        "ann_cosine_topk": ann_cosine_topk,
        "ann_ivf_topk": ann_ivf_topk,
        "media_features": media_features,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — omit entries for non-SQL-expressible ops
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    stop_list = "[" + ", ".join(f"'{s}'" for s in EN_STOP) + "]"
    quality_base = """
        SELECT doc_id,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '\\S+')) AS n_words,
               len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
               len(list_intersect(
                   list_distinct(regexp_extract_all(text, '\\S+')),
                   {stop})) AS n_stop
        FROM documents
    """.format(stop=stop_list)
    return {
        "filter_sort_head": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity >= 30 AND l_returnflag = 'A'
            ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 100""",
        "value_counts_returnflag": """
            SELECT l_returnflag, count(*) AS count FROM lineitem
            GROUP BY l_returnflag ORDER BY count DESC, l_returnflag""",
        "replace_with_columns": """
            SELECT o_orderkey,
                   CASE WHEN o_orderstatus = 'O' THEN 'OPEN'
                        ELSE o_orderstatus END AS o_orderstatus,
                   CAST(7 AS INTEGER) AS flag
            FROM orders""",
        "merge_union_counts": """
            SELECT l_linestatus, count(*) AS count FROM
            (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem)
            GROUP BY l_linestatus ORDER BY count DESC, l_linestatus""",
        "offset_slice": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
        "select_cast_project": """
            SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS INTEGER) AS qty
            FROM lineitem""",
        "nullify_set": """
            SELECT o_orderkey, 'X' AS o_orderpriority,
                   CAST(NULL AS DOUBLE) AS o_totalprice
            FROM orders""",
        "null_predicate_filter": """
            SELECT event_id, user_id, value FROM events
            WHERE user_id IS NOT NULL AND value >= 0""",
        "sorted_tail": """
            SELECT o_orderkey, o_custkey FROM orders
            ORDER BY o_orderkey DESC LIMIT 30""",
        "roundtrip_lineitem": "SELECT * FROM lineitem",
        "roundtrip_events": "SELECT * FROM events",
        "roundtrip_documents": "SELECT * FROM documents",
        "roundtrip_embeddings": """
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS embedding_d,
                   label
            FROM embeddings""",
        "dedup_exact": """
            SELECT text, min(doc_id) AS doc_id
            FROM documents GROUP BY text""",
        "text_token_count": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS INTEGER)
                       AS n_ws_tokens,
                   CAST(ceil(length(text) / 4.0) AS INTEGER) AS n_bpe_tokens
            FROM documents""",
        "text_quality": f"""
            SELECT doc_id,
                   CAST(n_words AS INTEGER) AS n_words,
                   round(n_punct / greatest(n_chars, 1), 4) AS punct_ratio,
                   round(n_stop / 10.0, 4) AS stop_ratio,
                   round(
                     least(n_words / 100.0, CAST(1.0 AS DOUBLE)) * 0.4
                     + (CAST(1.0 AS DOUBLE)
                        - least(n_punct / greatest(n_chars, 1) * 10,
                                CAST(1.0 AS DOUBLE))) * 0.2
                     + n_stop / 10.0 * 0.2
                     + (CASE WHEN (n_chars - (n_words - 1))
                                  / greatest(n_words, 1) >= 3
                              AND (n_chars - (n_words - 1))
                                  / greatest(n_words, 1) <= 10
                             THEN CAST(1.0 AS DOUBLE)
                             ELSE CAST(0.0 AS DOUBLE) END) * 0.2, 4)
                       AS quality
            FROM ({quality_base})""",
        "ann_cosine_topk": """
            WITH q AS (SELECT list_transform(embedding,
                                             x -> CAST(x AS DOUBLE)) AS qv
                       FROM embeddings WHERE vec_id = 1)
            SELECT vec_id,
                   round(
                     list_dot_product(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (SELECT qv FROM q))
                     / (sqrt(list_dot_product(
                          list_transform(embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(embedding, x -> CAST(x AS DOUBLE))))
                        * sqrt(list_dot_product((SELECT qv FROM q),
                                                (SELECT qv FROM q)))), 4)
                       AS cos
            FROM embeddings
            ORDER BY cos DESC, vec_id LIMIT 20""",
    }
