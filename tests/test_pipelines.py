"""Training-data pipeline tests: dedup (planted dups), similarity (recall
vs brute force), text stats determinism, multimodal plumbing."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from tbl_spark.pipelines import dedup, similarity, textstats, multimodal


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def planted(spark, docs):
    """documents + exact dups + near dups with known ids (offset +10000)."""
    exact = docs.limit(20).withColumn(
        "doc_id", F.col("doc_id") + 10_000)
    near = (docs.filter("doc_id >= 20").limit(20)
            .withColumn("doc_id", F.col("doc_id") + 20_000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" extra"))))
    return docs.unionByName(exact).unionByName(near)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup(spark, planted, docs):
    out = dedup.exact_dedup(planted)
    n_docs = docs.count()
    assert out.count() == n_docs + 20          # near-dups survive exact
    assert out.filter(F.col("doc_id") >= 10_000).count() == 20  # only near


def test_minhash_lsh_dedup_catches_near_dups(spark, planted, docs):
    out = dedup.minhash_lsh_dedup(planted)
    kept = out.count()
    # all 20 exact dups and most near dups must be dropped
    assert kept <= docs.count() + 5
    # original corpus (500 distinct word-soup docs) mostly intact
    assert kept >= docs.count() - 60


def test_simhash_dedup_drops_exact_dups(spark, planted, docs):
    out = dedup.simhash_dedup(planted)
    dropped = planted.count() - out.count()
    assert dropped >= 20  # at least the exact dups


def test_ngram_jaccard_verify(spark, planted, docs):
    out = dedup.ngram_jaccard_dedup(planted, threshold=0.8)
    # exact dups (jaccard 1.0) and ' extra'-suffixed near dups (j≈0.95+)
    dropped = planted.count() - out.count()
    assert dropped >= 35
    # our planted dup ids (larger than the originals they copy) are gone
    assert out.filter("doc_id >= 10000").count() <= 2
    # NOTE: the testdata documents table itself contains driver-planted
    # near-duplicates (e.g. 474 vs 498, jaccard≈0.99) — those are real
    # positives, so we do NOT assert the original corpus stays intact.


def test_embedding_cosine_dedup(spark, emb):
    dup = emb.limit(10).withColumn("vec_id", F.col("vec_id") + 10_000)
    planted = emb.unionByName(dup)
    out = dedup.embedding_cosine_dedup(planted, threshold=0.99)
    assert out.count() == emb.count()  # the 10 exact copies dropped
    assert out.filter(F.col("vec_id") >= 10_000).count() == 0


def test_brute_force_topk(spark, emb):
    q = emb.filter("vec_id = 1").select("embedding").first()[0]
    top = similarity.brute_force_topk(emb, q, k=5).collect()
    assert top[0]["vec_id"] == 1 and abs(top[0]["cos"] - 1.0) < 1e-6
    cs = [r["cos"] for r in top]
    assert cs == sorted(cs, reverse=True)


def test_ivf_recall_vs_brute_force(spark, emb):
    q = emb.filter("vec_id = 7").select("embedding").first()[0]
    exact = {r["vec_id"] for r in
             similarity.brute_force_topk(emb, q, k=10).collect()}
    approx = {r["vec_id"] for r in
              similarity.ivf_topk(emb, q, k=10, nlist=8, nprobe=4).collect()}
    assert len(exact & approx) >= 6  # recall ≥ 0.6 with nprobe/nlist = 0.5


def test_token_count_and_quality(spark, docs):
    out = textstats.with_quality_score(textstats.with_token_count(docs))
    rows = out.select("n_ws_tokens", "n_bpe_tokens", "quality").collect()
    assert all(r.n_ws_tokens > 0 and r.n_bpe_tokens > 0 for r in rows)
    assert all(0.0 <= r.quality <= 1.0 for r in rows)


def test_lang_id_and_fingerprint_deterministic(spark, docs):
    a = textstats.with_fingerprint(textstats.with_lang_id(docs)) \
        .select("doc_id", "lang_pred", "fingerprint").collect()
    b = textstats.with_fingerprint(textstats.with_lang_id(docs)) \
        .select("doc_id", "lang_pred", "fingerprint").collect()
    assert a == b
    langs = {r.lang_pred for r in a}
    assert langs <= {"en", "de", "fr", "es", "und"}


def test_fingerprint_stable_under_extra_whitespace(spark, docs):
    doubled = docs.withColumn(
        "text", F.regexp_replace("text", " ", "  "))
    a = textstats.with_fingerprint(docs).select("doc_id", "fingerprint")
    b = textstats.with_fingerprint(doubled).select("doc_id", "fingerprint")
    joined = a.alias("a").join(b.alias("b"), "doc_id").filter(
        F.col("a.fingerprint") == F.col("b.fingerprint"))
    assert joined.count() == docs.count()


def test_multimodal_plumbing(spark, docs):
    media = multimodal.attach_media(docs.limit(60))
    assert dict(media.dtypes)["payload"] == "binary"
    feats = multimodal.extract_features(media, dim=16, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r.feature) == 16 for r in rows)
    # deterministic: same payload -> same features
    again = {r.media_id: r.feature for r in
             multimodal.extract_features(media, dim=16,
                                         fake_decode=True).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_multimodal_real_decode_is_stubbed():
    if multimodal.HAVE_PIL:
        pytest.skip("PIL present")
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_image(b"x", 4, 4, fake_decode=False)


def test_frame_sample(spark, docs):
    media = multimodal.attach_media(docs.limit(90))
    frames = multimodal.frame_sample(media, every_n=5)
    rows = frames.select("media_id", "n_frames", "frame_idx").collect()
    assert rows and all(r.frame_idx % 5 == 0 and r.frame_idx < r.n_frames
                        for r in rows)


def test_exact_dedup_tokens(spark):
    from tbl_spark.datagen import generate_df
    import pyspark.sql.functions as F
    df = generate_df(spark, 2000, 2)
    # plant exact token-sequence dups under new ids
    dup = df.limit(15).withColumn("doc_id", F.concat(F.lit("dup-"),
                                                     F.col("doc_id")))
    planted = df.unionByName(dup)
    dup_originals = [r["doc_id"] for r in dup.select(
        F.expr("substring(doc_id, 5)").alias("doc_id")).collect()]
    for verify in (False, True):
        out = dedup.exact_dedup_tokens(planted, verify=verify)
        # fixture itself contains 1 duplicate pair (part-0 edge rows 5/6)
        assert out.count() in (1999, 2000)
        # exactly ONE of each planted pair survives (min doc_id — which
        # side wins depends on lexicographic order, not provenance)
        survivors = out.filter(
            F.col("doc_id").startswith("dup-")
            | F.col("doc_id").isin(dup_originals)).count()
        # 15 pairs → 15 survivors, minus overlap with the fixture's own
        # internal duplicate pair (edge rows 5/6 share tokens), which can
        # merge two planted pairs into one group
        assert 13 <= survivors <= 15


def test_ngram_dedup_tokens(spark):
    from tbl_spark.datagen import generate_df
    import pyspark.sql.functions as F
    df = generate_df(spark, 1000, 2)
    near = (df.limit(10)
            .withColumn("doc_id", F.concat(F.lit("nd-"), F.col("doc_id")))
            .withColumn("tokens", F.concat(F.col("tokens"),
                                           F.array(F.lit(1), F.lit(2)))))
    planted = df.unionByName(near)
    out = dedup.ngram_dedup_tokens(planted)
    dropped = planted.count() - out.count()
    assert dropped >= 8          # ≥ one of nearly every planted pair
    assert out.count() >= 950    # corpus largely intact
