"""Checkpoint/resume tests (SURVEY.md §5.2 resume test): kill the encode
after k partitions (simulated by a partial manifest), re-run, assert
committed partitions are not recomputed and the final decode is identical."""

import os

import pyspark.sql.functions as F

from tbl_spark.datagen import SPARK_SCHEMA_DDL, generate_df
from tbl_spark.store import ChunkStore, decode_from_store, encode_to_store

N_DOCS = 4000
N_CHUNKS = 8


def test_encode_to_store_and_decode(spark, tmp_path):
    store = ChunkStore(str(tmp_path / "store"))
    df = generate_df(spark, N_DOCS, 4)
    summary = encode_to_store(df, store, N_CHUNKS)
    assert summary["encoded_parts"] == N_CHUNKS
    assert summary["n_rows"] == N_DOCS
    assert len(store.committed_parts()) == N_CHUNKS

    decoded = decode_from_store(store, spark, SPARK_SCHEMA_DDL)
    n = decoded.alias("b").join(df.alias("a"), "doc_id").filter(
        F.col("a.tokens") == F.col("b.tokens")).count()
    assert n == N_DOCS


def test_resume_skips_committed_parts(spark, tmp_path):
    store = ChunkStore(str(tmp_path / "store"))
    df = generate_df(spark, N_DOCS, 4)
    encode_to_store(df, store, N_CHUNKS)

    # simulate an interrupted run: drop commit markers for half the parts
    kept: dict[int, float] = {}
    for part in sorted(store.committed_parts()):
        path = os.path.join(store.manifest_dir, f"part-{part:05d}.json")
        if part % 2 == 0:
            kept[part] = os.path.getmtime(
                os.path.join(store.chunks_dir, f"part-{part:05d}.parquet"))
        else:
            os.remove(path)

    summary = encode_to_store(df, store, N_CHUNKS)
    assert summary["encoded_parts"] == N_CHUNKS // 2   # only the dropped half
    assert summary["skipped_parts"] == N_CHUNKS // 2

    for part, mtime in kept.items():  # committed chunk files untouched
        chunk = os.path.join(store.chunks_dir, f"part-{part:05d}.parquet")
        assert os.path.getmtime(chunk) == mtime

    decoded = decode_from_store(store, spark, SPARK_SCHEMA_DDL)
    n = decoded.alias("b").join(df.alias("a"), "doc_id").filter(
        F.col("a.tokens") == F.col("b.tokens")).count()
    assert n == N_DOCS


def test_crash_between_chunk_and_manifest_is_safe(spark, tmp_path):
    """Orphan chunk file without its manifest marker → re-encoded, then
    overwritten atomically; decode stays correct."""
    store = ChunkStore(str(tmp_path / "store"))
    df = generate_df(spark, N_DOCS, 4)
    encode_to_store(df, store, N_CHUNKS)
    victim = sorted(store.committed_parts())[0]
    os.remove(os.path.join(store.manifest_dir, f"part-{victim:05d}.json"))
    # chunk parquet for the victim still exists (the orphan)
    assert os.path.exists(
        os.path.join(store.chunks_dir, f"part-{victim:05d}.parquet"))
    summary = encode_to_store(df, store, N_CHUNKS)
    assert summary["encoded_parts"] == 1
    decoded = decode_from_store(store, spark, SPARK_SCHEMA_DDL)
    assert decoded.count() == N_DOCS


def test_manifest_lineage_content(spark, tmp_path):
    store = ChunkStore(str(tmp_path / "store"))
    encode_to_store(generate_df(spark, 1000, 2), store, 4)
    rows = store.manifest_rows()
    assert len(rows) == 4
    import json
    for r in rows:
        cols = json.loads(r["columns"])
        assert set(cols) == {"doc_id", "tokens", "n_tok", "source"}
        for c in cols.values():
            assert c["enc_bytes"] > 0 and c["codec"]
        assert r["enc_bytes"] == sum(c["enc_bytes"] for c in cols.values())


def test_colocated_decode_no_shuffle(spark, tmp_path):
    """decode_from_store must plan NO Exchange (zero-shuffle streaming)."""
    store = ChunkStore(str(tmp_path / "store"))
    df = generate_df(spark, 2000, 2)
    encode_to_store(df, store, 6)
    decoded = decode_from_store(store, spark, SPARK_SCHEMA_DDL)
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    n = decoded.alias("b").join(df.alias("a"), "doc_id").filter(
        F.col("a.tokens") == F.col("b.tokens")).count()
    assert n == 2000 and decoded.count() == 2000


def test_metrics_df_and_column_pruned_decode(spark, tmp_path):
    store = ChunkStore(str(tmp_path / "store"))
    df = generate_df(spark, 1500, 2)
    encode_to_store(df, store, 4)
    m = store.metrics_df(spark).collect()
    assert len(m) == 4
    assert all(r.ratio > 1.0 and r.tokens_per_sec > 0
               and 0 < r.bytes_per_token < 4 for r in m)
    pruned = decode_from_store(store, spark, SPARK_SCHEMA_DDL,
                               columns=["doc_id", "n_tok"])
    assert pruned.columns == ["doc_id", "n_tok"]
    assert pruned.count() == 1500


def test_compaction_wave_files(spark, tmp_path):
    """Compaction coalesces chunk files into wave files (row group per
    part); decode stays zero-shuffle bit-exact; resume still skips all."""
    import pyarrow.parquet as pq

    store = ChunkStore(str(tmp_path / "store"))
    df = generate_df(spark, 3000, 4)
    encode_to_store(df, store, 10)
    assert len(store.data_files()) == 10

    written = store.compact(wave_size=4)
    assert written == 2  # 10 parts -> 2 waves of 4 + 2 loose
    files = store.data_files()
    assert len(files) == 4  # 2 wave files + 2 loose part files
    wave = [f for f in files if "wave-" in f][0]
    assert pq.read_metadata(wave).num_row_groups == 4  # one per part

    # committed set unchanged; resume re-encodes nothing
    assert len(store.committed_parts()) == 10
    summary = encode_to_store(df, store, 10)
    assert summary["encoded_parts"] == 0 and summary["skipped_parts"] == 10

    # decode: still zero-shuffle, still bit-exact
    decoded = decode_from_store(store, spark, SPARK_SCHEMA_DDL)
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    n = decoded.alias("b").join(df.alias("a"), "doc_id").filter(
        F.col("a.tokens") == F.col("b.tokens")).count()
    assert n == 3000

    # per-part lineage survives compaction
    rows = store.manifest_rows()
    assert len(rows) == 10
    from tbl_spark.inspect import store_stats
    assert store_stats(store)["rows"] == 3000

    # compacting again is a no-op (only 2 loose parts < wave_size)
    assert store.compact(wave_size=4) == 0
