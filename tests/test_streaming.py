"""Streaming-ingestion tests: files arrive in waves; every wave is encoded
into batch-scoped chunk stores; the union decode is complete and exact."""

import pyspark.sql.functions as F

from tbl_spark.datagen import SPARK_SCHEMA_DDL, generate_df, write_token_table
from tbl_spark.streaming import (decode_stream_store, stream_encode,
                                 stream_store_stats)


def test_stream_encode_two_waves(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "store")

    # wave 1: first half of the table arrives
    write_token_table(inbox, 1200, n_parts=4)  # parts 0..3 = docs 0..1199
    stream_encode(spark, inbox, store, num_parts=4,
                  schema_ddl=SPARK_SCHEMA_DDL)
    decoded = decode_stream_store(spark, store, SPARK_SCHEMA_DDL)
    assert decoded.count() == 1200

    # wave 2: more files land in the same inbox; restart picks up ONLY them
    import os
    from tbl_spark.datagen import generate_part
    import pyarrow.parquet as pq
    for part in (4, 5):
        tbl = generate_part(part, 300, rows_per_part=300)
        pq.write_table(tbl, os.path.join(inbox, f"late-{part}.parquet"),
                       compression="zstd")
    stream_encode(spark, inbox, store, num_parts=4,
                  schema_ddl=SPARK_SCHEMA_DDL)

    decoded = decode_stream_store(spark, store, SPARK_SCHEMA_DDL)
    assert decoded.count() == 1800
    # exactness: every decoded row bit-equals its source row
    src = spark.read.parquet(inbox)
    n = src.alias("a").join(decoded.alias("b"), "doc_id").filter(
        F.col("a.tokens") == F.col("b.tokens")).count()
    assert n == 1800

    stats = stream_store_stats(store)
    assert stats["rows"] == 1800 and stats["batches"] >= 2
    assert stats["enc_bytes"] < stats["raw_bytes"]


def test_stream_encode_colocated_zero_shuffle(spark, tmp_path):
    """Streaming ingestion over the zero-shuffle path: same completeness
    and bit-exactness contract, no Exchange in any micro-batch job."""
    inbox = str(tmp_path / "inbox")
    store = str(tmp_path / "store")
    write_token_table(inbox, 1000, n_parts=4)
    stream_encode(spark, inbox, store, num_parts=4,
                  schema_ddl=SPARK_SCHEMA_DDL, colocated=True)
    decoded = decode_stream_store(spark, store, SPARK_SCHEMA_DDL)
    src = spark.read.parquet(inbox)
    n = src.alias("a").join(decoded.alias("b"), "doc_id").filter(
        F.col("a.tokens") == F.col("b.tokens")).count()
    assert n == 1000
    # replay idempotence: wipe the streaming checkpoint so the SAME
    # micro-batch replays into the same batch dir — nothing re-commits
    # (a batch-API read would be rejected by the input-files pin, which
    # is the store's fail-fast doing its job)
    import glob
    import shutil as _sh
    from tbl_spark.store import ChunkStore
    _sh.rmtree(f"{store}/_checkpoint")
    stream_encode(spark, inbox, store, num_parts=4,
                  schema_ddl=SPARK_SCHEMA_DDL, colocated=True)
    batch_dir = sorted(glob.glob(f"{store}/batch=*"))[0]
    replayed = ChunkStore(batch_dir).snapshots()[-1]
    assert replayed["encoded_parts"] == 0
    assert decode_stream_store(spark, store, SPARK_SCHEMA_DDL).count() \
        == 1000


def test_windowed_token_stats_watermark(spark, tmp_path):
    """Tumbling event-time windows with a watermark: finalized windows
    emit exactly once in append mode, and a row arriving behind the
    watermark never re-opens its (already-emitted) window."""
    import datetime as dt
    import os
    import time

    from tbl_spark.streaming import windowed_token_stats

    inbox = str(tmp_path / "win_inbox")
    os.makedirs(inbox)
    ddl = "doc_id string, source string, n_tok int, event_time timestamp"

    def write_wave(name, rows):
        spark.createDataFrame(rows, ddl).coalesce(1) \
            .write.mode("overwrite").parquet(f"{inbox}/{name}")

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)   # noqa: E731
    write_wave("w1", [("a", "web", 10, t(10, 5)),
                      ("b", "web", 20, t(10, 50)),
                      ("c", "books", 5, t(11, 20)),
                      ("d", "web", 7, t(12, 30))])
    stream = (spark.readStream.schema(ddl)
              .option("pathGlobFilter", "*.parquet")
              .option("recursiveFileLookup", "true").parquet(inbox))
    out = windowed_token_stats(stream, watermark="10 minutes",
                               window_len="1 hour")
    q = (out.writeStream.format("memory").queryName("win_stats")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_w")).start())
    try:
        q.processAllAvailable()
        # watermark now 12:20 → the 10-11 and 11-12 windows are final
        got = {(r["win_start"].hour, r["source"]): (r["tokens"], r["docs"])
               for r in spark.sql("SELECT * FROM win_stats").collect()}
        assert got[(10, "web")] == (30, 2)
        assert got[(11, "books")] == (5, 1)
        # wave 2: one row BEHIND the watermark (10:30 < 12:20) plus one
        # that advances it past the 12-13 window
        write_wave("w2", [("late", "web", 999, t(10, 30)),
                          ("e", "web", 3, t(13, 40))])
        q.processAllAvailable()
        got = {(r["win_start"].hour, r["source"]): (r["tokens"], r["docs"])
               for r in spark.sql("SELECT * FROM win_stats").collect()}
        # the late row did NOT re-open or inflate the finalized window
        assert got[(10, "web")] == (30, 2)
        assert got[(12, "web")] == (7, 1)
    finally:
        q.stop()


def test_stream_dedup_exact_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps one row per text hash ACROSS
    micro-batches: later exact duplicates are suppressed by the state
    store, not by any within-batch join."""
    import os

    from tbl_spark.streaming import stream_dedup_exact

    inbox = str(tmp_path / "dd_inbox")
    os.makedirs(inbox)
    ddl = "doc_id string, text string"

    def write_wave(name, rows):
        spark.createDataFrame(rows, ddl).coalesce(1) \
            .write.mode("overwrite").parquet(f"{inbox}/{name}")

    write_wave("w1", [("a", "alpha text"), ("a2", "alpha text"),
                      ("b", "beta text")])
    stream = (spark.readStream.schema(ddl)
              .option("pathGlobFilter", "*.parquet")
              .option("recursiveFileLookup", "true").parquet(inbox))
    out = stream_dedup_exact(stream)
    q = (out.writeStream.format("memory").queryName("dd_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_d")).start())
    try:
        q.processAllAvailable()
        rows1 = spark.sql("SELECT * FROM dd_stream").collect()
        assert sorted({r["text"] for r in rows1}) == ["alpha text",
                                                      "beta text"]
        assert len(rows1) == 2          # within-batch dup also suppressed
        # batch 2: cross-batch duplicate + a new text
        write_wave("w2", [("c", "alpha text"), ("d", "gamma text")])
        q.processAllAvailable()
        rows2 = spark.sql("SELECT * FROM dd_stream").collect()
        assert sorted({r["text"] for r in rows2}) == [
            "alpha text", "beta text", "gamma text"]
        assert len(rows2) == 3          # 'c' was suppressed by state
        emitted = {r["doc_id"] for r in rows2}
        assert "c" not in emitted and "d" in emitted
    finally:
        q.stop()


def test_stream_dedup_timeout_expires_and_readmits(spark, tmp_path):
    """The ProcessingTimeTimeout arm: an idle hash's state expires after
    the timeout, so a later duplicate is re-admitted (the documented
    bounded-state trade); a fresh-in-window duplicate stays suppressed.

    NOTE: with ProcessingTimeTimeout Spark keeps running no-data
    state-cleanup batches, so processAllAvailable never goes idle —
    the test polls the memory sink under a fixed trigger instead."""
    import os
    import time

    from tbl_spark.streaming import stream_dedup_exact

    inbox = str(tmp_path / "to_inbox")
    os.makedirs(inbox)
    ddl = "doc_id string, text string"

    def write_wave(name, rows):
        spark.createDataFrame(rows, ddl).coalesce(1) \
            .write.mode("overwrite").parquet(f"{inbox}/{name}")

    def wait_count(n, timeout_s=90):
        for _ in range(timeout_s * 2):
            if spark.sql("SELECT count(*) FROM to_stream") \
                    .collect()[0][0] >= n:
                return
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {n} rows")

    write_wave("w1", [("a", "alpha")])
    stream = (spark.readStream.schema(ddl)
              .option("pathGlobFilter", "*.parquet")
              .option("recursiveFileLookup", "true").parquet(inbox))
    out = stream_dedup_exact(stream, timeout_minutes=20 / 60)  # 20 s
    q = (out.writeStream.format("memory").queryName("to_stream")
         .outputMode("append")
         .trigger(processingTime="500 milliseconds")
         .option("checkpointLocation", str(tmp_path / "ckpt_t")).start())
    try:
        wait_count(1)
        t1 = time.monotonic()
        # in-window duplicate suppressed; the marker row proves the
        # batch was processed
        write_wave("w2", [("b", "alpha"), ("m1", "marker one")])
        wait_count(2)
        in_window = time.monotonic() - t1 < 15   # 20 s timeout - slack
        ids = {r["doc_id"] for r in
               spark.sql("SELECT * FROM to_stream").collect()}
        assert "m1" in ids
        # only assert suppression when the duplicate provably arrived
        # inside the state window — on a heavily loaded host the w2
        # batch can land after the 20 s expiry, and re-admission is
        # then the CORRECT behavior, not a bug (the r7 full-suite
        # flake)
        if in_window:
            assert "b" not in ids
        # let the alpha state expire (cleanup batches keep running
        # under the fixed trigger), then re-admit
        time.sleep(25)
        write_wave("w3", [("e", "alpha"), ("m2", "marker two")])
        wait_count(4)
        rows = spark.sql("SELECT * FROM to_stream").collect()
        ids = {r["doc_id"] for r in rows}
        assert "e" in ids and "m2" in ids
        if in_window:
            assert "b" not in ids
            assert len([r for r in rows
                        if r["text"] == "alpha"]) == 2
    finally:
        q.stop()
