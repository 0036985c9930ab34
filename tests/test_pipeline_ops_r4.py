"""Round-4 training-data operators: exact substring (k-token window)
dedup/excision, Gopher-style quality rules, sequence packing, stratified
sampling, PII redaction."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tbl_spark.pipelines import dedup
from tbl_spark.pipelines.packing import pack_sequences
from tbl_spark.pipelines.sampling import stratified_sample
from tbl_spark.pipelines.textstats import (with_gopher_quality,
                                           with_pii_redacted)


@pytest.fixture()
def tok_df(spark):
    rows = [
        ("a", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
        ("b", [1, 2, 3, 4, 5, 6, 7, 8, 20, 21]),  # shares window [1..8]
        ("c", [50, 51, 52]),                      # shorter than k
        ("d", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),  # exact twin of a
        ("e", [70, 71]),                          # sub-k twin pair: the
        ("f", [70, 71]),                          # operator must NOT touch
    ]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_substring_dup_stats(tok_df):
    got = {r["doc_id"]: r for r in
           dedup.substring_dup_stats(tok_df, k=8).collect()}
    assert got["a"]["n_windows"] == 3 and got["a"]["dup_windows"] == 3
    assert got["b"]["dup_windows"] == 1          # only [1..8]
    # shorter than k -> NO windows (partial windows would misclassify
    # every sub-k duplicate doc as 100% duplicated)
    assert got["c"]["n_windows"] == 0 and got["c"]["dup_windows"] == 0
    assert got["e"]["n_windows"] == 0 and got["f"]["dup_windows"] == 0
    assert got["d"]["dup_frac"] == 1.0


def test_substring_dup_stats_gram_reprs_agree(tok_df):
    h = dedup.substring_dup_stats(tok_df, k=8, gram_repr="hash") \
        .orderBy("doc_id").collect()
    s = dedup.substring_dup_stats(tok_df, k=8, gram_repr="string") \
        .orderBy("doc_id").collect()
    assert [tuple(r) for r in h] == [tuple(r) for r in s]


def test_substring_excise_keeps_canonical(tok_df):
    got = {r["doc_id"]: r for r in
           dedup.substring_excise(tok_df, k=8).collect()}
    # 'a' is canonical (lowest doc_id) for every repeated window → intact
    assert got["a"]["n_removed"] == 0
    assert got["a"]["tokens"] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    # 'b' loses its non-canonical [1..8] span, keeps the unique suffix
    assert got["b"]["tokens"] == [20, 21] and got["b"]["n_removed"] == 8
    # the exact twin is fully excised (its every window is non-canonical)
    assert got["d"]["tokens"] == [] and got["d"]["n_removed"] == 10
    assert got["c"]["n_removed"] == 0
    # sub-k exact twins are NOT excised (no k-token window repeats);
    # short-doc dedup is exact_dedup's job
    assert got["e"]["tokens"] == [70, 71] and got["e"]["n_removed"] == 0
    assert got["f"]["tokens"] == [70, 71] and got["f"]["n_removed"] == 0


def test_substring_excise_within_doc_repeat(spark):
    # a window repeated INSIDE one doc is excised too (cnt counts
    # occurrences, not distinct docs); the first occurrence is canonical
    toks = list(range(1, 9)) + [99, 98] + list(range(1, 9))
    df = spark.createDataFrame([("x", toks)],
                               "doc_id string, tokens array<int>")
    got = dedup.substring_excise(df, k=8).collect()[0]
    assert got["n_removed"] == 8
    assert got["tokens"] == list(range(1, 9)) + [99, 98]


def test_pack_sequences_matches_serial_prefix(spark):
    rows = [(f"d{i:03d}", (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    out = pack_sequences(df, seq_len=128, num_parts=8) \
        .orderBy("doc_id").collect()
    acc = 0
    for r, (_did, nt) in zip(out, sorted(rows)):
        assert r["start_offset"] == acc
        assert r["seq_id"] == acc // 128
        acc += nt


def test_pack_sequences_single_part_and_empty(spark):
    one = spark.createDataFrame([("a", 5)], "doc_id string, n_tok int")
    r = pack_sequences(one, seq_len=4).collect()[0]
    assert r["start_offset"] == 0 and r["seq_id"] == 0
    empty = spark.createDataFrame([], "doc_id string, n_tok int")
    assert pack_sequences(empty, seq_len=4).count() == 0


def test_stratified_sample_deterministic_and_rated(spark):
    docs = spark.createDataFrame(
        [(f"k{i}", "web" if i % 2 else "books") for i in range(4000)],
        "doc_id string, source string")
    rates = {"web": 0.25, "books": 0.75}
    kept1 = stratified_sample(docs, "source", rates, "doc_id")
    kept2 = stratified_sample(docs, "source", rates, "doc_id")
    ids1 = {r["doc_id"] for r in kept1.collect()}
    ids2 = {r["doc_id"] for r in kept2.collect()}
    assert ids1 == ids2                      # deterministic
    counts = {r["source"]: r["count"]
              for r in kept1.groupBy("source").count().collect()}
    assert abs(counts["web"] / 2000 - 0.25) < 0.05
    assert abs(counts["books"] / 2000 - 0.75) < 0.05
    # default rate 0 drops unknown strata entirely
    other = spark.createDataFrame([("z1", "misc")],
                                  "doc_id string, source string")
    assert stratified_sample(other, "source", rates, "doc_id").count() == 0


def test_gopher_quality_metrics(spark):
    text = "hello world\nhello world\n- item one\nwait...\nx y"
    df = spark.createDataFrame([("a", text)], "doc_id string, text string")
    r = with_gopher_quality(df).collect()[0]
    assert r["n_lines"] == 5
    assert r["frac_dup_lines"] == pytest.approx(2 / 5)
    assert r["frac_chars_dup_lines"] == pytest.approx(22 / len(text), abs=1e-6)
    assert r["frac_bullet_lines"] == pytest.approx(1 / 5)
    assert r["frac_ellipsis_lines"] == pytest.approx(1 / 5)
    assert r["mean_word_len"] > 0


def test_pii_redaction(spark):
    df = spark.createDataFrame(
        [("a", "mail bob.smith+1@ex-ample.co and +44 123 456 7890 ok"),
         ("b", "no pii here, just text with numbers 12345")],
        "doc_id string, text string")
    got = {r["doc_id"]: r["text"] for r in with_pii_redacted(df).collect()}
    assert got["a"] == "mail <EMAIL> and <PHONE> ok"
    assert got["b"] == "no pii here, just text with numbers 12345"


def test_materialize_sequences_matches_serial_stream(spark):
    from tbl_spark.pipelines.packing import materialize_sequences
    rows = [(f"d{i:02d}", list(range(i * 100, i * 100 + 7 + i)))
            for i in range(12)]
    rows.append(("empty", []))          # zero-token doc contributes nothing
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = materialize_sequences(df, seq_len=16, num_parts=3).collect()
    stream = []
    for _did, toks in sorted(rows):
        stream.extend(toks)
    assert sum(len(r["tokens"]) for r in out) == len(stream)
    for r in out:
        lo = r["seq_id"] * 16
        assert r["tokens"] == stream[lo:lo + 16], r["seq_id"]
    # every sequence except possibly the last is exactly seq_len
    sizes = [len(r["tokens"]) for r in sorted(out, key=lambda r: r["seq_id"])]
    assert all(s == 16 for s in sizes[:-1]) and 0 < sizes[-1] <= 16


def test_decontaminate_drops_overlapping_train_docs(spark):
    train = spark.createDataFrame(
        [("t1", [1, 2, 3, 4, 5, 6, 7, 8, 9]),     # shares [1..8] w/ eval
         ("t2", [20, 21, 22, 23, 24, 25, 26, 27]),  # clean
         ("t3", [90, 91]),                          # sub-k, never flagged
         ],
        "doc_id string, tokens array<int>")
    evals = spark.createDataFrame(
        [("e1", [0, 1, 2, 3, 4, 5, 6, 7, 8])],
        "doc_id string, tokens array<int>")
    kept = {r["doc_id"] for r in
            dedup.decontaminate(train, evals, k=8).collect()}
    assert kept == {"t2", "t3"}


def test_token_frequencies(spark):
    from tbl_spark.pipelines.textstats import token_frequencies
    df = spark.createDataFrame(
        [("a", [1, 1, 2]), ("b", [1, 3])],
        "doc_id string, tokens array<int>")
    got = {r["token"]: (r["occurrences"], r["doc_freq"])
           for r in token_frequencies(df).collect()}
    assert got == {1: (3, 2), 2: (1, 1), 3: (1, 1)}
    top1 = token_frequencies(df, top_n=1).collect()
    assert len(top1) == 1 and top1[0]["token"] == 1
