"""Inspect (ls/schema/stats) + CLI smoke tests — metadata-only reads,
mirroring ls.rs / schema.rs behavior."""

import json

import pyarrow.parquet as pq

from tbl_spark.inspect import discover, ls, schema_summary, store_stats


def test_discover_sorted(sf_dir):
    files = discover([sf_dir])
    assert files == sorted(files)
    assert all(f.endswith(".parquet") for f in files)
    assert len(files) == 10


def test_ls_counts_match_footers(sf_dir):
    info = ls([f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"])
    assert info["files"] == 2
    expect = sum(pq.read_metadata(p).num_rows for p in info["paths"])
    assert info["rows"] == expect == 7500


def test_schema_summary_groups_and_percent(sf_dir):
    groups = schema_summary([sf_dir])
    assert len(groups) == 10  # every table has a distinct schema
    li = next(g for g in groups
              if any(n == "l_orderkey" for n, _ in g["schema"]))
    pct = sum(c["disk_pct"] for c in li["columns"].values())
    assert abs(pct - 100.0) < 1e-6
    assert all(c["disk_bytes"] > 0 for c in li["columns"].values())


def test_store_stats_rollup(spark, tmp_path):
    from tbl_spark.datagen import generate_df
    from tbl_spark.store import ChunkStore, encode_to_store
    store = ChunkStore(str(tmp_path / "s"))
    encode_to_store(generate_df(spark, 2000, 2), store, 4)
    stats = store_stats(store)
    assert stats["parts"] == 4 and stats["rows"] == 2000
    assert set(stats["columns"]) == {"doc_id", "tokens", "n_tok", "source"}
    assert stats["tokens_per_cpu_sec"] > 0
    assert 0 < stats["bytes_per_token"] < 4.0  # < int32 raw
    assert abs(sum(c["disk_pct"] for c in stats["columns"].values())
               - 100.0) < 1e-6


def test_cli_ls_schema_stats(sf_dir, tmp_path, capsys):
    from tbl_spark.cli import main
    assert main(["ls", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "files" in out and "rows" in out
    assert main(["schema", f"{sf_dir}/lineitem.parquet"]) == 0
    out = capsys.readouterr().out
    assert "l_orderkey" in out and "%" in out


def test_cli_encode_stats_decode(spark, sf_dir, tmp_path, capsys):
    from tbl_spark.cli import main
    from tbl_spark.datagen import write_token_table
    src = str(tmp_path / "tok")
    write_token_table(src, 1000, n_parts=2)
    store = str(tmp_path / "store")
    assert main(["encode", src, "--store", store, "--num-parts", "4"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["encoded_parts"] == 4 and summary["n_rows"] == 1000
    assert main(["stats", "--store", store]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["rows"] == 1000


def test_cli_verify_and_history(spark, tmp_path, capsys):
    from tbl_spark.cli import main
    from tbl_spark.datagen import write_token_table
    src = str(tmp_path / "tok")
    write_token_table(src, 800, n_parts=2)
    store = str(tmp_path / "store")
    assert main(["encode", src, "--store", store, "--num-parts", "4"]) == 0
    capsys.readouterr()
    # verify: decoded store must bit-equal the source
    assert main(["verify", src, "--store", store, "--key", "doc_id"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"status": "OK", "source_rows": 800, "equal_rows": 800}
    # snapshot history: one line per encode run
    assert main(["stats", "--store", store, "--history"]) == 0
    snaps = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(snaps) == 1 and snaps[0]["encoded_parts"] == 4
    # second run (all committed) appends a no-op snapshot
    assert main(["encode", src, "--store", store, "--num-parts", "4"]) == 0
    capsys.readouterr()
    from tbl_spark.store import ChunkStore
    snaps = ChunkStore(store).snapshots()
    assert len(snaps) == 2 and snaps[1]["encoded_parts"] == 0
    assert snaps[1]["skipped_parts"] == 4
