"""Output-path planning matrix — ports the spirit of the reference's only
test module (crates/tbl-core/src/filesystem/outputs.rs:355-685): the
input × tree × output-dir × prefix/postfix matrix on a synthetic tree."""

import os

import pytest

from tbl_spark.outputs import OutputPathSpec, get_output_paths


@pytest.fixture
def tree(tmp_path):
    """Synthetic file tree (outputs.rs:361-386 analog)."""
    paths = [
        "a.parquet", "b.parquet",
        "sub1/c.parquet", "sub1/deep/d.parquet", "sub2/e.parquet",
    ]
    out = []
    for p in paths:
        full = tmp_path / p
        full.parent.mkdir(parents=True, exist_ok=True)
        full.write_bytes(b"")
        out.append(str(full))
    return str(tmp_path), sorted(out)


def test_same_dir_postfix(tree):
    root, files = tree
    pairs = get_output_paths(files, OutputPathSpec(file_postfix="_out"))
    assert all(os.path.dirname(s) == os.path.dirname(d) for s, d in pairs)
    assert all(d.endswith("_out.parquet") for _, d in pairs)


def test_new_dir_flat(tree):
    root, files = tree
    with pytest.raises(ValueError, match="collision"):
        # flat re-root of a tree with no rename → distinct subdirs still
        # distinct names here, so force a collision with equal names
        get_output_paths(
            [files[0], os.path.join(root, "sub1", "a.parquet")],
            OutputPathSpec(output_dir="/tmp/outx"))


def test_new_dir_tree_preserves_structure(tree):
    root, files = tree
    pairs = get_output_paths(files, OutputPathSpec(
        output_dir="/tmp/outy", tree=True))
    rel_in = [os.path.relpath(s, root) for s, _ in pairs]
    rel_out = [os.path.relpath(d, "/tmp/outy") for _, d in pairs]
    assert rel_in == rel_out


def test_prefix_and_postfix(tree):
    _, files = tree
    pairs = get_output_paths(files[:1], OutputPathSpec(
        file_prefix="pre_", file_postfix="_post"))
    assert os.path.basename(pairs[0][1]) == "pre_a_post.parquet"


def test_inplace_identity_and_exclusivity(tree):
    _, files = tree
    pairs = get_output_paths(files, OutputPathSpec(inplace=True))
    assert all(s == d for s, d in pairs)
    with pytest.raises(ValueError, match="inplace"):
        get_output_paths(files, OutputPathSpec(inplace=True,
                                               file_prefix="x"))


def test_sorted_deterministic(tree):
    _, files = tree
    a = get_output_paths(list(reversed(files)), OutputPathSpec(
        file_postfix="_z"))
    b = get_output_paths(files, OutputPathSpec(file_postfix="_z"))
    assert a == b


def test_transform_files_per_file_and_atomic(spark, tmp_path):
    """Each input file transformed independently to ONE output file."""
    import pyarrow.parquet as pq
    from tbl_spark.datagen import write_token_table
    from tbl_spark.filejobs import merge_files, transform_files
    from tbl_spark.transforms import TransformSpec

    src = str(tmp_path / "src")
    write_token_table(src, 1000, n_parts=3)
    inputs = sorted(os.path.join(src, f) for f in os.listdir(src))
    pairs = transform_files(
        spark, inputs,
        TransformSpec(drop=["tokens"], filters=["n_tok>=100"]),
        OutputPathSpec(output_dir=str(tmp_path / "out")))
    assert len(pairs) == 3
    for s, d in pairs:
        assert os.path.isfile(d)
        t = pq.read_table(d)
        assert t.column_names == ["doc_id", "n_tok", "source"]
        assert all(v.as_py() >= 100 for v in t.column("n_tok"))
        assert len(t) < pq.read_metadata(s).num_rows  # filtered

    # N:1 merge with schema check
    merged = str(tmp_path / "merged.parquet")
    n = merge_files(spark, [d for _, d in pairs], merged)
    assert n == sum(len(pq.read_table(d)) for _, d in pairs)
    assert pq.read_metadata(merged).num_rows == n

    # schema mismatch fails fast
    import pytest as _pytest
    with _pytest.raises(ValueError, match="schema mismatch"):
        merge_files(spark, [inputs[0], merged], str(tmp_path / "x.parquet"))
