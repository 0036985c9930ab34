"""Output-path planning: map N inputs → N outputs across output modes.

Re-expresses the reference's only unit-tested module
(crates/tbl-core/src/filesystem/outputs.rs:211-309, tests 355-685): given
input files and an output spec (same dir / new dir / tree re-root / file
prefix / file postfix), produce the output path per input and fail fast on
collisions (outputs.rs:297-306)."""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class OutputPathSpec:
    """Mirror of the reference's OutputPathSpec (outputs.rs:7-75)."""
    output_dir: str | None = None      # re-root into this dir
    tree: bool = False                 # preserve relative subtree
    file_prefix: str | None = None     # prepend to file names
    file_postfix: str | None = None    # insert before .parquet
    inplace: bool = False              # overwrite inputs (1:1)


def _rename(name: str, spec: OutputPathSpec) -> str:
    stem, ext = os.path.splitext(name)
    if spec.file_prefix:
        stem = spec.file_prefix + stem
    if spec.file_postfix:
        stem = stem + spec.file_postfix
    return stem + ext


def get_output_paths(inputs: list[str],
                     spec: OutputPathSpec) -> list[tuple[str, str]]:
    """[(input, output)] sorted by input; raises on output collisions."""
    if spec.inplace and (spec.output_dir or spec.file_prefix
                         or spec.file_postfix):
        raise ValueError("inplace combines with no other output option")
    inputs = sorted(inputs)
    if spec.tree and spec.output_dir:
        common = os.path.commonpath([os.path.dirname(os.path.abspath(p))
                                     for p in inputs]) if inputs else ""
    pairs: list[tuple[str, str]] = []
    for p in inputs:
        name = _rename(os.path.basename(p), spec)
        if spec.inplace:
            out = p
        elif spec.output_dir and spec.tree:
            rel = os.path.relpath(os.path.dirname(os.path.abspath(p)),
                                  common)
            rel = "" if rel == "." else rel
            out = os.path.join(spec.output_dir, rel, name)
        elif spec.output_dir:
            out = os.path.join(spec.output_dir, name)
        else:
            out = os.path.join(os.path.dirname(p), name)
        pairs.append((p, out))
    seen: dict[str, str] = {}
    for src, dst in pairs:
        if dst in seen:
            raise ValueError(
                f"output collision: {seen[dst]!r} and {src!r} both map to "
                f"{dst!r}")
        seen[dst] = src
    return pairs
