"""ANSI terminal styling for CLI stdout (reference parity:
crates/tbl-cli/src/styles.rs:1-94 — title/comment/constant font roles over
truecolor). Styling is applied only when stdout is a real terminal and
NO_COLOR is unset; TBL_SPARK_COLOR=1/0 forces it either way. Piped or
captured output is always plain text, so machine consumers and tests see
byte-identical tables."""

from __future__ import annotations

import os
import sys

_TITLE = "\x1b[1;38;2;206;147;249m"    # bold purple (styles.rs title)
_COMMENT = "\x1b[38;2;98;114;164m"     # blue-grey (styles.rs comment)
_CONSTANT = "\x1b[38;2;185;242;159m"   # pale green (styles.rs constant)
_RESET = "\x1b[0m"


def enabled() -> bool:
    forced = os.environ.get("TBL_SPARK_COLOR")
    if forced is not None:
        return forced not in ("", "0", "false", "no")
    if os.environ.get("NO_COLOR"):
        return False
    try:
        return sys.stdout.isatty()
    except (AttributeError, ValueError):
        return False


def _wrap(code: str, s: str) -> str:
    return f"{code}{s}{_RESET}" if enabled() else s


def title(s: str) -> str:
    """Headers: table column names, schema group lines."""
    return _wrap(_TITLE, s)


def comment(s: str) -> str:
    """Secondary text: grid rules, omission hints, dry-run notes."""
    return _wrap(_COMMENT, s)


def constant(s: str) -> str:
    """Value-bearing summary lines (row/byte totals)."""
    return _wrap(_CONSTANT, s)
