"""Vectorized k-bit integer packing (numpy, no per-row Python).

The primitive under FOR / dict-code / RLE-length encoding. Values must be
non-negative (callers subtract a frame-of-reference first). Width 0 is legal
and encodes a stream of zeros in zero bytes.
"""

from __future__ import annotations

import numpy as np


def bits_needed(max_value: int) -> int:
    """Minimal width (bits) to represent max_value (>=0)."""
    if max_value < 0:
        raise ValueError("bit-packing requires non-negative values")
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into a little-endian bitstream of `width`
    bits per value. Fully vectorized: expand to a (n, width) LSB-first bit
    matrix, then np.packbits."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack(); returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)
