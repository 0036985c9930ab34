"""Vectorized k-bit integer packing (numpy, no per-row Python).

The primitive under FOR / dict-code / RLE-length encoding. Values must be
non-negative (callers subtract a frame-of-reference first). Width 0 is legal
and encodes a stream of zeros in zero bytes.

Implementation: values are first narrowed to the smallest little-endian
unsigned dtype that holds `width` bits, then np.unpackbits/packbits shuffle
bits at byte granularity — the intermediate is n×ceil(width/8) bytes, not
an n×width u64 matrix, which keeps chunk-sized packs allocation-light.
"""

from __future__ import annotations

import numpy as np

_STORE_DTYPE = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def bits_needed(max_value: int) -> int:
    """Minimal width (bits) to represent max_value (>=0)."""
    if max_value < 0:
        raise ValueError("bit-packing requires non-negative values")
    return int(max_value).bit_length()


def _storage_bytes(width: int) -> int:
    need = (width + 7) // 8
    for size in (1, 2, 4, 8):
        if need <= size:
            return size
    raise ValueError(f"width {width} > 64")


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into a little-endian bitstream of `width`
    bits per value."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    size = _storage_bytes(width)
    v = np.ascontiguousarray(values, dtype=np.uint64).astype(
        _STORE_DTYPE[size], copy=False)
    byte_rows = v.view(np.uint8).reshape(n, size)
    bits = np.unpackbits(byte_rows, axis=1, bitorder="little")[:, :width]
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack(); returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    size = _storage_bytes(width)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width, bitorder="little")
    bits = bits.reshape(n, width)
    if width < 8 * size:
        bits = np.concatenate(
            [bits, np.zeros((n, 8 * size - width), dtype=np.uint8)], axis=1)
    packed = np.packbits(bits, axis=1, bitorder="little")
    return packed.view(_STORE_DTYPE[size]).reshape(n).astype(np.uint64)
