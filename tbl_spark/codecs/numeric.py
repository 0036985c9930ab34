"""Integer codec payload kernels (pure numpy, fully vectorized).

All kernels operate on an integer "work array" (the core dispatcher views
floats as same-width unsigned ints and bools as uint8, so every codec here is
bit-exact for every logical type). Encoders return a payload ``bytes`` or
``None`` when the codec is inapplicable (range too wide, no gain); decoders
return a numpy array in the requested work dtype.

These replace the parquet-internal encodings the reference delegates to
polars/arrow (crates/tbl-cli/src/output.rs:157-173): dictionary, RLE,
bit-packing, frame-of-reference, delta.
"""

from __future__ import annotations

import struct

import numpy as np

from . import bitpack

_I64_MIN = -(1 << 63)
_I64_MAX = (1 << 63) - 1
_RANGE_CAP = (1 << 63) - 1  # max (vmax - vmin) we bit-pack


def _signed(work_dtype: np.dtype) -> bool:
    return work_dtype.kind == "i"


def _minmax(v: np.ndarray) -> tuple[int, int]:
    return int(v.min()), int(v.max())


# --- CONST ---------------------------------------------------------------

def const_encode(v: np.ndarray) -> bytes | None:
    if len(v) == 0 or v[0] != v[-1] or not (v == v[0]).all():
        return None
    return v[:1].tobytes()


def const_decode(payload: bytes, n: int, work_dtype: np.dtype) -> np.ndarray:
    val = np.frombuffer(payload, dtype=work_dtype, count=1)
    return np.broadcast_to(val, n).copy()


# --- RAW -----------------------------------------------------------------

def raw_encode(v: np.ndarray) -> bytes:
    return np.ascontiguousarray(v).tobytes()


def raw_decode(payload: bytes, n: int, work_dtype: np.dtype) -> np.ndarray:
    return np.frombuffer(payload, dtype=work_dtype, count=n).copy()


# --- FOR + bit-pack ------------------------------------------------------
# payload: ref (8 bytes, signedness of work dtype) + width u8 + packed bits

def _to_u64_deltas(v: np.ndarray, vmin: int) -> np.ndarray:
    if _signed(v.dtype):
        return (v.astype(np.int64) - np.int64(vmin)).astype(np.uint64)
    return v.astype(np.uint64) - np.uint64(vmin)


def for_encode(v: np.ndarray) -> bytes | None:
    if len(v) == 0:
        return None
    vmin, vmax = _minmax(v)
    if vmax - vmin > _RANGE_CAP:
        return None
    deltas = _to_u64_deltas(v, vmin)
    width = bitpack.bits_needed(vmax - vmin)
    ref = vmin.to_bytes(8, "little", signed=True) if vmin < 0 or _signed(v.dtype) \
        else vmin.to_bytes(8, "little", signed=False)
    return ref + struct.pack("<B", width) + bitpack.pack(deltas, width)


def for_decode(payload: bytes, n: int, work_dtype: np.dtype) -> np.ndarray:
    ref = int.from_bytes(payload[:8], "little", signed=_signed(work_dtype))
    (width,) = struct.unpack_from("<B", payload, 8)
    deltas = bitpack.unpack(payload[9:], n, width)
    if _signed(work_dtype):
        return (deltas.astype(np.int64) + np.int64(ref)).astype(work_dtype)
    return (deltas + np.uint64(ref)).astype(work_dtype)


# --- DELTA + FOR ---------------------------------------------------------
# payload: first value (8 bytes signed) + FOR payload over int64 diffs.
# Only attempted when values fit the int64 domain.

def delta_encode(v: np.ndarray) -> bytes | None:
    if len(v) == 0:
        return None
    vmin, vmax = _minmax(v)
    if vmin < _I64_MIN or vmax > _I64_MAX:
        return None
    v64 = v.astype(np.int64)
    diffs = np.diff(v64)
    if len(diffs):
        dmin, dmax = _minmax(diffs)
        if dmax - dmin > _RANGE_CAP:
            return None
    inner = for_encode(diffs) if len(diffs) else b""
    if inner is None:
        return None
    first = int(v64[0]).to_bytes(8, "little", signed=True)
    return first + inner


def delta_decode(payload: bytes, n: int, work_dtype: np.dtype) -> np.ndarray:
    first = int.from_bytes(payload[:8], "little", signed=True)
    if n == 0:
        return np.empty(0, dtype=work_dtype)
    diffs = for_decode(payload[8:], n - 1, np.dtype(np.int64)) if n > 1 \
        else np.empty(0, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n > 1:
        np.cumsum(diffs, out=out[1:])
        out[1:] += first
    return out.astype(work_dtype)


# --- RLE -----------------------------------------------------------------
# payload: u64 n_runs + framed(run_values_blob, run_lengths_blob)
# Recursive sub-encoding is injected by the core dispatcher to avoid a
# circular import.

def run_split(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_values, run_lengths) of v."""
    if len(v) == 0:
        return v[:0], np.empty(0, dtype=np.int64)
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, len(v))).astype(np.int64)
    return v[starts], lengths


def run_join(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    return np.repeat(values, lengths)


# --- BYTE PLANES ----------------------------------------------------------
# FOR-narrow the values, shred into per-byte planes (plane 0 = LSB), zstd
# each plane: low planes carry the entropy, high planes are near-constant,
# so the general compressor sees far more regular streams than interleaved
# bytes (the same shredding parquet does before its page compression).
# payload: ref i64 + u8 n_planes + frame(plane...), plane = u8 zstd? + data.

_NARROW = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _narrow_bytes(width_bits: int) -> int:
    need = max(1, (width_bits + 7) // 8)
    for s in (1, 2, 4, 8):
        if need <= s:
            return s
    return 8


def planes_encode(v: np.ndarray) -> bytes | None:
    from . import bitpack
    from .format import _ZSTD, frame
    if len(v) == 0:
        return None
    vmin, vmax = _minmax(v)
    if vmax - vmin > _RANGE_CAP:
        return None
    deltas = _to_u64_deltas(v, vmin)
    size = _narrow_bytes(bitpack.bits_needed(vmax - vmin))
    narrow = deltas.astype(_NARROW[size], copy=False)
    bytes_mat = narrow.view(np.uint8).reshape(-1, size)
    planes = []
    for i in range(size):
        raw = np.ascontiguousarray(bytes_mat[:, i]).tobytes()
        comp = _ZSTD.compress(raw).to_pybytes()
        planes.append(b"\x01" + comp if len(comp) < len(raw)
                      else b"\x00" + raw)
    ref = vmin.to_bytes(8, "little", signed=_signed(v.dtype))
    return ref + struct.pack("<B", size) + frame(*planes)


def planes_decode(payload: bytes, n: int, work_dtype: np.dtype) -> np.ndarray:
    from .format import _ZSTD, unframe
    ref = int.from_bytes(payload[:8], "little", signed=_signed(work_dtype))
    (size,) = struct.unpack_from("<B", payload, 8)
    raw_planes = unframe(payload[9:], size)
    mat = np.empty((n, size), dtype=np.uint8)
    for i, p in enumerate(raw_planes):
        data = _ZSTD.decompress(p[1:], n).to_pybytes() if p[:1] == b"\x01" \
            else p[1:]
        mat[:, i] = np.frombuffer(data, dtype=np.uint8, count=n)
    deltas = np.ascontiguousarray(mat).view(_NARROW[size]).reshape(n)
    if _signed(work_dtype):
        return (deltas.astype(np.int64) + np.int64(ref)).astype(work_dtype)
    return (deltas.astype(np.uint64) + np.uint64(ref)).astype(work_dtype)


# --- DICT ----------------------------------------------------------------

_BINCOUNT_RANGE_CAP = 1 << 22  # remap table ≤ 32 MB


def dict_split(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sorted uniques, int64 codes). Sorted uniques delta-encode well.

    Small-range integers (e.g. token ids over a ~50k vocab) use a
    bincount + remap-table pass — O(n) sequential with a cache-resident
    lookup table — instead of np.unique's full sort, which thrashes DRAM
    on chunk-sized arrays and caps multi-worker scaling."""
    if v.dtype.kind in "iu" and len(v):
        vmin, vmax = int(v.min()), int(v.max())
        rng = vmax - vmin
        if 0 <= rng <= _BINCOUNT_RANGE_CAP:
            shifted = v.astype(np.int64) - vmin
            counts = np.bincount(shifted, minlength=rng + 1)
            uniq_shifted = np.flatnonzero(counts)
            remap = np.zeros(rng + 1, dtype=np.int64)
            remap[uniq_shifted] = np.arange(len(uniq_shifted))
            codes = remap[shifted]
            uniques = (uniq_shifted + vmin).astype(v.dtype)
            return uniques, codes
    uniques, codes = np.unique(v, return_inverse=True)
    return uniques, codes.astype(np.int64)
