"""Self-describing blob format shared by all codecs.

Layout:
    header (16 bytes):
        magic   4s   = b"TS01"
        codec   u8   (Codec enum)
        dtype   u8   (DType enum — decoded logical type)
        flags   u8   (bit0: validity bitmap present, bit1: body zstd-wrapped)
        pad     u8
        n       u64  (number of logical values)
    body:
        if flags&ZSTD: u64 uncompressed_body_len + zstd(raw_body)
        raw_body = [validity bitmap (ceil(n/8) bytes, LSB-first) if flags&NULLS]
                   + codec payload

Composite codecs nest full blobs via length-prefixed sub-blob framing
(u32 length + blob), so the cost model can pick inner codecs recursively.

This is our analog of the storage metadata the reference reads from parquet
footers (crates/tbl-core/src/parquet/parquet_summary.rs:58-87) — but ours is
written by our own encoder rather than delegated to parquet internals.
"""

from __future__ import annotations

import enum
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"TS01"
HEADER = struct.Struct("<4sBBBBQ")
HEADER_LEN = HEADER.size  # 16

FLAG_NULLS = 1
FLAG_ZSTD = 2

_ZSTD = pa.Codec("zstd", compression_level=3)


class Codec(enum.IntEnum):
    CONST = 0
    RAW = 1
    FOR_BITPACK = 2
    DELTA_FOR = 3
    RLE = 4
    DICT = 5
    STR_RAW = 6
    STR_DICT = 7
    FSST = 8
    LIST = 9
    BYTE_PLANES = 10
    RANS = 11
    DEC128 = 12  # decimal128 as two auto-encoded uint64 word planes
    DELTA_NESTED = 13  # first value + recursively auto-encoded deltas
    STR_TEMPLATE = 14  # '<prefix><digits>' ids: prefix dict + int + width
    RANS_SHARED = 15  # rANS against a shared table stored once per run


class DType(enum.IntEnum):
    I8 = 1
    I16 = 2
    I32 = 3
    I64 = 4
    U8 = 5
    U16 = 6
    U32 = 7
    U64 = 8
    F32 = 9
    F64 = 10
    BOOL = 11
    STR = 12
    BINARY = 13
    LIST = 14  # generic list; child dtype self-described by nested blob
    DEC128 = 15  # decimal128(precision, scale) — stored in the payload


NUMPY_OF_DTYPE = {
    DType.I8: np.dtype(np.int8),
    DType.I16: np.dtype(np.int16),
    DType.I32: np.dtype(np.int32),
    DType.I64: np.dtype(np.int64),
    DType.U8: np.dtype(np.uint8),
    DType.U16: np.dtype(np.uint16),
    DType.U32: np.dtype(np.uint32),
    DType.U64: np.dtype(np.uint64),
    DType.F32: np.dtype(np.float32),
    DType.F64: np.dtype(np.float64),
    DType.BOOL: np.dtype(np.bool_),
}

DTYPE_OF_NUMPY = {v: k for k, v in NUMPY_OF_DTYPE.items()}


def pack_header(codec: Codec, dtype: DType, flags: int, n: int) -> bytes:
    return HEADER.pack(MAGIC, int(codec), int(dtype), flags, 0, n)


def unpack_header(blob: bytes) -> tuple[Codec, DType, int, int]:
    magic, codec, dtype, flags, _pad, n = HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError(f"bad blob magic {magic!r}")
    return Codec(codec), DType(dtype), flags, n


def assemble(codec: Codec, dtype: DType, n: int, payload: bytes,
             valid: np.ndarray | None = None, try_zstd: bool = False) -> bytes:
    """Build a full blob; optionally prepend a validity bitmap and wrap the
    body in zstd when that actually shrinks it."""
    flags = 0
    body = payload
    if valid is not None:
        flags |= FLAG_NULLS
        bitmap = np.packbits(np.ascontiguousarray(valid, dtype=np.uint8),
                             bitorder="little").tobytes()
        body = bitmap + payload
    if try_zstd and len(body) > 64:
        comp = _ZSTD.compress(body).to_pybytes()
        if len(comp) + 8 < len(body):
            flags |= FLAG_ZSTD
            body = struct.pack("<Q", len(body)) + comp
    return pack_header(codec, dtype, flags, n) + body


def disassemble(blob: bytes) -> tuple[Codec, DType, int, np.ndarray | None, bytes]:
    """Inverse of assemble(): returns (codec, dtype, n, valid_mask|None, payload)."""
    codec, dtype, flags, n = unpack_header(blob)
    body = blob[HEADER_LEN:]
    if flags & FLAG_ZSTD:
        (raw_len,) = struct.unpack_from("<Q", body, 0)
        body = _ZSTD.decompress(body[8:], raw_len).to_pybytes()
    valid = None
    if flags & FLAG_NULLS:
        nbytes = (n + 7) // 8
        valid = np.unpackbits(np.frombuffer(body[:nbytes], dtype=np.uint8),
                              count=n, bitorder="little").astype(bool)
        body = body[nbytes:]
    return codec, dtype, n, valid, bytes(body)


def frame(*blobs: bytes) -> bytes:
    """Length-prefix-concatenate sub-blobs (composite codec payloads)."""
    out = bytearray()
    for b in blobs:
        out += struct.pack("<I", len(b))
        out += b
    return bytes(out)


def unframe(payload: bytes, count: int) -> list[bytes]:
    out = []
    pos = 0
    for _ in range(count):
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        out.append(payload[pos:pos + ln])
        pos += ln
    return out
