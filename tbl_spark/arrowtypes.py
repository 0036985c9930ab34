"""Spark DDL ↔ Arrow type mapping for the encode/decode jobs.

The codec layer only understands ints/floats/bools/str/binary/lists, so
temporal arrow arrays are bit-viewed to their physical integer type before
encoding and viewed back after decoding (bit-exact both ways)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SCALAR_DDL_TO_ARROW = {
    "tinyint": pa.int8(),
    "smallint": pa.int16(),
    "int": pa.int32(),
    "bigint": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "string": pa.string(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us"),
    "timestamp_ntz": pa.timestamp("us"),
}


def arrow_type_of_ddl(ddl: str) -> pa.DataType:
    ddl = ddl.strip().lower()
    if ddl.startswith("array<") and ddl.endswith(">"):
        return pa.list_(arrow_type_of_ddl(ddl[6:-1]))
    if ddl.startswith("decimal(") and ddl.endswith(")"):
        precision, scale = (int(x) for x in ddl[8:-1].split(","))
        return pa.decimal128(precision, scale)
    if ddl in _SCALAR_DDL_TO_ARROW:
        return _SCALAR_DDL_TO_ARROW[ddl]
    raise ValueError(f"unsupported type for codec pipeline: {ddl}")


def to_codec_input(arr: pa.Array) -> pa.Array | np.ndarray:
    """View temporal arrays as physical ints; pass others through."""
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_time64(t) \
            or pa.types.is_duration(t):
        return arr.view(pa.int64())
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return arr.view(pa.int32())
    if pa.types.is_date64(t):
        return arr.view(pa.int64())
    return arr


def from_codec_output(values, target: pa.DataType) -> pa.Array:
    """Convert decoded values (numpy or pa.Array, nulls filled) back to the
    target arrow type. Temporal targets are bit-views of the int payload."""
    if isinstance(values, np.ndarray):
        arr = pa.array(values)
    else:
        arr = values
    if arr.type == target:
        return arr
    if pa.types.is_timestamp(target) or pa.types.is_date32(target) \
            or pa.types.is_date64(target):
        return arr.view(target)
    if pa.types.is_list(target) or pa.types.is_large_list(target):
        return arr.cast(target)
    return arr.cast(target)
