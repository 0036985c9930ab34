"""Lightweight columnar codecs (dict, RLE, FSST-style, bit-pack,
frame-of-reference, delta) with sampling-based auto-selection."""

from .core import blob_codec, decode_array, encode_array
from .format import Codec, DType

__all__ = ["Codec", "DType", "blob_codec", "decode_array", "encode_array"]
