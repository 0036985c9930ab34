"""PNG 16-bit / sub-byte / Adam7-interlace decode tests.

A byte-level test-side filterer (independent of the decoder's
unfilter) builds scanlines at any depth, and an Adam7 splitter lays
out the seven passes per RFC 2083 §2.6 — so the full-IHDR decode path
is checked value-exact against planted sample arrays.
"""

import struct
import zlib

import numpy as np
import pytest

from tbl_spark.pipelines.multimodal import _decode_png, decode_image

_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def _filter_rows(rows: np.ndarray, bpp: int, filters: list[int]) -> bytes:
    """(h, stride) raw scanline bytes → filtered PNG scanlines, filter
    types cycled from `filters`. Plain-python per spec formulas."""
    h, stride = rows.shape
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = rows[y].astype(np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc
                                                        else c)
            enc[i] = (int(line[i]) - pred) % 256
        out += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = line
    return bytes(out)


def _pack_samples(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, ch) integer samples → (h, stride) scanline bytes at the
    given depth (big-endian 16-bit, MSB-first bit packing below 8)."""
    h, w, ch = samples.shape
    if depth == 8:
        return samples.astype(np.uint8).reshape(h, w * ch)
    if depth == 16:
        v = samples.astype(np.uint16)
        out = np.empty((h, w, ch, 2), np.uint8)
        out[..., 0] = v >> 8
        out[..., 1] = v & 0xFF
        return out.reshape(h, w * ch * 2)
    assert ch == 1
    bits = ((samples.reshape(h, w, 1).astype(np.uint8)
             >> np.arange(depth - 1, -1, -1)) & 1)
    flat = bits.reshape(h, w * depth)
    stride = (w * depth + 7) // 8
    padded = np.zeros((h, stride * 8), np.uint8)
    padded[:, :w * depth] = flat
    return np.packbits(padded, axis=1)


def _encode_png2(samples: np.ndarray, depth: int, ctype: int,
                 filters: list[int], palette: np.ndarray | None = None,
                 interlace: int = 0) -> bytes:
    h, w, ch = samples.shape
    bpp = max(1, (ch * depth) // 8)
    if interlace == 0:
        body = _filter_rows(_pack_samples(samples, depth), bpp, filters)
    else:
        body = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            body += _filter_rows(_pack_samples(sub, depth), bpp, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(body)) \
        + _chunk(b"IEND", b"")


def _scale16(v):
    return ((v.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)


def test_png_16bit_rgb_and_gray():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 65536, (6, 5, 3))
    got = _decode_png(_encode_png2(rgb, 16, 2, [0, 1, 2, 3, 4]))
    assert np.array_equal(got, _scale16(rgb))
    gray = rng.integers(0, 65536, (4, 7, 1))
    got = _decode_png(_encode_png2(gray, 16, 0, [4, 3]))
    assert np.array_equal(got, np.repeat(_scale16(gray), 3, axis=2))
    rgba = rng.integers(0, 65536, (3, 3, 4))
    got = _decode_png(_encode_png2(rgba, 16, 6, [2]))
    assert np.array_equal(got, _scale16(rgba)[:, :, :3])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray(depth):
    rng = np.random.default_rng(depth)
    hi = 1 << depth
    g = rng.integers(0, hi, (5, 11, 1))      # odd width: padded stride
    got = _decode_png(_encode_png2(g, depth, 0, [0, 1, 2]))
    want = (g * (255 // (hi - 1))).astype(np.uint8)
    assert np.array_equal(got, np.repeat(want, 3, axis=2))


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_png_subbyte_palette(depth):
    rng = np.random.default_rng(depth + 10)
    n = 1 << depth
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (6, 9, 1))
    got = _decode_png(_encode_png2(idx, depth, 3, [0, 2], palette=pal))
    assert np.array_equal(got, pal[idx[:, :, 0]])


@pytest.mark.parametrize("shape", [(16, 16), (9, 13), (7, 5), (1, 1),
                                   (2, 3), (8, 1)])
def test_png_adam7_rgb_exact(shape):
    """Every pass geometry: shapes that leave some passes empty, full
    8x8 tiles, single pixels."""
    h, w = shape
    rng = np.random.default_rng(h * 31 + w)
    rgb = rng.integers(0, 256, (h, w, 3))
    got = _decode_png(_encode_png2(rgb, 8, 2, [0, 1, 2, 3, 4],
                                   interlace=1))
    assert np.array_equal(got, rgb.astype(np.uint8))


def test_png_adam7_16bit_palette_and_gray():
    rng = np.random.default_rng(77)
    rgb16 = rng.integers(0, 65536, (10, 12, 3))
    got = _decode_png(_encode_png2(rgb16, 16, 2, [3, 4], interlace=1))
    assert np.array_equal(got, _scale16(rgb16))
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 9, 1))
    got = _decode_png(_encode_png2(idx, 4, 3, [1], palette=pal,
                                   interlace=1))
    assert np.array_equal(got, pal[idx[:, :, 0]])
    g1 = rng.integers(0, 2, (5, 17, 1))
    got = _decode_png(_encode_png2(g1, 1, 0, [0, 2], interlace=1))
    assert np.array_equal(got, np.repeat((g1 * 255).astype(np.uint8),
                                         3, axis=2))


def test_png_adam7_truncated_pass_is_corrupt():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (16, 16, 3))
    good = _encode_png2(rgb, 8, 2, [0], interlace=1)
    # strip the IEND and re-wrap a shortened IDAT: last pass missing
    raw = zlib.compress(
        zlib.decompress(good[good.find(b"IDAT") + 4:
                             good.find(b"IEND") - 8])[:-200])
    head = good[:good.find(b"IDAT") - 4]
    bad = head + _chunk(b"IDAT", raw) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT shorter"):
        _decode_png(bad)


def test_png_decode_image_integration_16bit():
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 65536, (8, 8, 3))
    got = decode_image(_encode_png2(rgb, 16, 2, [1], interlace=1), 4, 4)
    assert got.shape == (4, 4, 3)
