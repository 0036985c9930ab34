"""BMP decode tests: a test-side DIB writer builds every supported
variant (core/info headers, palette depths, 16/24/32-bit, bitfields,
RLE8/RLE4, top-down) from planted arrays for value-exact checks."""

import struct

import numpy as np
import pytest

from tbl_spark.pipelines.multimodal import _decode_bmp, decode_image


def _bmp(dib: bytes, pixel_data: bytes, extra: bytes = b"") -> bytes:
    off = 14 + len(dib) + len(extra)
    return (b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0,
                                off) + dib + extra + pixel_data)


def _info_header(w, h, bpp, comp=0, colors=0):
    return struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp, 0,
                       2835, 2835, colors, 0)


def _pad_rows(rows: np.ndarray) -> bytes:
    h, n = rows.shape
    stride = (n + 3) & ~3
    out = np.zeros((h, stride), np.uint8)
    out[:, :n] = rows
    return out.tobytes()


def test_bmp_24bit_bottomup_and_topdown():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    bgr = px[:, :, ::-1]
    data = _pad_rows(bgr[::-1].reshape(5, 9))       # bottom-up
    got = _decode_bmp(_bmp(_info_header(3, 5, 24), data))
    assert np.array_equal(got, px)
    data_td = _pad_rows(bgr.reshape(5, 9))          # top-down: h < 0
    got = _decode_bmp(_bmp(_info_header(3, -5, 24), data_td))
    assert np.array_equal(got, px)
    # decode_image routes BM magic
    assert np.array_equal(
        decode_image(_bmp(_info_header(3, 5, 24), data), 0, 0), px)


def test_bmp_32bit_and_16bit_555_565():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    rows = np.zeros((3, 16), np.uint8)
    quad = np.concatenate([px[:, :, ::-1],
                           np.zeros((3, 4, 1), np.uint8)], axis=2)
    rows[:, :] = quad.reshape(3, 16)
    got = _decode_bmp(_bmp(_info_header(4, -3, 32), rows.tobytes()))
    assert np.array_equal(got, px)
    # 16-bit 555 default masks: values quantized to 5 bits per channel
    r5 = (px >> 3).astype(np.uint16)
    v = (r5[:, :, 0] << 10) | (r5[:, :, 1] << 5) | r5[:, :, 2]
    got = _decode_bmp(_bmp(_info_header(4, -3, 16),
                           _pad_rows(v.astype("<u2").view(np.uint8)
                                     .reshape(3, 8))))
    want = (r5 * 255 // 31).astype(np.uint8)
    assert np.array_equal(got, want)
    # 565 via BI_BITFIELDS masks after the header
    g6 = (px[:, :, 1] >> 2).astype(np.uint16)
    v = (r5[:, :, 0].astype(np.uint16) << 11) | (g6 << 5) | r5[:, :, 2]
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    got = _decode_bmp(_bmp(_info_header(4, -3, 16, comp=3),
                           _pad_rows(v.astype("<u2").view(np.uint8)
                                     .reshape(3, 8)), extra=masks))
    want = np.stack([r5[:, :, 0] * 255 // 31, g6 * 255 // 63,
                     r5[:, :, 2] * 255 // 31], axis=2).astype(np.uint8)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_bmp_palette_depths(bpp):
    rng = np.random.default_rng(bpp)
    n = 1 << bpp
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    quads = np.concatenate([pal[:, ::-1],
                            np.zeros((n, 1), np.uint8)], axis=1)
    idx = rng.integers(0, n, (4, 11)).astype(np.uint8)
    if bpp == 8:
        rows = idx
    else:
        bits = ((idx[:, :, None] >> np.arange(bpp - 1, -1, -1)) & 1)
        flat = bits.reshape(4, 11 * bpp)
        padded = np.zeros((4, ((11 * bpp + 7) // 8) * 8), np.uint8)
        padded[:, :11 * bpp] = flat
        rows = np.packbits(padded, axis=1)
    got = _decode_bmp(_bmp(_info_header(11, -4, bpp),
                           _pad_rows(rows), extra=quads.tobytes()))
    assert np.array_equal(got, pal[idx])


def test_bmp_core_header():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (3, 5)).astype(np.uint8)
    dib = struct.pack("<IHHHH", 12, 5, 3, 1, 8)
    got = _decode_bmp(_bmp(dib, _pad_rows(idx[::-1]),
                           extra=pal[:, ::-1].tobytes()))
    assert np.array_equal(got, pal[idx])


def test_bmp_rle8_and_rle4():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [7, 7, 7]], np.uint8)
    quads = np.concatenate([pal[:, ::-1],
                            np.zeros((4, 1), np.uint8)], axis=1)
    # RLE8, 6x2: row0 = run(3 of 1) + absolute(3: [1, 2, 3], padded to
    # a word), EOL; row1 = run(6 of 0), EOL; EOB. (Absolute mode needs
    # count >= 3 — 0/1/2 after the escape are EOL/EOB/delta.)
    rle = (bytes([3, 1]) + bytes([0, 3, 1, 2, 3, 0]) + bytes([0, 0])
           + bytes([6, 0]) + bytes([0, 0]) + bytes([0, 1]))
    got = _decode_bmp(_bmp(_info_header(6, -2, 8, comp=1, colors=4),
                           rle, extra=quads.tobytes()))
    want_idx = np.array([[1, 1, 1, 1, 2, 3], [0, 0, 0, 0, 0, 0]])
    assert np.array_equal(got, pal[want_idx])
    # RLE4, 5x2 bottom-up: run(3, 0x12 -> 1,2,1), run(1,3), run(1,0),
    # EOL, run(5, 0x30 -> 3,0,3,0,3), EOL, EOB
    rle4 = (bytes([3, 0x12]) + bytes([1, 0x30, 1, 0x00]) + bytes([0, 0])
            + bytes([5, 0x30]) + bytes([0, 0]) + bytes([0, 1]))
    got = _decode_bmp(_bmp(_info_header(5, 2, 4, comp=2, colors=4),
                           rle4, extra=quads.tobytes()))
    want_idx = np.array([[3, 0, 3, 0, 3], [1, 2, 1, 3, 0]])  # bottom-up
    assert np.array_equal(got, pal[want_idx])


def test_bmp_gates():
    assert _decode_bmp(b"BM-too-short") is None
    assert _decode_bmp(b"GIF89a") is None
    with pytest.raises(ValueError, match="truncated"):
        _decode_bmp(_bmp(_info_header(100, 100, 24), b"\x00" * 10))
    with pytest.raises(NotImplementedError, match="JPEG/PNG"):
        _decode_bmp(_bmp(_info_header(2, 2, 24, comp=4), b"\x00" * 16))
    with pytest.raises(ValueError, match="palette index"):
        pal1 = bytes(8)                       # 2 quad entries
        idx = np.full((2, 2), 7, np.uint8)
        _decode_bmp(_bmp(_info_header(2, -2, 8, colors=2),
                         _pad_rows(idx), extra=pal1))
