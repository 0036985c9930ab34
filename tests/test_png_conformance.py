"""PNG conformance tests against libpng-generated fixtures.

tests/data/pngconf/ was written by the canonical C implementation
(tools/make_png_fixtures.py): each case<N>.png comes from libpng with
PNG_ALL_FILTERS enabled — so real encoder heuristics choose
Sub/Up/Average/Paeth per row — across the full IHDR matrix (gray
1/2/4/8/16, RGB 8/16, palette 1/2/4/8, gray+alpha 8/16, RGBA 8/16,
Adam7 and non-interlaced, odd sizes, one 257x129 image for filter
variety). case<N>.rgb is libpng's own read-back through the
palette→RGB / expand-gray / scale-16 / gray→RGB / strip-alpha chain,
whose conventions are bit-identical to this repo's documented channel
contract (the scale-16 rounding was verified equal exhaustively over
all 65536 values).

PNG is lossless, so every comparison is EXACT — any single-pixel
difference fails.
"""

import pathlib
import struct

import numpy as np
import pytest

from tbl_spark.pipelines.multimodal import decode_image

DATA = pathlib.Path(__file__).parent / "data" / "pngconf"
CASES = sorted(int(p.stem[4:]) for p in DATA.glob("case*.png"))


def _read_rgb(path):
    b = pathlib.Path(path).read_bytes()
    w, h = struct.unpack_from("<2H", b, 0)
    return np.frombuffer(b, np.uint8, w * h * 3, 4).reshape(h, w, 3)


def test_matrix_is_complete():
    # all five color types, both interlace modes, depths 1..16, and at
    # least one image big enough for real filter-heuristic variety
    assert len(CASES) == 20


@pytest.mark.parametrize("case", CASES)
def test_png_bit_exact_vs_libpng(case):
    payload = (DATA / f"case{case}.png").read_bytes()
    px = decode_image(payload, 0, 0)
    ref = _read_rgb(DATA / f"case{case}.rgb")
    assert px.shape == ref.shape
    assert np.array_equal(px, ref)


def test_fixtures_use_varied_filters():
    # the conformance claim rests on libpng's heuristics actually
    # exercising the predictive filters: check the big RGB image's
    # filter bytes cover Sub/Up/Average/Paeth
    import zlib
    payload = (DATA / "case18.png").read_bytes()
    pos = 8
    idat = b""
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = 257 * 3 + 1
    filters = {raw[y * stride] for y in range(129)}
    assert {1, 2, 3, 4} & filters == {1, 2, 3, 4}
