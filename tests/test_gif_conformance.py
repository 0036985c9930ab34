"""GIF conformance tests against giflib-generated fixtures.

tests/data/gifconf/ was written by the canonical C implementation's
real LZW encoder (tools/make_gif_fixtures.py): 256/16/4-color
palettes (so minimum LZW code widths 8/4/2 are all exercised),
sequential and interlaced row order, odd sizes, and a 2-frame
animation with graphic-control extensions. Each case<N>.ref carries
the exact indices and palette the harness encoded, so the expected
RGB needs no decoder at all. GIF is lossless — every comparison is
EXACT.
"""

import pathlib
import struct

import numpy as np
import pytest

from tbl_spark.pipelines._video import decode_video_frames, probe_video
from tbl_spark.pipelines.multimodal import decode_image

DATA = pathlib.Path(__file__).parent / "data" / "gifconf"
CASES = sorted(int(p.stem[4:]) for p in DATA.glob("case*.gif"))


def _read_ref(path):
    b = pathlib.Path(path).read_bytes()
    w, h, nf, pn = struct.unpack_from("<4H", b, 0)
    off = 8
    pal = np.frombuffer(b, np.uint8, pn * 3, off).reshape(pn, 3)
    off += pn * 3
    idx = np.frombuffer(b, np.uint8, w * h * nf, off).reshape(nf, h, w)
    return pal, idx


def test_matrix_is_complete():
    assert len(CASES) == 5


@pytest.mark.parametrize("case", CASES)
def test_gif_bit_exact_vs_giflib(case):
    payload = (DATA / f"case{case}.gif").read_bytes()
    pal, idx = _read_ref(DATA / f"case{case}.ref")
    expected = pal[idx]                     # (n_frames, H, W, 3)
    if expected.shape[0] == 1:
        px = decode_image(payload, 0, 0)
        assert np.array_equal(px, expected[0])
    else:
        meta = probe_video(payload)
        assert meta["format"] == "gif"
        assert meta["n_frames"] == expected.shape[0]
        idxs, frames = decode_video_frames(payload)
        assert len(frames) == expected.shape[0]
        for f, e in zip(frames, expected):
            assert np.array_equal(f, e)
