"""Arithmetic-coded JPEG (SOF9/SOF10) conformance tests.

The fixtures under tests/data/arith/ were written by libjpeg — an
independent implementation of ITU-T T.81 — via tools/
make_arith_fixtures.py: each case<N>.jpg is an arithmetic-coded JPEG,
case<N>.coef holds libjpeg's own entropy-decoded quantized DCT
coefficients (the exact ground truth for the entropy layer), and
case<N>.rgb its full RGB decode (IDCT rounding differs between
implementations, so pixels are compared with a small tolerance while
coefficients must match bit-for-bit).

Covered: sequential (SOF9) gray/color, 4:2:0 and 4:2:2 subsampling,
restart intervals, full progressive (SOF10) including
successive-approximation refinement scans, and odd (non-MCU-multiple)
dimensions.
"""

import os
import pathlib
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from tbl_spark.pipelines import _jpeg as J  # noqa: E402
from tbl_spark.pipelines._jpeg import ZIGZAG, decode_jpeg  # noqa: E402

DATA = pathlib.Path(__file__).parent / "data" / "arith"
CASES = sorted(int(p.stem[4:]) for p in DATA.glob("case*.jpg"))


def _read_coef(path):
    b = pathlib.Path(path).read_bytes()
    n = b[0]
    off = 1
    comps = []
    for _ in range(n):
        h, v, wb, hb = struct.unpack_from("<4H", b, off)
        off += 8
        arr = np.frombuffer(b, "<i2", wb * hb * 64,
                            off).reshape(hb * wb, 64)
        off += wb * hb * 128
        comps.append((h, v, wb, hb, arr))
    return comps


def _read_rgb(path):
    b = pathlib.Path(path).read_bytes()
    w, h = struct.unpack_from("<2H", b, 0)
    return np.frombuffer(b, np.uint8, w * h * 3, 4).reshape(h, w, 3)


def _decode_with_coefs(payload):
    """decode_jpeg + capture of the zigzag coefficient grids fed to
    the IDCT, so the entropy layer is observable in isolation."""
    captured = []
    orig = J._idct_blocks

    def capture(coefs_zz, qt, prec=8):
        captured.append(coefs_zz.copy())
        return orig(coefs_zz, qt, prec=prec)

    J._idct_blocks = capture
    try:
        px = decode_jpeg(payload)
    finally:
        J._idct_blocks = orig
    return px, captured


@pytest.mark.parametrize("case", CASES)
def test_arith_coefficients_exact_vs_libjpeg(case):
    payload = (DATA / f"case{case}.jpg").read_bytes()
    px, captured = _decode_with_coefs(payload)
    ref = _read_coef(DATA / f"case{case}.coef")
    assert len(captured) == len(ref)
    hmax = max(h for h, _, _, _, _ in ref)
    w = _read_rgb(DATA / f"case{case}.rgb").shape[1]
    mcus_x = -(-w // (8 * hmax))
    for (h, v, wb, hb, refarr), mine_zz in zip(ref, captured):
        nat = np.zeros_like(mine_zz)
        nat[:, ZIGZAG] = mine_zz         # zigzag grid -> natural order
        bw_pad = mcus_x * h              # padded raster-grid row width
        sel = (np.arange(hb)[:, None] * bw_pad
               + np.arange(wb)[None, :]).ravel()
        assert np.array_equal(nat[sel], refarr.astype(nat.dtype))


@pytest.mark.parametrize("case", CASES)
def test_arith_pixels_close_to_libjpeg(case):
    payload = (DATA / f"case{case}.jpg").read_bytes()
    px = decode_jpeg(payload)
    ref = _read_rgb(DATA / f"case{case}.rgb")
    assert px.shape == ref.shape
    diff = np.abs(px.astype(np.int32) - ref.astype(np.int32))
    # entropy layers agree exactly (test above); the residual is IDCT
    # rounding between implementations (reference uses replication
    # upsampling, same as this decoder)
    assert diff.mean() < 0.5 and diff.max() <= 4


def test_arith_lossless_still_gated():
    payload = bytearray((DATA / "case0.jpg").read_bytes())
    i = payload.index(b"\xff\xc9")
    payload[i + 1] = 0xCB                # SOF11: arithmetic lossless
    with pytest.raises(NotImplementedError, match="arithmetic "
                                                  "lossless"):
        decode_jpeg(bytes(payload))


def test_arith_dac_validation():
    payload = bytearray((DATA / "case0.jpg").read_bytes())
    i = payload.index(b"\xff\xcc")
    # first DAC entry: Tc/Tb byte then Cs; find a DC-class entry
    (seglen,) = struct.unpack_from(">H", payload, i + 2)
    off = i + 4
    while payload[off] >> 4 != 0:
        off += 2
        assert off < i + 2 + seglen
    payload[off + 1] = 0x05              # U=0 < L=5: invalid bounds
    with pytest.raises(ValueError, match="DAC conditioning"):
        decode_jpeg(bytes(payload))


def test_arith_truncated_scan_raises():
    payload = (DATA / "case0.jpg").read_bytes()
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg(payload[:len(payload) // 2])


def test_arith_through_image_pipeline():
    from tbl_spark.pipelines.multimodal import decode_image
    payload = (DATA / "case2.jpg").read_bytes()
    px = decode_image(payload, 0, 0)
    ref = _read_rgb(DATA / "case2.rgb")
    assert px.shape == ref.shape
    diff = np.abs(px.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 0.5


def test_arith_garbage_entropy_never_hangs():
    # corrupt entropy bytes must either decode (zero-fed tails are
    # legal per D.2.6) or raise the corrupt-input ValueError — never
    # hang or escape with a foreign exception. The structure (markers)
    # is kept valid; only the scan body is replaced with noise.
    import numpy as np
    rng = np.random.default_rng(99)
    base = (DATA / "case0.jpg").read_bytes()
    sos = base.index(b"\xff\xda")
    (slen,) = struct.unpack_from(">H", base, sos + 2)
    body_start = sos + 2 + slen
    eoi = len(base) - 2
    for _ in range(25):
        noise = bytes(int(b) if b != 0xFF else 0xFE
                      for b in rng.integers(0, 256, eoi - body_start))
        payload = base[:body_start] + noise + b"\xff\xd9"
        try:
            px = decode_jpeg(payload)
            assert px is not None and px.ndim == 3
        except ValueError:
            pass
