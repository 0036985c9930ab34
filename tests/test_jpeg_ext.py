"""12-bit and 4-component (Adobe CMYK/YCCK) JPEG decode tests, built on
test_jpeg's fixture encoder and independent reference math."""

import struct
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_jpeg import (                                   # noqa: E402
    _rand_blocks,
    _seg,
    encode_jpeg,
    ref_plane,
    ref_rgb,
)
from tbl_spark.pipelines._jpeg import decode_jpeg         # noqa: E402


def _app14(transform: int) -> bytes:
    body = (b"Adobe" + struct.pack(">HHH", 100, 0, 0)
            + bytes([transform]))
    assert len(body) == 12 and body[11] == transform
    return _seg(0xEE, body)


def _ref_plane12(blocks, mcus_y, mcus_x, v, h, qtable):
    """12-bit reference: level shift 2048, clip 0..4095, exact
    round-to-nearest scale to 8-bit — independent of the decoder's
    batched-GEMM path (same naive quadruple loop as test_jpeg's
    ref_idct_block, with the 12-bit shift/clip/scale)."""
    rows = []
    for my in range(mcus_y):
        for bv in range(v):
            row = []
            for mx in range(mcus_x):
                for bh in range(h):
                    c = blocks[my * mcus_x + mx, bv * h + bh] * qtable
                    # recompute the float IDCT exactly as ref_idct_block
                    # but with the 12-bit shift/clip
                    out = np.empty((8, 8))
                    for y in range(8):
                        for x in range(8):
                            acc = 0.0
                            for vv in range(8):
                                for u in range(8):
                                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                                    cv = 1 / np.sqrt(2) if vv == 0 else 1.0
                                    acc += (cu * cv * c[vv, u]
                                            * np.cos((2 * x + 1) * u
                                                     * np.pi / 16)
                                            * np.cos((2 * y + 1) * vv
                                                     * np.pi / 16))
                            out[y, x] = acc / 4.0
                    v12 = np.clip(np.round(out) + 2048, 0,
                                  4095).astype(np.int64)
                    row.append(((v12 * 255 + 2047) // 4095)
                               .astype(np.uint8))
            rows.append(np.hstack(row))
    return np.vstack(rows)


def test_12bit_gray_exact():
    rng = np.random.default_rng(20)
    blocks = _rand_blocks(rng, 4, 1, lo=-900, hi=900)
    blocks[:, :, 0, 0] = rng.integers(-2000, 2000, (4, 1))
    q = np.ones((8, 8), dtype=np.int64)
    q[0, 0] = 2
    blob = encode_jpeg([(1, 1, 0, blocks)], 16, 16, {0: q}, precision=12)
    got = decode_jpeg(blob)
    exp = _ref_plane12(blocks, 2, 2, 1, 1, q)
    assert np.array_equal(got, np.repeat(exp[:, :, None], 3, axis=2))


def test_12bit_color_exact_and_dc_size_13():
    rng = np.random.default_rng(21)
    comps = []
    planes = []
    q = np.ones((8, 8), dtype=np.int64)
    for ci in range(3):
        blocks = _rand_blocks(rng, 4, 1, lo=-500, hi=500)
        # DC swings big enough that some diffs need >11 bits (the 8-bit
        # decoder's DC gate would reject these)
        blocks[:, :, 0, 0] = np.array([[-7000], [7000], [-7000], [7000]])
        comps.append((1, 1, ci % 2, blocks))
        planes.append(_ref_plane12(blocks, 2, 2, 1, 1, q))
    blob = encode_jpeg(comps, 16, 16, {0: q, 1: q}, precision=12)
    got = decode_jpeg(blob)
    assert np.array_equal(got, ref_rgb(*planes))


def test_cmyk_with_and_without_app14():
    rng = np.random.default_rng(22)
    q = np.ones((8, 8), dtype=np.int64)
    comps, planes = [], []
    for ci in range(4):
        blocks = _rand_blocks(rng, 4, 1)
        comps.append((1, 1, 0, blocks))
        planes.append(ref_plane(blocks, 2, 2, 1, 1, q))
    exp = ((np.stack(planes[:3], axis=2).astype(np.uint32)
            * planes[3].astype(np.uint32)[:, :, None] + 127)
           // 255).astype(np.uint8)
    for extra in ([_app14(0)], []):
        blob = encode_jpeg(comps, 16, 16, {0: q}, extra_segs=extra)
        assert np.array_equal(decode_jpeg(blob), exp)


def test_ycck_transform2():
    rng = np.random.default_rng(23)
    q = np.ones((8, 8), dtype=np.int64)
    comps, planes = [], []
    for ci in range(4):
        blocks = _rand_blocks(rng, 4, 1)
        comps.append((1, 1, 0, blocks))
        planes.append(ref_plane(blocks, 2, 2, 1, 1, q))
    cmy = ref_rgb(planes[0], planes[1], planes[2])
    exp = ((cmy.astype(np.uint32)
            * planes[3].astype(np.uint32)[:, :, None] + 127)
           // 255).astype(np.uint8)
    blob = encode_jpeg(comps, 16, 16, {0: q}, extra_segs=[_app14(2)])
    assert np.array_equal(decode_jpeg(blob), exp)


def test_rgb_transform0_three_components():
    rng = np.random.default_rng(24)
    q = np.ones((8, 8), dtype=np.int64)
    comps, planes = [], []
    for ci in range(3):
        blocks = _rand_blocks(rng, 4, 1)
        comps.append((1, 1, 0, blocks))
        planes.append(ref_plane(blocks, 2, 2, 1, 1, q))
    blob = encode_jpeg(comps, 16, 16, {0: q}, extra_segs=[_app14(0)])
    assert np.array_equal(decode_jpeg(blob), np.stack(planes, axis=2))
    # sanity: without APP14 the same stream is read as YCbCr instead
    blob2 = encode_jpeg(comps, 16, 16, {0: q})
    assert np.array_equal(decode_jpeg(blob2), ref_rgb(*planes))


def test_unsupported_precision_still_gated():
    rng = np.random.default_rng(25)
    blocks = _rand_blocks(rng, 1, 1)
    blob = bytearray(encode_jpeg([(1, 1, 0, blocks)], 8, 8,
                                 {0: np.ones((8, 8), dtype=np.int64)}))
    # patch SOF precision byte to 14 (first 0xFFC0 segment, byte 4)
    i = blob.find(b"\xff\xc0")
    blob[i + 4] = 14
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


# ---------------------------------------------------------------------------
# lossless (SOF3, T.81 Annex H)

from test_jpeg import _BitWriter, _make_huff  # noqa: E402


def _spec_pred(s, y, x, sel, prec, pt):
    """The seven Annex H predictors straight from the planted SAMPLE
    array (ground-truth neighbors), so the encoder side is the spec
    formula and not a mirror of the decoder's recurrences."""
    if y == 0 and x == 0:
        return 1 << (prec - pt - 1)
    if y == 0:
        return int(s[y, x - 1])
    if x == 0:
        return int(s[y - 1, x])
    ra, rb, rc = int(s[y, x - 1]), int(s[y - 1, x]), int(s[y - 1, x - 1])
    return [ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
            rb + ((ra - rc) >> 1), (ra + rb) >> 1][sel - 1]


def _emit_diff(bw, dc_map, d):
    d &= 0xFFFF
    if d > 32768:
        d -= 65536
    if d == 32768:
        bw.put(*dc_map[16])
        return
    s = int(abs(d)).bit_length()
    bw.put(*dc_map[s])
    if s:
        bw.put(d if d >= 0 else d + (1 << s) - 1, s)


def encode_lossless(planes, prec, predictors, pt=0, interleaved=True,
                    restart=0):
    """planes: list of (H, W) int arrays (< 2^(prec-pt)). predictors:
    per-scan selector (one per component when not interleaved, a single
    int when interleaved)."""
    H, W = planes[0].shape
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", prec, H, W, len(planes))
    for i in range(len(planes)):
        sof += struct.pack(">BBB", i + 1, 0x11, 0)
    out += _seg(0xC3, sof)
    dc_counts, dc_syms, dc_map = _make_huff(list(range(17)), 5)
    out += _seg(0xC4, bytes([0x00]) + dc_counts + dc_syms)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))

    def scan(comp_ids, sel):
        sos = bytes([len(comp_ids)])
        for c in comp_ids:
            sos += struct.pack(">BB", c + 1, 0x00)
        sos += bytes([sel, 0, pt])
        body = bytearray(_seg(0xDA, sos))
        bw = _BitWriter()
        for y in range(H):
            for x in range(W):
                for c in comp_ids:
                    s = planes[c]
                    d = int(s[y, x]) - _spec_pred(s, y, x, sel, prec, pt)
                    _emit_diff(bw, dc_map, d)
        body += bw.flush()
        return body

    if interleaved:
        out += scan(list(range(len(planes))), predictors)
    else:
        for c, sel in enumerate(predictors):
            out += scan([c], sel)
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("sel", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_gray_all_predictors_exact(sel):
    rng = np.random.default_rng(30 + sel)
    s = rng.integers(0, 256, (9, 11), dtype=np.int64)
    blob = encode_lossless([s], 8, sel)
    got = decode_jpeg(blob)
    assert np.array_equal(got, np.repeat(s[:, :, None].astype(np.uint8),
                                         3, axis=2))


def test_lossless_16bit_wraparound_and_scale():
    rng = np.random.default_rng(40)
    # full 16-bit range forces mod-2^16 diffs incl. the SSSS=16 escape
    s = rng.integers(0, 65536, (6, 7), dtype=np.int64)
    s[0, :3] = [0, 65535, 0]
    blob = encode_lossless([s], 16, 4)
    got = decode_jpeg(blob)
    exp = ((s * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(got[:, :, 0], exp)


def test_lossless_rgb_interleaved_and_multiscan():
    rng = np.random.default_rng(41)
    planes = [rng.integers(0, 256, (5, 8), dtype=np.int64)
              for _ in range(3)]
    exp = np.stack([p.astype(np.uint8) for p in planes], axis=2)
    blob = encode_lossless(planes, 8, 2, interleaved=True)
    assert np.array_equal(decode_jpeg(blob), exp)
    # one scan per component, different predictor each
    blob = encode_lossless(planes, 8, [1, 5, 7], interleaved=False)
    assert np.array_equal(decode_jpeg(blob), exp)


def test_lossless_point_transform():
    rng = np.random.default_rng(42)
    s = rng.integers(0, 64, (4, 6), dtype=np.int64)
    blob = encode_lossless([s], 8, 1, pt=2)
    got = decode_jpeg(blob)
    assert np.array_equal(got[:, :, 0], (s << 2).astype(np.uint8))


def test_lossless_restart_gated():
    rng = np.random.default_rng(43)
    s = rng.integers(0, 256, (4, 4), dtype=np.int64)
    blob = encode_lossless([s], 8, 1, restart=64)
    with pytest.raises(NotImplementedError):
        decode_jpeg(blob)
