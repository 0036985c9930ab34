"""Baseline-JPEG decoder tests (VERDICT r6 #4).

Strategy: a minimal test-side baseline-JPEG *encoder* (canonical
single-length Huffman tables, byte stuffing, restart markers) emits
scans from chosen quantized coefficients, and the expected pixels are
computed by an independent naive cos-loop IDCT — so the decoder's
Huffman + dequant + IDCT + assembly path is checked value-exact without
any imaging library. System JPEGs (written by real libjpeg encoders)
add structural smoke coverage when present.
"""

import os
import struct

import numpy as np
import pytest

from tbl_spark.pipelines._jpeg import ZIGZAG, decode_jpeg

# ---------------------------------------------------------------------------
# test-side encoder


def _make_huff(symbols, length=8):
    """Canonical table with every symbol at one code length: counts
    vector + symbol bytes + symbol -> (code, nbits) map. Codes are
    sequential from 0 (the canonical assignment both encoder and
    decoder derive)."""
    assert len(symbols) <= (1 << length) - 1
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    code_map = {s: (i, length) for i, s in enumerate(symbols)}
    return bytes(counts), bytes(symbols), code_map


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:        # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _size_of(v):
    return int(abs(v)).bit_length()


def _put_coded(bw, v, s):
    if s:
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)


def _encode_block(bw, coefs_nat, pred, dc_map, ac_map):
    """coefs_nat: (8, 8) natural-order quantized coefficients."""
    zz = coefs_nat.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = _size_of(diff)
    bw.put(*dc_map[s])
    _put_coded(bw, diff, s)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            bw.put(*ac_map[0xF0])
            run -= 16
        s = _size_of(v)
        bw.put(*ac_map[(run << 4) | s])
        _put_coded(bw, v, s)
        run = 0
    if last < 63:
        bw.put(*ac_map[0x00])            # EOB
    return int(zz[0])


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(components, W, H, qtables, restart=0, wide_dqt=False,
                precision=8, extra_segs=()):
    """components: list of (h, v, tq, blocks) where blocks is an
    (n_mcus, h*v, 8, 8) natural-order quantized coefficient array in
    MCU order. Emits SOF0 + one interleaved scan (or single-component).
    precision=12 writes an extended-sequential frame (wider DC/AC
    symbol alphabets per T.81 Table B.2); extra_segs are raw
    pre-assembled marker segments inserted before SOF (e.g. APP14)."""
    out = bytearray(b"\xff\xd8")
    for seg in extra_segs:
        out += seg
    for tq, q in sorted(qtables.items()):
        qz = np.asarray(q).reshape(64)[ZIGZAG]
        if wide_dqt or precision == 12:
            body = bytes([0x10 | tq]) + struct.pack(
                ">64H", *[int(x) for x in qz])
        else:
            body = bytes([tq]) + bytes(int(x) for x in qz)
        out += _seg(0xDB, body)
    sof = struct.pack(">BHHB", precision, H, W, len(components))
    for i, (h, v, tq, _b) in enumerate(components):
        sof += struct.pack(">BBB", i + 1, (h << 4) | v, tq)
    out += _seg(0xC0 if precision == 8 else 0xC1, sof)
    if precision == 12:
        dc_counts, dc_syms, dc_map = _make_huff(list(range(16)), 5)
        ac_counts, ac_syms, ac_map = _make_huff(
            [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                            for s in range(1, 15)], 9)
    else:
        dc_counts, dc_syms, dc_map = _make_huff(_DC_SYMS, 4)
        ac_counts, ac_syms, ac_map = _make_huff(_AC_SYMS, 8)
    out += _seg(0xC4, bytes([0x00]) + dc_counts + dc_syms)
    out += _seg(0xC4, bytes([0x10]) + ac_counts + ac_syms)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(components)])
    for i in range(len(components)):
        sos += struct.pack(">BB", i + 1, 0x00)
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    n_mcus = components[0][3].shape[0]
    preds = [0] * len(components)
    bw = _BitWriter()
    rst = 0
    for m in range(n_mcus):
        if restart and m and m % restart == 0:
            out += bw.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(components)
        for ci, (_h, _v, _tq, blocks) in enumerate(components):
            for b in range(blocks.shape[1]):
                preds[ci] = _encode_block(bw, blocks[m, b], preds[ci],
                                          dc_map, ac_map)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# independent reference math (naive loops, separate from the decoder's
# matrix-contraction path)


def ref_idct_block(coef_nat):
    """Dequantized natural-order (8, 8) coefficients -> (8, 8) uint8."""
    out = np.empty((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (cu * cv * coef_nat[v, u]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16))
            out[y, x] = acc / 4.0
    return np.clip(np.round(out) + 128, 0, 255).astype(np.uint8)


def ref_plane(blocks, mcus_y, mcus_x, v, h, qtable):
    rows = []
    for my in range(mcus_y):
        for bv in range(v):
            row = []
            for mx in range(mcus_x):
                for bh in range(h):
                    c = blocks[my * mcus_x + mx, bv * h + bh] * qtable
                    row.append(ref_idct_block(c))
            rows.append(np.hstack(row))
    return np.vstack(rows)


def ref_rgb(y, cb, cr):
    yf, cbf, crf = (a.astype(np.float64) for a in (y, cb, cr))
    r = yf + 1.402 * (crf - 128)
    g = yf - 0.344136 * (cbf - 128) - 0.714136 * (crf - 128)
    b = yf + 1.772 * (cbf - 128)
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(
        np.uint8)


def _rand_blocks(rng, n_mcus, per_mcu, lo=-180, hi=180, density=0.2):
    blocks = np.zeros((n_mcus, per_mcu, 8, 8), dtype=np.int64)
    mask = rng.random(blocks.shape) < density
    blocks[mask] = rng.integers(lo, hi, mask.sum())
    blocks[:, :, 0, 0] = rng.integers(-400, 400, (n_mcus, per_mcu))
    return blocks


# ---------------------------------------------------------------------------
# tests


def test_gray_single_block_exact():
    rng = np.random.default_rng(1)
    q = np.ones((8, 8), dtype=np.int64)
    blocks = _rand_blocks(rng, 1, 1)
    payload = encode_jpeg([(1, 1, 0, blocks)], 8, 8, {0: q})
    got = decode_jpeg(payload)
    exp = ref_idct_block(blocks[0, 0] * q)
    assert got.shape == (8, 8, 3)
    assert np.array_equal(got, np.repeat(exp[:, :, None], 3, axis=2))


def test_gray_multiblock_odd_dims_and_quant():
    """23x13 grayscale: 2x3 block grid cropped, non-trivial qtable."""
    rng = np.random.default_rng(2)
    q = rng.integers(1, 40, (8, 8)).astype(np.int64)
    blocks = _rand_blocks(rng, 6, 1, lo=-60, hi=60)
    payload = encode_jpeg([(1, 1, 0, blocks)], 23, 13, {0: q})
    got = decode_jpeg(payload)
    exp = ref_plane(blocks.reshape(6, 1, 8, 8), 2, 3, 1, 1, q)[:13, :23]
    assert got.shape == (13, 23, 3)
    assert np.array_equal(got[:, :, 0], exp)
    assert np.array_equal(got[:, :, 1], exp)


def test_color_444_exact():
    rng = np.random.default_rng(3)
    qy = rng.integers(1, 24, (8, 8)).astype(np.int64)
    qc = rng.integers(1, 48, (8, 8)).astype(np.int64)
    comps = [(1, 1, 0, _rand_blocks(rng, 4, 1)) for _ in range(3)]
    comps = [(1, 1, 0, comps[0][3]), (1, 1, 1, comps[1][3]),
             (1, 1, 1, comps[2][3])]
    payload = encode_jpeg(comps, 16, 16, {0: qy, 1: qc})
    got = decode_jpeg(payload)
    planes = [ref_plane(c[3], 2, 2, 1, 1, qy if i == 0 else qc)
              for i, c in enumerate(comps)]
    exp = ref_rgb(*planes)
    assert got.shape == (16, 16, 3)
    assert np.array_equal(got, exp)


def test_color_420_subsampled_exact():
    """4:2:0: MCU = 4 Y + 1 Cb + 1 Cr; chroma upsample is the decoder's
    documented nearest mapping (2x2 replication here)."""
    rng = np.random.default_rng(4)
    q = np.ones((8, 8), dtype=np.int64) * 2
    ny = _rand_blocks(rng, 2, 4, lo=-90, hi=90)
    cb = _rand_blocks(rng, 2, 1, lo=-90, hi=90)
    cr = _rand_blocks(rng, 2, 1, lo=-90, hi=90)
    payload = encode_jpeg([(2, 2, 0, ny), (1, 1, 0, cb), (1, 1, 0, cr)],
                          32, 16, {0: q})
    got = decode_jpeg(payload)
    yp = ref_plane(ny, 1, 2, 2, 2, q)
    cbp = np.repeat(np.repeat(ref_plane(cb, 1, 2, 1, 1, q), 2, 0), 2, 1)
    crp = np.repeat(np.repeat(ref_plane(cr, 1, 2, 1, 1, q), 2, 0), 2, 1)
    exp = ref_rgb(yp[:16, :32], cbp[:16, :32], crp[:16, :32])
    assert got.shape == (16, 32, 3)
    assert np.array_equal(got, exp)


def test_color_422_and_wide_dqt():
    """4:2:2 sampling + 16-bit (Pq=1) quantization tables."""
    rng = np.random.default_rng(5)
    q = rng.integers(1, 500, (8, 8)).astype(np.int64)   # needs 16-bit DQT
    ny = _rand_blocks(rng, 3, 2, lo=-30, hi=30)
    cb = _rand_blocks(rng, 3, 1, lo=-30, hi=30)
    cr = _rand_blocks(rng, 3, 1, lo=-30, hi=30)
    payload = encode_jpeg([(2, 1, 0, ny), (1, 1, 0, cb), (1, 1, 0, cr)],
                          48, 8, {0: q}, wide_dqt=True)
    got = decode_jpeg(payload)
    yp = ref_plane(ny.reshape(3, 2, 8, 8), 1, 3, 1, 2, q)
    cbp = np.repeat(ref_plane(cb, 1, 3, 1, 1, q), 2, axis=1)
    crp = np.repeat(ref_plane(cr, 1, 3, 1, 1, q), 2, axis=1)
    exp = ref_rgb(yp[:8, :48], cbp[:8, :48], crp[:8, :48])
    assert got.shape == (8, 48, 3)
    assert np.array_equal(got, exp)


def test_restart_markers_reset_predictors():
    rng = np.random.default_rng(6)
    q = np.ones((8, 8), dtype=np.int64)
    blocks = _rand_blocks(rng, 6, 1)
    payload = encode_jpeg([(1, 1, 0, blocks)], 48, 8, {0: q}, restart=2)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
    got = decode_jpeg(payload)
    exp = ref_plane(blocks, 1, 6, 1, 1, q)
    assert np.array_equal(got[:, :, 0], exp[:8, :48])


def test_not_jpeg_returns_none():
    assert decode_jpeg(b"\x89PNG\r\n\x1a\nnope") is None
    assert decode_jpeg(b"") is None


def test_progressive_and_corrupt_gates():
    rng = np.random.default_rng(7)
    q = np.ones((8, 8), dtype=np.int64)
    blocks = _rand_blocks(rng, 1, 1)
    good = encode_jpeg([(1, 1, 0, blocks)], 8, 8, {0: q})
    # flip SOF0 -> SOF2: progressive is REAL now (test_jpeg_progressive
    # covers values), but a sequential-shaped scan header (Ss=0, Se=63)
    # inside a progressive frame violates G.1 -> corrupt, not exotic
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="spectral band"):
        decode_jpeg(prog)
    # lossless is REAL now (test_jpeg_ext covers values), but a
    # sequential-shaped scan header (Ss=0 predictor) inside a lossless
    # frame violates Annex H -> corrupt, not exotic
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="lossless scan header"):
        decode_jpeg(lossless)
    # truncated scan: clean ValueError
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg(good[:len(good) - 12])
    # missing huffman tables: strip both DHT segments
    i = good.find(b"\xff\xc4")
    stripped = good
    while (i := stripped.find(b"\xff\xc4")) >= 0:
        (ln,) = struct.unpack(">H", stripped[i + 2:i + 4])
        stripped = stripped[:i] + stripped[i + 2 + ln:]
    with pytest.raises(ValueError, match="Huffman"):
        decode_jpeg(stripped)


def test_decode_image_integration_and_resize():
    from tbl_spark.pipelines.multimodal import decode_image
    rng = np.random.default_rng(8)
    q = np.ones((8, 8), dtype=np.int64)
    blocks = _rand_blocks(rng, 4, 1)
    payload = encode_jpeg([(1, 1, 0, blocks)], 16, 16, {0: q})
    got = decode_image(payload, 0, 0)
    assert got.shape == (16, 16, 3) and got.flags.writeable
    assert decode_image(payload, 8, 24).shape == (24, 8, 3)


_SYSTEM_JPEGS = [
    p for p in (
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
        "python3.11/site-packages/IPython/core/tests/2x2.jpg",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
        "python3.11/test/test_email/data/python.jpg",
    ) if os.path.exists(p)
]


@pytest.mark.skipif(not _SYSTEM_JPEGS, reason="no system JPEGs present")
def test_real_libjpeg_files_smoke():
    """Files produced by real encoders: structural smoke only (no
    independent pixel oracle without an imaging library) — decode must
    succeed, match the SOF dimensions, and produce non-constant output
    for the photo."""
    for path in _SYSTEM_JPEGS:
        with open(path, "rb") as f:
            payload = f.read()
        try:
            px = decode_jpeg(payload)
        except NotImplementedError:
            continue                   # progressive etc: honest gate
        assert px is not None and px.ndim == 3 and px.shape[2] == 3
        assert px.shape[0] > 0 and px.shape[1] > 0
        if px.size > 64:
            assert px.std() > 1.0


def test_jpeg_in_map_in_arrow(spark):
    """JPEG payloads run the executor batch path end-to-end
    (fake_decode=False) like the PNG twin in test_r6_fixes."""
    from tbl_spark.pipelines.multimodal import extract_features
    rng = np.random.default_rng(9)
    q = np.ones((8, 8), dtype=np.int64)
    rows = []
    for mid in range(6):
        blocks = _rand_blocks(rng, 4, 1)
        payload = encode_jpeg([(1, 1, 0, blocks)], 16, 16, {0: q})
        rows.append((mid, "image", 16, 16, 1, bytearray(payload)))
    df = spark.createDataFrame(
        rows, "media_id bigint, kind string, width int, height int, "
              "n_frames int, payload binary")
    out = extract_features(df, dim=8, fake_decode=False).collect()
    assert len(out) == 6
    for r in out:
        assert len(r["feature"]) == 8
        assert any(abs(x) > 0 for x in r["feature"])
