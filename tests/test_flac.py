"""FLAC decode tests: a test-side encoder builds every supported
subframe/stereo/partition shape from planted sample arrays for
value-exact checks, plus hand-computed Rice bit vectors so the entropy
layer is not validated solely against the encoder's mirror."""

import struct

import numpy as np
import pytest

from tbl_spark.pipelines._flac import (
    _Bits,
    _fixed_restore,
    decode_flac,
)
from tbl_spark.pipelines.multimodal import decode_audio


class _BW:
    """MSB-first bit writer (no byte stuffing — FLAC has none)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, n):
        assert 0 <= v < (1 << n) or n == 0
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = self.n = 0

    def put_signed(self, v, n):
        self.put(v & ((1 << n) - 1), n)

    def unary(self, q):
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def align(self):
        while self.n:
            self.put(0, 1)

    def bytes(self):
        assert self.n == 0
        return bytes(self.out)


def _rice_put(bw, vals, k):
    for v in vals:
        # canonical zigzag: non-negative -> 2v, negative -> -2v-1
        z = 2 * v if v >= 0 else -2 * v - 1
        bw.unary(z >> k)
        bw.put(z & ((1 << k) - 1), k)


def _residual_put(bw, resid, k, porder=0, escape_last=False,
                  pred_order=0, method=0):
    pbits, esc = (4, 15) if method == 0 else (5, 31)
    bw.put(method, 2)
    bw.put(porder, 4)
    parts = 1 << porder
    n_total = len(resid) + pred_order
    off = 0
    for p in range(parts):
        n = (n_total >> porder) - (pred_order if p == 0 else 0)
        chunk = resid[off:off + n]
        off += n
        if escape_last and p == parts - 1:
            bw.put(esc, pbits)
            nb = 18
            bw.put(nb, 5)
            for v in chunk:
                bw.put_signed(int(v), nb)
        else:
            bw.put(k, pbits)
            _rice_put(bw, [int(v) for v in chunk], k)


def _subframe_put(bw, kind, samples, bps, order=0, coefs=None, shift=0,
                  wasted=0, k=3, **res_kw):
    bw.put(0, 1)                                  # padding
    s = np.asarray(samples, dtype=np.int64)
    if wasted:
        assert not (s & ((1 << wasted) - 1)).any()
        s = s >> wasted
        eff = bps - wasted
    else:
        eff = bps
    if kind == "constant":
        bw.put(0, 6)
        bw.put(1 if wasted else 0, 1)
        if wasted:
            bw.unary(wasted - 1)
        bw.put_signed(int(s[0]), eff)
        return
    if kind == "verbatim":
        bw.put(1, 6)
        bw.put(1 if wasted else 0, 1)
        if wasted:
            bw.unary(wasted - 1)
        for v in s:
            bw.put_signed(int(v), eff)
        return
    if kind == "fixed":
        bw.put(8 + order, 6)
        bw.put(1 if wasted else 0, 1)
        if wasted:
            bw.unary(wasted - 1)
        for v in s[:order]:
            bw.put_signed(int(v), eff)
        d = s
        for _ in range(order):
            d = np.diff(d)
        _residual_put(bw, d, k, pred_order=order, **res_kw)
        return
    if kind == "lpc":
        order = len(coefs)
        bw.put(32 + order - 1, 6)
        bw.put(1 if wasted else 0, 1)
        if wasted:
            bw.unary(wasted - 1)
        for v in s[:order]:
            bw.put_signed(int(v), eff)
        prec = 12
        bw.put(prec - 1, 4)
        bw.put_signed(shift, 5)
        for c in coefs:
            bw.put_signed(int(c), prec)
        c = np.asarray(coefs, dtype=np.int64)[::-1]
        resid = [int(s[i]) - (int(s[i - order:i] @ c) >> shift)
                 for i in range(order, len(s))]
        _residual_put(bw, np.array(resid, np.int64), k,
                      pred_order=order, **res_kw)
        return
    raise AssertionError(kind)


def _streaminfo(rate, n_ch, bps, total):
    bw = _BW()
    bw.put(16, 16)
    bw.put(65535, 16)
    bw.put(0, 24)
    bw.put(0, 24)
    bw.put(rate, 20)
    bw.put(n_ch - 1, 3)
    bw.put(bps - 1, 5)
    bw.put(total >> 32, 4)
    bw.put(total & 0xFFFFFFFF, 32)
    body = bw.bytes() + b"\0" * 16                # md5 unchecked
    return b"\x80" + struct.pack(">I", len(body))[1:] + body


def _frame_header(bw, block_size, ch_code, frame_no=0):
    bw.put(0x3FFE, 14)
    bw.put(0, 1)
    bw.put(0, 1)                                  # fixed blocking
    bw.put(7, 4)                                  # 16-bit size follows
    bw.put(0, 4)                                  # rate: streaminfo
    bw.put(ch_code, 4)
    bw.put(0, 3)                                  # depth: streaminfo
    bw.put(0, 1)
    bw.put(frame_no, 8)                           # coded number < 0x80
    bw.put(block_size - 1, 16)
    bw.put(0, 8)                                  # CRC-8 unverified


def encode_flac(channels, rate=44100, bps=16, ch_code=None,
                sub=("fixed",), frame_split=None, **kw):
    """channels: list of per-channel planted int arrays. sub: subframe
    kind per encoded channel (cycled). ch_code None = independent."""
    n = len(channels[0])
    n_ch = len(channels)
    out = bytearray(b"fLaC") + bytearray(_streaminfo(rate, n_ch, bps, n))
    splits = frame_split or [n]
    off = 0
    for fi, bs in enumerate(splits):
        bw = _BW()
        code = ch_code if ch_code is not None else n_ch - 1
        _frame_header(bw, bs, code, frame_no=fi)
        chans = [np.asarray(c[off:off + bs], dtype=np.int64)
                 for c in channels]
        if code == 8:                             # left/side
            enc = [(chans[0], bps), (chans[0] - chans[1], bps + 1)]
        elif code == 9:                           # side, right
            enc = [(chans[0] - chans[1], bps + 1), (chans[1], bps)]
        elif code == 10:                          # mid/side
            side = chans[0] - chans[1]
            mid = (chans[0] + chans[1]) >> 1
            enc = [(mid, bps), (side, bps + 1)]
        else:
            enc = [(c, bps) for c in chans]
        for i, (vals, b) in enumerate(enc):
            _subframe_put(bw, sub[i % len(sub)], vals, b, **kw)
        bw.align()
        bw.put(0, 16)                             # CRC-16 unverified
        out += bw.bytes()
        off += bs
    return bytes(out)


# ----------------------------------------------------------------- tests

def test_rice_hand_vector():
    # values [3, -2, 0, 5] at k=2: zigzag [6, 3, 0, 10] ->
    # (q,r) = (1,2),(0,3),(0,0),(2,2): bits 01 10 | 1 11 | 1 00 | 001 10
    bw = _BW()
    for q, r in ((1, 2), (0, 3), (0, 0), (2, 2)):
        bw.unary(q)
        bw.put(r, 2)
    bw.align()
    br = _Bits(bw.bytes())
    from tbl_spark.pipelines._flac import _rice_partition
    got = _rice_partition(br, 4, 2)
    assert got.tolist() == [3, -2, 0, 5]


def test_fixed_restore_matches_nth_difference():
    rng = np.random.default_rng(50)
    s = rng.integers(-30000, 30000, 64).astype(np.int64)
    for order in range(5):
        d = s.copy()
        for _ in range(order):
            d = np.diff(d)
        back = _fixed_restore(s[:order], d, order)
        assert np.array_equal(back, s)


@pytest.mark.parametrize("kind,order", [("constant", 0), ("verbatim", 0),
                                        ("fixed", 0), ("fixed", 1),
                                        ("fixed", 2), ("fixed", 3),
                                        ("fixed", 4)])
def test_mono_subframe_kinds_exact(kind, order):
    rng = np.random.default_rng(51)
    if kind == "constant":
        s = np.full(256, -1234, dtype=np.int64)
    else:
        base = rng.integers(-1000, 1000, 256).astype(np.int64)
        s = np.cumsum(base) // 4                 # smooth enough for fixed
    blob = encode_flac([s], sub=(kind,), order=order)
    got, rate = decode_flac(blob)
    assert rate == 44100 and got.dtype == np.int16
    assert np.array_equal(got[:, 0], s.astype(np.int16))
    # decode_audio routes fLaC magic
    got2, _ = decode_audio(blob)
    assert np.array_equal(got2, got)


def test_lpc_subframe_exact():
    rng = np.random.default_rng(52)
    s = (np.cumsum(rng.integers(-400, 400, 200)) // 3).astype(np.int64)
    blob = encode_flac([s], sub=("lpc",), coefs=[3, -3, 1, 1], shift=1)
    got, _ = decode_flac(blob)
    assert np.array_equal(got[:, 0], s.astype(np.int16))


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_stereo_decorrelation_modes_exact(ch_code):
    rng = np.random.default_rng(53 + ch_code)
    left = rng.integers(-32000, 32000, 192).astype(np.int64)
    right = np.clip(left + rng.integers(-500, 500, 192),
                    -32768, 32767).astype(np.int64)
    blob = encode_flac([left, right], ch_code=ch_code, sub=("verbatim",))
    got, _ = decode_flac(blob)
    assert np.array_equal(got[:, 0], left.astype(np.int16))
    assert np.array_equal(got[:, 1], right.astype(np.int16))


def test_partitions_escape_and_multiframe():
    rng = np.random.default_rng(60)
    s = np.cumsum(rng.integers(-200, 200, 512)).astype(np.int64)
    blob = encode_flac([s], sub=("fixed",), order=1, porder=2,
                       escape_last=True, frame_split=[256, 256])
    got, _ = decode_flac(blob)
    assert np.array_equal(got[:, 0], s.astype(np.int16))


def test_wasted_bits_and_24bit_depth():
    rng = np.random.default_rng(61)
    s = (rng.integers(-2 ** 20, 2 ** 20, 128) << 3).astype(np.int64)
    blob = encode_flac([s], bps=24, sub=("verbatim",), wasted=3)
    got, _ = decode_flac(blob)
    assert got.dtype == np.int32
    assert np.array_equal(got[:, 0], s.astype(np.int32))


def test_non_flac_none_and_corrupt_raises():
    assert decode_flac(b"RIFF" + b"\0" * 60) is None
    s = np.arange(64, dtype=np.int64)
    blob = bytearray(encode_flac([s], sub=("verbatim",)))
    with pytest.raises(ValueError):
        decode_flac(bytes(blob[:50]))            # inside STREAMINFO
    # break the frame sync word
    blob2 = bytearray(encode_flac([s], sub=("verbatim",)))
    blob2[4 + 4 + 34] = 0x00                     # first frame byte
    with pytest.raises(ValueError, match="sync"):
        decode_flac(bytes(blob2))
