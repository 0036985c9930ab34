"""Pure-numpy FLAC decoder (public xiph.org format, RFC 9639).

Closes the lossless-audio gap the way _jpeg.py/_tiff.py closed images:
STREAMINFO + frame stream, subframe types CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32), Rice and Rice2 residual partitions
with the 5-bit escape to raw verbatim residuals, wasted-bits shift,
all four channel assignments (independent, left/side, right/side,
mid/side), block sizes and sample rates from every header code point,
4-32 bit sample depth. Returns (samples (n_frames, n_channels) int16
or int32, rate) matching the _decode_wav contract; None on wrong
magic, ValueError on corrupt structure.

Execution shape mirrors _jpeg.py: the inherently serial entropy layer
(Rice quotients/remainders) runs as a per-sample Python walk over two
precomputed numpy artifacts — a 32-bit sliding bit-window array (any
<=32-bit field is one array read) and the sorted positions of 1-bits
(a unary run is one pointer advance) — while everything batchable is
vectorized: FIXED predictors restore as order-fold prefix sums (the
order-n fixed residual IS the n-th finite difference), stereo
decorrelation and wasted-bits shifts are whole-array ops. LPC is the
one honest per-sample recurrence (true IIR), a numpy dot per sample.
CRC-8/16 fields are parsed past, not verified (decode-side checksums
guard transport, not values — the tests assert sample-exactness)."""

from __future__ import annotations

import struct

import numpy as np

_POW32 = (1 << np.arange(31, -1, -1)).astype(np.uint64)

_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_DEPTHS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _Bits:
    """MSB-first bit reader: 32-bit sliding windows for fixed-width
    fields, a 1-bit position index for unary runs."""

    __slots__ = ("win", "ones", "nbits", "pos", "_j")

    def __init__(self, buf: bytes):
        bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.nbits = len(bits)
        padded = np.concatenate([bits, np.zeros(32, np.uint8)])
        w = np.lib.stride_tricks.sliding_window_view(padded, 32)
        self.win = (w[:self.nbits + 1] @ _POW32).astype(np.uint64)
        self.ones = np.flatnonzero(bits)
        self.pos = 0
        self._j = 0

    def read(self, n: int) -> int:
        """Next n bits (0 <= n <= 32) as an unsigned int."""
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("corrupt FLAC: bitstream exhausted")
        self.pos = p + n
        return int(self.win[p]) >> (32 - n)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0-bits up to and consuming the terminating 1-bit."""
        ones, j = self.ones, self._j
        p = self.pos
        while j < len(ones) and ones[j] < p:
            j += 1
        if j >= len(ones):
            raise ValueError("corrupt FLAC: unary run past end")
        self._j = j + 1
        q = int(ones[j]) - p
        self.pos = int(ones[j]) + 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _coded_number(br: _Bits) -> int:
    """The frame header's UTF-8-style variable-length frame/sample
    number (RFC 9639 §9.1.1; up to 36 bits over 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("corrupt FLAC: bad coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC: bad coded number")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_partition(br: _Bits, n: int, k: int) -> np.ndarray:
    """n Rice(k) residuals → signed int64 (zigzag undone)."""
    out = np.empty(n, dtype=np.int64)
    read, unary = br.read, br.unary
    for i in range(n):
        q = unary()
        v = (q << k) | read(k)
        out[i] = (v >> 1) ^ -(v & 1)
    return out


def _residual(br: _Bits, block_size: int, pred_order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("corrupt FLAC: reserved residual method")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder = br.read(4)
    parts = 1 << porder
    if block_size % parts or block_size >> porder <= pred_order:
        raise ValueError("corrupt FLAC: bad partition order")
    out = []
    for p in range(parts):
        n = (block_size >> porder) - (pred_order if p == 0 else 0)
        k = br.read(pbits)
        if k == escape:
            nb = br.read(5)
            vals = np.empty(n, dtype=np.int64)
            for i in range(n):
                vals[i] = br.read_signed(nb)
            out.append(vals)
        else:
            out.append(_rice_partition(br, n, k))
    return np.concatenate(out) if out else np.empty(0, np.int64)


def _fixed_restore(warmup: np.ndarray, resid: np.ndarray,
                   order: int) -> np.ndarray:
    """Order-n fixed prediction inverse: the residual is the n-th
    finite difference, so restoration is n prefix sums, each seeded
    with the last warmup value of the matching difference order."""
    if order == 0:
        return resid.copy()
    w = warmup.astype(np.int64)
    diffs = [w]
    for _ in range(order - 1):
        diffs.append(np.diff(diffs[-1]))
    out = resid.astype(np.int64)
    for k in range(order - 1, -1, -1):
        out = np.cumsum(out) + diffs[k][-1]
    return np.concatenate([w, out])


def _lpc_restore(warmup: np.ndarray, resid: np.ndarray,
                 coefs: np.ndarray, shift: int) -> np.ndarray:
    o = len(coefs)
    n = len(warmup) + len(resid)
    s = np.empty(n, dtype=np.int64)
    s[:o] = warmup
    c = coefs[::-1].astype(np.int64)
    for i in range(o, n):
        s[i] = resid[i - o] + (int(s[i - o:i] @ c) >> shift)
    return s


def _subframe(br: _Bits, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("corrupt FLAC: subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if bps < 1:
        raise ValueError("corrupt FLAC: wasted bits exceed depth")
    if t == 0:                                   # CONSTANT
        s = np.full(block_size, br.read_signed(bps), dtype=np.int64)
    elif t == 1:                                 # VERBATIM
        s = np.empty(block_size, dtype=np.int64)
        for i in range(block_size):
            s[i] = br.read_signed(bps)
    elif 8 <= t <= 12:                           # FIXED order 0-4
        order = t - 8
        if order > block_size:
            raise ValueError("corrupt FLAC: fixed order > block")
        warm = np.array([br.read_signed(bps) for _ in range(order)],
                        dtype=np.int64)
        s = _fixed_restore(warm, _residual(br, block_size, order), order)
    elif t >= 32:                                # LPC order 1-32
        order = t - 31
        if order > block_size:
            raise ValueError("corrupt FLAC: LPC order > block")
        warm = np.array([br.read_signed(bps) for _ in range(order)],
                        dtype=np.int64)
        prec = br.read(4)
        if prec == 15:
            raise ValueError("corrupt FLAC: invalid LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("corrupt FLAC: negative LPC shift")
        coefs = np.array([br.read_signed(prec) for _ in range(order)],
                         dtype=np.int64)
        s = _lpc_restore(warm, _residual(br, block_size, order),
                         coefs, shift)
    else:
        raise ValueError(f"corrupt FLAC: reserved subframe type {t}")
    return s << wasted if wasted else s


def decode_flac(payload: bytes) -> tuple[np.ndarray, int] | None:
    """(samples, rate), or None when the magic is not fLaC."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while True:                                  # metadata blocks
        if pos + 4 > len(payload):
            raise ValueError("corrupt FLAC: truncated metadata")
        head = payload[pos]
        (ln,) = struct.unpack(">I", b"\0" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("corrupt FLAC: truncated metadata block")
        if head & 0x7F == 0:                     # STREAMINFO
            if ln < 34:
                raise ValueError("corrupt FLAC: short STREAMINFO")
            b = _Bits(body)
            b.read(16), b.read(16)               # min/max block size
            b.read(24), b.read(24)               # min/max frame size
            rate = b.read(20)
            n_ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = (b.read(4) << 32) | b.read(32)
            info = (rate, n_ch, bps, total)
        pos += 4 + ln
        if head & 0x80:
            break
    if info is None:
        raise ValueError("corrupt FLAC: no STREAMINFO")
    si_rate, si_ch, si_bps, total = info
    if si_rate < 1 or not (4 <= si_bps <= 32):
        raise ValueError("corrupt FLAC: bad STREAMINFO")

    br = _Bits(payload[pos:])
    chunks = []
    got = 0
    while True:
        if br.nbits - br.pos < 32 or (total and got >= total):
            break
        if br.read(14) != 0x3FFE:
            raise ValueError("corrupt FLAC: lost frame sync")
        br.read(1)                               # reserved
        br.read(1)                               # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        depth_code = br.read(3)
        br.read(1)                               # reserved
        _coded_number(br)
        if bs_code == 0:
            raise ValueError("corrupt FLAC: reserved block size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("corrupt FLAC: invalid sample rate code")
        if depth_code == 3:
            raise ValueError("corrupt FLAC: reserved sample depth code")
        bps = _DEPTHS.get(depth_code, si_bps)
        br.read(8)                               # CRC-8 (not verified)

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_subframe(br, block_size, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            extra = (0, 1) if ch_code == 8 else \
                    (1, 0) if ch_code == 9 else (0, 1)
            a = _subframe(br, block_size, bps + extra[0])
            b2 = _subframe(br, block_size, bps + extra[1])
            if ch_code == 8:                     # left/side
                subs = [a, a - b2]
            elif ch_code == 9:                   # right/side (side first)
                subs = [b2 + a, b2]
            else:                                # mid/side
                side = b2
                mid2 = (a << 1) | (side & 1)
                left = (mid2 + side) >> 1
                subs = [left, left - side]
        else:
            raise ValueError("corrupt FLAC: reserved channel assignment")
        if n_ch != si_ch:
            raise ValueError("corrupt FLAC: frame channel count differs "
                             "from STREAMINFO")
        br.align()
        br.read(16)                              # CRC-16 (not verified)
        chunks.append(np.stack(subs, axis=1))
        got += block_size

    if not chunks:
        raise ValueError("corrupt FLAC: no audio frames")
    samples = np.concatenate(chunks, axis=0)
    if total and len(samples) > total:
        samples = samples[:total]                # last block may be short
    dt = np.int16 if si_bps <= 16 else np.int32
    lim = 1 << (si_bps - 1)
    if samples.size and (samples.max() >= lim or samples.min() < -lim):
        raise ValueError("corrupt FLAC: sample exceeds bit depth")
    return samples.astype(dt), si_rate
