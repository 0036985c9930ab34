"""ITU-T T.81 Annex D/F/G arithmetic-coded JPEG entropy decoding.

Completes the pure-Python JPEG decoder's SOF matrix: SOF9 (extended
sequential, arithmetic) and SOF10 (progressive, arithmetic) scans
decode here; `_jpeg.py` keeps owning markers, frame geometry, IDCT and
color. Everything is specified by the public standard:

- `_ARITAB` is Table D.3 ("Qe values and probability estimation state
  machine"): 113 rows of (Qe, Next_Index_LPS, Next_Index_MPS,
  Switch_MPS), plus the customary 114th fixed-probability row (no
  adaptation) used for sign/refinement decisions whose statistics the
  standard leaves unconditioned.
- `_ArithState` is the Annex D binary arithmetic decoder: 16-bit
  interval register A, code register C fed a byte at a time, lazy
  renormalization folded into the decision via the `(A - Qe) << CT`
  boundary (the MPS sub-interval sits at the bottom, the LPS at the
  top; conditional exchange swaps the decoded sense when Qe exceeds
  the MPS sub-interval). Input segments arrive destuffed from
  `_split_scan`; reads past the segment end feed zero bytes, which is
  the marker-reached condition D.2.6 prescribes.
- The statistical models follow Annex F (sequential: F.2.4.1 DC /
  F.2.4.2 AC) and Annex G.2 (progressive successive approximation):
  per-table areas of 64 DC / 256 AC context bins, zeroed at scan start
  and at every restart; DC conditioning categories from the (L, U)
  bounds and AC exponent-chain split at Kx, both set by the DAC
  marker (defaults L=0, U=1, Kx=5).

The decode loop is per-symbol Python by necessity — the coder is
bit-serial and context-adaptive, so there is nothing to vectorize;
arithmetic JPEG is a rare interchange format and this path trades
speed for having no decoder gap. Reference behavior parity: tbl
stores media as opaque bytes (types.rs); decode is pipeline-tier only.
"""

from __future__ import annotations

# Table D.3 rows as (Qe, (Switch_MPS << 7) | Next_Index_LPS,
# Next_Index_MPS); row 113 is the non-adaptive fixed bin.
_ARITAB_RAW = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
]
_ARITAB = tuple((qe, (sw << 7) | nlps, nmps)
                for qe, nlps, nmps, sw in _ARITAB_RAW)


class _ArithState:
    """Annex D arithmetic decoder over one destuffed restart segment.

    A context is one byte in a caller-owned bytearray:
    (MPS value << 7) | state index. `decode(area, i)` returns the
    binary decision and updates the context in place."""

    __slots__ = ("data", "pos", "end", "c", "a", "ct")

    def __init__(self, seg: bytes):
        self.data = seg
        self.pos = 0
        self.end = len(seg)
        b0 = self._byte()
        b1 = self._byte()
        self.c = (b0 << 8) | b1          # INITDEC: two code bytes in C
        self.a = 0x10000
        self.ct = 0

    def _byte(self) -> int:
        if self.pos < self.end:
            b = self.data[self.pos]
            self.pos += 1
            return b
        return 0          # past segment end == marker reached: feed 0s

    def decode(self, st: bytearray, i: int) -> int:
        a = self.a
        c = self.c
        ct = self.ct
        while a < 0x8000:                # deferred renormalization
            ct -= 1
            if ct < 0:
                c = (c << 8) | self._byte()
                ct += 8
            a <<= 1
        sv = st[i]
        qe, nlps_sw, nmps = _ARITAB[sv & 0x7F]
        a -= qe
        boundary = a << ct
        if c < boundary:                 # code in the MPS sub-interval
            if a >= 0x8000:              # no renorm pending: fast path
                self.a = a
                self.c = c
                self.ct = ct
                return sv >> 7
            if a < qe:                   # conditional exchange: the
                d = (sv >> 7) ^ 1        # smaller side decodes the LPS
                st[i] = (sv & 0x80) ^ nlps_sw
            else:
                d = sv >> 7
                st[i] = (sv & 0x80) | nmps
        else:                            # code in the LPS sub-interval
            c -= boundary
            if qe <= a:
                d = (sv >> 7) ^ 1
                st[i] = (sv & 0x80) ^ nlps_sw
            else:                        # conditional exchange
                d = sv >> 7
                st[i] = (sv & 0x80) | nmps
            a = qe
        self.a = a
        self.c = c
        self.ct = ct
        return d


def _dc_diff(dec: _ArithState, dcst: bytearray, ctx: list, ci: int,
             lu: tuple) -> int:
    """One DC difference (F.2.4.1): zero/sign decision tree keyed by
    the previous difference's conditioning category, magnitude
    exponent chain at bin 20, magnitude bits at chain bin + 14."""
    s0 = ctx[ci]
    if dec.decode(dcst, s0) == 0:
        ctx[ci] = 0
        return 0
    sign = dec.decode(dcst, s0 + 1)
    st = s0 + 2 + sign
    m = dec.decode(dcst, st)
    if m:
        st = 20
        m = 1
        while dec.decode(dcst, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError(
                    "corrupt JPEG: arithmetic DC magnitude overflow")
            st += 1
    low, up = lu
    if m < (1 << low) >> 1:
        ctx[ci] = 0                      # zero diff category
    elif m > (1 << up) >> 1:
        ctx[ci] = 12 + (sign << 2)       # large diff category
    else:
        ctx[ci] = 4 + (sign << 2)        # small diff category
    v = m
    st += 14
    m >>= 1
    while m:
        if dec.decode(dcst, st):
            v |= m
        m >>= 1
    v += 1
    return -v if sign else v


def _ac_band(dec: _ArithState, acst: bytearray, fixed: bytearray,
             row, Ss: int, Se: int, kx: int, Al: int) -> None:
    """One block's AC band (F.2.4.2): per-index EOB decision, then
    run of zero/nonzero decisions; sign from the fixed bin; magnitude
    exponent chains split at Kx (bins 189 / 217)."""
    k = Ss
    while k <= Se:
        s0 = 3 * (k - 1)
        if dec.decode(acst, s0):
            break                        # end of block
        while dec.decode(acst, s0 + 1) == 0:
            k += 1
            s0 += 3
            if k > Se:
                raise ValueError(
                    "corrupt JPEG: arithmetic AC run past band end")
        sign = dec.decode(fixed, 0)
        st = s0 + 2
        m = dec.decode(acst, st)
        if m and dec.decode(acst, st):
            m = 2
            st = 189 if k <= kx else 217
            while dec.decode(acst, st):
                m <<= 1
                if m == 0x8000:
                    raise ValueError(
                        "corrupt JPEG: arithmetic AC magnitude "
                        "overflow")
                st += 1
        v = m
        st += 14
        m >>= 1
        while m:
            if dec.decode(acst, st):
                v |= m
            m >>= 1
        v += 1
        row[k] = (-v if sign else v) << Al
        k += 1


def _ac_refine(dec: _ArithState, acst: bytearray, fixed: bytearray,
               row, Ss: int, Se: int, Al: int) -> None:
    """Successive-approximation AC refinement (G.2): correction bit
    for each previously-nonzero coefficient, newly-nonzero insertion
    with fixed-bin sign, EOB decision only beyond the last history
    coefficient."""
    p1 = 1 << Al
    m1 = -1 << Al
    kex = Se
    while kex > 0 and row[kex] == 0:
        kex -= 1
    k = Ss
    while k <= Se:
        s0 = 3 * (k - 1)
        if k > kex and dec.decode(acst, s0):
            break
        while True:
            coef = row[k]
            if coef:
                if dec.decode(acst, s0 + 2):
                    row[k] = coef + (m1 if coef < 0 else p1)
                break
            if dec.decode(acst, s0 + 1):
                row[k] = m1 if dec.decode(fixed, 0) else p1
                break
            s0 += 3
            k += 1
            if k > Se:
                raise ValueError(
                    "corrupt JPEG: arithmetic AC refinement past "
                    "band end")
        k += 1


def decode_scan_arith(segs, comps, n_units, units_per_seg,
                      Ss, Se, Ah, Al, mode, dc_cond, ac_cond) -> None:
    """Arithmetic twin of `_decode_scan`: entropy-decode one scan into
    the components' coefficient grids.

    comps: list of (coef (n_blocks, 64) int32, didx (n_units, nb)
    padded-grid block indices, dc table id, ac table id). dc_cond maps
    DC table id -> (L, U); ac_cond maps AC table id -> Kx. Statistics
    areas, DC conditioning contexts and DC predictors all reset at
    scan start and at every restart boundary (F.1.4.1.1). Coefficient
    rows are zigzag-ordered, matching _jpeg.py's grids."""
    unit = 0
    for seg in segs:
        if unit >= n_units:
            break
        dec = _ArithState(seg)
        dc_stats = {}
        ac_stats = {}
        fixed = bytearray([113])
        ctx = [0] * len(comps)
        preds = [0] * len(comps)
        for _, _, td, ta in comps:
            if td is not None and td not in dc_stats:
                dc_stats[td] = bytearray(64)
            if ta is not None and ta not in ac_stats:
                ac_stats[ta] = bytearray(256)
        seg_end = min(n_units, unit + units_per_seg)
        while unit < seg_end:
            for ci, (co, didx, td, ta) in enumerate(comps):
                row_ids = didx[unit]
                if mode == "seq":
                    dcst = dc_stats[td]
                    acst = ac_stats[ta]
                    lu = dc_cond[td]
                    kx = ac_cond[ta]
                    for idx in row_ids:
                        preds[ci] += _dc_diff(dec, dcst, ctx, ci, lu)
                        row = co[idx]
                        row[0] = preds[ci]
                        _ac_band(dec, acst, fixed, row,
                                 1, 63, kx, 0)
                elif mode == "dc_first":
                    dcst = dc_stats[td]
                    lu = dc_cond[td]
                    for idx in row_ids:
                        preds[ci] += _dc_diff(dec, dcst, ctx, ci, lu)
                        co[idx, 0] = preds[ci] << Al
                elif mode == "dc_refine":
                    for idx in row_ids:
                        if dec.decode(fixed, 0):
                            co[idx, 0] |= 1 << Al
                elif mode == "ac_first":
                    _ac_band(dec, ac_stats[ta], fixed,
                             co[row_ids[0]], Ss, Se, ac_cond[ta], Al)
                else:                    # ac_refine
                    _ac_refine(dec, ac_stats[ta], fixed,
                               co[row_ids[0]], Ss, Se, Al)
            unit += 1
    if unit < n_units:
        raise ValueError("corrupt JPEG: scan ended before the last unit")
