"""Pure-numpy baseline TIFF decoder (TIFF 6.0 — public Adobe spec).

Scope: the first IFD (the "poster" image), strip or tile organization,
chunky or planar sample layout, compression none(1) / LZW(5) /
Deflate(8, 32946) / PackBits(32773) / JPEG(7, TIFF TechNote 2:
abbreviated streams merged with the JPEGTables tag and decoded by
_jpeg.py — libtiff-conformance-tested), photometric WhiteIsZero(0) /
BlackIsZero(1) / RGB(2) / Palette(3) / YCbCr(6, JPEG only), bit
depths 1/2/4/8/16 per sample,
the horizontal-differencing predictor(2), FillOrder(2), and extra/alpha
samples (dropped). Output mirrors the sibling PNG decoder's channel
contract in multimodal.py: (H, W, 3) uint8, 16-bit samples scaled with
exact round-to-nearest (v*255/65535), sub-byte grayscale range-expanded,
palette mapped, corrupt input -> ValueError, non-TIFF magic -> None.

TIFF LZW is the MSB-first variable-width (9..12 bit) variant WITH the
spec's "early change": the code width bumps when the NEXT table entry to
be assigned is (1 << width) - 1 — one code earlier than the GIF variant
in _gif.py (TIFF 6.0 §13; this matches libtiff's reader). Kept separate
from the GIF LZW because the two differ in bit order, width schedule and
clear/EOI layout — sharing a loop would tangle both.

The reference repo (paradigmxyz/tbl) has no media decode path; this
module extends the LLM-pipeline multimodal tier (SURVEY.md §2 additions)
the same way _jpeg.py/_gif.py do.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGICS = (b"II*\x00", b"MM\x00*")
_MAX_DIM = 1 << 15
_MAX_PIXELS = 1 << 26


def _lzw_decode(data: bytes, cap: int) -> bytes:
    """TIFF-variant LZW (MSB-first, early change). `cap` bounds the
    output (the expected decompressed strip size) so a corrupt stream
    cannot balloon."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("corrupt TIFF: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt TIFF: LZW code out of range")
            out += entry
            if len(out) > cap:
                raise ValueError("corrupt TIFF: LZW output exceeds strip")
            prev = entry
            # early change, reader side: the writer widens as soon as
            # the code it assigns reaches (1 << width) - 1, and the
            # reader's table LAGS the writer's by exactly one entry (an
            # entry completes only when the next code reveals its first
            # byte) — so the reader widens one entry earlier than its
            # own table size suggests (libtiff-compatible; verified by
            # the width-desync trace in test_tiff.py)
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _packbits_decode(data: bytes, cap: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < cap:
        c = data[i]
        i += 1
        if c == 128:
            continue
        if c < 128:
            lit = data[i:i + c + 1]
            if len(lit) != c + 1:
                raise ValueError("corrupt TIFF: PackBits literal cut off")
            out += lit
            i += c + 1
        else:
            if i >= n:
                raise ValueError("corrupt TIFF: PackBits run cut off")
            out += data[i:i + 1] * (257 - c)
            i += 1
    return bytes(out)


def _decompress(data: bytes, comp: int, cap: int) -> bytes:
    if comp == 1:
        return data
    if comp == 5:
        return _lzw_decode(data, cap)
    if comp in (8, 32946):
        try:
            return zlib.decompress(data)
        except zlib.error as e:
            raise ValueError(f"corrupt TIFF: bad deflate strip: {e}")
    if comp == 32773:
        return _packbits_decode(data, cap)
    raise ValueError(f"unsupported TIFF compression {comp} "
                     "(supported: none, LZW, deflate, PackBits, JPEG)")


_INLINE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}


def _decode_jpeg_unit(payload: bytes, o: int, c: int,
                      jpeg_tables: bytes | None) -> np.ndarray:
    """One compression-7 strip/tile → (h, w, 3) uint8 via the JPEG
    decoder. Abbreviated streams (TIFF TechNote 2) carry their tables
    in the JPEGTables tag: that blob is SOI..tables..EOI, the unit is
    SOI..scan..EOI, and the full stream is the concatenation with the
    boundary markers dropped."""
    from ._jpeg import decode_jpeg
    unit = payload[o:o + c]
    if jpeg_tables is not None and len(jpeg_tables) >= 4:
        if unit[:2] != b"\xff\xd8":
            raise ValueError("corrupt TIFF: JPEG strip without SOI")
        unit = jpeg_tables[:-2] + unit[2:]
    px = decode_jpeg(unit)
    if px is None:
        raise ValueError("corrupt TIFF: compression-7 strip is not a "
                         "JPEG stream")
    return px


def _read_ifd(buf: bytes, off: int, bo: str) -> dict[int, np.ndarray]:
    """tag -> int64 value array for the IFD at `off` (count-checked)."""
    if off + 2 > len(buf):
        raise ValueError("corrupt TIFF: IFD offset past EOF")
    (n_entries,) = struct.unpack_from(bo + "H", buf, off)
    tags: dict[int, np.ndarray] = {}
    dt_of = {1: "u1", 3: "u2", 4: "u4", 6: "i1", 7: "u1",
             8: "i2", 9: "i4"}
    for i in range(n_entries):
        e = off + 2 + 12 * i
        if e + 12 > len(buf):
            raise ValueError("corrupt TIFF: IFD entry past EOF")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, e)
        if typ not in dt_of:
            continue                      # rationals etc: not needed
        size = _INLINE_SIZE[typ] * cnt
        src = e + 8 if size <= 4 else struct.unpack_from(bo + "I",
                                                         buf, e + 8)[0]
        if src + size > len(buf):
            raise ValueError("corrupt TIFF: tag value past EOF")
        dt = np.dtype(dt_of[typ]).newbyteorder("<" if bo == "<" else ">")
        tags[tag] = np.frombuffer(buf, dtype=dt, count=cnt,
                                  offset=src).astype(np.int64)
    return tags


def _tag1(tags: dict, tag: int, default: int | None = None) -> int:
    v = tags.get(tag)
    if v is None or len(v) == 0:
        if default is None:
            raise ValueError(f"corrupt TIFF: required tag {tag} missing")
        return default
    return int(v[0])


def _samples(rows: np.ndarray, w: int, ch: int, depth: int,
             bo: str) -> np.ndarray:
    """(h, stride) plane/row bytes -> (h, w, ch) uint8 samples (16-bit
    scaled to 8 exactly, sub-byte unpacked to raw values)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :w * ch].reshape(h, w, ch)
    if depth == 16:
        dt = np.dtype("u2").newbyteorder(bo)
        v = rows[:, :w * ch * 2].reshape(h, -1).view(dt)[:, :w * ch]
        v = v.astype(np.uint32).reshape(h, w, ch)
        return ((v * 255 + 32767) // 65535).astype(np.uint8)
    bits = np.unpackbits(rows, axis=1)[:, :w * ch * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits.reshape(h, w * ch, depth) @ weights).reshape(h, w, ch)


def _undo_predictor(rows: np.ndarray, w: int, ch: int, depth: int,
                    bo: str) -> np.ndarray:
    """Horizontal differencing (predictor 2) inverse, in sample space."""
    h = rows.shape[0]
    if depth == 8:
        px = rows[:, :w * ch].reshape(h, w, ch)
        return np.cumsum(px, axis=1, dtype=np.uint64).astype(
            np.uint8).reshape(h, w * ch)
    if depth == 16:
        dt = np.dtype("u2").newbyteorder(bo)
        v = rows[:, :w * ch * 2].reshape(h, -1).view(dt)[:, :w * ch]
        v = v.astype(np.uint64).reshape(h, w, ch)
        acc = np.cumsum(v, axis=1).astype("u2").reshape(h, w * ch)
        return np.ascontiguousarray(
            acc.astype(dt, copy=False)).view(np.uint8).reshape(h, -1)
    raise ValueError("corrupt TIFF: predictor 2 with sub-byte depth")


def decode_tiff(payload: bytes) -> np.ndarray | None:
    """(H, W, 3) uint8 pixels, or None when the magic is not TIFF."""
    if len(payload) < 8 or payload[:4] not in _MAGICS:
        return None
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    tags = _read_ifd(payload, ifd_off, bo)

    w = _tag1(tags, 256)
    h = _tag1(tags, 257)
    if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM
            and w * h <= _MAX_PIXELS):
        raise ValueError("corrupt TIFF: unreasonable dimensions")
    spp = _tag1(tags, 277, 1)
    bps = tags.get(258)
    depth = int(bps[0]) if bps is not None and len(bps) else 1
    if bps is not None and len(bps) and not (bps == depth).all():
        raise ValueError("unsupported TIFF: mixed bits-per-sample")
    comp = _tag1(tags, 259, 1)
    if depth not in (1, 2, 4, 8, 16) \
            and not (comp == 7 and depth == 12):
        raise ValueError(f"unsupported TIFF: {depth}-bit samples")
    photo = _tag1(tags, 262, 1)
    planar = _tag1(tags, 284, 1)
    predictor = _tag1(tags, 317, 1)
    fill_order = _tag1(tags, 266, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF: predictor {predictor}")
    if spp < 1 or spp > 8:
        raise ValueError("unsupported TIFF: samples-per-pixel")

    tiled = 322 in tags
    if tiled:
        tw, th = _tag1(tags, 322), _tag1(tags, 323)
        offs, cnts = tags.get(324), tags.get(325)
    else:
        tw, th = w, min(_tag1(tags, 278, h), h)
        offs, cnts = tags.get(273), tags.get(279)
    if offs is None or cnts is None or len(offs) != len(cnts):
        raise ValueError("corrupt TIFF: missing strip/tile layout tags")
    if not (0 < tw <= _MAX_DIM and 0 < th <= _MAX_DIM):
        raise ValueError("corrupt TIFF: unreasonable tile geometry")

    across = (w + tw - 1) // tw
    down = (h + th - 1) // th
    per_plane = across * down
    n_planes = spp if planar == 2 else 1
    ch_unit = 1 if planar == 2 else spp     # samples interleaved per unit
    if len(offs) < per_plane * n_planes:
        raise ValueError("corrupt TIFF: fewer strips/tiles than layout")

    if comp == 7:                       # TechNote 2: JPEG-in-TIFF
        if planar == 2:
            raise ValueError("unsupported TIFF: planar JPEG strips")
        if photo == 2:
            raise NotImplementedError(
                "TIFF with raw-RGB JPEG strips (photometric 2) needs "
                "an imaging library; the standard YCbCr (6) and "
                "grayscale (1) forms decode here")
        if photo not in (1, 6):
            raise ValueError(f"unsupported TIFF: photometric {photo} "
                             "with JPEG compression")
        jt = tags.get(347)
        jpeg_tables = bytes(jt.astype(np.uint8)) if jt is not None \
            else None
        rgb = np.zeros((h, w, 3), dtype=np.uint8)
        for t in range(per_plane):
            o, c = int(offs[t]), int(cnts[t])
            if o + c > len(payload):
                raise ValueError("corrupt TIFF: strip/tile past EOF")
            px = _decode_jpeg_unit(payload, o, c, jpeg_tables)
            ty, tx = (t // across) * th, (t % across) * tw
            vh = min(px.shape[0], h - ty)
            vw = min(px.shape[1], w - tx)
            rgb[ty:ty + vh, tx:tx + vw] = px[:vh, :vw]
        return np.ascontiguousarray(rgb)

    stride = (tw * ch_unit * depth + 7) // 8
    out = np.zeros((h, w, spp), dtype=np.uint8)
    for p in range(n_planes):
        for t in range(per_plane):
            o, c = int(offs[p * per_plane + t]), int(cnts[p * per_plane + t])
            if o + c > len(payload):
                raise ValueError("corrupt TIFF: strip/tile past EOF")
            ty, tx = (t // across) * th, (t % across) * tw
            rows_here = th if tiled else min(th, h - ty)
            cap = stride * rows_here
            raw = _decompress(payload[o:o + c], comp, cap)
            if len(raw) < cap:
                raise ValueError("corrupt TIFF: strip/tile shorter than "
                                 "its pixel layout requires")
            rows = np.frombuffer(raw, dtype=np.uint8,
                                 count=cap).reshape(rows_here, stride)
            if fill_order == 2:
                rows = np.unpackbits(rows, axis=1, bitorder="little")
                rows = np.packbits(rows, axis=1)
            if predictor == 2:
                rows = _undo_predictor(rows, tw, ch_unit, depth, bo)
            sub = _samples(rows, tw, ch_unit, depth, bo)
            vh = min(rows_here, h - ty)
            vw = min(tw, w - tx)
            if planar == 2:
                out[ty:ty + vh, tx:tx + vw, p] = sub[:vh, :vw, 0]
            else:
                out[ty:ty + vh, tx:tx + vw, :] = sub[:vh, :vw, :]

    # channel mapping (mirrors _decode_png's contract)
    if photo == 3:
        cmap = tags.get(320)
        if cmap is None or len(cmap) < 3 * (1 << depth):
            raise ValueError("corrupt TIFF: palette image without a "
                             "full ColorMap")
        n = 1 << depth
        pal = (np.stack([cmap[:n], cmap[n:2 * n], cmap[2 * n:3 * n]],
                        axis=1) >> 8).astype(np.uint8)
        idx = out[:, :, 0]
        return np.ascontiguousarray(pal[idx])
    if photo in (0, 1):
        px = out[:, :, :1]
        if depth < 8:
            px = px * np.uint8(255 // ((1 << depth) - 1))
        if photo == 0:
            px = 255 - px
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if photo == 2:
        if spp < 3:
            raise ValueError("corrupt TIFF: RGB with < 3 samples")
        return np.ascontiguousarray(out[:, :, :3])
    raise ValueError(f"unsupported TIFF: photometric {photo}")
