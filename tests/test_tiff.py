"""TIFF decode tests: a test-side writer builds every supported shape
(strips/tiles, chunky/planar, none/LZW/deflate/PackBits, predictor 2,
1/4/8/16-bit, gray/palette/RGB/alpha, II/MM) from planted arrays for
value-exact checks, plus a hand-computed LZW bitstream vector so the
decoder is not validated solely against the test encoder's mirror."""

import struct
import zlib

import numpy as np
import pytest

from tbl_spark.pipelines._tiff import (
    _lzw_decode,
    _packbits_decode,
    decode_tiff,
)
from tbl_spark.pipelines.multimodal import decode_image


# ---------------------------------------------------------------- writer

def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (MSB-first, early change) for fixtures."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    omega = b""
    for b in data:
        cand = omega + bytes([b])
        if cand in table:
            omega = cand
            continue
        emit(table[omega], width)
        table[cand] = next_code
        next_code += 1
        # early change: the WIDTH of the next emitted code grows as soon
        # as the next code to assign is the top code of this width
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:            # table full: restart
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        omega = bytes([b])
    if omega:
        emit(table[omega], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (j < n and j - i < 128
                   and not (j + 1 < n and data[j + 1] == data[j])):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _compress(data: bytes, comp: int) -> bytes:
    if comp == 1:
        return data
    if comp == 5:
        return _lzw_encode(data)
    if comp == 8:
        return zlib.compress(data)
    if comp == 32773:
        return _packbits_encode(data)
    raise AssertionError(comp)


def _tiff(w, h, strips, tags_extra=None, bo="<", comp=1, photo=1,
          spp=1, depth=8, rps=None, planar=1, predictor=1,
          tiled=False, tw=None, th=None):
    """Assemble a TIFF file: `strips` is the list of (already raw)
    per-strip/tile byte payloads, compressed here."""
    blobs = [_compress(s, comp) for s in strips]
    entries = {
        256: (4, [w]), 257: (4, [h]), 258: (3, [depth] * spp),
        259: (3, [comp]), 262: (3, [photo]), 277: (3, [spp]),
        284: (3, [planar]), 317: (3, [predictor]),
    }
    if tiled:
        entries[322] = (4, [tw])
        entries[323] = (4, [th])
        off_tag, cnt_tag = 324, 325
    else:
        entries[278] = (4, [rps if rps else h])
        off_tag, cnt_tag = 273, 279
    if tags_extra:
        entries.update(tags_extra)

    # layout: header(8) | IFD | tag overflow | strip data
    n_e = len(entries) + 2
    ifd_off = 8
    pos = ifd_off + 2 + 12 * n_e + 4
    overflow = bytearray()
    tsize = {3: 2, 4: 4}

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(bo + fmt, v) for v in vals)

    strip_offs = []
    data_pos = pos          # grows as overflow grows; fix up later
    # first compute overflow for fixed tags, then strip offsets
    fixed = sorted(entries.items())
    raw_entries = []
    for tag, (typ, vals) in fixed:
        vb = value_bytes(typ, vals)
        if len(vb) <= 4:
            raw_entries.append((tag, typ, len(vals), vb.ljust(4, b"\0")))
        else:
            raw_entries.append((tag, typ, len(vals),
                                struct.pack(bo + "I", pos + len(overflow))))
            overflow += vb
    # strip offset/count arrays (placed in overflow when > 1 entry)
    data_pos = pos + len(overflow) \
        + (8 * len(blobs) if len(blobs) > 1 else 0)
    cur = data_pos
    for b in blobs:
        strip_offs.append(cur)
        cur += len(b)
    for tag, vals in ((off_tag, strip_offs),
                      (cnt_tag, [len(b) for b in blobs])):
        vb = value_bytes(4, vals)
        if len(vb) <= 4:
            raw_entries.append((tag, 4, len(vals), vb.ljust(4, b"\0")))
        else:
            raw_entries.append((tag, 4, len(vals),
                                struct.pack(bo + "I", pos + len(overflow))))
            overflow += vb
    raw_entries.sort()
    ifd = struct.pack(bo + "H", n_e)
    for tag, typ, cnt, vb in raw_entries:
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + vb
    ifd += struct.pack(bo + "I", 0)
    head = (b"II*\0" if bo == "<" else b"MM\0*")
    head += struct.pack(bo + "I", ifd_off)
    return head + ifd + bytes(overflow) + b"".join(blobs)


# ----------------------------------------------------------------- tests

def test_lzw_hand_computed_vector():
    # codes 256,7,258,8,257 at 9 bits = LZW of [7,7,7,8]: validates bit
    # order / clear / EOI / table growth independently of the encoder
    codes = [256, 7, 258, 8, 257]
    acc, nbits, out = 0, 0, bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert _lzw_decode(bytes(out), 100) == bytes([7, 7, 7, 8])


def test_lzw_roundtrip_crosses_width_boundaries():
    rng = np.random.default_rng(3)
    # enough distinct pairs to push the table past 511 and 1023 entries
    data = rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data), len(data)) == data
    runs = (b"a" * 500 + b"b" * 500) * 40
    assert _lzw_decode(_lzw_encode(runs), len(runs)) == runs


def test_packbits_roundtrip():
    rng = np.random.default_rng(4)
    data = (rng.integers(0, 3, 5_000, dtype=np.uint8)).tobytes()
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
@pytest.mark.parametrize("bo", ["<", ">"])
def test_rgb_strips_all_compressions(comp, bo):
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    strips = [px[i:i + 4].tobytes() for i in range(0, 10, 4)]
    blob = _tiff(7, 10, strips, bo=bo, comp=comp, photo=2, spp=3, rps=4)
    assert np.array_equal(decode_tiff(blob), px)


def test_decode_image_routes_tiff():
    px = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    blob = _tiff(5, 4, [px.tobytes()], photo=2, spp=3)
    assert np.array_equal(decode_image(blob, 0, 0), px)


def test_gray_depths_and_whiteiszero():
    # 8-bit gray replicates to RGB
    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    blob = _tiff(6, 4, [g.tobytes()], photo=1)
    assert np.array_equal(decode_tiff(blob), np.repeat(g[:, :, None], 3, 2))
    # WhiteIsZero inverts
    blob = _tiff(6, 4, [g.tobytes()], photo=0)
    assert np.array_equal(decode_tiff(blob),
                          np.repeat((255 - g)[:, :, None], 3, 2))
    # 1-bit gray, range-expanded, row-padded to byte boundary
    bits = np.array([[1, 0, 1, 0, 1, 1, 0, 0, 1, 1]] * 3, dtype=np.uint8)
    rows = np.packbits(bits, axis=1)
    blob = _tiff(10, 3, [rows.tobytes()], photo=1, depth=1)
    exp = np.repeat((bits * 255)[:, :, None], 3, 2)
    assert np.array_equal(decode_tiff(blob), exp)
    # 4-bit gray
    q = np.array([[15, 0, 7, 8, 3]] * 2, dtype=np.uint8)
    packed = np.packbits(
        np.unpackbits(q[:, :, None], axis=2, count=8)[:, :, 4:]
        .reshape(2, -1), axis=1)
    blob = _tiff(5, 2, [packed.tobytes()], photo=1, depth=4)
    assert np.array_equal(decode_tiff(blob),
                          np.repeat((q * 17)[:, :, None], 3, 2))


def test_16bit_gray_scales_round_nearest():
    v = np.array([[0, 257, 65535, 32768]], dtype=np.uint16)
    for bo in ("<", ">"):
        raw = v.astype(np.dtype("u2").newbyteorder(bo)).tobytes()
        blob = _tiff(4, 1, [raw], bo=bo, photo=1, depth=16)
        exp = ((v.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
        assert np.array_equal(decode_tiff(blob)[:, :, 0], exp)


def test_palette_maps_16bit_colormap():
    idx = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    cmap = []
    for chan in range(3):
        cmap += [((i * 100 + chan) % 256) * 257 for i in range(256)]
    blob = _tiff(4, 1, [idx.tobytes()], photo=3,
                 tags_extra={320: (3, cmap)})
    got = decode_tiff(blob)
    exp = np.array([[[(i * 100 + c) % 256 for c in range(3)]
                     for i in range(4)]], dtype=np.uint8)
    assert np.array_equal(got, exp)


def test_predictor2_8_and_16bit():
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    diff = px.astype(np.int16)
    diff[:, 1:] = diff[:, 1:] - diff[:, :-1]
    raw = (diff.astype(np.uint8)).tobytes()
    blob = _tiff(9, 5, [raw], photo=2, spp=3, predictor=2, comp=5)
    assert np.array_equal(decode_tiff(blob), px)
    # 16-bit gray with predictor, big-endian
    v = rng.integers(0, 65536, (3, 8), dtype=np.uint16)
    d = v.astype(np.int32)
    d[:, 1:] = d[:, 1:] - d[:, :-1]
    raw = d.astype(np.uint16).astype(np.dtype("u2").newbyteorder(">")) \
        .tobytes()
    blob = _tiff(8, 3, [raw], bo=">", photo=1, depth=16, predictor=2)
    exp = ((v.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(decode_tiff(blob)[:, :, 0], exp)


def test_planar_rgb():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    # planar: one strip per plane (RowsPerStrip = h)
    strips = [px[:, :, p].tobytes() for p in range(3)]
    blob = _tiff(5, 6, strips, photo=2, spp=3, planar=2, comp=32773)
    assert np.array_equal(decode_tiff(blob), px)


def test_tiles_with_edge_padding():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (20, 25, 3), dtype=np.uint8)
    tw = th = 16
    tiles = []
    for ty in range(0, 20, th):
        for tx in range(0, 25, tw):
            tile = np.zeros((th, tw, 3), dtype=np.uint8)
            sub = px[ty:ty + th, tx:tx + tw]
            tile[:sub.shape[0], :sub.shape[1]] = sub
            tiles.append(tile.tobytes())
    blob = _tiff(25, 20, tiles, photo=2, spp=3, comp=8,
                 tiled=True, tw=tw, th=th)
    assert np.array_equal(decode_tiff(blob), px)


def test_alpha_extra_samples_dropped():
    rng = np.random.default_rng(9)
    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    blob = _tiff(4, 3, [rgba.tobytes()], photo=2, spp=4,
                 tags_extra={338: (3, [2])})
    assert np.array_equal(decode_tiff(blob), rgba[:, :, :3])


def test_non_tiff_returns_none_corrupt_raises():
    assert decode_tiff(b"NOPE" * 10) is None
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = _tiff(4, 4, [px.tobytes()], photo=2, spp=3)
    # truncate the strip
    with pytest.raises(ValueError):
        decode_tiff(blob[:-10])
    # unsupported compression id
    bad = _tiff(4, 4, [px.tobytes()], photo=2, spp=3)
    bad = bytearray(bad)
    # find compression tag (259) and corrupt its value
    for i in range(8 + 2, len(bad), 12):
        if struct.unpack_from("<H", bad, i)[0] == 259:
            struct.pack_into("<H", bad, i + 8, 4)      # CCITT: unsupported
            break
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))


# ---------------------------------------------------------------------------
# JPEG-in-TIFF (compression 7, TIFF TechNote 2) — libtiff conformance


import pathlib  # noqa: E402

_JT_DATA = pathlib.Path(__file__).parent / "data" / "jpegtiff"


def _read_ref_rgb(path):
    b = pathlib.Path(path).read_bytes()
    w, h = struct.unpack_from("<2H", b, 0)
    return np.frombuffer(b, np.uint8, w * h * 3, 4).reshape(h, w, 3)


@pytest.mark.parametrize("case,strict", [
    (0, True),    # gray strips
    (1, True),    # color 1x1 strips + JPEGTables
    (2, False),   # color 2x2 strips: libtiff reads with fancy
                  # (triangular) upsampling, this decoder replicates
    (3, True),    # color 1x1 tiles incl. partial edge tiles
])
def test_jpeg_in_tiff_vs_libtiff(case, strict):
    payload = (_JT_DATA / f"case{case}.tif").read_bytes()
    px = decode_tiff(payload)
    ref = _read_ref_rgb(_JT_DATA / f"case{case}.rgb")
    assert px.shape == ref.shape
    diff = np.abs(px.astype(np.int32) - ref.astype(np.int32))
    if strict:
        # entropy+tables path exact; residual is IDCT rounding
        assert diff.mean() < 0.5 and diff.max() <= 4
    else:
        assert diff.mean() < 16 and diff.max() <= 128


def test_jpeg_in_tiff_has_abbreviated_streams():
    # the fixture really exercises the JPEGTables merge: tag 347
    # present and the first strip is NOT a self-contained JPEG (no DQT)
    payload = (_JT_DATA / "case1.tif").read_bytes()
    from tbl_spark.pipelines._tiff import _read_ifd
    bo = "<" if payload[:2] == b"II" else ">"
    (off,) = struct.unpack_from(bo + "I", payload, 4)
    tags = _read_ifd(payload, off, bo)
    assert 347 in tags                      # JPEGTables
    o, c = int(tags[273][0]), int(tags[279][0])
    strip = payload[o:o + c]
    assert strip[:2] == b"\xff\xd8" and b"\xff\xdb" not in strip[:40]
    # decoding through the generic image path works too
    px = decode_image(payload, 0, 0)
    assert px.shape == (22, 33, 3)


def test_jpeg_in_tiff_gates():
    payload = bytearray((_JT_DATA / "case1.tif").read_bytes())
    # flip photometric (262) to 2 (raw RGB JPEG): explicit PIL gate
    bo = "<" if payload[:2] == b"II" else ">"
    (off,) = struct.unpack_from(bo + "I", payload, 4)
    (n,) = struct.unpack_from(bo + "H", payload, off)
    for i in range(n):
        e = off + 2 + 12 * i
        if struct.unpack_from(bo + "H", payload, e)[0] == 262:
            struct.pack_into(bo + "H", payload, e + 8, 2)
            break
    with pytest.raises(NotImplementedError, match="photometric 2"):
        decode_tiff(bytes(payload))
