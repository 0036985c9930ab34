"""GIF decode tests (GIF87a/89a, LZW, interlace, animation).

A test-side GIF muxer with its own greedy dictionary LZW compressor
(written from the spec, independent of the decoder's table walk)
builds containers from planted index arrays + palettes, so decode is
checked value-exact including dictionary growth across code widths,
the KwKwK case, the 4096-entry cap, interlace reordering, local
palettes, transparency compositing and disposal methods.
"""

import struct

import numpy as np
import pytest

from tbl_spark.pipelines._gif import (_lzw_decode, decode_gif_frames,
                                      parse_gif)
from tbl_spark.pipelines._video import decode_video_frames, probe_video
from tbl_spark.pipelines.multimodal import decode_image, decode_video

# ---------------------------------------------------------------------------
# test-side LZW compressor + muxer


def lzw_encode(indices, mcs: int) -> bytes:
    """Spec-formula GIF LZW: greedy longest-match dictionary, clear
    code first, code width grows when next_code exceeds the current
    width's range, dictionary capped at 4096."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n_acc = 0

    state = {"width": mcs + 1}

    def emit(code):
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += state["width"]
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    emit(clear)
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    seq = ()
    for sym in map(int, indices):
        cand = seq + (sym,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << state["width"]) + 1 \
                    and state["width"] < 12:
                state["width"] += 1
        seq = (sym,)
    if seq:
        emit(table[seq])
    emit(eoi)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def mux_gif(W, H, frames, gct=None, bg=0, version=b"89a"):
    """frames: list of dicts {idx (h, w) uint8, x, y, lct, interlaced,
    transparent, disposal, mcs}."""
    flags = 0
    body = bytearray(b"GIF" + version)
    if gct is not None:
        depth = max(1, int(len(gct) - 1).bit_length())
        assert len(gct) == 1 << depth
        flags = 0x80 | (depth - 1)
    body += struct.pack("<HHBBB", W, H, flags, bg, 0)
    if gct is not None:
        body += gct.astype(np.uint8).tobytes()
    for f in frames:
        idx = f["idx"]
        if f.get("transparent") is not None or f.get("disposal"):
            gflags = ((f.get("disposal", 0) & 7) << 2) \
                | (1 if f.get("transparent") is not None else 0)
            body += bytes([0x21, 0xF9, 4, gflags, 0, 0,
                           f.get("transparent") or 0, 0])
        h, w = idx.shape
        iflags = 0
        lct = f.get("lct")
        if lct is not None:
            depth = max(1, int(len(lct) - 1).bit_length())
            iflags |= 0x80 | (depth - 1)
        if f.get("interlaced"):
            iflags |= 0x40
        body += bytes([0x2C]) + struct.pack(
            "<HHHHB", f.get("x", 0), f.get("y", 0), w, h, iflags)
        if lct is not None:
            body += lct.astype(np.uint8).tobytes()
        rows = idx
        if f.get("interlaced"):        # store rows in pass order
            parts = [idx[y0::dy] for y0, dy in _INTERLACE_PASSES]
            rows = np.vstack(parts)
        mcs = f.get("mcs", max(2, int(rows.max(initial=1)).bit_length()))
        body += bytes([mcs]) + _blocks(lzw_encode(rows.reshape(-1), mcs))
    body += bytes([0x3B])
    return bytes(body)


# ---------------------------------------------------------------------------
# LZW kernel


@pytest.mark.parametrize("mcs,n,vocab", [(2, 40, 4), (3, 5000, 8),
                                         (8, 20000, 256), (4, 1, 16)])
def test_lzw_roundtrip(mcs, n, vocab):
    rng = np.random.default_rng(mcs * 100 + n)
    data = rng.integers(0, vocab, n).astype(np.uint8)
    got = _lzw_decode(lzw_encode(data, mcs), mcs, n)
    assert np.array_equal(got, data)


def test_lzw_kwkwk_and_cap():
    # 'abababab…' drives the classic code==next_code case immediately
    data = np.tile(np.array([1, 0], np.uint8), 50)
    assert np.array_equal(_lzw_decode(lzw_encode(data, 2), 2, 100), data)
    # long low-entropy stream pushes the dictionary past several width
    # bumps and into the 4096 cap
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, 120_000).astype(np.uint8)
    assert np.array_equal(
        _lzw_decode(lzw_encode(data, 2), 2, len(data)), data)


def test_lzw_corrupt():
    with pytest.raises(ValueError, match="exhausted"):
        _lzw_decode(b"\x00", 2, 100)
    with pytest.raises(ValueError, match="min code size"):
        _lzw_decode(b"\x00\x00", 1, 4)


# ---------------------------------------------------------------------------
# container decode


def test_gif_single_frame_exact_and_image_path():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (11, 7)).astype(np.uint8)
    payload = mux_gif(7, 11, [{"idx": idx}], gct=pal)
    ids, px = decode_gif_frames(payload)
    assert ids == [0] and np.array_equal(px[0], pal[idx])
    # decode_image routes GIF magic to the poster frame
    assert np.array_equal(decode_image(payload, 0, 0), pal[idx])
    # 87a variant parses identically
    p87 = mux_gif(7, 11, [{"idx": idx}], gct=pal, version=b"87a")
    assert np.array_equal(decode_gif_frames(p87)[1][0], pal[idx])


def test_gif_interlaced_and_local_palette():
    rng = np.random.default_rng(9)
    gct = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    lct = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (13, 6)).astype(np.uint8)
    payload = mux_gif(6, 13, [{"idx": idx, "lct": lct,
                               "interlaced": True}], gct=gct)
    _, px = decode_gif_frames(payload)
    assert np.array_equal(px[0], lct[idx])   # local table wins


def test_gif_animation_compositing_disposal():
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250],
                    [9, 9, 9]], np.uint8)
    base = np.zeros((8, 8), np.uint8)            # all red
    patch = np.full((4, 4), 1, np.uint8)         # green block
    patch[0, 0] = 3                              # transparent corner
    third = np.full((2, 2), 2, np.uint8)         # blue block
    payload = mux_gif(8, 8, [
        {"idx": base, "disposal": 1},
        {"idx": patch, "x": 2, "y": 2, "transparent": 3, "disposal": 3},
        {"idx": third, "x": 0, "y": 0, "disposal": 0},
    ], gct=pal)
    ids, px = decode_gif_frames(payload)
    assert ids == [0, 1, 2]
    f0, f1, f2 = px
    assert (f0 == pal[0]).all()
    # frame 1: green patch over red, transparent corner keeps red
    assert (f1[2:6, 2:6][1:, 1:] == pal[1]).all()
    assert (f1[2, 2] == pal[0]).all()
    assert (f1[0, 0] == pal[0]).all()
    # frame 2: disposal 3 restored frame 0 before drawing the blue block
    assert (f2[0:2, 0:2] == pal[2]).all()
    assert (f2[2:6, 2:6] == pal[0]).all()       # patch gone
    # seek: frame 2 alone composites identically
    ids2, px2 = decode_gif_frames(payload, [2])
    assert ids2 == [2] and np.array_equal(px2[0], f2)


def test_gif_disposal_background():
    pal = np.array([[200, 0, 0], [0, 200, 0]], np.uint8)
    a = np.ones((4, 4), np.uint8)
    b = np.ones((2, 2), np.uint8)
    payload = mux_gif(4, 4, [
        {"idx": a, "disposal": 2},               # restore to background
        {"idx": b, "x": 2, "y": 2},
    ], gct=pal, bg=0)
    _, px = decode_gif_frames(payload)
    # after frame 0's disposal the canvas is background red; frame 1
    # draws green only in its 2x2 region
    assert (px[1][2:4, 2:4] == pal[1]).all()
    assert (px[1][0:2, 0:2] == pal[0]).all()


def test_gif_as_video_tier():
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [{"idx": rng.integers(0, 8, (6, 5)).astype(np.uint8)}
              for _ in range(4)]
    payload = mux_gif(5, 6, frames, gct=pal)
    meta = probe_video(payload)
    assert meta["format"] == "gif" and meta["n_frames"] == 4
    assert (meta["width"], meta["height"]) == (5, 6)
    ids, px = decode_video_frames(payload, [3, 1])
    assert ids == [3, 1]
    # frames are full-canvas opaque draws here, so each equals its own
    # palette mapping regardless of compositing history
    assert np.array_equal(px[0], pal[frames[3]["idx"]])
    assert np.array_equal(px[1], pal[frames[1]["idx"]])
    # and through the multimodal surface
    ids3, px3 = decode_video(payload, [2])
    assert ids3 == [2] and np.array_equal(px3[0], pal[frames[2]["idx"]])


def test_gif_corrupt_gates():
    pal = np.zeros((2, 3), np.uint8)
    idx = np.zeros((2, 2), np.uint8)
    good = mux_gif(2, 2, [{"idx": idx}], gct=pal)
    assert parse_gif(b"NOTGIF...") is None
    with pytest.raises(ValueError, match="truncated|unterminated"):
        decode_gif_frames(good[:-4])
    with pytest.raises(ValueError, match="unknown block"):
        decode_gif_frames(good[:-1] + b"\x7f" + good[-1:])
    # palette index out of range: frame says 4 colors, palette has 2
    bad_idx = np.full((2, 2), 3, np.uint8)
    bad = mux_gif(2, 2, [{"idx": bad_idx, "mcs": 2}], gct=pal)
    with pytest.raises(ValueError, match="palette index"):
        decode_gif_frames(bad)
