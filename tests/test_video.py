"""Video decode tests (MJPEG-in-AVI + YUV4MPEG2, pure numpy/stdlib).

Strategy mirrors test_jpeg.py: test-side *muxers* build AVI and y4m
containers from chosen frames; expected pixels come from independent
reference math (the naive-IDCT JPEG reference for AVI frames, a
separately-written BT.601 float conversion for y4m), so the container
walk + frame seek + decode path is checked value-exact with no video
library. The Annex K default-table path is exercised by a DHT-less
MJPEG encoder using canonical codes built independently of the
decoder's table-fill logic.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_jpeg import (_BitWriter, _encode_block, _rand_blocks,  # noqa: E402
                       _seg, encode_jpeg, ref_plane, ref_rgb)

from tbl_spark.pipelines import _video  # noqa: E402
from tbl_spark.pipelines._jpeg import _STD_HUFF_SPECS, ZIGZAG, decode_jpeg  # noqa: E402
from tbl_spark.pipelines._video import (decode_video_frames,  # noqa: E402
                                        probe_video)
from tbl_spark.pipelines.multimodal import (_image_features,  # noqa: E402
                                            decode_video,
                                            frame_sample_decoded)

# ---------------------------------------------------------------------------
# test-side muxers


def _chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def mux_avi(frames: list[bytes], W: int, H: int, fps: int = 10,
            with_idx1: bool = True, absolute_idx: bool = False,
            rec_list: bool = False) -> bytes:
    """Minimal MJPEG AVI: LIST hdrl (avih + strl) + LIST movi + idx1."""
    avih = struct.pack("<14I", int(1e6 / fps), 0, 0, 0x10, len(frames),
                       0, 1, 0, W, H, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), 0,
                          0, 0)
            + struct.pack("<4H", 0, 0, W, H))
    strf = struct.pack("<IiiHH4sIiiII", 40, W, H, 1, 24, b"MJPG",
                       W * H * 3, 0, 0, 0, 0)
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih)
                  + _chunk(b"LIST", b"strl" + _chunk(b"strh", strh)
                           + _chunk(b"strf", strf)))
    movi_body = b"movi"
    offsets = []                     # offset of each ckid vs 'movi' start
    for f in frames:
        offsets.append(len(movi_body))
        ck = _chunk(b"00dc", f)
        if rec_list:
            # each frame wrapped in a LIST 'rec ' grouping: the ckid
            # sits 12 bytes deeper ('LIST' + size + 'rec ')
            offsets[-1] += 12
            ck = _chunk(b"LIST", b"rec " + ck)
        movi_body += ck
    movi = _chunk(b"LIST", movi_body)

    riff_body = b"AVI " + hdrl + movi
    movi_fourcc_at = 12 + len(hdrl) + 8   # 'movi' pos in the whole file
    if with_idx1:
        idx = b""
        for off, f in zip(offsets, frames):
            o = (movi_fourcc_at + off) if absolute_idx else off
            idx += b"00dc" + struct.pack("<III", 0x10, o, len(f))
        riff_body += _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def mux_y4m(frames_yuv: list[tuple], W: int, H: int,
            chroma: bytes = b"420jpeg", fps=(25, 1),
            frame_params: bytes = b"") -> bytes:
    """frames_yuv: per frame (y, cb, cr) planes (cb/cr None for mono)."""
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        W, H, fps[0], fps[1], chroma)
    out = bytearray(head)
    for y, cb, cr in frames_yuv:
        out += b"FRAME" + frame_params + b"\n"
        out += y.astype(np.uint8).tobytes()
        if cb is not None:
            out += cb.astype(np.uint8).tobytes()
            out += cr.astype(np.uint8).tobytes()
    return bytes(out)


def ref_bt601(y, cb, cr):
    """Independent float BT.601 limited-range reference (the decoder
    uses the integer >>8 fixed-point form; they agree because the
    fixed-point recipe rounds via the +128 bias)."""
    c = y.astype(np.float64) - 16
    d = cb.astype(np.float64) - 128
    e = cr.astype(np.float64) - 128
    r = np.floor((298 * c + 409 * e + 128) / 256)
    g = np.floor((298 * c - 100 * d - 208 * e + 128) / 256)
    b = np.floor((298 * c + 516 * d + 128) / 256)
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def _upsample(p, H, W, xs, ys):
    return p[np.arange(H) >> ys][:, np.arange(W) >> xs]


# ---------------------------------------------------------------------------
# y4m


def test_y4m_444_exact_and_probe():
    rng = np.random.default_rng(7)
    W, H = 12, 8
    frames = [(rng.integers(0, 256, (H, W)), rng.integers(0, 256, (H, W)),
               rng.integers(0, 256, (H, W))) for _ in range(3)]
    payload = mux_y4m(frames, W, H, b"444", fps=(30, 1))
    meta = probe_video(payload)
    assert meta == {"format": "y4m", "n_frames": 3, "width": W,
                    "height": H, "fps": 30.0}
    idxs, px = decode_video_frames(payload)
    assert idxs == [0, 1, 2]
    for k, (y, cb, cr) in enumerate(frames):
        assert np.array_equal(px[k], ref_bt601(y, cb, cr))


@pytest.mark.parametrize("chroma,xs,ys", [
    (b"420jpeg", 1, 1), (b"420", 1, 1), (b"420mpeg2", 1, 1),
    (b"422", 1, 0),
])
def test_y4m_subsampled_exact(chroma, xs, ys):
    rng = np.random.default_rng(int(xs * 10 + ys))
    W, H = 16, 8
    y = rng.integers(0, 256, (H, W))
    cb = rng.integers(0, 256, (H >> ys, W >> xs))
    cr = rng.integers(0, 256, (H >> ys, W >> xs))
    payload = mux_y4m([(y, cb, cr)], W, H, chroma)
    _, px = decode_video_frames(payload)
    want = ref_bt601(y, _upsample(cb, H, W, xs, ys),
                     _upsample(cr, H, W, xs, ys))
    assert np.array_equal(px[0], want)


def test_y4m_mono_seek_and_corrupt():
    rng = np.random.default_rng(3)
    W, H = 6, 4
    frames = [(rng.integers(0, 256, (H, W)), None, None)
              for _ in range(5)]
    payload = mux_y4m(frames, W, H, b"mono", frame_params=b" Xtag")
    # seek decodes exactly the requested subset, order preserved
    idxs, px = decode_video_frames(payload, [3, 0])
    assert idxs == [3, 0]
    mid = np.full((H, W), 128, np.uint8)
    assert np.array_equal(px[0], ref_bt601(frames[3][0], mid, mid))
    # out-of-range indices are dropped, not errors
    assert decode_video_frames(payload, [99])[0] == []
    with pytest.raises(ValueError, match="truncated frame"):
        decode_video_frames(payload[:-1])
    with pytest.raises(NotImplementedError, match="colorspace"):
        decode_video_frames(mux_y4m(frames[:1], W, H, b"411"))
    with pytest.raises(ValueError, match="divisible"):
        # odd height with 420 chroma cannot be laid out
        decode_video_frames(b"YUV4MPEG2 W4 H3 F1:1 C420\n")


# ---------------------------------------------------------------------------
# AVI / MJPEG


def _gray_jpeg_frames(rng, W, H, n, q=8):
    """n single-component JPEGs + their reference pixel arrays."""
    mcus_x, mcus_y = -(-W // 8), -(-H // 8)
    qt = np.full((8, 8), q, np.int64)
    frames, refs = [], []
    for _ in range(n):
        blocks = _rand_blocks(rng, mcus_x * mcus_y, 1)
        frames.append(encode_jpeg([(1, 1, 0, blocks)], W, H, {0: qt}))
        plane = ref_plane(blocks, mcus_y, mcus_x, 1, 1, qt)[:H, :W]
        refs.append(np.repeat(plane[:, :, None], 3, axis=2))
    return frames, refs


@pytest.mark.parametrize("with_idx1,absolute_idx,rec_list", [
    (True, False, False), (True, True, False),
    (False, False, False), (False, False, True),
])
def test_avi_mjpeg_exact(with_idx1, absolute_idx, rec_list):
    rng = np.random.default_rng(11)
    W, H = 16, 8
    frames, refs = _gray_jpeg_frames(rng, W, H, 4)
    payload = mux_avi(frames, W, H, fps=10, with_idx1=with_idx1,
                      absolute_idx=absolute_idx, rec_list=rec_list)
    meta = probe_video(payload)
    assert meta["format"] == "avi" and meta["n_frames"] == 4
    assert (meta["width"], meta["height"], meta["fps"]) == (W, H, 10.0)
    idxs, px = decode_video_frames(payload)
    assert idxs == [0, 1, 2, 3]
    for k in range(4):
        assert np.array_equal(px[k], refs[k])


def test_avi_seek_decodes_only_requested(monkeypatch):
    rng = np.random.default_rng(5)
    frames, refs = _gray_jpeg_frames(rng, 8, 8, 6)
    payload = mux_avi(frames, 8, 8)
    calls = []

    def counting(buf, **kw):
        calls.append(1)
        return decode_jpeg(buf, **kw)

    monkeypatch.setattr(_video, "decode_jpeg", counting)
    idxs, px = decode_video_frames(payload, [4, 1])
    assert idxs == [4, 1] and len(calls) == 2
    assert np.array_equal(px[0], refs[4])
    assert np.array_equal(px[1], refs[1])


def test_avi_non_mjpeg_and_corrupt_gates():
    # a 'vids' stream whose frames are not JPEG -> explicit stub error
    payload = mux_avi([b"not-a-jpeg-frame"], 4, 4)
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_video_frames(payload)
    with pytest.raises(ValueError, match="truncated"):
        decode_video_frames(payload[:40])
    # a truncated MP4-identifying payload -> corrupt-input contract
    with pytest.raises(ValueError, match="corrupt MP4"):
        decode_video_frames(b"\x00\x00\x00 ftypisom....")
    # no parsed container at all -> None (caller's stub gate handles it)
    assert decode_video_frames(b"\x00\x00\x00\x08junkdata") is None
    assert probe_video(b"RIFF1234WAVE") is None


# ---------------------------------------------------------------------------
# Annex K default Huffman tables (the DHT-less MJPEG convention)


def _canon_maps(counts: bytes, symbols: bytes) -> dict:
    """Canonical (code, length) assignment straight from the DHT spec
    — written independently of the decoder's table-fill loop."""
    code, k, out = 0, 0, {}
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def test_annex_k_known_code_lengths():
    """Spot-check the embedded tables against code lengths stated in
    ITU-T T.81 Table K.3/K.5 (independent of any encode/decode pair)."""
    dc_luma = _canon_maps(*_STD_HUFF_SPECS[(0, 0)])
    assert dc_luma[0][1] == 2 and dc_luma[1][1] == 3 and \
        dc_luma[5][1] == 3 and dc_luma[6][1] == 4 and dc_luma[11][1] == 9
    ac_luma = _canon_maps(*_STD_HUFF_SPECS[(1, 0)])
    assert ac_luma[0x01][1] == 2 and ac_luma[0x02][1] == 2
    assert ac_luma[0x00][1] == 4          # EOB
    assert ac_luma[0xF0][1] == 11         # ZRL
    ac_chroma = _canon_maps(*_STD_HUFF_SPECS[(1, 1)])
    assert ac_chroma[0x00][1] == 2 and ac_chroma[0x01][1] == 2
    assert ac_chroma[0xF0][1] == 10       # ZRL (chroma: one bit shorter)
    dc_chroma = _canon_maps(*_STD_HUFF_SPECS[(0, 1)])
    assert dc_chroma[0][1] == 2 and dc_chroma[3][1] == 3


def _encode_jpeg_no_dht(blocks_per_comp, W, H, qt):
    """Interleaved 3-component 4:2:0 scan entropy-coded with the Annex K
    canonical codes, DHT segments omitted (the MJPEG convention)."""
    dc0 = _canon_maps(*_STD_HUFF_SPECS[(0, 0)])
    ac0 = _canon_maps(*_STD_HUFF_SPECS[(1, 0)])
    dc1 = _canon_maps(*_STD_HUFF_SPECS[(0, 1)])
    ac1 = _canon_maps(*_STD_HUFF_SPECS[(1, 1)])
    qz = qt.reshape(64)[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in qz))
    sof = struct.pack(">BHHB", 8, H, W, 3)
    samp = [(2, 2), (1, 1), (1, 1)]
    for i, (hs, vs) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0)
    out += _seg(0xC0, sof)
    sos = bytes([3])
    for i in range(3):
        td_ta = 0x00 if i == 0 else 0x11
        sos += struct.pack(">BB", i + 1, td_ta)
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    bw = _BitWriter()
    n_mcus = blocks_per_comp[0].shape[0]
    preds = [0, 0, 0]
    maps = [(dc0, ac0), (dc1, ac1), (dc1, ac1)]
    for m in range(n_mcus):
        for ci, blocks in enumerate(blocks_per_comp):
            for b in range(blocks.shape[1]):
                preds[ci] = _encode_block(bw, blocks[m, b], preds[ci],
                                          *maps[ci])
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_mjpeg_no_dht_decodes_with_default_tables():
    rng = np.random.default_rng(23)
    W, H = 16, 16
    qt = np.full((8, 8), 6, np.int64)
    yb = _rand_blocks(rng, 1, 4, lo=-60, hi=60)
    cbb = _rand_blocks(rng, 1, 1, lo=-40, hi=40)
    crb = _rand_blocks(rng, 1, 1, lo=-40, hi=40)
    frame = _encode_jpeg_no_dht([yb, cbb, crb], W, H, qt)
    # without the fallback the scan references undefined tables
    with pytest.raises(ValueError, match="missing Huffman"):
        decode_jpeg(frame)
    got = decode_jpeg(frame, default_huffman=True)
    y = ref_plane(yb, 1, 1, 2, 2, qt)
    cb = _upsample(ref_plane(cbb, 1, 1, 1, 1, qt), H, W, 1, 1)
    cr = _upsample(ref_plane(crb, 1, 1, 1, 1, qt), H, W, 1, 1)
    assert np.array_equal(got, ref_rgb(y, cb, cr))
    # and the same frame inside an AVI container round-trips
    idxs, px = decode_video_frames(mux_avi([frame], W, H))
    assert idxs == [0] and np.array_equal(px[0], got)


# ---------------------------------------------------------------------------
# multimodal surface


def test_decode_video_fake_and_stub_gate():
    a1 = decode_video(b"xyz", fake_decode=True, width=4, height=3,
                      n_frames=5)
    a2 = decode_video(b"xyz", fake_decode=True, width=4, height=3,
                      n_frames=5)
    assert a1[0] == list(range(5))
    assert all(np.array_equal(x, y) for x, y in zip(a1[1], a2[1]))
    assert a1[1][0].shape == (3, 4, 3)
    # frames differ across indices (per-frame seeding)
    assert not np.array_equal(a1[1][0], a1[1][1])
    with pytest.raises(NotImplementedError, match="video library"):
        decode_video(b"no container signature here")


def test_frame_sample_decoded_real_avi(spark):
    rng = np.random.default_rng(31)
    W, H = 16, 8
    frames, refs = _gray_jpeg_frames(rng, W, H, 5)
    avi = mux_avi(frames, W, H)
    y = rng.integers(0, 256, (H, W))
    y4m = mux_y4m([(y, None, None)], W, H, b"mono")
    rows = [
        (1, "video", W, H, 5, bytearray(avi)),
        (2, "video", W, H, 1, bytearray(y4m)),
        (3, "image", W, H, 1, bytearray(b"ignored")),   # non-video: skipped
        (4, "video", W, H, 1, None),                    # NULL: skipped
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, width int, height int, "
              "n_frames int, payload binary")
    out = (frame_sample_decoded(df, every_n=2, dim=8, fake_decode=False)
           .orderBy("media_id", "frame_idx").collect())
    assert [(r.media_id, r.frame_idx) for r in out] == \
        [(1, 0), (1, 2), (1, 4), (2, 0)]
    want_avi = _image_features(np.stack([refs[0], refs[2], refs[4]]), 8)
    for r, w in zip(out[:3], want_avi):
        assert np.allclose(r.feature, w, rtol=1e-4, atol=1e-3)
    mid = np.full((H, W), 128, np.uint8)
    want_y4m = _image_features(ref_bt601(y, mid, mid)[None], 8)
    assert np.allclose(out[3].feature, want_y4m[0], rtol=1e-4, atol=1e-3)


def test_frame_sample_decoded_fake_path(spark, sf_dir):
    from tbl_spark.pipelines.multimodal import attach_media
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    media = attach_media(docs)
    out = frame_sample_decoded(media, every_n=5, dim=4).collect()
    n_expected = (media.filter("kind = 'video'")
                  .selectExpr("sum(cast((n_frames + 4) / 5 as int)) s")
                  .collect()[0].s)
    assert len(out) == n_expected
    assert all(len(r.feature) == 4 for r in out)


def test_extract_features_real_video_poster_frame(spark):
    from tbl_spark.pipelines.multimodal import extract_features
    rng = np.random.default_rng(41)
    W, H = 16, 8
    frames, refs = _gray_jpeg_frames(rng, W, H, 3)
    avi = mux_avi(frames, W, H)
    df = spark.createDataFrame(
        [(7, "video", W, H, 3, bytearray(avi))],
        "media_id long, kind string, width int, height int, "
        "n_frames int, payload binary")
    out = extract_features(df, dim=8, fake_decode=False).collect()
    want = _image_features(refs[0][None], 8)
    assert np.allclose(out[0].feature, want[0], rtol=1e-4, atol=1e-3)
