"""MP4 (ISO BMFF) and Matroska container tests.

Strategy mirrors test_video.py: test-side *muxers* build MP4 and MKV
containers around frames whose expected pixels come from the
independent naive-IDCT JPEG reference, so the box/EBML walk, the
sample-table expansion, the lacing decode and the frame seek are
checked value-exact with no video library. Non-MJPEG codecs must still
probe (metadata-only) and must raise the explicit codec gate on
decode.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_video import _gray_jpeg_frames  # noqa: E402

from tbl_spark.pipelines import _video  # noqa: E402
from tbl_spark.pipelines._mp4 import parse_mkv, parse_mp4  # noqa: E402
from tbl_spark.pipelines._video import (decode_video_frames,  # noqa: E402
                                        probe_video)

# ---------------------------------------------------------------------------
# test-side MP4 muxer


def _box(tag: bytes, body: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + tag + struct.pack(
            ">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(tag, bytes([ver]) + flags.to_bytes(3, "big") + body)


def mux_mp4(frames: list[bytes], W: int, H: int, fps: int = 10,
            codec: bytes = b"jpeg", co64: bool = False,
            mdhd_v1: bool = False, large_mdat: bool = False,
            uniform: bool = False) -> bytes:
    """Minimal but spec-shaped MP4: ftyp + mdat + moov, frames split
    into chunks of 2 then a tail run so stsc expansion is exercised."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isomiso2mp41")
    mdat_hdr = 16 if large_mdat else 8
    mdat_body = b"".join(frames)
    # chunk layout: pairs, then all remaining frames in one final chunk
    n = len(frames)
    chunk_lens = [2] * (n // 2 if n % 2 == 0 else (n - 3) // 2)
    rest = n - 2 * len(chunk_lens)
    if rest:
        chunk_lens.append(rest)
    offsets, pos, fi = [], len(ftyp) + mdat_hdr, 0
    for cl in chunk_lens:
        offsets.append(pos)
        for _ in range(cl):
            pos += len(frames[fi])
            fi += 1

    timescale, delta = fps * 1000, 1000
    dur = n * delta
    if mdhd_v1:
        mdhd = _full(b"mdhd", 1, 0, struct.pack(
            ">QQIQ", 0, 0, timescale, dur) + b"\x55\xc4\x00\x00")
    else:
        mdhd = _full(b"mdhd", 0, 0, struct.pack(
            ">IIII", 0, 0, timescale, dur) + b"\x55\xc4\x00\x00")
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"tbl\x00")
    entry = (struct.pack(">I", 86) + codec + b"\x00" * 6
             + struct.pack(">H", 1) + b"\x00" * 16
             + struct.pack(">HH", W, H)
             + struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)
             + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    assert len(entry) == 86
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    runs = [(1, 2, 1)] if len(chunk_lens) > 1 else []
    if rest:
        runs.append((len(chunk_lens), rest, 1))
    elif not runs:
        runs = [(1, 2, 1)]
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(runs))
                 + b"".join(struct.pack(">III", *r) for r in runs))
    if uniform:
        assert len({len(f) for f in frames}) == 1
        stsz = _full(b"stsz", 0, 0, struct.pack(
            ">II", len(frames[0]), n))
    else:
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", len(f))
                                for f in frames))
    if co64:
        stco = _full(b"co64", 0, 0, struct.pack(">I", len(offsets))
                     + b"".join(struct.pack(">Q", o) for o in offsets))
    else:
        stco = _full(b"stco", 0, 0, struct.pack(">I", len(offsets))
                     + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                 + b"\x00" * 64 + struct.pack(">II", W << 16, H << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, n * 1000 // fps) + struct.pack(
        ">IH", 0x10000, 0x100) + b"\x00" * 70 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body, large=large_mdat) + moov


# ---------------------------------------------------------------------------
# test-side MKV muxer


def _eid(i: int) -> bytes:
    return i.to_bytes((i.bit_length() + 7) // 8, "big")


def _esize(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            raw = n | (1 << (7 * length))
            return raw.to_bytes(length, "big")
    raise ValueError("size too large")


def _el(i: int, body: bytes, unknown: bool = False) -> bytes:
    if unknown:
        return _eid(i) + b"\xff" + body
    return _eid(i) + _esize(len(body)) + body


def _euint(i: int, v: int) -> bytes:
    return _el(i, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def _svint(delta: int) -> bytes:
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        raw = delta + bias
        if 0 <= raw < (1 << (7 * length)) - 1:
            return (raw | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("delta too large")


def _simpleblock(track: int, frames: list[bytes],
                 lacing: str = "none") -> bytes:
    hdr = bytes([0x80 | track]) + struct.pack(">h", 0)
    if lacing == "none":
        assert len(frames) == 1
        return _el(0xA3, hdr + b"\x80" + frames[0])
    body = bytes([len(frames) - 1])
    if lacing == "xiph":
        flags = 0x80 | 0x02
        for f in frames[:-1]:
            sz = len(f)
            body += b"\xff" * (sz // 255) + bytes([sz % 255])
    elif lacing == "fixed":
        flags = 0x80 | 0x04
        assert len({len(f) for f in frames}) == 1
    else:                                   # ebml
        flags = 0x80 | 0x06
        if len(frames) > 1:
            body += _esize(len(frames[0]))
            prev = len(frames[0])
            for f in frames[1:-1]:
                body += _svint(len(f) - prev)
                prev = len(f)
    return _el(0xA3, hdr + bytes([flags]) + body + b"".join(frames))


def mux_mkv(frames: list[bytes], W: int, H: int,
            codec: bytes = b"V_MJPEG", fps: int = 10,
            lacing: str = "none", unknown_size: bool = False,
            block_group: bool = False, doctype: bytes = b"matroska"
            ) -> bytes:
    header = _el(0x1A45DFA3,
                 _euint(0x4286, 1) + _euint(0x42F7, 1)
                 + _euint(0x42F2, 4) + _euint(0x42F3, 8)
                 + _el(0x4282, doctype)
                 + _euint(0x4287, 2) + _euint(0x4285, 2))
    info = _el(0x1549A966, _euint(0x2AD7B1, 1000000))
    video = _el(0xE0, _euint(0xB0, W) + _euint(0xBA, H))
    tracks = _el(0x1654AE6B, _el(0xAE,
                 _euint(0xD7, 1) + _euint(0x73C5, 1) + _euint(0x83, 1)
                 + _euint(0x23E383, int(1e9 / fps))
                 + _el(0x86, codec) + video))
    if lacing == "none":
        blocks = b""
        for f in frames:
            if block_group:
                blocks += _el(0xA0, _el(0xA1, bytes([0x81])
                                        + struct.pack(">h", 0)
                                        + b"\x00" + f))
            else:
                blocks += _simpleblock(1, [f])
    else:
        blocks = _simpleblock(1, frames, lacing=lacing)
    cluster = _el(0x1F43B675, _euint(0xE7, 0) + blocks,
                  unknown=unknown_size)
    seg_body = info + tracks + cluster
    if unknown_size:
        # a second cluster after the unknown-size one: the resync rule
        # must find its boundary
        seg_body += _el(0x1F43B675, _euint(0xE7, 1000))
    return header + _el(0x18538067, seg_body, unknown=unknown_size)


# ---------------------------------------------------------------------------
# MP4


@pytest.mark.parametrize("co64,mdhd_v1,large_mdat", [
    (False, False, False), (True, True, True),
])
def test_mp4_mjpeg_exact(co64, mdhd_v1, large_mdat):
    rng = np.random.default_rng(21)
    W, H = 16, 8
    frames, refs = _gray_jpeg_frames(rng, W, H, 5)
    payload = mux_mp4(frames, W, H, fps=10, co64=co64,
                      mdhd_v1=mdhd_v1, large_mdat=large_mdat)
    meta = probe_video(payload)
    assert meta["format"] == "mp4" and meta["n_frames"] == 5
    assert (meta["width"], meta["height"], meta["fps"]) == (W, H, 10.0)
    idxs, px = decode_video_frames(payload)
    assert idxs == [0, 1, 2, 3, 4]
    for k in range(5):
        assert np.array_equal(px[k], refs[k])


def test_mp4_seek_decodes_only_requested(monkeypatch):
    rng = np.random.default_rng(22)
    frames, refs = _gray_jpeg_frames(rng, 8, 8, 6)
    payload = mux_mp4(frames, 8, 8)
    calls = []

    def counting(buf, **kw):
        calls.append(1)
        from tbl_spark.pipelines._jpeg import decode_jpeg
        return decode_jpeg(buf, **kw)

    monkeypatch.setattr(_video, "decode_jpeg", counting)
    idxs, px = decode_video_frames(payload, [3, 0])
    assert idxs == [3, 0] and len(calls) == 2
    assert np.array_equal(px[0], refs[3])
    assert np.array_equal(px[1], refs[0])


def test_mp4_non_mjpeg_probes_but_gates_decode():
    fake = [b"\x00" * 64] * 4                # equal-size "avc1" samples
    payload = mux_mp4(fake, 32, 24, fps=25, codec=b"avc1", uniform=True)
    meta = probe_video(payload)               # metadata-only: works
    assert meta["format"] == "mp4" and meta["n_frames"] == 4
    assert (meta["width"], meta["height"], meta["fps"]) == (32, 24, 25.0)
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_video_frames(payload)


def test_mp4_corrupt_gates():
    rng = np.random.default_rng(23)
    frames, _ = _gray_jpeg_frames(rng, 8, 8, 2)
    payload = mux_mp4(frames, 8, 8)
    # truncating the tail cuts into moov -> box overrun
    with pytest.raises(ValueError, match="corrupt MP4"):
        parse_mp4(payload[:-10])
    # a well-formed file with no moov at all
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4(payload[:payload.index(b"moov") - 4])
    assert parse_mp4(b"\x00\x00\x00\x08free") is None
    assert parse_mp4(b"RIFF1234AVI ") is None


def test_mp4_stsc_multi_run_offsets():
    # 7 frames -> chunks [2, 2, 3]: two stsc runs; every sample offset
    # must land exactly on its frame bytes
    rng = np.random.default_rng(24)
    frames, refs = _gray_jpeg_frames(rng, 8, 8, 7)
    payload = mux_mp4(frames, 8, 8)
    meta = parse_mp4(payload)
    assert len(meta["frames"]) == 7
    for (off, sz), f in zip(meta["frames"], frames):
        assert payload[off:off + sz] == f
    idxs, px = decode_video_frames(payload, [6, 2])
    assert np.array_equal(px[0], refs[6])
    assert np.array_equal(px[1], refs[2])


# ---------------------------------------------------------------------------
# MKV


@pytest.mark.parametrize("block_group", [False, True])
def test_mkv_mjpeg_exact(block_group):
    rng = np.random.default_rng(31)
    W, H = 16, 8
    frames, refs = _gray_jpeg_frames(rng, W, H, 4)
    payload = mux_mkv(frames, W, H, fps=10, block_group=block_group)
    meta = probe_video(payload)
    assert meta["format"] == "mkv" and meta["n_frames"] == 4
    assert (meta["width"], meta["height"]) == (W, H)
    assert abs(meta["fps"] - 10.0) < 1e-6
    idxs, px = decode_video_frames(payload)
    assert idxs == [0, 1, 2, 3]
    for k in range(4):
        assert np.array_equal(px[k], refs[k])


@pytest.mark.parametrize("lacing", ["xiph", "ebml", "fixed"])
def test_mkv_lacing_exact(lacing):
    rng = np.random.default_rng(32)
    if lacing == "fixed":
        frames, refs = _gray_jpeg_frames(rng, 8, 8, 1)
        frames, refs = frames * 3, refs * 3   # equal sizes required
    else:
        frames, refs = _gray_jpeg_frames(rng, 8, 8, 3)
        # make one frame >255 bytes so Xiph's 255-run encoding is hit
        assert any(len(f) > 255 for f in frames) or lacing != "xiph"
    payload = mux_mkv(frames, 8, 8, lacing=lacing)
    meta = parse_mkv(payload)
    assert len(meta["frames"]) == len(frames)
    for (off, sz), f in zip(meta["frames"], frames):
        assert payload[off:off + sz] == f
    _, px = decode_video_frames(payload)
    for k in range(len(frames)):
        assert np.array_equal(px[k], refs[k])


def test_mkv_unknown_size_resync():
    # stream-muxed shape: unknown-size Segment and Cluster; the parser
    # must end the cluster at the next cluster's ID
    rng = np.random.default_rng(33)
    frames, refs = _gray_jpeg_frames(rng, 8, 8, 2)
    payload = mux_mkv(frames, 8, 8, unknown_size=True)
    meta = parse_mkv(payload)
    assert len(meta["frames"]) == 2
    _, px = decode_video_frames(payload, [1])
    assert np.array_equal(px[0], refs[1])


def test_mkv_webm_codec_gate_and_corrupt():
    fake = [b"\x9d\x01*" + b"\x00" * 61] * 2   # VP8-ish junk
    payload = mux_mkv(fake, 32, 24, codec=b"V_VP8", doctype=b"webm")
    meta = probe_video(payload)                # metadata-only: works
    assert meta["format"] == "mkv" and meta["n_frames"] == 2
    assert (meta["width"], meta["height"]) == (32, 24)
    with pytest.raises(NotImplementedError, match="V_VP8"):
        decode_video_frames(payload)
    with pytest.raises(ValueError, match="corrupt MKV"):
        parse_mkv(payload[:-20] + b"\x00" * 5)
    assert parse_mkv(b"not an mkv at all") is None
    bad_doctype = mux_mkv(fake, 4, 4, doctype=b"divx")
    with pytest.raises(ValueError, match="DocType"):
        parse_mkv(bad_doctype)


def test_multimodal_decode_video_mp4_path():
    from tbl_spark.pipelines.multimodal import decode_video
    rng = np.random.default_rng(34)
    frames, refs = _gray_jpeg_frames(rng, 8, 8, 3)
    idxs, px = decode_video(mux_mp4(frames, 8, 8), [2])
    assert idxs == [2] and np.array_equal(px[0], refs[2])
    idxs, px = decode_video(mux_mkv(frames, 8, 8), [1])
    assert idxs == [1] and np.array_equal(px[0], refs[1])


def test_mp4_fragmented_gate():
    rng = np.random.default_rng(35)
    frames, _ = _gray_jpeg_frames(rng, 8, 8, 2)
    payload = mux_mp4(frames, 8, 8)
    # append an empty moof box: the fragmented-MP4 gate must fire
    payload += struct.pack(">I", 8) + b"moof"
    with pytest.raises(NotImplementedError, match="fragmented"):
        parse_mp4(payload)
