"""AIFF / AIFF-C and Sun .au decode tests (pure numpy/stdlib).

Test-side muxers build the containers from planted sample buffers;
µ-law is checked against the published G.711 anchor values, its code
symmetry, and an independently written spec-formula encoder.
"""

import struct

import numpy as np
import pytest

from tbl_spark.pipelines.multimodal import (_audio_normalize, _decode_aiff,
                                            _decode_au, _f80_to_float,
                                            _mulaw_to_linear, decode_audio)

# ---------------------------------------------------------------------------
# test-side muxers


def _f80(rate: int) -> bytes:
    """Int sample rate → 80-bit IEEE extended big-endian."""
    k = rate.bit_length() - 1
    return struct.pack(">HQ", 16383 + k, rate << (63 - k))


def _iff_chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack(">I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def mux_aiff(data: bytes, n_ch: int, bits: int, rate: int,
             n_frames: int, ctype: bytes | None = None) -> bytes:
    comm = struct.pack(">HIH", n_ch, n_frames, bits) + _f80(rate)
    form_type = b"AIFF"
    if ctype is not None:
        form_type = b"AIFC"
        comm += ctype + b"\x00\x00"      # empty pascal-string name
    ssnd = struct.pack(">II", 0, 0) + data
    body = form_type + _iff_chunk(b"COMM", comm) + _iff_chunk(b"SSND",
                                                              ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def mux_au(data: bytes, enc: int, rate: int, n_ch: int,
           annotation: bytes = b"") -> bytes:
    off = 24 + len(annotation)
    return (b".snd" + struct.pack(">IIIII", off, len(data), enc, rate,
                                  n_ch) + annotation + data)


# ---------------------------------------------------------------------------
# AIFF


def test_f80_roundtrip():
    for r in (8000, 11025, 22050, 44100, 48000, 96000):
        assert _f80_to_float(_f80(r)) == float(r)
    assert _f80_to_float(b"\x00" * 10) == 0.0


def test_aiff_pcm16_exact():
    rng = np.random.default_rng(1)
    want = rng.integers(-2 ** 15, 2 ** 15, (64, 2)).astype(">i2")
    payload = mux_aiff(want.tobytes(), 2, 16, 44100, 64)
    samples, rate = decode_audio(payload)
    assert rate == 44100
    assert np.array_equal(samples, want)


@pytest.mark.parametrize("bits,np_dt", [(8, np.int8), (32, ">i4")])
def test_aiff_other_pcm_widths(bits, np_dt):
    rng = np.random.default_rng(bits)
    lo, hi = -2 ** (bits - 1), 2 ** (bits - 1)
    want = rng.integers(lo, hi, (31, 1)).astype(np_dt)
    samples, rate = _decode_aiff(
        mux_aiff(want.tobytes(), 1, bits, 8000, 31))
    assert rate == 8000 and np.array_equal(samples, want)


def test_aiff_24bit_and_sowt():
    vals = np.array([[0], [1], [-1], [8388607], [-8388608]], np.int32)
    be = bytearray()
    for v in vals[:, 0]:
        be += int(v & 0xFFFFFF).to_bytes(3, "big")
    samples, _ = _decode_aiff(mux_aiff(bytes(be), 1, 24, 22050, 5))
    assert np.array_equal(samples, vals)
    # AIFF-C 'sowt' = little-endian PCM
    want = np.array([[-12345], [32000]], dtype="<i2")
    samples, _ = _decode_aiff(
        mux_aiff(want.tobytes(), 1, 16, 8000, 2, ctype=b"sowt"))
    assert np.array_equal(samples, want)
    with pytest.raises(NotImplementedError, match="compression"):
        _decode_aiff(mux_aiff(b"", 1, 16, 8000, 0, ctype=b"ima4"))


def test_aiff_corrupt_and_nonaiff():
    assert _decode_aiff(b"FORMxxxxWAVE") is None
    assert _decode_aiff(b"RIFF1234AVI ") is None
    with pytest.raises(ValueError, match="truncated"):
        _decode_aiff(b"FORM" + struct.pack(">I", 100) + b"AIFF"
                     + b"COMM" + struct.pack(">I", 50))
    with pytest.raises(ValueError, match="missing COMM"):
        _decode_aiff(b"FORM" + struct.pack(">I", 4) + b"AIFF")


# ---------------------------------------------------------------------------
# µ-law


def _mulaw_encode_ref(x: int) -> int:
    """Independent spec-formula G.711 µ-law encoder (segment search on
    the 14-bit magnitude + 33 bias), for roundtrip checks."""
    x >>= 2                              # 16-bit container -> 14-bit
    sign = 0x80 if x < 0 else 0
    m = min(abs(x), 8031) + 33
    exp = m.bit_length() - 6             # MSB position - 5
    mant = (m >> (exp + 1)) & 0x0F
    return (~(sign | (exp << 4) | mant)) & 0xFF


def test_mulaw_anchors_symmetry_monotonic():
    allb = np.arange(256, dtype=np.uint8)
    lin = _mulaw_to_linear(allb)
    assert lin.dtype == np.int16
    # published anchors: code 0x00 = -32124, 0x80 = +32124, 0xFF = 0
    assert lin[0x00] == -32124 and lin[0x80] == 32124
    assert lin[0xFF] == 0 and lin[0x7F] == 0
    # sign symmetry: flipping the sign bit negates the value
    assert np.array_equal(lin[:128], -lin[128:])
    # positive codes decode strictly decreasing from 0x80 to 0xFF
    pos = lin[128:]
    assert (np.diff(pos) < 0).all()


def test_mulaw_roundtrip_quantization():
    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.integers(-32124, 32124, 500),
        np.array([0, 1, -1, 32124, -32124, 5000, -5000])])
    codes = np.array([_mulaw_encode_ref(int(v)) for v in vals],
                     dtype=np.uint8)
    back = _mulaw_to_linear(codes)
    # each decoded value must sit within its segment's quantization
    # step of the original (step = 8 << exp in 16-bit units)
    exp = ((((~codes) & 0xFF) >> 4) & 0x07).astype(np.int32)
    step = 8 << exp
    assert (np.abs(back.astype(np.int32)
                   - np.clip(vals, -32124, 32124)) <= step).all()


# ---------------------------------------------------------------------------
# AU


def test_au_pcm16_and_annotation():
    want = np.array([[100, -100], [32000, -32000]], dtype=">i2")
    payload = mux_au(want.tobytes(), 3, 16000, 2, annotation=b"meta\x00")
    samples, rate = decode_audio(payload)
    assert rate == 16000 and np.array_equal(samples, want)


def test_au_mulaw_float_and_24bit():
    codes = np.array([0x00, 0x80, 0xFF, 0x3A], np.uint8)
    samples, rate = _decode_au(mux_au(codes.tobytes(), 1, 8000, 1))
    assert rate == 8000
    assert np.array_equal(samples[:, 0], _mulaw_to_linear(codes))
    want = np.array([[0.5], [-0.25]], dtype=">f4")
    samples, _ = _decode_au(mux_au(want.tobytes(), 6, 48000, 1))
    assert np.array_equal(samples, want)
    be = (b"\x00\x00\x01" + b"\xff\xff\xff")       # 1, -1
    samples, _ = _decode_au(mux_au(be, 4, 8000, 1))
    assert samples[:, 0].tolist() == [1, -1]
    with pytest.raises(NotImplementedError, match="encoding"):
        _decode_au(mux_au(b"", 23, 8000, 1))       # ADPCM variant
    with pytest.raises(ValueError, match="corrupt AU"):
        _decode_au(b".snd" + struct.pack(">IIIII", 8, 0, 3, 8000, 1))
    assert _decode_au(b"RIFFxxxxWAVE") is None


# ---------------------------------------------------------------------------
# normalization + pipeline surface


def test_normalize_handles_all_native_dtypes():
    # int8 (AIFF), big-endian int16 (AIFF/AU) scale like their
    # little-endian WAV counterparts
    a = _audio_normalize(np.array([[-128], [127]], np.int8))
    assert np.allclose(a, [-1.0, 127 / 128])
    b = _audio_normalize(np.array([[-32768], [16384]], ">i2"))
    assert np.allclose(b, [-1.0, 0.5])
    c = _audio_normalize(np.array([[0.25]], ">f4"))
    assert np.allclose(c, [0.25])


def test_extract_features_aiff_and_au(spark):
    from tbl_spark.pipelines.multimodal import (_audio_feature,
                                                extract_features)
    rng = np.random.default_rng(17)
    pcm = rng.integers(-2 ** 15, 2 ** 15, (300, 1)).astype(">i2")
    aiff = mux_aiff(pcm.tobytes(), 1, 16, 22050, 300)
    au = mux_au(pcm.tobytes(), 3, 8000, 1)
    df = spark.createDataFrame(
        [(1, "audio", 0, 0, 1, bytearray(aiff)),
         (2, "audio", 0, 0, 1, bytearray(au))],
        "media_id long, kind string, width int, height int, "
        "n_frames int, payload binary")
    out = (extract_features(df, dim=8, fake_decode=False)
           .orderBy("media_id").collect())
    want = _audio_feature(pcm, 22050, 8)
    assert np.allclose(out[0].feature, want, rtol=1e-4, atol=1e-4)
    assert np.allclose(out[1].feature, want, rtol=1e-4, atol=1e-4)
