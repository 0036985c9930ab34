"""Pure-stdlib MP4 (ISO BMFF) and Matroska/WebM container parsing.

Extends the video tier (`_video.py`) to the two dominant web video
containers. Both parsers are **metadata-only**: they walk the container
structure and produce a per-frame (offset, size) index plus geometry
and timing WITHOUT touching any frame payload, so `frame_sample`-style
operators can plan which k of N frames to read at corpus scale for one
O(header) scan. Frame *decode* remains possible only when the embedded
codec is one this repo already decodes (MJPEG — each sample is an
ITU-T T.81 JPEG); H.264/HEVC/VP8/VP9/AV1 payloads raise
NotImplementedError naming the codec, same contract as AVI's non-MJPEG
gate.

- **MP4 / ISO BMFF** (ISO/IEC 14496-12, public spec): box walk
  (`size`+`fourcc`, 64-bit largesize, size-0 to-EOF), then the sample
  tables inside `moov/trak/mdia/minf/stbl`: `stsd` (codec fourcc +
  coded width/height), `stts` (timing → fps), `stsz`/`stz2` (sample
  sizes), `stsc` (sample→chunk runs), `stco`/`co64` (chunk offsets).
  The sample index is the standard stsc run expansion: chunk k's
  samples sit back-to-back from the chunk offset.
- **Matroska / WebM** (public EBML spec, RFC 8794 + matroska.org):
  vint-coded element walk; `Info` (TimestampScale/Duration), `Tracks`
  (first TrackType==1 entry: CodecID, PixelWidth/Height,
  DefaultDuration → fps), then each `Cluster`'s SimpleBlock/Block
  frames for that track with all three lacing modes (Xiph, fixed,
  EBML). Unknown-size Segment/Cluster elements (stream muxers) are
  handled by the spec's resync rule: a cluster ends at the first
  element ID that is not valid inside a cluster.

Reference behavior parity: tbl stores media as opaque bytes
(`types.rs`); container understanding lives in this repo's pipeline
tier only. Corrupt structure raises ValueError (the shared
corrupt-input contract); genuinely codec-bound decode raises
NotImplementedError.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# ISO BMFF (MP4)


def _mp4_boxes(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a span."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        if size == 1:
            if pos + 16 > end:
                raise ValueError("corrupt MP4: truncated largesize box")
            (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:                      # extends to end of span
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < body - pos or pos + size > end:
            raise ValueError(f"corrupt MP4: box {tag!r} overruns "
                             "its container")
        yield tag, body, pos + size
        pos += size


def _full_box(buf: bytes, body: int) -> tuple[int, int]:
    """(version, payload offset past version+flags) of a full box."""
    return buf[body], body + 4


def _parse_stbl(buf: bytes, body: int, end: int) -> dict:
    st: dict = {"codec": b"", "width": 0, "height": 0, "sizes": None,
                "uniform": 0, "n_samples": 0, "stts": [],
                "stsc": [], "chunks": []}
    for tag, b, e in _mp4_boxes(buf, body, end):
        if tag == b"stsd" and e - b >= 16:
            _, p = _full_box(buf, b)
            (count,) = struct.unpack(">I", buf[p:p + 4])
            if count >= 1 and e - p >= 12:
                ent = p + 4
                st["codec"] = buf[ent + 4:ent + 8]
                if e - ent >= 36:            # VisualSampleEntry geometry
                    st["width"], st["height"] = struct.unpack(
                        ">HH", buf[ent + 32:ent + 36])
        elif tag == b"stts":
            _, p = _full_box(buf, b)
            (count,) = struct.unpack(">I", buf[p:p + 4])
            if p + 4 + 8 * count > e:
                raise ValueError("corrupt MP4: truncated stts")
            st["stts"] = [struct.unpack(">II", buf[p + 4 + 8 * i:
                                                   p + 12 + 8 * i])
                          for i in range(count)]
        elif tag == b"stsz":
            _, p = _full_box(buf, b)
            uniform, n = struct.unpack(">II", buf[p:p + 8])
            st["uniform"], st["n_samples"] = uniform, n
            if uniform == 0:
                if p + 8 + 4 * n > e:
                    raise ValueError("corrupt MP4: truncated stsz")
                st["sizes"] = [struct.unpack(
                    ">I", buf[p + 8 + 4 * i:p + 12 + 4 * i])[0]
                    for i in range(n)]
        elif tag == b"stz2":
            _, p = _full_box(buf, b)
            field = buf[p + 3]
            (n,) = struct.unpack(">I", buf[p + 4:p + 8])
            st["n_samples"] = n
            data = buf[p + 8:e]
            if field == 4:
                if len(data) * 2 < n:
                    raise ValueError("corrupt MP4: truncated stz2")
                st["sizes"] = [(data[i // 2] >> (0 if i & 1 else 4)) & 15
                               for i in range(n)]
            elif field in (8, 16):
                step = field // 8
                if len(data) < n * step:
                    raise ValueError("corrupt MP4: truncated stz2")
                st["sizes"] = [int.from_bytes(
                    data[i * step:(i + 1) * step], "big")
                    for i in range(n)]
            else:
                raise ValueError("corrupt MP4: bad stz2 field size")
        elif tag == b"stsc":
            _, p = _full_box(buf, b)
            (count,) = struct.unpack(">I", buf[p:p + 4])
            if p + 4 + 12 * count > e:
                raise ValueError("corrupt MP4: truncated stsc")
            st["stsc"] = [struct.unpack(">III", buf[p + 4 + 12 * i:
                                                    p + 16 + 12 * i])
                          for i in range(count)]
        elif tag in (b"stco", b"co64"):
            _, p = _full_box(buf, b)
            (count,) = struct.unpack(">I", buf[p:p + 4])
            w, fmt = (4, ">I") if tag == b"stco" else (8, ">Q")
            if p + 4 + w * count > e:
                raise ValueError(f"corrupt MP4: truncated {tag.decode()}")
            st["chunks"] = [struct.unpack(
                fmt, buf[p + 4 + w * i:p + 4 + w * (i + 1)])[0]
                for i in range(count)]
    return st


def _expand_samples(st: dict, total: int) -> list[tuple[int, int]]:
    """stsc run expansion → [(abs offset, size)] per sample."""
    n = st["n_samples"]
    sizes = st["sizes"] if st["uniform"] == 0 else [st["uniform"]] * n
    if sizes is None or len(sizes) < n:
        raise ValueError("corrupt MP4: sample sizes missing")
    chunks, runs = st["chunks"], st["stsc"]
    if not chunks or not runs:
        raise ValueError("corrupt MP4: missing stsc/stco")
    frames: list[tuple[int, int]] = []
    si = 0
    for ri, (first, per_chunk, _sdi) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunks)
        if first < 1 or last < first - 1 or last > len(chunks):
            raise ValueError("corrupt MP4: stsc chunk range invalid")
        for ci in range(first - 1, last):
            off = chunks[ci]
            for _ in range(per_chunk):
                if si >= n:
                    break
                sz = sizes[si]
                if off + sz > total:
                    raise ValueError("corrupt MP4: sample overruns file")
                frames.append((off, sz))
                off += sz
                si += 1
    if si < n:
        raise ValueError("corrupt MP4: stsc expansion covers "
                         f"{si} of {n} samples")
    return frames


def parse_mp4(payload: bytes) -> dict | None:
    """ISO BMFF walk → {'frames': [(start, size)], 'width', 'height',
    'fps', 'codec'} for the first video track, touching no frame
    payload. Returns None when the payload is not an MP4 family file
    (detected by its leading ftyp/styp/moov box)."""
    if len(payload) < 8 or payload[4:8] not in (b"ftyp", b"styp",
                                                b"moov"):
        return None
    moov = None
    fragmented = False
    for tag, b, e in _mp4_boxes(payload, 0, len(payload)):
        if tag == b"moov":
            moov = (b, e)
        elif tag == b"moof":
            fragmented = True
    if moov is None:
        raise ValueError("corrupt MP4: no moov box")
    if fragmented:
        raise NotImplementedError(
            "fragmented MP4 (moof boxes) is not supported — the frame "
            "index lives in per-fragment trun boxes, not the moov "
            "sample tables")
    for tag, b, e in _mp4_boxes(payload, *moov):
        if tag != b"trak":
            continue
        mdia = stbl = None
        timescale = duration = 0
        handler = b""
        for t2, b2, e2 in _mp4_boxes(payload, b, e):
            if t2 == b"mdia":
                mdia = (b2, e2)
        if mdia is None:
            continue
        for t2, b2, e2 in _mp4_boxes(payload, *mdia):
            if t2 == b"mdhd":
                ver, p = _full_box(payload, b2)
                if ver == 1:
                    timescale, duration = struct.unpack(
                        ">IQ", payload[p + 16:p + 28])
                else:
                    timescale, duration = struct.unpack(
                        ">II", payload[p + 8:p + 16])
            elif t2 == b"hdlr":
                _, p = _full_box(payload, b2)
                handler = payload[p + 4:p + 8]
            elif t2 == b"minf":
                for t3, b3, e3 in _mp4_boxes(payload, b2, e2):
                    if t3 == b"stbl":
                        stbl = (b3, e3)
        if handler != b"vide" or stbl is None:
            continue
        st = _parse_stbl(payload, *stbl)
        frames = _expand_samples(st, len(payload))
        n = len(frames)
        fps = 0.0
        media_time = sum(c * d for c, d in st["stts"])
        if media_time and timescale:
            fps = n * timescale / media_time
        elif duration and timescale and n:
            fps = n * timescale / duration
        return {"frames": frames, "width": st["width"],
                "height": st["height"], "fps": fps,
                "codec": st["codec"]}
    raise ValueError("corrupt MP4: no video track in moov")


# ---------------------------------------------------------------------------
# Matroska / WebM (EBML)

_MKV_MAGIC = b"\x1aE\xdf\xa3"
# element IDs (with marker bits, as they appear on the wire)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_CLUSTER = 0x1F43B675
_IN_CLUSTER = {0xE7, 0xA3, 0xA0, 0xA7, 0xAB, 0x5854, 0xBF, 0xEC}


def _vint(buf: bytes, pos: int, end: int,
          keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at pos → (value, next_pos)."""
    if pos >= end:
        raise ValueError("corrupt MKV: truncated vint")
    first = buf[pos]
    if first == 0:
        raise ValueError("corrupt MKV: invalid vint")
    length = 8 - first.bit_length() + 1
    if pos + length > end:
        raise ValueError("corrupt MKV: truncated vint")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | buf[pos + i]
    return val, pos + length


def _element(buf: bytes, pos: int, end: int) -> tuple[int, int, int, int]:
    """(id, body_start, size_or_-1_for_unknown, header_len) at pos."""
    eid, p = _vint(buf, pos, end, keep_marker=True)
    size, p2 = _vint(buf, p, end, keep_marker=False)
    # all-ones size payload == unknown size
    if size == (1 << (7 * (p2 - p))) - 1:
        size = -1
    return eid, p2, size, p2 - pos


def _uint(buf: bytes, b: int, e: int) -> int:
    return int.from_bytes(buf[b:e], "big")


def _float(buf: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", buf[b:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[b:e])[0]
    return 0.0


def _mkv_children(buf: bytes, pos: int, end: int):
    """Yield (id, body_start, body_end) for known-size children."""
    while pos < end:
        eid, body, size, _h = _element(buf, pos, end)
        if size < 0:
            raise ValueError("corrupt MKV: unknown-size child element")
        if body + size > end:
            raise ValueError("corrupt MKV: child element truncated")
        yield eid, body, body + size
        pos = body + size


def _block_frames(buf: bytes, body: int, end: int,
                  track: int) -> list[tuple[int, int]]:
    """Frame spans inside one (Simple)Block, honoring lacing."""
    tnum, p = _vint(buf, body, end, keep_marker=False)
    if tnum != track:
        return []
    p += 3                                  # s16 rel-timestamp + flags
    if p > end:
        raise ValueError("corrupt MKV: truncated block header")
    lacing = (buf[p - 1] >> 1) & 0x03
    if lacing == 0:
        return [(p, end - p)]
    if p >= end:
        raise ValueError("corrupt MKV: truncated lace count")
    nframes = buf[p] + 1
    p += 1
    sizes: list[int] = []
    if lacing == 2:                         # fixed-size lacing
        total = end - p
        if nframes == 0 or total % nframes:
            raise ValueError("corrupt MKV: fixed lacing does not divide")
        sizes = [total // nframes] * nframes
    elif lacing == 1:                       # Xiph lacing
        for _ in range(nframes - 1):
            sz = 0
            while True:
                if p >= end:
                    raise ValueError("corrupt MKV: truncated Xiph lace")
                sz += buf[p]
                stop = buf[p] != 255
                p += 1
                if stop:
                    break
            sizes.append(sz)
        sizes.append(end - p - sum(sizes))
    elif nframes == 1:                      # EBML lacing, single frame:
        sizes = [end - p]                   # no lace-size vints on wire
    else:                                   # EBML lacing
        first, p = _vint(buf, p, end, keep_marker=False)
        sizes.append(first)
        prev = first
        for _ in range(nframes - 2):
            raw, p2 = _vint(buf, p, end, keep_marker=False)
            delta = raw - ((1 << (7 * (p2 - p) - 1)) - 1)
            prev += delta
            sizes.append(prev)
            p = p2
        sizes.append(end - p - sum(sizes))
    if any(s < 0 for s in sizes) or sum(sizes) != end - p:
        raise ValueError("corrupt MKV: lace sizes inconsistent")
    out = []
    for s in sizes:
        out.append((p, s))
        p += s
    return out


def parse_mkv(payload: bytes) -> dict | None:
    """EBML walk → {'frames': [(start, size)], 'width', 'height',
    'fps', 'codec'} for the first video track. Returns None when the
    payload does not start with the EBML magic."""
    if not payload.startswith(_MKV_MAGIC):
        return None
    end = len(payload)
    eid, body, size, _h = _element(payload, 0, end)
    doctype = b""
    for cid, b, e in _mkv_children(payload, body,
                                   body + size if size >= 0 else end):
        if cid == 0x4282:
            doctype = payload[b:e].rstrip(b"\x00")
    if doctype not in (b"matroska", b"webm"):
        raise ValueError(f"corrupt MKV: unexpected DocType {doctype!r}")
    pos = body + size
    eid, body, size, _h = _element(payload, pos, end)
    if eid != _SEGMENT:
        raise ValueError("corrupt MKV: no Segment element")
    seg_end = end if size < 0 else body + size
    if seg_end > end:
        raise ValueError("corrupt MKV: Segment truncated")

    track = None
    codec = b""
    width = height = 0
    fps = 0.0
    frames: list[tuple[int, int]] = []
    pos = body
    while pos < seg_end:
        eid, b, size, _h = _element(payload, pos, seg_end)
        e = seg_end if size < 0 else b + size
        if e > seg_end:
            raise ValueError("corrupt MKV: Segment child truncated")
        if size < 0 and eid != _CLUSTER:
            raise ValueError("corrupt MKV: unknown-size non-Cluster "
                             "element in Segment")
        if eid == _INFO:
            # TimestampScale/Duration not needed: fps comes from the
            # track's DefaultDuration below
            pass
        elif eid == _TRACKS:
            for cid, b2, e2 in _mkv_children(payload, b, e):
                if cid != 0xAE or track is not None:
                    continue
                tnum = ttype = 0
                tcodec = b""
                tw = th = 0
                tdur = 0
                for fid, b3, e3 in _mkv_children(payload, b2, e2):
                    if fid == 0xD7:
                        tnum = _uint(payload, b3, e3)
                    elif fid == 0x83:
                        ttype = _uint(payload, b3, e3)
                    elif fid == 0x86:
                        tcodec = payload[b3:e3].rstrip(b"\x00")
                    elif fid == 0x23E383:
                        tdur = _uint(payload, b3, e3)
                    elif fid == 0xE0:
                        for vid, b4, e4 in _mkv_children(payload, b3,
                                                         e3):
                            if vid == 0xB0:
                                tw = _uint(payload, b4, e4)
                            elif vid == 0xBA:
                                th = _uint(payload, b4, e4)
                if ttype == 1:
                    track, codec = tnum, tcodec
                    width, height = tw, th
                    if tdur:
                        fps = 1e9 / tdur
        elif eid == _CLUSTER:
            p = b
            while p < e:
                cid, b2, csize, _h2 = _element(payload, p, e)
                if cid not in _IN_CLUSTER:
                    if size < 0:            # unknown-size cluster ends
                        e = p               # at the first foreign ID
                        break
                    raise ValueError("corrupt MKV: unexpected element "
                                     f"0x{cid:X} inside Cluster")
                if csize < 0:
                    raise ValueError("corrupt MKV: unknown-size element "
                                     "inside Cluster")
                e2 = b2 + csize
                if e2 > e:
                    raise ValueError("corrupt MKV: Cluster child "
                                     "truncated")
                if track is not None:
                    if cid == 0xA3:         # SimpleBlock
                        frames.extend(
                            _block_frames(payload, b2, e2, track))
                    elif cid == 0xA0:       # BlockGroup
                        for gid, b3, e3 in _mkv_children(payload, b2,
                                                         e2):
                            if gid == 0xA1:
                                frames.extend(_block_frames(
                                    payload, b3, e3, track))
                p = e2
        pos = e
    if track is None:
        raise ValueError("corrupt MKV: no video track")
    return {"frames": frames, "width": width, "height": height,
            "fps": fps, "codec": codec}
