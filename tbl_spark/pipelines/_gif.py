"""Pure-Python/numpy GIF decoder (GIF87a/GIF89a, a public CompuServe
spec; LZW per the GIF variant of Welch 1984).

Closes the last common web image format the way PNG/JPEG closed
theirs: block walk (logical screen descriptor, global/local color
tables, extension blocks, image descriptors), variable-width LZW
decompression, interlace reordering, palette mapping, and frame
compositing with the GIF89a disposal methods — so animated GIFs also
serve the video tier (probe + per-frame decode) even though each frame
must be composited from frame 0 (LZW frames are deltas over the
canvas, unlike MJPEG's independent frames; `decode_gif_frames`
documents the resulting O(frame_index) seek cost).

The LZW code loop is sequential Python (the dictionary is inherently
serial); everything after — palette gather, interlace scatter,
transparency compositing — is whole-array numpy.

Reference behavior parity: tbl stores media as opaque bytes
(`types.rs`); decode lives in this repo's pipeline tier only.
Structurally broken payloads raise ValueError (the corrupt-input
contract shared with `_decode_png`/`_parse_avi`).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int
                ) -> np.ndarray:
    """GIF LZW → uint8 index stream of exactly n_expected pixels.

    Variable code width starting at min_code_size+1, clear/EOI codes,
    dictionary capped at 4096 entries (width stops growing at 12 bits
    until the next clear), early-change convention per the GIF spec."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"corrupt GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: little-endian within bytes, codes packed LSB-first
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")
    nbits = len(bits)
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    pos = 0
    # dictionary as (prefix_code, tail_byte); roots are implicit
    prefix = np.zeros(4096, dtype=np.int32)
    tail = np.zeros(4096, dtype=np.uint8)
    next_code = eoi + 1
    width = min_code_size + 1
    prev = -1
    buf = bytearray(4096)            # scratch for one expanded string

    def read_code() -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("corrupt GIF: LZW stream exhausted")
        c = 0
        for i in range(width):
            c |= int(bits[pos + i]) << i
        pos += width
        return c

    while n_out < n_expected:
        code = read_code()
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("corrupt GIF: first LZW code not a root")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code > next_code or code == next_code == 4096:
            raise ValueError("corrupt GIF: LZW code out of range")
        # expand `code` (or the KwKwK case when code == next_code)
        cur = prev if code == next_code else code
        n = 0
        while cur >= clear:              # walk the chain to the root
            buf[n] = tail[cur]
            n += 1
            cur = int(prefix[cur])
        first = cur
        take = min(n + 1 + (1 if code == next_code else 0),
                   n_expected - n_out)
        # emit: root byte, reversed chain, (+ repeated first for KwKwK)
        s = bytes([first]) + bytes(reversed(buf[:n]))
        if code == next_code:
            s += bytes([first])
        out[n_out:n_out + take] = np.frombuffer(s[:take], dtype=np.uint8)
        n_out += take
        if next_code < 4096:
            prefix[next_code] = prev
            tail[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_expected:
        raise ValueError("corrupt GIF: LZW ended before the last pixel")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: stored row order → display order."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for y0, dy in _INTERLACE_PASSES:
        n = len(range(y0, h, dy))
        out[y0::dy] = rows[src:src + n]
        src += n
    return out


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at pos; returns
    (data, position after the terminator)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: unterminated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(payload):
            raise ValueError("corrupt GIF: truncated sub-block")
        chunks.append(payload[pos:pos + n])
        pos += n


def parse_gif(payload: bytes) -> dict | None:
    """Structure walk → {'width', 'height', 'frames': [frame dicts],
    'gct': global palette | None, 'bg': background index} with LZW data
    kept as opaque bytes per frame (decode happens per requested frame).
    Returns None when the payload is not GIF at all."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames = []
    transparent = None
    disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: missing trailer")
        b = payload[pos]
        pos += 1
        if b == 0x3B:                     # trailer
            break
        if b == 0x21:                     # extension
            if pos >= len(payload):
                raise ValueError("corrupt GIF: truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:   # graphic control
                gflags, _delay_lo, _delay_hi, tix = data[0], data[1], \
                    data[2], data[3]
                disposal = (gflags >> 2) & 0x07
                transparent = tix if gflags & 0x01 else None
        elif b == 0x2C:                   # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("corrupt GIF: truncated image "
                                 "descriptor")
            x0, y0, fw, fh, iflags = struct.unpack(
                "<HHHHB", payload[pos:pos + 9])
            pos += 9
            lct = None
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                lct = np.frombuffer(payload, np.uint8,
                                    n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pos >= len(payload):
                raise ValueError("corrupt GIF: missing LZW code size")
            mcs = payload[pos]
            pos += 1
            lzw, pos = _sub_blocks(payload, pos)
            frames.append({"x": x0, "y": y0, "w": fw, "h": fh,
                           "interlaced": bool(iflags & 0x40),
                           "palette": lct if lct is not None else gct,
                           "lzw": lzw, "mcs": mcs,
                           "transparent": transparent,
                           "disposal": disposal})
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{b:02x}")
    return {"width": w, "height": h, "frames": frames, "gct": gct,
            "bg": bg}


def decode_gif_frames(payload: bytes,
                      indices: list[int] | None = None
                      ) -> tuple[list[int], list[np.ndarray]] | None:
    """Selected GIF frames → (indices, [(H, W, 3) uint8, ...]), or None
    when the payload is not GIF. Frames are composited onto the logical
    screen honoring transparency and disposal methods 0/1 (keep),
    2 (restore background — rendered as the palette background color)
    and 3 (restore previous); because frames are canvas deltas, seeking
    frame k costs decoding frames 0..k (unlike the AVI/y4m containers
    whose frames are independent — callers sampling sparsely from long
    animations should decode once and slice)."""
    meta = parse_gif(payload)
    if meta is None:
        return None
    frames = meta["frames"]
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    if indices is None:
        order = list(range(len(frames)))
    else:
        order = [i for i in indices if 0 <= i < len(frames)]
    want = sorted(set(order))
    h, w = meta["height"], meta["width"]
    gct = meta["gct"]
    if gct is not None and meta["bg"] < len(gct):
        bg_rgb = gct[meta["bg"]]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    done: dict[int, np.ndarray] = {}
    upto = max(want) if want else -1
    for fi in range(upto + 1):
        f = frames[fi]
        pal = f["palette"]
        if pal is None:
            raise ValueError("corrupt GIF: frame without a color table")
        idx = _lzw_decode(f["lzw"], f["mcs"],
                          f["w"] * f["h"]).reshape(f["h"], f["w"])
        if f["interlaced"]:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("corrupt GIF: palette index out of range")
        if f["disposal"] == 3:
            saved = canvas.copy()
        y0, x0 = f["y"], f["x"]
        if y0 + f["h"] > h or x0 + f["w"] > w:
            raise ValueError("corrupt GIF: frame exceeds logical screen")
        region = canvas[y0:y0 + f["h"], x0:x0 + f["w"]]
        rgb = pal[idx]
        if f["transparent"] is not None:
            keep = (idx == f["transparent"])[:, :, None]
            rgb = np.where(keep, region, rgb)
        region[:] = rgb
        if fi in want:
            done[fi] = canvas.copy()
        # disposal applies AFTER this frame is displayed
        if f["disposal"] == 2:
            canvas[y0:y0 + f["h"], x0:x0 + f["w"]] = bg_rgb
        elif f["disposal"] == 3:
            canvas = saved
    return list(order), [done[i] for i in order]
