"""GIF87a/89a codec — pure stdlib+numpy LZW, palette, interlace,
multi-frame animation.

Animated GIF is the one multi-frame container implementable without
codec libraries, which makes the frame-sampling story REAL end to
end: ``FrameSampler`` (ops/multimodal.py) is the byte-slicing
stand-in for video; ``gif_frames`` below actually decodes frames —
variable-width LSB-first LZW with dictionary growth and CLEAR/EOI
handling, 4-pass interlace reordering, per-frame graphic-control
delays, local/global palettes, transparency skip — so a frame-level
pipeline (sample → hash → dedup → feature) runs on genuinely decoded
pixels. The duality encoder writes real LZW streams (dictionary
build, width growth, 4096-entry reset), not uncompressed escapes.

Oracle strategy (``multimodal_gif_frames`` in __ray_entry__): the
corpus generator tiles each frame's pixel indices from the ASCII hex
of ``md5(doc text)`` through a gray identity palette, so the DECODED
frame bytes equal a substring of ``repeat(md5(text), …)`` — plain
DuckDB string arithmetic reproduces the md5 of every decoded frame,
meaning the value-hash gate verifies the LZW round-trip (and the
de-interlace, which is a no-op on the decoded array) byte-for-byte.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytes:
    """GIF variable-width LSB-first LZW → index bytes."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("corrupt GIF LZW stream")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            if len(out) > max_pixels:
                raise ValueError("corrupt GIF LZW stream")
            prev = entry
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real LZW encoder (dictionary build, width growth, reset)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [
        y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
    ]
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def _interlace_order(h: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]


def parse_gif(data: bytes):
    """GIF → (w, h, frames, delays_cs). ``frames`` is a list of
    (h, w, 3) uint8 arrays composed onto the logical screen (disposal
    1/none semantics: draw over previous; transparent pixels skip);
    ``delays_cs`` the per-frame graphic-control delays in
    centiseconds. Raises ValueError with deterministic messages."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", data, 6)
    if w <= 0 or h <= 0:
        raise ValueError("bad GIF dimensions")
    flags = data[10]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated GIF")
        global_pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay = 0
    transparent = -1

    def _read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF")
            n = data[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            if p + n > len(data):
                raise ValueError("truncated GIF")
            chunks.append(data[p : p + n])
            p += n

    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos + 1 > len(data):
                raise ValueError("truncated GIF")
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(pos)
            if label == 0xF9 and len(payload) >= 4:
                gce_flags = payload[0]
                delay = struct.unpack_from("<H", payload, 1)[0]
                transparent = payload[3] if gce_flags & 1 else -1
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("truncated GIF")
            left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
            iflags = data[pos + 8]
            pos += 9
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                if pos + 3 * n > len(data):
                    raise ValueError("truncated GIF")
                pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame has no palette")
            if pos >= len(data):
                raise ValueError("truncated GIF")
            min_code = data[pos]
            pos += 1
            if not (2 <= min_code <= 11):
                raise ValueError("bad GIF LZW code size")
            lzw, pos = _read_subblocks(pos)
            idx = _lzw_decode(min_code, lzw, fw * fh)
            if len(idx) < fw * fh:
                raise ValueError("truncated GIF frame data")
            rows = np.frombuffer(idx[: fw * fh], np.uint8).reshape(fh, fw)
            if iflags & 0x40:
                rows = _deinterlace(rows)
            if int(rows.max(initial=0)) >= len(pal):
                raise ValueError("GIF index out of palette range")
            if left + fw > w or top + fh > h:
                raise ValueError("GIF frame exceeds canvas")
            region = canvas[top : top + fh, left : left + fw]
            rgb = pal[rows]
            if transparent >= 0:
                mask = rows != transparent
                region[mask] = rgb[mask]
            else:
                region[...] = rgb
            frames.append(canvas.copy())
            delays.append(delay)
            delay = 0
            transparent = -1
        else:
            raise ValueError("bad GIF block")
    if not frames:
        raise ValueError("GIF has no frames")
    return w, h, frames, delays


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays_cs: list[int] | None = None,
    interlace_frame0: bool = False,
) -> bytes:
    """Animated GIF writer over INDEX frames: each frame is an (h, w)
    uint8 index array into ``palette`` ((n, 3) uint8, n a power of
    two ≥ 4). Real LZW streams; optional interlacing of frame 0 (the
    decoder's de-interlace then has to undo it)."""
    h, w = frames[0].shape
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    if 1 << bits != n:
        raise ValueError("palette size must be a power of two")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += bytes(palette.astype(np.uint8).reshape(-1))
    for f, frame in enumerate(frames):
        delay = (delays_cs or [0] * len(frames))[f]
        out += bytes([0x21, 0xF9, 4, 0]) + struct.pack("<H", delay) + bytes([0, 0])
        inter = interlace_frame0 and f == 0
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if inter else 0x00])
        rows = frame[np.asarray(_interlace_order(h))] if inter else frame
        min_code = max(2, bits)
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, bytes(rows.reshape(-1)))
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
