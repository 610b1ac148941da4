"""GIF87a/89a codec — pure stdlib + numpy, third real-world format
through the codec registry (after PNG/BMP and real JPEG), second
proof of the `register_codec` seam.

Decode: header + logical screen descriptor, global/local color
tables, extension blocks (skipped; a GCE transparent index renders as
its palette color — the engine's columns are RGB), FIRST image frame
only (animation frames beyond the first are a different data model —
the `multimodal` video operators own frame sequences), interlaced or
sequential rows, variable-width LSB-first LZW with clear/EOI codes
and table growth to 12 bits. Encode: single frame, global color
table built from the image's unique colors (<= 256 required — GIF is
a palette format; quantize upstream), standard LZW with table reset
at 4096 codes.

The LZW inner loops are scalar python — the codec-seam contract here
is correctness + registry dispatch (like the progressive-JPEG path);
the bench hot path remains 'fjpg'/baseline-JPEG. Spec: GIF89a
specification (CompuServe, public), LZW per its Appendix F.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF8"


class _LsbWriter:
    """LSB-first variable-width bit packer (GIF convention — the
    opposite bit order of JPEG's entropy stream)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    w = _LsbWriter()
    width = mcs + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    w.put(clear, width)
    it = iter(indices.tolist())
    cur = next(it)
    for sym in it:
        key = (cur, sym)
        code = table.get(key)
        if code is not None:
            cur = code
            continue
        w.put(cur, width)
        table[key] = next_code
        next_code += 1
        # width grows when the NEXT code to assign no longer fits
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4096:  # table full: reset (max-width clear)
            w.put(clear, width)
            table.clear()
            next_code = eoi + 1
            width = mcs + 1
        cur = sym
    w.put(cur, width)
    w.put(eoi, width)
    return w.flush()


def _lzw_decode(data: bytes, mcs: int, npix: int) -> np.ndarray:
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    out = np.empty(npix, np.uint8)
    pos = 0  # write cursor
    acc = 0
    nbits = 0
    i = 0
    n = len(data)
    prev: tuple[int, ...] | None = None
    while pos < npix:
        while nbits < width:
            if i >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[i] << nbits
            i += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW code")
        k = len(entry)
        out[pos : pos + k] = entry[: npix - pos]
        pos += min(k, npix - pos)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    if pos < npix:
        raise ValueError("GIF pixel data ended early")
    return out


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(px: np.ndarray) -> bytes:
    """HxWx3 uint8 -> single-frame GIF89a. Requires <= 256 unique
    colors (palette format); raises ValueError otherwise — quantize
    upstream (`decode.posterize` or any <=256-color rendering)."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    packed = (
        px[:, :, 0].astype(np.int64) << 16
        | px[:, :, 1].astype(np.int64) << 8
        | px[:, :, 2].astype(np.int64)
    ).ravel()
    colors, indices = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF is a palette format: {len(colors)} unique colors > 256 "
            "— quantize upstream"
        )
    # GCT size is a power of two >= 2; mcs covers the palette
    k = 1
    while (1 << (k + 1)) < max(len(colors), 2):
        k += 1
    gct_n = 1 << (k + 1)
    mcs = max(2, k + 1)
    pal = np.zeros((gct_n, 3), np.uint8)
    pal[: len(colors), 0] = (colors >> 16) & 0xFF
    pal[: len(colors), 1] = (colors >> 8) & 0xFF
    pal[: len(colors), 2] = colors & 0xFF

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (7 << 4) | k, 0, 0])  # GCT present, size 2^(k+1)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)
    out += _subblocks(_lzw_encode(indices.astype(np.int64), mcs))
    out += b"\x3b"
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> HxWx3 uint8 RGB (first frame)."""
    assert data[:4] == GIF_MAGIC and data[4:6] in (b"7a", b"9a"), "not a GIF"
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[i : i + 3 * n], np.uint8).reshape(n, 3)
        i += 3 * n
    while i < len(data):
        b = data[i]
        if b == 0x3B:  # trailer before any image
            break
        if b == 0x21:  # extension: label + sub-blocks, skipped
            i += 2
            while data[i]:
                i += 1 + data[i]
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X} at byte {i}")
        x0, y0, w, h, iflags = struct.unpack("<HHHHB", data[i + 1 : i + 10])
        i += 10
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[i : i + 3 * n], np.uint8).reshape(n, 3)
            i += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        mcs = data[i]
        i += 1
        lzw = bytearray()
        while data[i]:
            ln = data[i]
            lzw += data[i + 1 : i + 1 + ln]
            i += 1 + ln
        idx = _lzw_decode(bytes(lzw), mcs, w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced: 4-pass row order
            rows = np.empty(h, np.int64)  # rows[y] = stream position of row y
            r = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    rows[y] = r
                    r += 1
            idx = idx[rows]
        frame = pal[idx]
        # first frame only; a full-screen canvas would composite here
        out = np.zeros((sh, sw, 3), np.uint8)
        out[y0 : y0 + h, x0 : x0 + w] = frame
        return out
    raise ValueError("GIF contains no image frame")
