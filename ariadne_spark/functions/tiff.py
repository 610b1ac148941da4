"""Baseline TIFF codec (RGB8) — pure stdlib + numpy, fourth
real-world format through the codec registry.

Decode: both byte orders (II/MM), single- or multi-strip RGB8 with
Compression = none (1), LZW (5), or PackBits (32773), optional
horizontal-differencing Predictor (2, the common companion of LZW),
chunky planar configuration. Encode: the same three compressions,
little-endian, single IFD, strip-per-64-rows.

TIFF's LZW differs from GIF's in two documented ways this module
implements explicitly: bits are packed MSB-first, and the code width
grows ONE CODE EARLY ("early change" — width bumps when the next
code to be assigned is 2^width - 1, not 2^width; TIFF 6.0 spec
section 13). Codes start at 9 bits with ClearCode 256 / EOI 257.

Scale posture: like GIF, the LZW inner loops are scalar python — the
registry-seam contract is correctness + dispatch; 'fjpg'/JPEG remain
the bench hot paths. Spec: TIFF 6.0 (Adobe, public), PackBits from
its section 9.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9)
# ---------------------------------------------------------------------------


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:  # replicate run
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run: until the next >=3 replicate or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expect and i < n:
        b = data[i]
        i += 1
        if b < 128:  # literal of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # replicate next byte 257-b times
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op per spec
    if len(out) < expect:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expect])


# ---------------------------------------------------------------------------
# TIFF LZW (MSB-first, early change — TIFF 6.0 section 13)
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def _tlzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nb = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nb
        acc = (acc << width) | code
        nb += width
        while nb >= 8:
            out.append((acc >> (nb - 8)) & 0xFF)
            nb -= 8
        acc &= (1 << nb) - 1

    width = 9
    table: dict[tuple[int, int], int] = {}
    next_code = _EOI + 1
    put(_CLEAR, width)
    it = iter(data)
    cur = next(it, None)
    if cur is None:
        put(_EOI, width)
    else:
        for sym in it:
            code = table.get((cur, sym))
            if code is not None:
                cur = code
                continue
            put(cur, width)
            table[(cur, sym)] = next_code
            next_code += 1
            # EARLY CHANGE: grow when the next assignable code would
            # be 2^width - 1 (one earlier than GIF)
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            if next_code == 4094:  # table nearly full: reset
                put(_CLEAR, width)
                table.clear()
                next_code = _EOI + 1
                width = 9
            cur = sym
        put(cur, width)
        put(_EOI, width)
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)


def _tlzw_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    acc = 0
    nb = 0
    i = 0
    n = len(data)
    width = 9
    base = [bytes([b]) for b in range(256)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None
    while len(out) < expect:
        while nb < width:
            if i >= n:
                raise ValueError("truncated LZW strip")
            acc = (acc << 8) | data[i]
            i += 1
            nb += 8
        code = (acc >> (nb - width)) & ((1 << width) - 1)
        nb -= width
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # early change, compensated for the decoder's one-entry lag:
        # the encoder switches after DEFINING code 2^w - 2 (TIFF 6.0
        # errata), but the decoder creates each entry one symbol later
        # than the encoder defines it — so it must widen when the next
        # entry TO CREATE is 2^w - 2 (len(table) == that), i.e. one
        # append before the same-rule condition would fire (this is
        # libtiff's `free_ent > nbitsmask - 1` pre-read check)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    if len(out) < expect:
        raise ValueError("LZW strip ended early")
    return bytes(out[:expect])


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_COMP = {"none": 1, "lzw": 5, "packbits": 32773}


def encode_tiff(px: np.ndarray, compression: str = "none") -> bytes:
    """HxWx3 uint8 RGB -> little-endian TIFF, strips of 64 rows,
    optional LZW (with horizontal predictor, the standard pairing) or
    PackBits compression."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    comp = _COMP[compression]
    rows_per_strip = 64
    predictor = 2 if compression == "lzw" else 1
    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = px[y0 : y0 + rows_per_strip]
        if predictor == 2:
            rows = rows.astype(np.int16)
            rows = np.concatenate(
                [rows[:, :1], np.diff(rows, axis=1)], axis=1
            ).astype(np.uint8)  # mod-256 horizontal differencing
        raw = rows.tobytes()
        if compression == "none":
            strips.append(raw)
        elif compression == "packbits":
            strips.append(_packbits_encode(raw))
        else:
            strips.append(_tlzw_encode(raw))

    n_strips = len(strips)

    def entry(tag, typ, count, value):
        return struct.pack("<HHI4s", tag, typ, count, value)

    # layout: header(8) + IFD + arrays + strip data
    n_entries = 11
    ifd_size = 2 + n_entries * 12 + 4
    pos = 8 + ifd_size
    bps_off = pos
    pos += 6  # BitsPerSample [8,8,8] as 3 shorts
    offs_off = pos
    pos += 4 * n_strips
    cnts_off = pos
    pos += 4 * n_strips
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def long4(v):
        return struct.pack("<I", v)

    def short4(v):
        return struct.pack("<HH", v, 0)

    entries = [
        entry(256, 3, 1, short4(w)),            # ImageWidth
        entry(257, 3, 1, short4(h)),            # ImageLength
        entry(258, 3, 3, long4(bps_off)),       # BitsPerSample
        entry(259, 3, 1, short4(comp)),         # Compression
        entry(262, 3, 1, short4(2)),            # Photometric = RGB
        entry(273, 4, n_strips,
              long4(strip_offsets[0]) if n_strips == 1 else long4(offs_off)),
        entry(277, 3, 1, short4(3)),            # SamplesPerPixel
        entry(278, 3, 1, short4(rows_per_strip)),
        entry(279, 4, n_strips,
              long4(len(strips[0])) if n_strips == 1 else long4(cnts_off)),
        entry(284, 3, 1, short4(1)),            # PlanarConfig chunky
        entry(317, 3, 1, short4(predictor)),
    ]
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", n_entries) + b"".join(entries) + long4(0)
    out += struct.pack("<HHH", 8, 8, 8)
    out += b"".join(long4(o) for o in strip_offsets)
    out += b"".join(long4(len(s)) for s in strips)
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> HxWx3 uint8 RGB (first IFD)."""
    if data[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF")
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack(bo + "HHI", data[off : off + 8])
        tags[tag] = (typ, count, data[off + 8 : off + 12])

    sizes = {1: 1, 2: 1, 3: 2, 4: 4}

    def values(tag, default=None):
        if tag not in tags:
            return default
        typ, count, raw = tags[tag]
        sz = sizes.get(typ)
        if sz is None:
            raise ValueError(f"unsupported TIFF field type {typ}")
        total = sz * count
        buf = raw[:total] if total <= 4 else data[
            struct.unpack(bo + "I", raw)[0] :
        ][:total]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        return list(struct.unpack(bo + str(count) + fmt, buf))

    w = values(256)[0]
    h = values(257)[0]
    comp = values(259, [1])[0]
    photo = values(262, [2])[0]
    spp = values(277, [3])[0]
    predictor = values(317, [1])[0]
    if photo != 2 or spp != 3:
        raise ValueError(
            f"engine TIFF codec supports chunky RGB8 only "
            f"(photometric {photo}, {spp} samples)"
        )
    bps = values(258, [8, 8, 8])
    if bps != [8, 8, 8]:
        raise ValueError("engine TIFF codec supports 8 bits/sample only")
    if values(284, [1])[0] != 1:
        raise ValueError("engine TIFF codec supports chunky planar only")
    rows_per_strip = values(278, [h])[0]
    offsets = values(273)
    counts = values(279)
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")

    out = np.empty((h, w, 3), np.uint8)
    y = 0
    for off, cnt in zip(offsets, counts):
        nrows = min(rows_per_strip, h - y)
        expect = nrows * w * 3
        raw = data[off : off + cnt]
        if comp == 1:
            buf = bytes(raw[:expect])
            if len(buf) < expect:
                raise ValueError("truncated TIFF strip")
        elif comp == 32773:
            buf = _packbits_decode(raw, expect)
        else:
            buf = _tlzw_decode(raw, expect)
        rows = np.frombuffer(buf, np.uint8).reshape(nrows, w, 3)
        if predictor == 2:
            rows = np.cumsum(rows.astype(np.int64), axis=1).astype(np.uint8)
        out[y : y + nrows] = rows
        y += nrows
    if y < h:
        raise ValueError("TIFF strips do not cover the image")
    return out
