"""TIFF codec: PackBits and early-change LZW roundtrips, predictor,
multi-strip assembly, both byte orders, registry + quarantine e2e."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ariadne_spark.functions import codecs
from ariadne_spark.functions.tiff import (
    _packbits_decode,
    _packbits_encode,
    _tlzw_decode,
    _tlzw_encode,
    decode_tiff,
    encode_tiff,
)


# ---------------------------------------------------------------------------
# compression layers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [0, 1, 5, 300, 5000])
def test_packbits_roundtrip(n):
    rng = np.random.default_rng(n + 1)
    # runs + literals mixed: realistic image bytes
    data = bytes(np.repeat(rng.integers(0, 256, max(n // 3, 1)),
                           rng.integers(1, 6, max(n // 3, 1)))[:n].astype(np.uint8))
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


def test_packbits_long_runs_and_literals():
    data = b"\x00" * 500 + bytes(range(256)) * 2 + b"\xff" * 129
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


@pytest.mark.parametrize("n", [1, 64, 4096, 60000])
def test_tiff_lzw_roundtrip(n):
    rng = np.random.default_rng(n)
    data = bytes(rng.integers(0, 256, n, dtype=np.uint8))  # forces resets at 60k
    assert _tlzw_decode(_tlzw_encode(data), n) == data


def test_tiff_lzw_early_change_boundary():
    """Data sized to walk the width transitions (511/1023/2047 with
    early change) — a GIF-timing decoder desynchronizes here."""
    data = bytes(np.arange(2000) % 251).__add__(b"\x07" * 3000)
    assert _tlzw_decode(_tlzw_encode(data), len(data)) == data


def test_tiff_lzw_truncated_raises():
    enc = _tlzw_encode(b"hello world" * 40)
    with pytest.raises(ValueError, match="truncated|early|corrupt"):
        _tlzw_decode(enc[: len(enc) // 3], 440)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
def test_tiff_roundtrip_exact(compression):
    rng = np.random.default_rng(17)
    for shape in [(1, 1, 3), (7, 5, 3), (64, 48, 3), (130, 31, 3)]:  # >64 rows: multi-strip
        px = rng.integers(0, 256, shape, np.uint8)
        out = decode_tiff(encode_tiff(px, compression))
        np.testing.assert_array_equal(out, px)


def test_tiff_predictor_applied_with_lzw():
    # smooth gradients compress far better under predictor 2 + LZW
    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    px = np.stack([grad, grad, grad], axis=2)
    lzw = encode_tiff(px, "lzw")
    none = encode_tiff(px, "none")
    assert len(lzw) < len(none) // 4
    np.testing.assert_array_equal(decode_tiff(lzw), px)


def test_tiff_big_endian_decodes():
    """Byte-swap a little-endian file into a conforming MM stream:
    same pixels must decode (uncompressed, single strip)."""
    rng = np.random.default_rng(18)
    px = rng.integers(0, 256, (16, 8, 3), np.uint8)
    le = bytearray(encode_tiff(px, "none"))
    # rebuild as big-endian: header + IFD numerics swapped
    out = bytearray(b"MM\x00*")
    (ifd_off,) = struct.unpack("<I", le[4:8])
    out += struct.pack(">I", ifd_off)
    (n,) = struct.unpack("<H", le[ifd_off : ifd_off + 2])
    body = bytearray(le[8:])  # arrays + strips region, patched below
    # easier: reconstruct entries by parsing LE and re-packing BE
    entries = []
    for k in range(n):
        off = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack("<HHI", le[off : off + 8])
        raw = le[off + 8 : off + 12]
        sz = {3: 2, 4: 4}[typ]
        if sz * count <= 4:
            vals = struct.unpack("<" + str(count) + ("H" if typ == 3 else "I"),
                                 raw[: sz * count])
            raw_be = struct.pack(">" + str(count) + ("H" if typ == 3 else "I"), *vals)
            raw_be += b"\x00" * (4 - len(raw_be))
        else:
            (ptr,) = struct.unpack("<I", raw)
            raw_be = struct.pack(">I", ptr)
        entries.append(struct.pack(">HHI", tag, typ, count) + raw_be)
    out += le[8:ifd_off]
    out += struct.pack(">H", n) + b"".join(entries) + struct.pack(">I", 0)
    tail_start = ifd_off + 2 + 12 * n + 4
    # swap the BitsPerSample shorts + offset/count long arrays in the tail
    tail = bytearray(le[tail_start:])
    tail[0:6] = struct.pack(">HHH", 8, 8, 8)
    # single strip => offsets/counts were inlined in the IFD; rest is data
    out += tail
    np.testing.assert_array_equal(decode_tiff(bytes(out)), px)


def test_tiff_rejects_unsupported_layouts():
    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, (8, 8, 3), np.uint8)
    data = bytearray(encode_tiff(px, "none"))
    # flip PhotometricInterpretation (tag 262) value to 1 (grayscale)
    (ifd_off,) = struct.unpack("<I", data[4:8])
    (n,) = struct.unpack("<H", data[ifd_off : ifd_off + 2])
    for k in range(n):
        off = ifd_off + 2 + 12 * k
        tag = struct.unpack("<H", data[off : off + 2])[0]
        if tag == 262:
            data[off + 8 : off + 10] = struct.pack("<H", 1)
    with pytest.raises(ValueError, match="RGB8 only"):
        decode_tiff(bytes(data))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XXXX" + bytes(data[4:]))


def test_tiff_registry_and_quarantine(spark):
    import pandas as pd

    from ariadne_spark.operators.decode import quarantine_scan

    rng = np.random.default_rng(20)
    px = rng.integers(0, 256, (20, 30, 3), np.uint8)
    blob = codecs.encode_image(px, "tiff")
    np.testing.assert_array_equal(codecs.decode_image(blob, "tiff"), px)
    rows = [
        {"image_id": "tif_ok", "bytes": blob, "w": 30, "h": 20, "fmt": "tiff"},
        {"image_id": "tif_cut", "bytes": blob[:40], "w": 30, "h": 20, "fmt": "tiff"},
        {"image_id": "tif_badmagic", "bytes": b"XX" + blob[2:], "w": 30,
         "h": 20, "fmt": "tiff"},
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    got = {r["image_id"]: (r["ok"], r["error_kind"])
           for r in quarantine_scan(df).collect()}
    assert got["tif_ok"] == (True, None)
    assert got["tif_cut"][0] is False
    assert got["tif_badmagic"] == (False, "bad_magic")
