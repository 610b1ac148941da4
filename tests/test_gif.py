"""GIF codec: LZW roundtrips (incl. table resets and the KwKwK case),
interlace, registry dispatch, quarantine classification, Spark e2e."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ariadne_spark.functions import codecs
from ariadne_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _palette_image(rng, h, w, ncolors):
    pal = rng.integers(0, 256, (ncolors, 3), np.uint8)
    idx = rng.integers(0, ncolors, (h, w))
    return pal[idx]


# ---------------------------------------------------------------------------
# LZW layer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mcs,n,ncodes", [(2, 40, 4), (4, 500, 13), (8, 20000, 250)])
def test_lzw_roundtrip(mcs, n, ncodes):
    rng = np.random.default_rng(mcs * 100 + n)
    data = rng.integers(0, ncodes, n).astype(np.int64)
    out = _lzw_decode(_lzw_encode(data, mcs), mcs, n)
    np.testing.assert_array_equal(out, data.astype(np.uint8))


def test_lzw_roundtrip_forces_table_reset():
    """>4096 dictionary entries: the encoder must emit a mid-stream
    clear code and both sides must resynchronize."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 60_000).astype(np.int64)  # ~noise: fast growth
    out = _lzw_decode(_lzw_encode(data, 8), 8, len(data))
    np.testing.assert_array_equal(out, data.astype(np.uint8))


def test_lzw_kwkwk_case():
    # 'aaaa...' triggers the code-equals-table-size (KwKwK) branch
    data = np.zeros(50, np.int64)
    out = _lzw_decode(_lzw_encode(data, 2), 2, 50)
    np.testing.assert_array_equal(out, np.zeros(50, np.uint8))


def test_lzw_truncated_raises():
    enc = _lzw_encode(np.arange(64) % 16, 4)
    with pytest.raises(ValueError, match="truncated|ended early|corrupt"):
        _lzw_decode(enc[: len(enc) // 2], 4, 64)


# ---------------------------------------------------------------------------
# container layer
# ---------------------------------------------------------------------------


def test_gif_roundtrip_exact():
    rng = np.random.default_rng(11)
    for ncol in (2, 5, 17, 256):
        px = _palette_image(rng, 23, 37, ncol)
        out = decode_gif(encode_gif(px))
        np.testing.assert_array_equal(out, px)


def test_gif_single_pixel_and_single_color():
    np.testing.assert_array_equal(
        decode_gif(encode_gif(np.full((1, 1, 3), 7, np.uint8))),
        np.full((1, 1, 3), 7, np.uint8),
    )
    flat = np.full((16, 16, 3), 200, np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(flat)), flat)


def test_gif_too_many_colors_raises():
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (64, 64, 3), np.uint8)  # ~4096 unique colors
    with pytest.raises(ValueError, match="palette"):
        encode_gif(px)


def test_gif_interlaced_decodes():
    """Hand-build an interlaced variant: same LZW stream, rows
    permuted into the 4-pass order, interlace flag set — must decode
    to the original image."""
    rng = np.random.default_rng(13)
    px = _palette_image(rng, 16, 8, 6)
    plain = encode_gif(px)
    # parse the plain stream: find image descriptor (0x2C)
    i = plain.index(b"\x2c")
    x0, y0, w, h, iflags = struct.unpack("<HHHHB", plain[i + 1 : i + 10])
    assert iflags == 0
    # stream row order for interlace passes on h=16:
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, 16, step)]
    # re-encode the index stream with rows permuted to pass order
    packed = (
        px[:, :, 0].astype(np.int64) << 16
        | px[:, :, 1].astype(np.int64) << 8
        | px[:, :, 2].astype(np.int64)
    )
    colors, inv = np.unique(packed.ravel(), return_inverse=True)
    idx = inv.reshape(16, 8)[order].ravel()
    from ariadne_spark.functions.gif import _lzw_encode as enc, _subblocks

    mcs = plain[i + 10]
    body = _subblocks(enc(idx.astype(np.int64), mcs))
    inter = (
        plain[: i + 9]
        + bytes([0x40])           # interlace flag
        + bytes([mcs])
        + body
        + b"\x3b"
    )
    np.testing.assert_array_equal(decode_gif(inter), px)


def test_gif_extension_blocks_skipped():
    rng = np.random.default_rng(14)
    px = _palette_image(rng, 8, 8, 4)
    data = encode_gif(px)
    # inject a graphic control extension before the image descriptor
    i = data.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    np.testing.assert_array_equal(decode_gif(data[:i] + gce + data[i:]), px)


def test_gif_registry_dispatch_and_quarantine(spark):
    import pandas as pd

    from ariadne_spark.operators.decode import quarantine_scan

    rng = np.random.default_rng(15)
    px = _palette_image(rng, 12, 20, 9)
    blob = codecs.encode_image(px, "gif")  # registry dispatch
    np.testing.assert_array_equal(codecs.decode_image(blob, "gif"), px)
    rows = [
        {"image_id": "gif_ok", "bytes": blob, "w": 20, "h": 12, "fmt": "gif"},
        {"image_id": "gif_badmagic", "bytes": b"XX" + blob[2:], "w": 20,
         "h": 12, "fmt": "gif"},
        {"image_id": "gif_cut", "bytes": blob[: len(blob) // 2], "w": 20,
         "h": 12, "fmt": "gif"},
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    got = {r["image_id"]: (r["ok"], r["error_kind"])
           for r in quarantine_scan(df).collect()}
    assert got["gif_ok"] == (True, None)
    assert got["gif_badmagic"] == (False, "bad_magic")
    assert got["gif_cut"][0] is False


def test_gif_spark_decode_e2e(spark):
    """bytes column -> decode via the registry inside an Arrow-batched
    UDF — the operator-side proof of the codec seam."""
    import pandas as pd

    from ariadne_spark.operators.decode import decode_features

    rng = np.random.default_rng(16)
    rows, means = [], {}
    for i in range(6):
        px = _palette_image(rng, 10 + i, 14, 5 + i)
        rows.append({"image_id": f"g{i}", "bytes": codecs.encode_image(px, "gif"),
                     "fmt": "gif", "w": 14, "h": 10 + i})
        means[f"g{i}"] = float(px[:, :, 0].mean())
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "image_id string, bytes binary, fmt string, w int, h int",
    )
    got = {r["image_id"]: r["mean_r"] for r in decode_features(df).collect()}
    assert len(got) == 6
    for k, v in means.items():  # lossless codec: features exact
        assert abs(got[k] - v) < 1e-9, k
