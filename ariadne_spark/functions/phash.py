"""64-bit DCT perceptual hash + Hamming distance.

The reference links call sites to definitions by name/location match
(`packages/core/src/resolve_references/call_resolver.ts:391-463`); the
spatial analog links images to their nearest perceptual neighbors. The
hash: decode -> integer luma -> nearest-neighbor resample to 32x32 ->
2-D DCT-II (matrix form, float64) -> top-left 8x8 coefficient block ->
bit = coefficient > median. Deterministic, pure numpy.

Hamming distance stays JVM-side: `bit_count(a ^ b)` — a built-in since
Spark 3.3, so the kNN hot path never touches Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .codecs import decode_image

_DCT_N = 32


def _dct_matrix(n: int = _DCT_N) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT = _dct_matrix()
_GRID_CACHE: dict = {}  # (h, w) -> np.ix_ subsample grid (images repeat sizes)


def _coef_block(px: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 -> the 64 low-frequency DCT coefficients (float64).

    Subsample BEFORE the luma arithmetic (pointwise integer ops commute
    with sampling — bit-identical, 4x+ less work for >32px images); the
    two 32x32 matmuls stay per-image 2-D `@` so the float operation
    order is exactly the original's."""
    h, w = px.shape[:2]
    key = (h, w)
    grid = _GRID_CACHE.get(key)
    if grid is None:
        yi = (np.arange(_DCT_N) * h) // _DCT_N
        xi = (np.arange(_DCT_N) * w) // _DCT_N
        grid = _GRID_CACHE[key] = np.ix_(yi, xi)
    s = px[grid]
    # int32 is exact here (max 255*(299+587+114) = 255000 < 2^31) and
    # halves the integer bandwidth vs int64
    luma = (
        299 * s[:, :, 0].astype(np.int32)
        + 587 * s[:, :, 1].astype(np.int32)
        + 114 * s[:, :, 2].astype(np.int32)
    ) // 1000
    coef = _DCT @ luma.astype(np.float64) @ _DCT.T
    return coef[:8, :8].ravel()


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n, 64) bool, first bit = MSB -> (n,) signed int64 (same wrap as
    uint64.astype(int64)); pure integer ops, vectorized packbits
    replacing the former 64-iteration python loop (was 2/3 of phash
    CPU)."""
    packed = np.packbits(bits, axis=1)  # big bitorder: bit 0 -> MSB
    return packed.view(">u8").ravel().astype(np.uint64).view(np.int64)


def np_phash_from_pixels(px: np.ndarray) -> int:
    """HxWx3 uint8 -> 64-bit perceptual hash (signed int64)."""
    block = _coef_block(px)
    bits = (block > np.median(block)).reshape(1, 64)
    return int(_pack_bits(bits)[0])


def np_phash_from_bytes(data: bytes, fmt: str) -> int:
    return np_phash_from_pixels(decode_image(data, fmt))


@pandas_udf(LongType())
def phash_udf(data: pd.Series, fmt: pd.Series) -> pd.Series:
    """Arrow-batched phash: Series[binary], Series[string] -> Series[long].

    Decode + DCT run per image (the float path must stay bit-identical
    to the single-image form); the median threshold and bit packing are
    vectorized across the whole Arrow batch (np.median over axis=1
    performs the identical per-row computation)."""
    if len(data) == 0:
        return pd.Series([], dtype="int64")
    blocks = np.stack(
        [_coef_block(decode_image(d, f)) for d, f in zip(data, fmt)]
    )
    med = np.median(blocks, axis=1, keepdims=True)
    return pd.Series(_pack_bits(blocks > med), dtype="int64")


def hamming(a: Column, b: Column) -> Column:
    """popcount(a XOR b) — JVM built-in, no Python."""
    return F.bit_count(a.bitwiseXOR(b))


def phash_band(phash: Column, band: int, n_bands: int = 4) -> Column:
    """band-th 16-bit slice of the hash (LSH banding for candidate gen).

    Two hashes within Hamming distance d share at least one identical
    band when d < n_bands (pigeonhole), so banding is exact for
    d <= n_bands - 1 and high-recall beyond.
    """
    width = 64 // n_bands
    return F.shiftrightunsigned(phash, band * width) % F.lit(1 << width)
