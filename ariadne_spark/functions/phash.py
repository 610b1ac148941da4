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


def np_phash_from_pixels(px: np.ndarray) -> int:
    """HxWx3 uint8 -> 64-bit perceptual hash (signed int64)."""
    luma = (
        299 * px[:, :, 0].astype(np.int64)
        + 587 * px[:, :, 1].astype(np.int64)
        + 114 * px[:, :, 2].astype(np.int64)
    ) // 1000
    h, w = luma.shape
    yi = (np.arange(_DCT_N) * h) // _DCT_N
    xi = (np.arange(_DCT_N) * w) // _DCT_N
    small = luma[np.ix_(yi, xi)].astype(np.float64)
    coef = _DCT @ small @ _DCT.T
    block = coef[:8, :8].ravel()
    med = np.median(block)
    bits = block > med
    out = np.uint64(0)
    for b in bits:  # 64 iterations per image, inside an Arrow batch
        out = (out << np.uint64(1)) | np.uint64(bool(b))
    return int(out.astype(np.int64))


def np_phash_from_bytes(data: bytes, fmt: str) -> int:
    return np_phash_from_pixels(decode_image(data, fmt))


@pandas_udf(LongType())
def phash_udf(data: pd.Series, fmt: pd.Series) -> pd.Series:
    """Arrow-batched phash: Series[binary], Series[string] -> Series[long]."""
    return pd.Series(
        [np_phash_from_bytes(d, f) for d, f in zip(data, fmt)], dtype="int64"
    )


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
