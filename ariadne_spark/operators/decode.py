"""Decode stage + per-row invariants — the engine's "parse" operator.

The reference parses text to ASTs and extracts typed captures
(`packages/core/src/project/project.ts:63-101` tree-sitter parse;
`index_single_file/query_code_tree/query_code_tree.ts:44-55` capture
extraction). Here the payload is pixels: decode `bytes` per Arrow
batch, emit typed feature columns, and verify the BASELINE.json
input_hint per-row invariant:

    "decoded-pixel allclose (PSNR>=40dB for lossy) + caption equality"

For the deterministic fixture the pre-encode truth is recomputable from
the row id (`synth/images.py:render_pixels` / `make_caption`), so the
invariant is checkable row-by-row with no reference binary:
- png rows must decode EXACTLY (PSNR = inf);
- lossy rows must reach PSNR >= 40 dB vs the rendered truth;
- caption must equal the regenerated caption;
- stored phash must equal the phash of the decoded payload.

All work is vectorized per Arrow batch inside mapInPandas (numpy per
image, no Spark-row-level Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import decode_image, psnr
from ..functions.phash import np_phash_from_pixels

PSNR_GATE_DB = 40.0

FEATURES_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "luma_p50 int, edge_energy double"
)

INVARIANTS_SCHEMA = (
    "image_id string, fmt string, psnr double, pixels_ok boolean, "
    "caption_ok boolean, phash_ok boolean"
)


def decode_features(images: DataFrame) -> DataFrame:
    """bytes -> typed feature columns (the capture-extraction analog:
    one vectorized pass emitting one column per feature, SURVEY.md S4)."""

    def extract(iterator):
        for pdf in iterator:
            rows = []
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                luma = (
                    299 * px[:, :, 0].astype(np.int64)
                    + 587 * px[:, :, 1].astype(np.int64)
                    + 114 * px[:, :, 2].astype(np.int64)
                ) // 1000
                gx = np.abs(np.diff(luma.astype(np.int64), axis=1)).mean() if px.shape[1] > 1 else 0.0
                gy = np.abs(np.diff(luma.astype(np.int64), axis=0)).mean() if px.shape[0] > 1 else 0.0
                rows.append(
                    (
                        img_id,
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        int(np.median(luma)),
                        float(gx + gy),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "mean_r", "mean_g", "mean_b", "luma_p50", "edge_energy",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        extract, FEATURES_SCHEMA
    )


def decode_invariants(images: DataFrame) -> DataFrame:
    """Per-row invariant table for the deterministic fixture (requires
    `image_id` of the form img_<i> so the truth is recomputable)."""
    from ..synth.images import make_caption, render_pixels

    def check(iterator):
        for pdf in iterator:
            rows = []
            for img_id, blob, fmt, caption, stored_phash in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["caption"], pdf["phash"]
            ):
                i = int(img_id.split("_")[-1])
                px = decode_image(bytes(blob), fmt)
                from ..synth.images import neardup_parents, perturb_pixels

                parent = int(neardup_parents(np.array([i], dtype=np.int64))[0])
                if parent >= 0:
                    truth = perturb_pixels(
                        render_pixels(parent, px.shape[1], px.shape[0]), i
                    )
                else:
                    truth = render_pixels(i, px.shape[1], px.shape[0])
                p = psnr(truth, px)
                pixels_ok = bool(
                    np.array_equal(truth, px) if fmt == "png" else p >= PSNR_GATE_DB
                )
                rows.append(
                    (
                        img_id,
                        fmt,
                        float(min(p, 99.0)),
                        pixels_ok,
                        caption == make_caption(i),
                        int(stored_phash) == np_phash_from_pixels(px),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "psnr", "pixels_ok", "caption_ok", "phash_ok"],
            )

    return images.select("image_id", "bytes", "fmt", "caption", "phash").mapInPandas(
        check, INVARIANTS_SCHEMA
    )


def invariant_summary(images: DataFrame) -> DataFrame:
    """(fmt, n_rows, n_pixel_violations, n_caption_violations,
    n_phash_violations, min_psnr) — must be all-zero violations."""
    inv = decode_invariants(images)
    return inv.groupBy("fmt").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(~F.col("pixels_ok"), 1).otherwise(0)).alias("n_pixel_violations"),
        F.sum(F.when(~F.col("caption_ok"), 1).otherwise(0)).alias("n_caption_violations"),
        F.sum(F.when(~F.col("phash_ok"), 1).otherwise(0)).alias("n_phash_violations"),
        F.min("psnr").alias("min_psnr"),
    )


RESIZED_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string"
)


def np_resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure integer index math — deterministic
    across platforms, no float filter kernels)."""
    h, w, _ = px.shape
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[ys][:, xs]


def resize_images(images: DataFrame, max_side: int) -> DataFrame:
    """Thumbnail stage: decode -> aspect-preserving nearest-neighbor
    downscale to `max_side` -> re-encode in the row's own format
    (registry dispatch). Rows already within bounds pass through
    re-encoded, so the output column is uniformly derived. One
    mapInPandas pass, zero shuffles — the bulk-preprocessing shape a
    training-data pipeline needs (the reference's analog is the
    per-language preprocess hook, `packages/core/src/resolve_references/
    preprocess_references.ts:31-57`: a payload-rewrite stage between
    parse and resolution)."""
    from ..functions.codecs import encode_image

    def run(iterator):
        for pdf in iterator:
            ids, blobs, ws, hs, fmts = [], [], [], [], []
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                h, w, _ = px.shape
                if max(w, h) > max_side:
                    if w >= h:
                        ow = max_side
                        oh = max(1, (h * max_side) // w)
                    else:
                        oh = max_side
                        ow = max(1, (w * max_side) // h)
                    px = np_resize_nearest(px, ow, oh)
                ids.append(img_id)
                blobs.append(encode_image(px, fmt))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                fmts.append(fmt)
            yield pd.DataFrame(
                {"image_id": ids, "bytes": blobs, "w": ws, "h": hs, "fmt": fmts}
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, RESIZED_SCHEMA
    )
