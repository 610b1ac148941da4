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
    from ..synth.images import (
        make_caption,
        neardup_parents,
        perturb_pixels,
        render_pixels,
    )

    def check(iterator):
        for pdf in iterator:
            rows = []
            # neardup_parents is vectorized: one call per Arrow batch,
            # not one per row
            ids = np.array(
                [int(s.split("_")[-1]) for s in pdf["image_id"]], dtype=np.int64
            )
            parents = (
                neardup_parents(ids) if len(ids) else np.empty(0, dtype=np.int64)
            )
            for (img_id, blob, fmt, caption, stored_phash), i, parent in zip(
                zip(
                    pdf["image_id"],
                    pdf["bytes"],
                    pdf["fmt"],
                    pdf["caption"],
                    pdf["phash"],
                ),
                ids,
                parents,
            ):
                i = int(i)
                parent = int(parent)
                px = decode_image(bytes(blob), fmt)
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


QUARANTINE_SCHEMA = "image_id string, fmt string, ok boolean, error_kind string"


def quarantine_scan(images: DataFrame) -> DataFrame:
    """Never-throwing per-row decode verdict: (image_id, fmt, ok,
    error_kind) — the web-scale operability gate. At 10^12 rows a
    corpus WILL contain truncated uploads, mislabeled containers and
    NULL payloads; any decode stage that raises turns one bad blob
    into a task failure, and after Spark's 4 retries into a dead
    1000-executor job. This scan classifies every row without ever
    raising, so downstream decode stages run on `ok` survivors
    (left-semi join) and the quarantined remainder lands in a sidecar
    with an exact, deterministic reason:

      null_bytes    NULL or empty payload
      unknown_fmt   fmt outside the codec registry
      bad_magic     registered fmt whose container signature mismatches
                    (a mislabeled file — routed before the decoder
                    can misparse it)
      decode_error  signature ok but the stream is corrupt/truncated
      dim_mismatch  decodes cleanly but disagrees with the stored
                    (w, h) metadata — silent-corruption tripwire

    Classification is by byte inspection first (magic registry), so
    the verdict does not depend on which exception a decoder happens
    to raise. One linear mapInPandas pass, zero shuffles; cost is the
    decode the pipeline was about to pay anyway.

    Reference analog: tree-sitter parses are error-tolerant — a file
    that fails to parse yields a degraded index, never a crashed
    project load (`packages/core/src/project/project.ts:186-195`
    wraps the parse; unsupported files are filtered, not fatal,
    `project/file_loading.ts:39-80`).
    """
    from ..functions.codecs import CODECS, FJPG_MAGIC, PNG_SIG

    magics = {
        "png": (PNG_SIG,),
        "fjpg": (FJPG_MAGIC,),
        "bmp": (b"BM",),
        "jpeg": (b"\xff\xd8",),
        "gif": (b"GIF8",),
        # TIFF has two conforming signatures (little/big endian)
        "tiff": (b"II*\x00", b"MM\x00*"),
    }

    def scan(iterator):
        for pdf in iterator:
            kinds = []
            for blob, fmt, w, h in zip(pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]):
                if blob is None or len(blob) == 0:
                    kinds.append("null_bytes")
                    continue
                if fmt not in CODECS:
                    kinds.append("unknown_fmt")
                    continue
                sigs = magics.get(fmt)
                if sigs is not None and not any(
                    bytes(blob[: len(m)]) == m for m in sigs
                ):
                    kinds.append("bad_magic")
                    continue
                try:
                    px = decode_image(bytes(blob), fmt)
                except Exception:
                    kinds.append("decode_error")
                    continue
                if (
                    w is not None
                    and h is not None
                    and not (pd.isna(w) or pd.isna(h))
                    and px.shape[:2] != (int(h), int(w))
                ):
                    kinds.append("dim_mismatch")
                    continue
                kinds.append(None)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "fmt": pdf["fmt"],
                    "ok": [k is None for k in kinds],
                    "error_kind": kinds,
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        scan, QUARANTINE_SCHEMA
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


PATCH_SCHEMA = (
    "image_id string, prow int, pcol int, "
    "sum_r long, sum_g long, sum_b long, patch_bytes binary"
)


def np_patch_sums(px: np.ndarray, p: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (nh, nw, 3) int64 per-patch channel sums over
    the top-left-aligned patch grid (remainder rows/cols dropped —
    ViT-style non-overlapping p x p tiling). Integer sums, not float
    means, so the output is bit-exact on every platform."""
    nh, nw = px.shape[0] // p, px.shape[1] // p
    core = px[: nh * p, : nw * p].astype(np.int64)
    return core.reshape(nh, p, nw, p, 3).sum(axis=(1, 3))


def patchify(
    images: DataFrame, patch: int = 16, emit_pixels: bool = False
) -> DataFrame:
    """ViT-style patch extraction: decode -> split into non-overlapping
    `patch` x `patch` tiles (top-left aligned; right/bottom remainder
    dropped) -> one output row per tile with integer-exact per-channel
    pixel sums, plus the raw HxWx3 patch buffer when `emit_pixels`
    (the tensor a vision-training dataloader consumes; row-major RGB
    uint8, reconstructable via np.frombuffer(...).reshape(p, p, 3)).

    One mapInPandas pass, zero shuffles; fanout is (w//p)*(h//p) rows
    per image, decided per row by data, so the op scales like decode
    itself. The per-image numpy work is a single reshape+sum — no
    per-pixel or per-patch Python. Sums (not means) keep every column
    integer so downstream aggregates stay oracle-exact.

    Reference analog: the capture extraction that turns one parsed file
    into many typed sub-records
    (`packages/core/src/index_single_file/query_code_tree/query_code_tree.ts:44-55`).
    """

    def run(iterator):
        for pdf in iterator:
            ids, prs, pcs = [], [], []
            srs, sgs, sbs, blobs = [], [], [], []
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                nh, nw = px.shape[0] // patch, px.shape[1] // patch
                if nh == 0 or nw == 0:
                    continue  # image smaller than one patch: no rows
                n = nh * nw
                sums = np_patch_sums(px, patch).reshape(n, 3)
                ids.extend([img_id] * n)
                prs.append(np.repeat(np.arange(nh, dtype=np.int32), nw))
                pcs.append(np.tile(np.arange(nw, dtype=np.int32), nh))
                srs.append(sums[:, 0])
                sgs.append(sums[:, 1])
                sbs.append(sums[:, 2])
                if emit_pixels:
                    # (nh, p, nw, p, 3) -> (n, p, p, 3) contiguous tiles
                    tiles = np.ascontiguousarray(
                        px[: nh * patch, : nw * patch]
                        .reshape(nh, patch, nw, patch, 3)
                        .transpose(0, 2, 1, 3, 4)
                    ).reshape(n, -1)
                    blobs.extend(t.tobytes() for t in tiles)
                else:
                    blobs.extend([None] * n)
            cat = lambda xs, dt: (  # noqa: E731
                np.concatenate(xs) if xs else np.array([], dtype=dt)
            )
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "prow": cat(prs, np.int32),
                    "pcol": cat(pcs, np.int32),
                    "sum_r": cat(srs, np.int64),
                    "sum_g": cat(sgs, np.int64),
                    "sum_b": cat(sbs, np.int64),
                    "patch_bytes": blobs,
                }
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, PATCH_SCHEMA
    )


AUGMENT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "flipped boolean, x0 int, y0 int, sum_r long, sum_g long, sum_b long"
)


def augment_params(image_id: str, w: int, h: int, crop_num: int = 7,
                   crop_den: int = 8, epoch: int = 0):
    """Deterministic per-image augmentation parameters — NO RNG: the
    crc32 of (image_id, epoch) drives horizontal-flip and crop-offset
    choices, so the augmented corpus is bit-identical across runs,
    partitionings, and cluster sizes (and a different `epoch` yields an
    independent but equally reproducible view — the same epoch-salt
    idea as curation.shuffle_shards). Returns
    (flipped, x0, y0, cw, ch)."""
    import zlib

    assert 0 < crop_num <= crop_den, (
        f"crop_num/crop_den must be a fraction in (0, 1]: "
        f"{crop_num}/{crop_den} would make the crop larger than the "
        "image (negative/zero offset modulus)"
    )
    mix = zlib.crc32(f"{image_id}#aug{epoch}".encode())
    cw = max(1, (w * crop_num) // crop_den)
    ch = max(1, (h * crop_num) // crop_den)
    x0 = (mix >> 1) % (w - cw + 1)
    y0 = (mix >> 13) % (h - ch + 1)
    return bool(mix & 1), x0, y0, cw, ch


def augment_images(
    images: DataFrame, crop_num: int = 7, crop_den: int = 8, epoch: int = 0
) -> DataFrame:
    """Training-time image augmentation as a deterministic corpus
    transform: decode -> random-crop to (crop_num/crop_den) of each
    side -> maybe horizontal flip -> re-encode, with every "random"
    choice derived from the image id (`augment_params`). Emits the
    integer per-channel sums of the AUGMENTED pixels next to the bytes,
    so the transform is self-verifying: a flip never changes channel
    sums and a crop's sums are recomputable from the original pixels,
    which the x06 entry and tests exploit as zero-violation gates. One
    mapInPandas pass over Arrow batches, zero shuffles, scale-linear.

    Reference analog: the deterministic per-file transform stage of the
    reference's indexing (parse -> normalize -> extract,
    `packages/core/src/index_single_file/index_single_file.ts:98-120`);
    here the normalization is pixel-space and epoch-parameterized.
    """
    from ..functions.codecs import encode_image

    def run(iterator):
        for pdf in iterator:
            out = {k: [] for k in (
                "image_id", "bytes", "w", "h", "fmt", "flipped",
                "x0", "y0", "sum_r", "sum_g", "sum_b",
            )}
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                h, w, _ = px.shape
                flipped, x0, y0, cw, ch = augment_params(
                    img_id, w, h, crop_num, crop_den, epoch
                )
                aug = px[y0 : y0 + ch, x0 : x0 + cw]
                if flipped:
                    aug = aug[:, ::-1]
                aug = np.ascontiguousarray(aug)
                sums = aug.astype(np.int64).sum(axis=(0, 1))
                out["image_id"].append(img_id)
                out["bytes"].append(encode_image(aug, fmt))
                out["w"].append(cw)
                out["h"].append(ch)
                out["fmt"].append(fmt)
                out["flipped"].append(flipped)
                out["x0"].append(x0)
                out["y0"].append(y0)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, AUGMENT_SCHEMA
    )


PIXEL_FP_SCHEMA = "image_id string, pixel_fp long, w int, h int"


def pixel_fingerprint(images: DataFrame) -> DataFrame:
    """Content-addressed fingerprint of the DECODED pixel buffer (shape
    + crc32 of the raw RGB bytes, folded into one int64): two byte
    streams that decode to identical pixels — the same image re-encoded
    in another lossless container, a BMP vs PNG pair, a metadata-only
    rewrite — share a pixel_fp even though their byte md5 differs, so a
    groupBy(pixel_fp) catches the cross-format duplicates the byte-hash
    dedup stage structurally cannot (the format-shifted re-upload, the
    standard CommonCrawl image-dedup gap). Lossy re-encodes are NOT
    matched by design (their pixels genuinely differ; that tier belongs
    to phash near-dup).

    One Arrow-batched decode pass, zero shuffles; the fingerprint is a
    pure function of the pixels, so it is deterministic across runs,
    partitionings, and cluster sizes.

    Reference analog: ariadne keys re-index skips on a content hash of
    the parsed file, not its mtime/bytes
    (`packages/core/src/persistence/file_system_storage.ts:60-100`).
    """
    import zlib

    def fp(iterator):
        for pdf in iterator:
            ids, fps, ws, hs = [], [], [], []
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                h, w = px.shape[0], px.shape[1]
                crc = zlib.crc32(np.ascontiguousarray(px, dtype=np.uint8).tobytes())
                ids.append(img_id)
                # shape (folded to 31 bits) in the high bits, crc in
                # the low 32: stays < 2^63 for any w/h
                fps.append((((w * 131071 + h) & 0x7FFFFFFF) << 32) | crc)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"image_id": ids, "pixel_fp": fps, "w": ws, "h": hs}
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(fp, PIXEL_FP_SCHEMA)


REENCODE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def reencode_images(images: DataFrame, to_fmt: str) -> DataFrame:
    """Format migration: decode each payload and re-encode it into
    `to_fmt` (registry-dispatched, so registered custom codecs work).
    One Arrow-batched pass, zero shuffles. Pixels are preserved exactly
    for lossless targets — `pixel_fingerprint` equality across the
    migration is the driver-checked invariant (x06 stage='pixel_fp') —
    while byte-level hashes change, which is precisely the duplicate
    class the pixel fingerprint exists to catch."""
    from ..functions.codecs import encode_image

    def re_enc(iterator):
        for pdf in iterator:
            ids, blobs, ws, hs = [], [], [], []
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                ids.append(img_id)
                blobs.append(encode_image(px, to_fmt))
                ws.append(px.shape[1])
                hs.append(px.shape[0])
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": blobs,
                    "w": ws,
                    "h": hs,
                    "fmt": to_fmt,
                }
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        re_enc, REENCODE_SCHEMA
    )


JPEG_GATE_SCHEMA = (
    "image_id string, fmt string, psnr double, container_ok boolean, "
    "dims_ok boolean"
)


def jpeg_real_roundtrip(images: DataFrame, quality: int = 98) -> DataFrame:
    """Migrate each payload through the REAL baseline JPEG codec
    (functions/jpeg.py — spec DCT + Annex-K Huffman, an actual
    interchange-format stream, not the 'fjpg' stand-in) and gate the
    roundtrip: decode original -> encode_jpeg -> decode_jpeg -> PSNR
    vs the pre-encode pixels, plus container (SOI magic) and dims
    checks. 4:4:4 because the gate measures CODEC fidelity, not
    subsampling policy (box-averaged chroma is irreducibly lossy on
    high-frequency content); quality 98 keeps quantization error above
    the engine's 40 dB lossy gate even on the synth corpus's uniform-
    noise images with ~3.5 dB margin — the adversarial case; natural
    images sit well above. One Arrow-batched pass, zero shuffles. The entropy stage is
    per-coefficient Python, so callers sample (x06 gates ~50 rows);
    the bench hot path stays on the O(n)-numpy stand-in codec."""
    from ..functions.jpeg import decode_jpeg, encode_jpeg

    def gate(iterator):
        for pdf in iterator:
            ids, psnrs, containers, dims = [], [], [], []
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                jp = encode_jpeg(px, quality=quality, subsample="444")
                back = decode_jpeg(jp)
                ids.append(img_id)
                psnrs.append(float(min(psnr(px, back), 99.0)))
                containers.append(jp[:2] == b"\xff\xd8")
                dims.append(back.shape == px.shape)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "fmt": "jpeg",
                    "psnr": psnrs,
                    "container_ok": containers,
                    "dims_ok": dims,
                }
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gate, JPEG_GATE_SCHEMA
    )
