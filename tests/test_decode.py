"""Decode-stage tests: the input_hint per-row invariant (PSNR>=40 lossy,
exact png, caption equality, phash self-consistency) over the fixture."""

from __future__ import annotations

from ariadne_spark.operators.decode import decode_features, invariant_summary


def test_invariants_hold_for_every_row(spark, images_df):
    rows = invariant_summary(images_df).collect()
    assert {r["fmt"] for r in rows} == {"png", "fjpg"}
    for r in rows:
        assert r["n_pixel_violations"] == 0, r
        assert r["n_caption_violations"] == 0, r
        assert r["n_phash_violations"] == 0, r
    png = next(r for r in rows if r["fmt"] == "png")
    jpeg = next(r for r in rows if r["fmt"] == "fjpg")
    assert png["min_psnr"] == 99.0  # exact decode, clamped inf
    assert 40.0 <= jpeg["min_psnr"]


def test_features_shapes_and_ranges(spark, images_df):
    feats = decode_features(images_df.limit(200)).collect()
    assert len(feats) == 200
    for r in feats:
        assert 0.0 <= r["mean_r"] <= 255.0
        assert 0 <= r["luma_p50"] <= 255
        assert r["edge_energy"] >= 0.0


def test_bmp_codec_roundtrip_exact():
    """BMP (registry format #3) is lossless: encode∘decode == identity,
    including non-multiple-of-4 widths (row padding)."""
    import numpy as np

    from ariadne_spark.functions.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    for w, h in [(16, 16), (17, 9), (1, 1), (33, 2)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_bmp(px)
        assert blob[:2] == b"BM"
        out = decode_bmp(blob)
        assert out.shape == px.shape and (out == px).all()


def test_codec_registry_dispatch_and_extension():
    """encode/decode dispatch through the fmt-keyed registry; a new
    format plugs in without touching dispatch; unknown fmt raises."""
    import numpy as np
    import pytest

    from ariadne_spark.functions import codecs

    px = np.zeros((4, 4, 3), np.uint8)
    assert (codecs.decode_image(codecs.encode_image(px, "bmp"), "bmp") == px).all()
    with pytest.raises(NotImplementedError):
        codecs.encode_image(px, "webp")
    codecs.register_codec(
        "rawrgb",
        lambda p: p.shape[0].to_bytes(2, "big")
        + p.shape[1].to_bytes(2, "big")
        + p.tobytes(),
        lambda b: np.frombuffer(b[4:], np.uint8).reshape(
            int.from_bytes(b[:2], "big"), int.from_bytes(b[2:4], "big"), 3
        ),
    )
    try:
        assert (
            codecs.decode_image(codecs.encode_image(px, "rawrgb"), "rawrgb") == px
        ).all()
    finally:
        del codecs.CODECS["rawrgb"]


def test_decode_features_handles_bmp_rows(spark):
    """The Spark decode stage accepts registry formats end-to-end: a
    frame of BMP rows flows through decode_features with correct phash
    (lossless ⇒ phash equals the pixel hash exactly)."""
    import numpy as np
    import pandas as pd

    from ariadne_spark.functions.codecs import encode_bmp
    from ariadne_spark.functions.phash import np_phash_from_pixels

    rng = np.random.default_rng(11)
    rows = []
    for i in range(8):
        px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        rows.append(
            {
                "image_id": f"bmp_{i:04d}",
                "bytes": encode_bmp(px),
                "w": 16,
                "h": 16,
                "fmt": "bmp",
                "caption": f"bmp row {i}",
                "phash": np_phash_from_pixels(px),
                "lon_u": 0,
                "lat_u": 0,
            }
        )
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, lon_u long, lat_u long",
    )
    feats = decode_features(df).collect()
    assert len(feats) == 8
    assert all(0.0 <= f["mean_r"] <= 255.0 for f in feats)
    # and the Spark-side phash UDF dispatches bmp through the registry:
    # lossless codec ⇒ recomputed phash equals the stored pixel hash
    from ariadne_spark.functions.phash import phash_udf

    want = {r["image_id"]: r["phash"] for r in rows}
    for r in df.select("image_id", phash_udf("bytes", "fmt").alias("ph")).collect():
        assert r["ph"] == want[r["image_id"]]


def test_resize_images_matches_numpy_oracle(spark, images_df):
    """Spark resize stage == pure-python decode→resize→encode oracle,
    byte-exact, and dims respect the max-side bound + aspect ratio."""
    import numpy as np

    from ariadne_spark.functions.codecs import decode_image, encode_image
    from ariadne_spark.operators.decode import np_resize_nearest, resize_images

    MAX_SIDE = 24
    sample = images_df.limit(40)
    got = {
        r["image_id"]: (bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        for r in resize_images(sample, MAX_SIDE).collect()
    }
    src = sample.select("image_id", "bytes", "fmt").collect()
    assert len(got) == len(src)
    for r in src:
        px = decode_image(bytes(r["bytes"]), r["fmt"])
        h, w, _ = px.shape
        if max(w, h) > MAX_SIDE:
            if w >= h:
                ow, oh = MAX_SIDE, max(1, (h * MAX_SIDE) // w)
            else:
                oh, ow = MAX_SIDE, max(1, (w * MAX_SIDE) // h)
            px = np_resize_nearest(px, ow, oh)
        blob, gw, gh, gfmt = got[r["image_id"]]
        assert (gw, gh) == (px.shape[1], px.shape[0])
        assert max(gw, gh) <= MAX_SIDE
        assert gfmt == r["fmt"]
        assert blob == encode_image(px, gfmt)
        # and the resized payload decodes back through the registry
        out = decode_image(blob, gfmt)
        assert out.shape == (gh, gw, 3)


def test_resize_nearest_identity_and_downscale():
    import numpy as np

    from ariadne_spark.operators.decode import np_resize_nearest

    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    same = np_resize_nearest(px, 6, 4)
    assert (same == px).all()
    half = np_resize_nearest(px, 3, 2)
    assert half.shape == (2, 3, 3)
    assert (half == px[::2][:, ::2]).all()


def test_patchify_matches_numpy_oracle(spark, images_df):
    """ViT patch grid: per-patch integer channel sums + raw tile bytes
    equal a direct numpy decode->reshape oracle for every patch of a
    sample; patch count is (w//p)*(h//p); parallelism-invariant."""
    import numpy as np

    from ariadne_spark.functions.codecs import decode_image
    from ariadne_spark.operators.decode import np_patch_sums, patchify

    P = 16
    sample = images_df.orderBy("image_id").limit(12).cache()
    got = {
        (r["image_id"], r["prow"], r["pcol"]): (
            r["sum_r"], r["sum_g"], r["sum_b"], bytes(r["patch_bytes"]),
        )
        for r in patchify(sample, patch=P, emit_pixels=True).collect()
    }
    n_expected = 0
    for r in sample.collect():
        px = decode_image(bytes(r["bytes"]), r["fmt"])
        nh, nw = px.shape[0] // P, px.shape[1] // P
        n_expected += nh * nw
        sums = np_patch_sums(px, P)
        for pr in range(nh):
            for pc in range(nw):
                tile = px[pr * P : (pr + 1) * P, pc * P : (pc + 1) * P]
                want = (
                    int(sums[pr, pc, 0]), int(sums[pr, pc, 1]),
                    int(sums[pr, pc, 2]), tile.tobytes(),
                )
                assert got[(r["image_id"], pr, pc)] == want
                # the emitted buffer reconstructs the tile tensor
                back = np.frombuffer(want[3], dtype=np.uint8).reshape(P, P, 3)
                assert (back == tile).all()
                assert back.sum(axis=(0, 1)).tolist() == list(want[:3])
    assert len(got) == n_expected and n_expected > 0

    # parallelism invariance (stats path, no pixel payload)
    a = sorted(map(tuple, patchify(sample, patch=P).drop("patch_bytes").collect()))
    b = sorted(map(tuple, patchify(
        sample.repartition(7), patch=P).drop("patch_bytes").collect()))
    assert a == b


def test_patchify_sub_patch_images_and_remainder():
    """Images smaller than one patch emit no rows; remainders drop."""
    import numpy as np

    from ariadne_spark.operators.decode import np_patch_sums

    px = np.arange(11 * 18 * 3, dtype=np.uint8).reshape(11, 18, 3)
    s = np_patch_sums(px, 8)  # 11//8=1 row, 18//8=2 cols
    assert s.shape == (1, 2, 3)
    assert (s[0, 0] == px[:8, :8].astype(np.int64).sum(axis=(0, 1))).all()
    assert (s[0, 1] == px[:8, 8:16].astype(np.int64).sum(axis=(0, 1))).all()
    assert np_patch_sums(px, 32).shape == (0, 0, 3)


def test_augment_images_matches_numpy_oracle(spark, images_df):
    """Byte-exact oracle: same id-derived params, same numpy crop/flip,
    same re-encode — and the emitted channel sums equal the augmented
    pixels' sums (flip-invariant, crop-recomputable)."""
    import numpy as np

    from ariadne_spark.functions.codecs import decode_image, encode_image
    from ariadne_spark.operators.decode import augment_images, augment_params

    sample = images_df.limit(60)
    src = {
        r["image_id"]: (bytes(r["bytes"]), r["fmt"]) for r in sample.collect()
    }
    got = augment_images(sample).collect()
    assert len(got) == len(src)
    for r in got:
        blob, fmt = src[r["image_id"]]
        px = decode_image(blob, fmt)
        h, w, _ = px.shape
        flipped, x0, y0, cw, ch = augment_params(r["image_id"], w, h)
        assert (r["flipped"], r["x0"], r["y0"], r["w"], r["h"]) == (
            flipped, x0, y0, cw, ch,
        )
        aug = px[y0 : y0 + ch, x0 : x0 + cw]
        if flipped:
            aug = aug[:, ::-1]
        aug = np.ascontiguousarray(aug)
        assert bytes(r["bytes"]) == encode_image(aug, fmt)
        sums = aug.astype(np.int64).sum(axis=(0, 1))
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(s) for s in sums)
        # flip invariance: sums equal the UNflipped crop's sums
        crop = px[y0 : y0 + ch, x0 : x0 + cw].astype(np.int64).sum(axis=(0, 1))
        assert tuple(int(s) for s in crop) == (r["sum_r"], r["sum_g"], r["sum_b"])


def test_augment_epochs_differ_but_reproduce(spark, images_df):
    from ariadne_spark.operators.decode import augment_images

    sample = images_df.limit(40)
    e0 = {r["image_id"]: (r["flipped"], r["x0"], r["y0"]) for r in augment_images(sample, epoch=0).collect()}
    e0b = {r["image_id"]: (r["flipped"], r["x0"], r["y0"]) for r in augment_images(sample, epoch=0).collect()}
    e1 = {r["image_id"]: (r["flipped"], r["x0"], r["y0"]) for r in augment_images(sample, epoch=1).collect()}
    assert e0 == e0b  # reproducible
    assert any(e0[k] != e1[k] for k in e0)  # epochs independent


def test_augment_parallelism_invariance(spark, images_df):
    from ariadne_spark.operators.decode import augment_images

    sample = images_df.limit(50)
    base = sorted(
        (r["image_id"], bytes(r["bytes"]), r["sum_r"]) for r in augment_images(sample).collect()
    )
    again = sorted(
        (r["image_id"], bytes(r["bytes"]), r["sum_r"])
        for r in augment_images(sample.repartition(7)).collect()
    )
    assert again == base


# ------------------------------------------------------ pixel_fingerprint

def test_pixel_fingerprint_catches_cross_format_dups(spark, tmp_path):
    """The format-shifted re-upload: identical pixels in PNG and BMP
    containers share a pixel_fp while their byte md5s differ; distinct
    images get distinct fps; lossy re-encodes intentionally differ."""
    import hashlib
    import numpy as np
    from pyspark.sql import functions as F

    from ariadne_spark.functions.codecs import decode_image, encode_image
    from ariadne_spark.operators.decode import pixel_fingerprint
    from ariadne_spark.synth.images import write_images

    p = str(tmp_path / "img.parquet")
    write_images(p, 24)
    src = spark.read.parquet(p).where(F.col("fmt") != "fjpg").limit(8).collect()
    assert len(src) == 8
    rows = []
    for r in src:
        px = decode_image(bytes(r["bytes"]), r["fmt"])
        rows.append((r["image_id"] + "_png", encode_image(px, "png"), "png"))
        rows.append((r["image_id"] + "_bmp", encode_image(px, "bmp"), "bmp"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    fps = {x["image_id"]: (x["pixel_fp"], x["w"], x["h"])
           for x in pixel_fingerprint(df).collect()}
    assert len(fps) == 16
    for r in src:
        a = fps[r["image_id"] + "_png"]
        b = fps[r["image_id"] + "_bmp"]
        assert a == b, r["image_id"]  # same pixels => same fp
    # byte hashes differ across containers (what md5 dedup would miss)
    md5s = {x[0]: hashlib.md5(bytes(x[1])).hexdigest() for x in rows}
    for r in src:
        assert md5s[r["image_id"] + "_png"] != md5s[r["image_id"] + "_bmp"]
    # distinct images => distinct fps (8 distinct groups)
    assert len({v for v in fps.values()}) == 8


def test_pixel_fingerprint_parallelism_invariant(spark, tmp_path):
    from ariadne_spark.operators.decode import pixel_fingerprint
    from ariadne_spark.synth.images import write_images

    p = str(tmp_path / "img.parquet")
    write_images(p, 40)
    imgs = spark.read.parquet(p)
    a = {r["image_id"]: r["pixel_fp"] for r in pixel_fingerprint(imgs).collect()}
    b = {r["image_id"]: r["pixel_fp"]
         for r in pixel_fingerprint(imgs.repartition(9)).collect()}
    assert a == b and len(a) == 40


def _planted_corrupt_df(spark, images_df, n=60):
    """Sample of the fixture with five corruption classes planted on
    disjoint slices (python-side twin of the x06 JVM planting).
    Returns (df, expected: id -> error_kind or None)."""
    import pandas as pd

    src = images_df.limit(n).collect()
    rows, expected = [], {}
    for i, r in enumerate(src):
        blob, fmt, w, h = bytes(r["bytes"]), r["fmt"], r["w"], r["h"]
        kind = None
        cls = i % 10
        if cls == 1:
            blob, kind = blob[:16], "decode_error"
        elif cls == 2:
            # webp: genuinely unregistered (tiff joined the registry
            # in round 5, so a tiff-labeled png is now bad_magic)
            fmt, kind = "webp", "unknown_fmt"
        elif cls == 3:
            blob, kind = b"XX" + blob[2:], "bad_magic"
        elif cls == 4:
            blob, kind = None, "null_bytes"
        elif cls == 5:
            blob, kind = b"", "null_bytes"
        elif cls == 6:
            w, kind = w + 1, "dim_mismatch"
        rows.append({"image_id": r["image_id"], "bytes": blob, "w": w,
                     "h": h, "fmt": fmt})
        expected[r["image_id"]] = kind
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    return df, expected


def test_quarantine_scan_classifies_planted_corruption(spark, images_df):
    """Every corruption class gets its exact deterministic verdict;
    clean rows pass. The scan itself never raises."""
    from ariadne_spark.operators.decode import quarantine_scan

    df, expected = _planted_corrupt_df(spark, images_df)
    got = {r["image_id"]: (r["ok"], r["error_kind"])
           for r in quarantine_scan(df).collect()}
    assert len(got) == len(expected)
    for img_id, kind in expected.items():
        ok, ek = got[img_id]
        assert ek == kind and ok == (kind is None), (img_id, kind, got[img_id])
    # all five kinds + clean rows actually exercised
    assert {k for k in expected.values()} == {
        None, "decode_error", "unknown_fmt", "bad_magic", "null_bytes",
        "dim_mismatch",
    }


def test_quarantine_scan_parallelism_invariant(spark, images_df):
    from ariadne_spark.operators.decode import quarantine_scan

    df, _ = _planted_corrupt_df(spark, images_df)
    a = sorted(map(tuple, quarantine_scan(df.repartition(1)).collect()))
    b = sorted(map(tuple, quarantine_scan(df.repartition(13)).collect()))
    assert a == b


def test_quarantine_guard_protects_downstream(spark, images_df):
    """The operability contract: a decode stage run directly on a
    corrupted corpus kills the job; the same stage over quarantine
    survivors (left-semi join) completes, covering exactly the clean
    rows."""
    import pytest
    from pyspark.sql import functions as F

    from ariadne_spark.functions.phash import phash_udf
    from ariadne_spark.operators.decode import quarantine_scan

    df, expected = _planted_corrupt_df(spark, images_df)
    with pytest.raises(Exception):
        df.select(phash_udf("bytes", "fmt").alias("ph")).collect()
    survivors = df.join(
        quarantine_scan(df).where("ok").select("image_id"),
        "image_id",
        "left_semi",
    )
    n = survivors.select(phash_udf("bytes", "fmt").alias("ph")).count()
    assert n == sum(1 for k in expected.values() if k is None)


def test_phash_udf_mixed_odd_shapes_match_per_image(spark):
    """Shape-group batching inside phash_udf must reproduce the
    per-image hash for adversarial mixed shapes sharing one Arrow
    batch (odd dims, sub-32 dims, extreme aspect)."""
    import numpy as np
    import pandas as pd

    from ariadne_spark.functions.codecs import encode_bmp
    from ariadne_spark.functions.phash import np_phash_from_pixels, phash_udf

    rng = np.random.default_rng(23)
    shapes = [(16, 16), (17, 33), (5, 5), (31, 65), (100, 40), (1, 1),
              (64, 64), (33, 32), (2, 128)]
    rows = []
    for i, (h, w) in enumerate(shapes * 3):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append({"image_id": f"odd_{i}", "bytes": encode_bmp(px),
                     "fmt": "bmp", "want": np_phash_from_pixels(px)})
    df = spark.createDataFrame(
        pd.DataFrame(rows), "image_id string, bytes binary, fmt string, want long"
    ).coalesce(1)  # one partition => shapes genuinely share batches
    bad = df.select("want", phash_udf("bytes", "fmt").alias("got")) \
            .where("want != got").count()
    assert bad == 0


def test_augment_rejects_crop_fraction_above_one():
    """crop_num > crop_den would make the crop larger than the image
    (zero/negative offset modulus -> ZeroDivisionError or silently
    clipped slices with lying metadata) — refused loudly."""
    import pytest

    from ariadne_spark.operators.decode import augment_params

    with pytest.raises(AssertionError, match="crop_num/crop_den"):
        augment_params("img_1", 8, 8, crop_num=9, crop_den=8)
    with pytest.raises(AssertionError, match="crop_num/crop_den"):
        augment_params("img_1", 8, 8, crop_num=0, crop_den=8)
    # the boundary (identity crop) is legal
    flipped, x0, y0, cw, ch = augment_params("img_1", 8, 8, crop_num=8, crop_den=8)
    assert (x0, y0, cw, ch) == (0, 0, 8, 8)


def test_codec_internal_keyerror_not_masked():
    """A registered codec that raises KeyError internally must surface
    THAT error — not be misreported as 'unsupported fmt' by the
    registry dispatch."""
    import pytest

    from ariadne_spark.functions import codecs

    def bad_decode(data):
        return {}["missing-table"]

    codecs.register_codec("kerr", lambda px: b"", bad_decode)
    try:
        with pytest.raises(KeyError, match="missing-table"):
            codecs.decode_image(b"\x00", "kerr")
        with pytest.raises(NotImplementedError, match="unsupported fmt"):
            codecs.decode_image(b"\x00", "no-such-fmt")
    finally:
        codecs.CODECS.pop("kerr", None)
