"""Decode-stage tests: the input_hint per-row invariant (PSNR>=40 lossy,
exact png, caption equality, phash self-consistency) over the fixture."""

from __future__ import annotations

from ariadne_spark.operators.decode import decode_features, invariant_summary


def test_invariants_hold_for_every_row(spark, images_df):
    rows = invariant_summary(images_df).collect()
    assert {r["fmt"] for r in rows} == {"png", "jpeg"}
    for r in rows:
        assert r["n_pixel_violations"] == 0, r
        assert r["n_caption_violations"] == 0, r
        assert r["n_phash_violations"] == 0, r
    png = next(r for r in rows if r["fmt"] == "png")
    jpeg = next(r for r in rows if r["fmt"] == "jpeg")
    assert png["min_psnr"] == 99.0  # exact decode, clamped inf
    assert 40.0 <= jpeg["min_psnr"]


def test_features_shapes_and_ranges(spark, images_df):
    feats = decode_features(images_df.limit(200)).collect()
    assert len(feats) == 200
    for r in feats:
        assert 0.0 <= r["mean_r"] <= 255.0
        assert 0 <= r["luma_p50"] <= 255
        assert r["edge_energy"] >= 0.0
