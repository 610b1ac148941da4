"""Multimodal plumbing tests: WAV round-trip, FVID frame seek, Spark
feature extraction vs pure-python oracle, lineage_report sanity."""

from __future__ import annotations

import numpy as np
import pytest

from ariadne_spark.functions.media import (
    audio_features,
    decode_fvid_frame,
    decode_wav,
    encode_fvid,
    encode_wav,
    fvid_meta,
    synth_audio,
    synth_video,
)
from ariadne_spark.operators.multimodal import (
    audio_df,
    extract_audio_features,
    sample_frames,
    video_df,
)


class TestCodecs:
    def test_wav_roundtrip(self):
        s = synth_audio(7)
        back, rate = decode_wav(encode_wav(s))
        assert rate == 8000
        np.testing.assert_array_equal(back, s)

    def test_wav_header_is_standard_riff(self):
        blob = encode_wav(synth_audio(1))
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"

    def test_fvid_frame_seek_exact(self):
        frames = synth_video(3)
        blob = encode_fvid(frames)
        w, h, n = fvid_meta(blob)
        assert (w, h, n) == (32, 24, len(frames))
        for idx in (0, 3, len(frames) - 1):
            np.testing.assert_array_equal(decode_fvid_frame(blob, idx), frames[idx])

    def test_fvid_rejects_bad_frame(self):
        blob = encode_fvid(synth_video(3))
        with pytest.raises(AssertionError):
            decode_fvid_frame(blob, 99)


class TestSparkPlumbing:
    def test_audio_features_match_oracle(self, spark):
        n = 60
        got = {r["audio_id"]: r for r in extract_audio_features(audio_df(spark, n, 4)).collect()}
        assert len(got) == n
        for i in (0, 17, 59):
            s = synth_audio(i)
            exp = audio_features(s, 8000)
            r = got[f"aud_{i:08d}"]
            assert abs(r["rms"] - exp["rms"]) < 1e-9
            assert abs(r["spectral_centroid"] - exp["spectral_centroid"]) < 1e-9

    def test_frame_sampling_decodes_only_requested(self, spark):
        n = 40
        rows = sample_frames(video_df(spark, n, 4), every_k=4).collect()
        # 8 frames per video, every 4th -> frames 0 and 4
        assert len(rows) == n * 2
        assert {r["frame_idx"] for r in rows} == {0, 4}
        # per-frame means match a direct decode
        r0 = next(r for r in rows if r["video_id"] == "vid_00000005" and r["frame_idx"] == 4)
        px = synth_video(5)[4]
        assert abs(r0["mean_r"] - px[:, :, 0].mean()) < 1e-9

    def test_generation_is_prefix_stable(self, spark):
        a = {r["audio_id"]: bytes(r["wav"]) for r in audio_df(spark, 20, 2).collect()}
        b = {r["audio_id"]: bytes(r["wav"]) for r in audio_df(spark, 10, 5).collect()}
        for k, v in b.items():
            assert a[k] == v


def test_lineage_report(spark, tmp_path):
    import numpy as np

    from ariadne_spark.api import lineage_report
    from ariadne_spark.operators.incremental import SpatialPipeline
    from ariadne_spark.synth.images import IMAGES_SCHEMA, generate_rows
    from ariadne_spark.synth.regions import generate_regions

    p = SpatialPipeline(spark, str(tmp_path / "s"), generate_regions(), max_z=6)
    pdf = generate_rows(np.arange(400)).to_pandas()
    p.full_build(spark.createDataFrame(pdf, schema=IMAGES_SCHEMA).drop("bytes"))
    rep = {r["stage"]: r for r in lineage_report(p.store).collect()}
    assert {"pip", "knn", "tiles_fine", "tiles_coarse"} <= set(rep)
    for r in rep.values():
        assert r["n_partitions"] >= 1 and r["wall_ms_total"] > 0


# --------------------------------------------------------- scene detection

def _cut_video(spark, specs):
    """Build videos from (video_id, [(seed, n_frames), ...]) shot specs:
    each shot renders n identical frames of a seeded random base, so
    every shot boundary is a full-frame change (a true cut)."""
    import numpy as np

    from ariadne_spark.functions.media import encode_fvid, fvid_meta

    rows = []
    for vid, shots in specs:
        frames = []
        for seed, n in shots:
            base = np.random.default_rng(seed).integers(
                0, 256, size=(24, 32, 3), dtype=np.uint8
            )
            frames.extend([base.copy() for _ in range(n)])
        blob = encode_fvid(frames)
        w, h, nf = fvid_meta(blob)
        rows.append((vid, blob, w, h, nf))
    return spark.createDataFrame(
        rows, "video_id string, fvid binary, w int, h int, n_frames int"
    )


def _scene_py(specs, threshold_permille=120):
    import numpy as np

    out = {}
    for vid, shots in specs:
        frames = []
        for seed, n in shots:
            base = np.random.default_rng(seed).integers(
                0, 256, size=(24, 32, 3), dtype=np.uint8
            )
            frames.extend([base] * n)
        rows = []
        for i in range(1, len(frames)):
            sad = int(
                np.abs(frames[i].astype(np.int64) - frames[i - 1].astype(np.int64)).sum()
            )
            dp = (sad * 1000) // (frames[i].size * 255)
            rows.append((i, dp, int(dp >= threshold_permille)))
        out[vid] = rows
    return out


SPECS = [
    ("v_a", [(1, 3), (2, 4), (3, 2)]),   # cuts at frames 3 and 7
    ("v_b", [(9, 5)]),                   # single shot, no cuts
]


def test_detect_scenes_matches_python_oracle(spark):
    from ariadne_spark.operators.multimodal import detect_scenes

    got = {}
    for r in detect_scenes(_cut_video(spark, SPECS)).collect():
        got.setdefault(r["video_id"], []).append(
            (r["frame_idx"], r["diff_permille"], r["is_cut"])
        )
    exp = _scene_py(SPECS)
    for vid in exp:
        assert sorted(got[vid]) == sorted(exp[vid]), vid
    cuts = [i for i, _, c in got["v_a"] if c]
    assert cuts == [3, 7]
    assert all(c == 0 for _, _, c in got["v_b"])


def test_scene_segments_shape(spark):
    from ariadne_spark.operators.multimodal import scene_segments

    segs = {
        (r["video_id"], r["scene_id"]): (r["start_frame"], r["end_frame"], r["n_frames"])
        for r in scene_segments(_cut_video(spark, SPECS)).collect()
    }
    assert segs[("v_a", 0)] == (0, 2, 3)
    assert segs[("v_a", 1)] == (3, 6, 4)
    assert segs[("v_a", 2)] == (7, 8, 2)
    assert segs[("v_b", 0)] == (0, 4, 5)


def test_detect_scenes_synth_corpus_quiet(spark):
    """The synth moving-block videos have motion but no cuts: every
    adjacent-frame diff stays under the cut threshold, and results are
    parallelism-invariant."""
    from ariadne_spark.operators.multimodal import detect_scenes, video_df

    v = video_df(spark, 40)
    rows = detect_scenes(v).collect()
    assert len(rows) == 40 * 7  # 8 frames -> 7 pairs each
    assert all(r["is_cut"] == 0 for r in rows)
    assert max(r["diff_permille"] for r in rows) < 120
    a = sorted((r["video_id"], r["frame_idx"], r["diff_permille"]) for r in rows)
    b = sorted(
        (r["video_id"], r["frame_idx"], r["diff_permille"])
        for r in detect_scenes(v.repartition(11)).collect()
    )
    assert a == b


def test_detect_scenes_skips_degenerate_clips(spark):
    """Zero- and single-frame payloads produce no pairs and must not
    kill the stage (the sample_frames skip contract)."""
    import numpy as np

    from ariadne_spark.functions.media import encode_fvid
    from ariadne_spark.operators.multimodal import detect_scenes, scene_segments

    one = np.zeros((24, 32, 3), dtype=np.uint8)
    rows = [
        # a corrupt/empty clip surfaces as n_frames == 0 metadata
        ("empty", encode_fvid([one]), 0, 0, 0),
        ("single", encode_fvid([one]), 32, 24, 1),
        ("pair", encode_fvid([one, one]), 32, 24, 2),
    ]
    v = spark.createDataFrame(
        rows, "video_id string, fvid binary, w int, h int, n_frames int"
    )
    cuts = detect_scenes(v).collect()
    assert {r["video_id"] for r in cuts} == {"pair"}
    segs = {(r["video_id"], r["scene_id"]) for r in scene_segments(v).collect()}
    assert segs == {("single", 0), ("pair", 0)}  # empty clip: no scenes
