"""Multi-update sequence: three successive updates (add, modify,
delete) must leave every table fingerprint-equal to a cold build over
the final logical input — the strongest incremental invariant."""

from __future__ import annotations

import numpy as np

from ariadne_spark.operators.incremental import SpatialPipeline
from ariadne_spark.synth.images import IMAGES_SCHEMA, generate_rows
from ariadne_spark.synth.regions import generate_regions


def _imgs(spark, ids):
    pdf = generate_rows(np.asarray(ids, dtype=np.int64)).to_pandas()
    return spark.createDataFrame(pdf, schema=IMAGES_SCHEMA).drop("bytes")


def _mod(spark, ids, shift):
    ids = np.asarray(ids, dtype=np.int64)
    pdf = generate_rows(ids + shift).to_pandas().drop(columns=["bytes"])
    pdf["image_id"] = [f"img_{int(i):08d}" for i in ids]
    return spark.createDataFrame(pdf)


def test_three_sequential_updates_equal_cold_build(spark, tmp_path):
    p = SpatialPipeline(spark, str(tmp_path / "s"), generate_regions(), max_z=6)
    p.full_build(_imgs(spark, range(700)))

    # update 1: append a batch
    p.update(_imgs(spark, range(700, 800)))
    # update 2: modify a scattered set
    mod = list(range(50, 80))
    p.update(_mod(spark, mod, 999))
    # update 3: delete some of the modified + some originals
    dels = [f"img_{i:08d}" for i in list(range(60, 70)) + list(range(300, 310))]
    p.update(_imgs(spark, []), deleted_ids=dels)

    final_plain = [
        i for i in range(800) if i not in set(range(60, 70)) | set(range(300, 310))
    ]
    keep = [i for i in final_plain if i not in set(mod)]
    live_mod = [i for i in mod if not (60 <= i < 70)]
    ref_df = _imgs(spark, keep).unionByName(_mod(spark, live_mod, 999))
    ref = SpatialPipeline(spark, str(tmp_path / "ref"), generate_regions(), max_z=6)
    ref.full_build(ref_df)

    assert p.table_fingerprints() == ref.table_fingerprints()
    # snapshot chain recorded every step
    assert p.store.current_snapshot_id("images_indexed") == 3
