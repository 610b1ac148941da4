"""Streaming re-tiling: parquet drops -> micro-batches -> incremental
pipeline; final state must equal a cold batch build over all rows."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from ariadne_spark.operators.incremental import SpatialPipeline
from ariadne_spark.streaming.retile import stream_retile
from ariadne_spark.synth.images import IMAGES_SCHEMA, generate_rows
from ariadne_spark.synth.regions import generate_regions

BATCHES = [np.arange(0, 400), np.arange(400, 600), np.arange(600, 700)]


def test_stream_retile_equals_batch_build(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    # drop the first file before starting (cold start), rest as backlog
    for i, ids in enumerate(BATCHES):
        tbl = generate_rows(ids)
        tbl = tbl.select([c for c in tbl.column_names if c != "bytes"])
        pq.write_table(tbl, str(drop / f"batch_{i}.parquet"))

    pipeline = SpatialPipeline(
        spark, str(tmp_path / "store"), generate_regions(), max_z=6
    )
    q = stream_retile(
        spark,
        str(drop),
        pipeline,
        str(tmp_path / "ckpt"),
        available_now=True,
        max_files_per_trigger=1,  # force one micro-batch per file
    )
    q.awaitTermination(500)
    assert not q.isActive

    ref = SpatialPipeline(
        spark, str(tmp_path / "ref"), generate_regions(), max_z=6
    )
    all_ids = np.concatenate(BATCHES)
    pdf = generate_rows(all_ids).to_pandas()
    ref.full_build(
        spark.createDataFrame(pdf, schema=IMAGES_SCHEMA).drop("bytes")
    )
    assert pipeline.table_fingerprints() == ref.table_fingerprints()

    # three micro-batches happened: snapshots 0 (cold) + 2 updates
    assert pipeline.store.current_snapshot_id("images_indexed") == 2
