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


def test_stateful_sessionize_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over chronological chunks
    == the batch lag-window sessionize (q32) — streaming state carries
    the session boundary across micro-batches correctly."""
    import os
    import sys
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    from ariadne_spark.streaming.sessions import sessionize_stateful

    sf = "/root/testdata/sf0.01"
    events = spark.read.parquet(f"{sf}/events.parquet")

    # three chronological chunk files with increasing mtimes so the
    # file source delivers them in order, one per micro-batch
    drop = tmp_path / "drop"
    drop.mkdir()
    q = events.selectExpr(
        "percentile_approx(ts, array(0.33, 0.66), 10000) as b").first()["b"]
    lo, hi = q[0], q[1]
    chunks = [
        events.where(F.col("ts") <= F.lit(lo)),
        events.where((F.col("ts") > F.lit(lo)) & (F.col("ts") <= F.lit(hi))),
        events.where(F.col("ts") > F.lit(hi)),
    ]
    for i, c in enumerate(chunks):
        p = str(drop / f"chunk_{i}")
        c.coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(p, (t, t))

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "chunk_*"))
    )
    out = sessionize_stateful(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            "SELECT user_id, max(n_sessions) AS n_sessions, "
            "max(n_events) AS n_events FROM sess_out GROUP BY user_id"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in entrymod.queries()["q32_sessionize"](spark, sf).collect()
    }
    assert got == want
