"""Streaming incremental re-tiling — the file-watcher analog.

The reference watches the filesystem with chokidar and drives
`Project.update_file` per change event
(`mcp/src/file_watcher.ts:62-148` -> `project.ts:173-208`). The Spark
analog: a Structured Streaming file source watches a drop directory of
image parquet files; every micro-batch feeds the SAME incremental
pipeline (`operators/incremental.py`) through `foreachBatch`.

Exactly-once composition: Spark's streaming checkpoint guarantees each
file is delivered in exactly one micro-batch *per successful epoch*; a
replayed epoch (crash between sink commit and checkpoint commit)
re-calls `pipeline.update` with the same rows — which is harmless,
because the update is content-fingerprinted: identical partition
content -> empty snapshot diff -> no stage re-runs (see
`store.SnapshotStore.diff`). This is the same idempotency contract the
reference gets from delete-then-insert registry updates
(`registries/definition.ts:99-103`).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.incremental import SpatialPipeline
from ..synth.images import IMAGES_SCHEMA


def stream_retile(
    spark: SparkSession,
    drop_dir: str,
    pipeline: SpatialPipeline,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Watch `drop_dir` for image parquet files; incrementally re-tile
    every micro-batch. `available_now=True` drains the backlog and
    stops (test/batch-catchup mode); False runs continuously.
    """
    reader = spark.readStream.schema(IMAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(drop_dir).drop("bytes")

    def handle_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # pipeline.is_built() owns the layout knowledge — probing the
        # index table's name from here would silently full_build every
        # batch if the pipeline ever renamed its tables
        if not pipeline.is_built():
            pipeline.full_build(batch_df)  # cold start on the first batch
        else:
            pipeline.update(batch_df)

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
