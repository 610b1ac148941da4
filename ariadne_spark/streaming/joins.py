"""Watermarked stream-stream join — the last §2.9 streaming concept.

Spark's stream-stream inner join buffers BOTH sides in state
(symmetric hash join); unbounded, that state grows forever. Bounding
it needs (a) a watermark on each side and (b) an event-time RANGE
condition tying the two sides together — then Spark can evict a
buffered row as soon as the other side's watermark passes the latest
event time that could still match it. This is the streaming analog of
the engine's as-of/range join (q09/q10): the reference's closest
concept is resolving a reference against the definition that was
live at the reference's timestamp
(`packages/core/src/call_graph/trace_call_graph.ts` resolution order),
made continuous.

The domain shape: an image-ingest stream (image registered, event
time `ingest_ts`) joined to a caption-update stream (caption attached
later by an annotation service, `caption_ts`), matched on image_id
when the caption arrives within `max_delay_s` of the ingest — the
streaming form of the lineage join a training-data pipeline runs to
pair payloads with late-arriving labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_caption_join(
    ingests: DataFrame,
    captions: DataFrame,
    max_delay_s: int = 600,
    late_s: int = 60,
) -> DataFrame:
    """Inner join `ingests(image_id, ingest_ts, ...)` with
    `captions(image_id, caption_ts, caption)` where the caption lands
    in `[ingest_ts, ingest_ts + max_delay_s]`.

    State stays bounded: each side is watermarked `late_s` behind its
    own max event time, and the range condition lets Spark drop a
    buffered ingest once the caption watermark passes
    `ingest_ts + max_delay_s` (and vice versa). Works identically on
    batch frames — the batch/streaming equivalence test runs the SAME
    function both ways (Spark ignores watermarks in batch mode).
    """
    ing = ingests.withWatermark("ingest_ts", f"{late_s} seconds")
    cap = captions.withWatermark("caption_ts", f"{late_s} seconds")
    return ing.join(
        cap,
        (ing["image_id"] == cap["image_id"])
        & (cap["caption_ts"] >= ing["ingest_ts"])
        & (
            cap["caption_ts"]
            <= ing["ingest_ts"] + F.expr(f"INTERVAL {int(max_delay_s)} SECONDS")
        ),
        "inner",
    ).select(
        ing["image_id"],
        ing["ingest_ts"],
        cap["caption_ts"],
        cap["caption"],
    )
