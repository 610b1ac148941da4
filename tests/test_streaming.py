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


def test_watermark_drops_late_events(spark, tmp_path):
    """Windowed counts under a watermark: an event arriving later than
    the allowed lateness (behind the max seen event time) is dropped;
    on-time windows match a batch groupBy over the on-time rows."""
    import os
    import time

    from pyspark.sql import functions as F

    from ariadne_spark.streaming.sessions import windowed_event_counts

    drop = tmp_path / "wdrop"
    drop.mkdir()
    # batch 0: the on-time 10:00-window events; batch 1: an event far
    # ahead (advances the watermark past the window end); batch 2:
    # another on-time event (the batch whose start-of-batch watermark
    # finalizes + emits the 10:00 window); batch 3: the late arrival —
    # its window is already finalized, so the watermark drops it.
    # (Spark merges a late row that lands in the SAME batch the window
    # finalizes — the filter uses the start-of-batch watermark — hence
    # the one-batch spacer.)
    chunks_rows = [
        [(i, f"2024-01-01 10:{m:02d}:00", 1) for i, m in enumerate([0, 5, 40, 59])],
        [(9, "2024-01-01 12:00:00", 1)],
        [(12, "2024-01-01 12:02:00", 1)],
        [(10, "2024-01-01 10:10:00", 1), (11, "2024-01-01 12:05:00", 1)],
    ]
    for i, rows in enumerate(chunks_rows):
        df = spark.createDataFrame(rows, "event_id long, ts_s string, user_id long")
        df = df.select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id")
        p = str(drop / f"chunk_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    schema = "event_id long, ts timestamp, user_id long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "chunk_*"))
    )
    query = (
        windowed_event_counts(stream, window_s=3600, late_s=600)
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = {
        str(r["win_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    # the 10:00 window counts ONLY the 4 on-time events — the late
    # arrival (event 10) was dropped by the watermark
    assert got.get("2024-01-01 10:00:00") == 4, got
    # and the drop is visible in the stream metrics
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in query.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


def test_stateful_dedup_equals_batch(spark, tmp_path):
    """applyInPandasWithState exact dedup over arbitrary chunks == the
    batch groupBy(key).agg(min(id), count(*)) — canonical is a running
    min (arrival-order independent) and n_seen is monotone, so the last
    emission per key is the batch aggregate."""
    import os
    import sys
    import time

    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo")
    from ariadne_spark.streaming.dedup_stream import dedup_stateful

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    # synthesize re-crawl duplicates: every third doc appears again
    # under a larger id (same text -> same dup_key), and one doc three
    # times, so groups of size 1, 2 and 3 all occur
    dupes = docs.where(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    tripled = docs.where(F.col("doc_id") == 6).withColumn(
        "doc_id", F.col("doc_id") + 20_000
    )
    full = docs.unionByName(dupes).unionByName(tripled)
    keyed = full.select("doc_id", F.md5("text").alias("dup_key"))

    # three chunk files split so duplicates land in DIFFERENT
    # micro-batches than their originals (state must carry across), one
    # duplicate pair inside the SAME batch (within-batch path), and the
    # smaller id of one group arriving LAST (running-min path)
    drop = tmp_path / "drop"
    drop.mkdir()
    chunks = [
        keyed.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 10_000)),
        keyed.where(F.col("doc_id") >= 10_000),
        keyed.where(F.col("doc_id") < 100),
    ]
    for i, c in enumerate(chunks):
        p = str(drop / f"chunk_{i}")
        c.coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(p, (t, t))

    stream = (
        spark.readStream.schema(keyed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "chunk_*"))
    )
    out = dedup_stateful(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = {
        r["dup_key"]: (r["canonical_id"], r["n_seen"])
        for r in spark.sql(
            "SELECT dup_key, min(canonical_id) AS canonical_id, "
            "max(n_seen) AS n_seen FROM dedup_out GROUP BY dup_key"
        ).collect()
    }
    want = {
        r["dup_key"]: (r["canonical_id"], r["n_seen"])
        for r in keyed.groupBy("dup_key")
        .agg(
            F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_seen")
        )
        .collect()
    }
    assert got == want
    # sanity: group sizes 2 and 3 actually occurred
    sizes = {n for _, n in want.values()}
    assert {1, 2, 3} <= sizes


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream inner join (ingest x late caption
    within max_delay_s): the SAME function run as a streaming query
    over chunked file sources equals its batch execution over the
    identical rows — including a caption outside the delay window
    (never matches) and a pair split across micro-batches (the state
    buffer must hold the ingest until its caption arrives)."""
    import os
    import time

    from pyspark.sql import functions as F

    from ariadne_spark.streaming.joins import ingest_caption_join

    ing_rows = [
        ("img_a", "2024-01-01 10:00:00"),
        ("img_b", "2024-01-01 10:01:00"),
        ("img_c", "2024-01-01 10:02:00"),
        ("img_d", "2024-01-01 10:03:00"),
    ]
    cap_rows = [
        # same-batch match, cross-batch match, outside-window (img_c:
        # 700s > 600s delay), and a caption with no ingest at all
        ("img_a", "2024-01-01 10:04:00", "cap a"),
        ("img_b", "2024-01-01 10:09:00", "cap b"),
        ("img_c", "2024-01-01 10:13:40", "cap c late"),
        ("img_z", "2024-01-01 10:05:00", "cap orphan"),
    ]

    def mk(rows, ts_col, extra=()):
        cols = ["image_id", "ts_s", *extra]
        df = spark.createDataFrame(rows, ", ".join(f"{c} string" for c in cols))
        return df.select(
            "image_id", F.to_timestamp("ts_s").alias(ts_col), *extra
        )

    ing_b = mk(ing_rows, "ingest_ts")
    cap_b = mk(cap_rows, "caption_ts", ("caption",))
    want = sorted(
        map(tuple, ingest_caption_join(ing_b, cap_b).collect())
    )
    assert [r[0] for r in want] == ["img_a", "img_b"]  # c outside window

    # chunked file sources: img_b's ingest arrives in chunk 0 but its
    # caption only in chunk 1 — the join must buffer across batches
    for side, chunks in (
        ("ing", [ing_rows[:2], ing_rows[2:]]),
        ("cap", [cap_rows[:1], cap_rows[1:]]),
    ):
        d = tmp_path / side
        d.mkdir()
        for i, rows in enumerate(chunks):
            extra = ("caption",) if side == "cap" else ()
            ts_col = "caption_ts" if side == "cap" else "ingest_ts"
            p = str(d / f"chunk_{i}")
            mk(rows, ts_col, extra).coalesce(1).write.mode("overwrite").parquet(p)
            t = time.time() + i * 10
            for root, _dirs, files in os.walk(p):
                for f in files:
                    os.utime(os.path.join(root, f), (t, t))

    ing_s = (
        spark.readStream.schema("image_id string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "ing" / "chunk_*"))
    )
    cap_s = (
        spark.readStream.schema(
            "image_id string, caption_ts timestamp, caption string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "cap" / "chunk_*"))
    )
    q = (
        ingest_caption_join(ing_s, cap_s)
        .writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.sql("SELECT * FROM ss_join_out").collect()))
    assert got == want


def test_stateful_distinct_sketch_equals_batch(spark, tmp_path):
    """Streaming distinct-count sketch (bounded 2 KB state per group):
    after adversarial chunking — one group spanning all micro-batches,
    duplicates re-arriving in later batches, one group confined to a
    single batch — the final streaming estimate per group is
    bit-identical to the batch `distinct_sketch` over the same rows.
    The estimate is monotone non-decreasing (minima only fall), so the
    final value is max(est) per group."""
    import os
    import time

    from pyspark.sql import functions as F

    from ariadne_spark.functions.sketch import distinct_sketch
    from ariadne_spark.streaming.sketch_stream import distinct_sketch_stateful

    rows = (
        [("vocab_en", i) for i in range(9_000)]
        + [("vocab_de", i * 7 + 3) for i in range(4_000)]
        + [("one_batch", i * 11) for i in range(6_000)]
    )
    batch_df = spark.createDataFrame(rows, "g string, x long")

    drop = tmp_path / "drop"
    drop.mkdir()
    chunks = [
        # batch 0: first half of en, all of one_batch
        batch_df.where(
            ((F.col("g") == "vocab_en") & (F.col("x") < 4_500))
            | (F.col("g") == "one_batch")
        ),
        # batch 1: second half of en, first half of de, PLUS exact
        # duplicates of en rows already seen in batch 0
        batch_df.where(
            ((F.col("g") == "vocab_en") & (F.col("x") >= 4_500))
            | ((F.col("g") == "vocab_de") & (F.col("x") < 14_000))
        ).unionAll(
            batch_df.where((F.col("g") == "vocab_en") & (F.col("x") < 1_000))
        ),
        # batch 2: rest of de + more duplicates
        batch_df.where(
            (F.col("g") == "vocab_de") & (F.col("x") >= 14_000)
        ).unionAll(batch_df.where(F.col("g") == "one_batch")),
    ]
    for i, c in enumerate(chunks):
        p = str(drop / f"chunk_{i}")
        c.coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(p, (t, t))

    stream = (
        spark.readStream.schema("g string, x long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "chunk_*"))
    )
    out = distinct_sketch_stateful(stream, "g", "x", k=256)
    query = (
        out.writeStream.format("memory")
        .queryName("sketch_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_sketch"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = {
        r["g"]: r["est"]
        for r in spark.sql(
            "SELECT g, max(est_distinct) AS est FROM sketch_out GROUP BY g"
        ).collect()
    }
    want = {
        r["g"]: r["est_distinct"]
        for r in distinct_sketch(batch_df, ["g"], F.col("x"), k=256).collect()
    }
    assert got == want
    # the estimates are also sane (within the sketch's error band)
    truth = {"vocab_en": 9_000, "vocab_de": 4_000, "one_batch": 6_000}
    for g, n in truth.items():
        assert abs(got[g] - n) / n < 0.10, (g, got[g], n)


def test_stateless_chunk_docs_stream_equals_batch(spark, tmp_path):
    """chunk_docs is stateless column math, so the SAME expressions run
    unchanged under readStream: chunking a document stream file-by-file
    (append mode, no state, no watermark) emits exactly the batch
    chunking of the union — per-chunk, regardless of how the corpus is
    split into micro-batches."""
    from pyspark.sql import functions as F

    from ariadne_spark.operators.curation import chunk_docs

    sf = "/root/testdata/sf0.01"
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 300)
    )

    drop = tmp_path / "chunk_drop"
    drop.mkdir()
    for i, cond in enumerate(
        [F.col("doc_id") < 100,
         (F.col("doc_id") >= 100) & (F.col("doc_id") < 200),
         F.col("doc_id") >= 200]
    ):
        docs.where(cond).coalesce(1).write.mode("overwrite").parquet(
            str(drop / f"chunk_{i}")
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop / "chunk_*"))
    )
    query = (
        chunk_docs(stream, chunk=64, stride=48)
        .writeStream.format("memory")
        .queryName("chunk_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_chunk"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = sorted(map(tuple, spark.sql("SELECT * FROM chunk_out").collect()))
    want = sorted(map(tuple, chunk_docs(docs, chunk=64, stride=48).collect()))
    assert got == want and len(want) > 0


def test_streaming_ivm_view_stays_current(spark, tmp_path):
    """Streaming x IVM composition: a file stream of row-level upserts
    drives merge_rows on the base table and a CDC refresh of its
    aggregate view per micro-batch. After the stream drains, the view
    equals a cold rebuild over the final base — the streaming analog of
    the dashboard that never rescans its fact table."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from ariadne_spark.operators.ivm import create_agg_view, refresh_agg_view
    from ariadne_spark.store import SnapshotStore

    st = SnapshotStore(spark, str(tmp_path / "s"))
    base0 = [(i, ["en", "de", "fr"][i % 3], i * 10) for i in range(30)]
    schema_str = "id long, grp string, val long"
    st.write_table(spark.createDataFrame(base0, schema_str), "base", key="grp")
    create_agg_view(st, "base", "v", "grp", ["val"])

    # three upsert batches: an update, an insert in a new group, a move
    drop = tmp_path / "drop"
    drop.mkdir()
    batches = [
        [(3, "en", 999)],
        [(100, "zh", 7), (4, "de", 0)],
        [(5, "zh", 55), (6, "en", 66)],  # id 5 MOVES fr -> zh
    ]
    for i, rows in enumerate(batches):
        t = pa.table(
            {
                "id": [r[0] for r in rows],
                "grp": [r[1] for r in rows],
                "val": [r[2] for r in rows],
            }
        )
        pq2.write_table(t, str(drop / f"b{i}.parquet"))

    def on_batch(df, _bid):
        rows = df.collect()  # micro-batches are upsert-sized by contract
        if not rows:
            return
        ups = spark.createDataFrame(rows, schema_str)
        st.merge_rows(ups, "base", pk="id")
        refresh_agg_view(st, "base", "v", "grp", ["val"])

    q = (
        spark.readStream.schema(schema_str)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(500)
    assert not q.isActive

    st2 = SnapshotStore(spark, str(tmp_path / "cold"))
    st2.write_table(st.read("base"), "base", key="grp")
    create_agg_view(st2, "base", "v", "grp", ["val"])
    a = {k: p["fingerprint"] for k, p in st.manifest("v").partitions.items()}
    b = {k: p["fingerprint"] for k, p in st2.manifest("v").partitions.items()}
    assert a == b
    got = {r["grp"]: (r["n_rows"], r["sum_val"]) for r in st.read("v").collect()}
    assert got["zh"] == (2, 62)  # insert (100) + the moved id 5
    assert got["fr"][0] == 9     # id 5 genuinely left fr
    assert got["en"][0] == 10    # updates only, no membership change
