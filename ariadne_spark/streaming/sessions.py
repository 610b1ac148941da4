"""Stateful streaming sessionization — the custom-stateful-operator
surface (`applyInPandasWithState`).

The batch engine sessionizes with a lag window (driver query
`q32_sessionize`); this is its streaming twin: per-user keyed state
(last event time, session count, event count) carried across
micro-batches, updated one Arrow batch at a time with vectorized
pandas (no per-row Python). The reference analog is the watcher-driven
registry mutation loop — keyed state updated per change event
(`packages/mcp/src/file_watcher.ts:120-148` driving
`project.ts:241-393`) — here the key is `user_id` instead of a file.

Equivalence contract (tested in tests/test_streaming.py): feeding the
events table through the stream in chronological chunks yields, per
user, exactly the batch sessionize counts — streaming == batch, the
same cold/incremental equality the engine guarantees for re-tiling.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

SESSION_GAP_S = 600

STATE_SCHEMA = "last_ts_us long, n_sessions long, n_events long"
OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"


def _advance(ts_us, last_ts_us: int | None, n_sessions: int, gap_s: int):
    """Vectorized session counting over a sorted int64-microsecond
    array, seeded by the previous batch's last event time."""
    import numpy as np

    if len(ts_us) == 0:
        return last_ts_us, n_sessions
    prev = np.empty(len(ts_us), dtype=np.int64)
    prev[1:] = ts_us[:-1]
    if last_ts_us is None:
        n_sessions += 1  # first-ever event opens a session
        prev[0] = ts_us[0]
    else:
        prev[0] = last_ts_us
    gaps = (ts_us // 1_000_000) - (prev // 1_000_000)
    n_sessions += int((gaps > gap_s).sum())
    return int(ts_us[-1]), n_sessions


def sessionize_stateful(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) -> per-user running
    (n_sessions, n_events), emitted once per user per micro-batch.
    Counts are cumulative and monotone, so the final value per user is
    the max across emissions."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts_us, n_sessions, n_events = state.get
        else:
            last_ts_us, n_sessions, n_events = None, 0, 0
        # a micro-batch delivers a group as MULTIPLE Arrow chunks (batch
        # size caps, shuffle order) — sessionization is order-sensitive,
        # so concatenate and sort the whole batch ONCE; sorting chunks
        # independently would count phantom/negative gaps and corrupt
        # the carried last_ts state
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            # normalize to int64 microseconds regardless of the pandas
            # datetime unit Arrow hands us (ns in pandas<2, us possible)
            ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            last_ts_us, n_sessions = _advance(ts_us, last_ts_us, n_sessions, gap_s)
            n_events += len(pdf)
        state.update((last_ts_us, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events: DataFrame, window_s: int = 3600, late_s: int = SESSION_GAP_S
) -> DataFrame:
    """Tumbling-window event counts with a watermark: once the
    watermark (max observed event time minus `late_s`) passes a
    window's end, the window is finalized + emitted (append mode emits
    each window exactly once) and subsequent arrivals for it are
    dropped. Note Spark's exact contract: the filter uses the
    start-of-batch watermark, so a late row landing in the same
    micro-batch that finalizes its window still merges; from the next
    batch on it is dropped (asserted via numRowsDroppedByWatermark in
    tests). The batch engine's analog is the snapshot watermark fast
    path (`store.diff` == "nothing changed")."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", f"{late_s} seconds")
        .groupBy(F.window("ts", f"{window_s} seconds").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
        )
    )
