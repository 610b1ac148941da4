"""Streaming distinct-count sketch — continuous cardinality monitoring
with BOUNDED per-group state (`applyInPandasWithState`).

The batch sketch (`functions/sketch.py`) caps the shuffle at k bucket
minima per group; this is its streaming twin, and the same property
caps the STATE: one fixed 8·k-byte vector per group (k=256 ⇒ 2 KB),
regardless of how many distinct values the stream has carried. The
naive streaming `approx distinct` alternatives either hold the whole
distinct set in state (unbounded) or give up on exactness of the
estimate across restarts; here the state is the bucket-minima vector
itself, min-merged per micro-batch with vectorized numpy — so after
ANY chunking of the input the emitted estimate is bit-identical to the
batch `distinct_sketch` over the same rows (min is associative and
commutative; the estimator is a pure function of the minima). That
streaming == batch equality is asserted in tests/test_streaming.py.

Use case: per-source vocabulary / distinct-URL monitoring on a crawl
ingest stream — the state store (RocksDB-backed on a cluster) shards
the (group -> 2 KB) entries by group across executors.

Reference analog: the reference's per-project analytics counters
(`packages/mcp/src/analytics/query_stats.ts`) are exact in-process
tallies; this is the cluster-scale continuous form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ariadne_spark.functions.sketch import (
    M31,
    _V2_SALT,
    estimate_from_minima_sum,
    mix_np,
)

OUTPUT_SCHEMA = "g string, est_distinct long"
# minima packed as little-endian int64 bytes: fixed 8*k per group
STATE_SCHEMA = "mins binary"


def distinct_sketch_stateful(
    df: DataFrame, group_col: str = "g", value_col: str = "x", k: int = 256
) -> DataFrame:
    """Streaming per-group approximate COUNT(DISTINCT value_col).

    Emits (group, est_distinct) once per group per micro-batch that
    touches it; the latest emission always equals the batch
    `distinct_sketch` over all rows seen so far.
    """
    assert k & (k - 1) == 0, "k must be a power of two"
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (g,) = key
        if state.exists:
            mins = np.frombuffer(state.get[0], dtype="<i8").copy()
        else:
            mins = np.full(k, M31, dtype=np.int64)
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            v1 = mix_np(pdf[value_col].to_numpy())
            v2 = mix_np(v1 + _V2_SALT)
            np.minimum.at(mins, (v1 * k) // M31, v2)
        state.update((mins.astype("<i8").tobytes(),))
        yield pd.DataFrame(
            {
                "g": [g],
                "est_distinct": [estimate_from_minima_sum(int(mins.sum()), k)],
            }
        )

    return df.groupBy(group_col).applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
