"""Streaming exact dedup with duplicate counters — the streaming twin
of q41's md5 exact-dedup stage (`applyInPandasWithState`).

A crawl pipeline sees the same document many times (mirrors, re-crawls,
CDN copies); the batch engine collapses them with a hash groupBy. This
operator is the continuous form: per-dup-key state (canonical_id,
n_seen) carried across micro-batches, updated one Arrow batch at a
time with vectorized pandas. Per key the emissions converge to exactly
the batch aggregate

    groupBy(key).agg(min(id) AS canonical_id, count(*) AS n_seen)

under ANY chunking of the input (canonical is the running min, so
arrival order never matters; n_seen is monotone, so the final value is
the max across emissions) — the same streaming == batch equality the
engine guarantees for sessionization and re-tiling, tested in
tests/test_streaming.py.

Scale: state is ONE fixed-size entry per DISTINCT key — on a real
cluster the state store (RocksDB-backed) shards by key across
executors, so 10^12 distinct documents cost ~10^12 × ~50 B of
partitioned state, never driver memory. The reference analog is the
watcher skipping already-indexed unchanged content via its cache
manifest (`packages/core/src/project/project.ts:220-235`): keyed state
decides "seen before?" without re-reading history.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "dup_key string, canonical_id long, n_seen long"
STATE_SCHEMA = "canonical_id long, n_seen long"


def dedup_stateful(
    docs: DataFrame, id_col: str = "doc_id", key_col: str = "dup_key"
) -> DataFrame:
    """docs stream carrying (id_col:long, key_col:string, ...) ->
    per-key running (canonical_id, n_seen), emitted once per key per
    micro-batch that touches it. A consumer keeps rows where
    id == canonical_id for the deduped corpus and reads n_seen for the
    duplication histogram."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (dup_key,) = key
        if state.exists:
            canonical, n_seen = state.get
        else:
            canonical, n_seen = None, 0
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            m = int(pdf[id_col].min())
            canonical = m if canonical is None else min(canonical, m)
            n_seen += len(pdf)
        state.update((canonical, n_seen))
        yield pd.DataFrame(
            {
                "dup_key": [dup_key],
                "canonical_id": [canonical],
                "n_seen": [n_seen],
            }
        )

    return docs.groupBy(key_col).applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
