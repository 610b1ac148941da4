"""Incremental view maintenance (IVM) for SUM/COUNT aggregate views —
the classic self-maintainable-aggregate result (Gupta & Mumick,
"Maintenance of Materialized Views", IEEE DE Bulletin 1995) composed
from this store's own primitives:

    read_changes (row-level CDC)  ->  signed delta aggregation
        ->  merge_rows (copy-on-write upsert/delete on the view)

A SUM/COUNT view is self-maintainable: an insert contributes +value,
a delete -value, so the view updates from the DELTA alone — the base
table is never rescanned. `refresh_agg_view` therefore costs
O(changed partitions of base) + O(affected groups of view), whatever
the base table's total size: the steady-state maintenance cost tracks
the CHANGE RATE. Groups whose count reaches zero are deleted from the
view (merge_rows drops emptied partitions), and view partitions whose
groups are untouched are not rewritten (pinned by fingerprint in
tests).

Exactness: integer sums only — the delta arithmetic is the same
order-independent integer addition as the full recompute, so the
refreshed view is fingerprint-IDENTICAL to a cold rebuild (the test
gate), not merely approximately equal.

Reference analog: ariadne's incremental re-index updates the derived
symbol tables for changed files only, keyed by the same
changed-file diff (`packages/core/src/project/incremental_update.ts`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VIEW_COUNT_COL = "n_rows"


def _agg_exprs(sum_cols: list[str]):
    return [F.count("*").cast("long").alias(VIEW_COUNT_COL)] + [
        F.sum(F.col(c)).cast("long").alias(f"sum_{c}") for c in sum_cols
    ]


def create_agg_view(
    store,
    base_table: str,
    view: str,
    group_col: str,
    sum_cols: list[str],
    key: str | None = None,
) -> int:
    """Materialize the view (group_col, n_rows, sum_<c>...) from the
    CURRENT base snapshot and record which base snapshot it reflects
    (a tag-like advisory in the view's lineage). `key` is the view's
    partition column (default group_col — fine for low-cardinality
    groups like lang/shard; pass a derived bucket column name already
    present in the aggregate for high-cardinality groups)."""
    base = store.read(base_table)
    agg = base.groupBy(group_col).agg(*_agg_exprs(sum_cols))
    return store.write_table(agg, view, key=key or group_col)


def refresh_agg_view(
    store,
    base_table: str,
    view: str,
    group_col: str,
    sum_cols: list[str],
    from_sid: int,
    to_sid: int | None = None,
) -> int:
    """Bring the view from base snapshot `from_sid` to `to_sid`
    (default current) using ONLY the CDC delta. Returns the view's new
    snapshot id (or its current one when the delta is empty)."""
    delta = store.read_changes(base_table, from_sid, to_sid)
    sign = F.when(F.col("change") == "insert", F.lit(1)).otherwise(F.lit(-1))
    d = delta.groupBy(group_col).agg(
        F.sum(sign).cast("long").alias("__dn"),
        *[
            F.sum(sign * F.col(c)).cast("long").alias(f"__d_{c}")
            for c in sum_cols
        ],
    )
    if d.isEmpty():
        return store.current_snapshot_id(view)
    old = store.read(view).join(
        d.select(group_col), group_col, "left_semi"
    )
    merged = (
        d.join(old, group_col, "left")
        .select(
            group_col,
            (
                F.coalesce(F.col(VIEW_COUNT_COL), F.lit(0)) + F.col("__dn")
            ).cast("long").alias(VIEW_COUNT_COL),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0)) + F.col(f"__d_{c}")
                ).cast("long").alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
    )
    updates = merged.where(F.col(VIEW_COUNT_COL) > 0)
    deletes = merged.where(F.col(VIEW_COUNT_COL) <= 0).select(group_col)
    return store.merge_rows(
        updates, view, pk=group_col,
        deletes=deletes if not deletes.isEmpty() else None,
    )
