"""Order-independent DataFrame content fingerprint.

One construction, shared by every consumer that compares result
CONTENT across runs, strategies, or parallelism levels: per-row
xxhash64 over the selected columns, summed as two 32-bit halves in
decimal(38,0) (so the per-half sums never overflow — a long sum would
at ~2^31 rows), folded to (n_rows, hash mod 2^64). Sum is commutative/associative, so the
fingerprint is identical at any partitioning or cluster size — the
property the north rule's two-parallelism equality evidence rests on.

Consumers: jobs/pipeline_bench.py (N-vs-4N scaling equality),
bench_stress.py (window-vs-partial top-k equality at 24M). The
store's manifest summary (`store.partition_summary`) and
`dedup.dup_clusters`' convergence probe use the same split-sum
construction inline — the store's is part of the on-disk manifest
format and the dedup one keeps its halves unfolded, so they are
deliberately not routed through this helper; if the construction ever
changes, change it HERE and leave those two alone (manifest
compatibility / convergence detection do not need cross-script
comparability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def df_fingerprint(df: DataFrame, cols: list[str] | None = None) -> list[int]:
    """-> [n_rows, content_hash]: order-independent over `cols`
    (default: every column, in schema order — column ORDER does feed
    xxhash64, so two frames must agree on projection order to
    compare)."""
    columns = cols if cols is not None else df.columns
    h = F.xxhash64(*[F.col(c) for c in columns])
    # the 32-bit halves are summed as decimal(38,0): a long sum would
    # overflow (and, under Spark 4's default ANSI mode, throw) at
    # ~2^31 rows, since each half is < 2^32. decimal(38,0) holds
    # 2^32 * 10^12-row sums with >6 orders of margin, and the folded
    # value is IDENTICAL to the long-sum construction — recorded
    # fingerprints stay comparable.
    row = df.agg(
        F.sum(F.shiftrightunsigned(h, 32).cast("decimal(38,0)")).alias("hi"),
        F.sum(h.bitwiseAND(F.lit(0xFFFFFFFF)).cast("decimal(38,0)")).alias("lo"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    fp = ((int(row["hi"] or 0) << 32) + int(row["lo"] or 0)) % (1 << 64)
    return [int(row["n"]), fp]
