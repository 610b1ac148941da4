"""Sketch family — cardinality and frequency estimation, cross-engine
exact. Distinct-count: bucketed harmonic minima. Frequency: count-min.

The 100 TB problem: `COUNT(DISTINCT x)` shuffles every distinct value
to its group's reducer — at 10^12 rows the shuffle IS the job. The
sketch answer: hash each value, split the hash space into k buckets,
keep only the per-bucket MINIMUM hash, and estimate cardinality from
the harmonic sum of the minima (KMV / stochastic-averaging family —
same estimator family as HyperLogLog's, on minima instead of
leading-zero ranks; relative error ~ 1/sqrt(k), ~6% at k=256).

Why this shape for Spark: per-bucket `min` is an algebraic aggregate,
so Catalyst plans it as partial_min (map-side, inside whole-stage
codegen) -> Exchange carrying AT MOST k rows per group per mapper ->
final_min. The shuffle is O(k · groups · mappers) regardless of row
count — the sketch property expressed entirely in built-in operators
(no UDF, no UDAF). A second tiny groupBy folds the k minima into the
estimate. Plan shape pinned by tests/test_plans.py.

Determinism: the hash is a fixed integer mix (4 multiply + xorshift
rounds mod 2^31 — an LCG alone fails badly on sequential ids, measured
52% error at n=30k; 4 mixed rounds bring the worst structured input
to 9.1%, mean 3.4%, over dense/strided/random ids at n=5k..200k),
`min`/`sum` are order-independent, and every step is
exact int64 arithmetic (products < 2^62, so DuckDB BIGINT and Spark
LongType agree bit-for-bit). The estimate is therefore identical
across engines, partitionings, and cluster sizes — which is what lets
the driver oracle-check an *approximate* operator exactly.

Empty buckets contribute M31 to the harmonic sum (the expected minimum
of zero draws); accuracy is best for n_distinct >= ~3k values per
group — below that, exact countDistinct is cheap anyway.

Reference parity: the reference keeps per-project aggregate counts
(`packages/mcp/src/analytics/query_stats.ts`) by exact scan — viable
in one Node process, not at cluster scale; this is the scale analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ariadne_spark.functions.cells import idiv

M31 = 2_147_483_648  # 2^31 — all products stay < 2^62 (DuckDB-safe)

# (multiplier, xorshift) rounds of the integer mix. Multipliers are
# odd constants < M31 (Knuth LCG / Numerical Recipes); shifts feed the
# well-mixed high bits back into the low bits that a multiply-mod
# alone leaves structured.
_MIX_ROUNDS = (
    (1_103_515_245, 16),
    (1_665_525_021, 15),
    (1_013_904_223, 17),
    (1_597_334_677, 14),
)
_V2_SALT = 999_331  # decorrelates the min-value stream from the bucket stream


def mix_col(x: Column) -> Column:
    """4-round multiply+xorshift hash of a non-negative long, in [0, 2^31)."""
    v = x % F.lit(M31)
    for a, sh in _MIX_ROUNDS:
        v = (v * F.lit(a) + F.lit(12345)) % F.lit(M31)
        v = v.bitwiseXOR(F.shiftright(v, sh))
    return v


def mix_sql(x: str) -> str:
    """DuckDB twin of `mix_col` (byte-identical on the same input).

    Textual-size caveat: each xorshift round duplicates the expression
    (`xor(v, v >> sh)`), so the input string appears ~16x in the
    output; composing mix_sql over mix_sql squares that. The largest
    composed oracle today (q43) is ~53 KB — fine for DuckDB's parser —
    but don't feed multi-KB value_sql through nested mixes without
    checking the result size."""
    v = f"(({x}) % {M31})"
    for a, sh in _MIX_ROUNDS:
        v = f"((({v} * {a} + 12345) % {M31}))"
        v = f"xor({v}, {v} >> {sh})"
    return v


def mix_np(x):
    """numpy twin of `mix_col` (byte-identical; int64 in, int64 out).
    Used by the streaming sketch's state update and by tests."""
    import numpy as np

    v = np.asarray(x, dtype=np.int64) % M31
    for a, sh in _MIX_ROUNDS:
        v = (v * a + 12345) % M31
        v = v ^ (v >> sh)
    return v


def estimate_from_minima_sum(total: int, k: int) -> int:
    """The harmonic estimate from the sum of all k bucket minima
    (empty buckets counted as M31). Exact-int twin of the final
    select in `distinct_sketch` / `distinct_sketch_sql`."""
    return (k * (k - 1) * M31) // (total + 1)


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    k: int = 256,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT value) via bucketed minima.

    `value` must be a non-negative long expression (pre-hash strings
    with a rolling fingerprint, e.g. q25's). Returns one row per group
    with `out_col` (long). Shuffle volume is <= k rows per group per
    mapper — independent of row count.
    """
    assert k & (k - 1) == 0, "k must be a power of two"
    v1 = mix_col(value)
    v2 = mix_col(v1 + F.lit(_V2_SALT))
    sel = df.select(
        *group_cols,
        idiv(v1 * F.lit(k), M31).alias("__bucket"),
        v2.alias("__hv"),
    )
    minima = sel.groupBy(*group_cols, "__bucket").agg(F.min("__hv").alias("__m"))
    harm = minima.groupBy(*group_cols).agg(
        F.sum("__m").alias("__s"), F.count(F.lit(1)).alias("__p")
    )
    # exact floor-division by a Column denominator (idiv's int-divisor
    # trick, same invariant: numerator k*(k-1)*M31 ~ 1.4e14 < 2^53)
    num = F.lit(k * (k - 1) * M31)
    denom = F.col("__s") + (F.lit(k) - F.col("__p")) * F.lit(M31) + F.lit(1)
    return harm.select(
        *group_cols,
        ((num - (num % denom)) / denom).cast("long").alias(out_col),
    )


def distinct_sketch_sql(
    table_sql: str,
    group_cols: list[str],
    value_sql: str,
    k: int = 256,
    out_col: str = "est_distinct",
) -> str:
    """DuckDB twin of `distinct_sketch` (identical estimate, same input)."""
    v1 = mix_sql(value_sql)
    v2 = mix_sql(f"({v1}) + {_V2_SALT}")
    g = ", ".join(group_cols)
    num = k * (k - 1) * M31
    return f"""
        WITH hashed AS (
          SELECT {g}, (({v1}) * {k}) // {M31} AS bucket, {v2} AS hv
          FROM {table_sql}
        ), minima AS (
          SELECT {g}, bucket, min(hv) AS m FROM hashed GROUP BY {g}, bucket
        )
        SELECT {g},
               CAST({num} // (sum(m) + ({k} - count(*)) * {M31} + 1) AS BIGINT)
                 AS {out_col}
        FROM minima GROUP BY {g}
    """


# ---------------------------------------------------------------------------
# Count-min frequency sketch
# ---------------------------------------------------------------------------
#
# The 100 TB problem this solves: "how often does each of these keys
# occur?" asked of a probe set (hot domains, suspect URLs, watchlist
# tokens) without a full groupBy over 10^12 rows per question. The
# count-min table is d hash rows x w counters: each input row
# increments one counter per hash row, a key's estimate is the MIN of
# its d counters. Guarantees: est >= exact always (counters only
# overcount via collisions); est <= exact + 2n/w with probability
# 1 - 2^-d. Build cost in Spark: d partial-aggregated groupBys whose
# shuffles carry at most w rows per mapper each — the table is
# d*w longs (d=4, w=1024 -> 32 KB) no matter how many rows it summarizes,
# so it broadcasts to the probe join for free.
#
# Same determinism story as the distinct sketch: fixed integer mix,
# order-independent sums -> the approximate counts are bit-identical
# across engines/partitionings, so the oracle checks them exactly.

CM_SALTS = (0, 271_828_182, 141_421_356, 577_215_664)  # one per hash row


def cm_build(df: DataFrame, value: Column, d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min table over `value` (non-negative long expression):
    one row per (j, bucket) with its counter; <= d*w rows total.

    ONE scan of the input: the d (j, bucket) pairs explode inline and
    partial-aggregate in the same stage (a union of d groupBys would
    scan the corpus d times — at 100 TB the scans, not the tiny
    shuffle, are the cost)."""
    assert d <= len(CM_SALTS), f"at most {len(CM_SALTS)} hash rows"
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                idiv(mix_col(value + F.lit(CM_SALTS[j])) * F.lit(w), M31).alias(
                    "bucket"
                ),
            )
            for j in range(d)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("h"))
        .select(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    cm: DataFrame, probe: DataFrame, value: Column, d: int = 4, w: int = 1024
) -> DataFrame:
    """Frequency estimate for every probe row: min over the d counters
    the probe key hashes to. `cm` is tiny (<= d*w rows), so Spark
    broadcasts it; the probe side never shuffles.

    Absent probe keys estimate correctly: a key the corpus never saw
    hashes to counters that may not exist in the cm table — the LEFT
    join coalesces those to 0, so min() returns 0 whenever ANY of the
    key's d counters is untouched (true count-min semantics; an inner
    join here would min over only the collision-populated counters
    and overestimate, or drop fully-absent keys entirely).

    `d` and `w` must MATCH the cm_build call that produced `cm`: a
    smaller probe-side d silently min's over fewer counters (biased
    high) and a mismatched w probes the wrong buckets."""
    assert d <= len(CM_SALTS), f"at most {len(CM_SALTS)} hash rows"
    hashed = probe.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        idiv(
                            mix_col(value + F.lit(CM_SALTS[j])) * F.lit(w), M31
                        ).alias("bucket"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("h"),
    ).select("*", F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket")).drop("h")
    probe_cols = [c for c in probe.columns]
    return (
        hashed.join(F.broadcast(cm), ["j", "bucket"], "left")
        .groupBy(*probe_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_freq"))
    )


def cm_sql(
    table_sql: str,
    value_sql: str,
    probe_sql: str,
    probe_cols: list[str],
    probe_value_sql: str | None = None,
    d: int = 4,
    w: int = 1024,
) -> str:
    """DuckDB twin of cm_build + cm_estimate: estimates `probe_sql`'s
    keys against the count-min table of `table_sql`."""
    assert d <= len(CM_SALTS), f"at most {len(CM_SALTS)} hash rows"
    pv = probe_value_sql or value_sql
    rows = []
    for j in range(d):
        h = mix_sql(f"({value_sql}) + {CM_SALTS[j]}")
        rows.append(
            f"SELECT {j} AS j, (({h}) * {w}) // {M31} AS bucket, count(*) AS cnt"
            f" FROM {table_sql} GROUP BY 2"
        )
    cm = " UNION ALL ".join(rows)
    probes = " UNION ALL ".join(
        f"SELECT {', '.join(probe_cols)}, {j} AS j,"
        f" (({mix_sql(f'({pv}) + {CM_SALTS[j]}')}) * {w}) // {M31} AS bucket"
        f" FROM ({probe_sql})"
        for j in range(d)
    )
    g = ", ".join(probe_cols)
    return f"""
        WITH cm AS ({cm}), probes AS ({probes})
        SELECT {g}, min(coalesce(cnt, 0)) AS est_freq
        FROM probes LEFT JOIN cm USING (j, bucket)
        GROUP BY {g}
    """


# ---------------------------------------------------------------------------
# Histogram-quantile sketch
# ---------------------------------------------------------------------------
#
# The third classic sketch: percentiles without sorting 10^12 rows.
# Exact quantiles need a total order (a full range-shuffle + sort —
# the most expensive plan Spark can run); the histogram answer bins
# values at a fixed width, partial-aggregates bin counts map-side
# (shuffle <= n_bins rows per group per mapper), and reads the p-th
# quantile off the cumulative histogram. The estimate is the lower
# bound of the bin containing rank ceil(n*p/1000) — error is bounded
# by bin_width BY CONSTRUCTION, and the whole computation is integer,
# so it is bit-identical across engines and cluster sizes (oracle-
# checked exactly, like the other sketches). The window that scans the
# cumulative histogram runs over n_bins aggregated rows per group, not
# over the data.


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    bin_width: int,
    permilles: tuple[int, ...] = (500, 950),
) -> DataFrame:
    """Per-group approximate permille-quantiles of a non-negative long
    `value`: p -> lower bound of the histogram bin holding rank
    ceil(n*p/1000). Output columns: n, then est_p{p} per requested p."""
    from pyspark.sql import Window

    binned = (
        df.select(*group_cols, idiv(value, bin_width).alias("__bin"))
        .groupBy(*group_cols, "__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = binned.select(
        *group_cols,
        "__bin",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(Window.partitionBy(*group_cols)).alias("__n"),
    )
    aggs = [F.max("__n").alias("n")]
    for p in permilles:
        # rank_p = ceil(n*p/1000), exact in integers
        rank = ((F.col("__n") * F.lit(p) + F.lit(999)) - ((F.col("__n") * F.lit(p) + F.lit(999)) % F.lit(1000))) / F.lit(1000)
        hit = F.when(F.col("__cum") >= rank.cast("long"), F.col("__bin"))
        aggs.append((F.min(hit) * F.lit(bin_width)).alias(f"est_p{p}"))
    return cum.groupBy(*group_cols).agg(*aggs)


def quantile_sketch_sql(
    table_sql: str,
    group_cols: list[str],
    value_sql: str,
    bin_width: int,
    permilles: tuple[int, ...] = (500, 950),
) -> str:
    """DuckDB twin of `quantile_sketch` (identical output, same input)."""
    g = ", ".join(group_cols)
    picks = ",\n               ".join(
        f"min(CASE WHEN cum >= (n * {p} + 999) // 1000 THEN bin END)"
        f" * {bin_width} AS est_p{p}"
        for p in permilles
    )
    return f"""
        WITH binned AS (
          SELECT {g}, ({value_sql}) // {bin_width} AS bin, count(*) AS c
          FROM {table_sql} GROUP BY {g}, bin
        ), cum AS (
          SELECT {g}, bin,
                 sum(c) OVER (PARTITION BY {g} ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY {g}) AS n
          FROM binned
        )
        SELECT {g}, CAST(max(n) AS BIGINT) AS n,
               {picks}
        FROM cum GROUP BY {g}
    """


# ---------------------------------------------------------------------------
# String keys for the sketches
# ---------------------------------------------------------------------------


def rolling_fp_col(col: Column, n_chars: int = 16) -> Column:
    """Rolling polynomial fingerprint of a string's first `n_chars`
    chars, its LAST `n_chars` chars (rolled over reverse(col)), and
    its length, in [0, 2^31) — the string -> long bridge for the
    sketches. A prefix-only fingerprint (q25's) collapses URL-like
    keys that share a long prefix (measured: 5000 distinct URLs -> 4
    distinct fps); the suffix window separates those, the prefix
    window separates shared-suffix keys (file extensions), and the
    length term splits the remainder. ascii('') == 0 pads short
    strings identically in Spark and DuckDB.

    INPUT CONTRACT: ASCII strings only. Spark's ascii() and DuckDB's
    ascii() agree on ASCII and empty strings but can diverge on
    non-ASCII input (UTF-16/byte-derived value vs Unicode code
    point), which would break byte-identical cross-engine estimates.
    Fingerprint non-ASCII text by hashing an explicit byte encoding
    (e.g. xxhash64(encode(col,'utf-8')) with a matching oracle)
    before any oracle-checked query depends on it."""
    rev = F.reverse(col)
    fp = F.lit(0).cast("long")
    for i in range(1, n_chars + 1):
        fp = (fp * F.lit(31) + F.ascii(F.substring(col, i, 1))) % F.lit(M31)
    for i in range(1, n_chars + 1):
        fp = (fp * F.lit(31) + F.ascii(F.substring(rev, i, 1))) % F.lit(M31)
    return (fp * F.lit(31) + F.length(col)) % F.lit(M31)


def rolling_fp_py(s: str, n_chars: int = 16) -> int:
    """Pure-python twin of `rolling_fp_col`/`rolling_fp_sql` (same
    ASCII-only contract) — the executable definition the property test
    pins both engines against for ALL inputs."""
    fp = 0
    for i in range(n_chars):
        fp = (fp * 31 + (ord(s[i]) if i < len(s) else 0)) % M31
    rev = s[::-1]
    for i in range(n_chars):
        fp = (fp * 31 + (ord(rev[i]) if i < len(rev) else 0)) % M31
    return (fp * 31 + len(s)) % M31


def mix_py(x: int) -> int:
    """Pure-python twin of `mix_col`/`mix_sql` (scalar)."""
    v = x % M31
    for a, sh in _MIX_ROUNDS:
        v = (v * a + 12345) % M31
        v = v ^ (v >> sh)
    return v


def rolling_fp_sql(col: str, n_chars: int = 16) -> str:
    """DuckDB twin of `rolling_fp_col` (same ASCII-only contract)."""
    fp = "CAST(0 AS BIGINT)"
    for i in range(1, n_chars + 1):
        fp = f"((({fp}) * 31 + ascii(substring({col}, {i}, 1))) % {M31})"
    for i in range(1, n_chars + 1):
        fp = f"((({fp}) * 31 + ascii(substring(reverse({col}), {i}, 1))) % {M31})"
    return f"((({fp}) * 31 + length({col})) % {M31})"
