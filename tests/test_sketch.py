"""Sketch family (functions/sketch.py) — distinct-count and count-min:
accuracy/guarantee laws, invariance, cross-engine parity, and the
bounded-shuffle / broadcast plan shapes.

The sketch is deterministic integer arithmetic end to end, so every
assertion here is exact (==), including the DuckDB comparison — the
*approximate* estimate itself is reproducible bit-for-bit.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from ariadne_spark.functions.sketch import (
    M31,
    distinct_sketch,
    distinct_sketch_sql,
    mix_col,
    mix_sql,
)

K = 256


def _mix_np(x: np.ndarray) -> np.ndarray:
    v = np.asarray(x, dtype=np.int64) % M31
    for a, sh in (
        (1_103_515_245, 16),
        (1_665_525_021, 15),
        (1_013_904_223, 17),
        (1_597_334_677, 14),
    ):
        v = (v * a + 12345) % M31
        v = v ^ (v >> sh)
    return v


@pytest.fixture(scope="module")
def fixture_df(spark):
    """Three groups with adversarially structured value sets:
    dense sequential ids, strided ids, and LCG-scattered ids."""
    rng = np.random.default_rng(7)
    rows = (
        [("dense", int(i)) for i in range(20_000)]
        + [("strided", int(i * 4)) for i in range(8_000)]
        + [("random", int(v)) for v in rng.choice(50_000_000, 12_000, replace=False)]
    )
    return spark.createDataFrame(rows, "g string, x long"), {
        "dense": 20_000,
        "strided": 8_000,
        "random": 12_000,
    }


def test_mix_matches_numpy_and_duckdb(spark):
    vals = list(range(0, 3000, 7)) + [0, 1, M31 - 1, 123_456_789]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = [r[0] for r in df.select(mix_col(F.col("x")).alias("m")).orderBy("x").collect()]
    want = _mix_np(np.array(sorted(vals))).tolist()
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    dk = [r[0] for r in con.execute(f"SELECT {mix_sql('x')} FROM t ORDER BY x").fetchall()]
    assert dk == want


def test_estimate_within_error_bound(spark, fixture_df):
    df, truth = fixture_df
    est = {r["g"]: r["est_distinct"] for r in distinct_sketch(df, ["g"], F.col("x"), k=K).collect()}
    for g, n in truth.items():
        err = abs(est[g] - n) / n
        assert err < 0.10, f"{g}: est {est[g]} vs {n} ({err:.1%})"


def test_duplicates_do_not_change_estimate(spark, fixture_df):
    df, _ = fixture_df
    base = distinct_sketch(df, ["g"], F.col("x"), k=K).collect()
    doubled = distinct_sketch(df.unionAll(df), ["g"], F.col("x"), k=K).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, doubled))


def test_estimate_invariant_across_parallelism(spark, fixture_df):
    df, _ = fixture_df
    narrow = distinct_sketch(df.repartition(2), ["g"], F.col("x"), k=K).collect()
    wide = distinct_sketch(df.repartition(16), ["g"], F.col("x"), k=K).collect()
    assert sorted(map(tuple, narrow)) == sorted(map(tuple, wide))


def test_sql_twin_is_byte_identical(spark, fixture_df, tmp_path):
    df, _ = fixture_df
    path = str(tmp_path / "sketch_fixture.parquet")
    df.write.mode("overwrite").parquet(path)
    got = sorted(
        map(tuple, distinct_sketch(spark.read.parquet(path), ["g"], F.col("x"), k=K).collect())
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW v AS SELECT * FROM read_parquet('{path}/*.parquet')")
    want = sorted(con.execute(distinct_sketch_sql("v", ["g"], "x", k=K)).fetchall())
    assert got == want


def test_plan_is_two_bounded_aggregations(spark, fixture_df):
    """The scale contract: per-bucket min partial-aggregates map-side,
    so the shuffle carries <= k rows per group per mapper. Plan must be
    scan -> partial agg -> Exchange -> final agg (x2), no join, no
    window, no UDF."""
    import contextlib
    import io

    df, _ = fixture_df
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        distinct_sketch(df, ["g"], F.col("x"), k=K).explain("formatted")
    p = buf.getvalue()
    n_exchanges = p.count("+- Exchange") + p.count("   Exchange")
    assert n_exchanges == 2, p
    assert "Join" not in p
    assert "Window" not in p
    # no UDF — built-in operators only (the fixture's own scan node
    # mentions applySchemaToPythonRDD, so match UDF operators, not
    # the substring "Python")
    assert "EvalPython" not in p and "InPandas" not in p
    # partial aggregation actually planned (min has a partial_min pass)
    assert p.count("HashAggregate") >= 4, p


# ---------------------------------------------------------------------------
# Count-min frequency sketch
# ---------------------------------------------------------------------------

from ariadne_spark.functions.sketch import cm_build, cm_estimate, cm_sql  # noqa: E402

D, W = 4, 512  # narrow table so collisions actually occur in the fixture


@pytest.fixture(scope="module")
def freq_df(spark):
    """Zipf-ish frequencies: key i repeated (2000 // (i + 1)) times for
    i in [0, 400) — a few heavy hitters over a long tail."""
    rows = [(int(i),) for i in range(400) for _ in range(2000 // (i + 1))]
    return spark.createDataFrame(rows, "x long")


def test_cm_overestimates_within_bound(spark, freq_df):
    """The CM laws on every key: est >= exact always, and (for this
    deterministic fixture) est <= exact + 2n/w."""
    n = freq_df.count()
    cm = cm_build(freq_df, F.col("x"), d=D, w=W)
    exact = freq_df.groupBy("x").agg(F.count(F.lit(1)).alias("exact_freq"))
    est = cm_estimate(cm, exact, F.col("x"), d=D, w=W)
    rows = est.collect()
    assert len(rows) == 400
    bound = 2 * n // W
    for r in rows:
        assert r["est_freq"] >= r["exact_freq"], r
        assert r["est_freq"] <= r["exact_freq"] + bound, (r, bound)
    # collisions actually happened (the fixture exercises the min-of-d)
    assert any(r["est_freq"] > r["exact_freq"] for r in rows)


def test_cm_absent_keys_estimate_zero_when_any_counter_untouched(spark, freq_df):
    """True count-min semantics for keys the corpus never saw: the
    left-join + coalesce(0) makes min() return 0 whenever ANY of the
    key's d counters was never created, and an absent key whose
    counters are all collision-populated still satisfies est <= 2n/w.
    Both engines agree byte-for-byte on the same absent probe set."""
    n = freq_df.count()
    cm = cm_build(freq_df, F.col("x"), d=D, w=W)
    absent = spark.createDataFrame(
        [(int(i),) for i in range(10_000, 10_400)], "x long"
    )
    rows = cm_estimate(cm, absent, F.col("x"), d=D, w=W).collect()
    assert len(rows) == 400  # nothing dropped
    bound = 2 * n // W
    assert all(0 <= r["est_freq"] <= bound for r in rows)
    assert any(r["est_freq"] == 0 for r in rows)

    con = duckdb.connect()
    import pandas as pd  # noqa: F401

    freq_pdf = freq_df.toPandas()
    con.register("v", freq_pdf)
    psql = (
        "SELECT * FROM (SELECT CAST(range + 10000 AS BIGINT) AS x"
        " FROM range(400))"
    )
    want = dict(con.execute(cm_sql("v", "x", psql, ["x"], d=D, w=W)).fetchall())
    got = {r["x"]: r["est_freq"] for r in rows}
    assert got == want


def test_cm_invariant_across_parallelism(spark, freq_df):
    def run(parts):
        df = freq_df.repartition(parts)
        cm = cm_build(df, F.col("x"), d=D, w=W)
        probe = df.select("x").distinct()
        return sorted(map(tuple, cm_estimate(cm, probe, F.col("x"), d=D, w=W).collect()))

    assert run(2) == run(16)


def test_cm_sql_twin_is_byte_identical(spark, freq_df, tmp_path):
    path = str(tmp_path / "freq_fixture.parquet")
    freq_df.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    cm = cm_build(df, F.col("x"), d=D, w=W)
    probe = df.groupBy("x").agg(F.count(F.lit(1)).alias("exact_freq"))
    got = sorted(map(tuple, cm_estimate(cm, probe, F.col("x"), d=D, w=W).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW v AS SELECT * FROM read_parquet('{path}/*.parquet')")
    psql = "SELECT x, CAST(count(*) AS BIGINT) AS exact_freq FROM v GROUP BY 1"
    want = sorted(
        con.execute(cm_sql("v", "x", psql, ["x", "exact_freq"], d=D, w=W)).fetchall()
    )
    # column order differs (cm_sql selects probe cols then est); align by name
    got_aligned = sorted((x, ef, est) for (x, ef, est) in got)
    want_aligned = sorted((x, ef, est) for (x, ef, est) in want)
    assert got_aligned == want_aligned


def test_cm_build_scans_input_once(spark, freq_df, tmp_path):
    """The d hash rows must come from ONE scan of the input (exploded
    inline), not a union of d per-row groupBys — at 100 TB the corpus
    scans, not the tiny counter shuffle, are the cost."""
    import contextlib
    import io

    path = str(tmp_path / "cm_scan_fixture.parquet")
    freq_df.write.mode("overwrite").parquet(path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cm_build(spark.read.parquet(path), F.col("x"), d=D, w=W).explain("formatted")
    p = buf.getvalue()
    # count tree nodes only ("+- Scan parquet"); each node also echoes
    # a "(N) Scan parquet" detail section below the tree
    assert p.count("+- Scan parquet") == 1, p


def test_cm_probe_join_broadcasts(spark, freq_df):
    """The CM table is <= d*w rows regardless of input size — the probe
    join must broadcast it, never shuffle the probe side."""
    import contextlib
    import io

    cm = cm_build(freq_df, F.col("x"), d=D, w=W)
    probe = freq_df.select("x").distinct()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cm_estimate(cm, probe, F.col("x"), d=D, w=W).explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


# ---------------------------------------------------------------------------
# Histogram-quantile sketch
# ---------------------------------------------------------------------------

from ariadne_spark.functions.sketch import (  # noqa: E402
    quantile_sketch,
    quantile_sketch_sql,
)

BIN = 100


@pytest.fixture(scope="module")
def qval_df(spark):
    """Two groups with different shapes: uniform-ish ramp and a
    heavy-tailed square ramp (quantiles far from the mean)."""
    rows = [("ramp", int(i * 7 % 10_000)) for i in range(8_000)] + [
        ("tail", int((i * i) % 50_000)) for i in range(6_000)
    ]
    return spark.createDataFrame(rows, "g string, x long")


def test_quantile_within_bin_width(spark, qval_df):
    """est_p is the lower bound of the bin holding the true rank value,
    so true_p - est_p is in [0, BIN)."""
    import numpy as np

    got = {
        r["g"]: (r["n"], r["est_p500"], r["est_p950"])
        for r in quantile_sketch(qval_df, ["g"], F.col("x"), BIN).collect()
    }
    pdf = qval_df.toPandas()
    for g, sub in pdf.groupby("g"):
        xs = np.sort(sub["x"].to_numpy())
        n, e50, e95 = got[g]
        assert n == len(xs)
        for p, est in ((500, e50), (950, e95)):
            true = int(xs[(n * p + 999) // 1000 - 1])  # value at ceil rank
            assert 0 <= true - est < BIN, (g, p, est, true)


def test_quantile_invariant_across_parallelism(spark, qval_df):
    a = sorted(map(tuple, quantile_sketch(qval_df.repartition(2), ["g"], F.col("x"), BIN).collect()))
    b = sorted(map(tuple, quantile_sketch(qval_df.repartition(16), ["g"], F.col("x"), BIN).collect()))
    assert a == b


def test_quantile_sql_twin_is_byte_identical(spark, qval_df, tmp_path):
    path = str(tmp_path / "qval_fixture.parquet")
    qval_df.write.mode("overwrite").parquet(path)
    sp = quantile_sketch(spark.read.parquet(path), ["g"], F.col("x"), BIN).toPandas()
    cols = sorted(sp.columns)
    sp = sp[cols].sort_values(cols).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW v AS SELECT * FROM read_parquet('{path}/*.parquet')")
    od = con.execute(quantile_sketch_sql("v", ["g"], "x", BIN)).fetchdf()
    od = od[cols].sort_values(cols).reset_index(drop=True)
    assert sp.equals(od.astype(dict(sp.dtypes)))


def test_quantile_plan_aggregates_before_window(spark, qval_df):
    """The window must run over aggregated bins, not raw rows: plan is
    scan -> partial agg -> Exchange -> final agg -> (tiny) window ->
    final groupBy. No UDF, no sort of the raw data (the only Sort is
    the window's, which sorts bins)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        quantile_sketch(qval_df, ["g"], F.col("x"), BIN).explain("formatted")
    p = buf.getvalue()
    assert "EvalPython" not in p and "InPandas" not in p
    # the formatted tree prints top-down, so the Window (later stage)
    # must appear ABOVE at least one HashAggregate feeding it — i.e.
    # some bin-count aggregation exists below the Window node
    assert "HashAggregate" in p.split("Window")[-1], p
    # bin counts are partial-aggregated (>= 2 HashAggregates before window)
    assert p.count("HashAggregate") >= 3, p


# ---------------------------------------------------------------------------
# String keys
# ---------------------------------------------------------------------------

from ariadne_spark.functions.sketch import rolling_fp_col, rolling_fp_sql  # noqa: E402


def test_rolling_fp_parity_and_string_sketch(spark, tmp_path):
    """The string->long bridge matches its SQL twin byte-for-byte
    (short strings, shared prefixes/suffixes, empty string), keeps
    long-shared-prefix keys distinct (the prefix-only trap: 5000 URLs
    sharing 24+ chars collapse to 4 fps), and feeding it to
    distinct_sketch estimates distinct STRINGS within the error band
    on four adversarial shapes."""
    fixtures = {
        "tok": [f"token_{i}" for i in range(5_000)] + ["", "a", "ab", "abc"],
        "url": [f"https://example.com/page/{i}" for i in range(5_000)],
        "sfx": [f"{i}_README.multimodal.data.jsonl.zst" for i in range(5_000)],
        "rnd": [f"w{i * i % 999_983}_{i}" for i in range(5_000)],
    }
    rows = [(g, w) for g, ws in fixtures.items() for w in ws]
    rows += [("tok", w) for w in fixtures["tok"][:2_000]]  # duplicates
    df = spark.createDataFrame(rows, "g string, s string")
    path = str(tmp_path / "strs.parquet")
    df.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)

    got = [
        r[0]
        for r in df.select(rolling_fp_col(F.col("s")).alias("fp"))
        .orderBy("g", "s")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW v AS SELECT * FROM read_parquet('{path}/*.parquet')")
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {rolling_fp_sql('s')} FROM v ORDER BY g, s"
        ).fetchall()
    ]
    assert got == want

    # no fingerprint collapse on any fixture
    n_fp = {
        r["g"]: r["n"]
        for r in df.select("g", rolling_fp_col(F.col("s")).alias("fp"))
        .groupBy("g")
        .agg(F.countDistinct("fp").alias("n"))
        .collect()
    }
    for g, ws in fixtures.items():
        assert n_fp[g] >= len(set(ws)) * 0.999, (g, n_fp[g])

    est = {
        r["g"]: r["est_distinct"]
        for r in distinct_sketch(
            df, ["g"], rolling_fp_col(F.col("s")), k=1024
        ).collect()
    }
    for g, ws in fixtures.items():
        truth = len(set(ws))
        assert abs(est[g] - truth) / truth < 0.10, (g, est[g], truth)


def test_cm_estimate_rejects_oversized_d(spark):
    """cm_estimate/cm_sql guard d like cm_build does — a d beyond the
    salt table must fail with the named assertion, not an IndexError
    mid-plan-construction."""
    import pytest
    from pyspark.sql import functions as F

    from ariadne_spark.functions.sketch import CM_SALTS, cm_build, cm_estimate, cm_sql

    df = spark.createDataFrame([(1,), (2,)], "v long")
    cm = cm_build(df, F.col("v"))
    with pytest.raises(AssertionError, match="hash rows"):
        cm_estimate(cm, df, F.col("v"), d=len(CM_SALTS) + 1)
    with pytest.raises(AssertionError, match="hash rows"):
        cm_sql("t", "v", "p", ["v"], d=len(CM_SALTS) + 1)
