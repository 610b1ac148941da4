"""Manifest pk Bloom filters: no false negatives ever, real pruning on
point lookups, python/Spark hash parity, lifecycle persistence
(overwrite/compact/merge/MOR), saturation conservativeness, and the
bloom-located merge equals the scan-located merge fingerprint-for-
fingerprint."""

import pytest

# every test in this module runs on BOTH commit backends
pytestmark = pytest.mark.usefixtures("backend_matrix")

from ariadne_spark.store import SnapshotStore, bloom_positions


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val long")


def _rows(n=200, groups=10):
    return [(i, f"g{i % groups:02d}", i * 3) for i in range(n)]


def _store(spark, tmp_path, name="s"):
    return SnapshotStore(spark, str(tmp_path / name))


def test_bloom_no_false_negatives_and_prunes(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.write_table(_df(spark, _rows()), "t", key="grp", bloom_cols=["id"])
    m = st.manifest("t")
    assert m.bloom_cols == ["id"] and m.bloom_bits
    assert all("bloom" in p and "id" in p["bloom"] for p in m.partitions.values())
    # every present id's home partition is always a candidate
    for i, g, _ in _rows():
        cands = st.bloom_candidate_keys(m, "id", [i])
        assert g in cands, (i, g)
    # absent ids prune: across many probes, the average candidate set
    # must be far below "all partitions" (fp rate ~ (2n/m)^2)
    total = sum(
        len(st.bloom_candidate_keys(m, "id", [10_000 + j])) for j in range(50)
    )
    assert total < 50 * len(m.partitions) * 0.5
    # multi-value probe unions candidates
    cands = st.bloom_candidate_keys(m, "id", [0, 1])
    assert {"g00", "g01"} <= set(cands)


def test_bloom_positions_python_spark_parity(spark, tmp_path):
    """The python twin computes the same bit positions the Column
    expressions set: flipping any probe value's claimed membership
    would need a hash mismatch, so exhaustive no-false-negative
    coverage (above) + this direct check pins the parity."""
    from pyspark.sql import functions as F

    bits = 4096
    vals = [0, 1, 7, 123456789, -5]
    df = spark.createDataFrame([(v,) for v in vals], "id long")
    for s in (0, 1):
        got = [
            int(r[0])
            for r in df.select(
                F.expr(
                    f"crc32(encode(concat(cast(id AS STRING), '#{s}'), "
                    f"'UTF-8')) % {bits}"
                )
            ).collect()
        ]
        exp = [bloom_positions(v, bits)[s] for v in vals]
        assert got == exp


def test_bloom_persists_through_lifecycle(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.write_table(_df(spark, _rows()), "t", key="grp", bloom_cols=["id"])
    # merge_rows rewrites some partitions: blooms stay current
    st.merge_rows(_df(spark, [(1000, "g03", 1)]), "t", pk="id")
    m = st.manifest("t")
    assert all("bloom" in p for p in m.partitions.values())
    assert "g03" in st.bloom_candidate_keys(m, "id", [1000])
    # compact keeps collecting
    st.compact("t")
    m = st.manifest("t")
    assert all("bloom" in p for p in m.partitions.values())
    assert "g03" in st.bloom_candidate_keys(m, "id", [1000])
    # re-snapshot without explicit bloom_cols inherits the opt-in
    st.write_table(_df(spark, _rows(100)), "t", key="grp")
    m = st.manifest("t")
    assert m.bloom_cols == ["id"]
    assert all("bloom" in p for p in m.partitions.values())


def test_bloom_located_merge_equals_scan_located(spark, tmp_path):
    """The bloom fast path is an optimization, never a semantics
    change: identical merge results with and without blooms."""
    ups = [(5, "g05", 999), (2000, "g07", 7)]
    dels_ids = [17, 33]

    fps = {}
    for name, bloom in (("b", ["id"]), ("nb", None)):
        st = _store(spark, tmp_path, name)
        st.write_table(
            _df(spark, _rows()), "t", key="grp", bloom_cols=bloom
        )
        st.merge_rows(
            _df(spark, ups), "t", pk="id",
            deletes=spark.createDataFrame([(i,) for i in dels_ids], "id long"),
        )
        m = st.manifest("t")
        fps[name] = {k: p["fingerprint"] for k, p in m.partitions.items()}
    assert fps["b"] == fps["nb"]


def test_bloom_speeds_mor_materialize_and_cdc(spark, tmp_path):
    """MOR materialization and CDC locate through blooms: correct
    results, and the tombstone-delta locate only reads candidate
    partitions (pruning asserted via the candidate set)."""
    st = _store(spark, tmp_path)
    s0 = st.write_table(_df(spark, _rows()), "t", key="grp", bloom_cols=["id"])
    s1 = st.delete_rows_mor(
        spark.createDataFrame([(7,)], "id long"), "t", pk="id"
    )
    # CDC sees the MOR delete (located via bloom candidates)
    got = [(r["change"], r["id"]) for r in st.read_changes("t", s0, s1).collect()]
    assert got == [("delete", 7)]
    cands = st.bloom_candidate_keys(st.manifest("t"), "id", [7])
    assert "g07" in cands and len(cands) < 10
    before = {k: p["fingerprint"] for k, p in st.manifest("t").partitions.items()}
    st.materialize_deletes("t")
    after = st.manifest("t").partitions
    assert 7 not in {r["id"] for r in st.read("t").collect()}
    # partitions outside the candidate set were not rewritten
    for k in before:
        if k not in cands:
            assert after[k]["fingerprint"] == before[k], k


def test_bloom_saturation_is_conservative(spark, tmp_path):
    """An undersized filter (64 bits vs 100 distinct pks/partition)
    saturates: pruning power gone, correctness untouched."""
    st = _store(spark, tmp_path)
    st.write_table(
        _df(spark, _rows(400, groups=2)), "t", key="grp",
        bloom_cols=["id"], bloom_bits=64,
    )
    m = st.manifest("t")
    # still zero false negatives
    for i, g, _ in _rows(400, groups=2):
        assert g in st.bloom_candidate_keys(m, "id", [i])
    st.merge_rows(_df(spark, [(9999, "g1", 1)]), "t", pk="id")
    assert st.read("t").where("id = 9999").count() == 1


def test_bloom_null_pk_rows_are_safe(spark, tmp_path):
    st = _store(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, "a", 1), (None, "a", 2), (3, "b", 3)],
        "id long, grp string, val long",
    )
    st.write_table(df, "t", key="grp", bloom_cols=["id"])
    m = st.manifest("t")
    assert set(st.bloom_candidate_keys(m, "id", [1])) >= {"a"}
    assert st.read("t").count() == 3


def test_bloom_rejects_bad_config(spark, tmp_path):
    """Non-multiple-of-64 widths would silently drop high positions
    (false negatives -> duplicate-pk corruption); non-int/string
    columns break the python/Spark hash twins. Both refuse loudly."""
    st = _store(spark, tmp_path)
    with pytest.raises(AssertionError, match="multiple of 64"):
        st.write_table(
            _df(spark, _rows(20)), "t", key="grp",
            bloom_cols=["id"], bloom_bits=100,
        )
    bdf = spark.createDataFrame(
        [(True, "a", 1), (False, "b", 2)], "flag boolean, grp string, val long"
    )
    with pytest.raises(AssertionError, match="integral and"):
        st.write_table(bdf, "t2", key="grp", bloom_cols=["flag"])
    with pytest.raises(AssertionError, match="multiple of 64"):
        bloom_positions(5, 100)
