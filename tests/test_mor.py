"""Merge-on-read equality deletes (Iceberg v2 delete files): tombstone
commits touch no data partition, readers apply them at scan time, time
travel crosses them, CDC sees them despite unchanged fingerprints,
materialization rewrites only affected partitions, and every lifecycle
op (compact, expire, rollback, overwrite, merge_rows) honors the
documented global-tombstone contract."""

import os

import pytest

# every test in this module runs on BOTH commit backends
pytestmark = pytest.mark.usefixtures("backend_matrix")
from pyspark.sql import functions as F

from ariadne_spark.store import SnapshotStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val long")


def _base_rows(n=30):
    return [(i, f"g{i % 3}", i * 10) for i in range(n)]


def _pks(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_mor_delete_is_metadata_only_and_time_travels(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    s0 = st.write_table(_df(spark, _base_rows()), "t", key="grp")
    s1 = st.delete_rows_mor(_pks(spark, [4, 7, 23]), "t", pk="id")
    # no data partition rewritten: identical paths AND fingerprints
    assert st.manifest("t", s0).partitions == st.manifest("t", s1).partitions
    assert {r["id"] for r in st.read("t").collect()} == set(range(30)) - {4, 7, 23}
    assert st.read("t", snapshot_id=s0).count() == 30  # time travel below
    # tombstones compose with zone-map reads and key pruning
    sub = st.read("t", keys=["g1"])
    assert {r["id"] for r in sub.collect()} == {i for i in range(30) if i % 3 == 1} - {4, 7}


def test_mor_accumulates_and_read_changes_sees_it(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    s0 = st.write_table(_df(spark, _base_rows()), "t", key="grp")
    s1 = st.delete_rows_mor(_pks(spark, [1]), "t", pk="id")
    s2 = st.delete_rows_mor(_pks(spark, [2, 5]), "t", pk="id")
    assert len(st.manifest("t").delete_files) == 2
    assert st.read("t").count() == 27
    # CDC across tombstone-only commits (fingerprints unchanged!)
    got = sorted((r["change"], r["id"]) for r in st.read_changes("t", s0, s2).collect())
    assert got == [("delete", 1), ("delete", 2), ("delete", 5)]
    got = sorted((r["change"], r["id"]) for r in st.read_changes("t", s1, s2).collect())
    assert got == [("delete", 2), ("delete", 5)]


def test_materialize_rewrites_only_affected_partitions(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    # all tombstoned ids live in g1 (ids 1,4 -> i%3==1); g0/g2 untouched
    st.delete_rows_mor(_pks(spark, [1, 4]), "t", pk="id")
    before = {k: dict(p) for k, p in st.manifest("t").partitions.items()}
    st.materialize_deletes("t")
    after = st.manifest("t").partitions
    assert not st.manifest("t").delete_files
    assert after["g0"] == before["g0"] and after["g2"] == before["g2"]
    assert after["g1"] != before["g1"]
    # physical content now equals the logical view
    assert st.read("t", _apply_deletes=False).count() == 28
    # a second materialize is a no-op
    sid = st.current_snapshot_id("t")
    assert st.materialize_deletes("t") == sid


def test_materialize_drops_emptied_partition(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    rows = [(1, "a", 1), (2, "a", 2), (3, "b", 3)]
    st.write_table(_df(spark, rows), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [3]), "t", pk="id")
    st.materialize_deletes("t")
    assert set(st.manifest("t").partitions) == {"a"}


def test_tombstones_survive_compaction_unchanged(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")
    st.compact("t")
    assert len(st.manifest("t").delete_files) == 1
    assert st.read("t").count() == 29  # still applied after compaction


def test_merge_rows_refuses_outstanding_tombstones(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")
    with pytest.raises(AssertionError, match="materialize_deletes"):
        st.merge_rows(_df(spark, [(4, "g1", 99)]), "t", pk="id")
    st.materialize_deletes("t")
    st.merge_rows(_df(spark, [(4, "g1", 99)]), "t", pk="id")  # now fine
    assert {r["val"] for r in st.read("t").where("id = 4").collect()} == {99}


def test_tombstones_are_global_until_materialized(spark, tmp_path):
    """The documented pk-tombstone contract: an overwrite that re-adds
    a tombstoned pk stays hidden until the tombstones materialize."""
    st = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")
    g1 = [(i, "g1", i * 10) for i in range(30) if i % 3 == 1]  # incl. id 4
    st.overwrite_partitions(_df(spark, g1), "t", key="grp")
    assert 4 not in {r["id"] for r in st.read("t").collect()}


def test_full_rewrite_refuses_outstanding_tombstones(spark, tmp_path):
    """A full re-snapshot with outstanding tombstones must refuse
    loudly (same contract as merge_rows): silently clearing them would
    resurrect erased pks; silently carrying them would hide re-inserted
    ones. Materializing first makes the rewrite legal."""
    st = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")
    with pytest.raises(AssertionError, match="materialize_deletes"):
        st.write_table(_df(spark, _base_rows()), "t", key="grp")
    # erasure intact, table untouched by the refused write
    assert st.read("t").count() == 29
    st.materialize_deletes("t")
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    assert not st.manifest("t").delete_files
    assert st.read("t").count() == 30


def test_materialize_survives_concurrent_overwrite_reinsert(spark, tmp_path):
    """The clear-commit race: a writer overwrites a tombstoned pk back
    in BETWEEN materialize's partition-rewrite commit and its tombstone-
    clear commit. The clear must detect the rebased content physically
    contains the pk, re-rewrite, and never resurrect the erased row."""
    root = str(tmp_path / "s")
    st = SnapshotStore(spark, root)
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")

    writer = SnapshotStore(spark, root)  # the concurrent writer
    real_overwrite = SnapshotStore.overwrite_partitions
    fired = {"n": 0}

    def racy_overwrite(self, df, table, key, **kw):
        sid = real_overwrite(self, df, table, key, **kw)
        if fired["n"] == 0:
            fired["n"] += 1
            # land a competing commit in the rewrite->clear window that
            # physically re-inserts the tombstoned pk into g1
            g1 = [(i, "g1", i * 10) for i in range(30) if i % 3 == 1]
            real_overwrite(writer, _df(spark, g1), "t", key="grp")
        return sid

    import unittest.mock as mock

    with mock.patch.object(SnapshotStore, "overwrite_partitions", racy_overwrite):
        st.materialize_deletes("t")
    assert not st.manifest("t").delete_files
    # the erasure held: pk 4 is gone both logically and physically
    assert 4 not in {r["id"] for r in st.read("t").collect()}
    assert 4 not in {
        r["id"] for r in st.read("t", _apply_deletes=False).collect()
    }
    # and the rest of the concurrent overwrite's content survived
    assert st.read("t").count() == 29


def test_materialize_survives_rebased_overwrite_reinsert(spark, tmp_path):
    """Variant of the race above landing BEFORE materialize's rewrite
    commit: the competing overwrite re-inserts the tombstoned pk into a
    DIFFERENT partition (g2, not located by the scan) in the window
    between the locate scan and the rewrite, so the rewrite REBASES the
    poisoned g2 in. A diff from the rewrite snapshot never inspects g2;
    the proven-fingerprint guard must re-scan it and re-rewrite."""
    import unittest.mock as mock

    root = str(tmp_path / "s")
    st = SnapshotStore(spark, root)
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")

    writer = SnapshotStore(spark, root)
    real_overwrite = SnapshotStore.overwrite_partitions
    fired = {"n": 0}

    def racy_overwrite(self, df, table, key, **kw):
        if fired["n"] == 0 and self is st:
            fired["n"] += 1
            # competing commit BEFORE materialize's rewrite: g2 content
            # plus the tombstoned pk (legal — tombstones are global
            # filters that keep applying to overwritten content)
            g2 = [(i, "g2", i * 10) for i in range(30) if i % 3 == 2]
            real_overwrite(writer, _df(spark, g2 + [(4, "g2", 40)]), "t", key="grp")
        return real_overwrite(self, df, table, key, **kw)

    with mock.patch.object(SnapshotStore, "overwrite_partitions", racy_overwrite):
        st.materialize_deletes("t")
    assert not st.manifest("t").delete_files
    # the erasure held in BOTH partitions: logically and physically
    assert 4 not in {r["id"] for r in st.read("t").collect()}
    assert 4 not in {
        r["id"] for r in st.read("t", _apply_deletes=False).collect()
    }
    assert st.read("t").count() == 29


def test_rollback_carries_and_resurrects(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    s0 = st.write_table(_df(spark, _base_rows()), "t", key="grp")
    s1 = st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")
    s2 = st.rollback("t", s0)  # below the delete: row resurrects
    assert st.read("t").count() == 30
    # CDC across the rollback reports the resurrection as an insert
    got = sorted((r["change"], r["id"]) for r in st.read_changes("t", s1, s2).collect())
    assert got == [("insert", 4)]
    s3 = st.rollback("t", s1)  # back onto the tombstoned snapshot
    assert st.read("t").count() == 29
    assert len(st.manifest("t").delete_files) == 1


def test_expire_keeps_live_tombstone_files(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")
    st.compact("t")  # another snapshot on top
    st.expire_snapshots("t", keep_last=1)
    assert st.read("t").count() == 29  # tombstone file survived expiry
    path = st.manifest("t").delete_files[0]["path"]
    assert os.path.isdir(str(tmp_path / "s" / path))


def test_ivm_refresh_over_mor_delete(spark, tmp_path):
    """The IVM composition: a MOR delete flows through read_changes
    into the aggregate view exactly like a physical delete."""
    from ariadne_spark.operators.ivm import create_agg_view, refresh_agg_view

    st = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "base", key="grp")
    create_agg_view(st, "base", "v", "grp", ["val"])
    st.delete_rows_mor(_pks(spark, [0, 3]), "base", pk="id")  # both g0
    refresh_agg_view(st, "base", "v", "grp", ["val"])
    got = {r["grp"]: (r["n_rows"], r["sum_val"]) for r in st.read("v").collect()}
    exp_g0 = [(i, v) for i, g, v in _base_rows() if g == "g0" and i not in (0, 3)]
    assert got["g0"] == (len(exp_g0), sum(v for _, v in exp_g0))
    assert got["g1"] == (10, sum(v for i, g, v in _base_rows() if g == "g1"))


def test_materialize_keeps_concurrently_added_tombstones(spark, tmp_path):
    """The clear commit must subtract only the entries it folded in: a
    tombstone committed by another writer DURING materialization
    survives (losing it would silently un-delete an erasure)."""
    st = SnapshotStore(spark, str(tmp_path / "s"))
    st2 = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.delete_rows_mor(_pks(spark, [4]), "t", pk="id")

    orig = st.overwrite_partitions

    def racy(*a, **k):
        sid = orig(*a, **k)
        # a second writer lands a new tombstone between the partition
        # rewrite and the clear commit
        st2.delete_rows_mor(_pks(spark, [9]), "t", pk="id")
        return sid

    st.overwrite_partitions = racy
    st.materialize_deletes("t")
    m = st.manifest("t")
    assert m.delete_files and len(m.delete_files) == 1  # the NEW tombstone
    ids = {r["id"] for r in st.read("t").collect()}
    assert 4 not in ids and 9 not in ids  # both erasures hold


def test_mor_rejects_unknown_pk_column(spark, tmp_path):
    """A tombstone keyed on a missing column would brick every read —
    refused at commit time instead."""
    st = SnapshotStore(spark, str(tmp_path / "s"))
    st.write_table(_df(spark, _base_rows()), "t", key="grp")
    bad = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(AssertionError, match="not a column"):
        st.delete_rows_mor(bad, "t", pk="doc_id")
    assert st.read("t").count() == 30  # table untouched


def test_read_changes_expired_from_sid_fails_cleanly(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "s"))
    s0 = st.write_table(_df(spark, _base_rows()), "t", key="grp")
    st.write_table(_df(spark, _base_rows(20)), "t", key="grp")
    st.expire_snapshots("t", keep_last=1)
    with pytest.raises((AssertionError, FileNotFoundError)):
        st.read_changes("t", s0).collect()


def test_write_table_rejects_tombstones_committed_during_write(spark, tmp_path):
    """A delete_rows_mor landing BETWEEN write_table's entry guard and
    its commit must surface CommitConflict — the re-snapshot's manifest
    carries no delete_files, so committing would silently clear the
    erasure (the loud-guard contract, race-proof)."""
    import unittest.mock as mock

    from ariadne_spark.store import CommitConflict

    root = str(tmp_path / "s")
    st = SnapshotStore(spark, root)
    st.write_table(_df(spark, _base_rows()), "t", key="grp")

    other = SnapshotStore(spark, root)
    real_summarize = SnapshotStore._summarize_written
    fired = {"n": 0}

    def racy_summarize(self, *a, **kw):
        out = real_summarize(self, *a, **kw)
        if fired["n"] == 0:
            fired["n"] += 1
            # erasure committed in the window after the entry guard
            other.delete_rows_mor(_pks(spark, [4]), "t", pk="id")
        return out

    with mock.patch.object(SnapshotStore, "_summarize_written", racy_summarize):
        with pytest.raises(CommitConflict, match="delete files"):
            st.write_table(_df(spark, _base_rows()), "t", key="grp")
    # the erasure held and the table is untouched by the failed write
    assert st.manifest("t").delete_files
    assert 4 not in {r["id"] for r in st.read("t").collect()}


def test_merge_rows_rejects_tombstones_committed_during_merge(spark, tmp_path):
    """merge_rows' no-tombstones entry assert is re-checked at commit:
    a delete_rows_mor landing between the assert and the rebased
    overwrite would otherwise be carried forward as a GLOBAL filter and
    silently hide the freshly-upserted rows."""
    import unittest.mock as mock

    from ariadne_spark.store import CommitConflict

    root = str(tmp_path / "s")
    st = SnapshotStore(spark, root)
    st.write_table(_df(spark, _base_rows()), "t", key="grp")

    other = SnapshotStore(spark, root)
    real_summarize = SnapshotStore._summarize_written
    fired = {"n": 0}

    def racy_summarize(self, *a, **kw):
        out = real_summarize(self, *a, **kw)
        if fired["n"] == 0:
            fired["n"] += 1
            # tombstone pk 4 concurrently with the merge that upserts it
            other.delete_rows_mor(_pks(spark, [4]), "t", pk="id")
        return out

    with mock.patch.object(SnapshotStore, "_summarize_written", racy_summarize):
        with pytest.raises(CommitConflict, match="delete files"):
            st.merge_rows(_df(spark, [(4, "g1", 999)]), "t", pk="id")
    # the tombstone survived; the upsert never became visible
    assert st.manifest("t").delete_files
    assert 4 not in {r["id"] for r in st.read("t").collect()}
