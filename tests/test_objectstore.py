"""Object-store-semantics CommitBackend: the snapshot protocol proven
against a medium with ONLY conditional-put/put/get/head/list/delete —
no rename, no hard links — including eventual-LIST-consistency fault
injection and the crash/race windows test_incremental pins for the
POSIX backend (re-pinned here with backend-level injection, since the
POSIX tests inject via the module-level link/rename primitives the
object backend never touches)."""

from __future__ import annotations

import os
import threading

import pytest

from ariadne_spark.object_backend import (
    ObjectStoreCommitBackend,
    object_count,
    reset_object_store,
)
from ariadne_spark.store import CommitConflict, SnapshotStore


@pytest.fixture(autouse=True)
def _fresh_bucket():
    reset_object_store()
    yield
    reset_object_store()


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val long")


def _rows(n=30):
    return [(i, f"g{i % 3}", i * 10) for i in range(n)]


# ---------------------------------------------------------------------------
# backend primitive semantics
# ---------------------------------------------------------------------------


def test_conditional_put_exactly_one_winner_threaded():
    be = ObjectStoreCommitBackend()
    wins = []
    barrier = threading.Barrier(8)

    def racer(i):
        barrier.wait()
        if be.create_exclusive("/b/k", f"w{i}"):
            wins.append(i)

    ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1
    assert be.read_text("/b/k") == f"w{wins[0]}"


def test_read_after_write_strong_but_list_lags():
    be = ObjectStoreCommitBackend(list_lag=2)
    for i in range(5):
        assert be.create_exclusive(f"/b/m/k{i}", str(i))
    # per-key reads are strongly consistent...
    assert be.exists("/b/m/k4") and be.read_text("/b/m/k4") == "4"
    # ...but the listing omits the 2 most recent creations
    assert be.list_names("/b/m") == ["k0", "k1", "k2"]
    lagless = ObjectStoreCommitBackend(list_lag=0)
    assert lagless.list_names("/b/m") == [f"k{i}" for i in range(5)]
    be.remove("/b/m/k0")
    assert not be.exists("/b/m/k0")
    be.remove("/b/m/k0")  # idempotent


def test_advisory_put_is_last_writer_wins():
    be = ObjectStoreCommitBackend()
    be.write_advisory("/b/HEAD", "1")
    be.write_advisory("/b/HEAD", "2")
    assert be.read_text("/b/HEAD") == "2"
    assert not be.create_exclusive("/b/HEAD", "3")  # key exists


def test_advisory_overwrite_does_not_advance_the_list_horizon():
    # the docstring's contract is "LIST omits the N most recently
    # CREATED keys"; an advisory OVERWRITE (e.g. a HEAD-cache refresh)
    # must not advance the global seq — doing so would prematurely
    # reveal a lag-hidden creation and the fault injection would
    # exercise a weaker hazard than claimed
    be = ObjectStoreCommitBackend(list_lag=1)
    be.write_advisory("/b/h/HEAD", "0")
    assert be.create_exclusive("/b/h/m1", "x")
    assert be.list_names("/b/h") == ["HEAD"]  # m1 is the newest creation
    for _ in range(5):
        be.write_advisory("/b/h/HEAD", "refresh")  # overwrites, no new key
    assert be.list_names("/b/h") == ["HEAD"], (
        "advisory overwrites revealed the lag-hidden newest creation"
    )
    # a genuinely NEW key does advance the horizon past m1
    be.write_advisory("/b/h/m2", "y")
    assert be.list_names("/b/h") == ["HEAD", "m1"]


# ---------------------------------------------------------------------------
# snapshot protocol on the object backend — no rename, no link, ever
# ---------------------------------------------------------------------------


def _obj_store(spark, tmp_path, **kw):
    return SnapshotStore(
        spark, str(tmp_path / "s"), backend=ObjectStoreCommitBackend(**kw)
    )


def test_full_metadata_lifecycle_without_rename_or_link(
    spark, tmp_path, monkeypatch
):
    """Drive every metadata operation with python-level os.link /
    os.rename / os.replace FORBIDDEN: the object backend must never
    need them (Spark's JVM writes the parquet data plane and is
    unaffected). The POSIX backend would trip immediately — sanity-
    checked at the end."""
    st = _obj_store(spark, tmp_path)

    def forbid(*a, **k):
        raise AssertionError("metadata path used a POSIX rename/link primitive")

    monkeypatch.setattr(os, "link", forbid)
    monkeypatch.setattr(os, "rename", forbid)
    monkeypatch.setattr(os, "replace", forbid)

    s0 = st.write_table(_df(spark, _rows()), "t", key="grp", bloom_cols=["id"])
    s1 = st.overwrite_partitions(
        _df(spark, [(1, "g1", 111), (4, "g1", 444)]), "t", key="grp"
    )
    assert st.read("t").count() == 30 - 10 + 2
    st.tag("t", "release", s0)
    st.branch("t", "published", s1)
    st.move_branch("t", "published", s0)
    assert st.read("t", "release").count() == 30
    st.delete_rows_mor(
        spark.createDataFrame([(4,)], "id long"), "t", pk="id"
    )
    st.materialize_deletes("t")
    st.compact("t")
    st.rollback("t", s1)
    st.expire_snapshots("t", keep_last=2)
    assert st.current_snapshot_id("t") is not None
    # prove the monkeypatch bites: the POSIX backend's CAS needs link(2)
    posix = SnapshotStore(spark, str(tmp_path / "p"))
    with pytest.raises(AssertionError, match="rename/link"):
        posix.write_table(_df(spark, _rows(6)), "t", key="grp")


def test_head_resolution_under_stale_listing(spark, tmp_path):
    """Eventual list consistency: with the listing lagging 3 puts, the
    current snapshot must still resolve — via the HEAD cache + per-key
    forward probe, never via listing freshness. With the HEAD object
    deleted too (worst case), the listed max + forward probe recovers."""
    st = _obj_store(spark, tmp_path, list_lag=3)
    for i in range(4):
        st.write_table(_df(spark, _rows(10 + i)), "t", key="grp") if i == 0 else (
            st.overwrite_partitions(_df(spark, _rows(10 + i)), "t", key="grp")
        )
    assert st.current_snapshot_id("t") == 3
    assert st.read("t").count() == 13
    # listing alone is stale (write_table/overwrite also PUT tags/heads,
    # so just assert it lags the true head)
    assert (st.snapshot_ids("t") or [-1])[-1] <= 3
    # kill the advisory HEAD: resolution falls back to listing + probe
    st.backend.remove(st._head_path("t"))
    assert st.current_snapshot_id("t") == 3
    # a new commit on the recovered head lands at sid 4
    assert st.overwrite_partitions(_df(spark, _rows(20)), "t", key="grp") == 4


def test_branches_resolve_under_stale_listing(spark, tmp_path):
    st = _obj_store(spark, tmp_path, list_lag=2)
    s0 = st.write_table(_df(spark, _rows()), "t", key="grp")
    s1 = st.overwrite_partitions(_df(spark, [(0, "g0", 7)]), "t", key="grp")
    st.branch("t", "pub", s0)
    st.move_branch("t", "pub", s1)
    st.move_branch("t", "pub", s0)
    st.move_branch("t", "pub", s1)
    # the newest chained version files are list-invisible; the forward
    # probe must still resolve the branch to its latest move
    assert st.branches("t")["pub"] == s1
    assert st.read("t", "pub").count() is not None


# ---------------------------------------------------------------------------
# crash windows (backend-level injection — the object twins of
# test_incremental's POSIX-primitive injections)
# ---------------------------------------------------------------------------


def test_first_commit_recovered_with_lost_head_and_blind_listing(spark, tmp_path):
    """Worst-case cold start: the FIRST commit's manifest landed via
    conditional PUT, the advisory HEAD write crashed, and the lagging
    listing has not surfaced any manifest yet. An early `return None`
    on the empty listing would make the durably committed table
    invisible (and a retrying writer lose the sid-0 CAS forever); the
    per-key forward probe from sid 0 must recover it."""
    st = _obj_store(spark, tmp_path, list_lag=50)
    st.backend.fail_next("write_advisory")
    with pytest.raises(OSError, match="injected"):
        st.write_table(_df(spark, _rows()), "t", key="grp")
    # the listing is blind, the HEAD is absent — probe alone recovers
    assert st.current_snapshot_id("t") == 0
    assert st.read("t").count() == 30
    assert st.overwrite_partitions(_df(spark, [(0, "g0", 1)]), "t", key="grp") == 1


def test_namespace_disjointness_survives_blind_listing(spark, tmp_path):
    """The tag/branch one-name-namespace checks must be per-key probes:
    a listing-based check would miss a just-created name on a lagging
    LIST and let a tag silently shadow a branch (tags resolve first in
    _resolve_sid, so every read of the branch name would serve the
    pinned snapshot instead of the moving head) — and vice versa."""
    st = _obj_store(spark, tmp_path, list_lag=50)
    st.write_table(_df(spark, _rows()), "t", key="grp")
    st.branch("t", "pub")
    with pytest.raises(AssertionError, match="already a branch"):
        st.tag("t", "pub")
    st.tag("t", "v1")
    with pytest.raises(AssertionError, match="already a tag"):
        st.branch("t", "v1")


def test_crash_before_conditional_put_leaves_old_snapshot(spark, tmp_path):
    st = _obj_store(spark, tmp_path)
    st.write_table(_df(spark, _rows()), "t", key="grp")
    st.backend.fail_next("create_exclusive")
    with pytest.raises(OSError, match="injected"):
        st.overwrite_partitions(_df(spark, [(0, "g0", 1)]), "t", key="grp")
    assert st.current_snapshot_id("t") == 0
    assert st.read("t").count() == 30
    # next attempt commits cleanly alongside the orphaned data files
    assert st.overwrite_partitions(_df(spark, [(0, "g0", 1)]), "t", key="grp") == 1


def test_crash_after_cas_before_head_put_is_committed(spark, tmp_path):
    st = _obj_store(spark, tmp_path)
    st.write_table(_df(spark, _rows()), "t", key="grp")
    st.backend.fail_next("write_advisory")
    with pytest.raises(OSError, match="injected"):
        st.overwrite_partitions(_df(spark, [(0, "g0", 1)]), "t", key="grp")
    # the conditional PUT already landed: the commit is durable and the
    # stale HEAD is probed past
    assert st.current_snapshot_id("t") == 1
    assert {r["val"] for r in st.read("t").where("id = 0").collect()} == {1}
    assert st.overwrite_partitions(_df(spark, [(3, "g0", 3)]), "t", key="grp") == 2


# ---------------------------------------------------------------------------
# commit races (two writers, one bucket)
# ---------------------------------------------------------------------------


def _interleave_before_first_cas(st, other_action):
    """Wrap st's backend so `other_action` runs just before st's next
    conditional PUT — the deterministic interleaving of the POSIX race
    tests, expressed at the backend seam."""
    be = st.backend
    real = be.create_exclusive
    fired = []

    def inject(path, content):
        if not fired and path.endswith("t.1.json"):
            fired.append(1)
            other_action()
        return real(path, content)

    be.create_exclusive = inject


def test_concurrent_disjoint_writers_both_commit_objstore(spark, tmp_path):
    root = str(tmp_path / "s")
    a = SnapshotStore(spark, root, backend=ObjectStoreCommitBackend())
    b = SnapshotStore(spark, root, backend=ObjectStoreCommitBackend())
    mk = lambda rows: spark.createDataFrame(rows, "id string, pk int")
    a.write_table(mk([("a", 1), ("b", 2)]), "t", "pk")
    _interleave_before_first_cas(
        a, lambda: b.overwrite_partitions(mk([("B", 2)]), "t", "pk")
    )
    sid = a.overwrite_partitions(mk([("A", 1)]), "t", "pk")
    assert sid == 2
    assert {r["id"] for r in a.read("t").collect()} == {"A", "B"}
    m = a.manifest("t")
    assert m.parent_id == 1 and set(m.partitions) == {"1", "2"}


def test_concurrent_overlapping_writer_conflicts_objstore(spark, tmp_path):
    root = str(tmp_path / "s")
    a = SnapshotStore(spark, root, backend=ObjectStoreCommitBackend())
    b = SnapshotStore(spark, root, backend=ObjectStoreCommitBackend())
    mk = lambda rows: spark.createDataFrame(rows, "id string, pk int")
    a.write_table(mk([("a", 1), ("b", 2)]), "t", "pk")
    _interleave_before_first_cas(
        a, lambda: b.overwrite_partitions(mk([("B", 1)]), "t", "pk")
    )
    with pytest.raises(CommitConflict, match="overlapping"):
        a.overwrite_partitions(mk([("A", 1)]), "t", "pk")
    assert a.current_snapshot_id("t") == 1
    assert {r["id"] for r in a.read("t").collect()} == {"B", "b"}


def test_tag_race_one_winner_objstore(spark, tmp_path):
    root = str(tmp_path / "s")
    a = SnapshotStore(spark, root, backend=ObjectStoreCommitBackend())
    b = SnapshotStore(spark, root, backend=ObjectStoreCommitBackend())
    a.write_table(_df(spark, _rows()), "t", key="grp")
    a.tag("t", "v1")
    with pytest.raises(CommitConflict, match="already exists"):
        b.tag("t", "v1")
    assert a.tags("t") == b.tags("t")
    assert object_count() > 0


def test_drop_branch_forward_probes_past_lagging_list(spark, tmp_path):
    """drop_branch on an eventually-consistent store must remove
    version files the lagging LIST has not surfaced yet — a survivor
    would resurrect the branch and permanently block the name."""
    root = str(tmp_path / "ob")
    st = SnapshotStore(spark, root, backend=ObjectStoreCommitBackend(list_lag=2))
    df = spark.createDataFrame([(1, "a", 1)], "pk long, key string, v long")
    s1 = st.write_table(df, "t", "key")
    s2 = st.write_table(
        spark.createDataFrame([(1, "a", 2)], "pk long, key string, v long"),
        "t", "key",
    )
    st.branch("t", "b", s1)
    st.move_branch("t", "b", s2)  # version files .0 and .1; LIST lags both
    st.drop_branch("t", "b")
    assert st.branches("t") == {}
    # the name is reusable in the shared tag namespace; resolve via the
    # read-after-write direct probe (the LIST-backed tags() view lags
    # by construction here — that lag is exactly what this test models)
    st.tag("t", "b", s1)
    assert st._resolve_sid("t", "b") == s1
