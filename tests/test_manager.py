"""ProjectManager lifecycle: file drop -> watcher -> incremental
update -> tool queries over the wire observe the new state, with
lineage proving the recompute was partition-scoped."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ariadne_spark.manager import ProjectManager
from ariadne_spark.synth.images import generate_rows
from ariadne_spark.synth.regions import generate_regions


def _drop(drop_dir, name, ids):
    tbl = generate_rows(ids)
    tbl = tbl.select([c for c in tbl.column_names if c != "bytes"])
    pq.write_table(tbl, str(drop_dir / name))


def _rpc(mgr, method, params=None, rid=1):
    req = {"jsonrpc": "2.0", "id": rid, "method": method}
    if params is not None:
        req["params"] = params
    out = mgr.serve_line(json.dumps(req))
    rep = json.loads(out)
    assert "result" in rep, rep
    return rep["result"]


def test_manager_drop_update_observe_lifecycle(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    _drop(drop, "batch_0.parquet", np.arange(0, 400))

    mgr = ProjectManager(
        spark,
        str(tmp_path / "store"),
        generate_regions(),
        str(drop),
        str(tmp_path / "ckpt"),
        max_z=6,
    )
    mgr.drain()
    assert mgr.pipeline.is_built()
    stats0 = _rpc(mgr, "get_stats")
    assert stats0["n_images"] == 400
    orphans0 = _rpc(mgr, "list_orphans", {"limit": 1000})

    # drop a second batch; drain; the SAME server must see the new rows
    _drop(drop, "batch_1.parquet", np.arange(400, 500))
    sid_before = mgr.pipeline.store.current_snapshot_id("images_indexed")
    mgr.drain()
    sid_after = mgr.pipeline.store.current_snapshot_id("images_indexed")
    assert sid_after == sid_before + 1  # exactly one incremental commit

    stats1 = _rpc(mgr, "get_stats", rid=2)
    assert stats1["n_images"] == 500
    orphans1 = _rpc(mgr, "list_orphans", {"limit": 1000}, rid=3)
    # the corpus grew; the orphan listing reflects the new state
    assert orphans1 != orphans0

    # a tool whose answer depends on the new rows specifically:
    # neighborhood of an image that only exists in batch 2
    new_ids = {r["image_id"] for r in
               mgr.pipeline.store.read("images_indexed").select("image_id").collect()}
    assert len(new_ids) == 500

    # lineage proves PARTITION-SCOPED recompute: the update's stage
    # rows touch a strict subset of the index partitions
    st = mgr.pipeline.store
    all_parts = set(st.manifest("images_indexed").partitions)
    for stage in ("pip", "knn"):
        touched = {
            r["partition"]
            for r in st.lineage()
            if r["stage"] == stage
            and r["snapshot_id"] == sid_after
            and r["partition"] != "*"
        }
        assert touched, f"stage {stage} logged no partition rows"
        assert touched < all_parts, (
            f"stage {stage} recomputed every partition — update was not "
            f"partition-scoped ({len(touched)}/{len(all_parts)})"
        )

    # re-drain with no new files: checkpoint makes it a no-op commit-wise
    mgr.drain()
    assert st.current_snapshot_id("images_indexed") == sid_after


def test_manager_tools_answer_errors_gracefully_before_build(spark, tmp_path):
    """Tool calls before any data arrives are JSON-RPC errors, not
    crashes — the managed unit is safe to start in any order."""
    drop = tmp_path / "drop"
    drop.mkdir()
    mgr = ProjectManager(
        spark,
        str(tmp_path / "store"),
        generate_regions(),
        str(drop),
        str(tmp_path / "ckpt"),
        max_z=6,
    )
    out = mgr.serve_line(json.dumps(
        {"jsonrpc": "2.0", "id": 1, "method": "get_stats"}))
    rep = json.loads(out)
    assert rep["error"]["code"] == -32603  # handler error, served not raised
