"""Query-surface tests (list_orphans / neighborhood / stats) against a
pure-python BFS oracle over the same edge list — exact assertions only,
mirroring the reference's MCP tool tests."""

from __future__ import annotations

from collections import deque

import pytest
from pyspark.sql import functions as F

from ariadne_spark.api import list_orphans, neighborhood, reach_counts, stats
from ariadne_spark.operators.knn import knn_edges


@pytest.fixture(scope="module")
def edges(spark, images_df):
    return knn_edges(images_df.drop("bytes"), k=3, max_hamming=20).persist()


@pytest.fixture(scope="module")
def edge_list(edges):
    return [(r["src_image_id"], r["dst_image_id"]) for r in edges.collect()]


def _bfs(adj, start, depth):
    seen = {start: 0}
    q = deque([(start, 0)])
    while q:
        node, d = q.popleft()
        if d == depth:
            continue
        for nxt in adj.get(node, ()):
            if nxt not in seen:
                seen[nxt] = d + 1
                q.append((nxt, d + 1))
    seen.pop(start)
    return seen


def test_orphans_exact(images_df, edges, edge_list):
    dsts = {d for _, d in edge_list}
    all_ids = {r["image_id"] for r in images_df.select("image_id").collect()}
    expected = all_ids - dsts
    got = {r["image_id"] for r in list_orphans(images_df, edges, with_reach=False).collect()}
    assert got == expected


def test_reach_counts_match_bfs_oracle(images_df, edges, edge_list):
    adj: dict[str, list[str]] = {}
    for s, d in edge_list:
        adj.setdefault(s, []).append(d)
    roots_df = list_orphans(images_df, edges, with_reach=False).limit(50)
    roots = [r["image_id"] for r in roots_df.collect()]
    got = {
        r["root"]: r["n_reachable"]
        for r in reach_counts(edges, roots_df, max_depth=10).collect()
    }
    for root in roots:
        assert got[root] == len(_bfs(adj, root, 10)), root


def test_neighborhood_matches_bfs_oracle(edges, edge_list):
    adj_out: dict[str, list[str]] = {}
    adj_in: dict[str, list[str]] = {}
    for s, d in edge_list:
        adj_out.setdefault(s, []).append(d)
        adj_in.setdefault(d, []).append(s)
    focus = edge_list[0][0]
    got = neighborhood(edges, focus, depth=3, direction="both").collect()
    got_out = {r["image_id"]: r["min_depth"] for r in got if r["direction"] == "out"}
    got_in = {r["image_id"]: r["min_depth"] for r in got if r["direction"] == "in"}
    assert got_out == _bfs(adj_out, focus, 3)
    assert got_in == _bfs(adj_in, focus, 3)


def test_stats_counts(images_df, edges):
    row = stats(images_df, edges=edges).collect()[0]
    assert row["n_images"] == images_df.count()
    assert row["n_knn_edges"] == edges.count()
    assert (
        row["n_linked_images"]
        == edges.select("src_image_id").distinct().count()
    )


def test_orphan_ranking_deterministic(images_df, edges):
    top = list_orphans(images_df, edges, max_depth=5).limit(10).collect()
    reaches = [r["n_reachable"] for r in top]
    assert reaches == sorted(reaches, reverse=True)
    # ties broken by id ascending
    for a, b in zip(top, top[1:]):
        if a["n_reachable"] == b["n_reachable"]:
            assert a["image_id"] < b["image_id"]
