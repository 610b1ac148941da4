"""Tool-server layer (server.py): JSON-RPC dispatch over the query API
with per-call analytics — the MCP server/tool-registry analog
(`packages/mcp/src/server.ts:68`, `tools/tool_registry.ts:68+`,
`analytics/query_stats.ts`). Two tools are driven END-TO-END over the
wire protocol (serve() on file-like streams) and the store's recorded
query stats are asserted."""

from __future__ import annotations

import io
import json

import pytest

from ariadne_spark.server import (
    INVALID_PARAMS,
    INVALID_REQUEST,
    METHOD_NOT_FOUND,
    PARSE_ERROR,
    ToolServer,
)
from ariadne_spark.store import SnapshotStore


@pytest.fixture()
def srv(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "store"))
    images = spark.createDataFrame(
        [
            ("img_a", "amber bridge", "png"),
            ("img_b", "canyon delta", "png"),
            ("img_c", "ember forest", "fjpg"),
            ("img_d", "glacier harbor", "fjpg"),
        ],
        "image_id string, caption string, fmt string",
    )
    edges = spark.createDataFrame(
        [("img_a", "img_b"), ("img_b", "img_c"), ("img_d", "img_c")],
        "src_image_id string, dst_image_id string",
    )
    docs = spark.createDataFrame(
        [("d1", "slow fast words here", "en"), ("d2", "merge join encore", "fr")],
        "doc_id string, text string, lang string",
    )
    return ToolServer(store, {"images": images, "edges": edges, "docs": docs})


def _rpc(method, params=None, rid=1):
    req = {"jsonrpc": "2.0", "id": rid, "method": method}
    if params is not None:
        req["params"] = params
    return json.dumps(req)


def test_two_tools_end_to_end_over_the_protocol_with_recorded_stats(srv):
    """The verdict-prescribed flow: drive list_orphans and neighborhood
    through serve(), then read query_stats back THROUGH the protocol
    and assert the per-tool counts the store recorded."""
    inp = io.StringIO(
        "\n".join(
            [
                _rpc("tools/call", {"name": "list_orphans", "arguments": {"limit": 5}}, 1),
                _rpc("neighborhood", {"image_id": "img_c", "depth": 2}, 2),
                _rpc("neighborhood", {"image_id": "img_a", "direction": "out"}, 3),
                _rpc("query_stats", {}, 4),
            ]
        )
        + "\n"
    )
    out = io.StringIO()
    assert srv.serve(inp, out) == 4
    resps = {r["id"]: r for r in map(json.loads, out.getvalue().splitlines())}

    # orphans: img_a and img_d are never a dst; img_a reaches b and c
    text = resps[1]["result"]
    assert text.splitlines()[0] == "Orphan images (2 of 2, by transitive reach)"
    assert "img_a  (reach: 2)" in text and "img_d  (reach: 1)" in text

    # neighborhood of img_c at depth 2: callers b, d (1 hop), a (2 hops)
    tree = resps[2]["result"]
    # the requested depth now titles the focus line
    assert tree.splitlines()[0] == "img_c  (depth <= 2)"
    assert "linked-from (callers)" in tree
    assert "img_b  (depth 1)" in tree and "· img_a  (depth 2)" in tree
    out_tree = resps[3]["result"]
    assert "links-to (callees)" in out_tree and "img_b  (depth 1)" in out_tree

    # analytics recorded at dispatch, readable through the protocol
    stats = {r["tool"]: r["n_calls"] for r in resps[4]["result"]}
    assert stats == {"neighborhood": 2, "list_orphans": 1, "query_stats": 1}


def test_tools_list_and_direct_stats(srv):
    listing = srv.handle({"jsonrpc": "2.0", "id": 9, "method": "tools/list"})
    names = [t["name"] for t in listing["result"]["tools"]]
    assert names == sorted(
        ["list_orphans", "neighborhood", "get_stats", "corpus_card", "query_stats"]
    )
    nb = next(t for t in listing["result"]["tools"] if t["name"] == "neighborhood")
    assert nb["params"]["image_id"] == {"type": "str", "required": True}
    assert nb["params"]["depth"] == {"type": "int", "default": 2}
    # the listing must survive the wire: serve() json.dumps every
    # response, so nothing in describe() may be non-serializable
    # (a required-param Ellipsis default used to crash here)
    inp, out = io.StringIO(_rpc("tools/list", {}, 11) + "\n"), io.StringIO()
    assert srv.serve(inp, out) == 1
    wire = json.loads(out.getvalue())
    assert [t["name"] for t in wire["result"]["tools"]] == names

    stats = srv.handle({"jsonrpc": "2.0", "id": 10, "method": "get_stats"})
    assert stats["result"]["n_images"] == 4
    assert stats["result"]["n_knn_edges"] == 3
    assert stats["result"]["n_linked_images"] == 3


def test_corpus_card_over_protocol_is_deterministic(srv):
    a = srv.handle({"jsonrpc": "2.0", "id": 1, "method": "corpus_card"})
    b = srv.handle({"jsonrpc": "2.0", "id": 2, "method": "corpus_card"})
    assert a["result"] == b["result"]
    assert a["result"].startswith("# Dataset card")
    assert "| en | 1 |" in a["result"]


def test_protocol_error_paths(srv):
    # parse error
    r = json.loads(srv.handle_line("{not json"))
    assert r["error"]["code"] == PARSE_ERROR
    # unknown method
    r = srv.handle({"jsonrpc": "2.0", "id": 1, "method": "drop_tables"})
    assert r["error"]["code"] == METHOD_NOT_FOUND
    # unknown tool via tools/call
    r = srv.handle({"jsonrpc": "2.0", "id": 2, "method": "tools/call", "params": {"name": "nope"}})
    assert r["error"]["code"] == METHOD_NOT_FOUND
    # missing required param
    r = srv.handle({"jsonrpc": "2.0", "id": 3, "method": "neighborhood", "params": {}})
    assert r["error"]["code"] == INVALID_PARAMS and "image_id" in r["error"]["message"]
    # wrong type (bool is not int)
    r = srv.handle(
        {"jsonrpc": "2.0", "id": 4, "method": "list_orphans", "params": {"limit": True}}
    )
    assert r["error"]["code"] == INVALID_PARAMS
    # unknown param
    r = srv.handle(
        {"jsonrpc": "2.0", "id": 5, "method": "get_stats", "params": {"verbose": 1}}
    )
    assert r["error"]["code"] == INVALID_PARAMS
    # an exception raised INSIDE a handler body — even a ValueError —
    # is a handler failure (INTERNAL_ERROR), not a params error: the
    # dispatcher reserves INVALID_PARAMS for its own declared-param
    # validation (HandlerError wrapping pins this)
    r = srv.handle({"jsonrpc": "2.0", "id": 7, "method": "neighborhood",
                    "params": {"image_id": "img_a", "direction": "sideways"}})
    assert r["error"]["code"] == -32603
    srv.registry.register(
        "boom", "always raises ValueError", {}, lambda: (_ for _ in ()).throw(
            ValueError("not a params problem"))
    )
    r = srv.handle({"jsonrpc": "2.0", "id": 8, "method": "boom"})
    assert r["error"]["code"] == -32603 and "ValueError" in r["error"]["message"]
    # handler failure surfaces as internal error, not a crash
    srv.frames.pop("docs")
    r = srv.handle({"jsonrpc": "2.0", "id": 6, "method": "corpus_card"})
    assert r["error"]["code"] == -32603
    # notifications (no id) are silent even on error
    assert srv.handle({"jsonrpc": "2.0", "method": "drop_tables"}) is None
    assert srv.handle_line("not json at all {") is not None  # parse errs answer


def test_non_object_requests_answered_with_invalid_request(srv):
    # valid JSON that is NOT an object (a batch array, a bare string or
    # number) must be ANSWERED with -32600/id null (JSON-RPC 2.0 §4.2) —
    # not coerced to {} and treated as a notification, which silently
    # drops the reply and blocks a conforming batch client forever
    for payload in (
        '[{"jsonrpc": "2.0", "id": 1, "method": "get_stats"}]',
        '"ping"',
        "7",
        "null",
    ):
        r = json.loads(srv.handle_line(payload))
        assert r["error"]["code"] == INVALID_REQUEST, payload
        assert r["id"] is None
    # and over the wire: the response line IS written
    inp = io.StringIO('[{"jsonrpc": "2.0", "id": 1, "method": "get_stats"}]\n')
    out = io.StringIO()
    assert srv.serve(inp, out) == 1
    assert json.loads(out.getvalue())["error"]["code"] == INVALID_REQUEST


def test_tools_call_arguments_must_be_an_object(srv):
    # a list/str where {arguments} belongs is a CALLER mistake: answer
    # INVALID_PARAMS, not the handler TypeError's INTERNAL_ERROR
    r = srv.handle(
        {
            "jsonrpc": "2.0",
            "id": 1,
            "method": "tools/call",
            "params": {"name": "list_orphans", "arguments": ["limit"]},
        }
    )
    assert r["error"]["code"] == INVALID_PARAMS
    assert "arguments" in r["error"]["message"]
    # absent arguments still defaults to {}
    r = srv.handle(
        {
            "jsonrpc": "2.0",
            "id": 2,
            "method": "tools/call",
            "params": {"name": "get_stats"},
        }
    )
    assert "result" in r


def test_failed_calls_still_count_in_analytics(srv):
    srv.handle({"jsonrpc": "2.0", "id": 1, "method": "neighborhood",
                "params": {"image_id": "img_a", "direction": "sideways"}})
    r = srv.handle({"jsonrpc": "2.0", "id": 2, "method": "query_stats"})
    stats = {x["tool"]: x["n_calls"] for x in r["result"]}
    # the bad-direction call dispatched (valid params) and failed in the
    # handler — it still counts, like the reference's registry recorder
    assert stats.get("neighborhood") == 1


def test_null_id_is_answered_and_missing_method_is_invalid_request(srv):
    """JSON-RPC 2.0: "id": null is a valid (discouraged) request id and
    MUST be answered with id null — only an ABSENT id is a
    notification. And a request with no/ill-typed method is
    INVALID_REQUEST (-32600), not METHOD_NOT_FOUND (-32601)."""
    out = srv.handle_line(
        json.dumps({"jsonrpc": "2.0", "id": None, "method": "get_stats"})
    )
    assert out is not None, "id:null request must not be dropped"
    rep = json.loads(out)
    assert rep["id"] is None and "result" in rep

    out = srv.handle_line(json.dumps({"jsonrpc": "2.0", "id": 7}))
    rep = json.loads(out)
    assert rep["error"]["code"] == -32600
    out = srv.handle_line(json.dumps({"jsonrpc": "2.0", "id": 8, "method": 42}))
    rep = json.loads(out)
    assert rep["error"]["code"] == -32600
    # a structurally INVALID request with NO id member is NOT a
    # notification: the id cannot be determined, so the spec (§5)
    # requires a response with id null — silence would block the caller
    out = srv.handle_line(json.dumps({"jsonrpc": "2.0"}))
    assert out is not None, "invalid request without id must be answered"
    rep = json.loads(out)
    assert rep["error"]["code"] == -32600 and rep["id"] is None
    # a true notification (no id key) still gets no reply
    assert srv.handle_line(json.dumps({"jsonrpc": "2.0", "method": "get_stats"})) is None
    # unknown method keeps -32601
    rep = json.loads(srv.handle_line(_rpc("no_such_tool")))
    assert rep["error"]["code"] == -32601


def test_falsy_non_object_params_rejected(srv):
    """params: [] / 0 / "" are structurally invalid positional params
    and must answer INVALID_PARAMS — `or {}` used to silently treat
    them as no-params; absent or null params still mean no-params."""
    for bad in ([], 0, ""):
        rep = json.loads(
            srv.handle_line(
                json.dumps({"jsonrpc": "2.0", "id": 1, "method": "get_stats",
                            "params": bad})
            )
        )
        assert rep["error"]["code"] == -32602, bad
    for ok in (None, {}):
        rep = json.loads(
            srv.handle_line(
                json.dumps({"jsonrpc": "2.0", "id": 2, "method": "get_stats",
                            "params": ok})
            )
        )
        assert "result" in rep, ok
