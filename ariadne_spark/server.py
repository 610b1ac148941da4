"""Tool-server layer: a stdio JSON-RPC dispatcher over the query API.

The reference serves its query surface over MCP — a server wiring a
tool registry to handlers (`packages/mcp/src/server.ts:68`,
`tools/tool_registry.ts:68+`) with per-call analytics
(`analytics/query_stats.ts`) and a project manager owning the session
state (`project_manager.ts`). This is the same three-piece shape,
protocol-minimal:

- `ToolRegistry` — name -> (description, params, handler); the
  extension point (register_tool), introspectable via `tools/list`.
- `ToolServer` — owns the session context (a `SnapshotStore` + the
  DataFrames the tools read) and dispatches JSON-RPC 2.0 requests:
  either MCP-style (`tools/call` with {name, arguments}) or direct
  (method == tool name). Every successful dispatch appends one row to
  the store's query log through `api.record_query` BEFORE the handler
  runs — the reference records the call at registry dispatch, not at
  handler success, so failed tool runs still count as usage.
- `serve(inp, out)` — newline-delimited JSON over any file-like pair
  (stdio in production, StringIO in tests). One request per line, one
  response per line; notifications (no id) get no response line.

Scale note: the server is a thin control plane — every handler defers
to the engine's distributed operators (list_orphans/neighborhood/
stats/corpus_card), so a tool call costs exactly what the underlying
query costs; nothing here buffers data proportional to table size
(formatters are limit-bounded).
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import DataFrame

from . import api

PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602
INTERNAL_ERROR = -32603


class UnknownTool(KeyError):
    """Raised by the registry for a name it has no tool for — kept
    distinct from any KeyError a handler body might raise, so handler
    failures map to INTERNAL_ERROR, never METHOD_NOT_FOUND."""


class HandlerError(Exception):
    """Wraps any exception a tool handler BODY raises, so handler
    failures always map to INTERNAL_ERROR — even a ValueError, which
    the dispatcher otherwise reserves for parameter validation."""


class ToolRegistry:
    """name -> {description, params, handler}. `params` is the
    declared parameter set: {name: (type, default)} — unknown or
    mistyped arguments are rejected before the handler runs (the
    schema-validation role of the reference's per-tool zod schemas,
    `tool_registry.ts:68+`)."""

    def __init__(self) -> None:
        self._tools: dict[str, dict] = {}

    def register(
        self,
        name: str,
        description: str,
        params: dict[str, tuple],
        handler: Callable[..., Any],
    ) -> None:
        assert name not in self._tools, f"tool {name!r} already registered"
        self._tools[name] = {
            "description": description,
            "params": params,
            "handler": handler,
        }

    def names(self) -> list[str]:
        return sorted(self._tools)

    def describe(self) -> list[dict]:
        # required params (default is the `...` sentinel) must NOT leak
        # Ellipsis into the wire dict — it is not JSON-serializable and
        # would crash serve()'s json.dumps on every tools/list response
        return [
            {
                "name": n,
                "description": t["description"],
                "params": {
                    p: (
                        {"type": ty.__name__, "required": True}
                        if dv is ...
                        else {"type": ty.__name__, "default": dv}
                    )
                    for p, (ty, dv) in t["params"].items()
                },
            }
            for n, t in sorted(self._tools.items())
        ]

    def validate(self, name: str, args: dict) -> dict:
        """-> the full keyword dict (defaults applied) or raises
        ValueError with a JSON-RPC-mappable message."""
        t = self._tools.get(name)
        if t is None:
            raise UnknownTool(f"unknown tool {name!r}")
        out = {}
        for p, (ty, default) in t["params"].items():
            if p in args:
                v = args[p]
                # bool is an int subclass: reject True for int params
                if not isinstance(v, ty) or (ty is int and isinstance(v, bool)):
                    raise ValueError(
                        f"param {p!r} of {name!r} must be {ty.__name__}, "
                        f"got {type(v).__name__}"
                    )
                out[p] = v
            elif default is ...:
                raise ValueError(f"missing required param {p!r} of {name!r}")
            else:
                out[p] = default
        unknown = set(args) - set(t["params"])
        if unknown:
            raise ValueError(f"unknown params for {name!r}: {sorted(unknown)}")
        return out

    def handler(self, name: str) -> Callable[..., Any]:
        return self._tools[name]["handler"]


class ToolServer:
    """See module docstring. `frames` supplies the DataFrames the
    default tools read: 'images' (image_id, caption, fmt, ...),
    'edges' (src_image_id, dst_image_id), optional 'docs' (doc_id,
    text, lang) for corpus_card."""

    def __init__(self, store, frames: dict[str, DataFrame]):
        self.store = store
        self.frames = frames
        self.registry = ToolRegistry()
        self._register_defaults()

    # -- default tools (the reference's core tool set analog) --------------

    def _register_defaults(self) -> None:
        reg = self.registry.register
        reg(
            "list_orphans",
            "Images never linked as a kNN destination, ranked by "
            "transitive reach (entry-point listing analog), rendered "
            "as a tree.",
            {
                "limit": (int, 20),
                "exclude_holdout": (bool, False),
                "exclude_framework": (bool, False),
            },
            self._tool_list_orphans,
        )
        reg(
            "neighborhood",
            "Nodes within `depth` kNN hops of an image, rendered as the "
            "callers/callees tree.",
            {"image_id": (str, ...), "depth": (int, 2), "direction": (str, "both")},
            self._tool_neighborhood,
        )
        reg(
            "get_stats",
            "Single-row global corpus statistics.",
            {},
            self._tool_stats,
        )
        reg(
            "corpus_card",
            "Deterministic dataset-card markdown for the docs table.",
            {},
            self._tool_corpus_card,
        )
        reg(
            "query_stats",
            "Per-tool call counts from the store's query log.",
            {},
            self._tool_query_stats,
        )

    def _tool_list_orphans(self, limit, exclude_holdout, exclude_framework):
        orphans = api.list_orphans(
            self.frames["images"],
            self.frames["edges"],
            exclude_holdout=exclude_holdout,
            exclude_framework=exclude_framework,
        )
        return api.format_orphans(orphans, limit=limit)

    def _tool_neighborhood(self, image_id, depth, direction):
        nb = api.neighborhood(
            self.frames["edges"], image_id, depth=depth, direction=direction
        )
        return api.format_neighborhood(nb, image_id, depth)

    def _tool_stats(self):
        row = api.stats(
            self.frames["images"], edges=self.frames.get("edges")
        ).collect()[0]
        return row.asDict()

    def _tool_corpus_card(self):
        return api.corpus_card(self.frames["docs"])

    def _tool_query_stats(self):
        return [r.asDict() for r in api.query_stats(self.store).collect()]

    # -- JSON-RPC dispatch ---------------------------------------------------

    def _call(self, name: str, args: dict) -> Any:
        kwargs = self.registry.validate(name, args)
        # record at dispatch (reference: query_stats.ts records in the
        # registry wrapper), so usage analytics include failed runs
        api.record_query(self.store, name)
        try:
            return self.registry.handler(name)(**kwargs)
        except Exception as e:
            raise HandlerError(f"{type(e).__name__}: {e}") from e

    def handle(self, req: dict) -> dict | None:
        # "id": null is a VALID request id (JSON-RPC 2.0 merely
        # discourages it) and must be answered with id null — only a
        # genuinely ABSENT id marks a notification, so membership, not
        # get(), decides
        is_notification = "id" not in req
        rid = req.get("id")

        def err(code: int, msg: str) -> dict | None:
            if is_notification:
                return None  # notification: errors are not answered
            return {"jsonrpc": "2.0", "id": rid, "error": {"code": code, "message": msg}}

        method = req.get("method")
        if not isinstance(method, str):
            # structurally invalid request (no/ill-typed method) is
            # INVALID_REQUEST per spec SS4.2, not METHOD_NOT_FOUND.
            # A structurally invalid request is NEVER treated as a
            # notification: when the id cannot be determined (absent
            # member) the spec says respond with id null (SS5 "If there
            # was an error in detecting the id ... it MUST be Null") —
            # suppressing the reply would leave a conforming client
            # waiting forever on its malformed call
            return {
                "jsonrpc": "2.0",
                "id": rid,  # None when absent — exactly the spec's null
                "error": {"code": INVALID_REQUEST, "message": "missing method"},
            }
        # absent params (or explicit null) means no-params; any OTHER
        # non-object value — including falsy [] / 0 / "" — is a
        # structurally invalid positional-params request
        params = req.get("params")
        if params is None:
            params = {}
        if not isinstance(params, dict):
            return err(INVALID_PARAMS, "params must be an object")
        try:
            if method == "tools/list":
                result = {"tools": self.registry.describe()}
            elif method == "tools/call":
                name = params.get("name")
                if not isinstance(name, str):
                    return err(INVALID_PARAMS, "tools/call needs a name")
                args = params.get("arguments")
                if args is None:
                    args = {}
                elif not isinstance(args, dict):
                    # a list/str here would otherwise surface as the
                    # handler's TypeError -> INTERNAL_ERROR; it is a
                    # caller mistake, so answer INVALID_PARAMS
                    return err(INVALID_PARAMS, "arguments must be an object")
                result = self._call(name, args)
            elif method in self.registry.names():
                result = self._call(method, params)
            else:
                return err(METHOD_NOT_FOUND, f"unknown method {method!r}")
        except UnknownTool as e:
            return err(METHOD_NOT_FOUND, str(e))
        except HandlerError as e:  # handler failure -> JSON-RPC error, not a crash
            return err(INTERNAL_ERROR, str(e))
        except ValueError as e:
            return err(INVALID_PARAMS, str(e))
        except Exception as e:  # dispatcher-internal failure
            return err(INTERNAL_ERROR, f"{type(e).__name__}: {e}")
        if is_notification:
            return None
        return {"jsonrpc": "2.0", "id": rid, "result": result}

    def handle_line(self, line: str) -> str | None:
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            return json.dumps(
                {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {"code": PARSE_ERROR, "message": f"parse error: {e}"},
                }
            )
        if not isinstance(req, dict):
            # valid JSON that is not an object (a batch array, a bare
            # string/number) must be ANSWERED with Invalid Request
            # (JSON-RPC 2.0 §4.2 / §6) — coercing it to {} would treat
            # it as a notification and silently drop the reply, leaving
            # a conforming batch client blocked forever
            return json.dumps(
                {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {
                        "code": INVALID_REQUEST,
                        "message": "request must be a JSON object "
                        "(batch requests unsupported)",
                    },
                }
            )
        resp = self.handle(req)
        return None if resp is None else json.dumps(resp)

    def serve(self, inp, out) -> int:
        """Newline-delimited JSON-RPC loop until EOF; returns the
        number of requests served. `inp`/`out` are file-like (stdio in
        production: `serve(sys.stdin, sys.stdout)`)."""
        n = 0
        for line in inp:
            line = line.strip()
            if not line:
                continue
            resp = self.handle_line(line)
            n += 1
            if resp is not None:
                out.write(resp + "\n")
                out.flush()
        return n
