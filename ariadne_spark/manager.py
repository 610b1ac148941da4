"""ProjectManager — one managed lifecycle over watcher + incremental
pipeline + tool server.

The reference composes a Project, its chokidar file watcher, and the
MCP server into a single long-running unit: a file change drives
`project.update_file`, and the next tool call observes the updated
index (`packages/mcp/src/project_manager.ts:20-60`). This is the
Spark-native composition of the same three pieces the repo already
ships separately:

  drop_dir parquet files --(Structured Streaming file source,
      exactly-once per epoch; `streaming/retile.py`)-->
  `SpatialPipeline.full_build` / `.update` (partition-scoped
      recompute, lineage-logged; `operators/incremental.py`) -->
  `ToolServer` answering JSON-RPC over LIVE frames (`server.py`)

The glue fact that makes the composition safe is snapshot isolation:
tool frames are re-resolved from the store's CURRENT committed
snapshot at dispatch time (`_LiveFrames`), so a tool answer can never
observe a half-applied update — it sees the state before a commit or
after it, never in between — and observes every completed update
without any cache invalidation protocol (the reference needs explicit
update ordering for the same guarantee; here the store's atomic
manifest commit provides it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators.incremental import SpatialPipeline
from .server import ToolServer
from .streaming.retile import stream_retile


class _LiveFrames:
    """Mapping view that resolves tool frames from the store's CURRENT
    snapshot on every access — the no-stale-reads contract above."""

    def __init__(self, pipeline: SpatialPipeline, docs: DataFrame | None):
        self._pipeline = pipeline
        self._docs = docs

    def __getitem__(self, name: str) -> DataFrame:
        store = self._pipeline.store
        if name == "images":
            return store.read("images_indexed")
        if name == "edges":
            return store.read("knn").select("src_image_id", "dst_image_id")
        if name == "docs":
            if self._docs is None:
                raise KeyError("docs")
            return self._docs
        raise KeyError(name)

    def get(self, name: str, default=None):
        try:
            return self[name]
        except KeyError:
            return default

    def __contains__(self, name: str) -> bool:
        return self.get(name) is not None


class ProjectManager:
    """See module docstring.

    Usage::

        mgr = ProjectManager(spark, root, regions, drop_dir, ckpt_dir)
        mgr.drain()                  # ingest the current backlog
        mgr.serve_line(json_line)    # JSON-RPC over the updated state

    `start()` instead runs the watcher continuously (micro-batch per
    file-drop) until `stop()` — same pipeline, same tool surface.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        regions: list[dict],
        drop_dir: str,
        checkpoint_dir: str,
        docs: DataFrame | None = None,
        **pipeline_kw,
    ):
        self.spark = spark
        self.drop_dir = drop_dir
        self.checkpoint_dir = checkpoint_dir
        self.pipeline = SpatialPipeline(spark, root, regions, **pipeline_kw)
        self.server = ToolServer(
            self.pipeline.store, _LiveFrames(self.pipeline, docs)
        )
        self._query = None

    # -- ingest ------------------------------------------------------------

    def drain(self, timeout_s: int = 600) -> None:
        """Process every file currently in `drop_dir` (cold start ->
        full_build on the first batch, incremental `update` after),
        then return. Files already consumed in a previous drain are
        excluded by the streaming checkpoint — re-draining is a no-op,
        and a crash mid-drain resumes exactly-once per the retile
        module's idempotency contract."""
        q = stream_retile(
            self.spark,
            self.drop_dir,
            self.pipeline,
            self.checkpoint_dir,
            available_now=True,
        )
        q.awaitTermination(timeout_s)
        if q.isActive:  # pragma: no cover - timeout guard
            q.stop()
            raise TimeoutError(f"drain did not finish in {timeout_s}s")

    def start(self) -> None:
        """Run the watcher continuously (until `stop()`)."""
        assert self._query is None, "manager already started"
        self._query = stream_retile(
            self.spark,
            self.drop_dir,
            self.pipeline,
            self.checkpoint_dir,
            available_now=False,
        )

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    # -- tool surface ------------------------------------------------------

    def serve_line(self, line: str) -> str | None:
        """One JSON-RPC request over the wire protocol, answered
        against the store's current committed state."""
        return self.server.handle_line(line)

    def serve(self, inp, out) -> int:
        """Newline-delimited JSON-RPC loop (stdio in production)."""
        return self.server.serve(inp, out)
