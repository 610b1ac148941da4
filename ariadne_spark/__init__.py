"""ariadne_spark — a PySpark-native spatial-join + tiling engine.

Re-imagines the capabilities of CRJFisher/ariadne (a TypeScript
code-intelligence engine: scope graphs, symbol resolution, call graphs,
incremental re-index) as spatial lineage over tables of image+caption
pairs:

- scope containment   -> hierarchical grid-cell containment + point-in-polygon
- call edges          -> kNN phash links within cell neighborhoods
- call-graph tracing  -> tile-pyramid lineage + orphan detection
- incremental reindex -> incremental re-tiling of changed cells
- persistence/cache   -> snapshot store + per-partition lineage rows

Everything is DataFrame-first: built-in pyspark.sql.functions in the hot
path, Arrow-vectorized pandas UDFs where per-row geometry/pixel work is
unavoidable, and explicit broadcast/sort-merge/salting choices per join.
"""

__version__ = "0.1.0"
