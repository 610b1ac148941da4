"""Aspect-ratio bucketing + deterministic batch assembly for image
training pipelines (the SDXL/NovelAI "aspect bucket" scheme: images are
grouped into a small ladder of target aspect ratios so a batch can be
resized to one shared shape without extreme cropping, then sliced into
fixed-size batches).

Everything is integer column math — no floats, no RNG — so bucket and
batch assignments are bit-identical at any parallelism/cluster size
(the repo's data-derived determinism rule). Bucket choice minimizes the
cross-product distance |w*bh - h*bw| (== |w/h - bw/bh| scaled by
h*bh > 0), which needs no division and no logs; ties break on the
smaller ladder index.

Scale shape: the ladder is tiny (broadcast literal expressions, no
join); batch assembly is one window per bucket ordered by a data-
derived key — a single hash-partition shuffle on `bucket`, the same
cost class as any groupBy. Skewed buckets (most corpora are mostly
landscape 4:3) can be salted upstream by splitting the window key on
`pmod(xxhash64(id), S)` per shard, exactly like q49's pack_sequences
shard scheme.

Reference analog: ariadne sorts captures into per-kind processing
groups before per-group passes (`packages/core/src/index_single_file/
scopes/scopes.ts:148-191` priority sort; here the "priority" is the
geometric fit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (bw, bh) target shapes — the SDXL-style ladder reduced to its aspect
# skeleton. Order matters only for tie-breaks (index ascending).
DEFAULT_LADDER: list[tuple[int, int]] = [
    (1, 1),       # square
    (4, 3), (3, 4),
    (3, 2), (2, 3),
    (16, 9), (9, 16),
    (2, 1), (1, 2),
]


def bucket_expr(
    w: Column, h: Column, ladder: list[tuple[int, int]] | None = None
) -> Column:
    """Index into `ladder` of the best-fitting aspect bucket for (w, h):
    argmin over |w*bh - h*bw|, ties to the lowest index. Pure integer
    column expression (products stay far under 2^63 for any real image
    dims), usable verbatim over any table carrying dims."""
    lad = ladder or DEFAULT_LADDER
    dists = F.array(
        *[F.abs(w * F.lit(bh) - h * F.lit(bw)) for bw, bh in lad]
    )
    # array_position returns the FIRST index (1-based) of the minimum:
    # exactly the lowest-index tie-break
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def aspect_buckets(
    images: DataFrame,
    ladder: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """images(+w, h) -> + (bucket:int, bucket_w:int, bucket_h:int)."""
    lad = ladder or DEFAULT_LADDER
    b = bucket_expr(F.col("w"), F.col("h"), lad)
    bw = F.element_at(F.array(*[F.lit(x) for x, _ in lad]), b + 1)
    bh = F.element_at(F.array(*[F.lit(y) for _, y in lad]), b + 1)
    return images.withColumn("bucket", b).withColumn(
        "bucket_w", bw.cast("int")
    ).withColumn("bucket_h", bh.cast("int"))


def bucket_batches(
    images: DataFrame,
    batch_size: int,
    ladder: list[tuple[int, int]] | None = None,
    id_col: str = "image_id",
    keep_partial: bool = False,
) -> DataFrame:
    """-> (id, w, h, bucket, bucket_w, bucket_h, batch_id, slot):
    deterministic fixed-size batches WITHIN each aspect bucket. Rows
    order by `id_col` inside their bucket (data-derived, so the layout
    is identical at any parallelism); `slot` is the 0-based position in
    the batch; the trailing partial batch per bucket is dropped unless
    `keep_partial` (training loaders want full batches; eval loaders
    want everything). batch_id is globally unique: bucket * 2^40 +
    ordinal (2^40 batches per bucket is beyond any corpus).
    """
    from pyspark.sql.window import Window

    from ..functions.cells import idiv

    assert batch_size > 0
    out = aspect_buckets(images, ladder).withColumn(
        "__rn",
        (
            F.row_number().over(Window.partitionBy("bucket").orderBy(id_col))
            - 1
        ).cast("long"),
    )
    if not keep_partial:
        # the cutoff table is LADDER-sized (one row per bucket), so it
        # broadcasts at any corpus size — never a per-batch-id join
        cut = out.groupBy("bucket").agg(
            (idiv(F.count(F.lit(1)), batch_size) * batch_size).alias(
                "__keep"
            )
        )
        out = out.join(F.broadcast(cut), "bucket").where(
            F.col("__rn") < F.col("__keep")
        ).drop("__keep")
    return (
        out.withColumn(
            "batch_id",
            F.col("bucket").cast("long") * F.lit(1 << 40)
            + idiv(F.col("__rn"), batch_size),
        )
        .withColumn("slot", (F.col("__rn") % batch_size).cast("int"))
        .drop("__rn")
    )
