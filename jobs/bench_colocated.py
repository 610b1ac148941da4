"""Micro-bench: co-located (bucketed) vs shuffling fact-fact join.

Synthesizes a deterministic images (n) x edges (4n) pair keyed by
image_id, writes both sides twice — plain parquet and bucketed+sorted
(sources/bucketed.py) — and times the same join+agg over each layout,
interleaved best-of-k to ride out this box's documented host-noise
windows (see BENCH.md "Cross-run variance"). The aggregate consumes
every joined row, so the measured delta is scan + join strategy only:
the bucketed plan is SortMergeJoin with zero Exchange and zero Sort;
the plain plan shuffles both sides.

Usage: python jobs/bench_colocated.py [--n-images 5000000] [--cores 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# see bench.py: pin BLAS pools before any worker forks
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import functions as F

from ariadne_spark.session import get_spark
from ariadne_spark.sources.bucketed import colocated_join, write_bucketed

N_BUCKETS = 64


def synth(spark, n_images: int):
    """Deterministic key-mixed tables; edge fanout 4 per image."""
    mix = lambda c: F.xxhash64(c.cast("long"))  # noqa: E731
    images = spark.range(n_images).select(
        F.col("id").alias("image_id"),
        (mix(F.col("id")) % 4096).alias("cell"),
        mix(F.col("id") + 1).alias("phash"),
    )
    edges = spark.range(4 * n_images).select(
        (F.col("id") % n_images).alias("image_id"),
        (mix(F.col("id")) % n_images).alias("dst"),
        (mix(F.col("id") + 2) % 64).alias("dist"),
    )
    return images, edges


def consume(df) -> tuple:
    row = df.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("dist") * (F.col("cell") + 1)).alias("chk"),
    ).collect()[0]
    return tuple(row)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=5_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(
        cores=args.cores,
        app_name="bench_colocated",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    d = tempfile.mkdtemp(prefix="bench_colocated_")
    try:
        images, edges = synth(spark, args.n_images)
        images.write.mode("overwrite").parquet(f"{d}/images_plain")
        edges.write.mode("overwrite").parquet(f"{d}/edges_plain")
        write_bucketed(images, "bc_images", f"{d}/images_b", N_BUCKETS, "image_id")
        write_bucketed(edges, "bc_edges", f"{d}/edges_b", N_BUCKETS, "image_id")

        def plain():
            i = spark.read.parquet(f"{d}/images_plain")
            e = spark.read.parquet(f"{d}/edges_plain")
            return consume(i.hint("merge").join(e, "image_id"))

        def colocated():
            return consume(colocated_join(spark, "bc_images", "bc_edges", "image_id"))

        results = {"plain": [], "colocated": []}
        checks = set()
        for _ in range(args.trials):  # interleaved: same noise window
            for name, fn in (("plain", plain), ("colocated", colocated)):
                t0 = time.monotonic()
                checks.add(fn())
                results[name].append(round(time.monotonic() - t0, 3))
        assert len(checks) == 1, f"layouts disagree: {checks}"
        best_p, best_c = min(results["plain"]), min(results["colocated"])
        print(
            json.dumps(
                {
                    "metric": "colocated_join_speedup",
                    "value": round(best_p / best_c, 3),
                    "unit": "x",
                    "n_images": args.n_images,
                    "n_edges": 4 * args.n_images,
                    "cores": args.cores,
                    "plain_s": results["plain"],
                    "colocated_s": results["colocated"],
                    "best_plain_s": best_p,
                    "best_colocated_s": best_c,
                    "joined_rows": list(checks)[0][0],
                }
            )
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS bc_images")
        spark.sql("DROP TABLE IF EXISTS bc_edges")
        spark.stop()
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
