#!/usr/bin/env python3
"""spark-submit entry: run the flagship spatial pipeline, print timings.

Usage (the north rule's deployment shape — `spark-submit --py-files`):

    spark-submit --master local[8] --py-files /tmp/ariadne_spark.zip \
        jobs/pipeline_bench.py --images /path/images.parquet

The master (N vs 4N executors) comes from spark-submit; this script
only declares the plan. Prints ONE JSON line with per-stage seconds.
`bench_scaling.py` invokes it at two parallelism levels on the SAME
input and computes scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--max-z", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("ariadne_pipeline_bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    # shuffle partitions sized to parallelism (what you'd set per cluster)
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))

    from ariadne_spark.functions.phash import phash_udf
    from ariadne_spark.operators.knn import knn_edges
    from ariadne_spark.operators.pip import pip_join
    from ariadne_spark.operators.tiles import build_pyramid, rasterize_tiles
    from ariadne_spark.synth.regions import generate_regions

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    images = spark.read.parquet(args.images)
    n_images = images.count()  # also warms the JVM + file listing
    meta = images.drop("bytes")

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    bad = (
        images.select(
            "phash", phash_udf(F.col("bytes"), F.col("fmt")).alias("re")
        )
        .where(F.col("phash") != F.col("re"))
        .count()
    )
    timings["decode_phash"] = time.perf_counter() - t0
    assert bad == 0

    t0 = time.perf_counter()
    noop(pip_join(meta, generate_regions(), deepest_only=True))
    timings["pip_join"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    noop(knn_edges(meta, k=5, max_hamming=16))
    timings["knn"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    noop(build_pyramid(meta, max_z=args.max_z))
    timings["tile_pyramid"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    noop(rasterize_tiles(meta, z=5, fmt="png"))
    timings["rasterize"] = time.perf_counter() - t0

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "cores": cores,
                "n_images": n_images,
                "stages": {k: round(v, 3) for k, v in timings.items()},
                "total_sec": round(total, 3),
                "images_per_sec": round(n_images / total, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
