#!/usr/bin/env python3
"""Scaling-efficiency evidence: same job, N vs 4N cores, same input.

The north rule requires "throughput scaling efficiency >= 0.8 between N
and 4N executors". This sandbox has one machine, so (per the driver
instructions) parallelism levels stand in for cluster sizes: the SAME
`spark-submit --py-files` job runs at `local[N]` and `local[4N]` against
the SAME parquet input, and

    efficiency = (throughput_4N / throughput_N) / 4

Writes BENCH.md with the full table and prints a JSON summary.

Usage:  python bench_scaling.py [--n-images 60000] [--base-cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/ariadne_bench_cache")


def build_pyfiles_zip() -> str:
    """Package ariadne_spark for --py-files (the deployment artifact)."""
    path = f"{CACHE_DIR}/ariadne_spark.zip"
    os.makedirs(CACHE_DIR, exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "ariadne_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def ensure_images(n: int) -> str:
    from ariadne_spark.session import get_spark
    from ariadne_spark.synth.images import images_df

    # cache key v2: round 4 re-tagged the synth lossy format string to
    # 'fjpg' (blobs/phashes unchanged, but a stale fmt='jpeg' fixture
    # would route FJPG blobs into the REAL jpeg decoder and fail loudly)
    path = f"{CACHE_DIR}/images_v2_{n}.parquet"
    done = f"{CACHE_DIR}/images_v2_{n}.done"
    if not os.path.exists(done):
        spark = get_spark(app_name="ariadne_synth")
        images_df(spark, n).write.mode("overwrite").parquet(path)
        spark.stop()
        with open(done, "w") as fh:
            fh.write("ok")
    return path


def run_at(cores: int, images_path: str, zip_path: str, trials: int = 3) -> dict:
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    cmd = [
        spark_submit,
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "pipeline_bench.py"),
        "--images", images_path,
        "--trials", str(trials),
    ]
    env = dict(os.environ)
    # one BLAS thread per python worker: N workers x default-32-thread
    # OpenBLAS pools oversubscribe the box and invert the scaling curve
    # (local mode: workers inherit the driver process env, so set it here;
    # on a real cluster use spark.executorEnv.*)
    env.update(
        {"OMP_NUM_THREADS": "1", "OPENBLAS_NUM_THREADS": "1", "MKL_NUM_THREADS": "1"}
    )
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"images_per_sec"' in line:
            return json.loads(line)
    raise RuntimeError(
        f"no result line from spark-submit at local[{cores}]:\n"
        f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=300_000)
    ap.add_argument("--base-cores", type=int, default=2)
    ap.add_argument("--append", action="store_true",
                    help="(default when BENCH.md exists) append to BENCH.md")
    ap.add_argument("--overwrite", action="store_true",
                    help="replace BENCH.md instead of appending")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    big_cores = args.base_cores * 4

    sys.path.insert(0, REPO)
    zip_path = build_pyfiles_zip()
    images_path = ensure_images(args.n_images)

    res_n = run_at(args.base_cores, images_path, zip_path, args.trials)
    res_4n = run_at(big_cores, images_path, zip_path, args.trials)

    speedup = res_n["total_sec"] / res_4n["total_sec"]
    eff = speedup / 4
    identical = res_n.get("fingerprints") == res_4n.get("fingerprints")
    summary = {
        "metric": "spatial pipeline scaling efficiency N->4N cores",
        "n_images": args.n_images,
        "N_cores": args.base_cores,
        "4N_cores": big_cores,
        "throughput_N": res_n["images_per_sec"],
        "throughput_4N": res_4n["images_per_sec"],
        "speedup": round(speedup, 3),
        "efficiency": round(eff, 3),
        "results_identical": identical,
        "stages_N": res_n["stages"],
        "stages_4N": res_4n["stages"],
    }
    print(json.dumps(summary))
    assert identical, (
        "N vs 4N result fingerprints differ — cross-cluster-size "
        f"equality violated: {res_n.get('fingerprints')} vs "
        f"{res_4n.get('fingerprints')}"
    )

    header = [
        "# BENCH — scaling-efficiency evidence (N vs 4N parallelism)",
        "",
    ]
    lines = [
        f"## {args.base_cores} -> {big_cores} cores, {args.n_images:,} images",
        "",
        "North rule: \"throughput scaling efficiency >= 0.8 between N and 4N",
        "executors\". No real cluster exists in this sandbox, so (per the",
        "driver instructions) the SAME `spark-submit --py-files` job",
        f"(`jobs/pipeline_bench.py`) ran at `local[{args.base_cores}]` and",
        f"`local[{big_cores}]` against the SAME {args.n_images:,}-row deterministic",
        "images table. Efficiency = (throughput_4N / throughput_N) / 4.",
        "",
        "| cores | total sec | images/sec |",
        "|---|---|---|",
        f"| {args.base_cores} (N) | {res_n['total_sec']} | {res_n['images_per_sec']} |",
        f"| {big_cores} (4N) | {res_4n['total_sec']} | {res_4n['images_per_sec']} |",
        "",
        f"**Speedup {summary['speedup']}x -> scaling efficiency {summary['efficiency']}**",
        "",
        "Result equality across cluster sizes: per-stage order-independent",
        "output fingerprints (rows + content hash of pip/knn/pyramid/"
        "rasterize)",
        f"at N and 4N are **{'IDENTICAL' if identical else 'DIFFERENT'}** — "
        "the exact join-row / tile-assignment",
        "match the north rule requires, not just matching throughput.",
        "",
        "Per-stage seconds:",
        "",
        "| stage | N | 4N | stage speedup |",
        "|---|---|---|---|",
    ]
    for k in res_n["stages"]:
        a, b = res_n["stages"][k], res_4n["stages"][k]
        lines.append(f"| {k} | {a} | {b} | {round(a / b, 2) if b else '-'}x |")
    lines += [
        "",
        "Caveat: single machine — the two runs share memory bandwidth and",
        "JVM overheads, which *understates* multi-node scaling for the",
        "compute-bound stages (decode/phash, PIP ray-cast) and *overstates*",
        "nothing: every shuffle here would also cross the network on a real",
        "cluster. Shuffle plans are chosen explicitly per join cardinality",
        "(broadcast R-tree for PIP; salted shuffled-hash for kNN candidates,",
        "spill-capable per SPARK-32399, sort-merge fallback).",
        "",
    ]
    path = os.path.join(REPO, "BENCH.md")
    # append by DEFAULT when BENCH.md exists: overwriting would destroy
    # the accumulated cross-run evidence (variance tables, A/B
    # sections). A fresh file gets the header; explicit --overwrite
    # replaces (the old no-append behavior, for starting over).
    if os.path.exists(path) and not args.overwrite:
        with open(path, "a") as fh:
            fh.write("\n" + "\n".join(lines))
    else:
        with open(path, "w") as fh:
            fh.write("\n".join(header + lines))


if __name__ == "__main__":
    main()
