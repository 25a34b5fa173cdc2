"""Scaling-efficiency evidence: same flagship job, same input, at
local[8] (N) and local[32] (4N) — the sandbox stand-in for the
north_rule's "N → 4N executors, efficiency ≥ 0.8" criterion.

Each parallelism level runs in its own subprocess (fresh JVM) via
bench.py with BENCH_FLAGSHIP_ONLY=1.  The payload is sized large
enough (default 2M images) that fixed job overheads don't mask the
throughput ratio.  Writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_images]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_bench(cpus: int, n_images: int, runs: int = 2) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_N_IMAGES=str(n_images),
        BENCH_FLAGSHIP_ONLY="1",
        BENCH_RUNS=str(runs),
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    # materialize the shared input once at full parallelism
    from ib_tool_spark import pipeline, synth

    spark = pipeline.get_spark(app="synth_prep", cores=32)
    synth.ensure_images_table(spark, n_images)
    spark.stop()

    r8 = run_bench(8, n_images)
    r32 = run_bench(32, n_images)
    thr8 = r8["value"]
    thr32 = r32["value"]
    eff = (thr32 / thr8) / 4.0

    full = None
    full_path = "/tmp/bench_sf01_c32.json"
    if os.path.exists(full_path):
        with open(full_path) as f:
            full = json.load(f)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured throughput + scaling evidence",
        "",
        "Flagship body: geocode → quadkey cell encode → PIP join vs 48",
        "settlement polygons → tile assign, over the deterministic",
        f"synthetic image table ({n_images:,} rows), parquet input,",
        "timings are medians of repeated runs after a warm-up run.",
        "",
        "## Scaling: same job, same input, N vs 4N cores (local[8] vs local[32])",
        "",
        "| cores | images/sec | sec/run |",
        "|---|---|---|",
        f"| 8 (N) | {thr8:,.0f} | {r8['queries']['flagship_pip_tile']:.2f} |",
        f"| 32 (4N) | {thr32:,.0f} | {r32['queries']['flagship_pip_tile']:.2f} |",
        "",
        f"**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}**"
        + ("  — meets the ≥ 0.8 criterion." if eff >= 0.8 else "  — below 0.8, see notes."),
        "",
        "Why this scales: the image side of the PIP join never shuffles",
        "(broadcast cover + map-side refine); cell/tile derivation is",
        "whole-stage-codegen column math; the only aggregation shuffles",
        "one row per occupied cell, not per image.",
        "",
    ]
    if full:
        lines += [
            f"## Full query suite @ sf{full['sf']}, {full['cpus']} cores",
            "",
            f"North-star: **{full['value']:,.0f} images/sec** through the flagship",
            f"({full['n_images']:,} images).",
            "",
            "| query | seconds |",
            "|---|---|",
        ]
        for k, v in full["queries"].items():
            lines.append(f"| {k} | {v:.3f} |")
        lines.append("")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"thr8": thr8, "thr32": thr32, "efficiency": round(eff, 4), "n_images": n_images}))


if __name__ == "__main__":
    main()
