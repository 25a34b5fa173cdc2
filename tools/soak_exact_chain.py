"""Scale soak of the exact delineation chain (VERDICT r3 next#10).

Runs ``delineate.full_delineation_exact`` — the full reference stage
order (Blocker → MST → Rect_Merge → AddSinglBdg → EdgeCatch → dissolve
→ GapClose → PatchRemove) with roads AND blocks riding the cogrouped
DataFrame paths — at ~10× the driver-gate scale (gate: per_cluster=20),
with a wall-time pin, and reports skew_stats of the grouped-kernel
input sizes, proving the round-3 locality model holds when groups stop
being toy-sized.

Usage: python tools/soak_exact_chain.py [per_cluster]    (default 200)
Env:   SOAK_CORES=16  SOAK_MAX_SEC=600

Prints ONE JSON line; exits non-zero if the wall-time pin is exceeded.
The measured timing is recorded in BENCH/BASELINE.md (Job D).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    per_cluster = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cores = int(os.environ.get("SOAK_CORES", "16"))
    max_sec = float(os.environ.get("SOAK_MAX_SEC", "600"))

    from ib_tool_spark import delineate, pipeline

    spark = pipeline.get_spark(
        app="soak_exact_chain", cores=cores, shuffle_partitions=2 * cores
    )

    def steal():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return sum(v), v[7] if len(v) > 7 else 0

    t_ticks0, s0 = steal()
    stats: dict = {}
    t0 = time.perf_counter()
    out = delineate.full_delineation_exact(
        spark, per_cluster=per_cluster, stats_out=stats
    )
    n_boundaries = out.count()
    agg = out.agg(
        {"n_buildings": "sum", "area": "sum", "n_parts": "max"}
    ).collect()[0]
    wall = time.perf_counter() - t0
    t_ticks1, s1 = steal()
    res = {
        "per_cluster": per_cluster,
        "cores": cores,
        "boundaries": n_boundaries,
        "n_buildings_total": int(agg["sum(n_buildings)"]),
        "max_parts_per_boundary": int(agg["max(n_parts)"]),
        "area_total": round(float(agg["sum(area)"]), 1),
        "wall_sec": round(wall, 1),
        "steal_pct": round(100.0 * (s1 - s0) / max(t_ticks1 - t_ticks0, 1), 2),
        "skew": stats,
        "max_sec_pin": max_sec,
    }
    spark.stop()
    print(json.dumps(res))
    if wall > max_sec:
        print(f"WALL-TIME PIN EXCEEDED: {wall:.0f}s > {max_sec:.0f}s", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
