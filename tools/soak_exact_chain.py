"""Scale soak of the exact delineation chain (VERDICT r3 next#10,
r4 next#6: kill/resume at scale).

Runs ``delineate.full_delineation_exact`` — the full reference stage
order (Blocker → MST → Rect_Merge → AddSinglBdg → EdgeCatch → dissolve
→ GapClose → PatchRemove) with roads AND blocks riding the cogrouped
DataFrame paths — at a multiple of the driver-gate scale (gate:
per_cluster=20), with a wall-time pin, and reports skew_stats of the
grouped-kernel input sizes, proving the locality model holds when
groups stop being toy-sized.

Usage:
  python tools/soak_exact_chain.py [per_cluster]          plain soak
  python tools/soak_exact_chain.py [per_cluster] --resume-check
      full kill/resume drill: (1) run with a DURABLE StageCheckpoint
      and hard-kill the driver (os._exit) right after the EdgeCatch
      stage snapshot lands, (2) rerun against the same checkpoint dir —
      it must RESUME (not recompute) every pre-kill stage, (3) run
      fresh with no checkpoint, (4) assert the resumed and fresh
      outputs are BYTE-identical (float64 bit patterns via float.hex).
      Exits non-zero on any mismatch.

Internal child flags (used by the orchestrator): --ckpt DIR,
--kill-after STAGE.

Env:   SOAK_CORES=16  SOAK_MAX_SEC=600

Prints ONE JSON line; exits non-zero if the wall-time pin is exceeded.
The measured timing is recorded in BENCH/BASELINE.md (Job D).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KILL_EXIT = 17
KILL_STAGE = "fde_pieces"  # the post-EdgeCatch snapshot


def output_digest(out_df) -> tuple[int, str]:
    """Order-insensitive BYTE digest of the chain output: rows sorted,
    floats rendered as exact IEEE bit patterns (float.hex) — equal
    digest ⇔ bit-identical result sets."""
    rows = sorted(
        (int(r["boundary_id"]), int(r["n_parts"]), int(r["n_buildings"]), float(r["area"]).hex())
        for r in out_df.collect()
    )
    h = hashlib.sha256(repr(rows).encode()).hexdigest()
    return len(rows), h


def run_chain(per_cluster: int, cores: int, ckpt_dir: str | None, kill_after: str | None) -> dict:
    from ib_tool_spark import delineate, pipeline
    from ib_tool_spark.checkpoint import StageCheckpoint

    spark = pipeline.get_spark(
        app="soak_exact_chain", cores=cores, shuffle_partitions=2 * cores
    )

    ck = None
    if ckpt_dir is not None:
        ck = StageCheckpoint(spark, ckpt_dir)
        if kill_after is not None:
            orig_stage = ck.stage

            def stage_and_maybe_kill(name, fingerprint, compute, partition_by=None):
                df = orig_stage(name, fingerprint, compute, partition_by)
                if name == kill_after and ck.events[-1]["action"] == "compute":
                    # snapshot + manifest are durable on disk; die like
                    # a real driver crash — no cleanup, no spark.stop()
                    print(json.dumps({"killed_after": name}), flush=True)
                    os._exit(KILL_EXIT)
                return df

            ck.stage = stage_and_maybe_kill

    def steal():
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return sum(v), v[7] if len(v) > 7 else 0

    t_ticks0, s0 = steal()
    stats: dict = {}
    t0 = time.perf_counter()
    out = delineate.full_delineation_exact(
        spark, per_cluster=per_cluster, stats_out=stats, ckpt=ck
    )
    n_boundaries, digest = output_digest(out)
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
        "digest": digest,
    }
    if ck is not None:
        res["ckpt_events"] = ck.events
    spark.stop()
    return res


def resume_check(per_cluster: int, cores: int, max_sec: float) -> int:
    """Kill/resume drill (see module docstring)."""
    import shutil
    import tempfile

    ckpt_dir = tempfile.mkdtemp(prefix="soak_ckpt_")
    me = os.path.abspath(__file__)
    env = dict(os.environ, SOAK_CORES=str(cores))
    try:
        # 1. run until EdgeCatch's snapshot lands, then hard-kill
        p = subprocess.run(
            [sys.executable, me, str(per_cluster), "--ckpt", ckpt_dir,
             "--kill-after", KILL_STAGE],
            env=env, capture_output=True, text=True, timeout=2 * max_sec,
        )
        if p.returncode != KILL_EXIT:
            print(json.dumps({"resume_check": "FAIL",
                              "reason": f"kill run exited {p.returncode}",
                              "tail": p.stdout[-500:] + p.stderr[-500:]}))
            return 1
        # 2. resume against the same checkpoint dir
        p2 = subprocess.run(
            [sys.executable, me, str(per_cluster), "--ckpt", ckpt_dir],
            env=env, capture_output=True, text=True, timeout=2 * max_sec,
        )
        resumed = json.loads(p2.stdout.strip().splitlines()[-1])
        # every stage up to and including the kill point must RESUME
        pre_kill = [e for e in resumed["ckpt_events"]]
        names = [e["stage"] for e in pre_kill]
        upto = names.index(KILL_STAGE) + 1
        not_resumed = [e for e in pre_kill[:upto] if e["action"] != "resume"]
        # 3. fresh run, no checkpoint
        p3 = subprocess.run(
            [sys.executable, me, str(per_cluster)],
            env=env, capture_output=True, text=True, timeout=2 * max_sec,
        )
        fresh = json.loads(p3.stdout.strip().splitlines()[-1])
        # 4. byte-identity
        identical = resumed["digest"] == fresh["digest"]
        verdict = {
            "resume_check": "OK" if (identical and not not_resumed) else "FAIL",
            "per_cluster": per_cluster,
            "killed_after": KILL_STAGE,
            "stages_resumed_after_kill": [e["stage"] for e in pre_kill[:upto] if e["action"] == "resume"],
            "stages_wrongly_recomputed": [e["stage"] for e in not_resumed],
            "digest_resumed": resumed["digest"],
            "digest_fresh": fresh["digest"],
            "byte_identical": identical,
            "boundaries": fresh["boundaries"],
            "wall_sec_fresh": fresh["wall_sec"],
            "wall_sec_resumed": resumed["wall_sec"],
            "skew": fresh["skew"],
            "steal_pct_fresh": fresh["steal_pct"],
        }
        print(json.dumps(verdict))
        if verdict["resume_check"] != "OK":
            return 1
        if fresh["wall_sec"] > max_sec:
            print(f"WALL-TIME PIN EXCEEDED: {fresh['wall_sec']:.0f}s > {max_sec:.0f}s", file=sys.stderr)
            return 1
        return 0
    finally:
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    per_cluster = int(args[0]) if args and not args[0].startswith("--") else 200
    cores = int(os.environ.get("SOAK_CORES", "16"))
    max_sec = float(os.environ.get("SOAK_MAX_SEC", "600"))

    if "--resume-check" in args:
        return resume_check(per_cluster, cores, max_sec)

    ckpt_dir = args[args.index("--ckpt") + 1] if "--ckpt" in args else None
    kill_after = args[args.index("--kill-after") + 1] if "--kill-after" in args else None

    res = run_chain(per_cluster, cores, ckpt_dir, kill_after)
    res["max_sec_pin"] = max_sec
    print(json.dumps(res))
    if res["wall_sec"] > max_sec:
        print(f"WALL-TIME PIN EXCEEDED: {res['wall_sec']:.0f}s > {max_sec:.0f}s", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
