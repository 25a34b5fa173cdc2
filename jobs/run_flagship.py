"""Production entry point: spark-submit --py-files ib_tool_spark.zip.

  python -m zipfile -c /tmp/ib_tool_spark.zip ib_tool_spark
  spark-submit --master local[32] \\
      --py-files /tmp/ib_tool_spark.zip \\
      jobs/run_flagship.py --n-images 200000 --out /tmp/flagship_out

On a real cluster, swap --master for the cluster manager; everything
else is unchanged (the engine has no driver-local dependencies beyond
the zip).  Writes the tiled PIP-join output partitioned by tile and a
run manifest with per-stage metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-images", type=int, default=200_000)
    p.add_argument("--out", default="/tmp/flagship_out")
    p.add_argument("--cell-res", type=int, default=10)
    p.add_argument("--tile-res", type=int, default=6)
    p.add_argument("--validate", action="store_true", help="run the full decode+invariant contract")
    p.add_argument("--checkpoint-root", default=None, help="enable stage checkpoint/resume")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ib_tool_flagship").getOrCreate()
    try:
        from ib_tool_spark import pipeline  # shipped via --py-files
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from ib_tool_spark import pipeline

        pipeline.ship_engine(spark)

    t0 = time.time()
    if args.checkpoint_root:
        from ib_tool_spark import checkpoint

        df, ck = checkpoint.flagship_checkpointed(
            spark, args.checkpoint_root, args.n_images, args.cell_res, args.tile_res
        )
        events = ck.events
    elif args.validate:
        df = pipeline.flagship_validated(
            spark, args.n_images, cell_res=args.cell_res, tile_res=args.tile_res
        )
        events = []
    else:
        df = pipeline.flagship(
            spark, args.n_images, cell_res=args.cell_res, tile_res=args.tile_res
        )
        events = []

    df.write.mode("overwrite").partitionBy("tile").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    wall = time.time() - t0
    manifest = {
        "n_images": args.n_images,
        "rows_out": n,
        "wall_s": round(wall, 2),
        "images_per_sec": round(args.n_images / wall, 1),
        "stages": events,
    }
    with open(os.path.join(args.out, "_run_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
