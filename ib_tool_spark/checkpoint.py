"""Stage checkpointing with per-partition lineage + exact resume.

Replaces the reference's PartLog work queue + Lock-directory merge
protocol (IB-Tool2.py:2386-2399, 2520-2548): instead of a shared file
mutex, every named stage writes an idempotent parquet snapshot plus a
manifest recording its input fingerprint and per-file row/byte metrics
(read from parquet footers — no data rescan).  A rerun with the same
fingerprint reads the snapshot instead of recomputing, giving exact
cross-run resume; within a run, Spark task retry already handles
worker failure.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"


class StageCheckpoint:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.events: list[dict] = []

    def _paths(self, name: str) -> tuple[str, str]:
        d = os.path.join(self.root, name)
        return d, os.path.join(self.root, f"{name}.{MANIFEST}")

    def stage(
        self,
        name: str,
        fingerprint: str,
        compute,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Return the stage output, recomputing only when needed.

        ``fingerprint`` must capture everything the stage output depends
        on (input fingerprints + parameters); equal fingerprint ⇒ the
        parquet snapshot is authoritative and is read back instead of
        recomputed.
        """
        data_dir, man_path = self._paths(name)
        man = self._read_manifest(man_path)
        if man and man.get("fingerprint") == fingerprint and os.path.exists(
            os.path.join(data_dir, "_SUCCESS")
        ):
            self.events.append({"stage": name, "action": "resume", "rows": man["rows_total"]})
            return self.spark.read.parquet(data_dir)

        t0 = time.time()
        df = compute()
        tmp = data_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        shutil.rmtree(data_dir, ignore_errors=True)
        os.replace(tmp, data_dir)
        wall = time.time() - t0

        files = self._file_metrics(data_dir)
        manifest = {
            "stage": name,
            "fingerprint": fingerprint,
            "rows_total": sum(f["rows"] for f in files),
            "bytes_total": sum(f["bytes"] for f in files),
            "n_files": len(files),
            "wall_s": round(wall, 3),
            "files": files,
        }
        with open(man_path + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(man_path + ".tmp", man_path)
        self.events.append({"stage": name, "action": "compute", "rows": manifest["rows_total"]})
        return self.spark.read.parquet(data_dir)

    @staticmethod
    def _read_manifest(path: str) -> dict | None:
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    @staticmethod
    def _file_metrics(data_dir: str) -> list[dict]:
        """Per-file rows/bytes from parquet footers (metadata-only)."""
        import pyarrow.parquet as pq

        out = []
        for cur, _dirs, names in os.walk(data_dir):
            for n in sorted(names):
                if not n.endswith(".parquet"):
                    continue
                p = os.path.join(cur, n)
                out.append(
                    {
                        "path": os.path.relpath(p, data_dir),
                        "rows": pq.ParquetFile(p).metadata.num_rows,
                        "bytes": os.path.getsize(p),
                    }
                )
        return out


def flagship_checkpointed(
    spark: SparkSession,
    root: str,
    n_images: int = 2000,
    cell_res: int = 10,
    tile_res: int = 6,
) -> tuple[DataFrame, StageCheckpoint]:
    """The flagship pipeline with a checkpoint boundary per stage —
    kill it after any stage and a rerun resumes from the last snapshot
    (tested in tests/test_checkpoint.py)."""
    from pyspark.sql import functions as F

    from . import ops, synth

    scene = synth.default_scene()
    ck = StageCheckpoint(spark, root)

    # Fingerprints chain: every stage embeds its input stage's
    # fingerprint plus a content digest of the scene (seed + polygon
    # rings), so changing the scene or any upstream parameter
    # invalidates every downstream snapshot — never a stale resume.
    scene_fp = f"seed={synth.SCENE_SEED}:polys={ops._polygons_digest(scene.polygons)}"

    fp1 = f"synth:n={n_images}:{scene_fp}"
    images = ck.stage(
        "s1_images",
        fp1,
        lambda: synth.synth_images_df(spark, n_images),
    )
    fp2 = f"geocode+cell:res={cell_res}:in=[{fp1}]"
    points = ck.stage(
        "s2_points_cells",
        fp2,
        lambda: ops.with_cell(ops.with_geocode(images.select("image_id"), scene), cell_res),
    )
    fp3 = f"pip:res={cell_res}:{scene_fp}:in=[{fp2}]"
    joined = ck.stage(
        "s3_pip",
        fp3,
        lambda: ops.pip_join(points, scene.polygons, cell_res),
    )
    tiled = ck.stage(
        "s4_tiles",
        f"tile:res={tile_res}:in=[{fp3}]",
        lambda: ops.tile_assign(joined, cell_res, tile_res).select(
            "image_id", "x", "y", "cell", "tile", "sid"
        ),
        partition_by=None,
    )
    return tiled, ck
