"""Checkpoint/resume semantics + skew tooling."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from ib_tool_spark import checkpoint, ops, skew, synth


@pytest.fixture()
def ck_root(tmp_path):
    return str(tmp_path / "ck")


def test_checkpoint_resume_exact(spark, ck_root):
    out1, ck1 = checkpoint.flagship_checkpointed(spark, ck_root, n_images=400)
    rows1 = sorted(tuple(r) for r in out1.select("image_id", "sid").collect())
    assert all(e["action"] == "compute" for e in ck1.events)

    # rerun: every stage resumes from its snapshot, identical output
    out2, ck2 = checkpoint.flagship_checkpointed(spark, ck_root, n_images=400)
    rows2 = sorted(tuple(r) for r in out2.select("image_id", "sid").collect())
    assert rows1 == rows2
    assert all(e["action"] == "resume" for e in ck2.events)

    # kill after stage 2: stages 1-2 resume, 3-4 recompute
    for name in ("s3_pip", "s4_tiles"):
        shutil.rmtree(os.path.join(ck_root, name), ignore_errors=True)
        os.remove(os.path.join(ck_root, f"{name}.manifest.json"))
    out3, ck3 = checkpoint.flagship_checkpointed(spark, ck_root, n_images=400)
    rows3 = sorted(tuple(r) for r in out3.select("image_id", "sid").collect())
    assert rows1 == rows3
    actions = {e["stage"]: e["action"] for e in ck3.events}
    assert actions == {
        "s1_images": "resume",
        "s2_points_cells": "resume",
        "s3_pip": "compute",
        "s4_tiles": "compute",
    }

    # parameter change invalidates downstream stage via fingerprint
    out4, ck4 = checkpoint.flagship_checkpointed(spark, ck_root, n_images=400, tile_res=5)
    actions4 = {e["stage"]: e["action"] for e in ck4.events}
    assert actions4["s4_tiles"] == "compute"
    assert actions4["s3_pip"] == "resume"


def test_manifest_metrics(spark, ck_root):
    _out, ck = checkpoint.flagship_checkpointed(spark, ck_root, n_images=300)
    with open(os.path.join(ck_root, "s2_points_cells.manifest.json")) as f:
        man = json.load(f)
    assert man["rows_total"] == 300
    assert man["bytes_total"] > 0
    assert man["n_files"] >= 1
    assert sum(fi["rows"] for fi in man["files"]) == 300
    assert man["wall_s"] > 0


@pytest.fixture(scope="module")
def skewed_points(spark):
    import pandas as pd

    ids = [f"img_{i:012d}" for i in range(4000)]
    df = spark.createDataFrame(pd.DataFrame({"image_id": ids}))
    return ops.with_cell(ops.with_geocode(df), 7).cache()


def test_scene_is_skewed(skewed_points):
    stats = skew.skew_stats(skewed_points, "cell")
    # Zipf cluster weights → densest cell far above the median
    assert stats["max"] > 10 * stats["median"], stats


def test_salted_agg_matches_plain(skewed_points):
    plain = {
        r.cell: (r.n, r.mx)
        for r in skewed_points.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.max("x").alias("mx"))
        .collect()
    }
    salted = {
        r.cell: (r.n, r.mx)
        for r in skew.salted_agg(
            skewed_points,
            "cell",
            "image_id",
            [(F.count(F.lit(1)), F.sum, "n"), (F.max("x"), F.max, "mx")],
            max_rows=50,
        ).collect()
    }
    assert plain == salted


def test_with_salt_spreads_hot_keys(skewed_points):
    hist = skew.key_histogram(skewed_points, "cell")
    salts = skew.plan_salts(hist, "cell", 50)
    assert salts, "expected at least one hot cell at max_rows=50"
    hot = max(salts, key=salts.get)
    df = skew.with_salt(skewed_points, "cell", salts, "image_id")
    spread = (
        df.filter(F.col("cell") == hot)
        .groupBy("salt")
        .count()
        .toPandas()
    )
    assert len(spread) == salts[hot]
    assert spread["count"].max() < 4 * spread["count"].min()
