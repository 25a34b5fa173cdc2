"""Physical-plan regression pins — the PLANS.md claims as assertions.

These catch silent plan regressions (a lost broadcast, a shuffle
sneaking onto the payload side, Python appearing in the flagship) that
row-level correctness tests cannot see."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from ib_tool_spark import delineate, ops, pipeline, synth


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_plan_shape(spark):
    df = pipeline.flagship(spark, n_images=2000)
    p = plan_text(df)
    # payload scan pruned to image_id only — the bytes column must not
    # be read on the hot path
    assert "image_id" in p
    assert "bytes" not in p.split("ReadSchema")[1].splitlines()[0] if "ReadSchema" in p else True
    # polygon cover / geocode params arrive via broadcast, and the
    # image side never shuffles
    assert p.count("BroadcastHashJoin") >= 3, p
    assert "Exchange hashpartitioning" not in p, "shuffle on the flagship path"
    # zero Python operators: the even-odd refine is Column math
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p


def test_knn_assign_zero_shuffle(spark):
    import pandas as pd

    pts = ops.with_cell(ops.with_geocode(synth.synth_images_df(spark, 500, 4).select("image_id")), 7)
    sample = pts.limit(40).select("x", "y").toPandas()
    centers = pd.DataFrame(
        {"center_id": range(len(sample)), "cx": sample["x"], "cy": sample["y"]}
    )
    out = ops.knn_assign(pts, centers, cutoff=70.0, res=7)
    p = plan_text(out)
    assert "Exchange hashpartitioning" not in p, "knn_assign must stay zero-shuffle"


def test_density_grid_partial_aggregation(spark):
    pts = ops.with_geocode(synth.synth_images_df(spark, 500, 4).select("image_id"))
    out = ops.density_grid(pts, cell_size=150.0, radius=300.0)
    p = plan_text(out)
    # map-side combine before each shuffle: partial + final pairs
    assert "partial_count" in p, p


def _rect_polys(spark, n=5):
    from ib_tool_spark import geom

    rows = [
        (i, [geom.rect_ring(10.0 * i, 0.0, 8.0, 8.0, 0.0).tolist()])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, rings array<array<array<double>>>")


def test_identity_join_canon_after_semijoin(spark):
    """r5 pin: the exact-refine canonical-bytes UDF must run AFTER the
    candidate semi-join (canon bytes computed/shuffled only for
    hash-matched ids, never the full table), and the full-table hash
    pass must be confined to the one-shot candidate checkpoint (no
    re-evaluation per consumer subtree, no inferred-isnotnull UDF
    duplicates)."""
    df = _rect_polys(spark)
    out = ops.identity_join(df, df)
    p = out._jdf.queryExecution().optimizedPlan().toString()
    lines = p.splitlines()
    c_idx = [i for i, ln in enumerate(lines) if "ArrowEvalPython [c(" in ln]
    assert len(c_idx) == 2, p  # one canon eval per side — no duplicates
    for i in c_idx:
        assert any("Join LeftSemi" in ln for ln in lines[i + 1 : i + 4]), (
            "canon UDF not directly above its candidate semi-join:\n" + p
        )
    # hash UDF lives inside the cand localCheckpoint lineage only
    assert "ArrowEvalPython [h(" not in p, p
    assert p.count("Join LeftSemi") == 2, p


def test_overlay_join_family_plan_shape(spark):
    """r5 pin: candidate pairing in the overlay family stays a payload-
    free (gx, gy) cell equi-join — ring payloads attach only after the
    (lid, rid) dedup — and no cartesian/nested-loop join appears."""
    import re

    df = _rect_polys(spark)
    for out in (
        ops.overlay_intersect_join(df, df),
        ops.overlay_erase(df, df),
        ops.overlay_symdiff(df, df),
    ):
        p = out._jdf.queryExecution().optimizedPlan().toString()
        # the cell join's inputs project rings away: id + cell keys only
        assert re.search(r"Project \[id#\d+L AS lid#\d+L, gx#", p), p
        assert re.search(r"Project \[id#\d+L AS rid#\d+L, gx#", p), p
        # narrow (lid, rid) dedup before the payload re-attach
        assert re.search(r"Aggregate \[lid#\d+L, rid#\d+L\]", p), p
        phys = out._jdf.queryExecution().executedPlan().toString()
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in phys, f"{bad} in overlay plan:\n{phys[:2000]}"


def test_gap_close_grouped_kernel_parallelism(spark):
    import numpy as np

    from ib_tool_spark import geom

    b = spark.createDataFrame(
        [(i, [geom.rect_ring(50.0 * i, 0.0, 20.0, 20.0, 0.0).tolist()]) for i in range(6)],
        "id long, rings array<array<array<double>>>",
    )
    blocks = spark.createDataFrame(
        [(0, [geom.rect_ring(25.0, 0.0, 6.0, 20.0, 0.0).tolist()])],
        "block_id long, rings array<array<array<double>>>",
    )
    out = delineate.gap_close_exact(b, blocks, gap_dist=0.0)
    # AQE's formatted explain truncates at isFinalPlan=false — read the
    # full query-execution dump instead
    p = out._jdf.queryExecution().toString()
    # the _spread repartition must survive into the plan: without it AQE
    # coalesces the tiny shuffle and the per-group kernels run serial
    assert "REPARTITION_BY_NUM" in p, p[:2000]
    assert "FlatMapCoGroupsInPandas" in p, p[:2000]


def test_flagship_validated_repartition_policy(spark):
    """r5 pin: decode parallelism comes from the scan — no round-robin
    byte shuffle when the input already fills >= 3/4 of the cores; the
    repartition fallback fires only when the layout can't fill them
    (the r4 threshold of 4x cores made every >=8m split shuffle the
    whole bytes column)."""
    imgs = synth.synth_images_df(spark, 200, 8)  # 8 parts >= 3/4 of 4 cores
    p = plan_text(pipeline.flagship_validated(spark, images=imgs))
    assert "RoundRobinPartitioning" not in p, "byte shuffle on a saturating scan"
    one = synth.synth_images_df(spark, 200, 8).coalesce(1)
    p1 = plan_text(pipeline.flagship_validated(spark, images=one))
    assert "RoundRobinPartitioning" in p1, "fallback must fire when the scan can't fill the cores"
