"""Durable cross-run resume of the full exact delineation chain.

The north rule requires every stage to checkpoint per-partition
lineage + metrics for EXACT resume.  full_delineation_exact(ckpt=...)
snapshots each stage boundary through checkpoint.StageCheckpoint; a
second run with the same parameters must resume every stage from its
parquet snapshot (no recompute) and produce bit-identical output.
"""

import pandas as pd

from ib_tool_spark import delineate
from ib_tool_spark.checkpoint import StageCheckpoint


def _norm(df):
    p = df.toPandas().sort_values("boundary_id").reset_index(drop=True)
    p["area"] = p["area"].round(6)
    return p


def test_full_chain_durable_resume(spark, tmp_path):
    root = str(tmp_path / "fde_ckpt")
    ck1 = StageCheckpoint(spark, root)
    out1 = _norm(
        delineate.full_delineation_exact(spark, per_cluster=8, ckpt=ck1)
    )
    assert len(out1) > 0
    computed = [e for e in ck1.events if e["action"] != "resume"]
    assert len(computed) >= 6  # every stage boundary snapshotted

    # second run, same params: every stage resumes from its snapshot
    ck2 = StageCheckpoint(spark, root)
    out2 = _norm(
        delineate.full_delineation_exact(spark, per_cluster=8, ckpt=ck2)
    )
    assert ck2.events, "no stage events recorded"
    assert all(e["action"] == "resume" for e in ck2.events), ck2.events
    pd.testing.assert_frame_equal(out1, out2)

    # changed parameters invalidate the fingerprint → stages recompute
    ck3 = StageCheckpoint(spark, root)
    out3 = delineate.full_delineation_exact(
        spark, per_cluster=8, min_bdg_count=4, ckpt=ck3
    )
    out3.count()
    assert any(e["action"] != "resume" for e in ck3.events)
