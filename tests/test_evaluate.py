"""Error-classification cascade on constructed symdiff scenes."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ib_tool_spark import evaluate, geom


def _cells_df(spark, cells):
    pdf = pd.DataFrame(sorted(cells), columns=["gx", "gy"])
    return spark.createDataFrame(pdf, "gx long, gy long")


def test_polygon_cells_center_rule():
    sq = [np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0]])]
    cells = evaluate.polygon_cells(sq, 10.0)
    assert cells == {(x, y) for x in range(10) for y in range(10)}


def test_classify_symdiff_classes(spark):
    # computed = 20x20 block; expert = same block shifted +2 in x,
    # plus a small hole inside expert-only area
    comp = {(x, y) for x in range(0, 20) for y in range(0, 20)}
    expt = {(x, y) for x in range(2, 22) for y in range(0, 20)}
    computed = _cells_df(spark, comp)
    expert = _cells_df(spark, expt)
    # buildings: dense in the POS strip (x in 0..1), none in NEG strip
    rows = []
    bid = 0
    for x in (0, 1):
        for y in range(0, 20, 1):
            rows.append((bid, x * 10.0 + 5.0, y * 10.0 + 5.0, "31001_1000"))
            bid += 1
    buildings = spark.createDataFrame(rows, "bid long, cx double, cy double, fkt string")
    out = evaluate.classify_symdiff(computed, expert, buildings, cell_size=10.0).toPandas()
    assert set(out["sign"]) == {"POS", "NEG"}
    pos = out[out["sign"] == "POS"].iloc[0]
    neg = out[out["sign"] == "NEG"].iloc[0]
    assert pos["n_cells"] == 40 and pos["n_buildings"] == 40
    assert pos["error_class"] == "Resid"  # dense, covered
    assert neg["n_cells"] == 40 and neg["n_buildings"] == 0
    assert neg["error_class"] == "Holes"  # small, building-free, NEG


def test_classify_indcom_priority(spark):
    comp = {(x, y) for x in range(0, 5) for y in range(0, 5)}
    expt = set()
    computed = _cells_df(spark, comp)
    expert = _cells_df(spark, expt)
    rows = [(i, 5.0 + 10 * i, 5.0, "31001_2721") for i in range(4)]
    buildings = spark.createDataFrame(rows, "bid long, cx double, cy double, fkt string")
    out = evaluate.classify_symdiff(computed, expert, buildings, cell_size=10.0).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["error_class"] == "IndCom"  # peels before Resid


def test_classify_symdiff_real_area_coverage(spark):
    # OverlapCalc semantics: with an `area` column, coverage is
    # sum(footprint area)/patch area — 2 buildings of 1500 m2 in a
    # 10,000 m2 patch = 30% >= got(25) => Resid under real area, while
    # the count proxy (2 cells of 100) would give 2% => LowDensBdgGrp
    comp = {(x, y) for x in range(0, 10) for y in range(0, 10)}
    computed = _cells_df(spark, comp)
    expert = _cells_df(spark, set())
    rows = [(0, 15.0, 15.0, "31001_1000", 1500.0), (1, 55.0, 55.0, "31001_1000", 1500.0),
            (2, 75.0, 75.0, "31001_1000", 1500.0), (3, 35.0, 35.0, "31001_1000", 1500.0)]
    buildings = spark.createDataFrame(
        rows, "bid long, cx double, cy double, fkt string, area double"
    )
    out = evaluate.classify_symdiff(computed, expert, buildings, cell_size=10.0).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["coverage_pct"] == pytest.approx(60.0)
    assert out.iloc[0]["error_class"] == "Resid"
    # same scene WITHOUT area: 4 buildings / 100 cells = 4% coverage
    out2 = evaluate.classify_symdiff(
        computed, expert, buildings.drop("area"), cell_size=10.0
    ).toPandas()
    assert out2.iloc[0]["coverage_pct"] == pytest.approx(4.0)
    assert out2.iloc[0]["error_class"] == "LowDensBdgGrp"


def test_identical_boundaries_empty(spark):
    comp = {(x, y) for x in range(0, 8) for y in range(0, 8)}
    computed = _cells_df(spark, comp)
    buildings = spark.createDataFrame([], "bid long, cx double, cy double, fkt string")
    out = evaluate.classify_symdiff(computed, computed, buildings, cell_size=10.0)
    assert out.count() == 0


def test_error_report_shares(spark):
    comp = {(x, y) for x in range(0, 10) for y in range(0, 10)}
    expt = {(x, y) for x in range(5, 15) for y in range(0, 10)}
    computed = _cells_df(spark, comp)
    expert = _cells_df(spark, expt)
    buildings = spark.createDataFrame([], "bid long, cx double, cy double, fkt string")
    cls = evaluate.classify_symdiff(computed, expert, buildings, cell_size=10.0)
    rep = evaluate.error_report(cls).toPandas()
    assert abs(rep["area_share_pct"].sum() - 100.0) < 1e-6
