"""Cell-index kernels: numpy ↔ Spark Column parity, roundtrips, rings."""

import numpy as np
import pytest

from ib_tool_spark import cells


def test_morton_roundtrip():
    rng = np.random.RandomState(0)
    for res in (3, 10, 20, 26):
        n = 1 << res
        ix = rng.randint(0, n, 500)
        iy = rng.randint(0, n, 500)
        c = cells.encode_colrow(ix, iy, res)
        jx, jy, jr = cells.decode_colrow(c)
        assert (jx == ix).all() and (jy == iy).all() and (jr == res).all()
        assert (c >= 0).all()  # int64-positive invariant


def test_encode_clips_to_grid():
    c = cells.encode([-5.0, 1e9], [-5.0, 1e9], 8)
    ix, iy, _ = cells.decode_colrow(c)
    assert ix[0] == 0 and iy[0] == 0
    assert ix[1] == 255 and iy[1] == 255


def test_parent_contains_child():
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 131072, 300)
    y = rng.uniform(0, 131072, 300)
    child = cells.encode(x, y, 12)
    par = cells.parent(child, 5)
    direct = cells.encode(x, y, 5)
    assert (par == direct).all()


def test_cell_bbox_contains_point():
    rng = np.random.RandomState(2)
    x = rng.uniform(0, 131072, 200)
    y = rng.uniform(0, 131072, 200)
    c = cells.encode(x, y, 9)
    minx, miny, maxx, maxy = cells.cell_bbox(c)
    assert ((x >= minx) & (x < maxx) & (y >= miny) & (y < maxy)).all()


def test_k_ring_square():
    c = cells.encode([60000.0], [60000.0], 10)[0]
    ring = cells.k_ring(c, 2)
    assert ring.shape[0] == 25
    assert c in ring
    # clipped at the grid corner
    corner = cells.encode([0.0], [0.0], 10)[0]
    assert cells.k_ring(corner, 1).shape[0] == 4


def test_hex_roundtrip_and_center():
    rng = np.random.RandomState(3)
    x = rng.uniform(1000, 100000, 500)
    y = rng.uniform(1000, 100000, 500)
    c = cells.hex_encode(x, y, 8)
    hx, hy = cells.hex_center(c)
    size = cells.DEFAULT_GRID.cell_size(8)
    # every point lies within the hex circumradius of its cell center
    assert (np.hypot(x - hx, y - hy) <= size * 1.0001).all()
    # re-encoding the center gives the same cell
    assert (cells.hex_encode(hx, hy, 8) == c).all()


def test_hex_k_ring_count():
    c = cells.hex_encode([50000.0], [50000.0], 8)[0]
    for k in (1, 2, 3):
        assert cells.hex_k_ring(c, k).shape[0] == 1 + 3 * k * (k + 1)


def test_spark_column_matches_numpy(spark):
    """The JVM Morton encode is bit-identical to the numpy kernel."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.RandomState(4)
    pdf = pd.DataFrame(
        {"x": rng.uniform(-10, 140000, 2000), "y": rng.uniform(-10, 140000, 2000)}
    )
    df = spark.createDataFrame(pdf)
    for res in (6, 10, 14):
        got = (
            df.select(cells.encode_col(F.col("x"), F.col("y"), res).alias("cell"))
            .toPandas()["cell"]
            .to_numpy()
        )
        want = cells.encode(pdf["x"].to_numpy(), pdf["y"].to_numpy(), res)
        assert (got == want).all()
    # parent_col matches numpy parent
    got = (
        df.select(
            cells.parent_col(cells.encode_col(F.col("x"), F.col("y"), 14), 14, 6).alias("t")
        )
        .toPandas()["t"]
        .to_numpy()
    )
    want = cells.parent(cells.encode(pdf["x"].to_numpy(), pdf["y"].to_numpy(), 14), 6)
    assert (got == want).all()
