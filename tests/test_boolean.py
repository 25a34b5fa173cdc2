"""Exact polygon boolean kernel (Martinez–Rueda) + overlay operators.

Oracles: closed-form interval arithmetic for axis-aligned boxes, area
identities for rotated pairs, and a pointwise even-odd membership
crosscheck (the strongest oracle — any region error shows up as a
misclassified sample point).
"""

import numpy as np
import pytest

from ib_tool_spark import geom, ops
from ib_tool_spark.boolean import polygon_boolean


def area(rings):
    return geom.polygon_area(rings) if rings else 0.0


def sq(cx, cy, w, h, ang=0.0):
    return geom.rect_ring(cx, cy, w, h, ang)


def test_boolean_basic_ops():
    A, B = [sq(0, 0, 10, 10)], [sq(4, 0, 10, 10)]
    assert area(polygon_boolean(A, B, "and")) == pytest.approx(60.0)
    assert area(polygon_boolean(A, B, "or")) == pytest.approx(140.0)
    assert area(polygon_boolean(A, B, "not")) == pytest.approx(40.0)
    assert area(polygon_boolean(A, B, "xor")) == pytest.approx(80.0)


def test_boolean_degenerate_shared_geometry():
    A = [sq(0, 0, 10, 10)]
    # identical polygons
    assert area(polygon_boolean(A, A, "and")) == pytest.approx(100.0)
    assert area(polygon_boolean(A, A, "xor")) == pytest.approx(0.0)
    assert area(polygon_boolean(A, A, "not")) == pytest.approx(0.0)
    # adjacent squares sharing a full edge
    B = [sq(10, 0, 10, 10)]
    assert area(polygon_boolean(A, B, "and")) == pytest.approx(0.0)
    assert area(polygon_boolean(A, B, "or")) == pytest.approx(200.0)
    # contained square
    C = [sq(0, 0, 4, 4)]
    assert area(polygon_boolean(A, C, "not")) == pytest.approx(84.0)
    assert area(polygon_boolean(A, C, "xor")) == pytest.approx(84.0)


def test_boolean_concave_and_holes():
    L = [np.array([[0.0, 0.0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], dtype=float)]
    R = [sq(5, 5, 10, 10)]
    assert area(polygon_boolean(L, R, "and")) == pytest.approx(64.0)
    H = [sq(10, 10, 20, 20), sq(10, 10, 4, 4)]  # square with hole
    knife = [sq(10, 10, 40, 2)]
    assert area(polygon_boolean(H, knife, "and")) == pytest.approx(32.0)


def test_boolean_rect_property_closed_form():
    rng = np.random.default_rng(42)
    for _ in range(150):
        x1, y1 = rng.uniform(-50, 50, 2)
        w1, h1 = rng.uniform(1, 40, 2)
        x2, y2 = rng.uniform(-50, 50, 2)
        w2, h2 = rng.uniform(1, 40, 2)
        A, B = [sq(x1, y1, w1, h1)], [sq(x2, y2, w2, h2)]
        ox = max(0.0, min(x1 + w1 / 2, x2 + w2 / 2) - max(x1 - w1 / 2, x2 - w2 / 2))
        oy = max(0.0, min(y1 + h1 / 2, y2 + h2 / 2) - max(y1 - h1 / 2, y2 - h2 / 2))
        i = ox * oy
        aA, aB = w1 * h1, w2 * h2
        assert area(polygon_boolean(A, B, "and")) == pytest.approx(i, abs=1e-6)
        assert area(polygon_boolean(A, B, "not")) == pytest.approx(aA - i, abs=1e-6)
        assert area(polygon_boolean(A, B, "or")) == pytest.approx(aA + aB - i, abs=1e-6)
        assert area(polygon_boolean(A, B, "xor")) == pytest.approx(aA + aB - 2 * i, abs=1e-6)


def test_boolean_rotated_identities():
    rng = np.random.default_rng(3)
    for _ in range(60):
        A = [sq(*rng.uniform(-30, 30, 2), *rng.uniform(5, 30, 2), rng.uniform(0, 3.14))]
        B = [sq(*rng.uniform(-30, 30, 2), *rng.uniform(5, 30, 2), rng.uniform(0, 3.14))]
        aA, aB = area(A), area(B)
        i = area(polygon_boolean(A, B, "and"))
        assert area(polygon_boolean(A, B, "or")) == pytest.approx(aA + aB - i, abs=1e-5)
        assert area(polygon_boolean(A, B, "not")) == pytest.approx(aA - i, abs=1e-5)
        assert area(polygon_boolean(B, A, "not")) == pytest.approx(aB - i, abs=1e-5)
        assert area(polygon_boolean(A, B, "xor")) == pytest.approx(aA + aB - 2 * i, abs=1e-5)


def _rand_shape(rng):
    kind = rng.integers(0, 3)
    if kind == 0:  # L-shape (concave)
        x0, y0 = rng.uniform(-30, 10, 2)
        w, h = rng.uniform(10, 30, 2)
        t = rng.uniform(3, 8)
        return [
            np.array(
                [[x0, y0], [x0 + w, y0], [x0 + w, y0 + t], [x0 + t, y0 + t], [x0 + t, y0 + h], [x0, y0 + h]]
            )
        ]
    if kind == 1:  # rect with hole
        cx, cy = rng.uniform(-20, 20, 2)
        w, h = rng.uniform(12, 30, 2)
        return [sq(cx, cy, w, h), sq(cx, cy, w * 0.3, h * 0.3)]
    return [sq(*rng.uniform(-25, 25, 2), *rng.uniform(5, 30, 2), rng.uniform(0, 3.14))]


def test_boolean_pointwise_membership_oracle():
    rng = np.random.default_rng(7)
    for _ in range(40):
        A, B = _rand_shape(rng), _rand_shape(rng)
        px = rng.uniform(-45, 45, 300)
        py = rng.uniform(-45, 45, 300)
        inA = geom.points_in_polygon(px, py, A)
        inB = geom.points_in_polygon(px, py, B)
        for op, want in (
            ("and", inA & inB),
            ("or", inA | inB),
            ("not", inA & ~inB),
            ("xor", inA ^ inB),
        ):
            out = polygon_boolean(A, B, op)
            got = geom.points_in_polygon(px, py, out) if out else np.zeros_like(inA)
            assert (got == want).all(), op


RINGS_T = "id long, rings array<array<array<double>>>"


def _poly_df(spark, rows):
    return spark.createDataFrame(
        [(i, [r.tolist() for r in rings]) for i, rings in rows], RINGS_T
    )


def test_overlay_operators_df(spark):
    left = _poly_df(
        spark, [(0, [sq(0, 0, 10, 10)]), (1, [sq(100, 0, 10, 10)]), (2, [sq(300, 0, 10, 10)])]
    )
    right = _poly_df(
        spark, [(10, [sq(4, 0, 10, 10)]), (11, [sq(102, 2, 4, 4)]), (12, [sq(104, -2, 4, 4)])]
    )
    inter = sorted(
        (r.lid, r.rid, round(r.area, 6))
        for r in ops.overlay_intersect_join(left, right, cell=64.0).collect()
    )
    assert inter == [(0, 10, 60.0), (1, 11, 16.0), (1, 12, 12.0)]
    er = sorted(
        (r.lid, round(r.area, 6)) for r in ops.overlay_erase(left, right, cell=64.0).collect()
    )
    assert er == [(0, 40.0), (1, 72.0), (2, 100.0)]
    sd = sorted(
        (r.side, r.fid, round(r.area, 6))
        for r in ops.overlay_symdiff(left, right, cell=64.0).collect()
    )
    assert sd == [
        ("LEFT", 0, 40.0),
        ("LEFT", 1, 72.0),
        ("LEFT", 2, 100.0),
        ("RIGHT", 10, 40.0),
        ("RIGHT", 12, 4.0),
    ]


def test_overlay_erase_area_partition_invariant(spark):
    # erase + intersections partition each left polygon:
    # area(L) == erase_area(L) + Σ pairwise ∩ when rights are disjoint
    rng = np.random.default_rng(11)
    lefts, rights = [], []
    for i in range(12):
        lefts.append((i, [sq(rng.uniform(0, 400), rng.uniform(0, 400), 60, 60, 0.0)]))
    for j in range(16):  # disjoint 100-lattice
        cx = (j % 4) * 120 + 40
        cy = (j // 4) * 120 + 40
        rights.append((100 + j, [sq(cx, cy, 50, 50, 0.0)]))
    ldf, rdf = _poly_df(spark, lefts), _poly_df(spark, rights)
    er = {r.lid: r.area for r in ops.overlay_erase(ldf, rdf, cell=128.0).collect()}
    cut = {}
    for r in ops.overlay_intersect_join(ldf, rdf, cell=128.0).collect():
        cut[r.lid] = cut.get(r.lid, 0.0) + r.area
    for i, rings in lefts:
        assert er[i] + cut.get(i, 0.0) == pytest.approx(area(rings), abs=1e-6)


def test_boolean_integer_lattice_degeneracies():
    # integer-lattice boxes share edges/corners constantly — the
    # adversarial regime for sweep degeneracy handling. Includes the
    # corner-contact union regression (figure-eight contour split).
    A = [np.array([[4, 6], [11, 6], [11, 9], [4, 9]], float)]
    B = [np.array([[3, 9], [4, 9], [4, 14], [3, 14]], float)]
    assert area(polygon_boolean(A, B, "or")) == pytest.approx(26.0)

    rng = np.random.default_rng(99)
    for _ in range(150):
        x1, y1 = rng.integers(0, 12, 2)
        w1, h1 = rng.integers(1, 8, 2)
        x2, y2 = rng.integers(0, 12, 2)
        w2, h2 = rng.integers(1, 8, 2)
        A = [np.array([[x1, y1], [x1 + w1, y1], [x1 + w1, y1 + h1], [x1, y1 + h1]], float)]
        B = [np.array([[x2, y2], [x2 + w2, y2], [x2 + w2, y2 + h2], [x2, y2 + h2]], float)]
        ox = max(0, min(x1 + w1, x2 + w2) - max(x1, x2))
        oy = max(0, min(y1 + h1, y2 + h2) - max(y1, y2))
        i = ox * oy
        aA, aB = w1 * h1, w2 * h2
        assert area(polygon_boolean(A, B, "and")) == pytest.approx(i, abs=1e-9)
        assert area(polygon_boolean(A, B, "not")) == pytest.approx(aA - i, abs=1e-9)
        assert area(polygon_boolean(A, B, "or")) == pytest.approx(aA + aB - i, abs=1e-9)
        assert area(polygon_boolean(A, B, "xor")) == pytest.approx(aA + aB - 2 * i, abs=1e-9)
