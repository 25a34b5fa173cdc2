"""union_many (single-arrangement N-way union) vs the Martinez–Rueda
pairwise fold — randomized and adversarial cross-validation.

union_many is the engine's union core (buffer_polygon, close_polygon,
dissolve components); the fold is the independently-validated reference
implementation (boolean.py, itself checked against closed-form box
arithmetic and pointwise membership)."""

from __future__ import annotations

import numpy as np
import pytest

from ib_tool_spark import geom
from ib_tool_spark.boolean import polygon_boolean


def fold_union(pieces):
    ps = list(pieces)
    while len(ps) > 1:
        nxt = [
            polygon_boolean(ps[i], ps[i + 1], "or") for i in range(0, len(ps) - 1, 2)
        ]
        if len(ps) % 2:
            nxt.append(ps[-1])
        ps = nxt
    return ps[0]


def assert_same_region(a, b, lo=-10.0, hi=80.0, n=80, tol_pts=2):
    gx, gy = np.meshgrid(np.linspace(lo, hi, n), np.linspace(lo, hi, n))
    pa = geom.points_in_polygon(gx.ravel(), gy.ravel(), a)
    pb = geom.points_in_polygon(gx.ravel(), gy.ravel(), b)
    diff = int((pa != pb).sum())
    assert diff <= tol_pts, f"{diff} membership mismatches"
    aa, ab = geom.polygon_area(a), geom.polygon_area(b)
    assert ab == pytest.approx(aa, rel=1e-6, abs=1e-6)


def test_random_convex_pieces():
    rng = np.random.default_rng(11)
    for _trial in range(15):
        pieces = []
        for _ in range(int(rng.integers(2, 12))):
            cx, cy = rng.uniform(0, 60, 2)
            r = rng.uniform(3, 12)
            na = int(rng.integers(5, 12))
            a = np.linspace(0, 2 * np.pi, na, endpoint=False) + rng.uniform(0, 1)
            pieces.append(
                [np.stack([cx + r * np.cos(a), cy + r * np.sin(a)], axis=1)]
            )
        assert_same_region(fold_union(pieces), geom.union_many(pieces))


def test_axis_aligned_grid_shared_edges():
    # exactly-shared edges between tiles: coincident-edge cancellation
    pieces = [
        [np.array([[x, y], [x + 10.0, y], [x + 10.0, y + 10.0], [x, y + 10.0]])]
        for x in (0.0, 10.0, 20.0)
        for y in (0.0, 10.0)
    ]
    u = geom.union_many(pieces)
    assert geom.polygon_area(u) == pytest.approx(600.0)
    assert len(u) == 1  # one outer ring, interior edges dissolved


def test_grid_with_hole():
    # ring of 8 tiles around a missing center → union must keep the hole
    pieces = [
        [np.array([[x, y], [x + 10.0, y], [x + 10.0, y + 10.0], [x, y + 10.0]])]
        for x in (0.0, 10.0, 20.0)
        for y in (0.0, 10.0, 20.0)
        if not (x == 10.0 and y == 10.0)
    ]
    u = geom.union_many(pieces)
    assert geom.polygon_area(u) == pytest.approx(800.0)
    assert len(u) == 2  # outer + hole ring


def test_concave_source_with_hole_plus_discs():
    src = [
        np.array(
            [[0, 0], [40, 0], [40, 30], [20, 30], [20, 15], [10, 15], [10, 30], [0, 30]],
            float,
        ),
        np.array([[25, 5], [35, 5], [35, 12], [25, 12]], float),
    ]
    a = np.linspace(0, 2 * np.pi, 9, endpoint=False)
    pieces = [src] + [
        [np.stack([15 + 8 * np.cos(a) + k * 6, 25 + 8 * np.sin(a)], axis=1)]
        for k in range(4)
    ]
    assert_same_region(fold_union(pieces), geom.union_many(pieces))


def test_disjoint_components_with_nesting():
    ann = [
        np.array([[0.0, 0], [50, 0], [50, 50], [0, 50]]),
        np.array([[10.0, 10], [40, 10], [40, 40], [10, 40]]),
    ]
    inner = [np.array([[20.0, 20], [30, 20], [30, 30], [20, 30]])]
    island = [np.array([[70.0, 0], [75, 0], [75, 5], [70, 5]])]
    u = geom.union_many([ann, inner, island])
    want = 50 * 50 - 30 * 30 + 10 * 10 + 25
    assert geom.polygon_area(u) == pytest.approx(want)


def test_duplicate_and_contained_pieces():
    big = [np.array([[0.0, 0], [30, 0], [30, 30], [0, 30]])]
    small = [np.array([[5.0, 5], [10, 5], [10, 10], [5, 10]])]
    u = geom.union_many([big, list(big), small, small])
    assert geom.polygon_area(u) == pytest.approx(900.0)
    assert len(u) == 1


def test_near_parallel_slivers():
    # nearly-coincident long strips (the iterated-snap-rounding regime)
    pieces = []
    for k in range(6):
        dy = k * 1.5e-6
        pieces.append(
            [
                np.array(
                    [[0.0, dy], [40.0, dy + 1e-6], [40.0, dy + 5.0], [0.0, dy + 5.0]]
                )
            ]
        )
    u = geom.union_many(pieces)
    # strips overlap almost completely: union ≈ one strip plus the
    # 7.5e-6-tall stack growth
    assert geom.polygon_area(u) == pytest.approx(200.0, rel=1e-4)


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


def test_hole_ring_only_contact_between_pieces():
    # regression (ADVICE r3, geom.py:1469): piece 0's HOLE ring is the only
    # contact with piece 1, so piece 0 spans two arrangement components
    # (outer ring alone / hole ring ∪ piece 1).  The old per-piece
    # component heuristic seeded the hole component's base parity wrong
    # and mislabelled the hole-notch region.
    pieces = [[_sq(0, 0, 100, 100), _sq(10, 10, 20, 20)], [_sq(12, 12, 22, 22)]]
    u = geom.union_many(pieces)
    # union = big square minus (hole \ piece1): 10000 − (100 − 64)
    assert sum(geom.ring_area(r) for r in u) == pytest.approx(9964.0)
    pts = np.random.default_rng(7).uniform(-5, 105, size=(20000, 2))
    got = geom.points_in_polygon(pts[:, 0], pts[:, 1], u)
    exp = np.zeros(len(pts), bool)
    for rs in pieces:
        exp |= geom.points_in_polygon(pts[:, 0], pts[:, 1], rs)
    assert int((got != exp).sum()) == 0


def _check_pointwise(pieces, n=30000, lo=-10.0, hi=160.0):
    u = geom.union_many(pieces)
    pts = np.random.default_rng(11).uniform(lo, hi, size=(n, 2))
    got = geom.points_in_polygon(pts[:, 0], pts[:, 1], u)
    exp = np.zeros(len(pts), bool)
    for rs in pieces:
        exp |= geom.points_in_polygon(pts[:, 0], pts[:, 1], rs)
    assert int((got != exp).sum()) == 0


def test_multipart_piece_spanning_components():
    # one piece = two DISJOINT outer rings (separate arrangement
    # components); a second piece overlaps only one of them
    _check_pointwise([[_sq(0, 0, 40, 40), _sq(100, 0, 140, 40)], [_sq(30, 10, 50, 30)]])


def test_hole_island_bridge():
    # island component nested inside a hole whose ring is crossed by a
    # third piece (bridge): three interacting components, nesting + base
    # parity + toggles all exercised
    _check_pointwise(
        [[_sq(0, 0, 100, 100), _sq(40, 40, 60, 60)], [_sq(45, 45, 55, 55)], [_sq(50, 30, 70, 50)]]
    )


def test_deeply_nested_annuli():
    # annulus in annulus in square: 3 components, alternating coverage
    _check_pointwise(
        [
            [_sq(0, 0, 150, 150), _sq(20, 20, 130, 130)],
            [_sq(40, 40, 110, 110), _sq(55, 55, 95, 95)],
            [_sq(65, 65, 85, 85)],
        ]
    )


def test_multi_ring_pieces_random_battery():
    # randomized holes: every piece may carry a hole ring; cross-check
    # pointwise membership against the OR of the input pieces
    for trial in range(25):
        r = np.random.default_rng(trial)
        ps = []
        for _ in range(int(r.integers(2, 5))):
            x0, y0 = r.uniform(0, 60, 2)
            w, h = r.uniform(15, 40, 2)
            rings = [_sq(x0, y0, x0 + w, y0 + h)]
            if r.random() < 0.7:
                hx, hy = x0 + w * 0.25, y0 + h * 0.25
                rings.append(_sq(hx, hy, hx + w * 0.4, hy + h * 0.4))
            ps.append(rings)
        u = geom.union_many(ps)
        pts = r.uniform(-5, 105, size=(4000, 2))
        got = geom.points_in_polygon(pts[:, 0], pts[:, 1], u)
        exp = np.zeros(len(pts), bool)
        for rs in ps:
            exp |= geom.points_in_polygon(pts[:, 0], pts[:, 1], rs)
        assert int((got != exp).sum()) == 0, f"trial {trial}"


def test_closing_round_trips_squares_exactly():
    for s in (10.0, 20.0, 40.0, 60.0):
        sq = np.array([[0.0, 0], [s, 0], [s, s], [0, s]])
        got = geom.polygon_area(geom.close_polygon([sq], 30.0))
        assert got == pytest.approx(s * s, abs=1e-6)
