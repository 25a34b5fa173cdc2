"""G13 Thiessen/Voronoi — exact bounded Voronoi cells via
Delaunay-neighbor half-plane clipping (geom.voronoi_cells) and the
reference's partition chain (Partitioning.pyt:84-119 →
geom.thiessen_partition_polygons / delineate.thiessen_partitions)."""

import numpy as np
import pandas as pd
import pytest

from ib_tool_spark import delineate, geom, ops

BBOX = (0.0, 0.0, 100.0, 100.0)


def _brute_cell(pts, i, bbox):
    """Voronoi cell by clipping against EVERY other site — the
    definitional oracle (cell = ∩ all bisector half-planes)."""
    minx, miny, maxx, maxy = bbox
    ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]], dtype=np.float64
    )
    for j in range(len(pts)):
        if j == i:
            continue
        ring = geom._clip_halfplane(
            ring, pts[i, 0], pts[i, 1], pts[j, 0], pts[j, 1]
        )
        if ring.shape[0] == 0:
            break
    return ring


def test_voronoi_matches_bruteforce_random():
    rng = np.random.RandomState(7)
    pts = rng.uniform(0, 100, (40, 2))
    cells = geom.voronoi_cells(pts, BBOX)
    for i in range(len(pts)):
        b = _brute_cell(pts, i, BBOX)
        assert abs(geom.ring_area(cells[i]) - geom.ring_area(b)) < 1e-7


def test_voronoi_lattice_degenerate():
    # lattice subset: exactly collinear triples and cocircular quads —
    # the triangulation's diagonal choices are arbitrary there, the
    # cells must not depend on them
    gx, gy = np.meshgrid(np.arange(6), np.arange(6))
    mask = (gx + gy) % 3 != 1
    pts = np.stack([gx[mask] * 150 + 75.0, gy[mask] * 150 + 75.0], axis=1)
    bbox = (0.0, 0.0, 900.0, 900.0)
    cells = geom.voronoi_cells(pts, bbox)
    for i in range(len(pts)):
        b = _brute_cell(pts, i, bbox)
        assert abs(geom.ring_area(cells[i]) - geom.ring_area(b)) < 1e-6


def test_voronoi_tiles_bbox_and_contains_sites():
    rng = np.random.RandomState(11)
    pts = rng.uniform(5, 95, (60, 2))
    cells = geom.voronoi_cells(pts, BBOX)
    assert abs(sum(geom.ring_area(c) for c in cells) - 100.0 * 100.0) < 1e-6
    for i in range(len(pts)):
        assert geom.points_in_polygon(pts[i : i + 1, 0], pts[i : i + 1, 1], [cells[i]])[0]


def test_voronoi_cell_is_nearest_site_region():
    rng = np.random.RandomState(13)
    pts = rng.uniform(0, 100, (25, 2))
    cells = geom.voronoi_cells(pts, BBOX)
    probes = rng.uniform(0, 100, (500, 2))
    d2 = ((probes[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
    nearest = d2.argmin(axis=1)
    for i, cell in enumerate(cells):
        inside = geom.points_in_polygon(probes[:, 0], probes[:, 1], [cell])
        # every probe strictly inside cell i has site i nearest (random
        # probes are never on a bisector)
        assert (nearest[inside] == i).all()


def test_voronoi_small_n():
    assert geom.voronoi_cells(np.empty((0, 2)), BBOX) == []
    (only,) = geom.voronoi_cells(np.array([[40.0, 60.0]]), BBOX)
    assert abs(geom.ring_area(only) - 10000.0) < 1e-9
    two = geom.voronoi_cells(np.array([[25.0, 50.0], [75.0, 50.0]]), BBOX)
    assert abs(geom.ring_area(two[0]) - 5000.0) < 1e-9
    assert abs(geom.ring_area(two[1]) - 5000.0) < 1e-9


def test_thiessen_two_clusters():
    c1 = np.stack(
        [np.repeat(np.arange(3), 3) * 150 + 75.0, np.tile(np.arange(3), 3) * 150 + 75.0],
        axis=1,
    )
    c2 = c1 + np.array([3000.0, 0.0])
    sites = np.vstack([c1, c2])
    faces = geom.thiessen_partition_polygons(
        sites, (-150.0, -150.0, 3600.0, 600.0), 75.0
    )
    assert len(faces) == 2
    counts = []
    for f in faces:
        n1 = int(geom.points_in_polygon(c1[:, 0], c1[:, 1], f).sum())
        n2 = int(geom.points_in_polygon(c2[:, 0], c2[:, 1], f).sum())
        counts.append((n1, n2))
    assert sorted(counts) == [(0, 9), (9, 0)]
    # the wall midway between the clusters splits the frame area evenly
    a0, a1 = (geom.polygon_area(f) for f in faces)
    assert abs(a0 - a1) < 1e-6


def test_thiessen_one_cluster_single_face():
    sites = np.stack(
        [np.repeat(np.arange(2), 2) * 150 + 75.0, np.tile(np.arange(2), 2) * 150 + 75.0],
        axis=1,
    )
    faces = geom.thiessen_partition_polygons(sites, (-300.0, -300.0, 600.0, 600.0), 75.0)
    # all interior walls are within radius_del of sites → only the
    # bbox frame survives → one face
    assert len(faces) == 1
    assert abs(geom.polygon_area(faces[0]) - 900.0 * 900.0) < 1e-6


@pytest.mark.usefixtures("spark")
def test_thiessen_partitions_spark(spark):
    n = 3000
    ids = [f"img_{i:012d}" for i in range(n)]
    pts = ops.with_geocode(spark.createDataFrame(pd.DataFrame({"image_id": ids})))
    out = delineate.thiessen_partitions(pts).collect()
    assert len(out) >= 2
    # deterministic naming + rerun stability
    out2 = delineate.thiessen_partitions(pts).collect()
    key = lambda rows: sorted((r["part"], round(r["area"], 6)) for r in rows)
    assert key(out) == key(out2)
    # parity with the distributed cell-map partitioning: every dense
    # cell center falls in exactly one face, and no connected component
    # is split across faces (Thiessen walls only run through empty
    # space — the documented equivalence of the two partitioners)
    dense = delineate.density_partitions_df(pts).toPandas()
    cx = (dense.gx.to_numpy(np.float64) + 0.5) * 150.0
    cy = (dense.gy.to_numpy(np.float64) + 0.5) * 150.0
    assign = np.full(len(dense), -1)
    for k, r in enumerate(out):
        rings = [np.asarray(rr, np.float64) for rr in r["rings"]]
        inside = geom.points_in_polygon(cx, cy, rings)
        assert (assign[inside] == -1).all(), "faces overlap a dense cell"
        assign[inside] = k
    assert (assign >= 0).all(), "dense cell outside every face"
    split = (
        pd.DataFrame({"pn": dense.part_name, "face": assign})
        .groupby("pn")["face"]
        .nunique()
    )
    assert (split == 1).all()
