"""ib_tool_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the operator semantics of the reference
settlement-delineation toolset (IB-Tool/ib-tool: density clustering,
footprint aggregation, boundary dissolve, spatial join, tiling —
see /root/repo/SURVEY.md) as an idiomatic Spark DataFrame engine:

- ``cells``   — planar quadtree (Morton/"S2-style") and hex-axial
  ("H3-style") cell indexes; the explicit replacement for the
  reference's hidden ArcGIS R-tree (IB-Tool2.py SelectLayerByLocation
  sites).
- ``geom``    — vectorized numpy geometry kernels (point-in-polygon,
  shoelace area, distances, convex hull, oriented MBR, Delaunay, MST).
- ``codecs``  — pure-numpy image codecs (PNG via stdlib zlib, PPM,
  toy-DCT lossy) + perceptual hash + PSNR.
- ``synth``   — deterministic generator for the image+caption payload
  table and the synthetic settlement scene.
- ``ops``     — DataFrame-level operators: cell_encode, pip_join,
  knn_join, tile_assign, density_grid, dedup family, text analysis.
- ``pipeline``— the flagship composite pipeline (geocode → H3-encode →
  PIP-join → tile-assign) and checkpoint/resume.
"""

__version__ = "0.1.0"
