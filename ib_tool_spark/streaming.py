"""Structured Streaming layer.

The reference is a batch pipeline — its only "incremental" mechanism is
the PartLog resume queue (IB-Tool2.py:2386-2399), which this engine
maps to batch checkpoint/resume (checkpoint.py), NOT to streaming.
This module exists for the engine's own surface: a streaming ingest of
the image payload with windowed per-tile counts, so a live feed can be
tiled/aggregated with the same cell math as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ops, synth
from .cells import encode_col, parent_col

IMAGES_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def stream_images(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream over an images parquet directory."""
    return (
        spark.readStream.schema(IMAGES_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_tile_counts(images: DataFrame, cell_res: int = 10, tile_res: int = 6) -> DataFrame:
    """Per-tile image counts over the stream — geocode/cell/tile are the
    identical Column expressions as the batch flagship, so batch and
    stream agree row-for-row."""
    pts = ops.with_cell(ops.with_geocode(images.select("image_id")), cell_res)
    tiled = pts.withColumn("tile", parent_col(F.col("cell"), cell_res, tile_res))
    return tiled.groupBy("tile").agg(F.count(F.lit(1)).alias("n_images"))
