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


def streaming_windowed_density(
    images: DataFrame,
    cell_res: int = 6,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Event-time windowed per-tile density with a late-data watermark.

    The synthetic payload carries no timestamp column, so event time
    derives deterministically from the id hash (a stand-in for capture
    time in a real feed).  Late rows beyond ``watermark`` are dropped
    by the engine and the window state is reclaimed — the property that
    bounds state size on an unbounded 100 TB feed."""
    with_ts = images.select("image_id").withColumn(
        "event_time",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.xxhash64("image_id"), F.lit(86_400))
        ),
    )
    pts = ops.with_cell(ops.with_geocode(with_ts), cell_res)
    return (
        pts.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n_images"))
        .select(
            F.col("win.start").alias("win_start"),
            "cell",
            "n_images",
        )
    )


def streaming_running_dedup(images: DataFrame, ttl_minutes: float = 60) -> DataFrame:
    """Stateful exact dedup over the stream: first sighting of each
    payload hash passes, repeats within the state TTL are dropped —
    applyInPandasWithState with one state entry per distinct hash and a
    processing-time timeout of ``ttl_minutes``.  On timeout the entry is
    REMOVED (state stays bounded by distinct hashes within TTL, not by
    stream length), so a hash seen again after its TTL expired passes as
    new again — the documented semantics of a TTL dedup window.

    The emitted ``image_id`` is the MINIMUM image_id within the first
    batch that saw the hash (batch row order is not deterministic under
    repartition/retry, so ``iloc[0]`` would emit different rows on
    replay).  Cross-batch rule: the first BATCH wins — ids arriving in
    later batches never replace the emitted one, matching at-batch-
    granularity streaming semantics.

    Output: (khash, image_id, n_dups_so_far) — one row per NEW hash."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    keyed = images.select(
        F.xxhash64("bytes").alias("khash"), "image_id"
    )

    def dedup_fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # TTL expiry: drop the entry so state stays bounded and the
            # hash can re-pass as new (a timed-out invocation carries no
            # input rows — re-updating here would resurrect the entry
            # forever)
            state.remove()
            return
        n_prev = state.get[0] if state.exists else 0
        n_new = 0
        first_id = None
        for pdf in pdfs:
            n_new += len(pdf)
            if len(pdf):
                m = pdf["image_id"].astype(str).min()
                first_id = m if first_id is None else min(first_id, m)
        total = n_prev + n_new
        state.update((total,))
        state.setTimeoutDuration(int(60_000 * ttl_minutes))
        if n_prev == 0 and first_id is not None:
            yield pd.DataFrame(
                {"khash": [key[0]], "image_id": [first_id], "n_dups_so_far": [total - 1]}
            )

    return keyed.groupBy("khash").applyInPandasWithState(
        dedup_fn,
        outputStructType="khash long, image_id string, n_dups_so_far long",
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
