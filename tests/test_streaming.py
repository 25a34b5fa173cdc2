"""Streaming tile counts agree with the batch flagship aggregation."""

from pyspark.sql import functions as F

from ib_tool_spark import ops, streaming, synth
from ib_tool_spark.cells import parent_col


def test_streaming_tile_counts_match_batch(spark, tmp_path):
    path = str(tmp_path / "imgs")
    synth.synth_images_df(spark, 600, 6).write.parquet(path)

    stream = streaming.stream_images(spark, path, max_files=2)
    agg = streaming.streaming_tile_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tile_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.tile: r.n_images for r in spark.sql("SELECT * FROM tile_counts").collect()}
    finally:
        q.stop()

    batch = spark.read.parquet(path)
    pts = ops.with_cell(ops.with_geocode(batch.select("image_id")), 10)
    want = {
        r.tile: r.n
        for r in pts.withColumn("tile", parent_col(F.col("cell"), 10, 6))
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_windowed_density_matches_batch(spark, tmp_path):
    path = str(tmp_path / "imgs_w")
    synth.synth_images_df(spark, 400, 4).write.parquet(path)

    stream = streaming.stream_images(spark, path, max_files=2)
    agg = streaming.streaming_windowed_density(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_density")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        got = {
            (r.win_start, r.cell): r.n_images
            for r in spark.sql("SELECT * FROM win_density").collect()
        }
    finally:
        q.stop()

    # batch replica of the same window math; windows still open at the
    # watermark are withheld in append mode, so got ⊆ want with equality
    # on every emitted key
    batch = spark.read.parquet(path)
    want_df = streaming.streaming_windowed_density(batch.select("image_id"))
    want = {(r.win_start, r.cell): r.n_images for r in want_df.collect()}
    assert got, "no windows finalized"
    for k, v in got.items():
        assert want[k] == v
    assert set(got).issubset(set(want))


def test_streaming_running_dedup_state(spark, tmp_path):
    path = str(tmp_path / "imgs_d")
    # two copies of the same 120 payloads → every hash repeats once
    base = synth.synth_images_df(spark, 120, 2)
    base.write.parquet(path)
    base.write.mode("append").parquet(path)

    stream = streaming.stream_images(spark, path, max_files=1)
    out = streaming.streaming_running_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM dedup_out").collect()
    finally:
        q.stop()

    # exactly one emitted row per distinct payload hash
    assert len(rows) == 120
    assert len({r.khash for r in rows}) == 120
