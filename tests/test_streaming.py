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
