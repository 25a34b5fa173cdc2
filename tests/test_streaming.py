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


def test_streaming_dedup_first_id_deterministic(spark, tmp_path):
    # ADVICE r3 (streaming.py:97): the emitted image_id must be the MIN
    # id of the first batch, invariant to row order / partitioning —
    # iloc[0] of an unordered batch was replay-nondeterministic
    import pandas as pd

    payload = b"same-bytes-payload"
    ids = [f"img_{i:03d}" for i in (7, 3, 9, 1, 5)]
    pdf = pd.DataFrame(
        {
            "image_id": ids,
            "bytes": [payload] * len(ids),
            "w": 4, "h": 4, "fmt": "raw", "caption": "c", "phash": 0,
        }
    )
    for trial, nparts in enumerate((1, 3, 5)):
        path = str(tmp_path / f"imgs_det_{trial}")
        spark.createDataFrame(pdf).repartition(nparts).write.parquet(path)
        stream = streaming.stream_images(spark, path, max_files=10)
        out = streaming.streaming_running_dedup(stream)
        name = f"dedup_det_{trial}"
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
            rows = spark.sql(f"SELECT * FROM {name}").collect()
        finally:
            q.stop()
        assert len(rows) == 1
        assert rows[0].image_id == "img_001"  # min id, every partitioning
        assert rows[0].n_dups_so_far == len(ids) - 1


def test_streaming_dedup_ttl_expiry_reemits(spark, tmp_path):
    # ADVICE r3 (streaming.py:90): after the processing-time TTL the
    # state entry must be REMOVED (not refreshed), so the same payload
    # hash re-passes as new.  Sequence: X → (wait > TTL) → unrelated Y
    # batch fires X's timeout → X again re-emits.
    import time

    import pandas as pd

    def write_one(image_id, payload, sub):
        p = str(tmp_path / "imgs_ttl" / sub)
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "image_id": [image_id], "bytes": [payload],
                    "w": 4, "h": 4, "fmt": "raw", "caption": "c", "phash": 0,
                }
            )
        ).write.mode("overwrite").parquet(p)
        # register into the streamed dir as one file move-free append
        import shutil, glob, os

        dst = str(tmp_path / "imgs_ttl_src")
        os.makedirs(dst, exist_ok=True)
        for i, f in enumerate(glob.glob(p + "/part-*.parquet")):
            shutil.copy(f, os.path.join(dst, f"{sub}_{i}.parquet"))

    src = str(tmp_path / "imgs_ttl_src")
    write_one("a1", b"payload-X", "f1")
    stream = streaming.stream_images(spark, src, max_files=1)
    out = streaming.streaming_running_dedup(stream, ttl_minutes=1.0 / 60.0)  # 1 s TTL
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_ttl")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT * FROM dedup_ttl").count() >= 1:
                break
            time.sleep(0.3)
        time.sleep(3.0)  # let the 1 s TTL expire
        write_one("b1", b"payload-Y", "f2")  # unrelated batch fires X's timeout
        time.sleep(3.0)
        write_one("a2", b"payload-X", "f3")  # X again — must re-emit
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM dedup_ttl").collect()
            x_rows = [r for r in rows if r.image_id in ("a1", "a2")]
            if len(x_rows) == 2:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM dedup_ttl").collect()
    finally:
        q.stop()
    by_id = {r.image_id: r for r in rows}
    assert "a1" in by_id and "a2" in by_id, sorted(by_id)
    assert by_id["a2"].n_dups_so_far == 0  # re-passed as NEW, not as dup
