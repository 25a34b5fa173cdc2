"""Multimodal operators: thumbnails, features, phash dedup, frame stub."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ib_tool_spark import codecs, imageops, synth


@pytest.fixture(scope="module")
def images(spark):
    return synth.synth_images_df(spark, 100, 4).cache()


def test_thumbnails(spark, images):
    out = imageops.thumbnails(images, size=16).toPandas()
    assert len(out) == 100
    for row in out.itertuples():
        t = codecs.ppm_decode(bytes(row.thumb))
        assert t.shape == (16, 16, 3)
    # deterministic: thumbnail of a known image matches direct resample
    row = out[out["image_id"] == "img_000000000000"].iloc[0]
    img = synth.expected_pixels("img_000000000000")
    fmt = synth.image_fmt("img_000000000000")
    decoded = codecs.decode(codecs.encode(img, fmt), fmt).astype(np.float64)
    want = np.stack([codecs._resample_pow2(decoded[:, :, c], 16) for c in range(3)], axis=2)
    want = np.clip(np.rint(want), 0, 255).astype(np.uint8)
    assert (codecs.ppm_decode(bytes(row.thumb)) == want).all()


def test_image_features(spark, images):
    out = imageops.image_features(images).toPandas()
    assert len(out) == 100
    assert out["brightness"].between(0, 255).all()
    assert (out["edge_energy"] > 0).all()
    # phash recomputation matches the stored column
    stored = images.select("image_id", "phash").toPandas().set_index("image_id")["phash"]
    got = out.set_index("image_id")["phash"]
    assert (got == stored[got.index]).all()


def test_phash_near_dups_selfsim(spark):
    # identical pixels re-encoded losslessly → hamming 0 pairs
    img = synth.expected_pixels("img_000000000042")
    rows = [
        ("a", codecs.png_encode(img), "png", int(codecs.phash(img))),
        ("b", codecs.ppm_encode(img), "ppm", int(codecs.phash(img))),
        ("c", codecs.png_encode(synth.expected_pixels("img_000000000007")), "png",
         int(codecs.phash(synth.expected_pixels("img_000000000007")))),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string, phash long")
    got = {(r.id_a, r.id_b): r.hamming for r in imageops.phash_near_dups(df, max_hamming=4).collect()}
    assert got.get(("a", "b")) == 0
    assert all("c" not in p for p in got)


def test_frame_sample_stub_raises(spark):
    df = spark.createDataFrame([("m0", b"P6...")], "media_id string, bytes binary")
    with pytest.raises(Exception) as exc:
        imageops.frame_sample(df, use_fake_decoder=False).collect()
    assert "NotImplementedError" in str(exc.value) or "ffmpeg" in str(exc.value)


def test_frame_sample_fake_decoder(spark):
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (8, 8, 3)).astype(np.uint8) for _ in range(25)]
    blob = b"".join(codecs.ppm_encode(f) for f in frames)
    df = spark.createDataFrame([("m0", blob)], "media_id string, bytes binary")
    out = imageops.frame_sample(df, every_n=10, use_fake_decoder=True).toPandas()
    assert out["frame_idx"].tolist() == [0, 10, 20]
    for row in out.itertuples():
        assert (codecs.ppm_decode(bytes(row.frame)) == frames[row.frame_idx]).all()


def test_phash_near_dups_caps_degenerate_buckets(spark):
    # VERDICT r5 wrong#1: a constant-phash corpus must not go O(n^2)
    # through one band bucket — the cap drops the bucket entirely.
    import pandas as pd

    from ib_tool_spark import imageops

    n = 600
    pdf = pd.DataFrame({
        "image_id": [f"img_{i:06d}" for i in range(n)],
        "phash": [0x1234_5678_9ABC_DEF0] * n,
    })
    df = spark.createDataFrame(pdf, "image_id string, phash long")
    capped = imageops.phash_near_dups(df, max_hamming=6, max_bucket=256)
    assert capped.count() == 0
    # small corpus below the cap still pairs as before
    small = spark.createDataFrame(pdf.head(10), "image_id string, phash long")
    assert imageops.phash_near_dups(small, max_hamming=6).count() == 45
