"""Codec roundtrips, PSNR invariant, phash stability, xxhash64 parity."""

import numpy as np

from ib_tool_spark import codecs, synth


def _rand_img(rng, w=32, h=32):
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_ppm_roundtrip():
    rng = np.random.RandomState(0)
    img = _rand_img(rng, 64, 16)
    assert (codecs.ppm_decode(codecs.ppm_encode(img)) == img).all()


def test_png_roundtrip_lossless():
    rng = np.random.RandomState(1)
    for w, h in ((16, 16), (32, 64), (64, 32)):
        img = _rand_img(rng, w, h)
        out = codecs.png_decode(codecs.png_encode(img))
        assert out.shape == img.shape
        assert (out == img).all()


def test_png_decoder_handles_all_filters():
    """Our encoder emits filter 0, but the decoder must handle 1-4 (PNG spec)."""
    import struct
    import zlib

    rng = np.random.RandomState(2)
    img = _rand_img(rng, 8, 5)
    h, w = img.shape[:2]
    raw = img.reshape(h, w * 3).astype(np.int32)
    lines = []
    prev = np.zeros(w * 3, dtype=np.int32)
    for row in range(h):
        f = row % 5
        cur = raw[row]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - np.concatenate([[0, 0, 0], cur[:-3]])) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            a = np.concatenate([[0, 0, 0], cur[:-3]])
            enc = (cur - ((a + prev) >> 1)) & 0xFF
        else:
            a = np.concatenate([[0, 0, 0], cur[:-3]])
            c_ = np.concatenate([[0, 0, 0], prev[:-3]])
            p = a + prev - c_
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c_)
            pr = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c_))
            enc = (cur - pr) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        codecs._PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + codecs._chunk(b"IEND", b"")
    )
    assert (codecs.png_decode(data) == img).all()


def test_tdc_psnr_above_40():
    rng = np.random.RandomState(3)
    worst = np.inf
    for w, h in ((16, 16), (32, 32), (64, 64), (64, 16)):
        img = _rand_img(rng, w, h)
        out = codecs.tdc_decode(codecs.tdc_encode(img))
        worst = min(worst, codecs.psnr(img, out))
    assert worst >= 40.0, worst


def test_psnr_inf_for_identical():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    assert codecs.psnr(img, img) == float("inf")


def test_phash_stable_and_discriminative():
    a = synth.expected_pixels("img_000000000001")
    b = synth.expected_pixels("img_000000000002")
    ha1, ha2 = codecs.phash(a), codecs.phash(a)
    assert ha1 == ha2
    assert ha1 != codecs.phash(b)
    # lossy roundtrip keeps the hash close (perceptual property)
    a_tdc = codecs.tdc_decode(codecs.tdc_encode(a))
    d = bin((ha1 ^ codecs.phash(a_tdc)) & ((1 << 64) - 1)).count("1")
    assert d <= 6, d


def test_xxh64_scalar_vs_vectorized():
    ids = [f"img_{i:012d}" for i in range(200)]
    vec = codecs.xxh64_strings(ids)
    for i, s in enumerate(ids):
        assert vec[i] == codecs.xxh64(s.encode())


def test_xxh64_matches_spark(spark):
    """Pin the mirror to Spark's built-in xxhash64 (seed 42)."""
    from pyspark.sql import functions as F

    ids = [f"img_{i:012d}" for i in range(50)] + ["a" * 40, "x", "0123456789abcdef0123456789abcdef07"]
    df = spark.createDataFrame([(s,) for s in ids], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r.s: r.h for r in df.collect()}
    for s in ids:
        assert got[s] == codecs.xxh64(s.encode()), s


def test_make_row_invariants():
    for i in (0, 7, 123):
        row = synth.make_row(i)
        img = codecs.decode(row["bytes"], row["fmt"])
        exp = synth.expected_pixels(row["image_id"])
        assert img.shape == exp.shape == (row["h"], row["w"], 3)
        p = codecs.psnr(img, exp)
        if row["fmt"] in ("png", "ppm"):
            assert p == float("inf")
        else:
            assert p >= 40.0
        assert row["caption"] == synth.expected_caption(row["image_id"])
        assert row["phash"] == codecs.phash(img)


def test_validate_kernel_matches_scalar_path():
    """r5 pin: the hybrid validate kernel (vectorized id hashes,
    integer PSNR, chunked phash_batch, in-place expected_pixels /
    tdc_decode) is bit-identical to the naive per-row scalar
    composition across all formats and sizes — including a corrupted
    row exercising the failure outputs."""
    import pandas as pd

    from ib_tool_spark import ops

    rows = [synth.make_row(i) for i in range(120)]
    pdf = pd.DataFrame(rows)
    # corrupt one caption and one phash; swap one payload for a wrong
    # image (PSNR mismatch)
    pdf.loc[3, "caption"] = "wrong caption"
    pdf.loc[5, "phash"] = pdf.loc[5, "phash"] ^ 1
    pdf.loc[7, "bytes"] = codecs.encode(
        synth.expected_pixels(pdf.loc[11, "image_id"]), pdf.loc[7, "fmt"]
    ) if synth.expected_pixels(pdf.loc[11, "image_id"]).shape == synth.expected_pixels(pdf.loc[7, "image_id"]).shape else pdf.loc[7, "bytes"]
    got = ops._validate_pdf(pdf, 40.0)
    for i, r in pdf.iterrows():
        img = codecs.decode(bytes(r["bytes"]), r["fmt"])
        exp = synth.expected_pixels(r["image_id"])
        p = codecs.psnr(img, exp)
        want_pix = (p == float("inf")) if r["fmt"] in ("png", "ppm") else (p >= 40.0)
        assert got.loc[i, "psnr"] == min(p, 1e9), i
        assert bool(got.loc[i, "pixels_ok"]) == want_pix, i
        assert bool(got.loc[i, "caption_ok"]) == (r["caption"] == synth.expected_caption(r["image_id"])), i
        assert bool(got.loc[i, "phash_ok"]) == (int(r["phash"]) == codecs.phash(img)), i
    assert not got.loc[3, "caption_ok"] and not got.loc[5, "phash_ok"]


def test_phash_batch_matches_scalar():
    """phash_batch over every (h, w) size must equal scalar phash."""
    rng = np.random.RandomState(3)
    for h in (16, 32, 64):
        for w in (16, 32, 64):
            imgs = rng.randint(0, 256, size=(7, h, w, 3), dtype=np.uint8)
            got = codecs.phash_batch(imgs)
            for k in range(imgs.shape[0]):
                assert got[k] == codecs.phash(imgs[k]), (h, w, k)


def test_expected_pixels_batch_matches_scalar():
    """r5 pin: the chunked expected-pixel synthesis is bit-identical to
    the scalar path for every (h, w) size and checker period.  Ids are
    drawn until all 9 sizes and all 8 periods appear."""
    ids = [f"img_{i:012d}" for i in range(400)]
    hp = synth.id_hashes(ids, "#px")
    by_size: dict[tuple[int, int], list[int]] = {}
    periods = set()
    for i, h in enumerate(hp):
        w = synth.IMAGE_SIZES[int(h) % 3]
        hh = synth.IMAGE_SIZES[(int(h) >> 2) % 3]
        by_size.setdefault((hh, w), []).append(i)
        periods.add(4 + (int(h) >> 5) % 8)
    assert len(by_size) == 9 and len(periods) == 8
    for (hh, ww), idxs in by_size.items():
        grp = np.asarray(idxs)
        batch = synth.expected_pixels_batch(hp[grp], hh, ww).copy()
        for j, i in enumerate(grp):
            scalar = synth.expected_pixels_f(ids[i], hp=int(hp[i]))
            assert np.array_equal(batch[j], scalar), (hh, ww, ids[i])


def test_tdc_thin_gemm_matches_stacked_matmul():
    """r5 pin: the two-thin-GEMM IDCT is bit-identical to the stacked
    per-block ``D.T @ q @ D`` formulation on every image size."""
    import struct
    import zlib

    def stacked_decode(data: bytes) -> np.ndarray:
        magic, w, h = struct.unpack(">4sII", data[:12])
        q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16).astype(np.float64)
        q *= codecs._TDC_STEP
        q = q.reshape(h // 8, w // 8, 3, 8, 8)
        blocks = codecs._DCT8.T @ q @ codecs._DCT8
        blocks += 128.0
        np.rint(blocks, out=blocks)
        np.clip(blocks, 0, 255, out=blocks)
        return np.ascontiguousarray(
            blocks.astype(np.uint8).transpose(0, 3, 1, 4, 2).reshape(h, w, 3)
        )

    rng = np.random.RandomState(11)
    for h in (16, 32, 64):
        for w in (16, 32, 64):
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            data = codecs.tdc_encode(img)
            assert np.array_equal(codecs.tdc_decode(data), stacked_decode(data)), (h, w)


def test_rint_half_even_formula_exhaustive():
    """r5 pin: the integer round-half-to-even used by the int16
    expected-pixel lattice, ``(M + 31 + ((M >> 6) & 1)) >> 6``, equals
    ``np.rint(M / 64)`` for every integer M across (a superset of) the
    reachable range |M| <= 25 700."""
    m = np.arange(-200000, 200000, dtype=np.int64)
    ref = np.rint(m / 64.0).astype(np.int64)
    got = (m + 31 + ((m >> 6) & 1)) >> 6
    assert np.array_equal(ref, got)


def test_expected_pixels_batch_i16_matches_scalar():
    """r5 pin: the int16 sixty-fourths-lattice synthesis is bit-identical
    to the scalar float64 path for every (h, w) size and checker period,
    in both period-sorted (the validate kernel's order) and raw order."""
    ids = [f"img_{i:012d}" for i in range(400)]
    hp = synth.id_hashes(ids, "#px")
    by_size: dict[tuple[int, int], list[int]] = {}
    periods = set()
    for i, h in enumerate(hp):
        w = synth.IMAGE_SIZES[int(h) % 3]
        hh = synth.IMAGE_SIZES[(int(h) >> 2) % 3]
        by_size.setdefault((hh, w), []).append(i)
        periods.add(4 + (int(h) >> 5) % 8)
    assert len(by_size) == 9 and len(periods) == 8
    for sort_by_period in (True, False):
        for (hh, ww), idxs in by_size.items():
            grp = np.asarray(idxs)
            if sort_by_period:
                per = (hp[grp] >> np.uint64(5)) % np.uint64(8)
                grp = grp[np.argsort(per, kind="stable")]
            batch = synth.expected_pixels_batch_i16(hp[grp], hh, ww).copy()
            assert batch.dtype == np.int16
            for j, i in enumerate(grp):
                scalar = synth.expected_pixels(ids[i], hp=int(hp[i]))
                assert np.array_equal(batch[j].astype(np.uint8), scalar), (hh, ww, ids[i])
                assert batch[j].min() >= 0 and batch[j].max() <= 255


def test_expected_pixels_batch_i16_cm_matches_scalar():
    """r5 pin: the channel-major (k, 3, h, w) int16 synthesis is
    bit-identical to the scalar float64 path across sizes/periods."""
    ids = [f"img_{i:012d}" for i in range(400)]
    hp = synth.id_hashes(ids, "#px")
    by_size: dict[tuple[int, int], list[int]] = {}
    for i, h in enumerate(hp):
        w = synth.IMAGE_SIZES[int(h) % 3]
        hh = synth.IMAGE_SIZES[(int(h) >> 2) % 3]
        by_size.setdefault((hh, w), []).append(i)
    assert len(by_size) == 9
    for (hh, ww), idxs in by_size.items():
        grp = np.asarray(idxs)
        per = (hp[grp] >> np.uint64(5)) % np.uint64(8)
        grp = grp[np.argsort(per, kind="stable")]
        cm = synth.expected_pixels_batch_i16_cm(hp[grp], hh, ww).copy()
        assert cm.shape == (len(grp), 3, hh, ww) and cm.dtype == np.int16
        for j, i in enumerate(grp):
            scalar = synth.expected_pixels(ids[i], hp=int(hp[i]))
            assert np.array_equal(cm[j].transpose(1, 2, 0).astype(np.uint8), scalar)


def test_phash_batch_channel_major_matches():
    """r5 pin: phash_batch(channel_major=True) over (n, 3, h, w) equals
    the (n, h, w, 3) path (and hence the scalar) for every size."""
    rng = np.random.RandomState(17)
    for h in (16, 32, 64):
        for w in (16, 32, 64):
            imgs = rng.randint(0, 256, (100, h, w, 3), np.uint8)
            a = codecs.phash_batch(imgs)
            b = codecs.phash_batch(
                np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)), channel_major=True
            )
            assert np.array_equal(a, b), (h, w)
