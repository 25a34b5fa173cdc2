"""Audio binary-column operators: real PCM-WAV codec + closed-form features."""

from __future__ import annotations

import numpy as np
import pytest

from ib_tool_spark import audioops as A


def test_wav_roundtrip_byte_exact():
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.9, 0.9, 1000)
    data = A.wav_encode(x, 8000)
    y, sr = A.wav_decode(data)
    assert sr == 8000
    # re-encode of the decode is byte-identical (quantization fixpoint)
    assert A.wav_encode(y, 8000) == data


def test_wav_decode_walks_extra_chunks():
    x = np.sin(np.linspace(0, 20, 500))
    data = A.wav_encode(x, 8000)
    # splice a LIST chunk between fmt and data (word-aligned RIFF walk)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    y, sr = A.wav_decode(spliced)
    assert sr == 8000 and y.shape[0] == 500


def test_wav_decode_rejects_stereo():
    x = np.zeros(16)
    data = bytearray(A.wav_encode(x, 8000))
    data[22] = 2  # n_channels
    with pytest.raises(ValueError):
        A.wav_decode(bytes(data))


def test_features_match_closed_form_locally():
    for i in range(0, 900, 11):
        row = A.make_audio_row(i)
        x, sr = A.wav_decode(row["bytes"])
        exp = A.expected_features_row(i)
        sb = np.signbit(x)
        assert int(round(1000.0 * float(np.sqrt(np.mean(x * x))))) == exp["rms_milli"]
        assert int(np.count_nonzero(sb[1:] != sb[:-1])) == exp["zero_crossings"]
        assert int(np.argmax(np.abs(np.fft.rfft(x))[1:])) + 1 == exp["dominant_bin"]
        assert int(round(1000.0 * x.shape[0] / sr)) == exp["duration_ms"]


def test_audio_features_spark(spark):
    df = A.synth_audio_df(spark, 60)
    got = {r.media_id: r.asDict() for r in A.audio_features(df).collect()}
    assert len(got) == 60
    for i in range(60):
        exp = A.expected_features_row(i)
        row = got[exp["media_id"]]
        for k, v in exp.items():
            assert row[k] == v, (i, k, row[k], v)


def test_audio_resample_preserves_duration_and_tone(spark):
    df = A.synth_audio_df(spark, 12)
    half = A.audio_resample(df, 4000)
    feats = {r.media_id: r for r in A.audio_features(half).collect()}
    for i in range(12):
        exp = A.expected_features_row(i)
        r = feats[exp["media_id"]]
        # duration invariant under resample; the tone keeps its cycle
        # count, so the dominant FFT bin index is unchanged
        assert r.duration_ms == exp["duration_ms"]
        assert r.dominant_bin == exp["dominant_bin"]
