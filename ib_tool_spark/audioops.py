"""Audio operators over opaque ``binary`` columns.

The training-data contract treats audio like images: bytes + typed
metadata ride a DataFrame column, decode/feature-extract run as
Arrow-batched ``mapInPandas`` kernels with bounded memory.  Unlike
video (ffmpeg-gated stub in imageops.py), PCM WAV needs no codec
library — the RIFF container is a fixed header over raw little-endian
samples — so the decode here is REAL: pure numpy, byte-exact, usable
at scale.

Reference parity note: the reference pipeline (IB-Tool2.py) is
image/vector only; this module is part of the engine's own
training-data surface (brief: image/audio/video as opaque binary
columns), not a port.

Synthesis mirrors synth.synth_images_df: every row is a pure function
of its index (single sine with id-derived integer cycle count), so the
table is identical under any partitioning/retry AND every feature has
a CLOSED FORM — duration = n/sr, RMS = a/sqrt(2), zero-crossing pairs
= 2*cycles, dominant FFT bin = cycles — which the driver oracle checks
hash-exactly without re-running the decoder.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_SCHEMA = "media_id string, bytes binary, sr int, n_samples int"
SAMPLE_RATE = 8000


# ---------------------------------------------------------------------------
# PCM WAV codec (16-bit mono) — pure numpy, no external libraries
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sr: int = SAMPLE_RATE) -> bytes:
    """16-bit mono PCM RIFF/WAVE bytes from float samples in [-1, 1]."""
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """(float samples in [-1, 1], sample_rate) from 16-bit mono PCM WAV.

    Walks RIFF chunks (a writer may emit LIST/fact chunks before data);
    raises on non-PCM or non-16-bit payloads rather than guessing.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sr = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or n_ch != 1 or bits != 16:
                raise ValueError(f"unsupported WAV layout: fmt={fmt_tag} ch={n_ch} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32767.0
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, int(sr)


# ---------------------------------------------------------------------------
# deterministic synthesis (single sine, closed-form features)
# ---------------------------------------------------------------------------


def make_audio_row(i: int, sr: int = SAMPLE_RATE) -> dict:
    """Row ``i``: a single sine with integer cycles, id-derived params.

    cycles ∈ [20, 520), amplitude ∈ {0.25, 0.5, 0.75}, length ∈
    {4000, 6000, 8000} samples — every feature closed-form (module
    docstring)."""
    n = 4000 + 2000 * (i % 3)
    cycles = 20 + (i * 37) % 500
    amp = 0.25 * (1 + (i * 11) % 3)
    t = np.arange(n, dtype=np.float64)
    samples = amp * np.sin(2.0 * np.pi * cycles * t / n)
    return {
        "media_id": f"aud_{i:08d}",
        "bytes": wav_encode(samples, sr),
        "sr": sr,
        "n_samples": n,
    }


def synth_audio_df(spark, n: int, n_partitions: int | None = None) -> DataFrame:
    """Distributed audio synthesis — same shape as synth.synth_images_df."""
    if n_partitions is None:
        n_partitions = max(4, min(256, n // 2000))

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([make_audio_row(int(i)) for i in pdf["id"]])

    return spark.range(0, n, 1, n_partitions).mapInPandas(gen, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction / resample — Arrow-batched mapInPandas kernels
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = (
    "media_id string, duration_ms long, rms_milli long, zero_crossings long, "
    "dominant_bin long, clipped long"
)


def audio_features(df: DataFrame) -> DataFrame:
    """Decode + per-clip features in one pass over Arrow batches.

    duration_ms   round(1000 * n / sr)
    rms_milli     round(1000 * sqrt(mean(x^2)))  (integerized so the
                  driver hash-compare is float-stable)
    zero_crossings  #(sign changes), zeros counted with the preceding
                  sample's sign (np.signbit — a true 0.0 keeps sign +)
    dominant_bin  argmax_{k>=1} |rfft(x)_k| (DC excluded)
    clipped       #samples at full scale (|pcm| == 32767)
    """

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "duration_ms", "rms_milli", "zero_crossings",
                "dominant_bin", "clipped",
            )}
            for media_id, data in zip(pdf["media_id"], pdf["bytes"]):
                x, sr = wav_decode(bytes(data))
                n = x.shape[0]
                pcm = np.abs(np.round(x * 32767.0))
                sb = np.signbit(x)
                rows["media_id"].append(media_id)
                rows["duration_ms"].append(int(round(1000.0 * n / sr)))
                rows["rms_milli"].append(int(round(1000.0 * float(np.sqrt(np.mean(x * x))))))
                rows["zero_crossings"].append(int(np.count_nonzero(sb[1:] != sb[:-1])))
                spec = np.abs(np.fft.rfft(x))
                rows["dominant_bin"].append(int(np.argmax(spec[1:])) + 1 if n > 1 else 0)
                rows["clipped"].append(int(np.count_nonzero(pcm >= 32767)))
            yield pd.DataFrame(rows)

    return df.select("media_id", "bytes").mapInPandas(run, FEATURES_SCHEMA)


RESAMPLE_SCHEMA = "media_id string, bytes binary, sr int, n_samples int"


def audio_resample(df: DataFrame, target_sr: int) -> DataFrame:
    """Linear-interpolation resample to ``target_sr`` (the audio twin of
    imageops.thumbnails): decode → interp → re-encode, per Arrow batch."""

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "bytes", "sr", "n_samples")}
            for media_id, data in zip(pdf["media_id"], pdf["bytes"]):
                x, sr = wav_decode(bytes(data))
                m = max(1, int(round(x.shape[0] * target_sr / sr)))
                src = np.arange(x.shape[0], dtype=np.float64) / sr
                dst = np.arange(m, dtype=np.float64) / target_sr
                y = np.interp(dst, src, x)
                rows["media_id"].append(media_id)
                rows["bytes"].append(wav_encode(y, target_sr))
                rows["sr"].append(target_sr)
                rows["n_samples"].append(m)
            yield pd.DataFrame(rows)

    return df.select("media_id", "bytes").mapInPandas(run, RESAMPLE_SCHEMA)


def expected_features_row(i: int, sr: int = SAMPLE_RATE) -> dict:
    """Closed-form oracle for audio_features over make_audio_row(i) —
    derived from the synthesis PARAMETERS, not by running the decoder:

    - duration_ms: 1000*n/sr
    - rms: a/sqrt(2) exactly for an integer-cycle sine, modulated by the
      16-bit quantization — the quantized RMS stays within 1 milli-unit
      of closed form for these amplitudes, and the three (amp, n) grids
      are verified against literal quantized sums in the tests
    - zero_crossings: sin(2*pi*c*t/n) over t=0..n-1 changes sign exactly
      2c - 1 times (the final crossing back to the t=n sample is not
      observed)
    - dominant_bin: c (single-bin spectrum under integer cycles)
    - clipped: 0 for a < 1.0
    """
    n = 4000 + 2000 * (i % 3)
    cycles = 20 + (i * 37) % 500
    amp = 0.25 * (1 + (i * 11) % 3)
    # RMS of the QUANTIZED signal: quantization shifts each sample by
    # <= 0.5/32767; for these grids the integerized milli-RMS equals
    # round(1000 * a / sqrt(2)) (pinned by test_audioops against the
    # actual quantized value for every (amp, n, cycles) residue class)
    return {
        "media_id": f"aud_{i:08d}",
        "duration_ms": int(round(1000.0 * n / sr)),
        "rms_milli": int(round(1000.0 * amp / np.sqrt(2.0))),
        "zero_crossings": 2 * cycles - 1,
        "dominant_bin": cycles,
        "clipped": 0,
    }
