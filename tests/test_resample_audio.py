"""resample_audio: rate normalization over decoded sample buffers."""
from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from rasterframes_spark.pipeline.audio import (
    audio_features, decode_audio, encode_wav, resample_audio)


def _decoded(spark, waves_rates):
    rows = [(i, bytearray(encode_wav(x, r, bits=64, fmt="float")))
            for i, (x, r) in enumerate(waves_rates)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return decode_audio(df, decode="wav")


def test_same_rate_passthrough_bytes(spark):
    x = np.sin(np.linspace(0, 20, 1000))
    d = _decoded(spark, [(x, 8000)])
    out = resample_audio(d, 8000).collect()[0]
    assert out.sample_rate == 8000 and out.n_samples == 1000
    np.testing.assert_array_equal(
        np.frombuffer(bytes(out.samples), "<f8"), x)


def test_integer_downsample_picks_exact_samples(spark):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(801)
    d = _decoded(spark, [(x, 16000)])
    out = resample_audio(d, 8000).collect()[0]
    y = np.frombuffer(bytes(out.samples), "<f8")
    assert out.n_samples == len(y) == 401  # (801-1)*8000//16000 + 1
    np.testing.assert_array_equal(y, x[::2])


@pytest.mark.parametrize("orig,target", [(8000, 12000), (44100, 16000),
                                         (8000, 11025)])
def test_linear_matches_manual_interp(spark, orig, target):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(700)
    d = _decoded(spark, [(x, orig)])
    out = resample_audio(d, target).collect()[0]
    y = np.frombuffer(bytes(out.samples), "<f8")
    m = (len(x) - 1) * target // orig + 1
    pos = (np.arange(m, dtype=np.int64) * orig) / float(target)
    i = np.minimum(np.floor(pos).astype(np.int64), len(x) - 2)
    frac = pos - i
    exp = x[i] + frac * (x[i + 1] - x[i])
    assert out.sample_rate == target and len(y) == m
    np.testing.assert_array_equal(y, exp)  # bit-exact, same op order
    assert pos[-1] <= len(x) - 1 + 1e-9    # never extrapolates


def test_nearest_method(spark):
    x = np.arange(10, dtype="f8")
    d = _decoded(spark, [(x, 8000)])
    out = resample_audio(d, 4000, method="nearest").collect()[0]
    y = np.frombuffer(bytes(out.samples), "<f8")
    np.testing.assert_array_equal(y, x[np.minimum(
        np.rint((np.arange(5, dtype=np.int64) * 8000) / 4000.0)
        .astype(int), 9)])


def test_features_after_resample(spark):
    """Upsampled sine keeps its RMS (~a/sqrt(2)) and scales duration."""
    k = np.arange(4000)
    x = 0.5 * np.sin(2 * np.pi * 440.0 * k / 8000.0)
    d = _decoded(spark, [(x, 8000)])
    rs = resample_audio(d, 12000)
    f = audio_features(rs).collect()[0]
    m = (4000 - 1) * 12000 // 8000 + 1
    assert f.duration_ms == pytest.approx(m * 1000.0 / 12000.0)
    # linear interp attenuates slightly (sinc^2 rolloff): rms lands just
    # below a/sqrt(2), never above
    assert 0.97 * 0.5 / np.sqrt(2) < f.rms <= 0.5 / np.sqrt(2) + 1e-9


def test_mixed_rates_one_pass(spark):
    """Clips at heterogeneous rates normalize in one operator call —
    the actual corpus shape."""
    rng = np.random.default_rng(3)
    d = _decoded(spark, [(rng.standard_normal(500), 8000),
                         (rng.standard_normal(500), 16000),
                         (rng.standard_normal(500), 22050)])
    out = resample_audio(d, 16000)
    rates = {r.media_id: r.sample_rate for r in out.collect()}
    assert rates == {0: 16000, 1: 16000, 2: 16000}


def test_bad_args_raise(spark):
    d = _decoded(spark, [(np.zeros(10), 8000)])
    with pytest.raises(ValueError, match="method"):
        resample_audio(d, 8000, method="sinc")
    with pytest.raises(ValueError, match="positive"):
        resample_audio(d, 0)


def test_corrupt_rate_dropped_empty_stamped(spark):
    """rate<=0 rows drop; empty buffers come out stamped at the target
    rate — the output really is uniform (found by review)."""
    from rasterframes_spark.pipeline.audio import resample_audio

    rows = [(0, 0, 1, 0, b""),               # corrupt rate: dropped
            (1, 44100, 1, 0, b""),           # empty: stamped at target
            (2, 8000, 1, 4, np.arange(4, dtype="<f8").tobytes())]
    df = spark.createDataFrame(
        rows, "media_id long, sample_rate int, channels int, "
              "n_samples long, samples binary")
    out = {r.media_id: r for r in resample_audio(df, 16000).collect()}
    assert 0 not in out
    assert out[1].sample_rate == 16000 and out[1].n_samples == 0
    assert out[2].sample_rate == 16000
    assert {r.sample_rate for r in out.values()} == {16000}
