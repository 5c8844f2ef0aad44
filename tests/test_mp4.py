"""MP4 / ISO-BMFF demuxer tests: mux->demux round-trips over every sample
table (stts/stsz/stsc/stco/co64/stss), keyframe-aligned sampling, fuzz,
and the Spark demux operators."""
from __future__ import annotations

import random
import signal
import struct

import numpy as np
import pytest

from rasterframes_spark.sources import mp4


def _clip(n=17, seed=0, spc=3):
    rng = np.random.default_rng(seed)
    samples = [rng.integers(0, 256, int(rng.integers(20, 200)))
               .astype(np.uint8).tobytes() for _ in range(n)]
    durs = [33] * (n // 2) + [40] * (n - n // 2)
    sync = [i % 5 == 0 for i in range(n)]
    return samples, durs, sync, mp4.write_mp4(
        samples, durs, timescale=1000, sync=sync, samples_per_chunk=spc)


def test_roundtrip_sample_tables():
    samples, durs, sync, buf = _clip()
    info = mp4.read_mp4_info(buf)
    assert info.brand == "isom"
    (t,) = info.video_tracks
    assert (t.handler, t.fourcc, t.n_samples) == ("vide", "rfs1", 17)
    assert t.duration_ms == float(sum(durs))
    for i, s in enumerate(samples):
        assert mp4.extract_sample(buf, t, i) == s
    assert list(t.sync) == sync
    assert np.array_equal(t.dts, np.concatenate(([0], np.cumsum(durs[:-1]))))


@pytest.mark.parametrize("n,spc", [(1, 5), (3, 3), (7, 3), (12, 4), (5, 1)])
def test_chunking_shapes(n, spc):
    """stsc run expansion: exact multiples, trailing partial chunks, and
    one-sample-per-chunk all place samples at the right offsets."""
    samples, durs, sync, buf = _clip(n=n, seed=n, spc=spc)
    (t,) = mp4.read_mp4_info(buf).video_tracks
    for i, s in enumerate(samples):
        assert mp4.extract_sample(buf, t, i) == s


def test_co64_chunk_offsets():
    """64-bit chunk offsets parse identically to stco (unit level: the
    writer emits stco; patch the table into co64 form)."""
    samples, durs, sync, buf = _clip(n=6, spc=2)
    (t0,) = mp4.read_mp4_info(buf).video_tracks
    # rebuild the stbl with a co64 box carrying the same offsets
    i = buf.index(b"stco") - 4
    (size,) = struct.unpack_from(">I", buf, i)
    (cnt,) = struct.unpack_from(">I", buf, i + 12)
    offs = struct.unpack_from(f">{cnt}I", buf, i + 16)
    co64 = (struct.pack(">I", 16 + 8 * cnt) + b"co64" + b"\x00" * 4
            + struct.pack(">I", cnt)
            + b"".join(struct.pack(">Q", o) for o in offs))
    delta = len(co64) - size
    patched = bytearray(buf[:i] + co64 + buf[i + size:])
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov all grow by delta)
    for cc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = patched.index(cc) - 4
        (s,) = struct.unpack_from(">I", patched, j)
        struct.pack_into(">I", patched, j, s + delta)
    (t,) = mp4.read_mp4_info(bytes(patched)).video_tracks
    assert np.array_equal(t.offsets, t0.offsets)
    assert mp4.extract_sample(bytes(patched), t, 5) == \
        mp4.extract_sample(buf, t0, 5)


def test_sampling_and_keyframe_snap():
    _, durs, sync, buf = _clip()
    (t,) = mp4.read_mp4_info(buf).video_tracks
    picks = mp4.sample_indices_at(t, 100)
    ts = t.ts_ms()
    for tick, i in picks:
        assert ts[i] <= tick
        assert i + 1 == t.n_samples or ts[i + 1] > tick
    kf = mp4.sample_indices_at(t, 100, keyframes_only=True)
    assert all(bool(t.sync[i]) for _, i in kf)
    # the keyframe pick is the latest sync sample at-or-before the plain pick
    for (tick, pi), (_, ki) in zip(picks, kf):
        assert ki <= pi
        assert not any(t.sync[ki + 1:pi + 1])


def test_malformed_tables_raise():
    samples, durs, sync, buf = _clip(n=4, spc=2)
    # truncate mid-mdat: sample extents fall outside the file
    with pytest.raises(ValueError):
        t = mp4.read_mp4_info(buf[: len(buf) // 3])
    # stsz claiming more samples than stts covers
    i = buf.index(b"stsz") - 4
    bad = bytearray(buf)
    struct.pack_into(">I", bad, i + 16, 4000)     # sample count
    with pytest.raises(ValueError):
        mp4.read_mp4_info(bytes(bad))


def test_corruption_fuzz():
    *_, buf = _clip()

    def on_alarm(sig, frm):
        raise AssertionError("demuxer hung on corrupted input")

    old = signal.signal(signal.SIGALRM, on_alarm)
    try:
        random.seed(1)
        for _ in range(300):
            b = bytearray(buf)
            for _ in range(random.randint(1, 4)):
                b[random.randrange(0, len(b))] = random.randrange(256)
            signal.alarm(10)
            try:
                info = mp4.read_mp4_info(bytes(b))
                for t in info.video_tracks:
                    for i in range(t.n_samples):
                        mp4.extract_sample(bytes(b), t, i)
                    mp4.sample_indices_at(t, 50, keyframes_only=True)
            except ValueError:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_spark_video_metadata_and_demux(spark):
    from rasterframes_spark.pipeline.multimodal import (
        demux_video_samples, video_metadata)

    s1, d1, k1, clip1 = _clip(n=12, seed=1)
    s2, d2, k2, clip2 = _clip(n=5, seed=2, spc=2)
    df = spark.createDataFrame(
        [(1, bytearray(clip1)), (2, bytearray(clip2)),
         (3, bytearray(b"not-an-mp4-payload"))],
        "media_id long, payload binary")
    meta = {r["media_id"]: r for r in video_metadata(df).collect()}
    assert set(meta) == {1, 2}                    # corrupt row dropped
    assert meta[1]["n_samples"] == 12 and meta[1]["fourcc"] == "rfs1"
    assert meta[2]["n_keyframes"] == sum(k2)
    out = demux_video_samples(df, every_ms=100, keyframes_only=True).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {1, 2}
    for r in by_id[1]:
        assert r["is_sync"]
        assert bytes(r["sample"]) == s1[r["sample_idx"]]
