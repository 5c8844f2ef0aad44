"""WebM / Matroska demuxer + muxer.

The reference has no video-container story at all; this is the training-
data-pipeline mandate's second container beside MP4 (SURVEY §2.14).
Round-trips go through the module's own minimal muxer; structural cases
the muxer never emits (BlockGroup/ReferenceBlock, laced SimpleBlocks,
unknown-size elements) are hand-built from the EBML spec with the
module's low-level element helpers.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from rasterframes_spark.sources.webm import (
    WebmTrack, _CLUSTER, _CLUSTER_TS, _elem, _enc_vint, _uelem,
    _BLOCK, _BLOCK_GROUP, _REFERENCE_BLOCK, _SEGMENT, _SIMPLE_BLOCK,
    extract_frame, read_webm_info, sample_indices_at, write_webm)


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return [bytes(rng.integers(0, 256, rng.integers(5, 40)).astype("u1"))
            for _ in range(n)]


def test_mux_demux_roundtrip_across_clusters():
    frames = _frames(9)
    ts = [0, 333, 666, 1000, 1333, 1666, 2000, 2333, 2666]
    sync = [True, False, False, True, False, False, True, False, False]
    data = write_webm(frames, ts, sync, codec_id="V_VP8",
                      width=320, height=240, cluster_every_ms=1000)
    info = read_webm_info(data)
    assert info.timescale_ns == 1_000_000
    assert info.laced_blocks_skipped == 0
    (t,) = info.video_tracks
    assert (t.codec_id, t.width, t.height) == ("V_VP8", 320, 240)
    assert t.n_samples == 9
    np.testing.assert_array_equal(t.ts_ms_arr, np.array(ts, dtype="f8"))
    np.testing.assert_array_equal(t.sync, np.array(sync))
    for i, f in enumerate(frames):
        assert extract_frame(data, t, i) == f


def test_duration_from_info_and_fallback():
    data = write_webm(_frames(3), [0, 100, 200])
    assert read_webm_info(data).duration_ms == pytest.approx(201.0)
    # strip the Duration element: falls back to the last frame timestamp
    pos = data.index(struct.pack(">d", 201.0))
    stripped = data[:pos - 3] + data[pos + 8:]
    # fix the Segment/Info sizes by re-muxing instead: simpler — build a
    # file whose Info omits Duration via the muxer's own pieces
    seg_body = (_elem(0x1549A966, _uelem(0x2AD7B1, 1_000_000))
                + data[data.index(b"\x16\x54\xae\x6b"):])
    # the Tracks..Clusters tail reuses the original bytes
    ebml_end = data.index(b"\x18\x53\x80\x67")
    rebuilt = data[:ebml_end] + _elem(_SEGMENT, seg_body)
    info = read_webm_info(rebuilt)
    assert info.duration_ms == pytest.approx(200.0)
    assert stripped  # silence the unused intermediate


def test_blockgroup_referenceblock_keyframe_semantics():
    """A Block inside a BlockGroup is a keyframe iff the group has no
    ReferenceBlock (Matroska semantics; Block itself has no key bit)."""
    f0, f1 = b"KEYFRAME", b"DELTAFRM"

    def block(ts_rel, payload):
        return _elem(_BLOCK, _enc_vint(1) + struct.pack(">h", ts_rel)
                     + b"\x00" + payload)

    bg_key = _elem(_BLOCK_GROUP, block(0, f0))
    bg_delta = _elem(_BLOCK_GROUP,
                     block(40, f1) + _elem(_REFERENCE_BLOCK, b"\xd8"))
    cluster = _elem(_CLUSTER, _uelem(_CLUSTER_TS, 0) + bg_key + bg_delta)
    base = write_webm([b"x"], [0])
    head = base[:base.index(b"\x1f\x43\xb6\x75", base.index(b"\x18\x53\x80\x67"))]
    # rebuild: EBML + Segment(Info+Tracks from the muxer, our cluster)
    ebml_end = base.index(b"\x18\x53\x80\x67")
    seg_start = ebml_end + 4
    _, seg_body_start = _read_vint_public(base, seg_start)
    inner = base[seg_body_start:base.index(b"\x1f\x43\xb6\x75")]
    data = base[:ebml_end] + _elem(_SEGMENT, inner + cluster)
    info = read_webm_info(data)
    (t,) = info.video_tracks
    assert t.n_samples == 2
    np.testing.assert_array_equal(t.sync, [True, False])
    assert extract_frame(data, t, 0) == f0
    assert extract_frame(data, t, 1) == f1


def _read_vint_public(data, off):
    from rasterframes_spark.sources.webm import _read_vint

    return _read_vint(data, off, keep_marker=False)


def test_laced_blocks_skipped_not_misparsed():
    base = write_webm(_frames(2), [0, 40])
    # hand-build a laced SimpleBlock (flags bit 0x06 = EBML lacing) and
    # append it inside a new cluster
    laced = _elem(_SIMPLE_BLOCK,
                  _enc_vint(1) + struct.pack(">h", 0) + b"\x86"
                  + b"\x02" + b"\x83" + b"\x81" + b"abcdefgh")
    cluster = _elem(_CLUSTER, _uelem(_CLUSTER_TS, 2000) + laced)
    ebml_end = base.index(b"\x18\x53\x80\x67")
    _, seg_body_start = _read_vint_public(base, ebml_end + 4)
    inner = base[seg_body_start:]
    data = base[:ebml_end] + _elem(_SEGMENT, inner + cluster)
    info = read_webm_info(data)
    assert info.laced_blocks_skipped == 1
    assert info.video_tracks[0].n_samples == 2  # laced one not misparsed


def test_sample_indices_keyframe_snapping():
    t = WebmTrack(1, 1, "V_VP9")
    t.ts_ms_arr = np.array([0.0, 400.0, 800.0, 1200.0, 1600.0])
    t.sync = np.array([True, False, False, True, False])
    t.offsets = np.zeros(5, dtype=np.int64)
    t.sizes = np.ones(5, dtype=np.int64)
    picks = sample_indices_at(t, 500, keyframes_only=True,
                              duration_ms=2000.0)
    assert picks == [(0, 0), (500, 0), (1000, 0), (1500, 3)]
    picks_all = sample_indices_at(t, 500, keyframes_only=False,
                                  duration_ms=2000.0)
    assert picks_all == [(0, 0), (500, 1), (1000, 2), (1500, 3)]


def test_malformed_inputs_raise():
    good = write_webm(_frames(2), [0, 40])
    for bad in (b"", b"\x1aE\xdf", b"\x00" * 40,
                good[:20],                       # truncated mid-element
                good[:-3]):                      # last block cut short
        with pytest.raises(ValueError):
            read_webm_info(bad)
    # unknown-size element (all value bits set) is rejected, not hung
    unk = good[:4] + b"\xff" + good[5:]
    with pytest.raises(ValueError):
        read_webm_info(unk)


def test_relative_timestamp_overflow_raises():
    with pytest.raises(ValueError, match="relative timestamp"):
        write_webm([b"a"], [40000], cluster_every_ms=100000)


def test_video_operators_dispatch_webm_and_mp4(spark):
    from rasterframes_spark.pipeline.multimodal import (
        demux_video_samples, video_metadata)
    from rasterframes_spark.sources.mp4 import write_mp4

    frames = _frames(6, seed=3)
    ts = [0, 500, 1000, 1500, 2000, 2500]
    sync = [True, False, True, False, True, False]
    wm = write_webm(frames, ts, sync, codec_id="V_VP9",
                    width=640, height=360)
    mp = write_mp4(frames, durations=[500] * 6, timescale=1000,
                   fourcc=b"vp09", sync=sync)
    df = spark.createDataFrame(
        [(1, bytearray(wm)), (2, bytearray(mp)), (3, b"notavideo")],
        "media_id long, payload binary")
    meta = {r.media_id: r for r in video_metadata(df).collect()}
    assert set(meta) == {1, 2}
    assert meta[1].fourcc == "V_VP9" and meta[2].fourcc == "vp09"
    assert meta[1].n_samples == 6 and meta[1].n_keyframes == 3
    assert meta[1].timescale == 1000
    assert meta[1].duration_ms == pytest.approx(2501.0)
    assert meta[1].total_bytes == sum(len(f) for f in frames)

    got = demux_video_samples(df, every_ms=1000, keyframes_only=True)
    rows = [r for r in got.collect() if r.media_id == 1]
    # ticks 0,1000,2000 -> samples 0,2,4 (all keyframes)
    assert [(r.ts_ms, r.sample_idx, bool(r.is_sync)) for r in rows] == \
        [(0, 0, True), (1000, 2, True), (2000, 4, True)]
    for r in rows:
        assert bytes(r.sample) == frames[r.sample_idx]
