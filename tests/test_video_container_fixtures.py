"""Non-own-writer parity fixtures for the MP4 and WebM demuxers
(VERDICT r7 #2: the video containers were the last writer<->parser
closed loop — audio and images already have external-encoder fixtures).

The OS image ships no externally-muxed .mp4/.webm and no muxer binaries
(searched /usr/share, python test suites; ffmpeg/MP4Box/gstreamer
absent), so these fixtures are HAND-ASSEMBLED here from the published
box/element math of ISO/IEC 14496-12 and the Matroska/EBML spec
(RFC 8794), byte by byte, sharing no code path with ``sources/mp4.py``
/ ``sources/webm.py``.  Independence is structural, not just textual:
every fixture exercises spec features the repo's own muxers NEVER emit,
so a bug shared by writer and parser cannot reproduce these bytes:

- MP4: version-1 (64-bit) mvhd/tkhd/mdhd, ``co64`` chunk offsets,
  constant-size ``stsz`` (sample_size field non-zero), a two-run
  ``stsc`` with uneven chunking, moov-BEFORE-mdat streaming layout, and
  a largesize (size==1, 64-bit) ``mdat`` box.  ``write_mp4`` emits
  version-0 boxes, stco, per-sample stsz, mdat-first, 32-bit sizes.
- WebM: TimestampScale 500000 (0.5 ms/tick), Duration as a 4-byte
  float, track number 2, Void elements interleaved, a non-minimal
  (2-byte) size vint, and keyframes signalled BOTH ways (SimpleBlock
  flag bit AND BlockGroup-without-ReferenceBlock).  ``write_webm``
  emits scale 1e6, 8-byte doubles, track 1, minimal vints, SimpleBlocks
  only.

Every expected number below is derived by hand from the spec fields as
written (comments show the arithmetic), never from running the parser.
"""

import struct

import numpy as np


# ---------------------------------------------------------------------------
# hand-rolled ISO-BMFF assembly (independent of sources/mp4.py's muxer)
# ---------------------------------------------------------------------------

def _b(tag: bytes, payload: bytes) -> bytes:
    # Box: 32-bit size incl. header, fourcc, payload  (14496-12 §4.2)
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _fb(tag: bytes, version: int, payload: bytes) -> bytes:
    # FullBox: version byte + 24-bit flags=0
    return _b(tag, struct.pack(">B3x", version) + payload)


# five samples, constant 7 bytes each, distinct contents
_SAMPLES = [b"SMP" + bytes([0x40 + i] * 4) for i in range(5)]
_TIMESCALE = 90000                    # broadcast convention, ticks/s
# stts: 3 samples of 3000 ticks, then 2 of 4500 -> dts 0,3000,6000,9000,
# 13500; total duration 18000 ticks = 18000/90000 s = 200 ms
_STTS_RUNS = [(3, 3000), (2, 4500)]
_DURATION_TICKS = 18000
# stsc: chunks 1-2 carry 2 samples, chunks 3+ carry 1 -> layout [2,2,1]
# stss: samples 1 and 4 (1-based) are sync
_SYNC_1BASED = [1, 4]


def _mp4_moov(chunk_base: int) -> bytes:
    # stsd: one 86-byte VisualSampleEntry, codec fourcc 'avc1'
    # (SampleEntry: 6 reserved + data_reference_index, then the visual
    # fields; total entry size 8 + 78 = 86, 14496-12 §12.1.3)
    entry = _b(b"avc1", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
    stsd = _fb(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = _fb(b"stts", 0, struct.pack(">I", len(_STTS_RUNS))
               + b"".join(struct.pack(">II", c, d) for c, d in _STTS_RUNS))
    # constant-size stsz: sample_size=7, sample_count=5, NO per-sample
    # table (14496-12 §8.7.3.2) — own muxer never emits this form
    stsz = _fb(b"stsz", 0, struct.pack(">II", 7, len(_SAMPLES)))
    stsc = _fb(b"stsc", 0, struct.pack(">I", 2)
               + struct.pack(">III", 1, 2, 1)
               + struct.pack(">III", 3, 1, 1))
    # 64-bit chunk offsets; chunk1 = samples 0-1 (14 bytes), chunk2 =
    # samples 2-3, chunk3 = sample 4
    co64 = _fb(b"co64", 0, struct.pack(">I", 3)
               + struct.pack(">QQQ", chunk_base, chunk_base + 14,
                             chunk_base + 28))
    stss = _fb(b"stss", 0, struct.pack(">I", len(_SYNC_1BASED))
               + b"".join(struct.pack(">I", k) for k in _SYNC_1BASED))
    stbl = _b(b"stbl", stsd + stts + stsc + stsz + co64 + stss)
    url_ = _fb(b"url ", 0, b"")       # flags should be 1 but parser-moot
    dref = _fb(b"dref", 0, struct.pack(">I", 1) + url_)
    minf = _b(b"minf", _fb(b"vmhd", 0, b"\x00" * 8)
              + _b(b"dinf", dref) + stbl)
    # version-1 mdhd: 64-bit creation/modification, 32-bit timescale,
    # 64-bit duration, then language/pre_defined (§8.4.2)
    mdhd = _fb(b"mdhd", 1, struct.pack(">QQIQ", 0, 0, _TIMESCALE,
                                       _DURATION_TICKS)
               + struct.pack(">HH", 0x55C4, 0))
    hdlr = _fb(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    mdia = _b(b"mdia", mdhd + hdlr + minf)
    # version-1 tkhd: 64-bit times, track_ID=7, 64-bit duration, then
    # 8 reserved + layer/group/volume/reserved (8) + matrix (36) +
    # width/height (8) = 60 trailing bytes (§8.3.2)
    tkhd = _fb(b"tkhd", 1, struct.pack(">QQI4xQ", 0, 0, 7,
                                       _DURATION_TICKS) + b"\x00" * 60)
    trak = _b(b"trak", tkhd + mdia)
    mvhd = _fb(b"mvhd", 1, struct.pack(">QQIQ", 0, 0, _TIMESCALE,
                                       _DURATION_TICKS) + b"\x00" * 80)
    return _b(b"moov", mvhd + trak)


def build_external_style_mp4() -> bytes:
    ftyp = _b(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    # streaming layout: moov BEFORE mdat; mdat uses the largesize form
    # (size field == 1, real 64-bit size follows the fourcc, §4.2)
    moov_len = len(_mp4_moov(0))
    mdat_body_off = len(ftyp) + moov_len + 16
    moov = _mp4_moov(mdat_body_off)
    assert len(moov) == moov_len
    payload = b"".join(_SAMPLES)
    mdat = (struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + len(payload)) + payload)
    return ftyp + moov + mdat


# ---------------------------------------------------------------------------
# hand-rolled EBML/Matroska assembly (independent of sources/webm.py)
# ---------------------------------------------------------------------------

def _vint(value: int, length: int | None = None) -> bytes:
    # EBML data-size coding: length marker bit then value (RFC 8794 §4)
    if length is None:
        length = 1
        while value > (1 << (7 * length)) - 2:
            length += 1
    return ((1 << (7 * length)) | value).to_bytes(length, "big")


def _el(eid: bytes, payload: bytes, size_len: int | None = None) -> bytes:
    return eid + _vint(len(payload), size_len) + payload


def build_external_style_webm() -> bytes:
    head = _el(b"\x1aE\xdf\xa3",                       # EBML header
               _el(b"\x42\x82", b"webm")               # DocType
               + _el(b"\x42\x87", b"\x02")             # DocTypeVersion
               + _el(b"\x42\x85", b"\x02"))
    # Info: TimestampScale 500000 ns/tick (0.5 ms) — a real-muxer value
    # the own writer never uses; Duration 400.0 ticks as FLOAT32 with a
    # deliberately non-minimal 2-byte size vint -> 400*0.5 = 200 ms
    info = _el(b"\x15\x49\xa9\x66",
               _el(b"\x2a\xd7\xb1", (500000).to_bytes(3, "big"))
               + _el(b"\x44\x89", struct.pack(">f", 400.0), size_len=2))
    video = _el(b"\xe0", _el(b"\xb0", b"\x01\x40")     # 320
                + _el(b"\xba", b"\x00\xf0"))           # 240
    entry = _el(b"\xae",
                _el(b"\xd7", b"\x02")                  # TrackNumber 2
                + _el(b"\x73\xc5", b"\x02")            # TrackUID
                + _el(b"\x83", b"\x01")                # type video
                + _el(b"\x86", b"V_VP8") + video)
    tracks = _el(b"\x16\x54\xae\x6b", entry)
    void = _el(b"\xec", b"\x00" * 11)                  # skipped filler

    def blk(rel: int, flags: int, body: bytes) -> bytes:
        # (Simple)Block: track vint, int16 relative ts, flags, frame
        return _vint(2) + struct.pack(">h", rel) + bytes([flags]) + body

    f0, f1, f2, f3 = (bytes([0xA0 + i]) * (5 + i) for i in range(4))
    # cluster 1 at tick 0: keyframe SimpleBlock (flag 0x80) at rel 0
    # (-> 0 ms) + non-key BlockGroup (HAS ReferenceBlock) at rel 40
    # (-> 40*0.5 = 20 ms)
    c1 = _el(b"\x1f\x43\xb6\x75",
             _el(b"\xe7", b"\x00")
             + _el(b"\xa3", blk(0, 0x80, f0))
             + _el(b"\xa0", _el(b"\xa1", blk(40, 0x00, f1))
                   + _el(b"\xfb", b"\xd8")))           # ReferenceBlock
    # cluster 2 at tick 100 (= 50 ms): key BlockGroup (NO ReferenceBlock)
    # at rel 0 (-> 50 ms) + non-key SimpleBlock at rel 60 (-> 80 ms)
    c2 = _el(b"\x1f\x43\xb6\x75",
             _el(b"\xe7", b"\x64")
             + _el(b"\xa0", _el(b"\xa1", blk(0, 0x00, f2)))
             + _el(b"\xa3", blk(60, 0x00, f3)))
    segment = _el(b"\x18\x53\x80\x67", void + info + tracks + c1 + c2)
    return head + segment


# ---------------------------------------------------------------------------
# parser parity against the hand-derived expectations
# ---------------------------------------------------------------------------

class TestHandAssembledMp4:
    def test_tables_and_samples(self):
        from rasterframes_spark.sources.mp4 import (
            extract_sample, read_mp4_info)

        data = build_external_style_mp4()
        info = read_mp4_info(data)
        assert info.brand == "mp42"
        assert info.timescale == _TIMESCALE
        assert info.duration == _DURATION_TICKS
        (t,) = info.video_tracks
        assert (t.track_id, t.handler, t.fourcc) == (7, "vide", "avc1")
        assert t.timescale == _TIMESCALE
        assert t.duration_ms == 200.0
        # constant-size stsz expands to five 7-byte samples
        assert t.sizes.tolist() == [7] * 5
        # stts runs: dts = 0,3000,6000,9000,13500 ticks
        assert t.dts.tolist() == [0, 3000, 6000, 9000, 13500]
        # stss: samples 1 and 4 (1-based)
        assert t.sync.tolist() == [True, False, False, True, False]
        # co64 + 2-run stsc chunking [2,2,1]: consecutive within chunks
        base = int(t.offsets[0])
        assert t.offsets.tolist() == [base, base + 7, base + 14,
                                      base + 21, base + 28]
        for i, want in enumerate(_SAMPLES):
            assert extract_sample(data, t, i) == want

    def test_demux_tick_sampling(self):
        from rasterframes_spark.sources.mp4 import (
            read_mp4_info, sample_indices_at)

        t = read_mp4_info(build_external_style_mp4()).video_tracks[0]
        # ts_ms = 0, 33.3, 66.7, 100, 150; ticks at 0 and 100 ms both
        # land on sync samples (0 and 3) with keyframes_only
        assert sample_indices_at(t, 100, keyframes_only=True) == \
            [(0, 0), (100, 3)]

    def test_through_spark_operators(self, spark):
        from rasterframes_spark.pipeline.multimodal import (
            demux_video_samples, video_metadata)

        df = spark.createDataFrame(
            [(1, bytearray(build_external_style_mp4()))],
            "media_id long, payload binary")
        (m,) = video_metadata(df).collect()
        assert (m.track_id, m.fourcc, m.timescale) == (7, "avc1", 90000)
        assert (m.duration_ms, m.n_samples, m.n_keyframes,
                m.total_bytes) == (200.0, 5, 2, 35)
        rows = demux_video_samples(df, every_ms=100).collect()
        assert [(r.ts_ms, r.sample_idx, r.is_sync) for r in rows] == \
            [(0, 0, True), (100, 3, True)]
        assert bytes(rows[1].sample) == _SAMPLES[3]


class TestHandAssembledWebm:
    def test_elements_and_frames(self):
        from rasterframes_spark.sources.webm import (
            extract_frame, read_webm_info)

        data = build_external_style_webm()
        info = read_webm_info(data)
        assert info.timescale_ns == 500000
        assert info.duration_ms == 200.0          # 400 ticks * 0.5 ms
        (t,) = info.video_tracks
        assert (t.number, t.codec_id) == (2, "V_VP8")
        assert (t.width, t.height) == (320, 240)
        # rel ticks 0/40 in cluster@0 and 0/60 in cluster@100 at
        # 0.5 ms/tick -> 0, 20, 50, 80 ms
        assert t.ts_ms_arr.tolist() == [0.0, 20.0, 50.0, 80.0]
        # key via SimpleBlock flag, non-key via ReferenceBlock, key via
        # BlockGroup-without-ReferenceBlock, non-key via flag
        assert t.sync.tolist() == [True, False, True, False]
        assert t.sizes.tolist() == [5, 6, 7, 8]
        assert extract_frame(data, t, 2) == b"\xa2" * 7

    def test_through_spark_operators(self, spark):
        from rasterframes_spark.pipeline.multimodal import (
            demux_video_samples, video_metadata)

        df = spark.createDataFrame(
            [(9, bytearray(build_external_style_webm()))],
            "media_id long, payload binary")
        (m,) = video_metadata(df).collect()
        # 1e9 / 500000 ns = 2000 ticks/s
        assert (m.track_id, m.fourcc, m.timescale) == (2, "V_VP8", 2000)
        assert (m.duration_ms, m.n_samples, m.n_keyframes,
                m.total_bytes) == (200.0, 4, 2, 26)
        rows = demux_video_samples(df, every_ms=100).collect()
        # tick 0 -> frame 0 (key); tick 100 ms -> frame 3 (80 ms,
        # non-key) snaps back to key frame 2 (50 ms)
        assert [(r.ts_ms, r.sample_idx, r.is_sync) for r in rows] == \
            [(0, 0, True), (100, 2, True)]
        assert bytes(rows[1].sample) == b"\xa2" * 7


def test_own_muxers_cannot_produce_these_features():
    """Pin the structural independence claim: the fixture bytes use box/
    element forms absent from the repo's own muxer output, so a shared
    writer/parser defect cannot fabricate agreement here."""
    from rasterframes_spark.sources.mp4 import write_mp4
    from rasterframes_spark.sources.webm import write_webm

    own_mp4 = write_mp4(_SAMPLES, [3000] * 5, timescale=90000,
                        sync=[True, False, False, True, False])
    ext_mp4 = build_external_style_mp4()
    assert b"co64" in ext_mp4 and b"co64" not in own_mp4
    assert b"stco" not in ext_mp4
    # largesize mdat (size field == 1) only in the hand-built file
    assert ext_mp4.find(struct.pack(">I", 1) + b"mdat") >= 0
    assert own_mp4.find(struct.pack(">I", 1) + b"mdat") < 0
    # moov-first vs mdat-first
    assert ext_mp4.find(b"moov") < ext_mp4.find(b"mdat")
    assert own_mp4.find(b"mdat") < own_mp4.find(b"moov")

    own_webm = write_webm([b"x" * 5], [0])
    ext_webm = build_external_style_webm()
    # non-default TimestampScale only in the hand-built file; own muxer
    # always writes 1e6 ns/tick and SimpleBlocks only (no BlockGroups)
    assert (500000).to_bytes(3, "big") in ext_webm
    assert (1000000).to_bytes(3, "big") in own_webm
    assert _el(b"\xa1", b"")[:1] == b"\xa1"   # Block id spelled by hand
