"""Pure-python WebM / Matroska (EBML) container demuxer and muxer.

Completes the video-container story beside ``sources/mp4.py``: EBML
varint parsing, Segment/Info/Tracks walk (timestamp scale, duration,
codec ids, video dims, audio rate), and Cluster/SimpleBlock frame
extraction with absolute timestamps and keyframe flags. Codec payloads
(VP8/VP9/AV1/Opus bitstreams) stay opaque — the demux layer is the cheap
CPU stage; pixel/sample decode belongs downstream. Laced blocks (audio
micro-frame packing) are skipped and counted rather than mis-parsed.

A minimal muxer emits spec-shaped files for round-trip testing.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# element ids (with marker bits, as they appear in the stream)
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_AUDIO = 0xE1
_SAMP_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB

_MAX_ELEMENTS = 1 << 22


def _read_vint(data: bytes, off: int, keep_marker: bool):
    """EBML varint at off -> (value, next_off)."""
    if off >= len(data):
        raise ValueError("webm: truncated varint")
    first = data[off]
    if first == 0:
        raise ValueError("webm: invalid varint lead byte")
    length = 9 - first.bit_length()
    if off + length > len(data):
        raise ValueError("webm: truncated varint body")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | data[off + i]
    return v, off + length


def _iter_elements(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end)."""
    off = start
    count = 0
    while off < end:
        eid, off = _read_vint(data, off, keep_marker=True)
        size, off = _read_vint(data, off, keep_marker=False)
        # "unknown size" (all value bits set, used by live streams) is not
        # supported — a bounded batch file always carries explicit sizes
        body_end = off + size
        if body_end > end:
            raise ValueError("webm: element overruns container")
        yield eid, off, body_end
        off = body_end
        count += 1
        if count > _MAX_ELEMENTS:
            raise ValueError("webm: element count exceeds sanity cap")


def _uint(data: bytes, s: int, e: int) -> int:
    v = 0
    for i in range(s, e):
        v = (v << 8) | data[i]
    return v


def _float(data: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", data[s:e])[0]
    if n == 8:
        return struct.unpack(">d", data[s:e])[0]
    if n == 0:
        return 0.0
    raise ValueError("webm: bad float element size")


@dataclass
class WebmTrack:
    number: int
    type: int                 # 1 = video, 2 = audio
    codec_id: str
    width: int = 0
    height: int = 0
    sample_rate: float = 0.0
    channels: int = 0
    # parallel per-frame arrays, filled by read_webm_info
    ts_ms_arr: np.ndarray = field(default_factory=lambda: np.empty(0))
    sync: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=bool))
    offsets: np.ndarray = field(default_factory=lambda: np.empty(0,
                                                                 dtype=np.int64))
    sizes: np.ndarray = field(default_factory=lambda: np.empty(0,
                                                               dtype=np.int64))

    @property
    def n_samples(self) -> int:
        return len(self.sizes)

    @property
    def handler(self) -> str:
        return {1: "vide", 2: "soun"}.get(self.type, "????")


@dataclass
class WebmInfo:
    timescale_ns: int
    duration_ms: float
    tracks: list = field(default_factory=list)
    laced_blocks_skipped: int = 0

    @property
    def video_tracks(self):
        return [t for t in self.tracks if t.type == 1]


def _parse_track_entry(data: bytes, s: int, e: int) -> WebmTrack:
    t = WebmTrack(0, 0, "")
    for eid, bs, be in _iter_elements(data, s, e):
        if eid == _TRACK_NUMBER:
            t.number = _uint(data, bs, be)
        elif eid == _TRACK_TYPE:
            t.type = _uint(data, bs, be)
        elif eid == _CODEC_ID:
            t.codec_id = data[bs:be].decode("latin1")
        elif eid == _VIDEO:
            for e2, s3, e3 in _iter_elements(data, bs, be):
                if e2 == _PIX_W:
                    t.width = _uint(data, s3, e3)
                elif e2 == _PIX_H:
                    t.height = _uint(data, s3, e3)
        elif eid == _AUDIO:
            for e2, s3, e3 in _iter_elements(data, bs, be):
                if e2 == _SAMP_FREQ:
                    t.sample_rate = _float(data, s3, e3)
                elif e2 == _CHANNELS:
                    t.channels = _uint(data, s3, e3)
    return t


def _parse_block(data: bytes, s: int, e: int, cluster_ts: int,
                 frames: dict, skipped: list, force_key: bool | None = None):
    track_no, p = _read_vint(data, s, keep_marker=False)
    if p + 3 > e:
        raise ValueError("webm: truncated block header")
    rel = struct.unpack(">h", data[p:p + 2])[0]
    flags = data[p + 2]
    if flags & 0x06:                   # laced: skip, don't mis-parse
        skipped[0] += 1
        return
    key = bool(flags & 0x80) if force_key is None else force_key
    body_start = p + 3
    frames.setdefault(track_no, []).append(
        (cluster_ts + rel, key, body_start, e - body_start))


def read_webm_info(data: bytes) -> WebmInfo:
    if len(data) < 8:
        raise ValueError("webm: too short")
    seg = None
    saw_ebml = False
    for eid, s, e in _iter_elements(data, 0, len(data)):
        if eid == _EBML:
            saw_ebml = True
        elif eid == _SEGMENT:
            seg = (s, e)
    if not saw_ebml or seg is None:
        raise ValueError("webm: missing EBML header or Segment")
    timescale_ns = 1_000_000
    duration_ticks = 0.0
    tracks: list[WebmTrack] = []
    frames: dict[int, list] = {}
    skipped = [0]
    for eid, s, e in _iter_elements(data, *seg):
        if eid == _INFO:
            for e2, s2, e2e in _iter_elements(data, s, e):
                if e2 == _TS_SCALE:
                    timescale_ns = _uint(data, s2, e2e)
                elif e2 == _DURATION:
                    duration_ticks = _float(data, s2, e2e)
        elif eid == _TRACKS:
            for e2, s2, e2e in _iter_elements(data, s, e):
                if e2 == _TRACK_ENTRY:
                    tracks.append(_parse_track_entry(data, s2, e2e))
        elif eid == _CLUSTER:
            cluster_ts = 0
            for e2, s2, e2e in _iter_elements(data, s, e):
                if e2 == _CLUSTER_TS:
                    cluster_ts = _uint(data, s2, e2e)
                elif e2 == _SIMPLE_BLOCK:
                    _parse_block(data, s2, e2e, cluster_ts, frames, skipped)
                elif e2 == _BLOCK_GROUP:
                    # Block (vs SimpleBlock) has no keyframe flag bit;
                    # a frame is a keyframe iff its BlockGroup carries NO
                    # ReferenceBlock (Matroska: ReferenceBlock lists the
                    # frames this one predicts from)
                    members = list(_iter_elements(data, s2, e2e))
                    has_ref = any(e3 == _REFERENCE_BLOCK
                                  for e3, _, _ in members)
                    for e3, s3, e3e in members:
                        if e3 == _BLOCK:
                            _parse_block(data, s3, e3e, cluster_ts, frames,
                                         skipped, force_key=not has_ref)
    if timescale_ns <= 0:
        raise ValueError("webm: bad timestamp scale")
    ms_per_tick = timescale_ns / 1e6
    for t in tracks:
        fl = sorted(frames.get(t.number, []))
        t.ts_ms_arr = np.array([f[0] * ms_per_tick for f in fl])
        t.sync = np.array([f[1] for f in fl], dtype=bool)
        t.offsets = np.array([f[2] for f in fl], dtype=np.int64)
        t.sizes = np.array([f[3] for f in fl], dtype=np.int64)
    dur_ms = duration_ticks * ms_per_tick
    if dur_ms == 0:
        best = 0.0
        for t in tracks:
            if len(t.ts_ms_arr):
                best = max(best, float(t.ts_ms_arr[-1]))
        dur_ms = best
    return WebmInfo(timescale_ns, dur_ms, tracks, skipped[0])


def extract_frame(data: bytes, track: WebmTrack, idx: int) -> bytes:
    if not 0 <= idx < track.n_samples:
        raise ValueError(f"webm: frame index {idx} out of range")
    o, s = int(track.offsets[idx]), int(track.sizes[idx])
    return data[o:o + s]


def sample_indices_at(track: WebmTrack, every_ms: int,
                      keyframes_only: bool = False,
                      duration_ms: float = 0.0) -> list[tuple[int, int]]:
    """Same signature and tick-sampling contract as
    ``mp4.sample_indices_at`` so the demux operator dispatches uniformly;
    pass ``duration_ms`` from WebmInfo when the track outlives its last
    frame timestamp."""
    if track.n_samples == 0:
        return []
    ts = track.ts_ms_arr
    dur = duration_ms or float(ts[-1]) + 1
    sync_idx = np.flatnonzero(track.sync)
    out = []
    for t in range(0, int(dur), max(every_ms, 1)):
        i = max(int(np.searchsorted(ts, t, side="right") - 1), 0)
        if keyframes_only and not track.sync[i] and len(sync_idx):
            j = sync_idx[sync_idx <= i]
            i = int(j[-1]) if len(j) else i
        out.append((t, i))
    return out


# ---------------------------------------------------------------------------
# muxer (round-trip fixtures)
# ---------------------------------------------------------------------------


def _enc_vint(v: int, keep_marker: bool = False) -> bytes:
    if keep_marker:               # element ids are stored verbatim
        n = (v.bit_length() + 7) // 8
        return v.to_bytes(n, "big")
    n = 1
    while v >= (1 << (7 * n)) - 1:
        n += 1
    return ((1 << (7 * n)) | v).to_bytes(n, "big")


def _elem(eid: int, payload: bytes) -> bytes:
    return _enc_vint(eid, keep_marker=True) + _enc_vint(len(payload)) + payload


def _uelem(eid: int, v: int) -> bytes:
    n = max((v.bit_length() + 7) // 8, 1)
    return _elem(eid, v.to_bytes(n, "big"))


def write_webm(frames: list[bytes], ts_ms: list[int],
               sync: list[bool] | None = None, codec_id: str = "V_VP9",
               width: int = 640, height: int = 360,
               cluster_every_ms: int = 1000) -> bytes:
    """Mux opaque frames into a minimal WebM file: EBML header + Segment
    (Info + Tracks + Clusters of SimpleBlocks). Timestamp scale 1 ms."""
    if len(frames) != len(ts_ms) or not frames:
        raise ValueError("write_webm: need >=1 frame and matching ts_ms")
    if sync is None:
        sync = [True] * len(frames)
    ebml = _elem(_EBML, _uelem(0x4286, 1)        # EBMLVersion
                 + _uelem(0x42F7, 1)             # EBMLReadVersion
                 + _uelem(0x42F2, 4) + _uelem(0x42F3, 8)
                 + _elem(0x4282, b"webm")        # DocType
                 + _uelem(0x4287, 2) + _uelem(0x4285, 2))
    info = _elem(_INFO, _uelem(_TS_SCALE, 1_000_000)
                 + _elem(_DURATION,
                         struct.pack(">d", float(max(ts_ms) + 1))))
    video = _elem(_VIDEO, _uelem(_PIX_W, width) + _uelem(_PIX_H, height))
    entry = _elem(_TRACK_ENTRY, _uelem(_TRACK_NUMBER, 1)
                  + _uelem(0x73C5, 1)            # TrackUID
                  + _uelem(_TRACK_TYPE, 1)
                  + _elem(_CODEC_ID, codec_id.encode()) + video)
    tracks = _elem(_TRACKS, entry)
    clusters = b""
    i = 0
    while i < len(frames):
        base = (ts_ms[i] // cluster_every_ms) * cluster_every_ms
        body = _uelem(_CLUSTER_TS, base)
        while i < len(frames) and ts_ms[i] - base < cluster_every_ms:
            rel = ts_ms[i] - base
            if not -32768 <= rel <= 32767:
                raise ValueError("write_webm: relative timestamp overflow")
            blk = (_enc_vint(1) + struct.pack(">h", rel)
                   + bytes([0x80 if sync[i] else 0x00]) + frames[i])
            body += _elem(_SIMPLE_BLOCK, blk)
            i += 1
        clusters += _elem(_CLUSTER, body)
    return ebml + _elem(_SEGMENT, info + tracks + clusters)
