"""Pure-python MP4 / ISO-BMFF container demuxer and muxer.

A 100 TB video-training pipeline does not decode H.264 in Python — it
demuxes containers cheaply (sample tables live in ``moov``, a few KB), picks
keyframe-aligned samples per clip, and ships the still-compressed payloads
to a GPU decode stage. This module implements that container layer for
real: full box walk, ``stts``/``stsz``/``stsc``/``stco``/``co64``/``stss``
sample-table expansion, per-sample (offset, size, timestamp, sync) rows,
and a spec-correct muxer used for round-trip testing. Codec payload decode
(H.264/VP9/AV1 bitstreams) stays honestly out of scope — samples are
returned as opaque bytes.

Reference parity: locationtech/rasterframes has no video path at all; this
belongs to the training-data-pipeline mandate (SURVEY.md §2.14), mirroring
how GIF/WAV got real codecs in ``sources/gif.py`` / ``pipeline/audio.py``.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf",
               b"udta", b"mvex", b"moof", b"traf"}
_MAX_DEPTH = 12
_MAX_SAMPLES = 1 << 24       # sanity cap on declared table sizes


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for boxes in [start, end)."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack_from(">I", data, off)
        fourcc = data[off + 4:off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, off + 8)
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off or off + size > end:
            raise ValueError(f"mp4: bad box size {size} for {fourcc!r}")
        yield fourcc, body, off + size
        off += size


def _fullbox(data: bytes, start: int) -> tuple[int, int]:
    """(version, body offset after version/flags)."""
    if start + 4 > len(data):
        raise ValueError("mp4: truncated full box")
    return data[start], start + 4


@dataclass
class Mp4Track:
    track_id: int
    handler: str                  # 'vide' / 'soun' / ...
    fourcc: str                   # sample-entry codec fourcc
    timescale: int
    duration: int                 # in track timescale units
    sizes: np.ndarray             # per-sample byte size
    offsets: np.ndarray           # absolute file offset per sample
    dts: np.ndarray               # decode timestamp per sample (timescale)
    sync: np.ndarray              # bool per sample

    @property
    def n_samples(self) -> int:
        return len(self.sizes)

    @property
    def duration_ms(self) -> float:
        if self.timescale <= 0:
            return 0.0
        return self.duration * 1000.0 / self.timescale

    def ts_ms(self) -> np.ndarray:
        return self.dts * (1000.0 / self.timescale)


@dataclass
class Mp4Info:
    brand: str
    timescale: int
    duration: int
    tracks: list = field(default_factory=list)

    @property
    def video_tracks(self):
        return [t for t in self.tracks if t.handler == "vide"]


def _parse_stbl(data: bytes, start: int, end: int):
    tables: dict = {}
    for cc, b, e in _iter_boxes(data, start, end):
        if cc == b"stsd":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack_from(">I", data, p)
            fourccs = []
            q = p + 4
            for _ in range(min(n, 32)):
                if q + 8 > e:
                    break
                (esz,) = struct.unpack_from(">I", data, q)
                if esz < 8 or q + esz > e:
                    raise ValueError("mp4: bad stsd entry size")
                fourccs.append(data[q + 4:q + 8].decode("latin1"))
                q += esz
            tables["stsd"] = fourccs
        elif cc == b"stts":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack_from(">I", data, p)
            if n > _MAX_SAMPLES or p + 4 + 8 * n > e:
                raise ValueError("mp4: stts table overruns box")
            arr = np.frombuffer(data, dtype=">u4", count=2 * n,
                                offset=p + 4).reshape(n, 2)
            tables["stts"] = arr
        elif cc == b"stsz":
            _, p = _fullbox(data, b)
            const_size, n = struct.unpack_from(">II", data, p)
            if n > _MAX_SAMPLES:
                raise ValueError("mp4: stsz count too large")
            if const_size:
                tables["stsz"] = np.full(n, const_size, dtype=np.int64)
            else:
                if p + 8 + 4 * n > e:
                    raise ValueError("mp4: stsz table overruns box")
                tables["stsz"] = np.frombuffer(
                    data, dtype=">u4", count=n, offset=p + 8).astype(np.int64)
        elif cc == b"stsc":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack_from(">I", data, p)
            if n > _MAX_SAMPLES or p + 4 + 12 * n > e:
                raise ValueError("mp4: stsc table overruns box")
            tables["stsc"] = np.frombuffer(
                data, dtype=">u4", count=3 * n, offset=p + 4).reshape(n, 3)
        elif cc in (b"stco", b"co64"):
            _, p = _fullbox(data, b)
            (n,) = struct.unpack_from(">I", data, p)
            w = 4 if cc == b"stco" else 8
            if n > _MAX_SAMPLES or p + 4 + w * n > e:
                raise ValueError("mp4: chunk-offset table overruns box")
            dt = ">u4" if cc == b"stco" else ">u8"
            tables["stco"] = np.frombuffer(
                data, dtype=dt, count=n, offset=p + 4).astype(np.int64)
        elif cc == b"stss":
            _, p = _fullbox(data, b)
            (n,) = struct.unpack_from(">I", data, p)
            if n > _MAX_SAMPLES or p + 4 + 4 * n > e:
                raise ValueError("mp4: stss table overruns box")
            tables["stss"] = np.frombuffer(
                data, dtype=">u4", count=n, offset=p + 4).astype(np.int64)
    return tables


def _expand_tables(tables: dict, file_size: int):
    sizes = tables.get("stsz")
    stco = tables.get("stco")
    stsc = tables.get("stsc")
    stts = tables.get("stts")
    if sizes is None or stco is None or stsc is None or stts is None:
        raise ValueError("mp4: missing sample tables (stsz/stco/stsc/stts)")
    n = len(sizes)
    # samples-per-chunk for every chunk: stsc entries are (first_chunk,
    # samples_per_chunk, sdi) runs, 1-based, ascending first_chunk
    n_chunks = len(stco)
    spc = np.zeros(n_chunks, dtype=np.int64)
    ent = stsc.astype(np.int64)
    if len(ent) and (ent[0, 0] != 1 or (np.diff(ent[:, 0]) <= 0).any()):
        raise ValueError("mp4: malformed stsc run table")
    for i in range(len(ent)):
        first = ent[i, 0] - 1
        last = ent[i + 1, 0] - 1 if i + 1 < len(ent) else n_chunks
        if first >= n_chunks:
            break
        spc[first:last] = ent[i, 1]
    if spc.sum() < n:
        raise ValueError("mp4: chunk map covers fewer samples than stsz")
    # absolute offset per sample
    offsets = np.zeros(n, dtype=np.int64)
    si = 0
    for ci in range(n_chunks):
        k = int(spc[ci])
        if k <= 0:
            continue
        k = min(k, n - si)
        if k <= 0:
            break
        run = sizes[si:si + k]
        offsets[si:si + k] = stco[ci] + np.concatenate(
            ([0], np.cumsum(run[:-1])))
        si += k
    if si < n:
        raise ValueError("mp4: chunk map exhausted before all samples placed")
    if ((offsets + sizes) > file_size).any() or (offsets < 0).any():
        raise ValueError("mp4: sample extents outside file")
    # decode timestamps from stts runs
    counts = stts[:, 0].astype(np.int64)
    total = int(counts.sum())
    if total < n:
        raise ValueError("mp4: stts covers fewer samples than stsz")
    # expand ONLY the runs the first n samples need: a corrupt run
    # count of ~2^32 would otherwise make np.repeat materialize tens
    # of GB before the [:n] slice — measured 393 s on a 1 KB file
    # (r12 fuzz finding)
    cum = np.cumsum(counts)
    cut = int(np.searchsorted(cum, n))
    counts = counts[:cut + 1].copy()
    counts[-1] -= int(cum[cut]) - n
    deltas = np.repeat(stts[:cut + 1, 1].astype(np.int64), counts)
    dts = np.concatenate(([0], np.cumsum(deltas[:-1])))
    # sync table (1-based sample numbers); absent => all sync
    sync = np.ones(n, dtype=bool)
    if "stss" in tables:
        sync[:] = False
        idx = tables["stss"] - 1
        idx = idx[(idx >= 0) & (idx < n)]
        sync[idx] = True
    return sizes, offsets, dts, sync


def read_mp4_info(data: bytes) -> Mp4Info:
    """Parse an ISO-BMFF file -> brand, movie timescale, per-track sample
    tables fully expanded (offset/size/dts/sync per sample)."""
    if len(data) < 16:
        raise ValueError("mp4: too short")
    brand = ""
    mv_timescale = 0
    mv_duration = 0
    tracks = []
    for cc, b, e in _iter_boxes(data, 0, len(data)):
        if cc == b"ftyp":
            brand = data[b:b + 4].decode("latin1")
        elif cc == b"moov":
            for cc2, b2, e2 in _iter_boxes(data, b, e):
                if cc2 == b"mvhd":
                    v, p = _fullbox(data, b2)
                    if v == 1:
                        mv_timescale, = struct.unpack_from(">I", data, p + 16)
                        mv_duration, = struct.unpack_from(">Q", data, p + 20)
                    else:
                        mv_timescale, mv_duration = struct.unpack_from(
                            ">II", data, p + 8)
                elif cc2 == b"trak":
                    tracks.append(_parse_trak(data, b2, e2))
    if not brand:
        raise ValueError("mp4: no ftyp box")
    return Mp4Info(brand, mv_timescale, mv_duration,
                   [t for t in tracks if t is not None])


def _parse_trak(data: bytes, start: int, end: int):
    track_id = 0
    handler = ""
    timescale = 0
    duration = 0
    tables = None
    for cc, b, e in _iter_boxes(data, start, end):
        if cc == b"tkhd":
            v, p = _fullbox(data, b)
            track_id, = struct.unpack_from(
                ">I", data, p + (16 if v == 1 else 8))
        elif cc == b"mdia":
            for cc2, b2, e2 in _iter_boxes(data, b, e):
                if cc2 == b"mdhd":
                    v, p = _fullbox(data, b2)
                    if v == 1:
                        timescale, = struct.unpack_from(">I", data, p + 16)
                        duration, = struct.unpack_from(">Q", data, p + 20)
                    else:
                        timescale, duration = struct.unpack_from(
                            ">II", data, p + 8)
                elif cc2 == b"hdlr":
                    _, p = _fullbox(data, b2)
                    handler = data[p + 4:p + 8].decode("latin1")
                elif cc2 == b"minf":
                    for cc3, b3, e3 in _iter_boxes(data, b2, e2):
                        if cc3 == b"stbl":
                            tables = _parse_stbl(data, b3, e3)
    if tables is None:
        return None
    sizes, offsets, dts, sync = _expand_tables(tables, len(data))
    fourcc = (tables.get("stsd") or ["????"])[0]
    return Mp4Track(track_id, handler, fourcc, timescale, duration,
                    sizes, offsets, dts, sync)


def extract_sample(data: bytes, track: Mp4Track, idx: int) -> bytes:
    if not 0 <= idx < track.n_samples:
        raise ValueError(f"mp4: sample index {idx} out of range")
    o, s = int(track.offsets[idx]), int(track.sizes[idx])
    return data[o:o + s]


def sample_indices_at(track: Mp4Track, every_ms: int,
                      keyframes_only: bool = False) -> list[tuple[int, int]]:
    """[(ts_ms, sample_idx)] — the sample visible at each every_ms tick;
    with keyframes_only, snapped back to the nearest preceding sync sample
    (the decode-cheap choice: no inter-frame reconstruction needed)."""
    if track.n_samples == 0 or track.timescale <= 0:
        return []
    ts = track.ts_ms()
    dur = track.duration_ms or float(ts[-1]) + 1
    out = []
    sync_idx = np.flatnonzero(track.sync)
    for t in range(0, int(dur), max(every_ms, 1)):
        i = int(np.searchsorted(ts, t, side="right") - 1)
        i = max(i, 0)
        if keyframes_only and not track.sync[i] and len(sync_idx):
            j = sync_idx[sync_idx <= i]
            i = int(j[-1]) if len(j) else i
        out.append((t, i))
    return out


# ---------------------------------------------------------------------------
# muxer (round-trip testing + writing real packed sample streams)
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + payload)


def write_mp4(samples: list[bytes], durations: list[int],
              timescale: int = 1000, fourcc: bytes = b"rfs1",
              sync: list[bool] | None = None,
              samples_per_chunk: int = 3) -> bytes:
    """Mux opaque codec samples into a minimal valid ISO-BMFF file:
    ftyp + mdat + moov with real stts/stsz/stsc/stco/stss tables. Chunking
    groups ``samples_per_chunk`` samples per chunk so the stsc/stco
    expansion paths are exercised, not just the 1:1 degenerate case."""
    n = len(samples)
    if n == 0 or len(durations) != n:
        raise ValueError("write_mp4: need >=1 sample and matching durations")
    if sync is None:
        sync = [True] * n
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat_start = len(ftyp) + 8          # absolute offset of first sample
    # chunk layout
    sizes = [len(s) for s in samples]
    chunk_offsets = []
    pos = mdat_start
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(pos)
        pos += sum(sizes[i:i + samples_per_chunk])
    # stts: run-length durations
    stts_runs = []
    for d in durations:
        if stts_runs and stts_runs[-1][1] == d:
            stts_runs[-1][0] += 1
        else:
            stts_runs.append([1, d])
    stts = _full(b"stts", 0, struct.pack(">I", len(stts_runs))
                 + b"".join(struct.pack(">II", c, d) for c, d in stts_runs))
    stsz = _full(b"stsz", 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", s) for s in sizes))
    stsc_entries = [(1, samples_per_chunk, 1)]
    rem = n % samples_per_chunk
    if rem and n > samples_per_chunk:
        stsc_entries.append((len(chunk_offsets), rem, 1))
    elif n < samples_per_chunk:
        stsc_entries = [(1, n, 1)]
    stsc = _full(b"stsc", 0, struct.pack(">I", len(stsc_entries))
                 + b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stco = _full(b"stco", 0, struct.pack(">I", len(chunk_offsets))
                 + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    boxes = [stts, stsc, stsz, stco]
    if not all(sync):
        keys = [i + 1 for i, k in enumerate(sync) if k]
        boxes.append(_full(b"stss", 0, struct.pack(">I", len(keys))
                           + b"".join(struct.pack(">I", k) for k in keys)))
    # minimal VisualSampleEntry (86 bytes of fields)
    entry = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
    stsd = _full(b"stsd", 0, struct.pack(">I", 1)
                 + _box(fourcc, entry))
    stbl = _box(b"stbl", stsd + b"".join(boxes))
    dref = _full(b"dref", 0, struct.pack(">I", 1)
                 + _box(b"url ", b"\x00\x00\x00\x01"))
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    total_dur = sum(durations)
    mdhd = _full(b"mdhd", 0, struct.pack(">IIII", 0, 0, timescale, total_dur)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"rasterframes_spark\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, struct.pack(">III", 0, 0, 1) + b"\x00" * 4
                 + struct.pack(">I", total_dur) + b"\x00" * 52)
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, total_dur)
                 + b"\x00" * 80)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
