"""Pure-python MPEG audio (MP3) frame-header metadata parser.

Full MP3 *decode* (hybrid filterbank + Huffman) stays honestly out of
scope — but the metadata an audio-corpus pipeline actually filters on
(duration, sample rate, channel mode, bitrate, CBR/VBR) lives in the
frame headers and costs a cheap header walk: 4 bytes per frame, no
entropy decode. Implements the public MPEG-1/2/2.5 Layer I-III header
layout, ID3v2 skipping, and the Xing/Info VBR frame-count tag.

Reference parity: locationtech/rasterframes has no audio path; this is
training-data-pipeline surface (SURVEY.md §2.14) beside the real WAV
codec in ``pipeline/audio.py``.
"""
from __future__ import annotations

from dataclasses import dataclass

# bitrate_kbps[version_group][layer][index]; version_group 0 = MPEG1,
# 1 = MPEG2/2.5. Index 0 = "free format" (unsupported), 15 = invalid.
_BITRATES = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
             384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
             256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_RATES = {0: (44100, 48000, 32000),      # MPEG1
          1: (22050, 24000, 16000),      # MPEG2
          2: (11025, 12000, 8000)}       # MPEG2.5


@dataclass
class Mp3Info:
    version: str              # 'MPEG1' | 'MPEG2' | 'MPEG2.5'
    layer: int                # 1..3
    sample_rate: int
    channels: int
    n_frames: int
    samples_per_frame: int
    duration_ms: float
    bitrate_kbps: float       # average over parsed frames
    vbr: bool
    xing_frames: int | None   # Xing/Info tag frame count, when present


def _parse_header(b0: int, b1: int, b2: int, b3: int):
    """One 4-byte header -> (version_idx, layer, sample_rate, channels,
    bitrate_kbps, frame_bytes, samples_per_frame) or None if not a frame."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 0x3          # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (b1 >> 1) & 0x3        # 1=III, 2=II, 3=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    version_idx = {0: 2, 2: 1, 3: 0}[ver_bits]
    layer = 4 - layer_bits              # 1..3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (b2 >> 1) & 1
    mode = (b3 >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    vgroup = 0 if version_idx == 0 else 1
    kbps = _BITRATES[(vgroup, layer)][br_idx]
    rate = _RATES[version_idx][sr_idx]
    if layer == 1:
        spf = 384
        frame = (12 * kbps * 1000 // rate + padding) * 4
    elif layer == 2:
        spf = 1152
        frame = 144 * kbps * 1000 // rate + padding
    else:
        spf = 1152 if vgroup == 0 else 576
        frame = (144 if vgroup == 0 else 72) * kbps * 1000 // rate + padding
    if frame < 4:
        return None
    return version_idx, layer, rate, channels, kbps, frame, spf


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
    return 10 + size


def _xing_frames(data: bytes, off: int, version_idx: int,
                 channels: int) -> int | None:
    """Xing/Info tag in the first frame's side-info region."""
    vgroup = 0 if version_idx == 0 else 1
    side = (17 if channels == 1 else 32) if vgroup == 0 else \
           (9 if channels == 1 else 17)
    p = off + 4 + side
    if data[p:p + 4] not in (b"Xing", b"Info"):
        return None
    if p + 12 > len(data):
        return None
    flags = int.from_bytes(data[p + 4:p + 8], "big")
    if flags & 1:
        return int.from_bytes(data[p + 8:p + 12], "big")
    return None


_MAX_FRAMES = 1 << 22          # ~13h of MPEG1 L3 audio; hostile-input cap
_RESYNC_WINDOW = 64 * 1024     # search this far for the first frame


def read_mp3_info(data: bytes) -> Mp3Info:
    """Header-walk an MPEG audio stream -> duration/rate/bitrate metadata.

    Walks every frame (headers only, payloads skipped via the computed
    frame size), so VBR durations are exact even without a Xing tag.
    Raises ValueError when no coherent frame sequence is found.
    """
    start = _skip_id3v2(data)
    # find the first header that parses AND whose successor also parses —
    # a single random 0xFFE sync in junk is common
    first = None
    limit = min(len(data) - 4, start + _RESYNC_WINDOW)
    off = start
    while off <= limit:
        h = _parse_header(data[off], data[off + 1], data[off + 2],
                          data[off + 3])
        if h is not None:
            nxt = off + h[5]
            if nxt + 4 > len(data) or _parse_header(
                    data[nxt], data[nxt + 1], data[nxt + 2],
                    data[nxt + 3]) is not None:
                first = off
                break
        off += 1
    if first is None:
        raise ValueError("mp3: no MPEG audio frames found")

    h0 = _parse_header(data[first], data[first + 1], data[first + 2],
                       data[first + 3])
    version_idx, layer, rate, channels, _, _, spf = h0
    xing = _xing_frames(data, first, version_idx, channels)

    n_frames = 0
    kbps_sum = 0
    kbps_set = set()
    off = first
    while off + 4 <= len(data) and n_frames < _MAX_FRAMES:
        h = _parse_header(data[off], data[off + 1], data[off + 2],
                          data[off + 3])
        if h is None:
            break                     # tail junk / tag
        if (h[0], h[1], h[2]) != (version_idx, layer, rate):
            break                     # stream property change: stop cleanly
        n_frames += 1
        kbps_sum += h[4]
        kbps_set.add(h[4])
        off += h[5]
    if n_frames == 0:
        raise ValueError("mp3: no MPEG audio frames found")
    eff_frames = xing if xing is not None else n_frames
    version = ("MPEG1", "MPEG2", "MPEG2.5")[version_idx]
    return Mp3Info(
        version=version, layer=layer, sample_rate=rate, channels=channels,
        n_frames=n_frames, samples_per_frame=spf,
        duration_ms=eff_frames * spf * 1000.0 / rate,
        bitrate_kbps=kbps_sum / n_frames,
        vbr=len(kbps_set) > 1 or xing is not None,
        xing_frames=xing)


def write_mp3_frames(n_frames: int, kbps: int = 128, rate: int = 44100,
                     channels: int = 2, layer: int = 3,
                     vbr_pattern: list[int] | None = None) -> bytes:
    """Emit a syntactically valid MPEG frame sequence (silent/garbage
    payloads) for round-trip tests — headers are real, audio data is not."""
    version_idx = {44100: 0, 48000: 0, 32000: 0,
                   22050: 1, 24000: 1, 16000: 1,
                   11025: 2, 12000: 2, 8000: 2}.get(rate)
    if version_idx is None:
        raise ValueError(f"mp3: unsupported sample rate {rate}")
    sr_idx = _RATES[version_idx].index(rate)
    vgroup = 0 if version_idx == 0 else 1
    ver_bits = {0: 3, 1: 2, 2: 0}[version_idx]
    layer_bits = 4 - layer
    out = bytearray()
    for i in range(n_frames):
        k = vbr_pattern[i % len(vbr_pattern)] if vbr_pattern else kbps
        br_idx = _BITRATES[(vgroup, layer)].index(k)
        b0 = 0xFF
        b1 = 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1
        b2 = (br_idx << 4) | (sr_idx << 2)
        b3 = (0x3 if channels == 1 else 0x0) << 6
        h = _parse_header(b0, b1, b2, b3)
        assert h is not None
        out += bytes([b0, b1, b2, b3]) + b"\x00" * (h[5] - 4)
    return bytes(out)
