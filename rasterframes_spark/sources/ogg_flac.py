"""Header-level Ogg (Vorbis/Opus) and native-FLAC audio metadata.

Same posture as ``sources/mpeg_audio.py``: sample *decode* of these
codecs stays out of scope, but the metadata an audio-corpus profile
filters on is cheap and exact without it —

- FLAC: the mandatory STREAMINFO block (first metadata block after
  ``fLaC``) carries sample rate, channels, bit depth, and total samples.
- Ogg: page headers carry a 64-bit granule position; the identification
  header of the first packet names the codec (``\\x01vorbis`` /
  ``OpusHead``) with channels + rate, and the last page's granule gives
  the exact PCM length (for Opus, granules run at 48 kHz minus pre-skip,
  per RFC 7845).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class AudioStreamInfo:
    container: str            # 'flac' | 'ogg'
    codec: str                # 'flac' | 'vorbis' | 'opus'
    sample_rate: int
    channels: int
    n_samples: int            # total PCM frames (0 if unknown)
    duration_ms: float
    bits_per_sample: int | None = None


def read_flac_info(data: bytes) -> AudioStreamInfo:
    if data[:4] != b"fLaC" or len(data) < 4 + 4 + 34:
        raise ValueError("flac: bad signature or truncated")
    # first metadata block must be STREAMINFO (type 0), 34 bytes
    hdr = data[4]
    if hdr & 0x7F != 0:
        raise ValueError("flac: first block is not STREAMINFO")
    (blen,) = struct.unpack(">I", b"\x00" + data[5:8])
    if blen < 34:
        raise ValueError("flac: STREAMINFO too short")
    b = data[8:8 + 34]
    # bytes 10..17: 20 bits rate, 3 bits channels-1, 5 bits bps-1,
    # 36 bits total samples
    v = int.from_bytes(b[10:18], "big")
    rate = v >> 44
    channels = ((v >> 41) & 0x7) + 1
    bps = ((v >> 36) & 0x1F) + 1
    total = v & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("flac: zero sample rate")
    return AudioStreamInfo("flac", "flac", rate, channels, total,
                           total * 1000.0 / rate, bps)


_MAX_PAGES = 1 << 20


def read_ogg_info(data: bytes) -> AudioStreamInfo:
    if data[:4] != b"OggS":
        raise ValueError("ogg: bad capture pattern")
    codec = None
    rate = channels = 0
    pre_skip = 0
    serial = None
    last_granule = 0
    off = 0
    pages = 0
    n = len(data)
    while off + 27 <= n and pages < _MAX_PAGES:
        if data[off:off + 4] != b"OggS":
            break                      # trailing junk: stop at last clean page
        granule = struct.unpack_from("<q", data, off + 6)[0]
        pg_serial = struct.unpack_from("<I", data, off + 14)[0]
        nseg = data[off + 26]
        seg_end = off + 27 + nseg
        if seg_end > n:
            raise ValueError("ogg: truncated segment table")
        body_len = sum(data[off + 27:seg_end])
        body = data[seg_end:seg_end + body_len]
        if len(body) != body_len:
            raise ValueError("ogg: truncated page body")
        if codec is None:
            if body[:7] == b"\x01vorbis" and len(body) >= 30:
                codec = "vorbis"
                serial = pg_serial
                channels = body[11]
                rate = struct.unpack_from("<I", body, 12)[0]
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                serial = pg_serial
                channels = body[9]
                pre_skip = struct.unpack_from("<H", body, 10)[0]
                rate = 48000           # Opus granules always run at 48 kHz
            elif body[:5] == b"\x7fFLAC" and len(body) >= 9 + 8 + 34:
                # Ogg-FLAC mapping: native fLaC + STREAMINFO embedded
                # in the identification packet (r7)
                fi = read_flac_info(body[9:])
                codec = "flac"
                serial = pg_serial
                channels = fi.channels
                rate = fi.sample_rate
        if serial is not None and pg_serial == serial and granule > 0:
            last_granule = max(last_granule, granule)
        off = seg_end + body_len
        pages += 1
    if codec is None:
        raise ValueError("ogg: no vorbis/opus identification header")
    if rate == 0 or channels == 0:
        raise ValueError("ogg: bad identification header")
    total = max(last_granule - (pre_skip if codec == "opus" else 0), 0)
    return AudioStreamInfo("ogg", codec, rate, channels, total,
                           total * 1000.0 / rate)


# ---------------------------------------------------------------------------
# writers (round-trip fixtures; payload frames are opaque/silent)
# ---------------------------------------------------------------------------


def write_flac_header(rate: int, channels: int, bps: int,
                      total_samples: int) -> bytes:
    """A fLaC signature + STREAMINFO block (marked last). Not a playable
    file — frames are omitted — but exactly what the metadata path reads."""
    v = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) \
        | (total_samples & ((1 << 36) - 1))
    b = bytearray(34)
    struct.pack_into(">HH", b, 0, 4096, 4096)     # block sizes
    b[4:10] = b"\x00" * 6                         # frame sizes unknown
    b[10:18] = v.to_bytes(8, "big")
    # md5 left zero
    return b"fLaC" + bytes([0x80]) + len(b).to_bytes(3, "big") + bytes(b)


def _ogg_page(serial: int, seq: int, granule: int, packet: bytes,
              header_type: int = 0) -> bytes:
    """One logical packet -> one or more Ogg pages.  A page holds at most
    255 lacing values (~64 KB); larger packets continue across pages with
    the continuation flag set and granule -1 on pages that end no packet.
    BOS rides the first page, EOS the last."""
    lacing = [255] * (len(packet) // 255) + [len(packet) % 255]
    groups = [lacing[i:i + 255] for i in range(0, len(lacing), 255)]
    out = bytearray()
    pos = 0
    for i, segs in enumerate(groups):
        last = i == len(groups) - 1
        body_len = sum(segs)
        body = packet[pos:pos + body_len]
        pos += body_len
        ht = (0x01 if i > 0 else (header_type & 0x02)) \
            | ((header_type & 0x04) if last else 0)
        out += (b"OggS" + bytes([0, ht])
                + struct.pack("<q", granule if last else -1)
                + struct.pack("<I", serial)
                + struct.pack("<I", seq + i) + b"\x00" * 4
                + bytes([len(segs)]) + bytes(segs))
        out += body
    return bytes(out)


def write_ogg_opus(n_samples_48k: int, channels: int = 2,
                   pre_skip: int = 312, serial: int = 0x1234) -> bytes:
    head = (b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip) + struct.pack("<I", 48000)
            + struct.pack("<h", 0) + bytes([0]))
    tags = b"OpusTags" + struct.pack("<I", 4) + b"rfsp" + struct.pack("<I", 0)
    audio = b"\x00" * 40               # opaque frame bytes
    return (_ogg_page(serial, 0, 0, head, header_type=2)
            + _ogg_page(serial, 1, 0, tags)
            + _ogg_page(serial, 2, n_samples_48k + pre_skip, audio,
                        header_type=4))


def write_ogg_vorbis(n_samples: int, rate: int = 44100,
                     channels: int = 2, serial: int = 0x77) -> bytes:
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
             + struct.pack("<I", rate) + b"\x00" * 12 + bytes([0xB8, 1]))
    audio = b"\x00" * 40
    return (_ogg_page(serial, 0, 0, ident, header_type=2)
            + _ogg_page(serial, 1, n_samples, audio, header_type=4))


# ---------------------------------------------------------------------------
# Ogg-FLAC mapping (r7): packet assembly + native-FLAC extraction
# ---------------------------------------------------------------------------

def ogg_packets(data: bytes, max_pages: int = 100000):
    """Assemble logical packets from an Ogg stream (lacing values,
    continued-packet flag across pages). Yields bytes per packet."""
    if data[:4] != b"OggS":
        raise ValueError("ogg: bad capture pattern")
    off = 0
    n = len(data)
    pages = 0
    cur = bytearray()
    while off + 27 <= n and pages < max_pages:
        if data[off:off + 4] != b"OggS":
            break
        header_type = data[off + 5]
        nseg = data[off + 26]
        seg_end = off + 27 + nseg
        if seg_end > n:
            raise ValueError("ogg: truncated segment table")
        lacing = data[off + 27:seg_end]
        body = data[seg_end:seg_end + sum(lacing)]
        if len(body) != sum(lacing):
            raise ValueError("ogg: truncated page body")
        if not (header_type & 1):
            cur = bytearray()          # fresh packet starts this page
        p = 0
        for lv in lacing:
            cur += body[p:p + lv]
            p += lv
            if lv < 255:
                yield bytes(cur)
                cur = bytearray()
        off = seg_end + len(body)
        pages += 1
    # an unterminated trailing packet (lacing ended at 255) is dropped,
    # matching demuxer behavior on truncated streams


def ogg_flac_to_native(data: bytes) -> bytes:
    """Ogg-FLAC stream -> native FLAC bytes decodable by
    sources/flac.decode_flac.

    Per the Ogg-FLAC mapping spec the first packet is
    0x7F 'FLAC' major minor nheaders(2 BE) + a native 'fLaC' signature +
    STREAMINFO; later header packets are metadata blocks; audio packets
    are native FLAC frames — so the native file is just a re-splice.
    ``nheaders`` counts the header packets that FOLLOW the first packet
    (``flac --ogg`` writes 1 for its VorbisComment); 0 means unknown, in
    which case header packets are recognized by the absence of the
    14-bit frame sync code."""
    if len(data) < 9:
        raise ValueError("ogg: truncated stream")
    packets = ogg_packets(data)
    first = next(packets, b"")
    if first[:5] != b"\x7fFLAC":
        raise ValueError("ogg: not an Ogg-FLAC stream")
    if len(first) < 13:
        raise ValueError("ogg-flac: truncated first packet")
    nheaders = struct.unpack_from(">H", first, 7)[0]
    native = bytearray(first[9:])
    if native[:4] != b"fLaC":
        raise ValueError("ogg-flac: first packet lacks native signature")
    # force the STREAMINFO last-metadata flag (remaining header packets
    # are VorbisComment etc. we drop)
    native[4] |= 0x80
    to_skip = nheaders
    in_audio = False
    for pkt in packets:
        if not in_audio:
            if nheaders > 0:
                if to_skip > 0:
                    to_skip -= 1
                    continue           # skip remaining metadata packets
            elif not (len(pkt) >= 2 and pkt[0] == 0xFF
                      and (pkt[1] & 0xFC) == 0xF8):
                continue               # count unknown: no frame sync yet
            in_audio = True
        native += pkt
    return bytes(native)


def write_ogg_flac(native_flac: bytes, serial: int = 0x0F1A) -> bytes:
    """Native FLAC bytes (fLaC + STREAMINFO [+ frames]) -> Ogg-FLAC.

    Mapping-spec shape: first packet = prefix + fLaC + STREAMINFO only,
    with the 16-bit count naming the number of FOLLOWING header packets
    (the spec-mandated VorbisComment is injected when the native stream
    has none); each further metadata block rides its own packet; audio
    frames follow (granule on the final page = total samples)."""
    if native_flac[:4] != b"fLaC":
        raise ValueError("write_ogg_flac: not native FLAC bytes")
    # split the metadata blocks from the frame section
    blocks = []
    pos = 4
    while True:
        hdr = native_flac[pos]
        (blen,) = struct.unpack(">I", b"\x00" + native_flac[pos + 1:pos + 4])
        blocks.append((hdr & 0x7F, native_flac[pos + 4:pos + 4 + blen]))
        pos += 4 + blen
        if hdr & 0x80:
            break
    frames = native_flac[pos:]
    streaminfo = next(b for t, b in blocks if t == 0)
    others = [(t, b) for t, b in blocks if t != 0]
    if not any(t == 4 for t, _ in others):
        vendor = b"rasterframes_spark"
        others.append((4, struct.pack("<I", len(vendor)) + vendor
                       + struct.pack("<I", 0)))

    def _block(t, body, last):
        return (bytes([t | (0x80 if last else 0)])
                + len(body).to_bytes(3, "big") + body)

    total = read_flac_info(native_flac).n_samples
    head = (b"\x7fFLAC\x01\x00" + struct.pack(">H", len(others))
            + b"fLaC" + _block(0, streaminfo, last=False))
    out = _ogg_page(serial, 0, 0, head, header_type=2)
    seq = 1
    for i, (t, b) in enumerate(others):
        out += _ogg_page(serial, seq, 0, _block(t, b, i == len(others) - 1))
        seq += 1
    out += _ogg_page(serial, seq, total, frames, header_type=4)
    return out
