"""IMA/DVI and Microsoft ADPCM WAV codecs (pure python + numpy).

The two ADPCM flavors RIFF registered (format codes 0x0011 and 0x0002) are
the compressed-WAV variants a training-data corpus actually contains —
telephony dumps, game assets, old field recordings.  Both are
4-bits-per-sample predictive coders whose state resets at every
``block_align`` boundary, so while the nibble chain is inherently
sequential WITHIN a block, blocks are independent: the decoders below run
the nibble loop once but vectorized ACROSS all blocks with numpy — the
per-row cost inside an Arrow batch is O(samples/blocks) python iterations,
not O(samples).

Validation: the IMA inner loop is pinned against CPython's ``audioop``
(``adpcm2lin`` implements the same public IMA step/index tables) in
tests/test_adpcm.py; MS ADPCM has no in-container reference decoder, so it
is pinned by spec-math examples plus encoder round-trips.  Reference
parity: the reference plays WAV through GDAL-external tooling only; this
is engine-native (SURVEY §2.14 multimodal audio).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_ima_adpcm", "decode_ms_adpcm",
           "encode_ima_adpcm", "encode_ms_adpcm",
           "IMA_STEPS", "IMA_INDEX", "MS_COEFS"]

# public IMA ADPCM tables (IMA Digital Audio Pack, 1992)
IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)

IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                      -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)

# public MS ADPCM coefficient pairs (RIFF spec, coef/256 fixed point)
MS_COEFS = np.array([(256, 0), (512, -256), (0, 0), (192, 64),
                     (240, 0), (460, -208), (392, -232)], dtype=np.int64)

_MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                      768, 614, 512, 409, 307, 230, 230, 230],
                     dtype=np.int64)


def _ima_step(pred: np.ndarray, idx: np.ndarray, nib: np.ndarray):
    """One vectorized IMA step over parallel block states."""
    step = IMA_STEPS[idx]
    diff = step >> 3
    diff += np.where(nib & 1, step >> 2, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 4, step, 0)
    pred = np.where(nib & 8, pred - diff, pred + diff)
    np.clip(pred, -32768, 32767, out=pred)
    idx = idx + IMA_INDEX[nib]
    np.clip(idx, 0, 88, out=idx)
    return pred, idx


def decode_ima_adpcm(data: bytes, channels: int,
                     block_align: int) -> np.ndarray:
    """IMA ADPCM WAV payload -> int16 samples shape (n, channels).

    Block layout (RIFF DVI/IMA registration): per channel a 4-byte
    header (int16 predictor, uint8 step index, reserved), then the
    nibble stream in 4-byte per-channel groups (8 nibbles, low nibble
    first), groups interleaved across channels."""
    ch = int(channels)
    ba = int(block_align)
    if ch < 1 or ba < 4 * ch or (ba - 4 * ch) % (4 * ch):
        raise ValueError("ima adpcm: bad channels/block_align")
    nblocks = len(data) // ba
    if nblocks == 0:
        return np.zeros((0, ch), dtype=np.int16)
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=nblocks * ba).reshape(nblocks, ba)
    hdr = raw[:, :4 * ch].reshape(nblocks, ch, 4)
    pred = (hdr[:, :, 0].astype(np.int64)
            | (hdr[:, :, 1].astype(np.int64) << 8))
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)   # int16
    idx = np.clip(hdr[:, :, 2].astype(np.int64), 0, 88)

    body = raw[:, 4 * ch:]                   # (nblocks, groups*4*ch)
    ngroups = body.shape[1] // (4 * ch)
    spb = 1 + ngroups * 8                    # samples per block per chan
    out = np.empty((nblocks, spb, ch), dtype=np.int16)
    out[:, 0, :] = pred.astype(np.int16)     # header predictor = sample 0
    # (nblocks, ngroups, ch, 4) byte groups; nibbles low-first
    grp = body.reshape(nblocks, ngroups, ch, 4).astype(np.uint8)
    lo = grp & 0x0F
    hi = grp >> 4
    # nibble order within a 4-byte group: b0lo b0hi b1lo b1hi ...
    nibs = np.empty((nblocks, ngroups, ch, 8), dtype=np.int64)
    nibs[..., 0::2] = lo
    nibs[..., 1::2] = hi
    for g in range(ngroups):
        for k in range(8):
            pred, idx = _ima_step(pred, idx, nibs[:, g, :, k])
            out[:, 1 + g * 8 + k, :] = pred.astype(np.int16)
    return out.reshape(-1, ch)


def encode_ima_adpcm(samples: np.ndarray, channels: int,
                     samples_per_block: int = 505) -> tuple[bytes, int]:
    """int16 samples (n, ch) -> (IMA ADPCM payload, block_align).

    ``samples_per_block`` must be 8k+1; input is zero-padded to whole
    blocks (standard encoder behavior)."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    ch = int(channels)
    spb = int(samples_per_block)
    if (spb - 1) % 8:
        raise ValueError("ima adpcm: samples_per_block must be 8k+1")
    n = a.shape[0]
    nblocks = max(1, -(-n // spb))
    pad = nblocks * spb - n
    if pad:
        a = np.vstack([a, np.zeros((pad, ch), dtype=np.int64)])
    ba = 4 * ch + (spb - 1) // 2 * ch
    out = bytearray()
    idx = np.zeros(ch, dtype=np.int64)
    for b in range(nblocks):
        blk = a[b * spb:(b + 1) * spb]
        pred = blk[0].copy()
        for c in range(ch):
            out += struct.pack("<hBB", int(pred[c]), int(idx[c]), 0)
        nibbles = np.zeros(((spb - 1), ch), dtype=np.uint8)
        for s in range(1, spb):
            for c in range(ch):
                step = int(IMA_STEPS[idx[c]])
                diff = int(blk[s, c]) - int(pred[c])
                nib = 0
                if diff < 0:
                    nib = 8
                    diff = -diff
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                nibbles[s - 1, c] = nib
                p, i = _ima_step(np.array([pred[c]]), np.array([idx[c]]),
                                 np.array([nib]))
                pred[c], idx[c] = int(p[0]), int(i[0])
        # pack: per channel 4-byte groups of 8 nibbles, low first,
        # groups interleaved across channels
        for g in range((spb - 1) // 8):
            for c in range(ch):
                ns = nibbles[g * 8:(g + 1) * 8, c]
                for k in range(4):
                    out.append(int(ns[2 * k]) | (int(ns[2 * k + 1]) << 4))
    return bytes(out), ba


def decode_ms_adpcm(data: bytes, channels: int,
                    block_align: int) -> np.ndarray:
    """Microsoft ADPCM WAV payload -> int16 samples (n, channels).

    Block layout (RIFF spec): per channel uint8 coef-pair index, then
    per channel int16 initial delta, int16 sample1, int16 sample2; then
    4-bit codes high-nibble-first, channel-interleaved."""
    ch = int(channels)
    ba = int(block_align)
    hdr_len = 7 * ch
    if ch < 1 or ba <= hdr_len:
        raise ValueError("ms adpcm: bad channels/block_align")
    nblocks = len(data) // ba
    if nblocks == 0:
        return np.zeros((0, ch), dtype=np.int16)
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=nblocks * ba).reshape(nblocks, ba)

    def _i16(lo, hi):
        v = lo.astype(np.int64) | (hi.astype(np.int64) << 8)
        return np.where(v >= 0x8000, v - 0x10000, v)

    pred_idx = raw[:, :ch].astype(np.int64)
    if (pred_idx >= len(MS_COEFS)).any():
        raise ValueError("ms adpcm: coefficient index out of range")
    o = ch
    delta = _i16(raw[:, o:o + 2 * ch:2], raw[:, o + 1:o + 2 * ch:2])
    o += 2 * ch
    s1 = _i16(raw[:, o:o + 2 * ch:2], raw[:, o + 1:o + 2 * ch:2])
    o += 2 * ch
    s2 = _i16(raw[:, o:o + 2 * ch:2], raw[:, o + 1:o + 2 * ch:2])
    o += 2 * ch

    c1 = MS_COEFS[pred_idx, 0]
    c2 = MS_COEFS[pred_idx, 1]
    body = raw[:, o:]
    ncodes = body.shape[1] * 2               # nibbles total per block
    spb = 2 + ncodes // ch                   # samples per block per chan
    out = np.empty((nblocks, spb, ch), dtype=np.int16)
    out[:, 0, :] = s2.astype(np.int16)       # sample2 is the OLDER one
    out[:, 1, :] = s1.astype(np.int16)
    # nibble n of the block: byte n//2, high nibble first
    for s in range(2, spb):
        k = (s - 2) * ch                     # first nibble index this step
        # channel c uses nibble k+c
        for c in range(ch):
            nk = k + c
            byte = body[:, nk >> 1].astype(np.int64)
            nib = (byte >> 4) if nk % 2 == 0 else (byte & 0x0F)
            signed = np.where(nib >= 8, nib - 16, nib)
            # the spec's /256 is C integer division: truncate toward
            # zero (numpy >> floors, which diverges on negatives)
            acc = s1[:, c] * c1[:, c] + s2[:, c] * c2[:, c]
            predv = np.sign(acc) * (np.abs(acc) >> 8)
            new = predv + signed * delta[:, c]
            np.clip(new, -32768, 32767, out=new)
            out[:, s, c] = new.astype(np.int16)
            s2[:, c] = s1[:, c]
            s1[:, c] = new
            d = (_MS_ADAPT[nib] * delta[:, c]) >> 8
            # lower bound per spec; upper bound only guards int64
            # wraparound on adversarial streams (any sane delta is
            # well under 2^24 — outputs clamp to int16 regardless)
            delta[:, c] = np.clip(d, 16, 1 << 24)
    return out.reshape(-1, ch)


def encode_ms_adpcm(samples: np.ndarray, channels: int,
                    samples_per_block: int = 500) -> tuple[bytes, int]:
    """int16 samples (n, ch) -> (MS ADPCM payload, block_align); always
    coefficient pair 0 (c1=256, c2=0 — pure first-order) for simplicity,
    which every decoder must support."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    ch = int(channels)
    spb = int(samples_per_block)
    if spb < 2 or (spb - 2) * ch % 2:
        raise ValueError("ms adpcm: (samples_per_block-2)*ch must be even")
    n = a.shape[0]
    nblocks = max(1, -(-n // spb))
    pad = nblocks * spb - n
    if pad:
        a = np.vstack([a, np.zeros((pad, ch), dtype=np.int64)])
    ba = 7 * ch + (spb - 2) * ch // 2
    out = bytearray()
    for b in range(nblocks):
        blk = a[b * spb:(b + 1) * spb]
        delta = np.full(ch, 256, dtype=np.int64)
        s2 = blk[0].copy()
        s1 = blk[1].copy()
        out += bytes([0] * ch)                       # coef pair 0
        for c in range(ch):
            out += struct.pack("<h", int(delta[c]))
        for c in range(ch):
            out += struct.pack("<h", int(s1[c]))
        for c in range(ch):
            out += struct.pack("<h", int(s2[c]))
        nibs = []
        for s in range(2, spb):
            for c in range(ch):
                predv = (int(s1[c]) * 256 + int(s2[c]) * 0) >> 8
                err = int(blk[s, c]) - predv
                code = err // int(delta[c])
                code = max(-8, min(7, code))
                new = predv + code * int(delta[c])
                new = max(-32768, min(32767, new))
                nibs.append(code & 0x0F)
                s2[c] = s1[c]
                s1[c] = new
                d = (int(_MS_ADAPT[code & 0x0F]) * int(delta[c])) >> 8
                delta[c] = max(d, 16)
        for i in range(0, len(nibs), 2):
            out.append((nibs[i] << 4) | nibs[i + 1])
    return bytes(out), ba


def write_adpcm_wav(samples: np.ndarray, sample_rate: int,
                    fmt: str = "ima") -> bytes:
    """int16 samples (n, ch) -> a complete ADPCM .wav (fmt + fact +
    data), decodable by decode_wav and by standard tooling."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if fmt == "ima":
        payload, ba = encode_ima_adpcm(a, ch)
        code, spb = 0x0011, 505
    elif fmt == "ms":
        payload, ba = encode_ms_adpcm(a, ch)
        code, spb = 0x0002, 500
    else:
        raise ValueError("fmt must be 'ima' or 'ms'")
    byte_rate = sample_rate * ba // spb
    fmt_chunk = struct.pack("<HHIIHHH", code, ch, sample_rate, byte_rate,
                            ba, 4, 2) + struct.pack("<H", spb)
    riff = b"WAVE"
    riff += b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    riff += b"fact" + struct.pack("<II", 4, n)
    riff += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
