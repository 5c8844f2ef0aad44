"""Hand-assembled HDF5 classic-format spec fixture.

The HDF5 pytest matrix verifies the reader against this repo's own
writer — a closed loop (the caveat class VERDICT r8 recorded for
MP4/WebM before their hand-built fixtures).  This file assembles a
complete classic HDF5 file structure by structure from the published
format spec (superblock v0, v1 B-trees, local heaps, SNOD symbol
nodes, v1 object headers) using shapes the own writer never emits:

- a BIG-endian int16 dataset whose datatype + layout messages live in
  an object-header CONTINUATION block (message 0x10),
- dataspace message version 2 alongside version 1,
- a contiguous dataset whose data address is UNDEFINED with a defined
  fill value (the spec's unallocated-storage form -> all-fill read),
- a NESTED group holding a chunked dataset with a shuffle+deflate
  filter pipeline where ONE chunk's filter mask skips the shuffle
  (spec IV.A.2.l: mask bit i = pipeline position i skipped) and two
  chunks are absent from the chunk B-tree (-> fill value),
- the rank+1 chunk-key convention (trailing element-size dimension).

A tiny two-pass section "linker" resolves the forward address
references (superblock -> root header -> B-tree -> heap -> SNOD ->
child headers -> data); every field is written from the spec layout in
the comments.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

from rasterframes_spark.sources.hdf5 import H5File

UNDEF = 0xFFFFFFFFFFFFFFFF


def _u16(v):
    return struct.pack("<H", v)


def _u32(v):
    return struct.pack("<I", v)


def _u64(v):
    return struct.pack("<Q", v)


def _msg(mtype: int, body: bytes) -> bytes:
    """v1 header message: type u16, size u16, flags u8 + 3 reserved,
    body padded to 8."""
    body = body + b"\x00" * ((-len(body)) % 8)
    return _u16(mtype) + _u16(len(body)) + b"\x00" * 4 + body


def _objhdr(msgs, total=None) -> bytes:
    """v1 object header: version 1, total message count (INCLUDING any
    messages that live in continuation blocks), refcount, size of the
    in-place block, 4 pad bytes, messages."""
    blob = b"".join(msgs)
    return (bytes([1, 0]) + _u16(total if total is not None else len(msgs))
            + _u32(1) + _u32(len(blob)) + b"\x00" * 4 + blob)


def _btree_group(snod_addr: int) -> bytes:
    """Group B-tree v1 leaf: TREE, type 0, level 0, 1 entry, undefined
    siblings, key0/child/key1."""
    return (b"TREE" + bytes([0, 0]) + _u16(1) + _u64(UNDEF) + _u64(UNDEF)
            + _u64(0) + _u64(snod_addr) + _u64(0))


def _heap_hdr(data_addr: int, dlen: int) -> bytes:
    """Local heap: HEAP, version 0, data-segment size, free-list head,
    data-segment address."""
    return (b"HEAP" + bytes([0, 0, 0, 0]) + _u64(dlen) + _u64(dlen)
            + _u64(data_addr))


def _snod(entries) -> bytes:
    """SNOD v1: per symbol a 40-byte entry (heap name offset, object
    header address, cache type 0, reserved, 16 scratch bytes)."""
    b = b"SNOD" + bytes([1, 0]) + _u16(len(entries))
    for name_off, hdr_addr in entries:
        b += _u64(name_off) + _u64(hdr_addr) + _u32(0) + _u32(0) + b"\x00" * 16
    return b


# --- fixture content -------------------------------------------------------

BE_VALS = np.array([[1, -2, 3], [4, 5, -6]], dtype=">i2")
D_FULL = (np.arange(30, dtype="<i4").reshape(6, 5) * 3 - 7)


def _shuffle(raw: bytes, itemsize: int) -> bytes:
    a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, itemsize)
    return a.T.tobytes()


def _chunks():
    """Chunk (0,0): shuffle THEN deflate (mask 0).  Chunk (4,4): deflate
    only — its filter mask sets bit 0 (pipeline position 0 = shuffle
    skipped).  Chunks (0,4) and (4,0) are absent -> fill (-1)."""
    c00 = zlib.compress(_shuffle(D_FULL[0:4, 0:4].copy().tobytes(), 4))
    blk = np.full((4, 4), -1, dtype="<i4")
    blk[0:2, 0:1] = D_FULL[4:6, 4:5]
    c44 = zlib.compress(blk.tobytes())
    return c00, c44


SECTIONS = ["sb", "root_hdr", "root_btree", "root_heap_hdr",
            "root_heap_data", "root_snod", "be_hdr", "be_cont", "be_data",
            "fill_hdr", "g_hdr", "g_btree", "g_heap_hdr", "g_heap_data",
            "g_snod", "d_hdr", "d_btree", "c00", "c44"]


def _render(A: dict) -> dict:
    heap_root = bytearray(32)
    for n, off in (("be", 8), ("fill", 16), ("g", 24)):
        heap_root[off:off + len(n)] = n.encode()
    heap_g = bytearray(16)
    heap_g[8:9] = b"d"
    c00, c44 = _chunks()
    out = {}
    # superblock v0: signature, 5 version bytes + sizeof(offsets)=8 +
    # sizeof(lengths)=8 + reserved, leaf/internal K, flags, base/free/
    # eof/driver addresses, then the root group symbol-table entry
    root_entry = (_u64(0) + _u64(A["root_hdr"]) + _u32(0) + _u32(0)
                  + b"\x00" * 16)
    out["sb"] = (b"\x89HDF\r\n\x1a\n" + bytes([0, 0, 0, 0, 0, 8, 8, 0])
                 + _u16(4) + _u16(16) + _u32(0)
                 + _u64(0) + _u64(UNDEF) + _u64(A["end"]) + _u64(UNDEF)
                 + root_entry)
    out["root_hdr"] = _objhdr(
        [_msg(0x11, _u64(A["root_btree"]) + _u64(A["root_heap_hdr"]))])
    out["root_btree"] = _btree_group(A["root_snod"])
    out["root_heap_hdr"] = _heap_hdr(A["root_heap_data"], len(heap_root))
    out["root_heap_data"] = bytes(heap_root)
    out["root_snod"] = _snod([(8, A["be_hdr"]), (16, A["fill_hdr"]),
                              (24, A["g_hdr"])])

    # /be: dataspace v2 in place; datatype (fixed-point, byte-order bit
    # + signed bit set = big-endian signed, 2 bytes) and contiguous
    # layout v3 arrive via a CONTINUATION block; the header's message
    # count covers all four messages
    cont = (_msg(0x03, bytes([0x10, 0x09, 0, 0]) + _u32(2)
                 + _u16(0) + _u16(16))
            + _msg(0x08, bytes([3, 1]) + _u64(A["be_data"])
                   + _u64(BE_VALS.nbytes)))
    out["be_cont"] = cont
    out["be_hdr"] = _objhdr(
        [_msg(0x01, bytes([2, 2, 0, 0]) + _u64(2) + _u64(3)),
         _msg(0x10, _u64(A["be_cont"]) + _u64(len(cont)))],
        total=4)
    out["be_data"] = BE_VALS.tobytes()

    # /fill: IEEE f32 LE, fill-value message v2 (defined, 7.5),
    # contiguous layout with an UNDEFINED address = unallocated storage
    out["fill_hdr"] = _objhdr([
        _msg(0x01, bytes([1, 2, 0, 0]) + b"\x00" * 4 + _u64(2) + _u64(3)),
        _msg(0x03, bytes([0x11, 0x00, 0, 0]) + _u32(4)
             + _u16(0) + _u16(32) + bytes([31, 8, 0, 23])),
        _msg(0x05, bytes([2, 2, 2, 1]) + _u32(4) + struct.pack("<f", 7.5)),
        _msg(0x08, bytes([3, 1]) + _u64(UNDEF) + _u64(0)),
    ])

    # /g: nested group with its own B-tree/heap/SNOD
    out["g_hdr"] = _objhdr(
        [_msg(0x11, _u64(A["g_btree"]) + _u64(A["g_heap_hdr"]))])
    out["g_btree"] = _btree_group(A["g_snod"])
    out["g_heap_hdr"] = _heap_hdr(A["g_heap_data"], len(heap_g))
    out["g_heap_data"] = bytes(heap_g)
    out["g_snod"] = _snod([(8, A["d_hdr"])])

    # /g/d: 6x5 i4, fill -1, filter pipeline v1 [shuffle(cd=4),
    # deflate(cd=6)] (odd client-data counts pad by 4), chunked layout
    # v3 with dimensionality rank+1 and 4x4(x4-byte) chunks
    filt = (bytes([1, 2]) + b"\x00" * 6
            + _u16(2) + _u16(0) + _u16(0) + _u16(1) + _u32(4) + _u32(0)
            + _u16(1) + _u16(0) + _u16(0) + _u16(1) + _u32(6) + _u32(0))
    out["d_hdr"] = _objhdr([
        _msg(0x01, bytes([1, 2, 0, 0]) + b"\x00" * 4 + _u64(6) + _u64(5)),
        _msg(0x03, bytes([0x10, 0x08, 0, 0]) + _u32(4) + _u16(0) + _u16(32)),
        _msg(0x05, bytes([1, 2, 2, 1]) + _u32(4) + struct.pack("<i", -1)),
        _msg(0x0B, filt),
        _msg(0x08, bytes([3, 2, 3]) + _u64(A["d_btree"])
             + _u32(4) + _u32(4) + _u32(4)),
    ])

    def ckey(nbytes, mask, offs):
        return _u32(nbytes) + _u32(mask) + b"".join(_u64(o) for o in offs)

    out["d_btree"] = (b"TREE" + bytes([1, 0]) + _u16(2)
                      + _u64(UNDEF) + _u64(UNDEF)
                      + ckey(len(c00), 0, (0, 0, 0)) + _u64(A["c00"])
                      + ckey(len(c44), 1, (4, 4, 0)) + _u64(A["c44"])
                      + ckey(0, 0, (6, 5, 0)))
    out["c00"] = c00
    out["c44"] = c44
    return out


def build_fixture() -> bytes:
    # two-pass linker: section sizes are address-independent (every
    # address field is fixed 8 bytes), so one sizing pass resolves all
    # forward references
    A = {s: 0 for s in SECTIONS}
    A["end"] = 0
    for _ in range(2):
        rendered = _render(A)
        pos = 0
        for s in SECTIONS:
            A[s] = pos
            pos += len(rendered[s])
            pos += (-pos) % 8
        A["end"] = pos
    rendered = _render(A)
    blob = bytearray(A["end"])
    for s in SECTIONS:
        blob[A[s]:A[s] + len(rendered[s])] = rendered[s]
    return bytes(blob)


def test_hand_assembled_hdf5_decodes():
    f = H5File(build_fixture())
    assert sorted(f.datasets) == ["/be", "/fill", "/g/d"]
    assert f.groups == {"/g"}
    be = f.datasets["/be"]
    assert be.dtype == np.dtype(">i2")
    assert be.read().tolist() == [[1, -2, 3], [4, 5, -6]]
    # unallocated contiguous storage reads as the defined fill value
    assert f.datasets["/fill"].read().tolist() == [[7.5] * 3, [7.5] * 3]
    d = f.datasets["/g/d"].read()
    exp = np.full((6, 5), -1, dtype="<i4")
    exp[0:4, 0:4] = D_FULL[0:4, 0:4]       # shuffle+deflate chunk
    exp[4:6, 4:5] = D_FULL[4:6, 4:5]       # deflate-only (mask skips shuffle)
    np.testing.assert_array_equal(d, exp)
