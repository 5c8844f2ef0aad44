"""Minimal pure-python HDF5 (classic layout) reader + writer.

Scope — the CLASSIC file layout that libhdf5 writes by default and that
every netCDF-4 file uses (superblock v0, v1 object headers, symbol-table
groups), plus the storage variants that matter for array data:

- superblock v0 (8-byte offsets/lengths); v1-v3 raise cleanly;
- groups: symbol-table B-tree v1 + local heap + SNOD nodes, nested;
- v1 object headers with continuation blocks;
- messages: dataspace (v1/v2), datatype (fixed-point + IEEE float,
  little/big endian), fill value, data layout v3 (contiguous + chunked),
  filter pipeline (deflate via zlib, shuffle), attributes (v1),
  symbol table, object continuation;
- chunked data via B-tree v1 (node type 1), any level;
- attributes with scalar/1-D fixed/float/string payloads.

The writer emits the same classic subset (contiguous or chunked +
optional deflate/shuffle, group nesting, attributes) — it exists to make
the reader testable end-to-end and as a real export sink.  No external
HDF5 fixture or library exists in this container (no h5py/libhdf5 to
cross-check); the format risk is concentrated in the rigid on-disk
structures (offsets chain through superblock -> btree -> heap -> object
headers), where a writer/reader shared bug breaks the chain loudly
rather than corrupting values silently.  Noted in the README matrix.

NetCDF-4 files are HDF5: `read_netcdf4` maps root datasets +
CF attributes to the same (data, attrs) surface as sources/netcdf.py.
"""

from __future__ import annotations

import functools
import struct
import zlib

import numpy as np


def _strict(fn):
    """Translate low-level parse explosions on corrupt bytes into the
    format-dispatch contract's ValueError (the same boundary jp2's
    ``_translate_errors`` draws): struct under-reads, zlib garbage,
    bad indices — a malformed file is a malformed file, never an
    internal-looking crash (r10 fuzz findings)."""
    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except (struct.error, zlib.error, IndexError, KeyError,
                OverflowError, UnicodeDecodeError, TypeError) as e:
            raise ValueError(f"hdf5: malformed file ({e})") from e
    return wrapped

__all__ = ["H5File", "H5Writer", "read_netcdf4", "read_netcdf4_meta",
           "apply_cf_nc4"]

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF
# in-memory reader's per-dataset allocation cap (see _Dataset.read)
_MAX_DATASET_BYTES = 1 << 32


def _full_fast(shape, fill, dtype):
    """np.full, but calloc-backed when the fill is zero — np.zeros gets
    lazily-zeroed pages from the OS, so a legitimate (or corrupt)
    gigabyte-scale pure-fill dataset costs microseconds instead of
    seconds of memset (r10 fuzz)."""
    if fill is None or (np.isscalar(fill) and fill == 0):
        return np.zeros(shape, dtype=dtype)
    return np.full(shape, fill, dtype=dtype)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class _Dataset:
    __slots__ = ("name", "shape", "dtype", "maxshape", "layout", "attrs",
                 "_file", "_contig_addr", "_contig_size", "_btree_addr",
                 "_chunk_shape", "_filters", "_fill_raw", "_chunk_list")

    def __init__(self, name, f):
        self.name = name
        self._file = f
        self.shape = ()
        self.dtype = None
        self.layout = None
        self.attrs = {}
        self._contig_addr = None
        self._contig_size = 0
        self._btree_addr = None
        self._chunk_shape = None
        self._filters = []
        self._fill_raw = b""
        self._chunk_list = None

    @property
    def fillvalue(self):
        """Fill value interpreted through the DATASET's datatype — a
        4-byte fill on an int32 dataset is an int32, not a float32."""
        raw = self._fill_raw
        if not raw:
            return 0
        dt = self.dtype
        if dt is not None and dt.itemsize == len(raw):
            return np.frombuffer(raw, dtype=dt)[0]
        # size mismatch (malformed writer): fall back on width heuristics
        if len(raw) == 4:
            return struct.unpack("<f", raw)[0]
        if len(raw) == 8:
            return struct.unpack("<d", raw)[0]
        return int.from_bytes(raw, "little", signed=True)

    def __getitem__(self, key):
        return self.read()[key]

    @_strict
    def read(self) -> np.ndarray:
        shape = self.shape if self.shape else (1,)
        return self.read_window(
            tuple((0, d) for d in shape)).reshape(self.shape)

    def _chunks(self) -> list:
        """Chunk B-tree entries, walked once per dataset and cached —
        the windowed reader intersects against this list per window."""
        if self._chunk_list is None:
            chunks = []
            self._file._walk_chunk_btree(self._btree_addr,
                                         len(self.shape), chunks)
            self._chunk_list = chunks
        return self._chunk_list

    def _decode_chunk(self, addr: int, nbytes: int,
                      filter_mask: int) -> np.ndarray:
        """One stored chunk -> its (chunk_shape) array, filters undone."""
        cs = self._chunk_shape
        raw = self._file._read(addr, nbytes)
        # filter_mask bit i = i-th PIPELINE-POSITION filter was
        # skipped for this chunk (spec IV.A.2.l) — not bit 0 ==
        # deflate; undo unskipped filters in reverse order
        for idx in range(len(self._filters) - 1, -1, -1):
            fid, cd = self._filters[idx]
            if filter_mask & (1 << idx):
                continue
            if fid == 1:
                # bound the inflate by the declared chunk size —
                # a corrupted stream must not balloon memory
                cap = int(np.prod(cs)) * self.dtype.itemsize
                try:
                    d = zlib.decompressobj()
                    raw = d.decompress(raw, cap + 1)
                except zlib.error as e:
                    raise ValueError(
                        f"hdf5: bad deflate chunk ({e})") from None
                if len(raw) > cap:
                    raise ValueError(
                        "hdf5: deflate chunk inflates past the "
                        "declared chunk size")
            elif fid == 2:
                raw = _unshuffle(raw, self.dtype.itemsize)
            else:
                raise ValueError(f"hdf5: filter {fid} not supported")
        block = np.frombuffer(raw, dtype=self.dtype)
        return block[:int(np.prod(cs))].reshape(cs)

    @_strict
    def read_window(self, sel) -> np.ndarray:
        """Windowed read: ``sel`` is one (start, stop) pair per
        dimension.  Chunked layouts decode ONLY the chunks the window
        intersects (the chunk B-tree is the index); contiguous layouts
        read the covering row-major byte span with leading single-index
        dims folded into the base address.  This is the decode-lazy
        path the NetCDF-4 raster adapter serves tiles from — a window
        of one band never pays for the other bands' chunks."""
        f = self._file
        if self.dtype is None:
            raise ValueError("hdf5: dataset has no decodable datatype")
        shape = self.shape if self.shape else (1,)
        if len(sel) != len(shape):
            raise ValueError("hdf5: window rank != dataset rank")
        sel = [(min(max(int(a), 0), shape[d]), min(max(int(b), 0), shape[d]))
               for d, (a, b) in enumerate(sel)]
        if any(b < a for a, b in sel):
            raise ValueError("hdf5: inverted window")
        out_shape = tuple(b - a for a, b in sel)
        n = int(np.prod(out_shape)) if out_shape else 1
        it = max(self.dtype.itemsize, 1)
        # Allocation bound: a corrupted dataspace can declare a PiB-scale
        # shape from a KB-scale file (found by corruption fuzz).  Deflate
        # and sparse/UNWRITTEN fill make logical size legitimately exceed
        # file size without limit (h5py's create_dataset-never-written is
        # a pure-fill contiguous dataset), so the bound stays absolute,
        # not a file-size ratio: cap the allocation at 4 GiB (raise
        # _MAX_DATASET_BYTES for bigger data).  The zero-fill fast path
        # keeps even the cap-sized allocation cheap for the
        # overwhelmingly common fillvalue.
        if n * it > _MAX_DATASET_BYTES:
            raise ValueError(
                f"hdf5: window shape {out_shape} implies "
                f"{n * self.dtype.itemsize} bytes "
                f"(> _MAX_DATASET_BYTES {_MAX_DATASET_BYTES})")
        if self.layout == "contiguous":
            if self._contig_addr is None or self._contig_addr == _UNDEF:
                return _full_fast(out_shape, self.fillvalue, self.dtype)
            base = self._contig_addr
            d0 = 0
            while d0 < len(shape) - 1 and sel[d0][1] - sel[d0][0] == 1:
                inner = int(np.prod(shape[d0 + 1:]))
                base += sel[d0][0] * inner * it
                d0 += 1
            inner = int(np.prod(shape[d0 + 1:])) if d0 + 1 < len(shape) \
                else 1
            a0, b0 = sel[d0]
            raw = f._read(base + a0 * inner * it, (b0 - a0) * inner * it)
            arr = np.frombuffer(raw, dtype=self.dtype).reshape(
                (b0 - a0,) + tuple(shape[d0 + 1:]))
            arr = arr[(slice(None),)
                      + tuple(slice(a, b) for a, b in sel[d0 + 1:])]
            return arr.reshape(out_shape)
        if self.layout == "chunked":
            out = _full_fast(out_shape, self.fillvalue, self.dtype)
            if out.ndim == 0:
                out = out.reshape(1)
            cs = self._chunk_shape
            if cs is None or len(cs) != len(shape):
                raise ValueError("hdf5: chunk rank != dataset rank")
            for off_idx, nbytes, filter_mask, addr in self._chunks():
                if any(o + c <= a or o >= b
                       for o, c, (a, b) in zip(off_idx, cs, sel)):
                    continue            # chunk outside the window
                block = self._decode_chunk(addr, nbytes, filter_mask)
                sel_out = []
                sel_blk = []
                for d in range(len(shape)):
                    o = off_idx[d]
                    a, b = sel[d]
                    lo = max(o, a)
                    hi = min(o + cs[d], b, shape[d])
                    sel_out.append(slice(lo - a, hi - a))
                    sel_blk.append(slice(lo - o, hi - o))
                out[tuple(sel_out)] = block[tuple(sel_blk)]
            return out
        raise ValueError(f"hdf5: layout {self.layout!r} not supported")


def _unshuffle(raw: bytes, itemsize: int) -> bytes:
    if itemsize <= 1:
        return raw
    a = np.frombuffer(raw, dtype=np.uint8)
    n = len(a) // itemsize
    return a[:n * itemsize].reshape(itemsize, n).T.tobytes()


def _shuffle(raw: bytes, itemsize: int) -> bytes:
    if itemsize <= 1:
        return raw
    a = np.frombuffer(raw, dtype=np.uint8)
    n = len(a) // itemsize
    return a[:n * itemsize].reshape(n, itemsize).T.tobytes()


def _parse_datatype(body: bytes):
    """Datatype message -> numpy dtype (fixed-point / IEEE float /
    fixed string)."""
    v_class = body[0]
    cls = v_class & 0x0F
    bits0 = body[1]
    (size,) = struct.unpack_from("<I", body, 4)
    if cls == 0:  # fixed-point
        big = bits0 & 1
        signed = (bits0 >> 3) & 1
        ch = ("i" if signed else "u")
        return np.dtype(f"{'>' if big else '<'}{ch}{size}")
    if cls == 1:  # float
        big = bits0 & 1
        return np.dtype(f"{'>' if big else '<'}f{size}")
    if cls == 3:  # string
        return np.dtype(f"S{size}")
    raise ValueError(f"hdf5: datatype class {cls} not supported")


def _parse_dataspace(body: bytes):
    ver = body[0]
    rank = body[1]
    if ver == 1:
        flags = body[2]
        off = 8
    elif ver == 2:
        flags = body[2]
        off = 4
    else:
        raise ValueError(f"hdf5: dataspace version {ver}")
    dims = struct.unpack_from(f"<{rank}Q", body, off)
    maxdims = None
    if flags & 1:
        maxdims = struct.unpack_from(f"<{rank}Q", body,
                                     off + 8 * rank)
    return tuple(int(d) for d in dims), maxdims


class _MemSrc:
    """In-memory ``read_range`` wrapper (no uri — never cached)."""

    __slots__ = ("_d",)
    uri = None

    def __init__(self, data):
        self._d = bytes(data)

    def read_range(self, off: int, n: int) -> bytes:
        return self._d[off:off + n]

    def size(self) -> int:
        return len(self._d)


class H5File:
    """Read-only classic-layout HDF5 file over bytes, a path, or any
    ``read_range``/``size`` source.

    RANGE-BACKED (r12, VERDICT r11 next #3): every structural walk —
    superblock, group/chunk B-trees, local heaps, object headers —
    issues byte-range reads through a 16 KiB-block metadata view of
    the source, and data payloads (contiguous spans, stored chunks)
    read through the caller's big-block source.  Opening a NetCDF-4
    catalog for a metadata-only query therefore fetches KBs per file,
    not the file, same as the GRIB/NetCDF-3 paths; a one-band window
    fetches just its intersecting chunks' bytes.  Bytes input keeps
    the eager in-memory behavior (the fuzz suites drive that path)."""

    @_strict
    def __init__(self, source):
        if isinstance(source, (bytes, bytearray)):
            src = _MemSrc(source)
        elif hasattr(source, "read_range"):
            src = source
        else:
            from rasterframes_spark.sources.rangeio import RangeSource
            src = RangeSource(str(source))
        from rasterframes_spark.sources.rangeio import meta_view
        self._src = src
        self._size = src.size()
        self._meta_src = meta_view(src)
        head = self._meta_src.read_range(0, 15)
        if head[:8] != _SIG:
            raise ValueError("not an HDF5 file (bad signature)")
        if len(head) < 15:
            raise ValueError("hdf5: truncated superblock")
        sb_ver = head[8]
        if sb_ver != 0:
            raise ValueError(
                f"hdf5: superblock version {sb_ver} not supported "
                "(classic v0 layout only)")
        size_off = head[13]
        size_len = head[14]
        if size_off != 8 or size_len != 8:
            raise ValueError("hdf5: only 8-byte offsets/lengths supported")
        # superblock v0: sig(8) versions/sizes(8) ks+flags(8)
        # base/free/eof/driver addrs(32) -> root symbol-table entry at
        # 56: link name off(8), OBJECT HEADER ADDR(8), cache(4+4+16)
        try:
            (self._root_hdr,) = struct.unpack_from(
                "<Q", self._mread(56 + 8, 8), 0)
            self.datasets: dict[str, _Dataset] = {}
            self.groups: set[str] = set()
            self.attrs: dict[str, dict] = {}
            self._load_group(self._root_hdr, "")
        except (struct.error, IndexError, KeyError) as e:
            # malformed-input contract: structural damage surfaces as
            # ValueError, never a raw struct/index error
            raise ValueError(f"hdf5: malformed file ({e})") from e

    def _read_via(self, src, addr: int, n: int) -> bytes:
        if addr < 0 or n < 0 or addr + n > self._size:
            raise ValueError("hdf5: address beyond end of file")
        b = src.read_range(addr, n)
        if len(b) < n:
            raise ValueError("hdf5: address beyond end of file")
        return b

    def _read(self, addr: int, n: int) -> bytes:
        """Payload read (contiguous span / stored chunk) — big blocks."""
        return self._read_via(self._src, addr, n)

    def _mread(self, addr: int, n: int) -> bytes:
        """Structural read (headers/B-trees/heaps) — 16 KiB blocks."""
        return self._read_via(self._meta_src, addr, n)

    # -- object headers ---------------------------------------------------

    def _messages(self, hdr_addr: int):
        """Yield (type, body) for a v1 object header incl. continuations.
        Each header block is fetched as ONE range read (messages never
        span blocks per the spec) and parsed from the local buffer."""
        pro = self._mread(hdr_addr, 16)
        ver = pro[0]
        if ver != 1:
            raise ValueError(f"hdf5: object header version {ver} "
                             "not supported (classic v1 only)")
        (nmsg,) = struct.unpack_from("<H", pro, 2)
        (hdr_size,) = struct.unpack_from("<I", pro, 8)
        blocks = [(hdr_addr + 16, hdr_size)]
        seen = 0
        while blocks and seen < nmsg:
            pos, remain = blocks.pop(0)
            blk = self._mread(pos, remain)
            off = 0
            while remain - off >= 8 and seen < nmsg:
                mtype, msize, _flags = struct.unpack_from("<HHB", blk, off)
                body = blk[off + 8:off + 8 + msize]
                off += 8 + msize
                seen += 1
                if mtype == 0x10:  # continuation
                    caddr, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((caddr, clen))
                    continue
                yield mtype, body

    def _load_group(self, hdr_addr: int, prefix: str):
        btree = heap = None
        attrs = {}
        for mtype, body in self._messages(hdr_addr):
            if mtype == 0x11:  # symbol table
                btree, heap = struct.unpack_from("<QQ", body, 0)
            elif mtype == 0x0C:
                k, v = _parse_attribute(body)
                attrs[k] = v
        self.attrs[prefix or "/"] = attrs
        if btree is None:
            return
        names = []
        self._walk_group_btree(btree, heap, names)
        for name, child_hdr in names:
            path = f"{prefix}/{name}"
            kinds = {t for t, _ in self._messages(child_hdr)}
            if 0x11 in kinds:
                self.groups.add(path)
                self._load_group(child_hdr, path)
            else:
                self._load_dataset(child_hdr, path)

    def _heap_str(self, heap_addr: int, off: int) -> str:
        hd = self._mread(heap_addr, 32)
        if hd[:4] != b"HEAP":
            raise ValueError("hdf5: bad local heap signature")
        (dsize,) = struct.unpack_from("<Q", hd, 8)
        (dseg,) = struct.unpack_from("<Q", hd, 24)
        # bounded NUL scan in growing chunks.  The bound is the heap's
        # OWN declared data-segment size (ADVICE r12 #4 — a fixed 4096
        # rejected spec-legal link names longer than that), further
        # clamped by the file size, so a corrupt header still can't
        # demand more than one linear pass over real bytes.
        pos = dseg + off
        if off >= dsize:
            raise ValueError("hdf5: heap string offset past data segment")
        limit = min(dsize - off, max(0, self._size - pos))
        if limit <= 0:
            raise ValueError("hdf5: heap string past end of file")
        buf = b""
        step = 64
        while len(buf) < limit:
            n = min(step, limit - len(buf))
            buf += self._mread(pos + len(buf), n)
            i = buf.find(0)
            if i >= 0:
                return buf[:i].decode("utf-8")
            step *= 2
        raise ValueError("hdf5: unterminated heap string")

    def _walk_group_btree(self, addr: int, heap: int, out: list):
        hd = self._mread(addr, 8)
        if hd[:4] != b"TREE":
            raise ValueError("hdf5: bad group B-tree signature")
        node_type = hd[4]
        level = hd[5]
        (used,) = struct.unpack_from("<H", hd, 6)
        if node_type != 0:
            raise ValueError("hdf5: wrong btree node type in group")
        # keys/children: key0 child0 key1 child1 ... key_used
        ents = self._mread(addr + 8 + 16, used * 16)
        p = 0
        for i in range(used):
            p += 8  # key (heap offset)
            (child,) = struct.unpack_from("<Q", ents, p)
            p += 8
            if level > 0:
                self._walk_group_btree(child, heap, out)
            else:
                self._read_snod(child, heap, out)

    def _read_snod(self, addr: int, heap: int, out: list):
        hd = self._mread(addr, 8)
        if hd[:4] != b"SNOD":
            raise ValueError("hdf5: bad SNOD signature")
        (nsym,) = struct.unpack_from("<H", hd, 6)
        ents = self._mread(addr + 8, nsym * 40)  # entry: 8+8+4+4+16
        for k in range(nsym):
            name_off, hdr = struct.unpack_from("<QQ", ents, k * 40)
            out.append((self._heap_str(heap, name_off), hdr))

    def _load_dataset(self, hdr_addr: int, path: str):
        ds = _Dataset(path, self)
        for mtype, body in self._messages(hdr_addr):
            if mtype == 0x01:
                ds.shape, ds.maxshape = _parse_dataspace(body)
            elif mtype == 0x03:
                ds.dtype = _parse_datatype(body)
            elif mtype == 0x05:
                ds._fill_raw = _parse_fillvalue(body)
            elif mtype == 0x08:
                self._parse_layout(body, ds)
            elif mtype == 0x0B:
                ds._filters = _parse_filters(body)
            elif mtype == 0x0C:
                k, v = _parse_attribute(body)
                ds.attrs[k] = v
        self.datasets[path] = ds

    def _parse_layout(self, body: bytes, ds: _Dataset):
        ver = body[0]
        if ver != 3:
            raise ValueError(f"hdf5: data layout version {ver} "
                             "not supported")
        cls = body[1]
        if cls == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", body, 2)
            ds.layout = "contiguous"
            ds._contig_addr = addr
            ds._contig_size = size
        elif cls == 2:  # chunked
            dim = body[2]
            (btree,) = struct.unpack_from("<Q", body, 3)
            dims = struct.unpack_from(f"<{dim}I", body, 11)
            ds.layout = "chunked"
            ds._btree_addr = btree
            ds._chunk_shape = tuple(int(x) for x in dims[:-1])
        elif cls == 0:  # compact
            (size,) = struct.unpack_from("<H", body, 2)
            ds.layout = "contiguous"
            # compact data inline: stash directly
            raise ValueError("hdf5: compact layout not supported")
        else:
            raise ValueError(f"hdf5: layout class {cls} not supported")

    def _walk_chunk_btree(self, addr: int, rank: int, out: list,
                          _seen: set | None = None, _depth: int = 0):
        if addr == _UNDEF:
            return
        if _seen is None:
            _seen = set()
        if addr in _seen:               # corrupt files can self-link;
            raise ValueError("hdf5: cyclic chunk B-tree")
        _seen.add(addr)
        if _depth > 64:                 # and fake unbounded depth
            raise ValueError("hdf5: chunk B-tree too deep")
        hd = self._mread(addr, 8)
        if hd[:4] != b"TREE":
            raise ValueError("hdf5: bad chunk B-tree signature")
        node_type = hd[4]
        level = hd[5]
        (used,) = struct.unpack_from("<H", hd, 6)
        if node_type != 1:
            raise ValueError("hdf5: wrong btree node type for chunks")
        key_size = 8 + 8 * (rank + 1)
        if addr + 8 + 16 + used * (key_size + 8) > self._size:
            raise ValueError("hdf5: chunk B-tree node past end of file")
        ents = self._mread(addr + 8 + 16, used * (key_size + 8))
        p = 0
        for i in range(used):
            nbytes, fmask = struct.unpack_from("<II", ents, p)
            offs = struct.unpack_from(f"<{rank + 1}Q", ents, p + 8)
            p += key_size
            (child,) = struct.unpack_from("<Q", ents, p)
            p += 8
            if level > 0:
                self._walk_chunk_btree(child, rank, out, _seen,
                                       _depth + 1)
            else:
                out.append((tuple(int(o) for o in offs[:rank]),
                            nbytes, fmask, child))


def _parse_fillvalue(body: bytes) -> bytes:
    """Fill-value message -> raw fill bytes (b'' = undefined).  The bytes
    are typed by the dataset's datatype message, which may arrive after
    this one — interpretation is deferred to _Dataset.fillvalue."""
    ver = body[0]
    if ver in (1, 2):
        defined = body[3]
        if ver == 2 and not defined:
            return b""
        (sz,) = struct.unpack_from("<I", body, 4)
        return body[8:8 + sz]
    (sz,) = struct.unpack_from("<I", body, 4)
    return body[8:8 + sz]


def _parse_filters(body: bytes):
    ver = body[0]
    nf = body[1]
    out = []
    if ver == 1:
        p = 8
    else:
        p = 2
    for _ in range(nf):
        fid, namelen, _flags, ncd = struct.unpack_from("<HHHH", body, p)
        p += 8
        if ver == 1 or fid >= 256:
            name = body[p:p + namelen]
            p += namelen
            _ = name
        cd = struct.unpack_from(f"<{ncd}I", body, p)
        p += 4 * ncd
        if ver == 1 and ncd % 2:
            p += 4  # padding
        out.append((fid, tuple(cd)))
    return out


def _parse_attribute(body: bytes):
    ver = body[0]
    if ver != 1:
        raise ValueError(f"hdf5: attribute version {ver} not supported")
    name_sz, dt_sz, sp_sz = struct.unpack_from("<HHH", body, 2)
    p = 8

    def pad8(x):
        return (x + 7) & ~7

    name = body[p:p + name_sz].split(b"\x00")[0].decode()
    p += pad8(name_sz)
    dt = _parse_datatype(body[p:p + dt_sz])
    p += pad8(dt_sz)
    shape, _ = _parse_dataspace(body[p:p + sp_sz])
    p += pad8(sp_sz)
    n = int(np.prod(shape)) if shape else 1
    raw = body[p:p + n * dt.itemsize]
    if dt.kind == "S":
        return name, raw.rstrip(b"\x00").decode("utf-8", "replace")
    vals = np.frombuffer(raw, dtype=dt)
    if shape == () or n == 1:
        return name, vals[0].item()
    return name, vals.reshape(shape)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

class H5Writer:
    """Classic-layout writer: root group (+ one level of subgroups),
    contiguous or chunked datasets, deflate/shuffle filters, scalar/
    string/array attributes."""

    def __init__(self):
        self._datasets = []   # (path, array, chunks, compression, attrs)
        self._group_attrs = {"": {}}

    def create_dataset(self, name, data, chunks=None, compression=None,
                       shuffle=False, attrs=None, fillvalue=None):
        """``fillvalue`` (typed by the data's dtype) writes a defined
        fill-value message, and all-fill chunks are left unallocated —
        the libhdf5 posture for sparse datasets."""
        a = np.asarray(data)
        if a.dtype.kind not in "iuf" and a.dtype.kind != "S":
            raise ValueError(f"hdf5 write: dtype {a.dtype} not supported")
        self._datasets.append((name.strip("/"), a, chunks, compression,
                               bool(shuffle), dict(attrs or {}), fillvalue))

    def set_group_attrs(self, group: str, attrs: dict):
        self._group_attrs[group.strip("/")] = dict(attrs)

    # -- low-level emit helpers -------------------------------------------

    def tobytes(self) -> bytes:
        out = bytearray()
        out += b"\x00" * 2048  # reserve superblock + root structures
        # group tree: root -> {name: hdr_addr}; one nesting level
        tree: dict[str, dict] = {"": {}}
        for path, a, chunks, comp, shuf, attrs, fill in self._datasets:
            parts = path.split("/")
            if len(parts) == 2:
                tree.setdefault(parts[0], {})
            elif len(parts) > 2:
                raise ValueError("hdf5 write: one group level supported")

        ds_addr = {}
        for path, a, chunks, comp, shuf, attrs, fill in self._datasets:
            ds_addr[path] = self._emit_dataset(out, a, chunks, comp, shuf,
                                               attrs, fill)

        group_hdr = {}
        for gname, members in list(tree.items()):
            if gname == "":
                continue
            ents = {p.split("/", 1)[1]: ds_addr[p]
                    for p, *_ in self._datasets
                    if p.startswith(gname + "/")}
            group_hdr[gname] = self._emit_group(
                out, ents, self._group_attrs.get(gname, {}))
        root_ents = {p: ds_addr[p] for p, *_ in self._datasets
                     if "/" not in p}
        root_ents.update(group_hdr)
        root_hdr, root_btree, root_heap = self._emit_group(
            out, root_ents, self._group_attrs.get("", {}), ret_parts=True)

        # superblock v0
        sb = bytearray()
        sb += _SIG
        sb += bytes([0, 0, 0, 0, 0, 8, 8, 0])
        sb += struct.pack("<HHI", 4, 16, 0)           # leaf k, internal k, flags
        sb += struct.pack("<QQQQ", 0, _UNDEF, len(out), _UNDEF)
        # root symbol table entry
        sb += struct.pack("<QQII", 0, root_hdr, 1, 0)
        sb += struct.pack("<QQ", root_btree, root_heap)
        out[:len(sb)] = sb
        return bytes(out)

    def _emit_dataset(self, out, a, chunks, comp, shuf, attrs, fill=None):
        dt_msg = _mk_datatype(a.dtype)
        sp_msg = _mk_dataspace(a.shape)
        filters = []
        if shuf:
            filters.append((2, (a.dtype.itemsize,)))
        if comp in ("gzip", "deflate"):
            filters.append((1, (6,)))
        if fill is None:
            fill_msg = bytes([2, 2, 2, 0])
        else:
            raw_fill = np.asarray(fill, dtype=a.dtype).tobytes()
            fill_msg = bytes([2, 2, 2, 1]) \
                + struct.pack("<I", len(raw_fill)) + raw_fill
        msgs = [(0x01, sp_msg), (0x03, dt_msg), (0x05, fill_msg)]
        if chunks is None:
            raw = np.ascontiguousarray(a).tobytes()
            addr = _append(out, raw)
            lay = bytes([3, 1]) + struct.pack("<QQ", addr, len(raw))
            msgs.append((0x08, lay))
        else:
            cs = tuple(int(c) for c in chunks)
            if len(cs) != a.ndim:
                raise ValueError("hdf5 write: chunks rank mismatch")
            deflate_pos = next((i for i, (fid, _) in enumerate(filters)
                                if fid == 1), None)
            entries = []
            for idx in np.ndindex(*[-(-s // c) for s, c in
                                    zip(a.shape, cs)]):
                off = tuple(i * c for i, c in zip(idx, cs))
                block = np.zeros(cs, dtype=a.dtype)
                sel = tuple(slice(o, min(o + c, s))
                            for o, c, s in zip(off, cs, a.shape))
                bsel = tuple(slice(0, sl.stop - sl.start) for sl in sel)
                block[bsel] = a[sel]
                if fill is not None and np.all(a[sel] == np.asarray(
                        fill, dtype=a.dtype)):
                    continue          # all-fill chunk stays unallocated
                raw = block.tobytes()
                mask = 0
                for fid, cd in filters:
                    if fid == 2:
                        raw = _shuffle(raw, a.dtype.itemsize)
                    elif fid == 1:
                        z = zlib.compress(raw, cd[0])
                        if len(z) < len(raw):
                            raw = z
                        else:
                            # optional deflate grew the chunk: store it
                            # unfiltered, flag by PIPELINE POSITION
                            mask |= 1 << deflate_pos
                addr = _append(out, raw)
                entries.append((off, len(raw), mask, addr))
            btree = self._emit_chunk_btree(out, entries, a.ndim, cs,
                                           a.dtype.itemsize)
            lay = bytes([3, 2, a.ndim + 1]) + struct.pack("<Q", btree) \
                + struct.pack(f"<{a.ndim}I", *cs) \
                + struct.pack("<I", a.dtype.itemsize)
            msgs.append((0x08, lay))
            if filters:
                msgs.append((0x0B, _mk_filters(filters)))
        for k, v in attrs.items():
            msgs.append((0x0C, _mk_attribute(k, v)))
        return _emit_v1_header(out, msgs)

    def _emit_chunk_btree(self, out, entries, rank, cs, itemsize):
        key_size = 8 + 8 * (rank + 1)
        node = bytearray()
        node += b"TREE" + bytes([1, 0]) + struct.pack("<H", len(entries))
        node += struct.pack("<QQ", _UNDEF, _UNDEF)
        for off, nbytes, mask, addr in entries:
            node += struct.pack("<II", nbytes, mask)
            node += struct.pack(f"<{rank}Q", *off) + struct.pack("<Q", 0)
            node += struct.pack("<Q", addr)
        # trailing key
        node += struct.pack("<II", 0, 0)
        node += struct.pack(f"<{rank}Q", *([0] * rank)) \
            + struct.pack("<Q", itemsize)
        _ = key_size
        return _append(out, bytes(node))

    def _emit_group(self, out, entries: dict, attrs: dict,
                    ret_parts: bool = False):
        # local heap with names
        names = sorted(entries)
        heap_data = bytearray(b"\x00" * 8)
        offs = {}
        for n in names:
            offs[n] = len(heap_data)
            heap_data += n.encode() + b"\x00"
            while len(heap_data) % 8:
                heap_data += b"\x00"
        dseg_addr = _append(out, bytes(heap_data))
        heap = bytearray()
        heap += b"HEAP" + bytes([0, 0, 0, 0])
        heap += struct.pack("<QQQ", len(heap_data), _UNDEF, dseg_addr)
        heap_addr = _append(out, bytes(heap))
        # one SNOD with all entries (k<=4 means <=8 symbols/leaf; allow
        # more by chaining? keep: raise if too many)
        if len(names) > 32:
            raise ValueError("hdf5 write: too many entries in one group")
        snod = bytearray()
        snod += b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names))
        for n in names:
            snod += struct.pack("<QQII", offs[n], entries[n], 0, 0)
            snod += b"\x00" * 16
        snod_addr = _append(out, bytes(snod))
        btree = bytearray()
        btree += b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
        btree += struct.pack("<QQ", _UNDEF, _UNDEF)
        btree += struct.pack("<Q", 0)             # key 0
        btree += struct.pack("<Q", snod_addr)     # child
        btree += struct.pack("<Q", offs[names[-1]] if names else 0)
        btree_addr = _append(out, bytes(btree))
        msgs = [(0x11, struct.pack("<QQ", btree_addr, heap_addr))]
        for k, v in attrs.items():
            msgs.append((0x0C, _mk_attribute(k, v)))
        hdr = _emit_v1_header(out, msgs)
        if ret_parts:
            return hdr, btree_addr, heap_addr
        return hdr


def _append(out: bytearray, data: bytes) -> int:
    while len(out) % 8:
        out += b"\x00"
    addr = len(out)
    out += data
    return addr


def _emit_v1_header(out: bytearray, msgs) -> int:
    body = bytearray()
    for mtype, mb in msgs:
        while len(mb) % 8:
            mb = mb + b"\x00"
        body += struct.pack("<HHB", mtype, len(mb), 0) + b"\x00\x00\x00"
        body += mb
    hdr = bytearray()
    hdr += bytes([1, 0]) + struct.pack("<H", len(msgs))
    hdr += struct.pack("<I", 0)               # ref count
    hdr += struct.pack("<I", len(body)) + b"\x00" * 4
    hdr += body
    return _append(out, bytes(hdr))


def _mk_filters(filters) -> bytes:
    body = bytearray()
    body += bytes([1, len(filters)]) + b"\x00" * 6
    for fid, cd in filters:
        name = {1: b"deflate\x00", 2: b"shuffle\x00"}.get(fid, b"")
        body += struct.pack("<HHHH", fid, len(name), 1, len(cd))
        body += name
        body += struct.pack(f"<{len(cd)}I", *cd)
        if len(cd) % 2:
            body += b"\x00" * 4
    return bytes(body)


def _mk_datatype(dt: np.dtype) -> bytes:
    if dt.kind in "iu":
        bits0 = (1 if dt.byteorder == ">" else 0) \
            | (0x08 if dt.kind == "i" else 0)
        return bytes([0x10 | 0, bits0, 0, 0]) \
            + struct.pack("<I", dt.itemsize) \
            + struct.pack("<HH", 0, dt.itemsize * 8)
    if dt.kind == "f":
        big = dt.byteorder == ">"
        if dt.itemsize == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        bits0 = (1 if big else 0) | 0x20  # sign location flagged below
        # bit field: byte0 bit0 order, bits 1-3 pad, bits 4-5 mantissa
        # norm (2 = msb set), byte1 = sign location
        b0 = (1 if big else 0) | (2 << 4)
        b1 = 31 if dt.itemsize == 4 else 63
        _ = bits0
        return bytes([0x10 | 1, b0, b1, 0]) \
            + struct.pack("<I", dt.itemsize) + props
    if dt.kind == "S":
        return bytes([0x10 | 3, 0, 0, 0]) + struct.pack("<I", dt.itemsize)
    raise ValueError(f"hdf5 write: dtype {dt} not supported")


def _mk_dataspace(shape) -> bytes:
    rank = len(shape)
    return bytes([1, rank, 0, 0]) + b"\x00" * 4 \
        + struct.pack(f"<{rank}Q", *shape)


def _mk_attribute(name: str, value) -> bytes:
    if isinstance(value, str):
        enc = value.encode("utf-8")
        dt = np.dtype(f"S{max(len(enc), 1)}")
        a = np.frombuffer(enc.ljust(dt.itemsize, b"\x00"), dtype=dt)
    else:
        a = np.atleast_1d(np.asarray(value))
        dt = a.dtype
        if dt.kind not in "iufS":
            raise ValueError(f"hdf5 write: attr dtype {dt}")
    nb = name.encode() + b"\x00"
    dt_msg = _mk_datatype(dt)
    sp_msg = _mk_dataspace(a.shape if a.shape != (1,) else ())

    def pad8(b):
        return b + b"\x00" * ((8 - len(b) % 8) % 8)

    return struct.pack("<BBHHH", 1, 0, len(nb), len(dt_msg), len(sp_msg)) \
        + pad8(nb) + pad8(dt_msg) + pad8(sp_msg) + a.tobytes()


# ---------------------------------------------------------------------------
# NetCDF-4 mapping
# ---------------------------------------------------------------------------

def apply_cf_nc4(a: np.ndarray, attrs: dict) -> np.ndarray:
    """CF scale_factor/add_offset/_FillValue for NetCDF-4 variables —
    ONE implementation shared by the full reader and the windowed
    raster adapter so the lazy path cannot drift from the eager one."""
    if a.dtype.kind not in "iuf":
        return a
    fill = attrs.get("_FillValue")
    scale = attrs.get("scale_factor")
    off = attrs.get("add_offset")
    if fill is None and scale is None and off is None:
        return a
    a = a.astype("float64")
    if fill is not None:
        a[a == fill] = np.nan
    if scale is not None:
        a = a * float(scale)
    if off is not None:
        a = a + float(off)
    return a


def read_netcdf4(source) -> dict:
    """NetCDF-4 (= HDF5) -> {"variables": {name: (array, attrs)},
    "attrs": global attrs} with CF scale_factor/add_offset/_FillValue
    applied — the same surface sources/netcdf.py exposes for NetCDF-3."""
    f = H5File(source)
    out = {"variables": {}, "attrs": dict(f.attrs.get("/", {}))}
    for path, ds in f.datasets.items():
        name = path.lstrip("/")
        out["variables"][name] = (apply_cf_nc4(ds.read(), dict(ds.attrs)),
                                  dict(ds.attrs))
    return out


def read_netcdf4_meta(source) -> dict:
    """Metadata-only NetCDF-4 view: {"variables": {name: _Dataset},
    "attrs": global attrs} — shapes/dtypes/attrs from the object
    headers, NOTHING decoded.  Callers window-read the datasets they
    actually need (``_Dataset.read_window``); the raster adapter's
    read_info path uses this so listing a catalog of NetCDF-4 scenes
    costs header walks, not per-variable decodes."""
    f = H5File(source)
    return {"variables": {p.lstrip("/"): ds
                          for p, ds in f.datasets.items()},
            "attrs": dict(f.attrs.get("/", {}))}
