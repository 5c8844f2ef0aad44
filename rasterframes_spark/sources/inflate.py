"""Bounded zlib decompression shared by the web-ingest parsers.

Crawled corpora contain decompression bombs: a few KB of deflate that
inflates to many GB.  Every place the ingest chain decompresses
attacker-controlled bytes (WARC gzip members, Content-Encoding bodies,
DOCX/EPUB zip entries, PDF FlateDecode streams, gzipped man pages) must
inflate INCREMENTALLY against an output cap instead of calling
``zlib.decompress`` on the whole buffer — one bomb record must cost one
``ValueError``, not one executor.

``MAX_DECOMPRESSED_BYTES`` (256 MiB) is the shared per-record default;
each reader accepts a cap override for corpora with known-larger
legitimate documents.
"""
from __future__ import annotations

import zlib

__all__ = ["MAX_DECOMPRESSED_BYTES", "inflate_bounded",
           "decompress_bounded"]

#: Per-record decompressed-output cap. 256 MiB comfortably exceeds any
#: legitimate single web document while bounding one task's exposure.
MAX_DECOMPRESSED_BYTES = 256 << 20


def inflate_bounded(d: "zlib._Decompress", data, cap: int,
                    what: str = "stream") -> bytes:
    """Run ``d.decompress`` over ``data`` in bounded slices.

    Raises ValueError the moment decompressed output exceeds ``cap``
    (memory use stays O(cap), never O(bomb)).  ``zlib.error`` from
    corrupt input propagates for the caller's existing handling.  The
    decompressobj's ``eof``/``unused_data`` state is left intact for
    multi-member streams (WARC)."""
    out = bytearray()
    buf = data
    while True:
        out += d.decompress(buf, cap + 1 - len(out))
        if len(out) > cap:
            raise ValueError(
                f"{what}: decompressed output exceeds the {cap}-byte cap "
                f"(decompression bomb?)")
        if d.eof:
            break
        buf = d.unconsumed_tail
        if not buf:
            break
    out += d.flush()
    if len(out) > cap:
        raise ValueError(
            f"{what}: decompressed output exceeds the {cap}-byte cap "
            f"(decompression bomb?)")
    return bytes(out)


def decompress_bounded(data, wbits: int = 15,
                       cap: int = MAX_DECOMPRESSED_BYTES,
                       what: str = "stream",
                       require_complete: bool = False) -> bytes:
    """One-shot bounded ``zlib.decompress`` replacement (single stream).

    Same exception contract as ``inflate_bounded``.  With
    ``require_complete=True`` a stream that ends before its terminator
    raises ValueError instead of silently returning a truncated prefix
    (zlib itself does not error on truncation)."""
    d = zlib.decompressobj(wbits=wbits)
    out = inflate_bounded(d, data, cap, what)
    if require_complete and not d.eof:
        raise ValueError(f"{what}: truncated compressed stream")
    return out
