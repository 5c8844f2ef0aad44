"""Office / ebook text extraction: DOCX (OOXML) and EPUB.

Both are ZIP containers (stdlib ``zipfile`` over in-memory bytes):

- DOCX: ``word/document.xml`` — WordprocessingML. Text lives in
  ``w:t`` runs grouped into ``w:p`` paragraphs; tabs/breaks have their
  own elements. Parsed with ``xml.etree`` (namespace-agnostic local
  names — real-world files mix namespace prefixes).
- EPUB: XHTML chapters referenced by the OPF spine (located through
  ``META-INF/container.xml``); each chapter runs through the SAME
  html_to_text pass as scraped web pages (``sources/html_text.py``),
  so ebook corpora inherit the tested extraction behavior. Files
  without a parseable spine fall back to all ``.x?html`` members in
  archive order.

Malformed input raises ValueError (shared corruption-fuzz discipline).
"""
from __future__ import annotations

import io
import posixpath
import re
import zipfile
import zlib
import xml.etree.ElementTree as ET

from .inflate import MAX_DECOMPRESSED_BYTES, decompress_bounded

__all__ = ["read_docx_text", "read_epub_text", "sniff_document_format",
           "write_docx", "write_epub", "read_man_text"]


def _zip(b: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(b))
    except (zipfile.BadZipFile, OverflowError) as e:
        raise ValueError(f"office: bad zip container ({e})") from None


def _zread(z: zipfile.ZipFile, name: str,
           cap: int = MAX_DECOMPRESSED_BYTES) -> bytes:
    # z.open().read(cap+1) streams the deflate: memory stays O(cap)
    # even when the entry is a zip bomb claiming terabytes.
    try:
        with z.open(name) as f:
            out = f.read(cap + 1)
    except (KeyError, zipfile.BadZipFile, OverflowError,
            NotImplementedError, ValueError, RuntimeError,
            EOFError, zlib.error) as e:
        # RuntimeError = zipfile's 'encrypted' path (a flipped flag bit
        # on corrupt input); zlib.error/EOFError = corrupt deflate data
        raise ValueError(f"office: cannot read {name!r} ({e})") from None
    if len(out) > cap:
        raise ValueError(
            f"office: {name!r} exceeds the {cap}-byte decompressed cap "
            f"(zip bomb?)")
    return out


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def read_docx_text(b: bytes) -> str:
    """DOCX bytes -> plain text (one line per paragraph, tabs and
    explicit breaks preserved)."""
    z = _zip(b)
    xmlb = _zread(z, "word/document.xml")
    try:
        root = ET.fromstring(xmlb)
    except ET.ParseError as e:
        raise ValueError(f"docx: bad document.xml ({e})") from None
    lines: list[str] = []

    def walk_para(p) -> str:
        parts: list[str] = []
        for el in p.iter():
            ln = _local(el.tag)
            if ln == "t":
                parts.append(el.text or "")
            elif ln == "tab":
                parts.append("\t")
            elif ln in ("br", "cr"):
                parts.append("\n")
        return "".join(parts)

    for el in root.iter():
        if _local(el.tag) == "p":
            lines.append(walk_para(el))
    return "\n".join(lines).strip("\n")


def _epub_spine(z: zipfile.ZipFile) -> list[str]:
    """Chapter paths in reading order via container.xml -> OPF spine."""
    container = _zread(z, "META-INF/container.xml")
    m = re.search(rb'full-path="([^"]+)"', container)
    if not m:
        raise ValueError("epub: container.xml has no rootfile path")
    opf_path = m.group(1).decode("utf-8", "replace")
    opf = _zread(z, opf_path)
    try:
        root = ET.fromstring(opf)
    except ET.ParseError as e:
        raise ValueError(f"epub: bad OPF ({e})") from None
    base = posixpath.dirname(opf_path)
    items: dict[str, str] = {}
    order: list[str] = []
    for el in root.iter():
        ln = _local(el.tag)
        if ln == "item" and el.get("id") and el.get("href"):
            items[el.get("id")] = el.get("href")
        elif ln == "itemref" and el.get("idref"):
            order.append(el.get("idref"))
    out = []
    for idref in order:
        href = items.get(idref)
        if href:
            out.append(posixpath.normpath(posixpath.join(base, href)))
    return out


def read_epub_text(b: bytes) -> str:
    """EPUB bytes -> plain text: spine-ordered chapters through the
    web HTML extractor (full visible text, not the boilerplate-pruned
    mode — books have no nav chrome worth pruning)."""
    from rasterframes_spark.sources.html_text import html_to_text

    z = _zip(b)
    try:
        chapters = _epub_spine(z)
    except ValueError:
        chapters = []
    if not chapters:   # unparseable OR empty/unresolvable spine
        chapters = [n for n in z.namelist()
                    if n.lower().endswith((".xhtml", ".html", ".htm"))]
    if not chapters:
        raise ValueError("epub: no readable chapters")
    texts = []
    for name in chapters:
        try:
            raw = _zread(z, name)
        except ValueError:
            continue
        texts.append(html_to_text(raw.decode("utf-8", "replace")))
    return "\n".join(t for t in texts if t)


def sniff_document_format(b: bytes) -> str | None:
    """Cheap magic/structure sniff: 'pdf' | 'docx' | 'epub' | 'html' |
    'man' | 'text' | None (binary junk).  Gzip payloads sniff their
    decompressed HEAD (first output block only — cheap, never a full
    inflate except for zip containers, which are bounded by the cap).
    Markdown deliberately sniffs as 'text':
    it IS plain text; routing to ``markdown_to_text`` is a corpus
    policy, not a container property."""
    if b[:2] == b"\x1f\x8b":
        # man pages ship gzipped in /usr/share/man; sniff the inside.
        # Inflate only the FIRST output block (8 KB) for the sniff —
        # pdf/html/man/text are all decided within the first 4 KB, so
        # inflating the full 256 MiB cap here (and again inside the
        # handler) wasted two full passes per gzip payload. Only a zip
        # container needs the whole archive (namelist reads the central
        # directory at the END), so a PK head falls back to the full
        # bounded inflate.
        try:
            head = zlib.decompressobj(31).decompress(b, 8192)
        except zlib.error:
            return None
        if head[:4] == b"PK\x03\x04":
            try:
                return sniff_document_format(
                    decompress_bounded(b, 31, what="sniff: gzip"))
            except (zlib.error, ValueError):
                return None
        return sniff_document_format(head)
    if b[:5] == b"%PDF-":
        return "pdf"
    if b[:4] == b"PK\x03\x04":
        try:
            names = set(_zip(b).namelist())
        except ValueError:
            return None
        if "word/document.xml" in names:
            return "docx"
        if "META-INF/container.xml" in names or "mimetype" in names:
            return "epub"
        return None
    low = b[:4096].lower()
    head = low.lstrip()[:256]
    # '<p>' alone is too weak (plain text ABOUT html mentions it); a
    # matching close tag or a body/doctype marker is the real signal
    if head.startswith((b"<!doctype html", b"<html")) or b"<body" in low \
            or (b"<p>" in low and b"</p>" in low):
        return "html"
    probe = b[:4096]
    # NUL bytes never appear in real text/troff documents — binary
    # junk, even when it happens to be UTF-8-decodable (e.g. the head
    # of an inflated zero-filled bomb)
    if b"\x00" in probe:
        return None
    # a multibyte sequence straddling the probe cut is NOT malformed —
    # trim up to 3 truncated trailing bytes before deciding (only when
    # the document actually continues past the probe)
    for cut in range(4 if len(b) > 4096 else 1):
        try:
            head = probe[:len(probe) - cut or None].decode("utf-8")
        except UnicodeDecodeError:
            continue
        # troff/man signature: the first non-comment line is a classic
        # page-structuring request (.TH/.Dd/.SH/.so). A mere line
        # starting with '.' is NOT enough — plain prose has those.
        for ln in head.split("\n"):
            s = ln.strip()
            if not s or s.startswith((".\\\"", "'\\\"", "\\\"")):
                continue
            if re.match(r"^[.'](TH|Dd|SH|so)(\s|$)", s):
                return "man"
            break
        return "text"
    return None


def write_docx(paragraphs) -> bytes:
    """[[run, ...], ...] -> minimal DOCX bytes ('\\t'/'\\n' runs become
    tab/break elements). The round-trip fixture generator for
    ``read_docx_text``; output opens in standard word processors."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = ['<?xml version="1.0"?>', f'<w:document xmlns:w="{w}"><w:body>']
    for p in paragraphs:
        runs = "".join(
            "<w:tab/>" if seg == "\t" else
            "<w:br/>" if seg == "\n" else
            '<w:r><w:t xml:space="preserve">'
            + seg.replace("&", "&amp;").replace("<", "&lt;")
            + "</w:t></w:r>"
            for seg in p)
        doc.append(f"<w:p>{runs}</w:p>")
    doc.append("</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", "".join(doc))
    return buf.getvalue()


def write_epub(chapters_html, spine_order=None) -> bytes:
    """[xhtml string, ...] -> minimal EPUB bytes with a real OPF spine
    (``spine_order``: optional permutation of chapter indexes)."""
    buf = io.BytesIO()
    order = list(spine_order) if spine_order is not None \
        else list(range(len(chapters_html)))
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
        items = []
        for i, html in enumerate(chapters_html):
            z.writestr(f"OEBPS/ch{i}.xhtml", html)
            items.append(f'<item id="c{i}" href="ch{i}.xhtml" '
                         f'media-type="application/xhtml+xml"/>')
        refs = "".join(f'<itemref idref="c{i}"/>' for i in order)
        z.writestr("META-INF/container.xml",
                   '<container><rootfiles><rootfile '
                   'full-path="OEBPS/content.opf"/>'
                   "</rootfiles></container>")
        z.writestr("OEBPS/content.opf",
                   '<package xmlns="http://www.idpf.org/2007/opf">'
                   f"<manifest>{''.join(items)}</manifest>"
                   f"<spine>{refs}</spine></package>")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# troff man pages — the system-documentation corpus format. Thousands of
# real (help2man/groff-produced) pages ship with any Linux image, so the
# extractor is validated on genuinely external fixtures.
# ---------------------------------------------------------------------------

_MAN_KEEP_ARG = {"SH", "SS", "B", "I", "BR", "RB", "BI", "IB", "IR",
                 "RI", "SM", "SB"}
_MAN_DROP = {"de", "ig", "if", "ie", "el", "ds", "nr", "so", "mso",
             "TH", "UC", "DT", "PD", "hy", "nh", "ad", "na", "ft",
             "ce", "in", "ti", "sp", "br", "ne", "ll", "rr", "rm",
             "tr", "ta", "nf", "fi", "EX", "EE", "UR", "UE", "MT", "ME"}


_MAN_GLYPHS = {"em": "—", "en": "–", "co": "©", "bu": "•", "aq": "'",
               "dq": '"', "cq": "'", "oq": "'", "ga": "`", "ha": "^",
               "ti": "~", "lq": "“", "rq": "”", "hy": "-", "rg": "®",
               "tm": "™", "de": "°", "+-": "±", "mu": "×", "di": "÷"}


def _man_args(arg: str) -> list[str]:
    """Tokenize a macro argument string respecting double quotes —
    ``"foo" "bar"`` -> [foo, bar] with no stray quotes."""
    return [q if q else p
            for q, p in re.findall(r'"([^"]*)"|(\S+)', arg)]


def _man_unescape(line: str) -> str:
    # font escapes: \fB \f(CW \f[CR]
    line = re.sub(r"\\f(\[[^\]]*\]|\([A-Za-z]{2}|[A-Za-z0-9])", "", line)
    # string registers: \*[name] \*(xx \*x — render known quote pairs,
    # drop the rest
    line = re.sub(
        r"\\\*(\[[^\]]*\]|\(..|.)",
        lambda m: _MAN_GLYPHS.get(m.group(1)[1:], ""), line)
    # special characters: \(xx and \[xx...] — known table, else dropped
    line = re.sub(
        r"\\\((..)|\\\[([^\]]*)\]",
        lambda m: _MAN_GLYPHS.get(m.group(1) or m.group(2), ""), line)
    return (line.replace("\\-", "-").replace("\\&", "")
            .replace("\\,", "").replace("\\/", "")
            .replace("\\e", "\\").replace("\\\\", "\\"))


def read_man_text(b: bytes) -> str:
    """troff/man bytes (optionally gzip-compressed, as shipped in
    /usr/share/man) -> plain text: macro lines reduced to their text
    arguments, font/string/special-character escapes resolved, comments
    (whole-line AND trailing ``\\"``), ``.de``/``.ig`` block bodies and
    layout-only requests dropped, continuation lines joined. ``.so``
    redirection stubs raise (the target page isn't in these bytes)."""
    if b[:2] == b"\x1f\x8b":
        try:
            b = decompress_bounded(b, 31, what="man: gzip page")
        except zlib.error as e:
            raise ValueError(f"man: bad gzip ({e})") from None
    try:
        text = b.decode("utf-8")
    except UnicodeDecodeError:
        text = b.decode("latin1")
    if not text.lstrip().startswith((".", "'", "\\")) \
            and "\n." not in text[:4096]:
        raise ValueError("man: no troff requests found")
    # join continuation lines BEFORE escape rendering (a trailing lone
    # backslash is a continuation; a literal one is spelled \e)
    text = text.replace("\\\n", "")
    out: list[str] = []
    in_block = False   # inside .de/.ig ... '..' body
    for raw in text.split("\n"):
        line = raw
        if in_block:
            if line.strip() == "..":
                in_block = False
            continue
        if line.startswith((".\\\"", "'\\\"", "\\\"")):
            continue
        # trailing \" comment (troff mid-line comment)
        line = re.sub(r'\\".*$', "", line)
        if line.startswith((".", "'")):
            parts = line[1:].strip().split(None, 1)
            if not parts:
                continue
            req = parts[0]
            arg = parts[1] if len(parts) > 1 else ""
            if req == "so":
                raise ValueError(
                    "man: .so redirection stub (target not in bytes)")
            if req in ("de", "ig", "de1", "am"):
                in_block = True
                continue
            if req in _MAN_DROP:
                continue
            if req in _MAN_KEEP_ARG:
                line = " ".join(_man_args(arg))
            elif req == "IP":
                # keep only the tag argument; the second arg is an
                # indentation width (the '.IP \(bu 2' bullet idiom)
                args = _man_args(arg)
                line = args[0] if args else ""
            elif req in ("PP", "P", "LP", "TP", "HP", "RS", "RE", "TQ"):
                line = ""
            else:
                continue   # unknown request: layout noise
        out.append(_man_unescape(line))
    joined = re.sub(r"\n{3,}", "\n\n", "\n".join(out))
    return joined.strip("\n")
