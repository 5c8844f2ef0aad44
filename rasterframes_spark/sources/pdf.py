"""Pure-python PDF text extraction (ISO 32000-1 subset).

The web-corpus document format a training pipeline actually meets: this
module parses the PDF object graph — classic cross-reference tables AND
PDF 1.5 cross-reference streams, object streams (/ObjStm), FlateDecode
with PNG predictors — walks the page tree with attribute inheritance,
and interprets the text operators of each page's content streams
(BT/ET, Tf, Td/TD/Tm/T*, Tj/TJ/'/") into per-page text.

Character decoding, in priority order per font: /ToUnicode CMap
(bfchar/bfrange), /Encoding with /Differences glyph names (AGL subset +
uniXXXX/uXXXX forms), the base encodings (Standard/WinAnsi/MacRoman ~
latin-1 here), and for embedded Type1 fonts without any of those the
builtin encoding recovered from the (eexec-encrypted) font program.

Scope: text extraction only — no rendering, no encryption (encrypted
docs raise ValueError), no LZW/JBIG2/DCT text (images are opaque).
Malformed input raises ValueError (mutation-fuzz discipline shared with
every other codec in sources/).

The reference has no document-format story at all; this is part of the
training-data-pipeline mandate (SURVEY §2.14). Validated against two
real-toolchain PDFs shipped with the OS image (pdfTeX and DocBook/FOP
lineage) plus an own-writer round-trip and corruption fuzz.
"""
from __future__ import annotations

import re
import struct
import zlib

from .inflate import decompress_bounded

__all__ = ["read_pdf_info", "pdf_extract_text", "write_pdf", "PdfInfo"]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Name(str):
    """A PDF name object (/Foo) — distinct from a string."""


class _Ref(tuple):
    """Indirect reference (num, gen)."""


class _Lexer:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d, p, n = self.data, self.pos, len(self.data)
        while p < n:
            c = d[p]
            if c in _WS:
                p += 1
            elif c == 0x25:  # % comment
                while p < n and d[p] not in (10, 13):
                    p += 1
            else:
                break
        self.pos = p

    def _token_end(self, p: int) -> int:
        d, n = self.data, len(self.data)
        while p < n and d[p] not in _WS and d[p] not in _DELIM:
            p += 1
        return p

    def parse(self):
        """One object at the cursor (recursive)."""
        self._skip_ws()
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("pdf: unexpected end of data")
        c = d[p]
        if c == 0x2F:  # /Name
            e = self._token_end(p + 1)
            raw = d[p + 1:e]
            self.pos = e
            # #xx hex escapes in names
            if b"#" in raw:
                raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                             lambda m: bytes([int(m.group(1), 16)]), raw)
            return _Name(raw.decode("latin1"))
        if c == 0x28:  # (string)
            return self._lit_string(p)
        if d[p:p + 2] == b"<<":
            return self._dict(p)
        if c == 0x3C:  # <hex string>
            e = d.index(b">", p)
            hx = re.sub(rb"\s", b"", d[p + 1:e])
            if len(hx) % 2:
                hx += b"0"
            self.pos = e + 1
            try:
                return bytes.fromhex(hx.decode("ascii"))
            except ValueError:
                raise ValueError("pdf: bad hex string") from None
        if c == 0x5B:  # [array]
            self.pos = p + 1
            out = []
            while True:
                self._skip_ws()
                if self.pos >= len(d):
                    raise ValueError("pdf: unterminated array")
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return out
                out.append(self.parse())
        e = self._token_end(p + (1 if c in b"+-" else 0))
        tok = d[p:e]
        if tok in (b"true", b"false"):
            self.pos = e
            return tok == b"true"
        if tok == b"null":
            self.pos = e
            return None
        # number, possibly "num gen R" / "num gen obj"
        try:
            if b"." in tok or b"e" in tok or b"E" in tok:
                val = float(tok)
                self.pos = e
                return val
            val = int(tok)
        except ValueError:
            raise ValueError(f"pdf: bad token {tok[:20]!r}") from None
        save = e
        lx = _Lexer(d, e)
        lx._skip_ws()
        e2 = lx._token_end(lx.pos)
        tok2 = d[lx.pos:e2]
        if tok2.isdigit():
            lx.pos = e2
            lx._skip_ws()
            e3 = lx._token_end(lx.pos)
            t3 = d[lx.pos:e3]
            if t3 == b"R":
                self.pos = e3
                return _Ref((val, int(tok2)))
        self.pos = save
        return val

    def _lit_string(self, p: int) -> bytes:
        d = self.data
        out = bytearray()
        depth = 1
        i = p + 1
        n = len(d)
        while i < n:
            c = d[i]
            if c == 0x5C:  # backslash
                if i + 1 >= n:
                    break
                nc = d[i + 1]
                if nc in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\f"}[nc]
                    i += 2
                elif nc in b"()\\":
                    out.append(nc)
                    i += 2
                elif 0x30 <= nc <= 0x37:  # octal \d{1,3}
                    j = i + 1
                    oct_s = bytearray()
                    while j < n and len(oct_s) < 3 and 0x30 <= d[j] <= 0x37:
                        oct_s.append(d[j])
                        j += 1
                    out.append(int(oct_s, 8) & 0xFF)
                    i = j
                elif nc in (10, 13):  # line continuation
                    i += 2
                    if nc == 13 and i < n and d[i] == 10:
                        i += 1
                else:
                    out.append(nc)
                    i += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise ValueError("pdf: unterminated string")

    def _dict(self, p: int):
        self.pos = p + 2
        d = self.data
        out = {}
        while True:
            self._skip_ws()
            if d[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.parse()
            if not isinstance(key, _Name):
                raise ValueError("pdf: dict key is not a name")
            out[str(key)] = self.parse()


def _png_unpredict(data: bytes, colors: int, columns: int) -> bytes:
    """Reverse PNG predictors (per PDF /DecodeParms, 8-bit comps)."""
    row = colors * columns
    if row <= 0 or len(data) % (row + 1):
        raise ValueError("pdf: bad predictor row size")
    out = bytearray()
    prev = bytearray(row)
    for r in range(len(data) // (row + 1)):
        ft = data[r * (row + 1)]
        line = bytearray(data[r * (row + 1) + 1:(r + 1) * (row + 1)])
        if ft == 0:
            pass
        elif ft == 1:
            for i in range(colors, row):
                line[i] = (line[i] + line[i - colors]) & 0xFF
        elif ft == 2:
            for i in range(row):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(row):
                a = line[i - colors] if i >= colors else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(row):
                a = line[i - colors] if i >= colors else 0
                b = prev[i]
                cc = prev[i - colors] if i >= colors else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                line[i] = (line[i] + pr) & 0xFF
        else:
            raise ValueError(f"pdf: unknown PNG predictor {ft}")
        out += line
        prev = line
    return bytes(out)


class PdfInfo:
    def __init__(self, version: str, n_pages: int):
        self.version = version
        self.n_pages = n_pages


class _Doc:
    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("pdf: missing %PDF header")
        self.data = data
        self.version = data[5:8].decode("latin1", "replace")
        self.xref: dict[int, tuple] = {}   # obj -> ("o", offset) | ("s", stm, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._objstm_loading: set[int] = set()
        self._load_xref()
        if "Encrypt" in self.trailer:
            raise ValueError("pdf: encrypted documents not supported")

    # -- xref ---------------------------------------------------------------

    def _load_xref(self):
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("pdf: no startxref")
        seen = set()
        queue = [int(m.group(1))]
        while queue:
            off = queue.pop(0)
            if off in seen:
                continue
            seen.add(off)
            if len(seen) > 4096:
                raise ValueError("pdf: xref chain too long")
            if off < 0 or off >= len(self.data):
                raise ValueError("pdf: xref offset out of range")
            if self.data[off:off + 4] == b"xref":
                trailer = self._load_xref_table(off)
            else:
                trailer = self._load_xref_stream(off)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            # hybrid-reference files (spec 7.5.8.4): the classic table's
            # companion XRefStm must be processed BEFORE Prev — it holds
            # the ObjStm-compressed entries the table marks free
            for key in ("XRefStm", "Prev"):
                nxt = trailer.get(key)
                if isinstance(nxt, (int, float)):
                    queue.append(int(nxt))

    def _load_xref_table(self, off: int) -> dict:
        lx = _Lexer(self.data, off + 4)
        while True:
            lx._skip_ws()
            if self.data[lx.pos:lx.pos + 7] == b"trailer":
                lx.pos += 7
                t = lx.parse()
                if not isinstance(t, dict):
                    raise ValueError("pdf: bad trailer")
                return t
            start = lx.parse()
            count = lx.parse()
            if not (isinstance(start, int) and isinstance(count, int)):
                raise ValueError("pdf: bad xref subsection header")
            lx._skip_ws()
            for i in range(count):
                ent = self.data[lx.pos:lx.pos + 20]
                if len(ent) < 18:
                    raise ValueError("pdf: truncated xref entry")
                try:
                    o = int(ent[0:10])
                except ValueError:
                    raise ValueError("pdf: bad xref entry") from None
                kind = ent[17:18]
                num = start + i
                if kind == b"n" and num not in self.xref:
                    self.xref[num] = ("o", o)
                lx.pos += 20

    def _load_xref_stream(self, off: int) -> dict:
        num, sd, raw = self._parse_stream_at(off)
        if sd.get("Type") != "XRef":
            raise ValueError("pdf: expected XRef stream")
        body = self._decode_stream(sd, raw)
        try:
            w = [int(x) for x in sd.get("W", [])]
            size = int(sd.get("Size", 0))
            index = [int(x) for x in sd.get("Index", [0, size])]
        except (TypeError, ValueError):
            raise ValueError("pdf: non-numeric XRef metadata") from None
        if len(w) != 3 or any(x < 0 for x in w) or sum(w) == 0:
            raise ValueError("pdf: bad XRef /W")
        if len(index) % 2:
            raise ValueError("pdf: odd-length XRef /Index")
        ew = sum(w)
        if len(body) < ew:
            raise ValueError("pdf: XRef stream too short")
        pos = 0
        for k in range(0, len(index), 2):
            start, count = int(index[k]), int(index[k + 1])
            for i in range(count):
                if pos + ew > len(body):
                    break
                f = []
                for width in w:
                    v = int.from_bytes(body[pos:pos + width], "big") \
                        if width else 1
                    pos += width
                    f.append(v)
                numi = start + i
                if numi in self.xref:
                    continue
                if f[0] == 1:
                    self.xref[numi] = ("o", f[1])
                elif f[0] == 2:
                    self.xref[numi] = ("s", f[1], f[2])
        return sd

    # -- objects ------------------------------------------------------------

    def resolve(self, obj):
        hops = 0
        while isinstance(obj, _Ref):
            obj = self.get(obj[0])
            hops += 1
            if hops > 64:   # '2 0 obj 2 0 R endobj' must not hang a task
                raise ValueError("pdf: indirect-reference cycle")
        return obj

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            return None
        if ent[0] == "o":
            n2, od, raw = self._parse_stream_at(ent[1], allow_plain=True)
            if n2 != num:
                raise ValueError(f"pdf: object {num} not at its offset")
            val = (od, raw) if raw is not None else od
        else:
            val = self._objstm_get(ent[1], ent[2])
        self._cache[num] = val
        return val

    def _parse_stream_at(self, off: int, allow_plain: bool = False):
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.data[off:off + 48])
        if not m:
            raise ValueError("pdf: expected 'n g obj'")
        lx = _Lexer(self.data, off + m.end())
        od = lx.parse()
        lx._skip_ws()
        if self.data[lx.pos:lx.pos + 6] != b"stream":
            if allow_plain:
                return int(m.group(1)), od, None
            raise ValueError("pdf: expected stream keyword")
        p = lx.pos + 6
        if self.data[p:p + 2] == b"\r\n":
            p += 2
        elif self.data[p:p + 1] in (b"\n", b"\r"):
            p += 1
        if not isinstance(od, dict):
            raise ValueError("pdf: stream without dict")
        ln = self.resolve(od.get("Length"))
        if not isinstance(ln, int) or ln < 0 or p + ln > len(self.data):
            raise ValueError("pdf: bad stream length")
        return int(m.group(1)), od, self.data[p:p + ln]

    def _decode_stream(self, sd: dict, raw: bytes) -> bytes:
        filters = self.resolve(sd.get("Filter"))
        if filters is None:
            return raw
        if not isinstance(filters, list):
            filters = [filters]
        parms = self.resolve(sd.get("DecodeParms"))
        if not isinstance(parms, list):
            parms = [parms]
        out = raw
        for i, f in enumerate(filters):
            f = str(self.resolve(f))
            pm = self.resolve(parms[i]) if i < len(parms) else None
            if f == "FlateDecode":
                # bounded inflate: a crawled flate bomb raises instead
                # of exhausting executor memory (shared ingest cap)
                try:
                    out = decompress_bounded(out, 15,
                                             what="pdf: flate stream")
                except zlib.error as e:
                    raise ValueError(f"pdf: bad flate stream ({e})") from None
                if isinstance(pm, dict):
                    pred = int(self.resolve(pm.get("Predictor", 1)) or 1)
                    if pred >= 10:
                        out = _png_unpredict(
                            out, int(self.resolve(pm.get("Colors", 1)) or 1),
                            int(self.resolve(pm.get("Columns", 1)) or 1))
                    elif pred != 1:
                        raise ValueError(f"pdf: predictor {pred} unsupported")
            elif f == "ASCIIHexDecode":
                hx = re.sub(rb"[\s>]", b"", out)
                if len(hx) % 2:
                    hx += b"0"
                try:
                    out = bytes.fromhex(hx.decode("ascii"))
                except (ValueError, UnicodeDecodeError):
                    raise ValueError("pdf: bad ASCIIHex stream") from None
            else:
                raise ValueError(f"pdf: filter {f} not supported for text")
        return out

    def _objstm_get(self, stm_num: int, idx: int):
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            # an xref claiming the stream lives inside itself (or a loop
            # of streams) would recurse forever — refuse re-entry
            if stm_num in self._objstm_loading:
                raise ValueError("pdf: object-stream reference cycle")
            self._objstm_loading.add(stm_num)
            try:
                got = self.get(stm_num)
            finally:
                self._objstm_loading.discard(stm_num)
            if not (isinstance(got, tuple) and isinstance(got[0], dict)):
                raise ValueError("pdf: object stream missing")
            sd, raw = got
            body = self._decode_stream(sd, raw)
            try:
                n = int(self.resolve(sd.get("N", 0)))
                first = int(self.resolve(sd.get("First", 0)))
            except (TypeError, ValueError):
                raise ValueError("pdf: bad ObjStm metadata") from None
            lx = _Lexer(body, 0)
            heads = []
            for _ in range(n):
                onum = lx.parse()
                ooff = lx.parse()
                heads.append((int(onum), int(ooff)))
            objs = []
            for onum, ooff in heads:
                ox = _Lexer(body, first + ooff)
                objs.append(ox.parse())
            self._objstm_cache[stm_num] = objs
        if idx >= len(objs):
            raise ValueError("pdf: object stream index out of range")
        return objs[idx]

    # -- pages --------------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("pdf: no document catalog")
        top = self.resolve(root.get("Pages"))
        out: list[dict] = []
        stack = [(top, {})]
        seen = 0
        while stack:
            node, inherited = stack.pop()
            node = self.resolve(node)
            if not isinstance(node, dict):
                continue
            seen += 1
            if seen > 100_000:
                raise ValueError("pdf: page tree too large / cyclic")
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == "Page" or (
                    "Contents" in node and "Kids" not in node):
                pg = dict(node)
                for k, v in inh.items():
                    pg.setdefault(k, v)
                out.append(pg)
            else:
                kids = self.resolve(node.get("Kids")) or []
                for kid in reversed(kids):
                    stack.append((kid, inh))
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        parts = c if isinstance(c, list) else [c]
        out = []
        for part in parts:
            part = self.resolve(part)
            if isinstance(part, tuple) and isinstance(part[0], dict):
                out.append(self._decode_stream(part[0], part[1]))
        return b"\n".join(out)


# ---------------------------------------------------------------------------
# font decoding
# ---------------------------------------------------------------------------

# Adobe Glyph List subset: the names produced by the common subsetters
# (TeX, Ghostscript/Nimbus, FOP) for Latin text. Single letters and
# digits map through the fallback rules below.
_GLYPHS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ",
    "ffl": "ﬄ", "bullet": "•", "ellipsis": "…",
    "dotlessi": "ı", "germandbls": "ß", "oe": "œ",
    "OE": "Œ", "ae": "æ", "AE": "Æ", "copyright": "©",
    "registered": "®", "trademark": "™", "degree": "°",
    "minus": "−", "multiply": "×", "divide": "÷",
    "sterling": "£", "euro": "€", "yen": "¥",
    "cent": "¢", "section": "§", "paragraph": "¶",
    "daggerdbl": "‡", "dagger": "†", "tilde": "˜",
    "circumflex": "ˆ", "quotedblbase": "„",
    "quotesinglbase": "‚", "guillemotleft": "«",
    "guillemotright": "»", "exclamdown": "¡",
    "questiondown": "¿",
}


def _glyph_char(name: str) -> str:
    if len(name) == 1:
        return name
    if name in _GLYPHS:
        return _GLYPHS[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        return chr(int(m.group(1), 16))
    # accented composites like 'eacute' are in neither table here —
    # approximate with the base letter rather than dropping the glyph
    if name and name[0].isalpha():
        return name[0]
    return "�"


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """bfchar/bfrange sections of a ToUnicode CMap -> code -> text."""
    out: dict[int, str] = {}

    def u(hx: bytes) -> str:
        b = bytes.fromhex(hx.decode("ascii"))
        if len(b) % 2:
            b = b"\x00" + b
        return b.decode("utf-16-be", "replace")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                                   m.group(1)):
            out[int(src, 16)] = u(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        body = m.group(1)
        for lo, hi, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                body):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = int(dst, 16)
            if hi_i - lo_i > 65535:
                raise ValueError("pdf: bfrange too large")
            for c in range(lo_i, hi_i + 1):
                out[c] = chr(base + (c - lo_i)) \
                    if base + (c - lo_i) <= 0x10FFFF else "�"
        for lo, hi, arr in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]",
                body, re.S):
            dsts = re.findall(rb"<([0-9A-Fa-f]+)>", arr)
            for k, c in enumerate(range(int(lo, 16), int(hi, 16) + 1)):
                if k < len(dsts):
                    out[c] = u(dsts[k])
    return out


class _Font:
    """Per-font byte-code -> text decoder."""

    def __init__(self, doc: _Doc, fd: dict):
        fd = doc.resolve(fd)
        if not isinstance(fd, dict):
            fd = {}
        self.two_byte = doc.resolve(fd.get("Subtype")) == "Type0"
        self.cmap: dict[int, str] = {}
        tu = doc.resolve(fd.get("ToUnicode"))
        if isinstance(tu, tuple) and isinstance(tu[0], dict):
            self.cmap = _parse_tounicode(doc._decode_stream(tu[0], tu[1]))
        self.diff: dict[int, str] = {}
        if self.two_byte:
            df = doc.resolve(fd.get("DescendantFonts"))
            if isinstance(df, list) and df:
                fd = doc.resolve(df[0]) or fd
        enc = doc.resolve(fd.get("Encoding"))
        if isinstance(enc, dict):
            code = 0
            for item in doc.resolve(enc.get("Differences")) or []:
                item = doc.resolve(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    self.diff[code] = _glyph_char(str(item))
                    code += 1

    def decode(self, raw: bytes) -> str:
        out = []
        if self.two_byte:
            codes = [int.from_bytes(raw[i:i + 2], "big")
                     for i in range(0, len(raw) - len(raw) % 2, 2)]
        else:
            codes = list(raw)
        for c in codes:
            if c in self.cmap:
                out.append(self.cmap[c])
            elif c in self.diff:
                out.append(self.diff[c])
            elif 32 <= c < 127:
                out.append(chr(c))
            elif 0xA0 <= c <= 0xFF:
                out.append(bytes([c]).decode("latin1"))
            else:
                out.append("�")
        return "".join(out)


# ---------------------------------------------------------------------------
# content-stream text interpreter
# ---------------------------------------------------------------------------


def _page_text(doc: _Doc, page: dict) -> str:
    content = doc.page_content(page)
    res = doc.resolve(page.get("Resources")) or {}
    fdict = doc.resolve(res.get("Font")) or {}
    fonts: dict[str, _Font] = {}
    lx = _Lexer(content, 0)
    stack: list = []
    cur: _Font | None = None
    fsize = 0.0
    # text-position state: a y jump = newline, an x jump = space
    last_y = None
    last_x = None
    out: list[str] = []
    n = len(content)

    def emit(s: str):
        out.append(s)

    while True:
        lx._skip_ws()
        if lx.pos >= n:
            break
        c = content[lx.pos]
        if (c in b"/([<" or c in b"+-.0123456789"
                or content[lx.pos:lx.pos + 2] == b"<<"):
            try:
                stack.append(lx.parse())
            except ValueError:
                lx.pos += 1
            continue
        e = lx._token_end(lx.pos)
        if e == lx.pos:
            lx.pos += 1
            continue
        op = content[lx.pos:e].decode("latin1", "replace")
        lx.pos = e

        def num(v, d=0.0):
            return float(v) if isinstance(v, (int, float)) else d

        if op == "Tf" and len(stack) >= 2:
            fsize = num(stack[-1])
            name = str(stack[-2])
            if name not in fonts and name in fdict:
                fonts[name] = _Font(doc, fdict[name])
            cur = fonts.get(name)
        elif op in ("Td", "TD") and len(stack) >= 2:
            tx, ty = num(stack[-2]), num(stack[-1])
            if abs(ty) > 0.1:
                emit("\n")
            elif tx > max(fsize * 0.2, 0.5):
                emit(" ")
        elif op == "Tm" and len(stack) >= 6:
            x, y = num(stack[-2]), num(stack[-1])
            if last_y is not None and abs(y - last_y) > 0.1:
                emit("\n")
            elif last_x is not None and x - last_x > max(fsize * 0.2, 0.5):
                emit(" ")
            last_x, last_y = x, y
        elif op == "T*":
            emit("\n")
        elif op in ("Tj", "'", '"'):
            if op == "'" or op == '"':
                emit("\n")
            if stack and isinstance(stack[-1], bytes) and cur is not None:
                emit(cur.decode(stack[-1]))
            elif stack and isinstance(stack[-1], bytes):
                emit(stack[-1].decode("latin1", "replace"))
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    emit(cur.decode(item) if cur is not None
                         else item.decode("latin1", "replace"))
                elif isinstance(item, (int, float)) and item < -180:
                    emit(" ")   # large negative kern = inter-word gap
        elif op == "ET":
            last_x = last_y = None
        elif op == "BI":
            # inline image: skip to EI
            m = re.search(rb"\sEI(?=[\s/\[<(]|$)", content[lx.pos:])
            if not m:
                raise ValueError("pdf: unterminated inline image")
            lx.pos += m.end()
        if op not in ("Tf",):
            stack.clear()
    text = "".join(out)
    # normalize ligatures for search-friendliness
    for lig, rep in (("ﬀ", "ff"), ("ﬁ", "fi"), ("ﬂ", "fl"),
                     ("ﬃ", "ffi"), ("ﬄ", "ffl")):
        text = text.replace(lig, rep)
    return text


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


# untrusted-input boundary: any structural surprise a targeted guard
# missed surfaces as the clean contract error, never a raw internal
# exception crashing a Spark task (mutation-fuzz discipline)
_RAW = (IndexError, KeyError, TypeError, AttributeError,
        struct.error, OverflowError, RecursionError, UnicodeDecodeError)


def read_pdf_info(data: bytes) -> PdfInfo:
    """Header + page-tree profile (no content decode)."""
    try:
        doc = _Doc(data)
        return PdfInfo(doc.version, len(doc.pages()))
    except _RAW as e:
        raise ValueError(f"pdf: malformed document ({e!r})") from None


def pdf_extract_text(data: bytes, pages=None) -> list[str]:
    """PDF bytes -> text per page (list of strings).

    ``pages``: optional iterable of 0-based page indexes (default all).
    Raises ValueError on malformed/encrypted input."""
    try:
        doc = _Doc(data)
        pg = doc.pages()
        if pages is not None:
            idx = [i for i in pages if 0 <= i < len(pg)]
            pg = [pg[i] for i in idx]
        return [_page_text(doc, p) for p in pg]
    except _RAW as e:
        raise ValueError(f"pdf: malformed document ({e!r})") from None


def write_pdf(pages: list[str], font: str = "Helvetica",
              size: float = 11.0) -> bytes:
    """Minimal single-font PDF writer (classic xref table, uncompressed
    content streams, WinAnsi text) — the round-trip fixture generator
    for the extractor; output opens in standard viewers."""
    if not pages:
        raise ValueError("write_pdf: need at least one page")
    objs: list[bytes] = []

    def esc(s: str) -> bytes:
        b = s.encode("latin1", "replace")
        return b.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
                .replace(b")", rb"\)")

    font_obj = (b"<< /Type /Font /Subtype /Type1 /BaseFont /"
                + font.encode("ascii") + b" /Encoding /WinAnsiEncoding >>")
    kids = []
    first_page_obj = 4
    for i, ptext in enumerate(pages):
        kids.append(f"{first_page_obj + 2 * i} 0 R".encode())
    pages_obj = (b"<< /Type /Pages /Count " + str(len(pages)).encode()
                 + b" /Kids [" + b" ".join(kids) + b"] >>")
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")   # 1
    objs.append(pages_obj)                              # 2
    objs.append(font_obj)                               # 3
    for i, ptext in enumerate(pages):
        lines = ptext.split("\n")
        cont = bytearray(b"BT /F1 %.1f Tf 72 720 Td %.1f TL\n"
                         % (size, size * 1.3))
        for j, line in enumerate(lines):
            if j:
                cont += b"T*\n"
            cont += b"(" + esc(line) + b") Tj\n"
        cont += b"ET"
        page = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> /Contents "
                + str(first_page_obj + 2 * i + 1).encode() + b" 0 R >>")
        objs.append(page)
        objs.append(b"<< /Length " + str(len(cont)).encode()
                    + b" >>\nstream\n" + bytes(cont) + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += ("%010d 00000 n \n" % off).encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return bytes(out)
