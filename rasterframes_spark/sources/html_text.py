"""HTML → text extraction for web-corpus ingestion.

The companion of ``sources/pdf.py``: turns scraped HTML into the plain
text the downstream operators (dedup, C4/Gopher filters, tokenization)
consume. Built on the stdlib ``html.parser`` (tolerant, non-validating —
real web HTML is never well-formed), with trafilatura-style boilerplate
heuristics kept separable:

- ``html_to_text``: full visible text — drops script/style/template/
  noscript/svg/head subtrees and comments, decodes entities, emits
  newlines at block-element boundaries and collapses intra-block
  whitespace.
- ``extract_main_text``: boilerplate-pruned text — additionally drops
  nav/header/footer/aside/form subtrees and, per block, applies a link-
  density rule (blocks whose anchor text exceeds ``max_link_density`` of
  their text are navigation, not content).
- ``html_metadata``: title, meta description, language, counts.

Everything is a pure function over one document, applied via
``mapInPandas`` in the pipeline operators (pipeline/multimodal.py) — the
same Arrow-batched shape as the other payload decoders.
"""
from __future__ import annotations

import re
from html.parser import HTMLParser

# precompiled: _flush runs twice per block (r14 — skips the re-cache dict
# lookup per call on the ingest hot path)
_WS = re.compile(r"\s+")

__all__ = ["html_to_text", "extract_main_text", "html_metadata",
           "parse_page"]

# subtrees that never contribute visible text
_DROP = {"script", "style", "template", "noscript", "svg", "head",
         "iframe", "object", "embed"}
# additional boilerplate subtrees for main-content extraction
_BOILER = {"nav", "header", "footer", "aside", "form", "button",
           "select", "option", "label"}
# elements that end a text block
_BLOCK = {"p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
          "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
          "section", "article", "main", "figure", "figcaption", "hr",
          "dl", "dt", "dd", "address", "details", "summary"}
_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base",
         "col", "embed", "source", "track", "wbr"}


class _TextParser(HTMLParser):
    def __init__(self, drop_boiler: bool, max_link_density: float):
        super().__init__(convert_charrefs=True)
        self.drop = set(_DROP) | (set(_BOILER) if drop_boiler else set())
        self.mld = max_link_density
        self.depth = 0           # inside a dropped subtree when > 0
        self.anchor_depth = 0
        self.blocks: list[tuple[str, str]] = []  # (text, anchor_text)
        self.buf: list[str] = []
        self.abuf: list[str] = []
        self.title: list[str] = []
        self.in_title = False
        self.meta: dict[str, str] = {}
        self.lang = None
        self.n_links = 0

    def _flush(self):
        t = _WS.sub(" ", "".join(self.buf)).strip()
        a = _WS.sub(" ", "".join(self.abuf)).strip()
        if t:
            self.blocks.append((t, a))
        self.buf = []
        self.abuf = []

    def handle_starttag(self, tag, attrs):
        if tag == "html" and self.lang is None:
            for k, v in attrs:
                if k == "lang" and v:
                    self.lang = v
        if tag == "meta":
            d = dict(attrs)
            name = (d.get("name") or d.get("property") or "").lower()
            if name and d.get("content"):
                self.meta.setdefault(name, d["content"])
        if tag == "title":
            # title usually sits inside <head>, which is a dropped
            # subtree — capture it regardless of drop depth
            self.in_title = True
            return
        if tag in self.drop and tag not in _VOID:
            self.depth += 1
            return
        if self.depth:
            return
        if tag == "a":
            # set, don't increment: real-web HTML leaves anchors
            # unclosed, and browsers auto-close them — a stuck counter
            # would classify the whole rest of the page as link text
            self.anchor_depth = 1
            self.n_links += 1
        if tag in _BLOCK:
            self._flush()
            # anchors don't span block elements in practice; an
            # unclosed <a> ends at the block boundary. <br> is the
            # exception: it's inline-legal inside <a> (br-separated nav
            # menus), so it flushes the block WITHOUT ending the anchor.
            if tag != "br":
                self.anchor_depth = 0

    def handle_endtag(self, tag):
        if tag == "title":
            self.in_title = False
            return
        if tag in self.drop and tag not in _VOID:
            self.depth = max(self.depth - 1, 0)
            return
        if self.depth:
            return
        if tag == "a":
            self.anchor_depth = 0
        if tag in _BLOCK:
            self._flush()
            if tag != "br":
                self.anchor_depth = 0

    def handle_data(self, data):
        if self.in_title:
            self.title.append(data)
            return
        if self.depth:
            return
        self.buf.append(data)
        if self.anchor_depth:
            self.abuf.append(data)

    def result(self) -> str:
        self._flush()
        keep = []
        for t, a in self.blocks:
            if self.mld < 1.0 and len(t) > 0 \
                    and len(a) / len(t) > self.mld:
                continue
            keep.append(t)
        return "\n".join(keep)


def html_to_text(html: str) -> str:
    """All visible text: entity-decoded, block boundaries as newlines,
    whitespace collapsed within blocks. Script/style/head/svg subtrees
    and comments contribute nothing."""
    p = _TextParser(drop_boiler=False, max_link_density=1.0)
    p.feed(html)
    p.close()
    return p.result()


def extract_main_text(html: str, max_link_density: float = 0.5) -> str:
    """Boilerplate-pruned text: nav/header/footer/aside/form subtrees
    are dropped, and any block whose anchor-text share exceeds
    ``max_link_density`` (default 0.5) is treated as navigation."""
    p = _TextParser(drop_boiler=True, max_link_density=max_link_density)
    p.feed(html)
    p.close()
    return p.result()


def parse_page(html: str, main_content: bool = True,
               max_link_density: float = 0.5) -> tuple:
    """One parse -> (title, lang, text). The single-pass form the
    ``extract_html_text`` operator uses on the ingest hot path (metadata
    and text from the same feed, not two full parses per page)."""
    p = _TextParser(drop_boiler=main_content,
                    max_link_density=(max_link_density if main_content
                                      else 1.0))
    p.feed(html)
    p.close()
    title = _WS.sub(" ", "".join(p.title)).strip() or None
    return title, p.lang, p.result()


def html_metadata(html: str) -> dict:
    """title / meta description / declared language / link + block
    counts — the profile pass before committing extraction budget."""
    p = _TextParser(drop_boiler=False, max_link_density=1.0)
    p.feed(html)
    p.close()
    text = p.result()
    return {
        "title": _WS.sub(" ", "".join(p.title)).strip() or None,
        "description": p.meta.get("description")
        or p.meta.get("og:description"),
        "lang": p.lang,
        "n_links": p.n_links,
        "n_blocks": len(p.blocks),
        "n_chars": len(text),
    }
