"""HTML parsing (U1): the reference's ParsedPage extraction re-implemented over
stdlib ``html.parser`` (bs4/lxml are not installable in the sandbox) and
vectorized for Spark via ``mapInPandas``.

Semantics of ``crawler/core/parser/html_parser.py``, including its parse
ORDER: title/description/keywords are extracted from the full tree BEFORE
``_extract_text_content`` destructively decomposes script/style/header/footer/
nav (html_parser.py:41-44 run before :45), while text, links, images, the
metadata dict and the headers dict are extracted AFTER the decompose
(html_parser.py:46-58).  So an <h1> inside <header> feeds keywords and the
title fallback, and a first <p> inside <nav> feeds the description fallback —
but none of them appear in text/links/headers.  The extractor therefore keeps
two channels: a pre-exclusion channel (title / first-h1 / first-p / first
meta-description / first meta-keywords / h1-h3 texts, never gated by
skip_depth) and a post-exclusion channel (everything else, gated).

* text extraction (html_parser.py:120-132): remove script/style/header/footer/
  nav **subtrees**, join the remaining text nodes (each stripped, empties
  dropped) with ' ', collapse whitespace — this is the byte-identical per-row
  invariant from BASELINE.json input_hint;
* title (html_parser.py:77-87): first <title> text; fallback to the first
  <h1> only when NO title element exists (the reference returns "" for an
  empty-but-present <title>);
* description (html_parser.py:89-100): first meta[name=description] content
  (even if empty — no fallback when the tag exists), else first <p> text,
  first 200 chars;
* keywords (html_parser.py:102-118): first meta[name=keywords] content split
  on ',' lowercased ∪ \\w+ words of all h1-h3 texts (pre-exclusion).  The
  reference returns ``list(set(...))`` whose order is process-dependent (str
  hash randomization); adopted deterministic semantics: sorted;
* links (html_parser.py:134-159): skip '#'/javascript: hrefs, urljoin to
  absolute, drop 25 binary extensions, keep http(s) only.  Reference order is
  a set (nondeterministic); adopted: document order, first-occurrence dedup.
  Links inside the removed subtrees (e.g. <nav>) are **not** extracted — the
  reference decomposes those elements before link extraction;
* images (html_parser.py:161-179), metadata (181-192), headers h1-h6 (194-206).

Adopted deviations (documented, shared by engine and test oracle): text
segments are stripped and joined with ' ' then whitespace-collapsed (bs4's
``get_text(strip=True)`` joins with no separator); keyword/title/header texts
are whitespace-collapsed the same way.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser as _StdHTMLParser
from typing import Iterator
from urllib.parse import urljoin, urlparse

from .urls import IGNORED_EXTENSIONS

_EXCLUDED = {"script", "style", "header", "footer", "nav"}
_WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"\w+")
_VOID = {"meta", "img", "br", "hr", "input", "link", "source"}


class _Extractor(_StdHTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        # ---- post-exclusion channel (extracted AFTER decompose) ----
        self.texts: list[str] = []
        self.h_stack: list[tuple[str, list[str]]] = []
        self.headers: dict[str, list[str]] = {f"h{i}": [] for i in range(1, 7)}
        self.meta: dict[str, str] = {}
        self.links: list[str] = []  # raw hrefs, document order
        self.a_depth = 0
        self.images: list[dict[str, str]] = []
        # ---- pre-exclusion channel (extracted BEFORE decompose) ----
        self.pre_title: str | None = None       # first <title>'s text
        self._pre_title_parts: list[str] | None = None
        self._pre_title_seen = False
        self.pre_h1: str | None = None          # first <h1>'s text (may be "")
        self._pre_h1_seen = False
        # entries: [tag, parts, is_first_h1]
        self._pre_h_stack: list[list] = []
        self.pre_headers: dict[str, list[str]] = {"h1": [], "h2": [], "h3": []}
        self.pre_first_p: str | None = None
        self._pre_p_parts: list[str] | None = None
        self._pre_p_seen = False
        self.pre_desc: str | None = None        # first meta[name=description]
        self.pre_kw: str | None = None          # first meta[name=keywords]

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            self.handle_startendtag(tag, attrs)
            return
        if tag in _EXCLUDED:
            self.skip_depth += 1
            return
        # pre-exclusion channel: reference extracts these from the full tree
        # (html_parser.py:41-44), so content inside <header>/<nav>/... counts
        if tag == "title" and not self._pre_title_seen:
            self._pre_title_seen = True
            self._pre_title_parts = []
        elif tag in ("h1", "h2", "h3"):
            first_h1 = tag == "h1" and not self._pre_h1_seen
            if tag == "h1":
                self._pre_h1_seen = True
            self._pre_h_stack.append([tag, [], first_h1])
        elif tag == "p" and not self._pre_p_seen:
            self._pre_p_seen = True
            self._pre_p_parts = []
        if self.skip_depth:
            return
        # post-exclusion channel
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self.h_stack.append((tag, []))
        elif tag == "a":
            self.a_depth += 1
            d = dict(attrs)
            if d.get("href") is not None:
                self.links.append(d["href"])

    def handle_startendtag(self, tag: str, attrs) -> None:
        d = dict(attrs)
        if tag == "meta":
            # pre-exclusion: first meta[name=description] / [name=keywords]
            # (soup.find before decompose, html_parser.py:91,107) — content
            # may be missing/empty and still claims the slot
            if d.get("name") == "description" and self.pre_desc is None:
                self.pre_desc = d.get("content", "")
            if d.get("name") == "keywords" and self.pre_kw is None:
                self.pre_kw = d.get("content", "")
        if self.skip_depth:
            return
        if tag == "meta":
            name = d.get("name") or d.get("property") or ""
            content = d.get("content", "")
            if name and content:
                self.meta[name.lower()] = content
        elif tag == "img":
            src = d.get("src", "")
            if src:
                self.images.append(
                    {
                        "url": src,
                        "alt": d.get("alt", ""),
                        "title": d.get("title", ""),
                        "width": d.get("width", ""),
                        "height": d.get("height", ""),
                    }
                )

    def handle_endtag(self, tag: str) -> None:
        # pre-exclusion channel closes fire even inside excluded subtrees
        if tag == "title" and self._pre_title_parts is not None:
            self.pre_title = _WS_RE.sub(" ", "".join(self._pre_title_parts)).strip()
            self._pre_title_parts = None
        elif tag in ("h1", "h2", "h3") and self._pre_h_stack:
            t, parts, first_h1 = self._pre_h_stack.pop()
            if t == tag:
                text = _WS_RE.sub(" ", "".join(parts)).strip()
                if text:
                    self.pre_headers[tag].append(text)
                if first_h1:
                    self.pre_h1 = text
        elif tag == "p" and self._pre_p_parts is not None:
            self.pre_first_p = _WS_RE.sub(" ", "".join(self._pre_p_parts)).strip()
            self._pre_p_parts = None
        if tag in _EXCLUDED:
            if self.skip_depth:
                self.skip_depth -= 1
            return
        if self.skip_depth:
            return
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6") and self.h_stack:
            t, parts = self.h_stack.pop()
            if t == tag:
                text = _WS_RE.sub(" ", "".join(parts)).strip()
                if text:
                    self.headers[tag].append(text)
        elif tag == "a" and self.a_depth:
            self.a_depth -= 1

    def handle_data(self, data: str) -> None:
        # pre-exclusion accumulators always receive data (incl. script text
        # nested inside an open h1/p — bs4's pre-decompose get_text does too)
        if self._pre_title_parts is not None:
            self._pre_title_parts.append(data)
        for entry in self._pre_h_stack:
            entry[1].append(data)
        if self._pre_p_parts is not None:
            self._pre_p_parts.append(data)
        if self.skip_depth:
            return
        self.texts.append(data)
        for _, parts in self.h_stack:
            parts.append(data)


def extract_text(html: str) -> str:
    """The html_parser.py:120-132 spec alone (byte-identical invariant)."""
    ex = _Extractor()
    ex.feed(html)
    parts = [s.strip() for s in ex.texts]
    text = " ".join(p for p in parts if p)
    return _WS_RE.sub(" ", text).strip()


def _filter_links(raw_links: list[str], base_url: str) -> list[str]:
    """html_parser.py:134-159 — absolute, hygiene-filtered, doc-order dedup."""
    out: list[str] = []
    seen: set[str] = set()
    for href in raw_links:
        if href.startswith("#") or href.startswith("javascript:"):
            continue
        try:
            absolute = urljoin(base_url, href)
            parsed = urlparse(absolute)
        except ValueError:
            continue
        if any(parsed.path.lower().endswith(ext) for ext in IGNORED_EXTENSIONS):
            continue
        if parsed.scheme in ("http", "https"):
            if absolute not in seen:
                seen.add(absolute)
                out.append(absolute)
    return out


def parse_page(url: str, html: bytes | str) -> dict:
    """Full ParsedPage extraction for one page (html_parser.py:35-71)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    ex = _Extractor()
    ex.feed(html)

    # title (html_parser.py:77-87): fallback to first h1 only when no <title>
    # element exists at all (empty <title> yields "")
    if ex.pre_title is not None:
        title = ex.pre_title
    else:
        title = ex.pre_h1 if ex.pre_h1 is not None else ""

    # description (html_parser.py:89-100): first meta[name=description]
    # claims the slot even with empty content; else first <p>, 200 chars
    if ex.pre_desc is not None:
        description = ex.pre_desc.strip()
    else:
        description = (ex.pre_first_p or "")[:200]

    # keywords (html_parser.py:102-118): both sources pre-exclusion
    keywords: set[str] = set()
    if ex.pre_kw is not None:
        keywords.update(k.strip().lower() for k in ex.pre_kw.split(","))
    for tag in ("h1", "h2", "h3"):
        for text in ex.pre_headers[tag]:
            keywords.update(_WORD_RE.findall(text.lower()))

    parts = [s.strip() for s in ex.texts]
    text = _WS_RE.sub(" ", " ".join(p for p in parts if p)).strip()

    images = [
        {**img, "url": urljoin(url, img["url"])} for img in ex.images
    ]

    return {
        "url": url,
        "title": title,
        "description": description,
        "keywords": sorted(keywords),
        "text": text,
        "links": _filter_links(ex.links, url),
        "images": images,
        "metadata": ex.meta,
        "headers": ex.headers,
    }


# ---------------------------------------------------------------------------
# Spark-side: mapInPandas over (url, html [, warc_ts]) -> PARSED rows
# ---------------------------------------------------------------------------
def parse_pages(df, passthrough: list[str] | None = None):
    """Vectorized ParsedPage extraction.  Input needs url + html columns;
    warc_ts (if present) passes through as the parse timestamp ``ts`` —
    the reference stamps datetime.now() (html_parser.py:70), which is
    nondeterministic; adopted semantics: event time of the page.

    ``passthrough`` columns are copied verbatim onto the output rows, which
    lets the crawl round derive pages/log/links by pure projection — no
    re-join (and hence no payload shuffle) after the parse stage."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..schemas import PARSED

    passthrough = [c for c in (passthrough or []) if c not in ("url",)]
    has_ts = "warc_ts" in df.columns
    cols = ["url", "html"] + (["warc_ts"] if has_ts else [])
    cols += [c for c in passthrough if c not in cols]

    in_fields = {f.name: f for f in df.select(*cols).schema.fields}
    out_schema = T.StructType(
        list(PARSED.fields)
        + [in_fields[c] for c in passthrough if c not in PARSED.fieldNames()]
    )
    out_cols = out_schema.fieldNames()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                r = parse_page(pdf["url"].iat[i], pdf["html"].iat[i])
                r["images"] = [
                    (d["url"], d["alt"], d["title"], d["width"], d["height"])
                    for d in r["images"]
                ]
                r["ts"] = pdf["warc_ts"].iat[i] if has_ts else None
                for c in passthrough:
                    if c not in r:
                        r[c] = pdf[c].iat[i]
                rows.append(r)
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select(*cols).mapInPandas(run, schema=out_schema)
