"""HTML parsing (U1): the reference's ParsedPage extraction re-implemented over
stdlib ``html.parser`` (bs4/lxml are not installable in the sandbox) and
vectorized for Spark via ``mapInPandas``.

Semantics implemented to the letter of ``crawler/core/parser/html_parser.py``:

* text extraction (html_parser.py:120-132): remove script/style/header/footer/
  nav **subtrees**, join the remaining text nodes (each stripped, empties
  dropped) with ' ', collapse whitespace — this is the byte-identical per-row
  invariant from BASELINE.json input_hint;
* title (html_parser.py:77-87): <title> text, fallback first <h1>;
* description (html_parser.py:89-100): meta[name=description] content,
  fallback first <p> text, first 200 chars;
* keywords (html_parser.py:102-118): meta keywords split on ',' lowercased ∪
  \\w+ words of h1-h3 texts.  The reference returns ``list(set(...))`` whose
  order is process-dependent (str hash randomization); adopted deterministic
  semantics: sorted;
* links (html_parser.py:134-159): skip '#'/javascript: hrefs, urljoin to
  absolute, drop 25 binary extensions, keep http(s) only.  Reference order is
  a set (nondeterministic); adopted: document order, first-occurrence dedup.
  Links inside the removed subtrees (e.g. <nav>) are **not** extracted — the
  reference decomposes those elements before link extraction
  (html_parser.py:46 runs before :49);
* images (html_parser.py:161-179), metadata (181-192), headers h1-h6 (194-206).
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
        self.texts: list[str] = []
        self.title_parts: list[str] | None = None
        self.title: str | None = None
        self.h_stack: list[tuple[str, list[str]]] = []
        self.headers: dict[str, list[str]] = {f"h{i}": [] for i in range(1, 7)}
        self.first_p: str | None = None
        self.p_parts: list[str] | None = None
        self.meta: dict[str, str] = {}
        self.links: list[str] = []  # raw hrefs, document order
        self.a_depth = 0
        self.images: list[dict[str, str]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            self.handle_startendtag(tag, attrs)
            return
        if tag in _EXCLUDED:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag == "title" and self.title is None:
            self.title_parts = []
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self.h_stack.append((tag, []))
        elif tag == "p" and self.first_p is None:
            self.p_parts = []
        elif tag == "a":
            self.a_depth += 1
            d = dict(attrs)
            if d.get("href") is not None:
                self.links.append(d["href"])

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self.skip_depth:
            return
        d = dict(attrs)
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
        if tag in _EXCLUDED:
            if self.skip_depth:
                self.skip_depth -= 1
            return
        if self.skip_depth:
            return
        if tag == "title" and self.title_parts is not None:
            self.title = _WS_RE.sub(" ", "".join(self.title_parts)).strip()
            self.title_parts = None
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6") and self.h_stack:
            t, parts = self.h_stack.pop()
            if t == tag:
                text = _WS_RE.sub(" ", "".join(parts)).strip()
                if text:
                    self.headers[tag].append(text)
        elif tag == "p" and self.p_parts is not None:
            self.first_p = _WS_RE.sub(" ", "".join(self.p_parts)).strip()
            self.p_parts = None
        elif tag == "a" and self.a_depth:
            self.a_depth -= 1

    def handle_data(self, data: str) -> None:
        if self.skip_depth:
            return
        self.texts.append(data)
        if self.title_parts is not None:
            self.title_parts.append(data)
        for _, parts in self.h_stack:
            parts.append(data)
        if self.p_parts is not None:
            self.p_parts.append(data)


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

    title = ex.title
    if not title:
        title = ex.headers["h1"][0] if ex.headers["h1"] else ""

    description = ex.meta.get("description", "").strip()
    if not description:
        description = (ex.first_p or "")[:200]

    keywords: set[str] = set()
    if "keywords" in ex.meta:
        keywords.update(k.strip().lower() for k in ex.meta["keywords"].split(","))
    for tag in ("h1", "h2", "h3"):
        for text in ex.headers[tag]:
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
