"""HTML text + link extraction with the reference's exact semantics.

Behavioral spec (reference: /root/reference/parse/parse.go):

ExtractText (parse.go:33-85):
  * a tokenizer walks the document; a *tracked tag* state is set on every
    start tag: one of title/h1/h2/h3/h4/script is tracked, ANY other start
    tag resets tracking to "none" (parse.go:47-61);
  * every end tag resets tracking to "none" (parse.go:62-63) — so only text
    lexically between a tracked start tag and the next tag boundary counts;
  * self-closing tags (``<br/>``) leave the tracking state untouched
    (SelfClosingTagToken matches no switch case);
  * each text node is whitespace-trimmed; empty results are dropped
    (parse.go:65-79);
  * tracked title: last one wins (assignment, parse.go:66);
    h1..h4: appended in document order; script text: dropped (parse.go:77-78);
    all other non-empty text: appended to ``text`` (parse.go:79-80);
  * script (and style) element content is raw text — tags inside it are not
    parsed. style is NOT tracked, so CSS text lands in ``text`` (quirk kept).

ExtractLinks (parse.go:88-131):
  * split the page URL into scheme + host (parse.go:89);
  * for every ``<a>`` START tag (self-closing ``<a/>`` ignored), for every
    ``href`` attribute in order (parse.go:104-106):
      - ``//x``  -> "{scheme}://x"          store + fetch-candidate (parse.go:107-113)
      - ``/x``   -> "{scheme}://{host}/x"   store + fetch-candidate (parse.go:114-120)
      - anything else (absolute, mailto, ``#``, empty) -> store only
        (parse.go:121-124);
  * fetch candidacy is decided per-link by an injected ``should_fetch``
    callback (parse.go:30, 110, 117); append order = document order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Callable
from urllib.parse import urlsplit

_TRACKED = ("title", "h1", "h2", "h3", "h4", "script")


@dataclass
class PageStructure:
    title: str = ""
    h1: list[str] = field(default_factory=list)
    h2: list[str] = field(default_factory=list)
    h3: list[str] = field(default_factory=list)
    h4: list[str] = field(default_factory=list)
    text: list[str] = field(default_factory=list)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.page = PageStructure()
        self._tok = ""  # currently tracked tag, "" = none

    def handle_starttag(self, tag: str, attrs) -> None:
        self._tok = tag if tag in _TRACKED else ""

    def handle_endtag(self, tag: str) -> None:
        self._tok = ""

    def handle_startendtag(self, tag: str, attrs) -> None:
        # self-closing tag: reference leaves tracking state untouched
        pass

    def handle_data(self, data: str) -> None:
        _record_text(self.page, self._tok, data)


def _record_text(page: PageStructure, tok: str, data: str) -> None:
    """Route one data token into the page by the tracked tag — the
    reference's switch (shared by the standalone and fused extractors,
    so the tag routing can never diverge between them)."""
    txt = data.strip()
    if not txt:
        return
    if tok == "title":
        page.title = txt
    elif tok == "h1":
        page.h1.append(txt)
    elif tok == "h2":
        page.h2.append(txt)
    elif tok == "h3":
        page.h3.append(txt)
    elif tok == "h4":
        page.h4.append(txt)
    elif tok == "script":
        return
    else:
        page.text.append(txt)


def _resolve_rel(scheme: str, host: str, val: str) -> str | None:
    """Resolve a scheme-relative ('//x') or root-relative ('/x') href/src
    against the page origin; None for every other form (the reference's
    unfetchable third href class). The ONE copy of the resolution rules
    shared by link, image and fused extractors."""
    if val.startswith("//"):
        return f"{scheme}:{val}"
    if val.startswith("/"):
        return f"{scheme}://{host}{val}"
    return None


def _collect_hrefs(scheme: str, host: str, attrs, to_store: list,
                   to_fetch: list, should_fetch) -> None:
    """Reference href semantics over one <a> tag's attrs: every href is
    stored (resolved where resolvable, verbatim otherwise); only the
    resolvable classes passing ``should_fetch`` become fetch links."""
    for key, val in attrs:
        if key != "href":
            continue
        val = val if val is not None else ""
        url = _resolve_rel(scheme, host, val)
        if url is None:
            to_store.append(val)
        else:
            to_store.append(url)
            if should_fetch(url):
                to_fetch.append(url)


def _collect_img(scheme: str, host: str, attrs, images: list) -> None:
    """<img src alt> with hrefs' resolution rules (graft axis)."""
    d = dict(attrs)
    src = d.get("src") or ""
    if not src:
        return
    url = _resolve_rel(scheme, host, src)
    images.append((url if url is not None else src, d.get("alt") or ""))


def extract_text(payload: str) -> PageStructure:
    """payload html -> PageStructure (reference ExtractText semantics)."""
    p = _TextExtractor()
    try:
        p.feed(payload)
        p.close()
    except Exception:
        pass  # reference breaks the token loop on error and keeps what it has
    return p.page


class _LinkExtractor(HTMLParser):
    def __init__(self, scheme: str, host: str,
                 should_fetch: Callable[[str], bool]) -> None:
        super().__init__(convert_charrefs=True)
        self.scheme, self.host = scheme, host
        self.should_fetch = should_fetch
        self.to_fetch: list[str] = []
        self.to_store: list[str] = []

    def handle_startendtag(self, tag: str, attrs) -> None:
        # self-closing <a/> is a SelfClosingTagToken in the reference's
        # tokenizer and matches no switch case — never a link source
        pass

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        _collect_hrefs(self.scheme, self.host, attrs,
                       self.to_store, self.to_fetch, self.should_fetch)


def extract_links(payload: str, original_url: str,
                  should_fetch: Callable[[str], bool] = lambda u: True,
                  ) -> tuple[list[str], list[str]]:
    """payload html + page url -> (to_fetch, to_store) link lists.

    ``to_fetch`` ⊆ same-scheme-host resolved links that pass ``should_fetch``
    (the reference's scope policy: only scheme-relative and root-relative
    hrefs are ever fetchable); ``to_store`` holds every href in document
    order, resolved where resolvable.
    """
    try:
        parts = urlsplit(original_url)
        scheme, host = parts.scheme, parts.netloc
    except ValueError:
        scheme, host = "", ""
    p = _LinkExtractor(scheme, host, should_fetch)
    try:
        p.feed(payload)
        p.close()
    except Exception:
        pass
    return p.to_fetch, p.to_store


class _ImageExtractor(HTMLParser):
    """``<img src alt>`` collector (graft axis — not in the reference, which
    has no image handling; BASELINE.json input_hint defines the target
    schema). Relative srcs resolve with the reference's href rules."""

    def __init__(self, scheme: str, host: str) -> None:
        super().__init__(convert_charrefs=True)
        self.scheme, self.host = scheme, host
        self.images: list[tuple[str, str]] = []  # (resolved src, alt)

    def _handle(self, tag: str, attrs) -> None:
        if tag == "img":
            _collect_img(self.scheme, self.host, attrs, self.images)

    handle_starttag = _handle
    handle_startendtag = _handle


def extract_images(payload: str, original_url: str) -> list[tuple[str, str]]:
    """html -> [(image_url, caption/alt)] in document order."""
    try:
        parts = urlsplit(original_url)
        scheme, host = parts.scheme, parts.netloc
    except ValueError:
        scheme, host = "", ""
    p = _ImageExtractor(scheme, host)
    try:
        p.feed(payload)
        p.close()
    except Exception:
        pass
    return p.images


def fetchable_links(payload: str, original_url: str) -> list[str]:
    """All fetch-CLASS links (scheme/root-relative, resolved, doc order),
    before any seen-set policy — the crawl pipeline applies the policy later
    so the advisory filter can run as its own vectorized stage."""
    fetch, _ = extract_links(payload, original_url, lambda u: True)
    return fetch


class _CombinedExtractor(HTMLParser):
    """Single-pass text + links + images extractor (hot-path fusion of
    _TextExtractor, _LinkExtractor and _ImageExtractor — identical
    semantics, one tokenizer walk instead of three; equivalence is
    property-tested against the three separate extractors)."""

    def __init__(self, scheme: str, host: str) -> None:
        super().__init__(convert_charrefs=True)
        self.scheme, self.host = scheme, host
        self.page = PageStructure()
        self._tok = ""
        self.to_fetch: list[str] = []
        self.to_store: list[str] = []
        self.images: list[tuple[str, str]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        self._tok = tag if tag in _TRACKED else ""
        if tag == "a":
            self._hrefs(attrs)
        elif tag == "img":
            self._img(attrs)

    def handle_endtag(self, tag: str) -> None:
        self._tok = ""

    def handle_startendtag(self, tag: str, attrs) -> None:
        # self-closing: tracking untouched, <a/> is never a link source,
        # but <img/> still counts (images aren't reference semantics)
        if tag == "img":
            self._img(attrs)

    def _hrefs(self, attrs) -> None:
        # fetch candidates BEFORE the seen policy -> should_fetch is
        # always-true here (the crawl's advisory filter runs downstream)
        _collect_hrefs(self.scheme, self.host, attrs,
                       self.to_store, self.to_fetch, lambda u: True)

    def _img(self, attrs) -> None:
        _collect_img(self.scheme, self.host, attrs, self.images)

    def handle_data(self, data: str) -> None:
        _record_text(self.page, self._tok, data)


def extract_all(payload: str, original_url: str):
    """One tokenizer pass -> (PageStructure, fetch_candidates, to_store,
    images). fetch_candidates = fetch-class links BEFORE the seen policy
    (the crawl's advisory filter applies it downstream)."""
    try:
        parts = urlsplit(original_url)
        scheme, host = parts.scheme, parts.netloc
    except ValueError:
        scheme, host = "", ""
    p = _CombinedExtractor(scheme, host)
    try:
        p.feed(payload)
        p.close()
    except Exception:
        pass
    return p.page, p.to_fetch, p.to_store, p.images
