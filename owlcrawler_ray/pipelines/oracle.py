"""Serial parity oracle: a pure-Python simulator of the reference's
fetcher+extractor semantics (the ground truth the Ray pipeline must match).

Simulates the README's own single-fetcher + single-extractor topology
(reference README.md:52-62), which is deterministic:

* FIFO queue, seeds first (webapp/main.go:183), then each page's fetchable
  links appended right after that page's fetch (extractor.go:57-59 runs
  before the next 5s tick admits another fetch — the extractor keeps up);
* dedup checked at DEQUEUE time (fetcher.go:96 -> couchdb.go:254-256) —
  duplicate queue entries are normal and are discarded tick-free when their
  URL already has a doc;
* every actual GET costs one 5-second politeness tick (fetcher.go:99),
  including failed fetches (the check precedes the tick, the fetch may
  still fail); a TRANSPORT failure stores no doc (fetcher.go:51-61 returns
  before couchdb.AddURLData), so the URL stays fetchable and later queued
  occurrences retry it. NOTE: the reference stores a doc for any completed
  HTTP response — there is no status check before AddURLData — so a real
  HTTP 404 *would* become "seen" there. This corpus has no such pages: its
  non-200s model dead links, which we deliberately treat as TRANSPORT
  failures (dropped message, retryable) on BOTH sides of the parity
  contract; crawl and oracle agree by construction;
* seeds are stored as ``site-`` docs (couchdb.go:147-151) which do NOT make
  the seed URL itself "seen";
* link discovery applies the advisory should-fetch check against the doc
  set AS OF that page's extraction (extractor.go:49, parse.go:110,117) —
  i.e. after this page's own doc was stored;
* links/links_to_queue recorded per page in document order.

Outputs: attempt log (every GET with its tick), fetch log (successes, the
"crawl ordering" of the north rule), final seen set, per-page extraction
(links, links_to_queue, title/h*/text), image emission order.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from ..functions import ids
from ..functions.parse import extract_images, extract_links, extract_text
from ..sources.corpus import SyntheticWeb


@dataclass
class OracleResult:
    attempts: list[dict] = field(default_factory=list)
    fetch_log: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    pages: dict[str, dict] = field(default_factory=dict)
    images: list[dict] = field(default_factory=list)

    @property
    def fetch_order(self) -> list[str]:
        return [f["url"] for f in self.fetch_log]


def run_oracle(web: SyntheticWeb, max_ticks: int = 10**9,
               tick_seconds: int = 5,
               inject: dict[int, list[str]] | None = None) -> OracleResult:
    """``inject`` maps a tick T -> seed URLs submitted while the crawler
    runs (the webapp's add-a-site path): they join the queue TAIL once the
    clock has reached T — i.e. after every link discovered through tick T
    is already queued, exactly where a NATS publish would land them."""
    res = OracleResult()
    queue: deque[str] = deque(web.seeds())
    pending = dict(inject) if inject else {}
    tick = 0
    while (queue or pending) and tick < max_ticks:
        for t in sorted(k for k in pending if k <= tick):
            queue.extend(pending.pop(t))
        if not queue:
            if not pending:  # e.g. the delivered group was empty
                break
            # frontier drained before an injection tick: deliver the next
            # injection group NOW — the crawler analog is add_sites()
            # after run() drained, then run() again, and the politeness
            # clock does not jump forward while idle
            queue.extend(pending.pop(min(pending)))
            continue
        url = queue.popleft()
        if url in res.seen:
            continue  # F1 dequeue check: doc exists -> discard, no tick
        tick += 1
        status, html_bytes = web.fetch(url)
        res.attempts.append(
            {"tick": tick, "virtual_time_s": tick * tick_seconds,
             "url": url, "status": status}
        )
        if status != 200:
            continue  # fetch error: message dropped, no doc stored
        res.seen.add(url)
        fetch_seq = len(res.fetch_log)
        res.fetch_log.append(
            {"fetch_seq": fetch_seq, "url": url, "doc_id": ids.doc_id(url),
             "tick": tick, "virtual_time_s": tick * tick_seconds}
        )
        html = html_bytes.decode("utf-8")
        page = extract_text(html)
        to_fetch, to_store = extract_links(
            html, url, lambda u: u not in res.seen
        )
        res.pages[url] = {
            "fetch_seq": fetch_seq,
            "doc_id": ids.doc_id(url),
            "title": page.title,
            "h1": page.h1, "h2": page.h2, "h3": page.h3, "h4": page.h4,
            "text": page.text,
            "links": to_store,
            "links_to_queue": to_fetch,
        }
        for img_url, caption in extract_images(html, url):
            res.images.append(
                {"image_url": img_url, "image_id": ids.doc_id(img_url),
                 "caption": caption, "page_url": url, "fetch_seq": fetch_seq}
            )
        queue.extend(to_fetch)
    return res
