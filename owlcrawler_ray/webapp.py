"""Status / search / add-site HTTP surface — the reference webapp
(webapp/main.go:87-93 indexHandler, :199-213 indexStatus, :105-135
search + :137-141 sanitizeHTML, :142-198 addSiteToIndex) re-expressed
over the engine's page store.

The reference serves three HTML endpoints backed by CouchDB views and an
ES query. Here they are backed by a crawl OUTPUT directory:

  /, /index-status  fetched/parsed/sites counts (the stats _count view,
                    couchdb.go:97-106) from the pages/stamps/sites tables
  /index?term=...   the ES relevance model (tf + slop-1 phrase boost x10,
                    elastic_search.go:123-154) over the stored pages,
                    top-10, with <strong> highlight fragments produced by
                    the same es_fragments/es_sanitize pair the search
                    queries use (the reference's `_-_strong_-_` sentinel
                    sanitize, webapp/main.go:137-141)
  /add-site?url=... with a live Crawler attached: persists the site- doc
                    and enqueues the URL exactly like the reference's
                    NATS fetch-queue publish (main.go:160-180); detached:
                    journals the URL to <out>/submitted-sites.txt for the
                    next `--resume --add-site` run

The serving layer is deliberately Ray-free (pruned driver-side parquet
reads — a status page must not need a cluster session); a live Crawler
may be attached for /add-site.
"""

from __future__ import annotations

import html
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

import pyarrow as pa
import pyarrow.compute as pc

from .functions.textops import es_fragments, sanitize_highlight
from .sinks import table_store

_PAGE = """<!DOCTYPE html>
<html><head><title>owlcrawler-ray — {title}</title></head>
<body>
<h1>{title}</h1>
<nav><a href="/index-status">status</a> | <a href="/index">search</a> |
<a href="/add-site">add site</a></nav>
{body}
</body></html>"""

_SEARCH_FORM = """<form action="/index" method="get">
<input type="text" name="term" value="{term}"/>
<input type="submit" value="Search"/></form>"""

_ADD_FORM = """<form action="/add-site" method="get">
<input type="text" name="url"/>
<input type="submit" value="Submit site"/></form>
<p>{msg}</p>"""


class CrawlWebApp:
    """The three reference endpoints over one crawl output directory."""

    def __init__(self, out_dir: str, crawler=None):
        self.out_dir = out_dir
        self.crawler = crawler  # live add-site target (optional)
        # per-table read memo keyed on the committed round set: the store
        # is append-only by round, so a table re-reads only when a new
        # round commits — without this, EVERY search request re-read the
        # full corpus text from parquet (ThreadingHTTPServer multiplies
        # that per concurrent request)
        self._cache: dict = {}

    def _read(self, name: str, columns: list[str]) -> pa.Table:
        sig = tuple(table_store.list_rounds(self.out_dir, name))
        key = (name, tuple(columns))
        hit = self._cache.get(key)
        if hit is not None and hit[0] == sig:
            return hit[1]
        t = table_store.read_all_arrow(self.out_dir, name, columns=columns)
        self._cache[key] = (sig, t)
        return t

    # ---- backing queries (pruned driver-side reads) -------------------
    def stats(self) -> dict:
        """fetched/parsed/sites — the reference stats view counts."""
        pages = self._read("pages", ["url"])
        stamps = self._read("stamps", ["parsed_on"])
        sites = self._read("sites", ["site"])
        parsed = 0
        if stamps.num_rows:
            parsed = int(pc.sum(pc.cast(
                pc.is_valid(stamps.column("parsed_on")), pa.int64()
            )).as_py() or 0)
        return {
            "fetched": pages.num_rows,
            "parsed": parsed,
            "sites": sites.num_rows,
        }

    def search(self, term: str, k: int = 10) -> list[dict]:
        """The reference ES query over the stored pages: score = sum of
        term tfs + 10 x slop-1 phrase matches, top-k (score desc, url),
        each hit carrying its <strong>-highlighted fragments."""
        terms = tuple(t for t in term.split() if t)
        if not terms:
            return []
        pages = self._read("pages", ["doc_id", "url", "title", "text"])
        if pages.num_rows == 0:
            return []
        joined = pc.binary_join(pages.column("text"), " ")
        score = pc.cast(pc.count_substring(joined, terms[0]), pa.int64())
        for t in terms[1:]:
            score = pc.add(score, pc.count_substring(joined, t))
        if len(terms) >= 2:
            phrase = (re.escape(terms[0]) + r"( [a-z]+)? "
                      + re.escape(terms[1]))
            score = pc.add(
                score,
                pc.multiply(
                    pc.cast(pc.count_substring_regex(joined, phrase),
                            pa.int64()),
                    10,
                ),
            )
        t = pa.table(
            {
                "doc_id": pages.column("doc_id"),
                "url": pages.column("url"),
                "title": pages.column("title"),
                "body": joined,
                "score": score,
            }
        ).filter(pc.greater(score, 0))
        idx = pc.sort_indices(
            t, sort_keys=[("score", "descending"), ("url", "ascending")]
        )
        t = t.take(idx[:k])
        hits = []
        for row in t.to_pylist():
            # sentinel form: the HTML surface escapes corpus text BEFORE
            # turning the (escape-proof) sentinels into live <strong> —
            # extracted page text can contain literal markup, and the
            # raw join would serve it executable (stored XSS)
            frags = es_fragments(row["body"], terms, sanitize=False)
            raw = [f for _, _, f in frags]
            hits.append(
                {
                    "doc_id": row["doc_id"],
                    "url": row["url"],
                    "title": row["title"],
                    "score": int(row["score"]),
                    # the reference joins highlights with " ... "
                    # (webapp/main.go:117-120)
                    "highlight": " ... ".join(
                        sanitize_highlight(f) for f in raw),
                    "highlight_html": " ... ".join(
                        sanitize_highlight(html.escape(f)) for f in raw),
                }
            )
        return hits

    def add_site(self, url: str) -> str:
        """Live crawler: persist the site- doc + enqueue (the NATS
        fetch-queue publish analog). Detached: journal for the next
        --resume --add-site run. Returns the reference's status line."""
        if not url:
            return "no url given"
        if self.crawler is not None:
            self.crawler.add_sites([url])
        else:
            os.makedirs(self.out_dir, exist_ok=True)
            with open(os.path.join(self.out_dir, "submitted-sites.txt"),
                      "a", encoding="utf-8") as f:
                f.write(url + "\n")
        return "Site submitted"

    # ---- HTTP glue -----------------------------------------------------
    def _handler_class(app):  # noqa: N805 — closure over the app
        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *args):
                pass

            def _send(self, code: int, body: str):
                data = body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "text/html; charset=UTF-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                parts = urlsplit(self.path)
                q = parse_qs(parts.query)
                if parts.path in ("/", "/index-status"):
                    s = app.stats()
                    self._send(200, _PAGE.format(
                        title="Index status",
                        body=(f"<ul><li>Fetched pages: {s['fetched']}</li>"
                              f"<li>Parsed pages: {s['parsed']}</li>"
                              f"<li>Sites: {s['sites']}</li></ul>"),
                    ))
                elif parts.path == "/index":
                    term = q.get("term", [""])[0]
                    rows = app.search(term) if term else []
                    items = "".join(
                        "<li><a href=\"{u}\">{t}</a> (score {s})"
                        "<br/>{h}</li>".format(
                            u=html.escape(r["url"], quote=True),
                            t=html.escape(r["title"] or r["url"]),
                            s=r["score"],
                            # escaped-then-marked: corpus text is inert,
                            # only the sentinel-derived <strong> is live
                            h=r["highlight_html"],
                        )
                        for r in rows
                    )
                    self._send(200, _PAGE.format(
                        title="Search",
                        body=(_SEARCH_FORM.format(
                            term=html.escape(term, quote=True))
                            + f"<ol>{items}</ol>"),
                    ))
                elif parts.path == "/add-site":
                    url = q.get("url", [""])[0]
                    msg = app.add_site(url) if url else ""
                    self._send(200, _PAGE.format(
                        title="Add site",
                        body=_ADD_FORM.format(msg=html.escape(msg)),
                    ))
                else:
                    self._send(404, _PAGE.format(title="Not found", body=""))

        return Handler

    def make_server(self, port: int = 0) -> ThreadingHTTPServer:
        """Bind (port 0 = ephemeral); caller drives serve_forever()."""
        return ThreadingHTTPServer(("127.0.0.1", port),
                                   self._handler_class())

    def serve_background(self, port: int = 0) -> tuple[ThreadingHTTPServer,
                                                       threading.Thread]:
        srv = self.make_server(port)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return srv, t


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="owlcrawler-ray status/search/add-site webapp"
    )
    p.add_argument("--out", required=True, help="crawl output directory")
    p.add_argument("--port", type=int, default=7070)  # reference default
    args = p.parse_args(argv)
    app = CrawlWebApp(args.out)
    srv = app.make_server(args.port)
    print(f"Listening on port {srv.server_port} ...")
    srv.serve_forever()


if __name__ == "__main__":
    main()
