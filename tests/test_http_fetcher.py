"""HttpFetcher (S5, fetcher.go:44-61) against a REAL in-process HTTP
server that serves the deterministic corpus over vhosts (logical host in
the Host header — the standard vhost test pattern): byte parity with
CorpusFetcher, 404/transport-error routing (F6), fetch->extract->sink
round-trip, and full crawl parity vs the serial oracle with the network
fetcher running as an actor-pool stage over localhost."""

import shutil
import threading
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from owlcrawler_ray.sources.corpus import SyntheticWeb, WebConfig
from owlcrawler_ray.stages.fetch import USER_AGENT, CorpusFetcher, HttpFetcher

SMALL_WEB = WebConfig(num_hosts=4, base_pages=6, hot_factor=3, n_seed_hosts=2)
KILL_PATH = "/__drop-connection__"


class _CorpusHandler(BaseHTTPRequestHandler):
    web = SyntheticWeb(SMALL_WEB)
    protocol_version = "HTTP/1.1"
    seen_agents: list = []

    def do_GET(self):
        if self.path == KILL_PATH:
            # transport failure: drop the TCP connection with no response
            self.connection.close()
            return
        self.seen_agents.append(self.headers.get("User-Agent"))
        host = (self.headers.get("Host") or "").split(":")[0]
        status, body = self.web.fetch(f"http://{host}{self.path}")
        self.send_response(status)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # keep pytest output clean
        pass


class _QuietServer(ThreadingHTTPServer):
    def handle_error(self, request, client_address):  # dropped connections
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = _QuietServer(("127.0.0.1", 0), _CorpusHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _entries(urls):
    from owlcrawler_ray.state.frontier import entries_table

    hosts = [u.split("/")[2] for u in urls]
    return entries_table(urls, hosts, [0] * len(urls), [0.0] * len(urls),
                         list(range(len(urls))))


def test_http_fetch_byte_parity_with_corpus(http_server):
    """Every page and 404 the corpus fetcher sees, the network fetcher
    must see byte-identically through a real GET (status + body), with
    the reference's fixed User-Agent on the wire."""
    web = SyntheticWeb(SMALL_WEB)
    urls = (
        [web.page_url(0, i) for i in range(6)]
        + [web.page_url(1, 0), "http://host-1.test/"]
        + ["http://host-0.test/page-999.html",  # dead link -> 404
           "http://host-9.test/"]               # unknown host -> 404
    )
    batch = _entries(urls)
    _CorpusHandler.seen_agents.clear()
    got = HttpFetcher(rewrite_base=http_server, max_parallel=4)(batch)
    want = CorpusFetcher(SMALL_WEB)(batch)
    assert got.column("status").to_pylist() == want.column("status").to_pylist()
    assert got.column("html").to_pylist() == want.column("html").to_pylist()
    assert set(_CorpusHandler.seen_agents) == {USER_AGENT}


def test_http_transport_error_routes_status0(http_server):
    """F6 error path: a dropped connection records status 0 + empty body
    (the reference logs-and-drops; the row is filtered by the 200 gate and
    the URL stays retryable) — and must not poison the rest of the batch."""
    web = SyntheticWeb(SMALL_WEB)
    batch = _entries(["http://host-0.test" + KILL_PATH, web.page_url(0, 0)])
    out = HttpFetcher(rewrite_base=http_server, max_parallel=2)(batch)
    assert out.column("status").to_pylist()[0] == 0
    assert out.column("html").to_pylist()[0] == b""
    assert out.column("status").to_pylist()[1] == 200


def test_http_fetch_extract_sink_roundtrip(http_server, tmp_path):
    """fetch -> extract -> table-store sink over localhost: the committed
    page rows equal the corpus-fetcher path's rows exactly."""
    from owlcrawler_ray.sinks import table_store
    from owlcrawler_ray.stages.extract import extract_batch

    web = SyntheticWeb(SMALL_WEB)
    urls = [web.page_url(0, i) for i in range(4)] + [
        "http://host-0.test/page-999.html"
    ]
    batch = _entries(urls)
    import pyarrow.compute as pc

    rows = {}
    for name, fetched in (
        ("http", HttpFetcher(rewrite_base=http_server)(batch)),
        ("corpus", CorpusFetcher(SMALL_WEB)(batch)),
    ):
        ext = extract_batch(fetched)
        ok = ext.filter(pc.equal(ext.column("status"), 200))
        raw = ok.drop_columns(["fetch_candidates", "img_urls", "img_captions"])
        root = str(tmp_path / name)
        tmp = table_store.begin_round(root, "pages", 0)
        table_store.write_part(tmp, raw, key="t0")
        table_store.commit_round(root, "pages", 0)
        back = table_store.read_all_arrow(root, "pages")
        rows[name] = back.sort_by("url").to_pylist()
    assert len(rows["http"]) == 4  # the 404 row was routed out
    assert rows["http"] == rows["corpus"]


def test_http_crawl_full_parity(http_server, ray_session, tmp_path):
    """The flagship check: run the full crawl with the NETWORK fetcher as
    an actor-pool map_batches stage (session built once per actor) over
    the localhost vhost server — attempt log, fetch order and seen set
    must equal the serial oracle exactly, like every other parity run."""
    from owlcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from owlcrawler_ray.pipelines.oracle import run_oracle

    base = str(tmp_path / "httpcrawl")
    shutil.rmtree(base, ignore_errors=True)
    cfg = CrawlConfig(
        web=SMALL_WEB,
        budget_per_round=32,
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        use_actor_stages=True,
        fetcher_factory=partial(
            HttpFetcher, rewrite_base=http_server, max_parallel=4
        ),
    )
    c, _ = run_crawl(cfg)
    try:
        got_attempts = [
            (a["tick"], a["url"], a["status"])
            for a in c.attempts_table().sort_by("tick").to_pylist()
        ]
        got_order = [
            f["url"] for f in sorted(c.fetch_log, key=lambda f: f["fetch_seq"])
        ]
        got_seen = {p["url"] for p in c.pages_table().to_pylist()}
    finally:
        c.shutdown()
    oracle = run_oracle(SyntheticWeb(SMALL_WEB))
    assert got_attempts == [
        (a["tick"], a["url"], a["status"]) for a in oracle.attempts
    ]
    assert got_order == oracle.fetch_order
    assert got_seen == oracle.seen


def test_cached_fetcher_dedupes_equal_factories():
    """The per-process fetcher cache must return ONE live fetcher for
    structurally equal factories (each crawl round pickles a fresh
    closure, so per-closure state would leak one thread-pool fetcher per
    round per worker), and distinct configs must get distinct fetchers."""
    from functools import partial

    from owlcrawler_ray.stages.fetch import HttpFetcher, cached_fetcher

    f1 = cached_fetcher(partial(HttpFetcher, rewrite_base="http://127.0.0.1:1"))
    f2 = cached_fetcher(partial(HttpFetcher, rewrite_base="http://127.0.0.1:1"))
    f3 = cached_fetcher(partial(HttpFetcher, rewrite_base="http://127.0.0.1:2"))
    try:
        assert f1 is f2
        assert f1 is not f3
    finally:
        f1.close()
        f3.close()
