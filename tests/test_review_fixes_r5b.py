"""Round-5 second review batch: empty-store search, offset-width part
healing, cross-origin add-site POSTs, and driver-side stale-spill
clearing."""

import urllib.error
import urllib.parse
import urllib.request

import pyarrow as pa
import pytest

from owlcrawler_ray.sinks import table_store
from owlcrawler_ray.webapp import CrawlWebApp


def test_search_on_empty_store_returns_empty(tmp_path):
    """A detached webapp pointed at a store with NO committed pages round
    (the supported status-page-before-first-commit state) must serve
    search as empty, not KeyError the handler thread: read_all_arrow
    returns a schema-less pa.table({}) there, and the cached body join
    runs BEFORE the caller's num_rows guard."""
    app = CrawlWebApp(str(tmp_path / "never_written"))
    assert app.search("owl") == []
    # the HTTP surface end-to-end, too (this is where the KeyError killed
    # the thread and the client saw a dropped connection)
    srv, _ = app.serve_background()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/index?term=owl"
        with urllib.request.urlopen(url, timeout=10) as r:
            body = r.read().decode("utf-8")
        assert "owl" in body  # the form echoes the term; no results rows
    finally:
        srv.shutdown()


def test_concat_parts_heals_offset_width_split():
    """Parts that disagree ONLY in string/binary offset width (older
    rounds written before the ImageDecoder large_binary upgrade) must
    concat losslessly to the 64-bit-offset type; any other schema drift
    must still fail loudly."""
    old = pa.table({"bytes": pa.array([b"a"], pa.binary()),
                    "cap": pa.array(["x"], pa.string())})
    new = pa.table({"bytes": pa.array([b"b"], pa.large_binary()),
                    "cap": pa.array(["y"], pa.large_string())})
    t = table_store._concat_parts([old, new])
    assert t.schema.field("bytes").type == pa.large_binary()
    assert t.schema.field("cap").type == pa.large_string()
    assert t.column("bytes").to_pylist() == [b"a", b"b"]
    assert t.column("cap").to_pylist() == ["x", "y"]
    # genuine drift (int vs string) is NOT healed
    with pytest.raises(pa.lib.ArrowTypeError):
        table_store._concat_parts([
            pa.table({"v": pa.array([1], pa.int64())}),
            pa.table({"v": pa.array(["s"], pa.string())}),
        ])


def _post(url: str, data: dict, origin: str | None = None):
    req = urllib.request.Request(
        url, data=urllib.parse.urlencode(data).encode("utf-8"), method="POST"
    )
    if origin is not None:
        req.add_header("Origin", origin)
    return urllib.request.urlopen(req, timeout=10)


def test_addsite_cross_origin_post_rejected(tmp_path):
    """Browsers send an Origin header on every cross-origin form POST;
    a mismatched (or opaque 'null') Origin must be refused so a hostile
    page cannot auto-submit crawl seeds. Same-origin and non-browser
    (no-Origin) POSTs pass."""
    out = str(tmp_path / "out")
    app = CrawlWebApp(out)
    srv, _ = app.serve_background()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        for evil in ("http://evil.test", "null"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(f"{base}/add-site", {"url": "http://evil.test/"},
                      origin=evil)
            assert ei.value.code == 403
        import os
        assert not os.path.exists(f"{out}/submitted-sites.txt")
        # same-origin browser POST and a header-less curl-style POST work
        with _post(f"{base}/add-site", {"url": "http://ok-a.test/"},
                   origin=base) as r:
            assert r.status == 200
        with _post(f"{base}/add-site", {"url": "http://ok-b.test/"}) as r:
            assert r.status == 200
        with open(f"{out}/submitted-sites.txt") as f:
            assert f.read() == "http://ok-a.test/\nhttp://ok-b.test/\n"
    finally:
        srv.shutdown()


def test_fresh_crawl_clears_stale_spill_driver_side(ray_session, tmp_path):
    """The stale-run guard runs BEFORE the seen shards exist: a fresh
    crawl over a reused ckpt_dir deletes the previous crawl's
    seen_run_* files driver-side instead of letting every shard load
    O(previous seen set) into its filter only to discard it."""
    import os

    from owlcrawler_ray.pipelines.crawl import CrawlConfig, Crawler
    from owlcrawler_ray.sources.corpus import WebConfig

    base = str(tmp_path)
    cfg = CrawlConfig(
        web=WebConfig(num_hosts=2, base_pages=4, n_seed_hosts=1),
        budget_per_round=16,
        out_dir=f"{base}/out", ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=1, image_concurrency=1,
        seen_spill=True, seen_max_mem_urls=4,
    )
    spill = f"{base}/ckpt/seen_spill"
    os.makedirs(spill, exist_ok=True)
    stale = f"{spill}/seen_run_0000_000000.parquet"
    pa.parquet.write_table(
        pa.table({"url": pa.array(["http://stale.test/"], pa.string()),
                  "url_hash": pa.array([7], pa.uint64())}),
        stale,
    )
    c = Crawler(cfg)  # fresh: no checkpoint committed in ckpt_dir
    try:
        assert not os.path.exists(stale)
    finally:
        c.shutdown()
