"""End-to-end parity: the Ray crawl must reproduce the serial oracle's
attempt log, fetch order, seen set, page extraction and image emission —
at any budget chunking (north-rule ordering/URL-seen parity)."""

import shutil

import pytest

from owlcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from owlcrawler_ray.pipelines.oracle import run_oracle
from owlcrawler_ray.sources.corpus import SyntheticWeb, WebConfig

SMALL_WEB = WebConfig(num_hosts=4, base_pages=6, hot_factor=3, n_seed_hosts=2)


def _crawl(tmp_base, budget, **kw):
    shutil.rmtree(tmp_base, ignore_errors=True)
    cfg = CrawlConfig(
        web=SMALL_WEB,
        budget_per_round=budget,
        out_dir=f"{tmp_base}/out",
        ckpt_dir=f"{tmp_base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        **kw,
    )
    c, summary = run_crawl(cfg)
    try:
        yield_data = {
            "summary": summary,
            "attempts": [
                (a["tick"], a["url"], a["status"])
                for a in c.attempts_table().sort_by("tick").to_pylist()
            ],
            "order": [
                f["url"] for f in sorted(c.fetch_log, key=lambda f: f["fetch_seq"])
            ],
            "pages": {p["url"]: p for p in c.pages_table().to_pylist()},
            "images": [
                (i["image_id"], i["caption"], i["fmt"], i["w"], i["h"])
                for i in sorted(
                    c.images_table().to_pylist(),
                    key=lambda r: (r["tick"], r["img_idx"]),
                )
            ],
        }
    finally:
        c.shutdown()
    return yield_data


@pytest.fixture(scope="module")
def oracle():
    return run_oracle(SyntheticWeb(SMALL_WEB))


@pytest.mark.parametrize("budget", [7, 1000])
def test_parity_at_budget(ray_session, tmp_path, oracle, budget):
    got = _crawl(str(tmp_path / f"b{budget}"), budget)
    want_attempts = [
        (a["tick"], a["url"], a["status"]) for a in oracle.attempts
    ]
    assert got["attempts"] == want_attempts
    assert got["order"] == oracle.fetch_order
    assert set(got["pages"]) == oracle.seen
    for url, want in oracle.pages.items():
        p = got["pages"][url]
        assert p["doc_id"] == want["doc_id"]
        for k in ("title", "h1", "h2", "h3", "h4", "text", "links",
                  "links_to_queue"):
            assert p[k] == want[k], f"{url} field {k}"
        assert p["fetch_seq"] == want["fetch_seq"]
    want_imgs = [(i["image_id"], i["caption"]) for i in oracle.images]
    assert [(i[0], i[1]) for i in got["images"]] == want_imgs


def test_virtual_clock_and_timestamps(ray_session, tmp_path, oracle):
    got = _crawl(str(tmp_path / "clock"), 16)
    # virtual_time = 5 s per attempt tick, monotone over the whole crawl
    by_url = {p["url"]: p for p in got["pages"].values()}
    want_vt = {f["url"]: f["virtual_time_s"] for f in oracle.fetch_log}
    for url, vt in want_vt.items():
        assert by_url[url]["virtual_time_s"] == vt
        assert by_url[url]["fetched_on"] == by_url[url]["parsed_on"]


def test_polite_mode_terminates_and_dedups(ray_session, tmp_path):
    import shutil as _sh

    base = str(tmp_path / "polite")
    _sh.rmtree(base, ignore_errors=True)
    from owlcrawler_ray.state.politeness import PolitenessConfig

    cfg = CrawlConfig(
        web=SMALL_WEB,
        mode="polite",
        budget_per_round=32,
        politeness=PolitenessConfig(mode="polite", rate_per_s=2.0, burst=8.0),
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        max_rounds=200,
    )
    c, summary = run_crawl(cfg)
    try:
        pages = c.pages_table().to_pylist()
        urls = [p["url"] for p in pages]
        assert len(urls) == len(set(urls))  # no double fetch
        # polite mode reaches the same page SET as the serial semantics
        oracle = run_oracle(SyntheticWeb(SMALL_WEB))
        assert set(urls) == oracle.seen
    finally:
        c.shutdown()


def test_robots_disallow_respected(ray_session, tmp_path):
    from owlcrawler_ray.state.politeness import PolitenessConfig

    base = str(tmp_path / "robots")
    cfg = CrawlConfig(
        web=SMALL_WEB,
        mode="polite",
        politeness=PolitenessConfig(
            mode="polite", rate_per_s=5.0, burst=16.0,
            disallow={"host-1.test": ["/page-"]},
        ),
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        max_rounds=100,
    )
    c, _ = run_crawl(cfg)
    try:
        urls = [p["url"] for p in c.pages_table().to_pylist()]
        assert not any(u.startswith("http://host-1.test/page-") for u in urls)
        assert "http://host-1.test/" in urls  # root itself is allowed
    finally:
        c.shutdown()


def test_polite_mode_caps_hot_host_per_round(ray_session, tmp_path):
    """Skew control: the hot host (3x pages) cannot monopolize a round —
    per-host token buckets cap its admissions while other hosts proceed."""
    from owlcrawler_ray.state.politeness import PolitenessConfig

    base = str(tmp_path / "skew")
    cfg = CrawlConfig(
        web=SMALL_WEB,  # host-0 is 3x hot
        mode="polite",
        politeness=PolitenessConfig(mode="polite", rate_per_s=0.4, burst=2.0),
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        max_rounds=300,
    )
    c, _ = run_crawl(cfg)
    try:
        per_round = [m["per_host_fetches"] for m in c.metrics["rounds"]]
        for counts in per_round:
            # burst=2.0 -> no host ever gets more than 2 fetches in a round
            assert all(v <= 2 for v in counts.values()), counts
        total = {}
        for counts in per_round:
            for h, v in counts.items():
                total[h] = total.get(h, 0) + v
        # the hot host still gets crawled fully, just spread across rounds
        # (+1: the seed root url "/" is distinct from "/page-0.html")
        assert total.get("host-0.test", 0) == SMALL_WEB.pages_on(0) + 1
    finally:
        c.shutdown()


def test_parity_with_seen_spill(ray_session, tmp_path, oracle):
    """The disk-spilling seen set (the 10^10-scale path) preserves exact
    ordering/seen parity even with an absurdly small memory cap."""
    got = _crawl(
        str(tmp_path / "spill"), 16, seen_spill=True, seen_max_mem_urls=8
    )
    want_attempts = [(a["tick"], a["url"], a["status"]) for a in oracle.attempts]
    assert got["attempts"] == want_attempts
    assert got["order"] == oracle.fetch_order
    assert set(got["pages"]) == oracle.seen


def test_fetched_robots_txt_respected(ray_session, tmp_path):
    """Polite mode FETCHES /robots.txt from the web per host (parsed +
    cached in the gate) and honors the Disallow prefixes."""
    from owlcrawler_ray.state.politeness import PolitenessConfig, parse_robots

    web_cfg = WebConfig(num_hosts=6, base_pages=8, hot_factor=2,
                        n_seed_hosts=6, robots_frac=1.0)
    web = SyntheticWeb(web_cfg)
    # every host disallows one /page-K prefix (deterministic)
    rules = {
        web.host(i): [p for p, allow in
                      parse_robots(web.robots_txt(web.host(i)))
                      if not allow]
        for i in range(web_cfg.num_hosts)
    }
    assert all(rules.values())
    base = str(tmp_path / "robots_fetch")
    cfg = CrawlConfig(
        web=web_cfg,
        mode="polite",
        politeness=PolitenessConfig(mode="polite", rate_per_s=5.0, burst=16.0),
        fetch_robots=True,
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        max_rounds=100,
    )
    c, _ = run_crawl(cfg)
    try:
        from urllib.parse import urlsplit

        urls = [p["url"] for p in c.pages_table().to_pylist()]
        assert urls
        for u in urls:
            parts = urlsplit(u)
            for prefix in rules[parts.netloc]:
                assert not parts.path.startswith(prefix), (u, prefix)
    finally:
        c.shutdown()


def test_polite_crawl_allow_override(ray_session, tmp_path, monkeypatch):
    """End-to-end RFC 9309 Allow precedence (round-4 verdict item #7):
    host-1 serves a robots.txt that disallows every /page- path but
    re-allows exactly /page-1.html via a longer anchored Allow rule.
    The polite crawl must fetch host-1's root AND page-1 (the root
    always links pages 1..fanout) and NOTHING else on that host, while
    other hosts crawl normally."""
    from owlcrawler_ray.sources.corpus import SyntheticWeb as SW
    from owlcrawler_ray.state.politeness import PolitenessConfig

    real_robots = SW.robots_txt

    def robots(self, host):
        if host == "host-1.test":
            return ("User-agent: *\n"
                    "Disallow: /page-\n"
                    "Allow: /page-1.html$\n")
        return real_robots(self, host)

    monkeypatch.setattr(SW, "robots_txt", robots)
    base = str(tmp_path / "allow_override")
    cfg = CrawlConfig(
        web=SMALL_WEB,
        mode="polite",
        politeness=PolitenessConfig(mode="polite", rate_per_s=5.0,
                                    burst=16.0),
        fetch_robots=True,
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        max_rounds=100,
    )
    c, _ = run_crawl(cfg)
    try:
        from urllib.parse import urlsplit

        urls = [p["url"] for p in c.pages_table().to_pylist()]
        h1_paths = {urlsplit(u).path for u in urls
                    if urlsplit(u).netloc == "host-1.test"}
        assert h1_paths == {"/", "/page-1.html"}
        # the rest of the web is unaffected
        assert any(urlsplit(u).netloc != "host-1.test" for u in urls)
    finally:
        c.shutdown()


def test_crawl_sites_and_stats_match_oracle(ray_session):
    """A1/A2 over real crawl output: stored `site-` seed docs + per-host
    page counts and the fetched/parsed stats view must agree with the
    serial oracle on the same web."""
    from owlcrawler_ray.functions.ids import host_of, seed_doc_id
    from owlcrawler_ray.pipelines import oracle as orc
    from owlcrawler_ray.pipelines.queries import (
        _crawl_cfg,
        q_crawl_sites,
        q_crawl_stats,
    )
    from owlcrawler_ray.sources.corpus import SyntheticWeb

    sites = q_crawl_sites("unused").to_pydict()
    web = SyntheticWeb(_crawl_cfg("sites").web)
    r = orc.run_oracle(web)
    assert sorted(sites["site"]) == sorted(web.seeds())
    assert sites["doc_id"] == [seed_doc_id(s) for s in sites["site"]]
    per_host: dict = {}
    for u in r.fetch_order:
        per_host[host_of(u)] = per_host.get(host_of(u), 0) + 1
    # cross-host links mean non-seed hosts get crawled too; the sites view
    # covers the seeded hosts only
    seed_hosts = {host_of(s) for s in sites["site"]}
    assert sum(sites["n_pages"]) == sum(
        1 for u in r.fetch_order if host_of(u) in seed_hosts
    )
    for s, n in zip(sites["site"], sites["n_pages"]):
        assert n == per_host.get(host_of(s), 0)
    assert sum(sites["n_pages"]) > 0

    stats = q_crawl_stats("unused").to_pydict()
    assert stats["fetched"] == [len(r.pages)]
    assert stats["parsed"] == [len(r.pages)]


def test_actor_stage_fetcher_parity(ray_session, tmp_path):
    """use_actor_stages=True (the Dataset actor-pool fetcher — the shape a
    real session-holding fetcher needs) must produce the EXACT same crawl
    as the task-pool path and the serial oracle."""
    base = str(tmp_path / "actorstages")
    cfg = CrawlConfig(
        web=SMALL_WEB,
        budget_per_round=23,
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        use_actor_stages=True,
    )
    c, _ = run_crawl(cfg)
    try:
        oracle = run_oracle(SyntheticWeb(SMALL_WEB))
        pages = c.pages_table().sort_by("fetch_seq")
        assert pages.column("url").to_pylist() == oracle.fetch_order
        atts = c.attempts_table().sort_by("tick").to_pylist()
        assert [(a["url"], a["tick"], a["status"]) for a in atts] == [
            (a["url"], a["tick"], a["status"]) for a in oracle.attempts
        ]
        imgs = c.images_table().sort_by(
            [("tick", "ascending"), ("img_idx", "ascending")]
        )
        assert imgs.column("image_id").to_pylist() == [
            i["image_id"] for i in oracle.images
        ]
    finally:
        c.shutdown()


def test_add_sites_mid_crawl_parity(ray_session, tmp_path):
    """Runtime seed injection (webapp submit-a-site): sites added after
    the crawl has consumed N ticks are crawled with exact ordering parity
    (they join the queue tail, like a NATS publish at that tick), appear
    in the sites table, and re-submission is a no-op (the 409 analog)."""
    base = str(tmp_path / "inject")
    T = 10
    new_sites = ["http://host-2.test/", "http://host-3.test/"]
    cfg = CrawlConfig(
        web=SMALL_WEB, budget_per_round=4, max_ticks=T,
        out_dir=f"{base}/out", ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2, image_concurrency=1,
    )
    c, _ = run_crawl(cfg)
    try:
        assert c.tick == T
        assert c.add_sites(new_sites) == 2
        # idempotent re-submit: site docs exist -> skipped, not re-queued
        assert c.add_sites(new_sites) == 0
        c.cfg.max_ticks = None
        c.run()

        want = run_oracle(SyntheticWeb(SMALL_WEB), inject={T: new_sites})
        got_attempts = [
            (a["tick"], a["url"], a["status"])
            for a in c.attempts_table().sort_by("tick").to_pylist()
        ]
        assert got_attempts == [
            (a["tick"], a["url"], a["status"]) for a in want.attempts
        ]
        order = [
            f["url"] for f in sorted(c.fetch_log, key=lambda f: f["fetch_seq"])
        ]
        assert order == want.fetch_order
        assert {p for p in c.pages_table().column("url").to_pylist()} == want.seen
        # injected sites really got crawled (they are unreachable organically)
        assert all(u in want.seen for u in new_sites)
        # sites table: original seeds + the two injected docs, in order
        sites = c.sites_table().sort_by("submitted_seq")
        assert sites.column("site").to_pylist() == (
            SyntheticWeb(SMALL_WEB).seeds() + new_sites
        )
        assert sites.column("submitted_seq").to_pylist() == [0, 1, 2, 3]
    finally:
        c.shutdown()


def test_add_sites_after_frontier_drained_parity(ray_session, tmp_path):
    """Seed injection AFTER the organic frontier fully drained (run()
    returned on an empty frontier, not on max_ticks): the oracle delivers
    pending injections without jumping the clock, matching add_sites +
    a second run() — the r3 review's 'silently dropped injection' edge."""
    base = str(tmp_path / "inject_drained")
    new_sites = ["http://host-2.test/", "http://host-3.test/"]
    cfg = CrawlConfig(
        web=SMALL_WEB, budget_per_round=16,
        out_dir=f"{base}/out", ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2, image_concurrency=1,
    )
    c, s1 = run_crawl(cfg)
    try:
        assert s1["frontier_left"] == 0  # organically drained
        drained_tick = c.tick
        assert c.add_sites(new_sites) == 2
        c.run()
        # oracle with an injection tick far beyond the drain point: the
        # pending group must still be crawled (clock continues from the
        # drain tick, no jump)
        want = run_oracle(
            SyntheticWeb(SMALL_WEB), inject={drained_tick + 999: new_sites}
        )
        got_attempts = [
            (a["tick"], a["url"], a["status"])
            for a in c.attempts_table().sort_by("tick").to_pylist()
        ]
        assert got_attempts == [
            (a["tick"], a["url"], a["status"]) for a in want.attempts
        ]
        assert {u for u in c.pages_table().column("url").to_pylist()} \
            == want.seen
        assert all(u in want.seen for u in new_sites)
    finally:
        c.shutdown()


def test_admit_parity_widen_path_skips_seen_prefix(ray_session, tmp_path):
    """The vectorized _admit_parity's widen-retry branch (W *= 2): when
    the whole first peek window is already-seen entries, the admit must
    widen, discard the seen prefix tick-free (consuming their seqs from
    the frontier) and return the first-K UNSEEN entries in global
    (priority, seq) order — the reference dequeue loop's behavior when
    the queue head is full of duplicates."""
    import ray

    from owlcrawler_ray.functions import ids
    from owlcrawler_ray.pipelines.crawl import CrawlConfig, Crawler

    cfg = CrawlConfig(
        web=SMALL_WEB,
        budget_per_round=2,  # K=2 -> first peek window is W=2 per shard
        out_dir=f"{tmp_path}/out",
        ckpt_dir=f"{tmp_path}/ckpt",
        fetch_concurrency=1,
        image_concurrency=1,
    )
    c = Crawler(cfg)
    try:
        # 12 already-seen urls at priority -1.0: they sort ahead of every
        # seed (priority 0.0), so the K=2 peek sees ONLY seen entries
        dup_urls = [f"http://dup{i}.example.com/" for i in range(12)]
        shards = ids.shard_of(dup_urls, cfg.num_seen_shards)
        futs = []
        for s in range(cfg.num_seen_shards):
            us = [u for u, sh in zip(dup_urls, shards) if sh == s]
            if us:
                futs.append(c.seen[s].test_and_set_many.remote(us))
        ray.get(futs)
        c._push_frontier(
            dup_urls, [1] * 12, [-1.0] * 12,
            list(range(1000, 1012)),
        )
        before = sum(ray.get([f.size.remote() for f in c.frontier]))
        admitted = c._admit_parity()
        # first-K unseen = the first two SEEDS by (priority, seq)
        seeds = c.web.seeds()
        assert admitted.column("url").to_pylist() == seeds[:2]
        assert admitted.num_rows == 2
        # every seen entry scanned on the way was consumed from the
        # frontier alongside the two admitted seeds, none re-admittable
        after = sum(ray.get([f.size.remote() for f in c.frontier]))
        assert after == before - 12 - 2
        again = c._admit_parity()
        assert again.column("url").to_pylist() == seeds[2:4]
    finally:
        c.shutdown()
