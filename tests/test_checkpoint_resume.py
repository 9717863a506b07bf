"""Kill-and-resume: a crawl stopped mid-flight (tick cap simulates the
kill) and resumed from its checkpoint must produce row-identical pages,
attempts and images to an uninterrupted run."""

import shutil

import pytest

from owlcrawler_ray.pipelines.crawl import CrawlConfig, Crawler, run_crawl
from owlcrawler_ray.sources.corpus import WebConfig

WEB = WebConfig(num_hosts=3, base_pages=6, hot_factor=2, n_seed_hosts=2)


def _cfg(base, **kw):
    kw.setdefault("budget_per_round", 10)
    return CrawlConfig(
        web=WEB,
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2,
        image_concurrency=1,
        **kw,
    )


def _rows(c):
    pages = sorted(
        c.pages_table().to_pylist(), key=lambda r: r["fetch_seq"]
    )
    atts = sorted(c.attempts_table().to_pylist(), key=lambda r: r["tick"])
    imgs = sorted(
        c.images_table().to_pylist(), key=lambda r: (r["tick"], r["img_idx"])
    )
    return pages, atts, imgs


def test_resume_is_identical(ray_session, tmp_path):
    full_base = str(tmp_path / "full")
    part_base = str(tmp_path / "part")
    shutil.rmtree(full_base, ignore_errors=True)
    shutil.rmtree(part_base, ignore_errors=True)

    c_full, _ = run_crawl(_cfg(full_base))
    full = _rows(c_full)
    c_full.shutdown()

    # "kill" mid-crawl (the full crawl takes ~21 ticks)
    c1, s1 = run_crawl(_cfg(part_base, max_ticks=12))
    assert s1["ticks"] <= 12
    assert s1["fetched"] < len(full[0])
    c1.shutdown()
    # resume with the cap lifted (execution knobs may change freely)
    c2, s2 = run_crawl(_cfg(part_base, budget_per_round=17), resume=True)
    resumed = _rows(c2)
    c2.shutdown()

    assert s2["fetched"] == len(full[0])
    for got, want, name in zip(resumed, full, ("pages", "attempts", "images")):
        assert len(got) == len(want), name
        for g, w in zip(got, want):
            assert g == w, f"{name} row mismatch: {g} != {w}"


def test_resume_refuses_changed_web(ray_session, tmp_path):
    base = str(tmp_path / "cfgchange")
    shutil.rmtree(base, ignore_errors=True)
    c1, _ = run_crawl(_cfg(base, max_ticks=12))
    c1.shutdown()
    other = CrawlConfig(
        web=WebConfig(num_hosts=5, base_pages=4, n_seed_hosts=2),
        out_dir=f"{base}/out",
        ckpt_dir=f"{base}/ckpt",
    )
    with pytest.raises(ValueError, match="different crawl config"):
        Crawler(other, resume=True)


def test_restart_without_resume_flag_starts_fresh(ray_session, tmp_path):
    base = str(tmp_path / "fresh")
    shutil.rmtree(base, ignore_errors=True)
    c1, s1 = run_crawl(_cfg(base, max_ticks=12))
    c1.shutdown()
    # fresh (non-resume) run over the same dirs: committed rounds are
    # skipped idempotently, state rebuilt from scratch deterministically
    c2, s2 = run_crawl(_cfg(base))
    try:
        assert s2["fetched"] >= s1["fetched"]
        urls = [p["url"] for p in c2.pages_table().to_pylist()]
        assert len(urls) == len(set(urls))
    finally:
        c2.shutdown()
