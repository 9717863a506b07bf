"""The CouchDB→ES river analog: incremental index maintenance over the
crawl's committed rounds must equal a from-scratch batch rebuild, never
double-index on re-poll, and tail a crawl that resumes."""

import pyarrow as pa

from owlcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from owlcrawler_ray.pipelines.river import IndexRiver, _round_postings
from owlcrawler_ray.sources.corpus import WebConfig

WEB = WebConfig(num_hosts=3, base_pages=6, hot_factor=2, n_seed_hosts=2)


def _cfg(base, **kw):
    kw.setdefault("budget_per_round", 9)
    return CrawlConfig(
        web=WEB, out_dir=f"{base}/out", ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2, image_concurrency=1, **kw,
    )


def _batch_rebuild(pages: pa.Table) -> pa.Table:
    return _round_postings(pages)


def test_river_incremental_equals_batch(ray_session, tmp_path):
    base = str(tmp_path / "river")
    c, _ = run_crawl(_cfg(base))
    try:
        river = IndexRiver(f"{base}/out")
        pending = river.pending_rounds()
        assert len(pending) >= 2  # several bulks to tail
        # tail incrementally: one round, then the rest
        first = river.poll()
        assert first == pending
        # idempotent re-poll: nothing new, nothing double-indexed
        assert river.poll() == []
        got = river.index_table().sort_by(
            [("word", "ascending"), ("doc_id", "ascending")]
        )
        want = _batch_rebuild(c.pages_table()).sort_by(
            [("word", "ascending"), ("doc_id", "ascending")]
        )
        assert got.equals(want)
        # the search surface the river feeds
        top = river.search("page")
        assert top.num_rows > 0
        ns = top.column("n").to_pylist()
        assert ns == sorted(ns, reverse=True)
    finally:
        c.shutdown()


def test_river_tails_resumed_crawl(ray_session, tmp_path):
    """Kill the crawl mid-flight, poll the river, resume the crawl, poll
    again: the final index equals the batch rebuild of the full crawl."""
    base = str(tmp_path / "riverresume")
    c1, _ = run_crawl(_cfg(base, max_ticks=12))
    c1.shutdown()
    river = IndexRiver(f"{base}/out")
    early = river.poll()
    assert early  # indexed the pre-kill rounds

    c2, _ = run_crawl(_cfg(base, budget_per_round=14), resume=True)
    try:
        late = river.poll()
        assert late and set(late).isdisjoint(early)
        got = river.index_table().sort_by(
            [("word", "ascending"), ("doc_id", "ascending")]
        )
        want = _batch_rebuild(c2.pages_table()).sort_by(
            [("word", "ascending"), ("doc_id", "ascending")]
        )
        assert got.equals(want)
    finally:
        c2.shutdown()


def test_river_survives_stale_round_prune(ray_session, tmp_path):
    """A kill inside the checkpoint window leaves pages rounds (and their
    river deltas) newer than the checkpoint; the resume prunes BOTH, and
    a re-poll re-indexes the re-chunked rounds to the correct index."""
    import os
    import shutil

    base = str(tmp_path / "riverprune")
    c1, _ = run_crawl(_cfg(base, budget_per_round=5, max_ticks=15))
    c1.shutdown()
    river = IndexRiver(f"{base}/out")
    river.poll()  # river fully caught up, incl. the soon-stale round
    ckpt_root = f"{base}/ckpt"
    rounds = sorted(
        int(d.split("=")[1]) for d in os.listdir(ckpt_root)
        if d.startswith("round=") and not d.endswith(".tmp")
    )
    for r in rounds[-2:]:
        shutil.rmtree(os.path.join(ckpt_root, f"round={r:06d}"))

    c2, _ = run_crawl(_cfg(base, budget_per_round=14), resume=True)
    try:
        assert "windex" in c2.metrics.get("pruned_on_resume", {})
        river.poll()
        got = river.index_table().sort_by(
            [("word", "ascending"), ("doc_id", "ascending")]
        )
        want = _batch_rebuild(c2.pages_table()).sort_by(
            [("word", "ascending"), ("doc_id", "ascending")]
        )
        assert got.equals(want)
    finally:
        c2.shutdown()


def test_river_index_dataset_equals_table(ray_session, tmp_path):
    """The streaming (Dataset) index merge — the 10^10-page path where the
    merged postings never land on the driver — equals the driver-side
    Arrow merge."""
    base = str(tmp_path / "riverds")
    c, _ = run_crawl(_cfg(base))
    try:
        river = IndexRiver(f"{base}/out")
        river.poll()
        want = river.index_table().sort_by(
            [("word", "ascending"), ("doc_id", "ascending")]
        )
        got = (
            river.index_dataset()
            .to_pandas()
            .sort_values(["word", "doc_id"])
            .reset_index(drop=True)
        )
        assert len(got) == want.num_rows
        assert list(got["word"]) == want.column("word").to_pylist()
        assert list(got["doc_id"]) == want.column("doc_id").to_pylist()
        assert list(got["n"]) == want.column("n").to_pylist()
    finally:
        c.shutdown()
