"""Resumable partitioned export: committed buckets are skipped on re-run
(their files untouched); missing buckets are rebuilt deterministically."""

import os

import pyarrow as pa

from owlcrawler_ray.pipelines.export import export_corpus
from owlcrawler_ray.sinks import table_store

SF = "/root/testdata/sf0.001"


def _part_files(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith("_SUCCESS"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
    return out


def test_export_and_resume_skips_committed_buckets(ray_session, tmp_path):
    root = str(tmp_path / "export")
    first = export_corpus(SF, root)
    assert first.num_rows == 16
    total = sum(first.column("n_docs").to_pylist())
    assert total > 0
    before = _part_files(root)
    assert before

    # full re-run: every bucket committed -> nothing rewritten
    again = export_corpus(SF, root)
    assert again.equals(first)
    assert _part_files(root) == before  # identical paths AND mtimes

    # simulate a kill that lost bucket 3: its dir is gone, others commit
    victim = os.path.join(root, "bucket=0003")
    import shutil

    shutil.rmtree(victim)
    third = export_corpus(SF, root)
    assert third.equals(first)  # deterministic rebuild
    after = _part_files(root)
    untouched = {p: m for p, m in after.items() if "bucket=0003" not in p}
    assert untouched == {p: m for p, m in before.items()
                         if "bucket=0003" not in p}
    assert any("bucket=0003" in p for p in after)


def test_export_partition_layout(ray_session, tmp_path):
    root = str(tmp_path / "layout")
    counts = export_corpus(SF, root, n_buckets=4)
    assert counts.column("bucket").to_pylist() == [0, 1, 2, 3]
    for b in range(4):
        assert table_store.round_complete(root, f"bucket={b:04d}", 0)
        t = table_store.read_all_arrow(root, f"bucket={b:04d}")
        if t.num_rows:
            ids = t.column("doc_id").to_pylist()
            assert all(i % 4 == b for i in ids)
            assert min(t.column("n_chars").to_pylist()) >= 100


def test_export_pages_matches_serial_oracle(ray_session, tmp_path):
    """crawl → stream pages → quality gate → bucketed export: per-bucket
    counts must equal the serial oracle's pages run through the same
    transform in plain Python."""
    from owlcrawler_ray.functions.ids import shard_of
    from owlcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from owlcrawler_ray.pipelines.export import export_pages
    from owlcrawler_ray.pipelines.oracle import run_oracle
    from owlcrawler_ray.sources.corpus import SyntheticWeb, WebConfig

    web = WebConfig(num_hosts=3, base_pages=6, hot_factor=2, n_seed_hosts=2)
    base = str(tmp_path / "pagesexp")
    cfg = CrawlConfig(web=web, budget_per_round=13, out_dir=f"{base}/out",
                      ckpt_dir=f"{base}/ckpt", fetch_concurrency=2,
                      image_concurrency=1)
    c, _ = run_crawl(cfg)
    c.shutdown()

    got = export_pages(f"{base}/out", f"{base}/export", n_buckets=4,
                       min_chars=50)
    r = run_oracle(SyntheticWeb(web))
    want = {b: 0 for b in range(4)}
    kept_ids = []
    for url, page in r.pages.items():
        text = " ".join([page["title"]] + list(page["text"]))
        if len(text) >= 50:
            kept_ids.append(page["doc_id"])
    for did, b in zip(kept_ids, shard_of(kept_ids, 4)):
        want[int(b)] += 1
    assert dict(zip(got.column("bucket").to_pylist(),
                    got.column("n_docs").to_pylist())) == want
    assert sum(want.values()) > 0
    # resume: full re-run is a no-op (counts identical, nothing rewritten)
    again = export_pages(f"{base}/out", f"{base}/export", n_buckets=4,
                         min_chars=50)
    assert again.equals(got)


def test_export_readback_is_metadata_only(ray_session, tmp_path,
                                          monkeypatch):
    """The (bucket, n_docs) read-back must come from part FOOTER metadata
    (round_num_rows), never a full-table driver read — at 10^10 docs the
    old read_all_arrow form pulled the whole corpus (text payloads
    included) onto the driver just to count rows. Pin it: with
    read_all_arrow forbidden, a resume-no-op export still reports the
    exact committed counts."""
    root = str(tmp_path / "metaonly")
    first = export_corpus(SF, root, n_buckets=4)

    def boom(*a, **k):  # any driver-side full read is a regression
        raise AssertionError("export read-back must not read row data")

    monkeypatch.setattr(table_store, "read_all_arrow", boom)
    again = export_corpus(SF, root, n_buckets=4)
    assert again.equals(first)
    assert sum(again.column("n_docs").to_pylist()) > 0
