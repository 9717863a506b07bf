"""Regression tests for the round-5 closing review findings: polite-mode
livelock config, write_round's Dataset branch part naming, mid-commit
reader races, token refunds at the max_ticks cap, checkpoint-manifest
metrics alignment, and the images metric counting the store's rows."""

import os
import shutil

import pyarrow as pa
import pytest

from owlcrawler_ray.pipelines.crawl import CrawlConfig, Crawler, run_crawl
from owlcrawler_ray.sinks import table_store
from owlcrawler_ray.sinks.checkpoint import CheckpointManager
from owlcrawler_ray.sources.corpus import SyntheticWeb, WebConfig
from owlcrawler_ray.state.politeness import PolitenessConfig, PolitenessGate

WEB = WebConfig(num_hosts=3, base_pages=6, hot_factor=2, n_seed_hosts=2)


def _cfg(base, **kw):
    kw.setdefault("budget_per_round", 10)
    return CrawlConfig(
        web=WEB, out_dir=f"{base}/out", ckpt_dir=f"{base}/ckpt",
        fetch_concurrency=2, image_concurrency=1, **kw,
    )


# -- finding 1: polite-mode buckets that can never grant a token ----------

def test_polite_zero_rate_config_refused(tmp_path):
    for pol in (
        PolitenessConfig(mode="polite", rate_per_s=0.0, burst=4.0),
        PolitenessConfig(mode="polite", rate_per_s=1.0, burst=0.5),
    ):
        with pytest.raises(ValueError, match="spin forever"):
            Crawler(_cfg(str(tmp_path / "z"), mode="polite", politeness=pol))


# -- finding 2: write_round's Dataset branch must produce readable parts --

def test_write_round_dataset_branch_parts_readable(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "dsround")
    t = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    table_store.write_round(rd.from_arrow(t), root, "pages", 0)
    wname, paths = table_store.round_part_paths(root, "pages", 0)
    assert paths, "Dataset-branch parts must be discoverable (part-*)"
    assert all(os.path.basename(p).startswith("part-") for p in paths)
    back = table_store.read_all_arrow(root, "pages")
    assert back.num_rows == 3
    assert sorted(back.column("k").to_pylist()) == [1, 2, 3]
    assert table_store.round_num_rows(root, "pages", 0) == 3


# -- finding 3: readers racing the pages->stamps commit window ------------

def test_round_part_paths_missing_round_dir_is_empty(tmp_path):
    wname, paths = table_store.round_part_paths(str(tmp_path), "stamps", 7)
    assert paths == []
    assert table_store.round_num_rows(str(tmp_path), "stamps", 7) == 0


def test_stamped_view_skips_uncommitted_stamps_round(ray_session, tmp_path):
    base = str(tmp_path / "race")
    c, _ = run_crawl(_cfg(base))
    try:
        full = c.pages_table().num_rows
        rounds = table_store.list_rounds(c.cfg.out_dir, "pages")
        assert len(rounds) >= 2
        # simulate a reader landing between the pages commit and the
        # stamps commit of the LAST round: its stamps _SUCCESS is absent
        last = rounds[-1]
        os.remove(os.path.join(
            c.cfg.out_dir, "stamps", f"round={last:06d}", "_SUCCESS"))
        partial = c.pages_table()
        assert 0 < partial.num_rows < full  # skipped, not crashed
    finally:
        c.shutdown()


# -- finding 4: max_ticks truncation must refund host tokens --------------

def test_bucket_refund_exact_inverse():
    gate = PolitenessGate(PolitenessConfig(
        mode="polite", rate_per_s=1.0, burst=4.0))
    got = gate.admit_budget("h", 3, now_s=0.0)
    assert got == 3
    assert gate.buckets["h"].tokens == pytest.approx(1.0)
    gate.refund("h", 3)
    assert gate.buckets["h"].tokens == pytest.approx(4.0)
    gate.refund("h", 99)  # capped at burst, never beyond
    assert gate.buckets["h"].tokens == pytest.approx(4.0)
    gate.refund("missing-host", 1)  # unknown host: no-op, no crash


def test_polite_truncation_refunds_tokens(ray_session, tmp_path):
    base = str(tmp_path / "trunc")
    shutil.rmtree(base, ignore_errors=True)
    cfg = _cfg(
        base, mode="polite", max_ticks=1, budget_per_round=32,
        politeness=PolitenessConfig(mode="polite", rate_per_s=2.0,
                                    burst=8.0),
    )
    c = Crawler(cfg)
    try:
        admitted = c._admit_polite()
        assert admitted.num_rows <= 1
        # every token debited beyond the kept entries was refunded: at
        # virtual now=0 no refill has happened, so the total outstanding
        # debit across buckets must equal the admitted row count exactly
        debited = sum(
            b.burst - b.tokens for b in c.gate.buckets.values()
        )
        assert debited == pytest.approx(admitted.num_rows)
    finally:
        c.shutdown()


# -- finding 5: checkpoint manifest carries the CURRENT round's metrics ---

def test_checkpoint_manifest_metrics_current_round(ray_session, tmp_path):
    base = str(tmp_path / "manifest")
    c, _ = run_crawl(_cfg(base, checkpoint_every=1))
    try:
        ck = CheckpointManager(c.cfg.ckpt_dir)
        for m in c.metrics["rounds"]:
            _, _, manifest = ck.load(m["round"])
            assert manifest["metrics"].get("round") == m["round"]
            assert manifest["metrics"]["attempts"] == m["attempts"]
    finally:
        c.shutdown()


# -- finding 6: the images metric reports the store's actual rows ---------

def test_images_metric_matches_store_rows(ray_session, tmp_path):
    base = str(tmp_path / "imgmetric")
    c, _ = run_crawl(_cfg(base))
    try:
        store_rows = table_store.read_all_arrow(
            c.cfg.out_dir, "images", columns=["image_id"]).num_rows
        metric_rows = sum(m["images"] for m in c.metrics["rounds"])
        assert metric_rows == store_rows
        assert store_rows > 0
    finally:
        c.shutdown()
