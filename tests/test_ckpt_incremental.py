"""Incremental (delta-chain) seen checkpoints.

Per-round checkpoint cost must be O(progress), not O(|seen|): each
SeenShard writes only the urls gained since its last ACKED write, prior
chain files are hardlinked forward (round dirs stay self-contained), a
remove_many poisons the append-only chain and forces a full rewrite, and
resume through the chain — including from a LEGACY full-snapshot layout —
reproduces the uninterrupted run row-for-row."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from owlcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from owlcrawler_ray.sources.corpus import WebConfig
from owlcrawler_ray.state.seen import SeenShard

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
    pages = sorted(c.pages_table().to_pylist(), key=lambda r: r["fetch_seq"])
    atts = sorted(c.attempts_table().to_pylist(), key=lambda r: r["tick"])
    imgs = sorted(
        c.images_table().to_pylist(), key=lambda r: (r["tick"], r["img_idx"])
    )
    return pages, atts, imgs


# ---- unit: the shard-side protocol (in-process, no Ray) ----------------

def test_delta_then_ack_then_empty(tmp_path):
    s = SeenShard(0)
    s.add_many(["http://a/1", "http://a/2"])
    rec = s.ckpt_write(str(tmp_path), 0)
    assert rec == {"file": "seen_delta_0000_r000000_000.parquet",
                   "full": False}
    t = pq.read_table(os.path.join(tmp_path, rec["file"]))
    assert sorted(t.column("url").to_pylist()) == ["http://a/1", "http://a/2"]
    s.ckpt_ack()
    # nothing new -> no file
    assert s.ckpt_write(str(tmp_path), 1) == {"file": None, "full": False}
    s.ckpt_ack()
    s.add_many(["http://a/3"])
    rec = s.ckpt_write(str(tmp_path), 2)
    assert rec["full"] is False
    t = pq.read_table(os.path.join(tmp_path, rec["file"]))
    assert t.column("url").to_pylist() == ["http://a/3"]


def test_unacked_write_resends(tmp_path):
    """A write whose commit never happened (no ack) re-sends the same
    urls in the next write — the at-least-once side of the protocol."""
    s = SeenShard(0)
    s.add_many(["http://a/1"])
    s.ckpt_write(str(tmp_path), 0)  # commit "crashes": no ack
    s.add_many(["http://a/2"])
    rec = s.ckpt_write(str(tmp_path), 1)
    t = pq.read_table(os.path.join(tmp_path, rec["file"]))
    assert sorted(t.column("url").to_pylist()) == ["http://a/1", "http://a/2"]


def test_remove_forces_full_rewrite(tmp_path):
    s = SeenShard(0)
    s.add_many(["http://a/1", "http://a/2"])
    s.ckpt_write(str(tmp_path), 0)
    s.ckpt_ack()
    s.remove_many(["http://a/1"])
    rec = s.ckpt_write(str(tmp_path), 1)
    assert rec["full"] is True
    t = pq.read_table(os.path.join(tmp_path, rec["file"]))
    assert t.column("url").to_pylist() == ["http://a/2"]
    s.ckpt_ack()
    # chain reset acknowledged: back to (empty) deltas
    assert s.ckpt_write(str(tmp_path), 2) == {"file": None, "full": False}


def test_remove_between_write_and_ack_not_lost(tmp_path):
    """A remove that lands between ckpt_write and ckpt_ack bumps the
    epoch past the captured value, so the NEXT write is still full."""
    s = SeenShard(0)
    s.add_many(["http://a/1", "http://a/2"])
    rec = s.ckpt_write(str(tmp_path), 0)
    assert rec["full"] is False
    s.remove_many(["http://a/2"])  # races the commit
    s.ckpt_ack()
    rec = s.ckpt_write(str(tmp_path), 1)
    assert rec["full"] is True
    t = pq.read_table(os.path.join(tmp_path, rec["file"]))
    assert t.column("url").to_pylist() == ["http://a/1"]


def test_force_full_compaction(tmp_path):
    s = SeenShard(0)
    s.add_many(["http://a/1"])
    s.ckpt_write(str(tmp_path), 0)
    s.ckpt_ack()
    s.add_many(["http://a/2"])
    rec = s.ckpt_write(str(tmp_path), 1, True)  # driver-forced compaction
    assert rec["full"] is True
    t = pq.read_table(os.path.join(tmp_path, rec["file"]))
    assert sorted(t.column("url").to_pylist()) == ["http://a/1", "http://a/2"]


def test_full_write_covers_spilled_runs_and_tombstones(tmp_path):
    """The full-snapshot path must enumerate the WHOLE shard state — hot
    set, disk-spilled sorted runs, cuckoo-overflow keys — minus tombstoned
    removals; a shard restored from that single file answers membership
    identically. This is the 10^10-URL configuration (spill_dir set), so
    a miss here would silently drop spilled urls from every compaction."""
    urls = [f"http://h{i % 7}/p{i}" for i in range(50)]
    s = SeenShard(0, spill_dir=str(tmp_path / "spill"), max_mem_urls=8)
    s.add_many(urls)  # crosses max_mem_urls repeatedly -> several runs
    assert s._runs, "precondition: the shard actually spilled"
    removed = urls[3:9]  # spans hot + spilled keys
    s.remove_many(removed)
    rec = s.ckpt_write(str(tmp_path), 0)
    assert rec["full"] is True  # remove poisoned the chain
    t = pq.read_table(os.path.join(tmp_path, rec["file"]))
    expect = sorted(set(urls) - set(removed))
    assert t.column("url").to_pylist() == expect
    fresh = SeenShard(1)
    fresh.restore(t)
    assert list(fresh.contains_many(urls)) == [u not in removed for u in urls]
    # restore wiped the checkpoint state: nothing pending, chain clean
    assert fresh.ckpt_write(str(tmp_path), 1) == {"file": None, "full": False}


# ---- e2e: crawl checkpoints are deltas, resume is exact ----------------

def test_crawl_checkpoints_are_deltas_and_hardlinked(ray_session, tmp_path):
    base = str(tmp_path / "delta")
    c, s = run_crawl(_cfg(base, budget_per_round=5))
    c.shutdown()
    ckpt_root = f"{base}/ckpt"
    rounds = sorted(
        d for d in os.listdir(ckpt_root)
        if d.startswith("round=") and not d.endswith(".tmp")
    )
    assert len(rounds) >= 3
    last = os.path.join(ckpt_root, rounds[-1])
    with open(os.path.join(last, "manifest.json")) as f:
        manifest = json.load(f)
    chain = manifest["seen_chain"]
    # the final round's chain holds MANY per-round delta files, none full
    names = [n for files in chain.values() for n in files]
    assert len(names) > len(chain)  # more files than shards => real chain
    assert all("seen_delta_" in n for n in names)
    # chain union == the complete seen set
    import ray
    urls = set()
    for files in chain.values():
        for n in files:
            urls.update(
                pq.read_table(os.path.join(last, n)).column("url").to_pylist()
            )
    assert len(urls) == s["seen"]
    # group the chain files by the round id embedded in their names —
    # NOT by len(rounds) (wrong once retention prunes early rounds, and a
    # final no-progress checkpoint writes no file tagged with its round,
    # which made the original own-rows assertion vacuous)
    import re

    by_round: dict[int, list[str]] = {}
    for n in names:
        rid = int(re.search(r"_r(\d{6})_", n).group(1))
        by_round.setdefault(rid, []).append(n)
    assert len(by_round) >= 2  # the chain really spans multiple rounds
    # files inherited from earlier rounds are hardlinks (shared inode)
    cur = int(manifest["round"])
    early = [n for rid, ns in by_round.items() if rid < cur for n in ns]
    assert early and any(
        os.stat(os.path.join(last, n)).st_nlink > 1 for n in early
    )
    # the deltas are disjoint, cover the seen set exactly, and NO single
    # round's files carry the whole set — per-round checkpoint bytes are
    # proportional to that round's progress, not to |seen|
    rows_by_round = {
        rid: sum(pq.read_table(os.path.join(last, n)).num_rows for n in ns)
        for rid, ns in by_round.items()
    }
    assert sum(rows_by_round.values()) == len(urls)
    assert max(rows_by_round.values()) < len(urls)


def test_resume_from_legacy_full_snapshot_layout(ray_session, tmp_path):
    """Upgrade path: a checkpoint written by the OLD layout (driver-side
    seen_shard_NNNN.parquet full snapshots, no seen_chain) must restore,
    and the resumed run must match the uninterrupted crawl exactly."""
    full_base = str(tmp_path / "legfull")
    base = str(tmp_path / "leg")
    c_full, _ = run_crawl(_cfg(full_base))
    want = _rows(c_full)
    c_full.shutdown()

    c1, _ = run_crawl(_cfg(base, max_ticks=12))
    c1.shutdown()
    ckpt_root = f"{base}/ckpt"
    # convert EVERY committed round to the legacy layout in place
    for d in os.listdir(ckpt_root):
        rd_path = os.path.join(ckpt_root, d)
        mpath = os.path.join(rd_path, "manifest.json")
        if not d.startswith("round=") or not os.path.exists(mpath):
            continue
        with open(mpath) as f:
            manifest = json.load(f)
        chain = manifest.pop("seen_chain")
        for key in sorted(chain, key=int):
            parts = [
                pq.read_table(os.path.join(rd_path, n)) for n in chain[key]
            ]
            merged = (
                pa.concat_tables(parts) if parts
                else pa.table({"url": pa.array([], pa.string()),
                               "url_hash": pa.array([], pa.uint64())})
            )
            # legacy snapshots were exact sets; dedupe like snapshot() did
            merged = merged.group_by(["url"]).aggregate(
                [("url_hash", "min")]
            ).rename_columns(["url", "url_hash"])
            pq.write_table(
                merged, os.path.join(rd_path, f"seen_shard_{int(key):04d}.parquet")
            )
        for files in chain.values():
            for n in files:
                os.remove(os.path.join(rd_path, n))
        with open(mpath, "w") as f:
            json.dump(manifest, f)

    c2, s2 = run_crawl(_cfg(base), resume=True)
    got = _rows(c2)
    c2.shutdown()
    assert s2["fetched"] == len(want[0])
    for g, w, name in zip(got, want, ("pages", "attempts", "images")):
        assert len(g) == len(w), name
        for a, b in zip(g, w):
            assert a == b, name


def test_save_load_legacy_roundtrip(tmp_path):
    """CheckpointManager.save() (the full-snapshot path kept for callers
    without actor-side writers) round-trips through load(): frontier and
    seen shards come back table-for-table under the legacy layout."""
    from owlcrawler_ray.sinks.checkpoint import CheckpointManager

    ck = CheckpointManager(str(tmp_path / "ck"))
    fr = [pa.table({"url": ["http://a/1", "http://a/2"],
                    "seq": pa.array([0, 1], pa.int64())}),
          pa.table({"url": ["http://b/1"], "seq": pa.array([2], pa.int64())})]
    sn = [pa.table({"url": ["http://a/1"],
                    "url_hash": pa.array([7], pa.uint64())}),
          pa.table({"url": pa.array([], pa.string()),
                    "url_hash": pa.array([], pa.uint64())})]
    ck.save(3, fr, sn, {"counters": {"tick": 9}})
    assert ck.latest_round() == 3
    fr2, sn2, manifest = ck.load(3)
    assert [t.to_pydict() for t in fr2] == [t.to_pydict() for t in fr]
    assert [t.to_pydict() for t in sn2] == [t.to_pydict() for t in sn]
    assert manifest["counters"] == {"tick": 9}
    assert "seen_chain" not in manifest  # legacy layout, no chain


def test_inherit_chain_missing_source_fails_loudly(tmp_path):
    """A chain file absent from the previous committed round is a broken
    invariant (external deletion / non-shared checkpoint root): the error
    must name the file and round dir, not die in a copy fallback."""
    import pytest

    from owlcrawler_ray.sinks.checkpoint import CheckpointManager

    ck = CheckpointManager(str(tmp_path / "ck"))
    tmp0 = ck.begin(0)
    path = os.path.join(tmp0, "seen_delta_0000_r000000_000.parquet")
    pq.write_table(pa.table({"url": ["http://a/1"]}), path)
    ck.commit(0, {"seen_chain": {"0": ["seen_delta_0000_r000000_000.parquet"]}})
    tmp1 = ck.begin(1)
    with pytest.raises(RuntimeError, match="missing from committed"):
        ck.inherit_chain(0, tmp1, {"0": ["seen_delta_9999_nope.parquet"]})


def test_prune_reports_only_committed_rounds(tmp_path):
    """An uncommitted round dir (crash between the dir swap and the
    manifest write) is swept by retention but must NOT be reported as a
    pruned round — the ids feed the crawl's pruned-history metric."""
    from owlcrawler_ray.sinks.checkpoint import CheckpointManager

    ck = CheckpointManager(str(tmp_path / "ck"))
    for r in (0, 2, 3, 4):
        ck.begin(r)
        ck.commit(r, {})
    # round 1 crashed post-swap, pre-manifest: dir exists, no manifest
    os.makedirs(os.path.join(ck.root, "round=000001"))
    pruned = ck.prune_old(keep=2)
    assert pruned == [0, 2]  # committed sweeps only
    left = sorted(os.listdir(ck.root))
    assert left == ["round=000003", "round=000004"]  # dir 1 swept too
