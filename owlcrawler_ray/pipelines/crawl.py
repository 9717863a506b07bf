"""The crawl loop: Ray-Data rounds over actor-held frontier + seen state.

Architecture (SURVEY.md §3.4) — replaces the reference's NATS queues +
CouchDB store + worker processes (fetcher.go / extractor.go) with:

  frontier shards (actors, per-host heaps)  ->  ADMIT (dequeue-dedup parity)
    -> Dataset: map_batches(CorpusFetcher pool) -> map_batches(extract)
    -> driver assigns politeness ticks per ATTEMPT (reference: one 5s tick
       per actual GET, fetcher.go:96-99; dequeue-time seen check is free)
    -> map_batches(advisory filter + stamps)  [seen-actor RPCs per batch]
    -> pages round parquet  +  image explode/fetch/decode -> images rounds
    -> new links seq-numbered in (tick, doc-order) = NATS publish order
    -> seen actors commit successes; checkpoint (frontier+seen+counters)

Parity contract (tested against pipelines/oracle.run_oracle): identical
attempt log (url, tick, status), fetch order, final seen set, per-page
links/links_to_queue, image emission order — at any parallelism level and
any budget_per_round chunking.

Scale notes: per-round working set is bounded by the politeness budget
(budget_per_round ticks), so the two per-round materializations hold
O(budget x page size) bytes, never the whole crawl; frontier/seen state
lives in actors (sharded), html/images only ever stream through Datasets;
driver-side bookkeeping per round is O(admitted + new links) url strings,
independent of total crawl size.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..functions import ids
from ..sinks import table_store
from ..sinks.checkpoint import CheckpointManager
from ..sources.corpus import SyntheticWeb, WebConfig
from ..stages.extract import extract_batch
from ..stages.fetch import CorpusFetcher
from ..stages.images import ImageDecoder, ImageFetcher, explode_image_refs
from ..state.frontier import FrontierShard, entries_table
from ..state.politeness import PolitenessConfig, PolitenessGate
from ..state.seen import SeenShard

EPOCH_US = 1420070400000000  # 2015-01-01T00:00:00 (virtual-clock origin)


@dataclass
class CrawlConfig:
    web: WebConfig = field(default_factory=WebConfig)
    mode: str = "parity"  # "parity" (reference budget) | "polite" (per-host)
    budget_per_round: int = 64  # politeness ticks admitted per round
    num_seen_shards: int = 4
    num_frontier_shards: int = 4
    fetch_concurrency: int = 4
    fetch_batch_size: int = 32
    image_concurrency: int = 2
    image_batch_size: int = 64
    tick_seconds: int = 5
    max_rounds: int = 100000
    max_ticks: int | None = None
    out_dir: str = "/tmp/owlcrawl/out"
    ckpt_dir: str = "/tmp/owlcrawl/ckpt"
    exact_seen: bool = True
    use_cuckoo: bool = True
    politeness: PolitenessConfig = field(default_factory=PolitenessConfig)
    checkpoint_every: int = 1
    write_images: bool = True
    keep_logs: bool = True  # in-memory attempt/fetch logs (tests/parity)

    def fingerprint(self) -> str:
        """Semantic identity of a crawl — fields that must match for a
        checkpoint to be resumable. Execution knobs (budget_per_round,
        concurrency, batch sizes, max_ticks/rounds) may change freely across
        a resume: parity is chunking-invariant by construction."""
        d = {
            "web": asdict(self.web),
            "mode": self.mode,
            "tick_seconds": self.tick_seconds,
            "num_seen_shards": self.num_seen_shards,
            "num_frontier_shards": self.num_frontier_shards,
            "exact_seen": self.exact_seen,
            "use_cuckoo": self.use_cuckoo,
            "politeness": asdict(self.politeness),
            "out_dir": self.out_dir,
            "write_images": self.write_images,
        }
        return hashlib.blake2b(
            json.dumps(d, sort_keys=True, default=str).encode(), digest_size=8
        ).hexdigest()


def _advisory_stamp_fn(seen_handles, meta, succ_tick, tick_seconds):
    """Build the stateless advisory-filter + stamp stage (runs as Ray tasks;
    per-batch RPC to the seen shards — the batched replacement for the
    reference's one-HEAD-per-link check, parse.go:110,117)."""
    num_shards = len(seen_handles)

    def stamp(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        keep = [i for i, u in enumerate(urls) if u in meta]
        batch = batch.take(pa.array(keep, type=pa.int64()))
        urls = [urls[i] for i in keep]
        cand_lists = batch.column("fetch_candidates").to_pylist()
        uniq = sorted({c for cl in cand_lists for c in cl})
        seen_before: dict[str, bool] = {}
        if uniq:
            shards = ids.shard_of(uniq, num_shards)
            per = [[] for _ in range(num_shards)]
            for u, s in zip(uniq, shards):
                per[int(s)].append(u)
            masks = ray.get(
                [seen_handles[s].contains_many.remote(per[s])
                 for s in range(num_shards) if per[s]]
            )
            mi = 0
            for s in range(num_shards):
                if per[s]:
                    for u, m in zip(per[s], masks[mi]):
                        seen_before[u] = bool(m)
                    mi += 1
        ticks, seqs, vts, links_q = [], [], [], []
        for u, cl in zip(urls, cand_lists):
            tick, fseq = meta[u]
            ticks.append(tick)
            seqs.append(fseq)
            vts.append(tick * tick_seconds)
            links_q.append(
                [
                    c
                    for c in cl
                    if not seen_before.get(c, False)
                    and not (c in succ_tick and succ_tick[c] <= tick)
                ]
            )
        vt_us = [EPOCH_US + v * 1_000_000 for v in vts]
        ts = pa.timestamp("us")
        return (
            batch.append_column("tick", pa.array(ticks, type=pa.int64()))
            .append_column("fetch_seq", pa.array(seqs, type=pa.int64()))
            .append_column("virtual_time_s", pa.array(vts, type=pa.int64()))
            .append_column("links_to_queue", pa.array(links_q, type=pa.list_(pa.string())))
            .append_column("fetched_on", pa.array(vt_us, type=ts))
            .append_column("parsed_on", pa.array(vt_us, type=ts))
        )

    return stamp


class Crawler:
    def __init__(self, cfg: CrawlConfig, resume: bool = False):
        self.cfg = cfg
        self.web = SyntheticWeb(cfg.web)
        self.ckpt = CheckpointManager(cfg.ckpt_dir)
        seen_cls = ray.remote(num_cpus=0)(SeenShard)
        frontier_cls = ray.remote(num_cpus=0)(FrontierShard)
        self.seen = [
            seen_cls.remote(i, 1 << 16, cfg.exact_seen, cfg.use_cuckoo)
            for i in range(cfg.num_seen_shards)
        ]
        self.frontier = [
            frontier_cls.remote(i) for i in range(cfg.num_frontier_shards)
        ]
        self.gate = PolitenessGate(cfg.politeness)
        self.next_seq = 0
        self.tick = 0
        self.fetch_seq = 0
        self.round_id = 0
        self.attempts_log: list[dict] = []
        self.fetch_log: list[dict] = []
        self.metrics: dict = {"rounds": []}
        restored = False
        if resume:
            restored = self._restore()
        if not restored:
            self._seed()

    # ------------------------------------------------------------------
    def _seed(self) -> None:
        seeds = self.web.seeds()
        # seed docs are stored with a `site-` prefix id (couchdb.go:147-151)
        # and so do NOT mark the url itself as seen — nothing to add to the
        # seen set here; just enqueue in submission order.
        self._push_frontier(
            seeds,
            [0] * len(seeds),
            [0.0] * len(seeds),
            list(range(len(seeds))),
        )
        self.next_seq = len(seeds)

    def _host_shard(self, hosts: list[str]) -> np.ndarray:
        return ids.shard_of(hosts, self.cfg.num_frontier_shards)

    def _push_frontier(self, urls, depths, prios, seqs) -> None:
        if not urls:
            return
        hosts = [ids.host_of(u) for u in urls]
        shard = self._host_shard(hosts)
        futs = []
        for s in range(self.cfg.num_frontier_shards):
            idx = np.where(shard == s)[0]
            if not len(idx):
                continue
            t = entries_table(
                [urls[i] for i in idx],
                [hosts[i] for i in idx],
                [depths[i] for i in idx],
                [prios[i] for i in idx],
                [seqs[i] for i in idx],
            )
            futs.append(self.frontier[s].push_table.remote(t))
        ray.get(futs)

    def _contains_many(self, urls: list[str]) -> dict[str, bool]:
        uniq = sorted(set(urls))
        if not uniq:
            return {}
        shards = ids.shard_of(uniq, self.cfg.num_seen_shards)
        per = [[] for _ in range(self.cfg.num_seen_shards)]
        for u, s in zip(uniq, shards):
            per[int(s)].append(u)
        futs, order = [], []
        for s in range(self.cfg.num_seen_shards):
            if per[s]:
                futs.append(self.seen[s].contains_many.remote(per[s]))
                order.append(s)
        out: dict[str, bool] = {}
        for s, mask in zip(order, ray.get(futs)):
            for u, m in zip(per[s], mask):
                out[u] = bool(m)
        return out

    # ------------------------------------------------------------------
    def _admit_parity(self) -> list[dict]:
        """First-K-unseen occurrences in global (priority, seq) order —
        the reference's dequeue loop (fetcher.go:94-103) in batch form.
        Seen occurrences encountered on the way are discarded tick-free."""
        K = self.cfg.budget_per_round
        if self.cfg.max_ticks is not None:
            K = min(K, self.cfg.max_ticks - self.tick)
            if K <= 0:
                return []
        nf = self.cfg.num_frontier_shards
        W = K
        while True:
            peeks = ray.get([self.frontier[s].peek.remote(W) for s in range(nf)])
            entries: list[tuple[float, int, str, str, int]] = []
            horizon: tuple[float, int] | None = None
            for t in peeks:
                rows = list(
                    zip(
                        t.column("priority").to_pylist(),
                        t.column("discovered_seq").to_pylist(),
                        t.column("url").to_pylist(),
                        t.column("host").to_pylist(),
                        t.column("depth").to_pylist(),
                    )
                )
                entries.extend(rows)
                if len(rows) == W:  # this shard may hold more beyond its peek
                    last = (rows[-1][0], rows[-1][1])
                    horizon = last if horizon is None else min(horizon, last)
            entries.sort(key=lambda e: (e[0], e[1]))
            if horizon is not None:
                entries = [e for e in entries if (e[0], e[1]) <= horizon]
            if not entries:
                return []
            seen_mask = self._contains_many([e[2] for e in entries])
            admitted, discard = [], []
            truncated = horizon is not None
            for prio, seq, url, host, depth in entries:
                if seen_mask[url]:
                    discard.append(seq)
                    continue
                admitted.append(
                    {"url": url, "host": host, "depth": depth,
                     "priority": prio, "seq": seq}
                )
                if len(admitted) >= K:
                    break
            if len(admitted) >= K or not truncated:
                consumed = discard + [a["seq"] for a in admitted]
                cset = set(consumed)
                futs = []
                for s in range(nf):
                    shard_seqs = [
                        q for q in peeks[s].column("discovered_seq").to_pylist()
                        if q in cset
                    ]
                    if shard_seqs:
                        futs.append(self.frontier[s].remove_seqs.remote(shard_seqs))
                ray.get(futs)
                return admitted
            W *= 2  # scanned window exhausted by discards; widen and retry

    def _admit_polite(self) -> list[dict]:
        """Scale-mode admission: per-host token buckets cap each host's
        share of a round; hosts starve independently, not each other."""
        now = float(self.tick * self.cfg.tick_seconds)
        nf = self.cfg.num_frontier_shards
        W = max(self.cfg.budget_per_round, 64)
        peeks = ray.get([self.frontier[s].peek.remote(W) for s in range(nf)])
        entries = []
        for t in peeks:
            entries.extend(
                zip(
                    t.column("priority").to_pylist(),
                    t.column("discovered_seq").to_pylist(),
                    t.column("url").to_pylist(),
                    t.column("host").to_pylist(),
                    t.column("depth").to_pylist(),
                )
            )
        entries.sort(key=lambda e: (e[0], e[1]))
        seen_mask = self._contains_many([e[2] for e in entries])
        by_host: dict[str, list] = {}
        discard = []
        for e in entries:
            if seen_mask[e[2]]:
                discard.append(e[1])
                continue
            if not self.gate.allowed(e[2]):
                discard.append(e[1])  # robots-disallowed: drop permanently
                continue
            by_host.setdefault(e[3], []).append(e)
        admitted = []
        for host, es in sorted(by_host.items()):
            budget = self.gate.admit_budget(host, len(es), now)
            for prio, seq, url, h, depth in es[:budget]:
                admitted.append(
                    {"url": url, "host": h, "depth": depth,
                     "priority": prio, "seq": seq}
                )
        admitted.sort(key=lambda a: (a["priority"], a["seq"]))
        if self.cfg.max_ticks is not None:
            admitted = admitted[: max(0, self.cfg.max_ticks - self.tick)]
        cset = set(discard) | {a["seq"] for a in admitted}
        futs = []
        for s in range(nf):
            shard_seqs = [
                q for q in peeks[s].column("discovered_seq").to_pylist() if q in cset
            ]
            if shard_seqs:
                futs.append(self.frontier[s].remove_seqs.remote(shard_seqs))
        ray.get(futs)
        return admitted

    # ------------------------------------------------------------------
    def _process_round(self, admitted: list[dict]) -> dict:
        cfg = self.cfg
        # distinct urls, first-occurrence order (dup occurrences resolve at
        # tick assignment: first success discards later dups tick-free,
        # failures retry per occurrence — exactly the dequeue semantics)
        firsts: dict[str, dict] = {}
        for a in admitted:
            firsts.setdefault(a["url"], a)
        order = list(firsts.values())
        tbl = entries_table(
            [a["url"] for a in order],
            [a["host"] for a in order],
            [a["depth"] for a in order],
            [a["priority"] for a in order],
            [a["seq"] for a in order],
        )
        n = tbl.num_rows
        conc = max(1, min(cfg.fetch_concurrency, math.ceil(n / cfg.fetch_batch_size)))
        # from_arrow yields ONE block; split it so the fetch pool actually
        # fans out (one block per ~batch, capped at 4x pool size)
        n_blocks = max(1, min(4 * conc, math.ceil(n / cfg.fetch_batch_size)))
        ds = (
            rd.from_arrow(tbl)
            .repartition(n_blocks)
            .map_batches(
                CorpusFetcher,
                fn_constructor_args=(cfg.web,),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=(1, conc),
                zero_copy_batch=True,
            )
            .map_batches(extract_batch, batch_format="pyarrow",
                         batch_size=cfg.fetch_batch_size, zero_copy_batch=True)
        )
        mat = ds.materialize()
        status = {
            r["url"]: r["status"]
            for r in mat.select_columns(["url", "status"]).take_all()
        }
        # ---- politeness-tick assignment (driver, O(admitted)) ----------
        succ_tick: dict[str, int] = {}
        meta: dict[str, tuple[int, int]] = {}
        round_attempts, round_success_urls = [], []
        for a in admitted:
            u = a["url"]
            if u in succ_tick:
                continue  # dup of an already-successful fetch: tick-free
            self.tick += 1
            st = int(status[u])
            round_attempts.append(
                {"tick": self.tick, "virtual_time_s": self.tick * cfg.tick_seconds,
                 "url": u, "status": st}
            )
            if st == 200:
                succ_tick[u] = self.tick
                meta[u] = (self.tick, self.fetch_seq)
                self.fetch_seq += 1
                round_success_urls.append(u)
        # ---- advisory filter + stamps (distributed stage) --------------
        stamp = _advisory_stamp_fn(self.seen, meta, succ_tick, cfg.tick_seconds)
        mat2 = mat.map_batches(
            stamp, batch_format="pyarrow", batch_size=cfg.fetch_batch_size
        ).materialize()
        # ---- sinks ------------------------------------------------------
        pages = mat2.drop_columns(["img_urls", "img_captions", "fetch_candidates"])
        table_store.write_round(pages, cfg.out_dir, "pages", self.round_id)
        if cfg.keep_logs:
            self.attempts_log.extend(round_attempts)
            for u in round_success_urls:
                t, fs = meta[u]
                self.fetch_log.append(
                    {"fetch_seq": fs, "url": u, "doc_id": ids.doc_id(u),
                     "tick": t, "virtual_time_s": t * cfg.tick_seconds}
                )
        table_store.write_round(
            pa.table(
                {
                    "tick": pa.array([r["tick"] for r in round_attempts], pa.int64()),
                    "virtual_time_s": pa.array(
                        [r["virtual_time_s"] for r in round_attempts], pa.int64()
                    ),
                    "url": pa.array([r["url"] for r in round_attempts]),
                    "status": pa.array(
                        [r["status"] for r in round_attempts], pa.int32()
                    ),
                }
            ),
            cfg.out_dir, "attempts", self.round_id,
        )
        n_images = 0
        if cfg.write_images and len(meta):
            imgs = (
                mat2.select_columns(["url", "tick", "img_urls", "img_captions"])
                .map_batches(explode_image_refs, batch_format="pyarrow")
                .map_batches(
                    ImageFetcher,
                    fn_constructor_args=(cfg.web,),
                    batch_format="pyarrow",
                    batch_size=cfg.image_batch_size,
                    concurrency=(1, cfg.image_concurrency),
                )
                .map_batches(
                    ImageDecoder,
                    batch_format="pyarrow",
                    batch_size=cfg.image_batch_size,
                    concurrency=(1, cfg.image_concurrency),
                )
            ).materialize()
            n_images = imgs.count()
            table_store.write_round(imgs, cfg.out_dir, "images", self.round_id)
        # ---- frontier growth: seqs in (tick, doc-order) = publish order -
        link_rows = mat2.select_columns(
            ["url", "tick", "depth", "links_to_queue"]
        ).take_all()
        link_rows.sort(key=lambda r: r["tick"])
        new_urls, new_depths = [], []
        for r in link_rows:
            for link in r["links_to_queue"]:
                new_urls.append(link)
                new_depths.append(int(r["depth"]) + 1)
        new_seqs = list(range(self.next_seq, self.next_seq + len(new_urls)))
        self.next_seq += len(new_urls)
        self._push_frontier(
            new_urls, new_depths, [0.0] * len(new_urls), new_seqs
        )
        # ---- commit seen state ------------------------------------------
        if round_success_urls:
            shards = ids.shard_of(round_success_urls, cfg.num_seen_shards)
            futs = []
            for s in range(cfg.num_seen_shards):
                us = [u for u, sh in zip(round_success_urls, shards) if sh == s]
                if us:
                    futs.append(self.seen[s].add_many.remote(us))
            ray.get(futs)
        hosts = [ids.host_of(u) for u in round_success_urls]
        per_host: dict[str, int] = {}
        for h in hosts:
            per_host[h] = per_host.get(h, 0) + 1
        return {
            "round": self.round_id,
            "admitted": len(admitted),
            "attempts": len(round_attempts),
            "successes": len(round_success_urls),
            "images": int(n_images),
            "new_links": len(new_urls),
            "per_host_fetches": per_host,
        }

    # ------------------------------------------------------------------
    def _checkpoint(self) -> None:
        fr = ray.get([f.snapshot.remote() for f in self.frontier])
        sn = ray.get([s.snapshot.remote() for s in self.seen])
        manifest = {
            "counters": {
                "next_seq": self.next_seq,
                "tick": self.tick,
                "fetch_seq": self.fetch_seq,
                "round_id": self.round_id,
            },
            "config_fingerprint": self.cfg.fingerprint(),
            "metrics": self.metrics["rounds"][-1] if self.metrics["rounds"] else {},
            "lineage": {
                "pages_rounds": table_store.list_rounds(self.cfg.out_dir, "pages"),
                "images_rounds": table_store.list_rounds(self.cfg.out_dir, "images"),
            },
            "politeness": self.gate.state(),
        }
        self.ckpt.save(self.round_id, fr, sn, manifest)

    def _restore(self) -> bool:
        latest = self.ckpt.latest_round()
        if latest is None:
            return False
        fr, sn, manifest = self.ckpt.load(latest)
        if manifest.get("config_fingerprint") != self.cfg.fingerprint():
            raise ValueError(
                "checkpoint was produced by a different crawl config; refusing "
                "to resume (delete the checkpoint dir to start fresh)"
            )
        ray.get(
            [f.restore.remote(t) for f, t in zip(self.frontier, fr)]
            + [s.restore.remote(t) for s, t in zip(self.seen, sn)]
        )
        c = manifest["counters"]
        self.next_seq = c["next_seq"]
        self.tick = c["tick"]
        self.fetch_seq = c["fetch_seq"]
        self.round_id = c["round_id"] + 1
        self.gate.restore(
            {h: tuple(v) for h, v in manifest.get("politeness", {}).items()}
        )
        return True

    # ------------------------------------------------------------------
    def run(self) -> dict:
        cfg = self.cfg
        while self.round_id < cfg.max_rounds:
            if cfg.max_ticks is not None and self.tick >= cfg.max_ticks:
                break
            admitted = (
                self._admit_parity() if cfg.mode == "parity" else self._admit_polite()
            )
            if not admitted:
                if cfg.mode == "polite" and sum(
                    ray.get([f.size.remote() for f in self.frontier])
                ):
                    # buckets empty but frontier not: advance virtual time
                    self.tick += 1
                    continue
                break
            m = self._process_round(admitted)
            self.metrics["rounds"].append(m)
            if self.round_id % cfg.checkpoint_every == 0:
                self._checkpoint()
            self.round_id += 1
        self._checkpoint()
        return self.summary()

    def summary(self) -> dict:
        return {
            "rounds": len(self.metrics["rounds"]),
            "ticks": self.tick,
            "fetched": self.fetch_seq,
            "frontier_left": sum(ray.get([f.size.remote() for f in self.frontier])),
            "seen": sum(ray.get([s.size.remote() for s in self.seen])),
        }

    # parity views ------------------------------------------------------
    def pages_table(self) -> pa.Table:
        return table_store.read_all_arrow(self.cfg.out_dir, "pages")

    def images_table(self) -> pa.Table:
        return table_store.read_all_arrow(self.cfg.out_dir, "images")

    def attempts_table(self) -> pa.Table:
        return table_store.read_all_arrow(self.cfg.out_dir, "attempts")

    def shutdown(self) -> None:
        for a in self.frontier + self.seen:
            ray.kill(a)


def run_crawl(cfg: CrawlConfig, resume: bool = False) -> tuple[Crawler, dict]:
    c = Crawler(cfg, resume=resume)
    summary = c.run()
    return c, summary
