"""The crawl loop: distributed rounds over actor-held frontier + seen state.

Architecture (SURVEY.md §3.4) — replaces the reference's NATS queues +
CouchDB store + worker processes (fetcher.go / extractor.go) with:

  frontier shards (actors, per-host heaps)  ->  ADMIT (dequeue-dedup parity)
    -> ONE heavy distributed pass (Ray tasks over arrow slices): fused
       fetch + single-pass extract + image fetch/decode/phash, full page
       rows AND decoded image rows written to the round dirs from inside
       the tasks (content-keyed parts -> retry-idempotent), slim table back
    -> driver assigns politeness ticks per ATTEMPT (reference: one 5s tick
       per actual GET, fetcher.go:96-99; dequeue-time seen check is free)
    -> driver advisory link filter (ONE batched seen-shard RPC per round —
       vs the reference's per-link HTTP HEAD) + stamps sidecar parquet
       (tick/fetch_seq/links_to_queue/fetched_on, url-keyed, merged back
       into pages_table()/images_table() at read time)
    -> new links seq-numbered in (tick, doc-order) = NATS publish order
    -> seen actors commit successes; checkpoint (frontier+seen+counters)

Why raw Ray tasks for the heavy pass instead of Dataset.map_batches: the
pass is a driver-coordinated scatter-gather with a HARD BARRIER (tick
assignment needs every fetch status before stamping), so the streaming
executor's pipelining buys nothing while costing ~35 ms/task of driver
overhead (measured A/B; see _process_round). Dataset map_batches remains
the shape for actor-pool fetchers (use_actor_stages=True) and for every
query/analysis pipeline in pipelines/queries.py.

Parity contract (tested against pipelines/oracle.run_oracle): identical
attempt log (url, tick, status), fetch order, final seen set, per-page
links/links_to_queue, image emission order — at any parallelism level and
any budget_per_round chunking.

Scale notes: per-round working set is bounded by the politeness budget
(budget_per_round ticks); html/image bytes go task -> round parquet and
never cross the object store or reach the driver; frontier/seen state
lives in sharded actors; driver-side bookkeeping per round is
O(admitted + new links) url strings, independent of total crawl size.
Measured: 0.901 throughput scaling efficiency from N=2 to 4N=8 cpus
(BASELINE.md).
"""

from __future__ import annotations

import hashlib
import json
import logging
import math
import os
import threading
import time
from dataclasses import asdict, dataclass, field, replace
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions import ids
from ..sinks import table_store
from ..sinks.checkpoint import CheckpointManager
from ..sources.corpus import SyntheticWeb, WebConfig
from ..stages.extract import extract_batch
from ..stages.fetch import CorpusFetcher, FactoryFetcher, cached_fetcher
from ..stages.images import ImageDecoder, ImageFetcher
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
    # 10^10-scale path: spill each shard's exact set to sorted parquet runs
    # (filter-first membership); parity is unchanged (tested)
    seen_spill: bool = False
    seen_max_mem_urls: int = 1 << 20
    politeness: PolitenessConfig = field(default_factory=PolitenessConfig)
    checkpoint_every: int = 1
    # checkpoint retention: keep only the newest N committed rounds (each
    # is a FULL frontier+seen snapshot — O(rounds x |seen|) disk without a
    # bound). Execution knob (not in fingerprint); 0 = keep all.
    ckpt_keep: int = 8
    write_images: bool = True
    keep_logs: bool = True  # in-memory attempt/fetch logs (tests/parity)
    # actor-pool stages (class + concurrency) are the shape a real
    # session-holding fetcher needs; the sandbox corpus fetcher is a pure
    # function of config, so task pools (False) skip per-round actor startup
    use_actor_stages: bool = False
    # polite-mode robots: fetch /robots.txt from the (corpus) web on first
    # contact with a host, parse + cache in the gate (St6). The reference
    # has no robots handling, so parity mode leaves this off.
    fetch_robots: bool = False
    # optional zero-arg factory returning a Fetcher (e.g.
    # functools.partial(HttpFetcher, rewrite_base=...)) — None = the
    # deterministic corpus fetcher. Built INSIDE each task/actor (a live
    # fetcher holds sockets/threads and must never be pickled). With a
    # real fetcher the factory DOES define page content (it is the
    # source), so its identity enters fingerprint() below; None keeps
    # the legacy fingerprint so existing checkpoints stay resumable.
    fetcher_factory: object | None = None

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
            "fetch_robots": self.fetch_robots,
        }
        if self.fetcher_factory is not None:
            # a non-default fetcher is the page SOURCE: resuming a
            # real-web checkpoint with a different transport would
            # silently append pages from another origin into the same
            # tables — tokenize the factory so the resume guard fires
            f = self.fetcher_factory
            fn = getattr(f, "func", f)
            # qualname, not repr: a repr'd function/lambda embeds a
            # memory address and would break every resume
            name = (getattr(fn, "__module__", "")
                    + "." + getattr(fn, "__qualname__", type(fn).__name__))
            d["fetcher"] = (
                name
                + repr(tuple(getattr(f, "args", ())))
                + repr(sorted(getattr(f, "keywords", {}).items()))
            )
        return hashlib.blake2b(
            json.dumps(d, sort_keys=True, default=str).encode(), digest_size=8
        ).hexdigest()


def _fetch_extract_fn(web_cfg, raw_tmp, imgs_tmp, fetch_inline: bool,
                      fetcher_factory=None):
    """The round's ONE heavy distributed pass: fetch (unless an actor-pool
    fetcher already ran upstream) + single-pass extract + image
    fetch/decode/phash, with side-effect writes of the full page rows
    (html included) AND the decoded image rows into the round's tmp dirs
    (content-keyed part names -> task retries overwrite idempotently), and
    a SLIM return table (url/host/depth/seq/status/candidates/img refs) —
    heavy columns cross the object store exactly once and never reach the
    driver. Images carry (page_url, discovered_seq, img_idx); the tick is
    joined back from the stamps sidecar at read time (tick order within a
    round == admission seq order of the distinct urls, so ordering parity
    is preserved)."""
    img_fetcher = ImageFetcher(web_cfg) if imgs_tmp is not None else None
    img_decoder = ImageDecoder() if imgs_tmp is not None else None
    # the fetcher is built lazily INSIDE the task via the per-process
    # cached_fetcher: a real HttpFetcher holds sockets + a thread pool
    # and cannot ride a pickled closure, and per-CLOSURE state would
    # build one fetcher per ROUND per worker (each round exports a fresh
    # closure that Ray caches forever) — the factory-keyed cache bounds
    # it to one per configuration per worker process

    def fe(batch: pa.Table) -> pa.Table:
        if fetch_inline:
            f = cached_fetcher(
                fetcher_factory if fetcher_factory is not None
                else partial(CorpusFetcher, web_cfg))
            batch = f(batch)
        ext = extract_batch(batch)
        ok = ext.filter(pc.equal(ext.column("status"), 200))
        raw = ok.drop_columns(["fetch_candidates", "img_urls", "img_captions"])
        if raw.num_rows:
            seqs = raw.column("discovered_seq").to_pylist()
            table_store.write_part(
                raw_tmp, raw, key=f"{min(seqs)}-{max(seqs)}-{len(seqs)}"
            )
            if img_fetcher is not None:
                # vectorized page->image explode (row-major flatten order
                # == the per-page discovery order): list_flatten +
                # list_parent_indices replace the old nested to_pylist
                # loop over the hot fused stage (the river.py:46 pattern)
                img_urls = ok.column("img_urls").combine_chunks()
                iu = pc.list_flatten(img_urls)
                if len(iu):
                    parent = pc.list_parent_indices(img_urls)
                    counts = pc.list_value_length(img_urls).to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64)
                    starts = np.repeat(np.cumsum(counts) - counts, counts)
                    ii = (np.arange(int(counts.sum()), dtype=np.int64)
                          - starts).astype(np.int32)
                    refs = pa.table(
                        {
                            "image_url": iu.cast(pa.string()),
                            "caption": pc.list_flatten(
                                ok.column("img_captions").combine_chunks()
                            ).cast(pa.string()),
                            # stand-in key; tick joined at read
                            "tick": pc.take(
                                ok.column("discovered_seq"), parent
                            ).cast(pa.int64()).combine_chunks(),
                            "img_idx": pa.array(ii),
                            "page_url": pc.take(
                                ok.column("url"), parent
                            ).cast(pa.string()).combine_chunks(),
                        }
                    )
                    out = img_decoder(img_fetcher(refs))
                    out = out.rename_columns(
                        [c if c != "tick" else "discovered_seq"
                         for c in out.column_names]
                    )
                    if out.num_rows:
                        sq = out.column("discovered_seq").to_pylist()
                        table_store.write_part(
                            imgs_tmp, out,
                            key=f"i{min(sq)}-{max(sq)}-{out.num_rows}",
                        )
        return ext.select(
            ["url", "host", "depth", "discovered_seq", "status",
             "fetch_candidates", "img_urls", "img_captions"]
        )

    return fe


# per-worker-process cache of round stamps sidecars: tasks of one round
# run consecutively on a worker, so each worker reads a round's (small,
# O(budget)-row) sidecar once; bounded so a view walk over many rounds
# cannot accumulate
_STAMPS_CACHE: dict[tuple, pa.Table] = {}


def _read_stamps(wname: str, paths: tuple[str, ...]) -> pa.Table:
    # cache key includes each part's (mtime, size): a resumed crawl
    # prunes and REWRITES round dirs at the same paths (the stamps part
    # name is keyed by round id alone), so a long-lived worker must not
    # serve the pre-resume sidecar for a rewritten path
    key = (wname, tuple(
        (p, st.st_mtime_ns, st.st_size)
        for p in paths for st in (os.stat(p),)
    ))
    t = _STAMPS_CACHE.get(key)
    if t is None:
        if len(_STAMPS_CACHE) >= 64:
            _STAMPS_CACHE.clear()
        t = pa.concat_tables(
            [table_store.WRITERS[wname].read(p) for p in paths],
            promote_options="default",
        )
        _STAMPS_CACHE[key] = t
    return t


def _join_stamps(wname: str, stamp_paths: tuple[str, ...], key: str,
                 cols: list[str] | None, batch: pa.Table) -> pa.Table:
    """Task-side join of one round's stamps sidecar into a batch of that
    round's output rows. The sidecar is bounded at O(successes) of ONE
    round by the politeness budget and is read INSIDE the task (per-worker
    cached) — the driver ships only its part paths, so building/consuming
    the view moves zero row data through the driver. Every output row is
    a committed success, so a missing stamp is a store-corruption signal
    and hard-fails rather than mis-stamping."""
    if batch.num_rows == 0:
        return batch
    stamps = _read_stamps(wname, stamp_paths)
    pos = pc.index_in(
        batch.column(key).combine_chunks(),
        value_set=stamps.column("url").combine_chunks(),
    )
    if pos.null_count:
        raise ValueError(
            f"crawl output row with no stamps entry (key={key}); the "
            "stamps sidecar and the round data disagree"
        )
    taken = stamps.take(pos)
    out = batch
    for name in (cols if cols is not None
                 else [c for c in stamps.column_names if c != "url"]):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, taken.column(name))
    return out


def _collect_arrow(ds) -> pa.Table:
    """Materialize a small Dataset to one driver Arrow table. map_groups/
    map_batches can emit SCHEMA-LESS empty blocks; concat would fail on
    them, so row-free blocks are dropped first."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def _slice_tables(tbl: pa.Table, n_blocks: int) -> list[pa.Table]:
    """Even driver-side split -> one block per slice (avoids a repartition
    pass; rd.from_arrow(list) makes each table its own block)."""
    n = tbl.num_rows
    n_blocks = max(1, min(n_blocks, n)) if n else 1
    step = math.ceil(n / n_blocks) if n else 1
    return [tbl.slice(i, step) for i in range(0, n, step)] or [tbl]


# seen-checkpoint chain compaction threshold: a shard whose delta chain
# reaches this many files rewrites it as one full snapshot on the next
# checkpoint (LSM compaction — bounds restore reads and link fan-out)
_CKPT_CHAIN_MAX = 64


class Crawler:
    def __init__(self, cfg: CrawlConfig, resume: bool = False):
        if cfg.mode == "polite" and (
            cfg.politeness.rate_per_s <= 0 or cfg.politeness.burst < 1
        ):
            # such buckets can NEVER yield a whole token (take() floors
            # with int(tokens)), so run()'s empty-admission branch would
            # advance the virtual clock forever — refuse up front rather
            # than livelock
            raise ValueError(
                "polite mode needs rate_per_s > 0 and burst >= 1 "
                f"(got rate_per_s={cfg.politeness.rate_per_s}, "
                f"burst={cfg.politeness.burst}); these buckets can never "
                "grant a token and the crawl loop would spin forever"
            )
        self.cfg = cfg
        self.web = SyntheticWeb(cfg.web)
        self.ckpt = CheckpointManager(cfg.ckpt_dir)
        # incremental seen-checkpoint chain: per-shard file lists of the
        # last committed round ({} until the first commit or restore)
        self._seen_chain: dict[str, list[str]] = {}
        self._last_ckpt_round: int = -1
        seen_cls = ray.remote(num_cpus=0)(SeenShard)
        frontier_cls = ray.remote(num_cpus=0)(FrontierShard)
        spill = (
            os.path.join(cfg.ckpt_dir, "seen_spill") if cfg.seen_spill else None
        )
        if spill and not (resume and self.ckpt.latest_round() is not None):
            # FRESH crawl (or resume that will find no checkpoint) over a
            # reused ckpt_dir: SeenShard.__init__ loads every seen_run_*
            # spill file it finds — correct for mid-crawl actor restarts,
            # but ACROSS crawls it would resurrect the previous crawl's
            # seen set and silently suppress fetches. Clear the stale runs
            # DRIVER-SIDE before the shard actors exist: loading a
            # previous 10^10-URL seen set into every shard's filter only
            # to discard it is O(that whole set) of wasted startup work.
            if os.path.isdir(spill):
                for fn in os.listdir(spill):
                    if fn.startswith("seen_run_"):
                        os.remove(os.path.join(spill, fn))
        self.seen = [
            seen_cls.remote(i, 1 << 16, cfg.exact_seen, cfg.use_cuckoo,
                            spill, cfg.seen_max_mem_urls)
            for i in range(cfg.num_seen_shards)
        ]
        self.frontier = [
            frontier_cls.remote(i) for i in range(cfg.num_frontier_shards)
        ]
        web_for_robots = self.web

        def _robots_fetcher(host: str) -> str:
            status, body = web_for_robots.fetch(f"http://{host}/robots.txt")
            return body.decode("utf-8", errors="replace") if status == 200 else ""

        self.gate = PolitenessGate(
            cfg.politeness,
            robots_fetcher=_robots_fetcher if cfg.fetch_robots else None,
        )
        self.next_seq = 0
        self.tick = 0
        self.fetch_seq = 0
        self.round_id = 0
        self.attempts_log: list[dict] = []
        self.fetch_log: list[dict] = []
        self.metrics: dict = {"rounds": []}
        self._add_sites_lock = threading.Lock()
        restored = False
        if resume:
            restored = self._restore()
        if not restored:
            # stale seen-spill runs were already cleared driver-side above
            # (before the shard actors could load them), so the shards
            # start empty here by construction
            self._seed()

    # ------------------------------------------------------------------
    def _seed(self) -> None:
        seeds = self.web.seeds()
        # seed docs are stored with a `site-` prefix id and a {"site": url}
        # body (couchdb.go:147-151; webapp saveSubmittedURL main.go:157-164
        # marshals couchdb.NewSite) — the `sites` view lists exactly these
        # docs (couchdb.go:104-106). Persisted as the crawl's `sites` table
        # (round 0, idempotent under restart). The `site-` prefix means the
        # seed doc does NOT mark the url itself as seen — nothing to add to
        # the seen set here; just enqueue in submission order.
        table_store.write_round(
            pa.table(
                {
                    "doc_id": pa.array(
                        [ids.seed_doc_id(u) for u in seeds], pa.string()
                    ),
                    "site": pa.array(seeds, pa.string()),
                    "submitted_seq": pa.array(
                        np.arange(len(seeds), dtype=np.int64)
                    ),
                }
            ),
            self.cfg.out_dir, "sites", 0,
        )
        self._push_frontier(
            seeds,
            [0] * len(seeds),
            [0.0] * len(seeds),
            list(range(len(seeds))),
        )
        self.next_seq = len(seeds)

    def add_sites(self, urls: list[str]) -> int:
        """Serialized entry for runtime seed injection: the webapp can
        serve /add-site from ThreadingHTTPServer threads, so concurrent
        calls would race the sites-round id (same rid computed twice ->
        one submission overwritten) and the next_seq read-modify-write.
        The between-rounds contract of the impl below still applies for
        calls racing an executing round."""
        with self._add_sites_lock:
            return self._add_sites_impl(urls)

    def _add_sites_impl(self, urls: list[str]) -> int:
        """Runtime seed injection — the reference webapp's submit-a-site
        path (webapp/main.go:143-196: persist couchdb.NewSite, publish the
        URL to ``fetch_url`` mid-stream). Callable between rounds on a
        live crawler, or right after a resumed construction, to GROW the
        crawl without restarting it.

        Semantics mirrored exactly:
          * the ``site-`` doc is persisted idempotently — a doc id already
            in the sites table is skipped (the CouchDB 409 first-writer
            analog, couchdb.go:147-151) and NOT re-enqueued;
          * new URLs join the frontier TAIL with fresh discovered_seqs —
            ordering parity: an injected seed behaves exactly like a link
            discovered at the current tick (FIFO position), which is what
            the reference's NATS publish does;
          * persistence and enqueue are two steps, like the reference's
            store-then-publish: a kill between checkpoint windows keeps
            the site doc (it stays in the sites view) but may lose the
            enqueue — the same at-most-once publish the reference has.

        Returns the number of sites actually injected."""
        existing: set[str] = set()
        t = self.sites_table()
        if t.num_rows:
            existing = set(t.column("doc_id").to_pylist())
        fresh, seen_call = [], set()
        for u in urls:
            d = ids.seed_doc_id(u)
            if d in existing or d in seen_call:
                continue
            seen_call.add(d)
            fresh.append(u)
        if not fresh:
            return 0
        base = t.num_rows
        rounds = table_store.list_rounds(self.cfg.out_dir, "sites")
        rid = (max(rounds) + 1) if rounds else 0
        table_store.write_round(
            pa.table(
                {
                    "doc_id": pa.array(
                        [ids.seed_doc_id(u) for u in fresh], pa.string()
                    ),
                    "site": pa.array(fresh, pa.string()),
                    "submitted_seq": pa.array(
                        np.arange(base, base + len(fresh), dtype=np.int64)
                    ),
                }
            ),
            self.cfg.out_dir, "sites", rid,
        )
        seqs = list(range(self.next_seq, self.next_seq + len(fresh)))
        self.next_seq += len(fresh)
        self._push_frontier(fresh, [0] * len(fresh), [0.0] * len(fresh), seqs)
        return len(fresh)

    def _host_shard(self, hosts: list[str]) -> np.ndarray:
        return ids.shard_of(hosts, self.cfg.num_frontier_shards)

    def _push_frontier(self, urls, depths, prios, seqs) -> None:
        if not len(urls):
            return
        hosts = ids.host_of_many(urls)
        shard = self._host_shard(hosts)
        # build ONE Arrow table, route shards with take — the old
        # per-shard python list comprehensions were 4 x O(links) of
        # driver work per round (SCALING.md mega-round links_push)
        t_all = entries_table(urls, hosts, depths, prios, seqs)
        futs = []
        for s in range(self.cfg.num_frontier_shards):
            idx = np.where(shard == s)[0]
            if not len(idx):
                continue
            futs.append(self.frontier[s].push_table.remote(
                t_all.take(pa.array(idx, type=pa.int64()))
            ))
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

    def _seen_mask_np(self, url_arr: pa.Array) -> np.ndarray:
        """Vectorized seen-set membership for an Arrow string array:
        dedup -> batched per-shard RPC -> index_in map-back. Same RPC
        shape as ``_contains_many`` but per-occurrence output without a
        python dict pass. The blake2b shard hash is the one per-string
        python cost kept — it must stay stable across processes and
        checkpoints (ids.py)."""
        n = len(url_arr)
        if not n:
            return np.zeros(0, dtype=bool)
        uniq_arr = pc.unique(url_arr)
        uniq = uniq_arr.to_pylist()
        seen_u = np.zeros(len(uniq), dtype=bool)
        shards = ids.shard_of(uniq, self.cfg.num_seen_shards)
        futs, fidx = [], []
        for sh in range(self.cfg.num_seen_shards):
            idx = np.where(shards == sh)[0]
            if len(idx):
                futs.append(self.seen[sh].contains_many.remote(
                    [uniq[i] for i in idx]))
                fidx.append(idx)
        for idx, mask in zip(fidx, ray.get(futs)):
            seen_u[idx] = np.asarray(mask, dtype=bool)
        pos = pc.index_in(url_arr, value_set=uniq_arr)
        return seen_u[pos.to_numpy(zero_copy_only=False)]

    # ------------------------------------------------------------------
    def _admit_parity(self) -> pa.Table:
        """First-K-unseen occurrences in global (priority, seq) order —
        the reference's dequeue loop (fetcher.go:94-103) in batch form.
        Seen occurrences encountered on the way are discarded tick-free.
        Returns an ENTRY_SCHEMA table in admit order (all Arrow/numpy:
        the old per-entry tuple walk was ~1 s of a 110k-tick round)."""
        K = self.cfg.budget_per_round
        empty = entries_table([], [], [], [], [])
        if self.cfg.max_ticks is not None:
            K = min(K, self.cfg.max_ticks - self.tick)
            if K <= 0:
                return empty
        nf = self.cfg.num_frontier_shards
        W = K
        while True:
            peeks = ray.get([self.frontier[s].peek.remote(W) for s in range(nf)])
            horizon: tuple[float, int] | None = None
            for t in peeks:
                if t.num_rows == W:  # shard may hold more beyond its peek
                    last = (
                        t.column("priority")[W - 1].as_py(),
                        t.column("discovered_seq")[W - 1].as_py(),
                    )
                    horizon = last if horizon is None else min(horizon, last)
            ent = pa.concat_tables(peeks)
            ent = ent.take(
                pc.sort_indices(
                    ent,
                    sort_keys=[("priority", "ascending"),
                               ("discovered_seq", "ascending")],
                )
            )
            if horizon is not None:
                hp, hs = horizon
                prio = ent.column("priority")
                seq = ent.column("discovered_seq")
                ent = ent.filter(
                    pc.or_(
                        pc.less(prio, hp),
                        pc.and_(pc.equal(prio, hp), pc.less_equal(seq, hs)),
                    )
                )
            if not ent.num_rows:
                return empty
            unseen = ~self._seen_mask_np(ent.column("url").combine_chunks())
            cum = np.cumsum(unseen)
            n_unseen = int(cum[-1])
            # the reference loop stops right after the Kth unseen entry:
            # scanned = that prefix; admitted = unseen within it,
            # discards = seen within it (all scanned seqs are consumed)
            scanned = (
                int(np.searchsorted(cum, K)) + 1 if n_unseen >= K
                else ent.num_rows
            )
            truncated = horizon is not None
            if n_unseen >= K or not truncated:
                consumed = ent.column("discovered_seq").slice(0, scanned)
                futs = []
                for s in range(nf):
                    shard_seqs = peeks[s].column("discovered_seq").filter(
                        pc.is_in(peeks[s].column("discovered_seq"),
                                 value_set=consumed.combine_chunks())
                    )
                    if len(shard_seqs):
                        futs.append(self.frontier[s].remove_seqs.remote(
                            shard_seqs.to_pylist()))
                ray.get(futs)
                return ent.slice(0, scanned).filter(
                    pa.array(unseen[:scanned])
                )
            W *= 2  # scanned window exhausted by discards; widen and retry

    def _admit_polite(self) -> pa.Table:
        """Scale-mode admission: per-host token buckets cap each host's
        share of a round; hosts starve independently, not each other.
        The robots gate + token-bucket walk stays per-entry python (the
        gate's URL parse is semantic, and the scan is bounded by the
        peek window W); only the return shape is Arrow."""
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
                admitted.append((prio, seq, url, h, depth))
        admitted.sort(key=lambda a: (a[0], a[1]))
        if self.cfg.max_ticks is not None:
            cap = max(0, self.cfg.max_ticks - self.tick)
            # the truncated entries stay queued in the frontier (cset is
            # built from the kept slice), so REFUND their already-debited
            # host tokens — same virtual instant, exact inverse of the
            # take — or those hosts would be permanently undercounted on
            # a resume with a raised max_ticks
            for _, _, _, h, _ in admitted[cap:]:
                self.gate.refund(h, 1)
            admitted = admitted[:cap]
        cset = set(discard) | {a[1] for a in admitted}
        futs = []
        for s in range(nf):
            shard_seqs = [
                q for q in peeks[s].column("discovered_seq").to_pylist() if q in cset
            ]
            if shard_seqs:
                futs.append(self.frontier[s].remove_seqs.remote(shard_seqs))
        ray.get(futs)
        return entries_table(
            [a[2] for a in admitted],
            [a[3] for a in admitted],
            [a[4] for a in admitted],
            [a[0] for a in admitted],
            [a[1] for a in admitted],
        )

    # ------------------------------------------------------------------
    def _process_round(self, admitted: pa.Table) -> dict:
        cfg = self.cfg
        tmr: dict[str, float] = {}
        _t0 = time.perf_counter()
        # distinct urls, first-occurrence order (dup occurrences resolve at
        # tick assignment: first success discards later dups tick-free,
        # failures retry per occurrence — exactly the dequeue semantics).
        # pc.unique preserves order of first appearance, so index_in of
        # the uniques against the full column IS the firsts selection.
        adm_urls = admitted.column("url").combine_chunks()
        uniq_urls = pc.unique(adm_urls)
        first_idx = pc.index_in(uniq_urls, value_set=adm_urls)
        tbl = admitted.take(first_idx)
        n = tbl.num_rows
        conc = max(1, min(cfg.fetch_concurrency, math.ceil(n / cfg.fetch_batch_size)))
        # block sizing: ~100 pages/task keeps tasks ~1s — coarse blocks
        # leave straggler tails at the round barrier, too-fine blocks choke
        # the driver-side scheduler (both measured); floor at 2x concurrency
        n_blocks = max(1, min(256, max(2 * conc, math.ceil(n / 128))))
        n_blocks = min(n_blocks, max(1, n))
        raw_tmp = table_store.begin_round(cfg.out_dir, "pages", self.round_id)
        imgs_tmp = (
            table_store.begin_round(cfg.out_dir, "images", self.round_id)
            if cfg.write_images else None
        )
        if cfg.use_actor_stages:
            # actor-pool fetcher via Dataset: the shape a REAL network
            # fetcher needs (session/thread pool built once per actor)
            fe = _fetch_extract_fn(cfg.web, raw_tmp, imgs_tmp, fetch_inline=False)
            fetch_cls, ctor_args = (
                (FactoryFetcher, (cfg.fetcher_factory,))
                if cfg.fetcher_factory is not None
                else (CorpusFetcher, (cfg.web,))
            )
            ds = rd.from_arrow(_slice_tables(tbl, n_blocks)).map_batches(
                fetch_cls,
                fn_constructor_args=ctor_args,
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size,
                concurrency=(1, conc),
                zero_copy_batch=True,
            ).map_batches(
                fe, batch_format="pyarrow",
                batch_size=cfg.fetch_batch_size, zero_copy_batch=True,
            )
            slim = pa.concat_tables(ray.get(ds.to_arrow_refs()))
        else:
            # The round pass is a driver-coordinated scatter-gather with a
            # hard barrier (politeness-tick assignment needs every status):
            # plain Ray tasks over the arrow slices. The Dataset streaming
            # executor buys nothing at a barrier and costs ~35 ms/task of
            # driver-side overhead (measured A/B: 4.4 s vs 3.1 s per 4800
            # pages at 16 cpus) — the Dataset API remains the idiom for the
            # streaming/query pipelines, not for this exchange.
            fe = _fetch_extract_fn(cfg.web, raw_tmp, imgs_tmp,
                                   fetch_inline=True,
                                   fetcher_factory=cfg.fetcher_factory)
            fe_task = ray.remote(num_cpus=1)(fe)
            slim = pa.concat_tables(
                ray.get([fe_task.remote(s) for s in _slice_tables(tbl, n_blocks)])
            )
        table_store.commit_round(cfg.out_dir, "pages", self.round_id)
        if imgs_tmp is not None:
            table_store.commit_round(cfg.out_dir, "images", self.round_id)
        tmr["fetch_extract"] = time.perf_counter() - _t0
        _t0 = time.perf_counter()
        # ---- politeness-tick assignment (driver, VECTORIZED) -----------
        # One tick per occurrence EXCEPT later occurrences of a url whose
        # fetch succeeded (the first success discards its dups tick-free;
        # failures retry per occurrence). A url's status is per-round
        # constant, so "an earlier occurrence already succeeded" is
        # exactly (status==200 AND not first occurrence).
        slim_urls = slim.column("url").combine_chunks()
        st_np = slim.column("status").to_numpy(zero_copy_only=False)
        occ_slim_pos = pc.index_in(adm_urls, value_set=slim_urls)
        if occ_slim_pos.null_count:  # fetch stage lost a url: fail loud
            raise RuntimeError("admitted url missing from fetch output")
        st_occ = st_np[occ_slim_pos.to_numpy(zero_copy_only=False)]
        is_first = np.zeros(admitted.num_rows, dtype=bool)
        is_first[first_idx.to_numpy(zero_copy_only=False)] = True
        keep = is_first | (st_occ != 200)
        ticks_all = self.tick + np.cumsum(keep)
        n_att = int(keep.sum())
        self.tick += n_att
        keep_arr = pa.array(keep)
        att_urls = adm_urls.filter(keep_arr)
        att_ticks = ticks_all[keep]
        att_status = st_occ[keep].astype(np.int32)
        succ_mask = att_status == 200
        n_s = int(succ_mask.sum())
        s_urls_arr = att_urls.filter(pa.array(succ_mask))
        t_np = att_ticks[succ_mask]
        fs_np = np.arange(self.fetch_seq, self.fetch_seq + n_s, dtype=np.int64)
        self.fetch_seq += n_s
        tmr["tick_walk"] = time.perf_counter() - _t0
        _t0 = time.perf_counter()
        if cfg.keep_logs:
            round_attempts_py = att_urls.to_pylist()
            self.attempts_log.extend(
                {"tick": int(t), "virtual_time_s": int(t) * cfg.tick_seconds,
                 "url": u, "status": int(st)}
                for t, u, st in zip(att_ticks, round_attempts_py, att_status)
            )
            self.fetch_log.extend(
                {"fetch_seq": int(fs), "url": u, "doc_id": ids.doc_id(u),
                 "tick": int(t), "virtual_time_s": int(t) * cfg.tick_seconds}
                for fs, u, t in zip(fs_np, s_urls_arr.to_pylist(), t_np)
            )
        table_store.write_round(
            pa.table(
                {
                    "tick": pa.array(att_ticks),
                    "virtual_time_s": pa.array(att_ticks * cfg.tick_seconds),
                    "url": att_urls,
                    "status": pa.array(att_status),
                }
            ),
            cfg.out_dir, "attempts", self.round_id,
        )
        tmr["attempts_write"] = time.perf_counter() - _t0
        _t0 = time.perf_counter()
        # ---- advisory link filter + stamps (driver, VECTORIZED) ---------
        # slim rows for successes, in TICK order (successes filtered from
        # the admit-order walk above are already tick-ascending), so ONE
        # index_in + take replaces the old python membership mask + sort
        # — these driver loops were 2.7 s + 2.4 s of a 110k-tick
        # mega-round (SCALING.md)
        succ = slim.take(pc.index_in(s_urls_arr, value_set=slim_urls))
        cands = succ.column("fetch_candidates").combine_chunks()
        flat = pc.list_flatten(cands)
        parent = pc.list_parent_indices(cands).to_numpy(zero_copy_only=False)
        if len(parent):
            # batched seen-shard RPC for ALL candidates of the round (the
            # replacement for the reference's per-link HEAD check):
            # dedup -> per-shard fan-out -> index_in map-back, the shared
            # _seen_mask_np pattern (this block was its third near-copy)
            flat_seen = self._seen_mask_np(flat)
            # drop a candidate fetched EARLIER this round (tick <= the
            # linking page's tick); later-tick fetches stay queued —
            # exactly the old per-candidate dict condition
            sidx = pc.fill_null(
                pc.index_in(flat, value_set=s_urls_arr), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            in_round = sidx >= 0
            cand_tick = np.where(in_round, t_np[np.maximum(sidx, 0)],
                                 np.int64(2**62))
            keep = ~(flat_seen | (in_round & (cand_tick <= t_np[parent])))
        else:
            keep = np.zeros(0, dtype=bool)
        kept_vals = flat.filter(pa.array(keep))
        kept_parent = parent[keep]
        offsets = np.zeros(n_s + 1, dtype=np.int32)
        if len(kept_parent):
            np.cumsum(np.bincount(kept_parent, minlength=n_s),
                      out=offsets[1:])
        links_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_vals
        )
        # stamps sidecar (joined back into pages_dataset() on read)
        vt_us = pa.array(
            EPOCH_US + t_np * (cfg.tick_seconds * 1_000_000)
        ).cast(pa.timestamp("us"))
        stamps = pa.table(
            {
                "url": s_urls_arr,
                "tick": pa.array(t_np),
                "fetch_seq": pa.array(fs_np),
                "virtual_time_s": pa.array(t_np * cfg.tick_seconds),
                "links_to_queue": links_list,
                "fetched_on": vt_us,
                "parsed_on": vt_us,
            }
        )
        stamps_tmp = table_store.begin_round(cfg.out_dir, "stamps", self.round_id)
        table_store.write_part(stamps_tmp, stamps, key=f"r{self.round_id}")
        table_store.commit_round(cfg.out_dir, "stamps", self.round_id)
        tmr["stamps"] = time.perf_counter() - _t0
        _t0 = time.perf_counter()
        # rows the committed images round ACTUALLY holds (part-metadata
        # counts — no row data read): fetch misses and undecodable
        # payloads are excluded, so the metric agrees with the store it
        # describes instead of counting candidate img_urls
        n_images = table_store.round_num_rows(
            cfg.out_dir, "images", self.round_id
        ) if cfg.write_images else 0
        tmr["images"] = time.perf_counter() - _t0
        _t0 = time.perf_counter()
        # ---- frontier growth: seqs in (tick, doc-order) = publish order -
        # (kept-candidate flatten order == tick-major, per-page doc order;
        # the url column ships as the Arrow array it already is)
        n_new = len(kept_vals)
        new_depths = (
            succ.column("depth").to_numpy(zero_copy_only=False)
            .astype(np.int32)[kept_parent] + 1
        )
        new_seqs = np.arange(self.next_seq, self.next_seq + n_new,
                             dtype=np.int64)
        self.next_seq += n_new
        self._push_frontier(
            kept_vals, new_depths, np.zeros(n_new, np.float32), new_seqs
        )
        tmr["links_push"] = time.perf_counter() - _t0
        _t0 = time.perf_counter()
        # ---- commit seen state ------------------------------------------
        if n_s:
            s_urls = s_urls_arr.to_pylist()
            shards = ids.shard_of(s_urls, cfg.num_seen_shards)
            futs = []
            for s in range(cfg.num_seen_shards):
                idx = np.where(shards == s)[0]
                if len(idx):
                    futs.append(self.seen[s].add_many.remote(
                        [s_urls[i] for i in idx]))
            ray.get(futs)
        tmr["seen_commit"] = time.perf_counter() - _t0
        succ_hosts = (
            admitted.column("host").combine_chunks()
            .filter(keep_arr).filter(pa.array(succ_mask))
        )
        vc = pc.value_counts(succ_hosts)
        per_host = dict(
            zip(vc.field("values").to_pylist(),
                (int(c) for c in vc.field("counts").to_pylist()))
        )
        return {
            "round": self.round_id,
            "admitted": admitted.num_rows,
            "attempts": n_att,
            "successes": n_s,
            "images": int(n_images),
            "new_links": int(n_new),
            "per_host_fetches": per_host,
            "timings": {k: round(v, 3) for k, v in tmr.items()},
        }

    # ------------------------------------------------------------------
    def _checkpoint(self) -> None:
        """Incremental checkpoint: frontier shards snapshot driver-side
        (O(queued) — the live working set), but the seen set goes through
        the delta-chain protocol — each SeenShard actor writes ONLY the
        urls it gained since the last acked checkpoint (SeenShard.
        ckpt_write), prior chain files are hardlinked forward so every
        round dir is self-contained, and the manifest's commit is what
        lets the shards drop their pending buffers (ckpt_ack). Per-round
        cost is O(progress), not O(|seen|), and the seen bytes never
        transit the driver."""
        fr = ray.get([f.snapshot.remote() for f in self.frontier])
        tmp = self.ckpt.begin(self.round_id)
        self.ckpt.write_frontier(tmp, fr)
        prev_chain = self._seen_chain or {}
        # LSM-style compaction: past _CKPT_CHAIN_MAX files a shard's chain
        # is rewritten as one full snapshot (amortized O(|shard|/64 per
        # round)), bounding both restore reads and per-round link fan-out
        recs = ray.get([
            s.ckpt_write.remote(
                tmp, self.round_id,
                len(prev_chain.get(str(i), [])) >= _CKPT_CHAIN_MAX,
                len(prev_chain.get(str(i), [])),  # unique-name seq
            )
            for i, s in enumerate(self.seen)
        ])
        # actor-written files must be visible driver-side BEFORE the
        # manifest commits — the incremental protocol requires the
        # checkpoint root on storage shared by driver and seen shards
        # (single node / NFS / object-store mount); a mis-deployed
        # non-shared root fails loudly here instead of committing a
        # manifest that names unreachable files
        for i, rec in enumerate(recs):
            if rec["file"] and not os.path.exists(
                    os.path.join(tmp, rec["file"])):
                raise RuntimeError(
                    f"seen shard {i} wrote checkpoint file {rec['file']!r} "
                    f"that is not visible at {tmp!r} — the checkpoint dir "
                    "must be on storage shared between the driver and the "
                    "seen-shard actors"
                )
        chain: dict[str, list[str]] = {}
        inherit: dict[str, list[str]] = {}
        for i, rec in enumerate(recs):
            base = [] if rec["full"] else list(prev_chain.get(str(i), []))
            if base:
                inherit[str(i)] = base
            if rec["file"]:
                base = base + [rec["file"]]
            chain[str(i)] = base
        if inherit:
            self.ckpt.inherit_chain(self._last_ckpt_round, tmp, inherit)
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
        manifest["seen_chain"] = chain
        self.ckpt.commit(self.round_id, manifest)
        ray.get([s.ckpt_ack.remote() for s in self.seen])
        self._seen_chain = chain
        self._last_ckpt_round = self.round_id
        pruned = self.ckpt.prune_old(self.cfg.ckpt_keep)
        if pruned:
            # bounded history: a lifetime total plus the most recent ids —
            # an unbounded id list would grow O(rounds) on the driver,
            # exactly the class of growth the retention policy bounds
            self.metrics["ckpt_pruned_total"] = (
                self.metrics.get("ckpt_pruned_total", 0) + len(pruned)
            )
            hist = self.metrics.setdefault("ckpt_pruned", [])
            hist.extend(pruned)
            del hist[:-1024]

    def _restore(self) -> bool:
        latest = self.ckpt.latest_round()
        if latest is None:
            return False
        fr, sn, manifest = self.ckpt.load(latest)
        if manifest.get("config_fingerprint") != self.cfg.fingerprint():
            # pre-round-4 polite-mode CLI left the politeness block at its
            # defaults when fingerprinting (the gate itself ran polite), so
            # those checkpoints mismatch any non-default --rate/--burst.
            # Accept that one legacy identity — everything else in the
            # config dict still had to match — with a loud note.
            legacy = replace(self.cfg, politeness=PolitenessConfig())
            if (self.cfg.politeness.mode == "polite"
                    and manifest.get("config_fingerprint")
                    == legacy.fingerprint()):
                logging.getLogger("owlcrawler_ray.crawl").warning(
                    "resuming a legacy polite-mode checkpoint (its "
                    "fingerprint predates politeness rate/burst fields)"
                )
            else:
                raise ValueError(
                    "checkpoint was produced by a different crawl config; "
                    "refusing to resume (delete the checkpoint dir to start "
                    "fresh)"
                )
        ray.get(
            [f.restore.remote(t) for f, t in zip(self.frontier, fr)]
            + [s.restore.remote(t) for s, t in zip(self.seen, sn)]
        )
        chain = manifest.get("seen_chain")
        if chain is None:
            # legacy full-snapshot round: its seen_shard files become the
            # chain base, so the NEXT checkpoint inherits them by hardlink
            # and writes only deltas from here on
            d = self.ckpt._dir(latest)
            chain = {}
            for i in range(len(self.seen)):
                name = f"seen_shard_{i:04d}.parquet"
                chain[str(i)] = (
                    [name] if os.path.exists(os.path.join(d, name)) else []
                )
        self._seen_chain = chain
        self._last_ckpt_round = latest
        c = manifest["counters"]
        self.next_seq = c["next_seq"]
        self.tick = c["tick"]
        self.fetch_seq = c["fetch_seq"]
        self.round_id = c["round_id"] + 1
        self.gate.restore(
            {h: tuple(v) for h, v in manifest.get("politeness", {}).items()}
        )
        # discard output rounds NEWER than the restored checkpoint: a kill
        # inside the checkpoint_every window leaves committed round dirs the
        # resumed run will re-produce — possibly with DIFFERENT round
        # boundaries (budget_per_round may change across a resume), so the
        # stale dirs must go or commit_round would keep them and drop the
        # recomputed data (resume re-production promise, checkpoint.py).
        # windex = the river's derived per-round index deltas (river.py);
        # stale deltas must go with the stale pages rounds they indexed
        for name in ("pages", "images", "stamps", "attempts", "windex"):
            pruned = table_store.prune_rounds_after(
                self.cfg.out_dir, name, c["round_id"]
            )
            if pruned:
                self.metrics.setdefault("pruned_on_resume", {})[name] = pruned
        return True

    # ------------------------------------------------------------------
    def run(self) -> dict:
        cfg = self.cfg
        while self.round_id < cfg.max_rounds:
            if cfg.max_ticks is not None and self.tick >= cfg.max_ticks:
                break
            _ta = time.perf_counter()
            admitted = (
                self._admit_parity() if cfg.mode == "parity" else self._admit_polite()
            )
            admit_sec = time.perf_counter() - _ta
            if not admitted.num_rows:
                if cfg.mode == "polite" and sum(
                    ray.get([f.size.remote() for f in self.frontier])
                ):
                    # buckets empty but frontier not: advance virtual time
                    self.tick += 1
                    continue
                break
            m = self._process_round(admitted)
            m["timings"]["admit"] = round(admit_sec, 3)
            # append BEFORE checkpointing: the manifest snapshots
            # metrics["rounds"][-1], which must be THIS round's entry,
            # not the previous round's (the checkpoint timing itself is
            # stamped after — a checkpoint can't time itself)
            self.metrics["rounds"].append(m)
            _tc = time.perf_counter()
            if self.round_id % cfg.checkpoint_every == 0:
                self._checkpoint()
            m["timings"]["checkpoint"] = round(time.perf_counter() - _tc, 3)
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

    # output views ------------------------------------------------------
    def _stamped_dataset(self, name: str, key: str,
                         stamp_cols: list[str] | None) -> "rd.Dataset":
        """Streaming view of a crawl output table with its stamps sidecar
        joined back in TASK-SIDE: each round's stamps table is bounded by
        budget_per_round (O(successes) url-keyed rows — never the whole
        crawl) and is read inside the map tasks (per-worker cached; only
        its part PATHS ship from the driver), looked up via pc.index_in.
        No shuffle, no driver row traffic at all; the union across rounds
        stays lazy, so at 10^10 URLs this view streams block-by-block
        while the old driver-Table form would have pulled every
        html/image byte through the driver heap. Rounds union as a
        BALANCED tree — a crawl is O(total/budget) rounds and a left-deep
        chain would build an O(rounds)-deep plan."""
        parts = []
        for r in table_store.list_rounds(self.cfg.out_dir, name):
            if not table_store.round_complete(self.cfg.out_dir, "stamps", r):
                # pages/images commit ~100 driver lines before the stamps
                # sidecar: a concurrent reader (webapp thread) landing in
                # that window sees a data round whose stamps aren't
                # committed yet — skip it (consistent snapshot) rather
                # than crash the join on a missing sidecar
                continue
            ds = table_store.round_dataset(self.cfg.out_dir, name, r)
            if ds is None:
                continue  # round committed with zero successes
            wname, spaths = table_store.round_part_paths(
                self.cfg.out_dir, "stamps", r
            )
            parts.append(
                ds.map_batches(
                    partial(_join_stamps, wname, tuple(spaths), key,
                            stamp_cols),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
            )
        if not parts:
            return rd.from_arrow(pa.table({}))
        while len(parts) > 1:  # balanced union tree
            parts = [
                parts[i].union(parts[i + 1]) if i + 1 < len(parts)
                else parts[i]
                for i in range(0, len(parts), 2)
            ]
        return parts[0]

    def pages_dataset(self) -> "rd.Dataset":
        """Pages as a lazy streaming Dataset with the stamps sidecar merged
        back in (url-keyed): the reference's full CouchDoc shape incl.
        links_to_queue/parsed_on. This is the scale surface — consume with
        map_batches/write_parquet; use pages_table() only on bounded
        corpora (tests/parity)."""
        return self._stamped_dataset("pages", "url", None)

    def images_dataset(self) -> "rd.Dataset":
        """Decoded image rows as a lazy streaming Dataset with the
        politeness tick joined back from the stamps sidecar (images are
        written in the same pass as pages, before ticks exist; within a
        round tick order == admission seq order, so (tick, img_idx)
        ordering parity is exact)."""
        return self._stamped_dataset("images", "page_url", ["tick"])

    def pages_table(self) -> pa.Table:
        """Driver-side materialization of pages_dataset() — parity/test
        use over bounded corpora only."""
        return _collect_arrow(self.pages_dataset())

    def images_table(self) -> pa.Table:
        """Driver-side materialization of images_dataset() — parity/test
        use over bounded corpora only."""
        return _collect_arrow(self.images_dataset())

    def attempts_table(self) -> pa.Table:
        return table_store.read_all_arrow(self.cfg.out_dir, "attempts")

    def sites_table(self) -> pa.Table:
        """The stored `site-` seed docs (the reference's sites view input)."""
        return table_store.read_all_arrow(self.cfg.out_dir, "sites")

    def shutdown(self) -> None:
        for a in self.frontier + self.seen:
            ray.kill(a)


def warmup_workers(n: int) -> None:
    """Pre-start Ray worker processes and pay the package-import cost once,
    before any timed work: Ray starts python workers lazily, and a first
    wide pass otherwise eats ~0.5-1 s per NEW worker (import ray.data +
    this package) in the middle of the crawl."""
    def touch(batch):
        from ..functions import codec as _c  # noqa: F401  (import cost)
        from ..sources import corpus as _s  # noqa: F401
        return batch

    rd.range(n * 4, override_num_blocks=n * 2).map_batches(
        touch, batch_size=1
    ).count()


def run_crawl(cfg: CrawlConfig, resume: bool = False) -> tuple[Crawler, dict]:
    c = Crawler(cfg, resume=resume)
    summary = c.run()
    return c, summary
