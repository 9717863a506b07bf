"""Per-round crawl checkpoint: frontier + seen shards + counters + lineage.

The reference's "checkpoint" is implicit and lossy: CouchDB survives
restarts so fetched pages aren't refetched, but in-flight NATS messages
are dropped (at-most-once, SURVEY.md §2.10) — a crash loses queued URLs.
Here every round commits a full, consistent snapshot:

    ckpt/round=000042/
        frontier_shard_0000.parquet ...   (every queued occurrence, seq order)
        seen_shard_0000.parquet ...       (url + url_hash per shard)
        manifest.json                     <- written LAST = the commit point

manifest.json carries counters (next_seq, tick, fetch_seq), per-round
metrics (attempts, successes, new links, per-host fetch counts), config
fingerprint, and lineage (which pages/images round dirs this state
produced). Resume = restore from the highest round whose manifest parses;
pages/images rounds after that point are discarded (their ``_SUCCESS`` is
removed) so the resumed run re-produces them byte-identically.

Deployment requirement: the checkpoint root must live on storage shared
by the driver AND every SeenShard actor (single node, NFS/cluster FS, or
an object-store mount) — the incremental protocol has actors write their
seen deltas directly into the round dir so the seen bytes never transit
the driver. The crawl loop verifies each actor-written file is visible
driver-side BEFORE committing the manifest, so a mis-deployed
non-shared root fails loudly at the first checkpoint instead of
producing a manifest that names unreachable files.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, round_id: int) -> str:
        return os.path.join(self.root, f"round={round_id:06d}")

    def save(self, round_id: int, frontier_shards: list[pa.Table],
             seen_shards: list[pa.Table], manifest: dict) -> str:
        """Full-snapshot save (legacy/simple path): every shard's complete
        state as driver-written parquet. The crawl loop uses the
        incremental begin/inherit_chain/commit protocol instead — this
        stays for tests and for callers without actor-side writers."""
        tmp = self.begin(round_id)
        self.write_frontier(tmp, frontier_shards)
        for i, t in enumerate(seen_shards):
            pq.write_table(t, os.path.join(tmp, f"seen_shard_{i:04d}.parquet"))
        return self.commit(round_id, manifest)

    @staticmethod
    def write_frontier(tmp: str, frontier_shards: list[pa.Table]) -> None:
        """Stage the frontier shards into a begin()-opened tmp dir with the
        canonical names load() scans for — the ONE place the frontier file
        naming lives (save() and the crawl loop's incremental _checkpoint
        both route through here)."""
        for i, t in enumerate(frontier_shards):
            pq.write_table(
                t, os.path.join(tmp, f"frontier_shard_{i:04d}.parquet")
            )

    # -- incremental protocol (delta-chain seen checkpoints) -------------
    def begin(self, round_id: int) -> str:
        """Open the round's tmp dir (clearing any stale attempt). Stage
        files into it — driver-written frontier shards, actor-written seen
        deltas (SeenShard.ckpt_write) — then commit(). A previously
        COMMITTED dir for the same round is left in place until commit():
        it may be the inherit_chain link source (a re-entered crawl —
        add_sites after the frontier drained — re-checkpoints the same
        round id), and keeping it shrinks the crash window to commit()'s
        swap, the same window the old full-snapshot save had."""
        d = self._dir(round_id)
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        return tmp

    def inherit_chain(self, prev_round: int, tmp: str,
                      chain: dict[str, list[str]]) -> None:
        """Hardlink the previous committed round's seen-chain files into
        the new round's tmp dir, making every round SELF-CONTAINED at
        O(1) extra disk per inherited file (the inode is shared; retention
        pruning an old round only drops a link). Falls back to a copy when
        the filesystem refuses links."""
        src_dir = self._dir(prev_round)
        for names in chain.values():
            for name in names:
                src = os.path.join(src_dir, name)
                dst = os.path.join(tmp, name)
                if os.path.exists(dst):
                    continue  # two shards can share nothing; names unique
                if not os.path.exists(src):
                    # a chain file named by the manifest MUST exist in the
                    # previous committed round — its absence means the
                    # chain invariant is broken (external deletion, a
                    # partially swept dir, or a checkpoint root that is
                    # not shared with the SeenShard actors); a copy
                    # fallback can never repair that, so fail loudly here
                    raise RuntimeError(
                        f"seen-chain file {name!r} missing from committed "
                        f"round dir {src_dir!r}; checkpoint chain "
                        "invariant broken (was the checkpoint root "
                        "modified externally, or is it not on storage "
                        "shared with the seen-shard actors?)"
                    )
                try:
                    os.link(src, dst)
                except OSError:
                    # link refused by the filesystem (EXDEV/EPERM/ENOTSUP)
                    # — src is known present, so a copy is a valid
                    # (costlier) substitute
                    shutil.copy2(src, dst)

    def commit(self, round_id: int, manifest: dict) -> str:
        """Atomically promote the staged tmp dir; the manifest write is
        the commit point (latest_round only counts parsable manifests).
        An old committed dir for the same round is replaced here — a crash
        inside the swap loses only this round's checkpoint, and _restore
        falls back to the previous retained round."""
        d = self._dir(round_id)
        tmp = d + ".tmp"
        shutil.rmtree(d, ignore_errors=True)
        os.rename(tmp, d)
        mpath = os.path.join(d, "manifest.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump({"round": round_id, **manifest}, f, indent=1, sort_keys=True)
        os.rename(mpath + ".tmp", mpath)
        return d

    def latest_round(self) -> int | None:
        if not os.path.isdir(self.root):
            return None
        best = None
        for name in os.listdir(self.root):
            if not name.startswith("round=") or name.endswith(".tmp"):
                continue
            mpath = os.path.join(self.root, name, "manifest.json")
            try:
                with open(mpath) as f:
                    m = json.load(f)
                r = int(m["round"])
                best = r if best is None else max(best, r)
            except (OSError, ValueError, KeyError):
                continue  # partial/corrupt round: not committed
        return best

    def prune_old(self, keep: int) -> list[int]:
        """Delete committed checkpoint rounds older than the newest ``keep``
        (plus any stray ``.tmp`` dirs below them). Each round holds a FULL
        frontier + seen snapshot, so without retention a long crawl's
        checkpoint dir grows O(rounds x |seen|) — at 10^10 URLs that is the
        disk bound, not the output tables. ``keep`` >= 2 preserves the
        multi-round fallback _restore relies on when the newest manifest is
        lost mid-write. Uncommitted dirs (no parsable manifest) are never
        counted toward ``keep`` but are swept when older than the cutoff.
        Returns the pruned round ids."""
        if keep <= 0 or not os.path.isdir(self.root):
            return []
        committed = []
        for name in os.listdir(self.root):
            if not name.startswith("round=") or name.endswith(".tmp"):
                continue
            try:
                with open(os.path.join(self.root, name, "manifest.json")) as f:
                    committed.append(int(json.load(f)["round"]))
            except (OSError, ValueError, KeyError):
                continue
        committed.sort()
        if len(committed) <= keep:
            return []
        cutoff = committed[-keep]  # newest `keep` survive
        committed_set = set(committed)
        pruned = []
        for name in os.listdir(self.root):
            if not name.startswith("round="):
                continue
            try:
                rid = int(name.split("=")[1].split(".")[0])
            except ValueError:
                continue
            if rid < cutoff:
                shutil.rmtree(os.path.join(self.root, name),
                              ignore_errors=True)
                # uncommitted leftovers (a crash between the dir swap and
                # the manifest write) are swept but NOT reported: the
                # returned ids feed the metrics' pruned-round history, and
                # a never-committed round was never part of it
                if not name.endswith(".tmp") and rid in committed_set:
                    pruned.append(rid)
        return sorted(pruned)

    def load(self, round_id: int) -> tuple[list[pa.Table], list[pa.Table], dict]:
        d = self._dir(round_id)
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        frontier, seen = [], []
        i = 0
        while os.path.exists(os.path.join(d, f"frontier_shard_{i:04d}.parquet")):
            frontier.append(
                pq.read_table(os.path.join(d, f"frontier_shard_{i:04d}.parquet"))
            )
            i += 1
        chain = manifest.get("seen_chain")
        if chain is not None:
            # incremental layout: each shard's seen set is the UNION of
            # its chain files (deltas after the last full snapshot); an
            # empty chain is a shard that never saw a url
            for key in sorted(chain, key=int):
                parts = [
                    pq.read_table(os.path.join(d, name))
                    for name in chain[key]
                ]
                if parts:
                    seen.append(pa.concat_tables(parts))
                else:
                    seen.append(pa.table(
                        {"url": pa.array([], pa.string()),
                         "url_hash": pa.array([], pa.uint64())}
                    ))
            return frontier, seen, manifest
        i = 0
        while os.path.exists(os.path.join(d, f"seen_shard_{i:04d}.parquet")):
            seen.append(
                pq.read_table(os.path.join(d, f"seen_shard_{i:04d}.parquet"))
            )
            i += 1
        return frontier, seen, manifest
