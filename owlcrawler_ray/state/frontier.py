"""Sharded URL frontier: per-host priority heaps held in actors.

Replaces the reference's NATS ``fetch_url`` queue (fetcher.go:90,
extractor.go:57-59; broker-held FIFO, queue-group round-robin). Entries are
(priority, discovered_seq, url, host, depth); ``discovered_seq`` is the
global FIFO position that reproduces NATS publish order (SURVEY.md §1.2),
assigned at link emission. Shard = hash(host) % num_shards so one host's
queue lives on one shard (politeness needs per-host ordering); parity mode
uses priority=0 everywhere, making (seq) the total order.

Duplicate enqueues are NORMAL (the reference's frontier holds duplicates;
dedup is authoritative only at dequeue — SURVEY.md §2.3 F1). The frontier
therefore stores every occurrence; admission discards/defers per the
dedup-at-dequeue semantics (pipelines/crawl.py).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

ENTRY_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float32()),
        ("discovered_seq", pa.int64()),
    ]
)


class FrontierShard:
    """One frontier shard (run as a Ray actor by the crawl pipeline)."""

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        # lazy-deletion heap of (priority, seq, url, host, depth)
        self.heap: list[tuple[float, int, str, str, int]] = []
        self.removed: set[int] = set()  # seqs popped by admission
        self.present: set[int] = set()  # seqs currently live in the heap
        self.live = 0

    def push_table(self, table: pa.Table) -> int:
        urls = table.column("url").to_pylist()
        hosts = table.column("host").to_pylist()
        depths = table.column("depth").to_pylist()
        prios = table.column("priority").to_pylist()
        seqs = table.column("discovered_seq").to_pylist()
        for u, h, d, p, s in zip(urls, hosts, depths, prios, seqs):
            heapq.heappush(self.heap, (float(p), int(s), u, h, int(d)))
            self.present.add(int(s))
        self.live += len(urls)
        return self.live

    def _compact(self) -> None:
        while self.heap and self.heap[0][1] in self.removed:
            _, s, *_ = heapq.heappop(self.heap)
            self.removed.discard(s)

    def peek(self, k: int) -> pa.Table:
        """First k live entries by (priority, seq) without removing them."""
        self._compact()
        out: list[tuple[float, int, str, str, int]] = []
        if k > 0 and self.heap:
            if k >= self.live:
                items = [e for e in self.heap if e[1] not in self.removed]
                out = sorted(items)[:k]
            else:
                out = [e for e in heapq.nsmallest(k + len(self.removed), self.heap)
                       if e[1] not in self.removed][:k]
        return pa.table(
            {
                "url": [e[2] for e in out],
                "host": [e[3] for e in out],
                "depth": pa.array([e[4] for e in out], type=pa.int32()),
                "priority": pa.array([e[0] for e in out], type=pa.float32()),
                "discovered_seq": pa.array([e[1] for e in out], type=pa.int64()),
            },
            schema=ENTRY_SCHEMA,
        )

    def remove_seqs(self, seqs: list[int]) -> int:
        # count only seqs actually LIVE in this shard: `not in removed`
        # alone is not idempotent (compaction discards seqs from
        # `removed`, re-arming a replayed remove), and a foreign seq
        # would decrement `live` below the real entry count — either way
        # the crawl loop would see an empty frontier while entries
        # remain (caught by the round-4 review)
        n = 0
        for s in seqs:
            s = int(s)
            if s in self.present:
                self.present.discard(s)
                self.removed.add(s)
                n += 1
        self.live -= n
        self._compact()
        return self.live

    def size(self) -> int:
        return self.live

    def snapshot(self) -> pa.Table:
        items = sorted(e for e in self.heap if e[1] not in self.removed)
        return pa.table(
            {
                "url": [e[2] for e in items],
                "host": [e[3] for e in items],
                "depth": pa.array([e[4] for e in items], type=pa.int32()),
                "priority": pa.array([e[0] for e in items], type=pa.float32()),
                "discovered_seq": pa.array([e[1] for e in items], type=pa.int64()),
            },
            schema=ENTRY_SCHEMA,
        )

    def restore(self, table: pa.Table) -> int:
        self.heap = []
        self.removed = set()
        self.present = set()
        self.live = 0
        return self.push_table(table)


def entries_table(urls, hosts, depths, priorities, seqs) -> pa.Table:
    return pa.table(
        {
            "url": urls if isinstance(urls, pa.Array)
            else pa.array(urls, type=pa.string()),
            "host": hosts if isinstance(hosts, pa.Array)
            else pa.array(hosts, type=pa.string()),
            "depth": pa.array(np.asarray(depths, dtype=np.int32)),
            "priority": pa.array(np.asarray(priorities, dtype=np.float32)),
            "discovered_seq": pa.array(np.asarray(seqs, dtype=np.int64)),
        },
        schema=ENTRY_SCHEMA,
    )
