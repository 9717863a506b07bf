"""Fetch stage: url batch -> (+status, +html) via an actor pool.

Replaces the reference's fetcher worker loop (fetcher.go:35-84: HTTP GET
with a fixed UA, whole body in memory, one URL at a time off NATS). Here
the fetcher is a callable CLASS for ``map_batches`` — session/connection
state (in the sandbox, just the corpus config) is built ONCE per actor in
``__init__``; ``__call__`` handles one Arrow batch of URLs zero-copy.

Fetch errors do NOT raise: the reference logs and drops (fetcher.go:51-54);
we record ``status`` per row (0 = transport error, else HTTP status) so
downstream stages can route (SURVEY.md §2.3 F6) and failed URLs stay
un-seen (retryable on later queued occurrences).
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.corpus import SyntheticWeb, WebConfig

USER_AGENT = "OwlCrawlerRay - https://github.com/fmpwizard/owlcrawler (rebuild)"


class CorpusFetcher:
    """Deterministic sandbox fetcher (the Fetcher protocol's corpus impl).

    A real network fetcher implements the same __call__ contract with an
    aiohttp session created in __init__ (one per actor, reused across
    batches — never per batch/row)."""

    def __init__(self, web_cfg: WebConfig):
        self.web = SyntheticWeb(web_cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        statuses, bodies = [], []
        for u in urls:
            status, body = self.web.fetch(u)
            statuses.append(status)
            bodies.append(body)
        return batch.append_column(
            "status", pa.array(statuses, type=pa.int32())
        ).append_column("html", pa.array(bodies, type=pa.large_binary()))
