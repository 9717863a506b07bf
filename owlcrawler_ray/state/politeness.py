"""Politeness + robots: per-host token buckets on a virtual clock.

The reference's rate limit is a GLOBAL blocking ``<-time.Tick(5s)`` before
every fetch, per fetcher process — explicitly not per-host and acknowledged
as non-scaling ("TODO implement a distributed tick, so you can have 100
fetchers", fetcher.go:97-99). Two modes here:

* PARITY mode — reproduce the reference budget exactly: a global budget of
  ``num_virtual_fetchers`` fetch *attempts* per 5-virtual-second tick; the
  crawl loop charges one tick per attempt and stamps
  ``virtual_time_s = 5 * tick_index`` (nothing sleeps — the clock is
  bookkeeping, so throughput is compute-bound while ordering matches the
  reference's serial timeline).

* POLITE (scale) mode — the north-rule upgrade: one token bucket per host
  (capacity ``burst``, refill ``rate_per_s`` on the virtual clock), plus a
  robots.txt rules cache per host. Admission asks the bucket for up to its
  current tokens per round; the rest of that host's queue stays in the
  frontier, so a hot host cannot monopolize a round (skew control at
  admission, complementing hot-host block splitting at fetch).

Robots sources (the reference has no robots handling at all — SURVEY.md
§2.4 St6; this is a north-rule graft): static config (``disallow`` maps
host pattern -> path prefixes) and/or a fetched+parsed+cached per-host
/robots.txt via ``robots_fetcher`` — the corpus web serves deterministic
robots documents (``WebConfig.robots_frac``), a real crawler serves HTTP.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit


@dataclass
class PolitenessConfig:
    mode: str = "parity"  # "parity" | "polite"
    num_virtual_fetchers: int = 1
    tick_seconds: int = 5
    rate_per_s: float = 1.0  # polite mode: tokens/virtual-second/host
    burst: float = 4.0
    disallow: dict[str, list[str]] = field(default_factory=dict)


class HostBucket:
    def __init__(self, rate: float, burst: float, now_s: float):
        self.rate = rate
        self.burst = burst
        self.tokens = burst
        self.last = now_s

    def refill(self, now_s: float) -> None:
        self.tokens = min(self.burst, self.tokens + (now_s - self.last) * self.rate)
        self.last = now_s

    def take(self, n: int, now_s: float) -> int:
        self.refill(now_s)
        got = min(n, int(self.tokens))
        self.tokens -= got
        return got


def parse_robots(text: str) -> list[str]:
    """Minimal robots.txt parser: Disallow prefixes whose group includes
    User-agent: * (the subset a polite crawler must honor; Allow/
    crawl-delay omitted). Per the robots spec, CONSECUTIVE User-agent
    lines form one group sharing the rules that follow — `User-agent: *`
    then `User-agent: otherbot` then `Disallow: /x` disallows /x for
    both, so `active` must accumulate over the group, not be overwritten
    by each agent line (caught by the round-4 review)."""
    rules: list[str] = []
    active = False
    in_agent_block = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agent_block:  # first agent line of a NEW group
                active = False
            in_agent_block = True
            active = active or val == "*"
        else:
            in_agent_block = False
            if key == "disallow" and active and val:
                rules.append(val)
    return rules


class PolitenessGate:
    """Held inside the crawl driver (parity mode) or one actor per frontier
    shard (polite mode — buckets are per-host and hosts are host-sharded,
    so no cross-actor coordination is ever needed).

    Robots rules come from (a) static config (``disallow``) and/or (b) a
    ``robots_fetcher(host) -> text`` callback — the REAL path: the crawl
    wires it to a /robots.txt fetch against the (corpus) web, parsed once
    per host and cached here (St6)."""

    def __init__(self, cfg: PolitenessConfig, robots_fetcher=None):
        self.cfg = cfg
        self.buckets: dict[str, HostBucket] = {}
        self.robots: dict[str, list[str]] = {}
        self.robots_fetcher = robots_fetcher

    # -- robots ----------------------------------------------------------
    def rules_for(self, host: str) -> list[str]:
        if host not in self.robots:
            rules: list[str] = []
            for pat, prefixes in self.cfg.disallow.items():
                if pat == host or pat == "*":
                    rules.extend(prefixes)
            if self.robots_fetcher is not None:
                try:
                    rules.extend(parse_robots(self.robots_fetcher(host)))
                except Exception:
                    pass  # unreachable robots.txt -> allow (common practice)
            self.robots[host] = rules
        return self.robots[host]

    def allowed(self, url: str) -> bool:
        try:
            parts = urlsplit(url)
        except ValueError:
            # malformed URL from hostile page content (e.g. an unclosed
            # IPv6 bracket that survived link resolution) — skip it
            # rather than crash the admission loop
            return False
        path = parts.path or "/"
        return not any(path.startswith(p) for p in self.rules_for(parts.netloc))

    def allowed_many(self, urls: list[str]) -> list[bool]:
        return [self.allowed(u) for u in urls]

    # -- polite-mode budgets ---------------------------------------------
    def admit_budget(self, host: str, want: int, now_s: float) -> int:
        b = self.buckets.get(host)
        if b is None:
            b = self.buckets[host] = HostBucket(
                self.cfg.rate_per_s, self.cfg.burst, now_s
            )
        return b.take(want, now_s)

    def state(self) -> dict:
        return {
            h: (b.tokens, b.last) for h, b in self.buckets.items()
        }

    def restore(self, st: dict) -> None:
        for h, (tokens, last) in st.items():
            b = HostBucket(self.cfg.rate_per_s, self.cfg.burst, last)
            b.tokens = tokens
            self.buckets[h] = b
