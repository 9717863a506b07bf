"""Distributed-mergeable sketches: HyperLogLog distinct counting.

Deterministic (md5-based key hashing for arbitrary values — no Python
hash(); NUMERIC key columns should feed ids.int_hash64_many instead,
the vectorized splitmix64 path the HLL queries use), numpy-vectorized
per batch, and MERGEABLE: register-wise max combines partial
sketches from independent batches/nodes into the whole-stream sketch,
which is what makes HLL the 100-TB distinct-count operator (per-batch
partials -> tiny register exchange -> one merge; the alternative exact
`unique` is an all-to-all shuffle of every key).
"""

from __future__ import annotations

import hashlib

import numpy as np

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hash64(values: list) -> np.ndarray:
    """Deterministic 64-bit hashes of arbitrary values (md5 of repr)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
            for v in values
        ],
        dtype=np.uint64,
    )


class CountMinSketch:
    """Count-min sketch (d rows x w counters, md5-derived row hashes),
    MERGEABLE by elementwise sum — the heavy-hitter counter whose
    exchange is O(d*w) per partial instead of the exact counter's
    full-key shuffle. Point estimate = min over rows (always >= truth)."""

    def __init__(self, w: int = 2048, d: int = 4):
        self.w = w
        self.d = d
        self.counts = np.zeros((d, w), dtype=np.int64)

    def _idx(self, keys: list) -> np.ndarray:
        # a 16-byte md5 digest yields 4 independent 4-byte row hashes;
        # rows beyond 4 get a SALTED re-hash (md5(f"{r}:{key}")) — slicing
        # past the digest would give int.from_bytes(b'') == 0 and map every
        # key in those rows to counter 0 (the whole-stream count)
        out = np.empty((self.d, len(keys)), dtype=np.int64)
        for j, k in enumerate(keys):
            dig = hashlib.md5(str(k).encode()).digest()
            for r in range(self.d):
                if r < 4:
                    word = dig[4 * r:4 * r + 4]
                else:
                    word = hashlib.md5(f"{r}:{k}".encode()).digest()[:4]
                out[r, j] = int.from_bytes(word, "little") % self.w
        return out

    def add(self, keys: list, counts=None) -> None:
        if not keys:
            return
        c = np.ones(len(keys), dtype=np.int64) if counts is None else \
            np.asarray(counts, dtype=np.int64)
        idx = self._idx(keys)
        for r in range(self.d):
            np.add.at(self.counts[r], idx[r], c)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.w, self.d) == (other.w, other.d)
        self.counts += other.counts
        return self

    def estimate(self, keys: list) -> np.ndarray:
        idx = self._idx(keys)
        return np.min(
            np.stack([self.counts[r][idx[r]] for r in range(self.d)]), axis=0
        )


def grouped_hll_registers(
    group_idx: np.ndarray, hashes: np.ndarray, n_groups: int, p: int
) -> np.ndarray:
    """One HLL register row PER GROUP in a single vectorized pass — the
    windowed-sketch building block (per-window distinct counts without
    per-group Python loops). Returns an (n_groups, 2^p) uint8 matrix;
    row g register-wise-max-merges with any other partial for group g."""
    m = 1 << p
    regs = np.zeros((n_groups, m), dtype=np.uint8)
    if not len(hashes):
        return regs
    h = hashes.astype(np.uint64)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    lsb = w & (~w + np.uint64(1))  # exact power of two -> exact log2
    rank = np.where(
        w == 0,
        64 - p + 1,
        np.log2(np.maximum(lsb, np.uint64(1)).astype(np.float64)).astype(
            np.int64) + 1,
    ).astype(np.uint8)
    np.maximum.at(regs, (np.asarray(group_idx, np.int64), idx), rank)
    return regs


class HyperLogLog:
    """HLL with 2^p registers. add() is vectorized; merge is elementwise
    max; estimate uses the standard bias-corrected harmonic mean with
    linear counting in the small range."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        if not len(h):
            return
        h = h.astype(np.uint64)
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        w = h >> np.uint64(self.p)
        # rank = trailing zeros of w + 1, capped when w == 0. lsb = w & -w
        # is an exact power of two (exactly representable in float64), so
        # log2 is exact.
        lsb = w & (~w + np.uint64(1))
        rank = np.where(
            w == 0,
            64 - self.p + 1,
            (np.log2(np.maximum(lsb, np.uint64(1)).astype(np.float64))).astype(np.int64) + 1,
        ).astype(np.uint8)
        np.maximum.at(self.regs, idx, rank)

    def add(self, values: list) -> None:
        self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert other.p == self.p
        self.regs = np.maximum(self.regs, other.regs)
        return self

    @classmethod
    def from_registers(cls, regs: np.ndarray, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.regs = np.asarray(regs, dtype=np.uint8).copy()
        return h

    def estimate(self) -> int:
        m = float(self.m)
        e = _alpha(self.m) * m * m / np.sum(np.exp2(-self.regs.astype(np.float64)))
        if e <= 2.5 * m:
            v = int(np.count_nonzero(self.regs == 0))
            if v:
                e = m * np.log(m / v)
        return int(round(e))
