"""Text-analysis kernels for training-data pipelines: SimHash, rolling-hash
document fingerprints, n-gram language ID, token counting.

All deterministic (md5/blake2b-based — no Python hash()), all designed to
run vectorized-per-batch inside map_batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# tiny stopword inventories for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
    "zh": set(),  # handled by the CJK-codepoint ratio below
}


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams weighted by count; md5-based so it
    is stable across runs/processes. Returns SIGNED int64."""
    counts: dict[str, int] = {}
    for w in text.split(" "):
        if w:
            counts[w] = counts.get(w, 0) + 1
    if not counts:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    for w, c in counts.items():
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), c, -c)
    val = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            val |= np.uint64(1) << np.uint64(i)
    return int(np.int64(val))


_B = 1000003
_M = (1 << 61) - 1


def fingerprints(text: str, window: int = 8) -> list[int]:
    """Rabin-Karp rolling-hash fingerprints over word windows (winnowing
    basis for copy detection). Deterministic; one hash per window."""
    ws = [w for w in text.split(" ") if w]
    if not ws:
        return []
    hs = [
        int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little") % _M
        for w in ws
    ]
    if len(hs) <= window:
        val = 0
        for h in hs:
            val = (val * _B + h) % _M
        return [val]
    out = []
    power = pow(_B, window - 1, _M)
    val = 0
    for h in hs[:window]:
        val = (val * _B + h) % _M
    out.append(val)
    for i in range(window, len(hs)):
        val = ((val - hs[i - window] * power) * _B + hs[i]) % _M
        out.append(val)
    return out


def min_fingerprint(text: str, window: int = 8) -> int:
    fps = fingerprints(text, window)
    return min(fps) if fps else -1


def predict_lang(text: str) -> str:
    """Stopword/CJK-ratio language heuristic. On word-salad synthetic text
    this degrades to 'unknown' — the honest answer; the pipeline shape
    (stateless scoring stage) is what carries to real corpora."""
    if not text:
        return "unknown"
    cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
    if cjk / max(len(text[:400]), 1) > 0.1:
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text[:2000])]
    if not words:
        return "unknown"
    best, best_score = "unknown", 0.0
    wset = words[:500]
    for lang, markers in _LANG_MARKERS.items():
        if not markers:
            continue
        score = sum(1 for w in wset if w in markers) / len(wset)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score >= 0.05 else "unknown"


def hamming64_many(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between two int64 arrays."""
    x = (a.astype(np.int64).view(np.uint64)) ^ (b.astype(np.int64).view(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


_PRE_TAG = "_-_strong_-_"
_POST_TAG = "_!-_strong_-_"


def phrase_pattern(t0: str, t1: str) -> str:
    """The slop-1 phrase regex of the reference's match_phrase query
    (first two terms, at most one intervening word): THE single phrase
    model — both the ranking side (webapp search scoring) and the
    highlighting side (es_fragments) compile this, so the two can never
    silently diverge."""
    return re.escape(t0) + r"( [a-z]+)? " + re.escape(t1)


def es_fragments(
    text: str,
    terms: tuple[str, ...],
    frag_size: int = 150,
    n_frags: int = 3,
    lead: int = 40,
    sanitize: bool = True,
) -> list[tuple[int, int, str]]:
    """The reference's ES highlight model re-expressed deterministically
    (elastic_search.go:123-154: fragment_size=150, number_of_fragments=3,
    order=score, highlight_query = match(terms) + match_phrase slop 1
    boost 10, sentinel pre/post tags sanitized to <strong> by the webapp,
    webapp/main.go:137-141).

    Fragmentation rule (deterministic stand-in for ES's FVH): walk term
    hits left to right; each fragment is the 150-char window starting 40
    chars before its first uncovered hit; every hit fully inside the
    window joins the fragment. Fragment score = term hits inside + 10 x
    slop-1 phrase matches fully inside. Fragments are returned ordered by
    (score desc, start asc), top n_frags, with every term hit wrapped in
    <strong>..</strong>.

    Returns [(score, start_offset, highlighted_fragment)].
    """
    # an empty alternation branch compiles to '' and matches a
    # zero-width hit at EVERY offset — garbage fragments; drop empty
    # terms individually (not just the all-empty case)
    terms = [t for t in terms if t]
    if not terms:
        return []
    term_re = re.compile("|".join(re.escape(t) for t in terms))
    phrase_re = (
        re.compile(phrase_pattern(terms[0], terms[1]))
        if len(terms) >= 2
        else None
    )
    hits = list(term_re.finditer(text))
    if not hits:
        return []
    phrase_spans = (
        [(m.start(), m.end()) for m in phrase_re.finditer(text)]
        if phrase_re is not None
        else []
    )
    frags: list[tuple[int, int, int, list]] = []
    i = 0
    while i < len(hits):
        start = max(hits[i].start() - lead, 0)
        end = start + frag_size
        inside = []
        while i < len(hits) and hits[i].end() <= end:
            inside.append(hits[i])
            i += 1
        if not inside:  # a hit longer than the window: take it alone
            inside.append(hits[i])
            end = hits[i].end()
            i += 1
        n_phrase = sum(1 for s, e in phrase_spans if s >= start and e <= end)
        frags.append((len(inside) + 10 * n_phrase, start, end, inside))
    frags.sort(key=lambda f: (-f[0], f[1]))
    out = []
    for score, start, end, inside in frags[:n_frags]:
        seg = text[start:end]
        for m in reversed(inside):  # right-to-left keeps offsets valid
            s, e = m.start() - start, m.end() - start
            seg = seg[:s] + _PRE_TAG + seg[s:e] + _POST_TAG + seg[e:]
        # sanitize=False returns the sentinel-marked form so an
        # HTML-rendering caller can escape the corpus text FIRST and only
        # then turn the (escape-proof) sentinels into live tags
        out.append((score, start, sanitize_highlight(seg) if sanitize else seg))
    return out


def sanitize_highlight(s: str) -> str:
    """The webapp's highlight sanitizer (reference webapp/main.go:137-141):
    replace the ES sentinel markers with real <strong> tags."""
    return s.replace("_-_strong_-_", "<strong>").replace(
        "_!-_strong_-_", "</strong>"
    )


def parse_stats_rows(rows: list[dict]) -> dict:
    """The stats-view reduce parser (reference couchdb/couchdb.go:291-311 +
    couchdb_test.go fixture): [{key, value}] rows -> {fetched, parsed}."""
    out = {"fetched": 0, "parsed": 0}
    for r in rows:
        if r.get("key") == "fetched_on":
            out["fetched"] = int(r.get("value", 0))
        elif r.get("key") == "parsed_on":
            out["parsed"] = int(r.get("value", 0))
    return out
