import numpy as np
import pyarrow as pa

from owlcrawler_ray.functions.ids import url_hash64_many
from owlcrawler_ray.state.frontier import FrontierShard, entries_table
from owlcrawler_ray.state.politeness import PolitenessConfig, PolitenessGate
from owlcrawler_ray.state.seen import BloomFilter, CuckooFilter, SeenShard

URLS = [f"http://h{i % 7}.test/p{i}" for i in range(500)]


def test_cuckoo_insert_contains_delete():
    f = CuckooFilter(1000)
    hs = url_hash64_many(URLS)
    for h in hs:
        assert f.insert(int(h))
    assert f.contains_many(hs).all()
    other = url_hash64_many([u + "?x" for u in URLS])
    fp = f.contains_many(other).mean()
    assert fp < 0.05, f"false-positive rate {fp} too high"
    for h in hs[:100]:
        assert f.delete(int(h))
    assert not f.contains_many(hs[:100]).all()
    assert f.contains_many(hs[100:]).all()


def test_cuckoo_state_roundtrip_deterministic():
    f1, f2 = CuckooFilter(256), CuckooFilter(256)
    hs = url_hash64_many(URLS[:200])
    for h in hs:
        f1.insert(int(h))
        f2.insert(int(h))
    assert np.array_equal(f1.buckets, f2.buckets)  # identical insert order
    f3 = CuckooFilter(256)
    f3.restore(f1.state())
    assert np.array_equal(f3.buckets, f1.buckets)
    assert f3.contains_many(hs).all()


def test_bloom_filter():
    b = BloomFilter(1000, fp_rate=0.01)
    hs = url_hash64_many(URLS)
    b.add_many(hs)
    assert b.contains_many(hs).all()
    other = url_hash64_many([u + "?y" for u in URLS])
    assert b.contains_many(other).mean() < 0.05


def test_seen_shard_test_and_set():
    s = SeenShard(0)
    first = s.test_and_set_many(URLS[:10])
    assert first.all()
    again = s.test_and_set_many(URLS[:10])
    assert not again.any()
    mixed = s.test_and_set_many(URLS[5:15])
    assert list(mixed) == [False] * 5 + [True] * 5
    assert s.size() == 15
    assert s.contains_many(URLS[:15]).all()
    assert not s.contains_many(URLS[15:20]).any()


def test_seen_shard_remove_and_snapshot():
    s = SeenShard(0)
    s.add_many(URLS[:50])
    s.remove_many(URLS[:10])
    assert s.size() == 40
    snap = s.snapshot()
    s2 = SeenShard(0)
    s2.restore(snap)
    assert s2.size() == 40
    assert not s2.contains_many(URLS[:10]).any()
    assert s2.contains_many(URLS[10:50]).all()


def test_frontier_order_and_lazy_delete():
    f = FrontierShard(0)
    t = entries_table(
        ["u3", "u1", "u2", "u1dup"], ["h", "h", "h", "h"],
        [0, 0, 0, 0], [0.0, 0.0, 0.0, 0.0], [3, 1, 2, 5],
    )
    f.push_table(t)
    assert f.size() == 4
    top = f.peek(2)
    assert top.column("discovered_seq").to_pylist() == [1, 2]
    f.remove_seqs([1, 2])
    assert f.size() == 2
    top = f.peek(10)
    assert top.column("discovered_seq").to_pylist() == [3, 5]
    # priority beats seq when set
    f.push_table(entries_table(["hot"], ["h"], [0], [-1.0], [99]))
    assert f.peek(1).column("url").to_pylist() == ["hot"]


def test_frontier_snapshot_roundtrip():
    f = FrontierShard(0)
    f.push_table(entries_table(
        ["a", "b", "c"], ["h1", "h2", "h1"], [0, 1, 2],
        [0.0, 0.0, 0.0], [10, 11, 12]))
    f.remove_seqs([11])
    f2 = FrontierShard(0)
    f2.restore(f.snapshot())
    assert f2.size() == 2
    assert f2.peek(10).column("url").to_pylist() == ["a", "c"]


def test_politeness_parity_mode_noop_robots():
    g = PolitenessGate(PolitenessConfig())
    assert g.allowed("http://any.test/private/x")


def test_politeness_robots_rules():
    g = PolitenessGate(PolitenessConfig(
        disallow={"h1.test": ["/private/"], "*": ["/admin/"]}))
    assert not g.allowed("http://h1.test/private/a")
    assert g.allowed("http://h2.test/private/a")
    assert not g.allowed("http://h2.test/admin/a")
    assert g.allowed_many(["http://h1.test/ok", "http://h1.test/private/no"]) == [
        True, False]


def test_politeness_token_bucket():
    g = PolitenessGate(PolitenessConfig(mode="polite", rate_per_s=1.0, burst=3.0))
    assert g.admit_budget("h.test", 10, now_s=0.0) == 3  # burst
    assert g.admit_budget("h.test", 10, now_s=0.0) == 0  # drained
    assert g.admit_budget("h.test", 10, now_s=5.0) == 3  # refilled, capped
    assert g.admit_budget("h.test", 1, now_s=6.0) == 1
    st = g.state()
    g2 = PolitenessGate(PolitenessConfig(mode="polite", rate_per_s=1.0, burst=3.0))
    g2.restore(st)
    assert g2.admit_budget("h.test", 10, now_s=6.0) == 0


def test_seen_shard_spill_mode(tmp_path):
    """Disk-spill path: tiny memory cap forces sorted parquet runs; exact
    membership, test_and_set, remove, snapshot/restore all stay correct."""
    import os

    d = str(tmp_path / "spill")
    s = SeenShard(0, capacity=4096, spill_dir=d, max_mem_urls=100)
    batch1, batch2, batch3 = URLS[:150], URLS[150:300], URLS[300:450]
    s.add_many(batch1)
    assert any(f.startswith("seen_run_") for f in os.listdir(d))  # spilled
    assert s.contains_many(batch1).all()
    assert not s.contains_many(batch2).any()
    first = s.test_and_set_many(batch2)
    assert first.all()
    again = s.test_and_set_many(batch1 + batch2)
    assert not again.any()
    assert s.size() == 300
    # add_many is idempotent across the spill boundary
    assert s.add_many(batch1) == 0
    s.add_many(batch3)
    assert s.size() == 450
    # removal with tombstones over spilled runs
    s.remove_many(batch1[:10])
    assert s.size() == 440
    assert not s.contains_many(batch1[:10]).any()
    assert s.contains_many(batch1[10:20]).all()
    # snapshot equals logical contents; restore rebuilds identically
    snap = s.snapshot()
    assert snap.num_rows == 440
    s2 = SeenShard(0, capacity=4096, spill_dir=str(tmp_path / "spill2"),
                   max_mem_urls=100)
    s2.restore(snap)
    assert s2.size() == 440
    assert s2.contains_many(batch2).all()
    assert not s2.contains_many(batch1[:10]).any()
    # a shard restarted over the same spill dir recovers its runs
    s3 = SeenShard(0, capacity=4096, spill_dir=d, max_mem_urls=100)
    spilled = sum(len(h) for h, _ in s3._runs)
    assert spilled >= 100


def test_seen_shard_spill_remove_then_readd(tmp_path):
    """A URL removed (tombstoned against a spilled run) and later re-added
    must be seen again — and removal must never induce a filter false
    negative for other keys (fingerprints stay in the filter)."""
    d = str(tmp_path / "spill_readd")
    s = SeenShard(0, capacity=4096, spill_dir=d, max_mem_urls=50)
    batch = [f"http://h{i % 7}.test/p{i}" for i in range(120)]
    s.add_many(batch)
    assert s.contains_many(batch).all()
    victims = batch[:5]
    s.remove_many(victims)
    assert not s.contains_many(victims).any()
    # re-add via both write paths
    s.add_many(victims[:3])
    got = s.test_and_set_many(victims[3:])
    assert got.all()  # they really were unseen before the re-add
    assert s.contains_many(victims).all()  # permanently-unseen bug: fixed
    # idempotent re-add
    assert s.add_many(victims) == 0
    # every OTHER key survived the remove round-trip (no filter false negs)
    others = batch[5:]
    assert s.contains_many(others).all()
    assert s.size() == len(batch)
    # snapshot equals the logical set
    assert set(s.snapshot().column("url").to_pylist()) == set(batch)


def test_seen_shard_overflow_backed_revive(tmp_path):
    """ADVICE r2 (medium): a spilled URL whose cuckoo insert FAILED
    (overflow-backed — its fingerprint was never in the filter) must stay
    visible after remove -> re-add. The revive path has to re-establish
    filter coverage, not early-return on run membership."""
    d = str(tmp_path / "tiny")
    s = SeenShard(0, capacity=8, spill_dir=d, max_mem_urls=20)
    batch = [f"http://h{i % 3}.test/p{i}" for i in range(200)]
    s.add_many(batch)
    assert s.contains_many(batch).all()
    # pick victims that are BOTH in a spilled run and overflow-backed if
    # any exist; exercising all of them covers the overflow-backed case
    victims = batch[:40]
    s.remove_many(victims)
    assert not s.contains_many(victims).any()
    s.add_many(victims)
    assert s.contains_many(victims).all()  # the r2 permanent false negative
    assert s.contains_many(batch).all()


def test_cuckoo_saturation_disables_filter_fast_path(tmp_path):
    """ADVICE r2 (low): a failed kick chain strands a VICTIM key's
    fingerprint. Once that happens the shard must stop trusting filter
    negatives (exact-check everything) so saturation degrades to slow,
    never to silent false negatives."""
    d = str(tmp_path / "sat")
    s = SeenShard(0, capacity=8, spill_dir=d, max_mem_urls=50)
    batch = [f"http://h{i % 5}.test/q{i}" for i in range(400)]
    s.add_many(batch)
    # the undersized filter must have saturated for this test to bite
    assert getattr(s.filter, "dropped", 0) > 0
    assert s.contains_many(batch).all()  # 16/200-invisible repro: fixed
    assert not s.contains_many(["http://new.test/x"]).any()
    # test_and_set still exact under saturation
    assert not s.test_and_set_many(batch[:25]).any()


def test_bloom_sparse_partials_assemble_exactly():
    """anti_join_bloom's distributed build: sparse bit-index partials
    (O(batch keys), never O(build cardinality)) OR-assembled per bit-range
    shard must equal the filter built by add_many — and the partial bytes
    must not scale with the build-side capacity."""
    from owlcrawler_ray.state.seen import bloom_bit_indices

    batch = url_hash64_many([f"http://k{i}.test/" for i in range(500)])

    small, big = BloomFilter(10_000), BloomFilter(50_000_000)
    p_small = np.unique(bloom_bit_indices(batch, small.m, small.k).ravel())
    p_big = np.unique(bloom_bit_indices(batch, big.m, big.k).ravel())
    # partial size is O(batch x k): bounded by the key count either way
    assert len(p_big) <= len(batch) * big.k
    # and ~independent of capacity: nowhere near the full-width bit array
    # (the r2 flaw shipped big.m bits — >5 MB — per partial)
    assert p_big.nbytes < p_small.nbytes * (big.k / small.k) * 2
    assert p_big.nbytes * 20 < big.m // 8

    # shard-OR assembly reproduces add_many bit-for-bit
    direct = BloomFilter(10_000)
    direct.add_many(batch)
    n_shards = 8
    span = direct.m // n_shards
    assembled = BloomFilter(10_000)
    shards = (p_small // span).astype(np.int64)
    for s in range(n_shards):
        local = p_small[shards == s] - s * span
        words = np.zeros(span // 64, dtype=np.uint64)
        np.bitwise_or.at(
            words, (local >> 6).astype(np.int64),
            np.uint64(1) << (local.astype(np.uint64) & np.uint64(63)),
        )
        assembled.bits[s * (span // 64):(s + 1) * (span // 64)] = words
    assert np.array_equal(assembled.bits, direct.bits)
    assert assembled.contains_many(batch).all()


def test_seen_shard_model_based_property():
    """Model-based check (hypothesis): any interleaving of add / remove /
    test_and_set against an undersized, spill-enabled shard must agree
    with a plain set model on EVERY URL — no false positives, and (the
    invariant the saturation/revive fixes protect) no false negatives."""
    import shutil
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    universe = [f"http://h{i % 5}.test/p{i}" for i in range(48)]

    @settings(max_examples=50, deadline=None)
    @given(
        ops=st.lists(
            st.tuples(
                st.sampled_from(["add", "remove", "tas"]),
                st.lists(st.integers(0, 47), min_size=1, max_size=8),
            ),
            max_size=40,
        )
    )
    def run(ops):
        d = tempfile.mkdtemp(prefix="seen_model_")
        try:
            s = SeenShard(0, capacity=8, spill_dir=d, max_mem_urls=12)
            model: set[str] = set()
            for kind, idxs in ops:
                urls = [universe[i] for i in idxs]
                if kind == "add":
                    s.add_many(urls)
                    model.update(urls)
                elif kind == "remove":
                    s.remove_many(urls)
                    model.difference_update(urls)
                else:
                    got = s.test_and_set_many(urls)
                    want = []
                    for u in urls:
                        want.append(u not in model)
                        model.add(u)
                    assert list(got) == want
                mask = s.contains_many(universe)
                assert [bool(m) for m in mask] == [
                    u in model for u in universe
                ]
                assert s.size() == len(model)
            # snapshot -> restore round-trips the exact logical set
            d2 = tempfile.mkdtemp(prefix="seen_model_r_")
            try:
                s2 = SeenShard(0, capacity=8, spill_dir=d2, max_mem_urls=12)
                s2.restore(s.snapshot())
                mask = s2.contains_many(universe)
                assert [bool(m) for m in mask] == [
                    u in model for u in universe
                ]
            finally:
                shutil.rmtree(d2, ignore_errors=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    run()


def test_frontier_model_based_property():
    """Model-based check: any interleaving of push / remove(live seqs) /
    peek must agree with a sorted-dict model on ordering ((priority, seq)
    total order), sizes, and snapshot/restore round-trips. Removal follows
    the pipeline contract: only currently-live seqs, each removed once
    (admission removes seqs it just peeked)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        steps=st.lists(
            st.tuples(
                st.sampled_from(["push", "remove", "peek"]),
                st.lists(st.integers(0, 3), min_size=1, max_size=6),
                st.integers(1, 10),
            ),
            max_size=30,
        )
    )
    def run(steps):
        f = FrontierShard(0)
        model: dict[int, tuple] = {}
        next_seq = 0
        for kind, prios, k in steps:
            if kind == "push":
                entries = []
                for p in prios:
                    e = (float(p), next_seq, f"http://h{p}.test/p{next_seq}",
                         f"h{p}.test", 1)
                    entries.append(e)
                    model[next_seq] = e
                    next_seq += 1
                f.push_table(entries_table(
                    [e[2] for e in entries], [e[3] for e in entries],
                    [e[4] for e in entries], [e[0] for e in entries],
                    [e[1] for e in entries],
                ))
            elif kind == "remove" and model:
                live = sorted(model)
                victims = [live[i % len(live)] for i in prios]
                victims = list(dict.fromkeys(victims))
                f.remove_seqs(victims)
                for s in victims:
                    del model[s]
            else:
                want = sorted(model.values())[:k]
                got = f.peek(k)
                assert got.column("discovered_seq").to_pylist() == [
                    e[1] for e in want
                ]
                assert got.column("url").to_pylist() == [e[2] for e in want]
            assert f.size() == len(model)
        f2 = FrontierShard(1)
        f2.restore(f.snapshot())
        assert f2.size() == len(model)
        assert f2.peek(len(model) + 1).column("discovered_seq").to_pylist() \
            == [e[1] for e in sorted(model.values())]

    run()


def test_politeness_token_bucket_property():
    """Property check: over any admit sequence, a host can never be
    granted more than burst + rate * elapsed tokens in total (the token
    bucket's defining invariant), and grants are never negative."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        reqs=st.lists(
            st.tuples(st.integers(0, 20), st.floats(0.0, 5.0)),
            min_size=1, max_size=25,
        )
    )
    def run(reqs):
        cfg = PolitenessConfig(mode="polite", rate_per_s=2.0, burst=5.0)
        g = PolitenessGate(cfg)
        t = 0.0
        granted = 0
        for want, dt in reqs:
            t += dt
            got = g.admit_budget("h.test", want, now_s=t)
            assert 0 <= got <= want
            granted += got
            # total grants can never exceed burst + rate * elapsed
            assert granted <= cfg.burst + cfg.rate_per_s * t + 1e-6

    run()


def test_cuckoo_filter_no_false_negatives_property():
    """Property: while no kick chain has failed (dropped == 0), every
    successfully inserted key IS contained — the no-false-negatives
    invariant the seen-set's filter-first membership rests on. Deletions
    of inserted keys succeed and re-querying the remainder still holds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        keys=st.lists(st.integers(1, 2**63 - 1), min_size=1, max_size=200,
                      unique=True),
        cap=st.sampled_from([64, 256, 1024]),
        n_del=st.integers(0, 20),
    )
    def run(keys, cap, n_del):
        f = CuckooFilter(cap)
        inserted = []
        for k in keys:
            if f.insert(k):
                inserted.append(k)
            if f.dropped:
                break  # saturation: the invariant is void by contract
        if f.dropped == 0 and inserted:
            assert f.contains_many(
                np.array(inserted, dtype=np.uint64)
            ).all()
            victims = inserted[:n_del]
            for k in victims:
                assert f.delete(k)
            rest = inserted[n_del:]
            if rest:
                assert f.contains_many(
                    np.array(rest, dtype=np.uint64)
                ).all()
            # state round-trip preserves membership exactly
            g = CuckooFilter(cap)
            g.restore(f.state())
            if rest:
                assert g.contains_many(
                    np.array(rest, dtype=np.uint64)
                ).all()

    run()


def test_int_hash64_vectorized_bloom_roundtrip():
    """int_hash64_many (the numeric splitmix64 path under
    anti_join_bloom) must be deterministic, avalanche sequential keys
    apart, and drive the bloom with no false negatives and a sane
    false-positive rate."""
    import numpy as np

    from owlcrawler_ray.functions.ids import int_hash64_many

    keys = np.arange(10_000, dtype=np.int64)
    h1, h2 = int_hash64_many(keys), int_hash64_many(keys)
    assert h1.dtype == np.uint64 and (h1 == h2).all()
    # avalanche: sequential ints must not collide and must spread over
    # the high bits (a multiplicative-only hash fails this)
    assert len(np.unique(h1)) == len(keys)
    assert len(np.unique(h1 >> np.uint64(48))) > 5_000

    b = BloomFilter(10_000, fp_rate=0.01)
    b.add_many(h1)
    assert b.contains_many(h1).all()  # no false negatives
    other = int_hash64_many(np.arange(50_000, 60_000, dtype=np.int64))
    fp = b.contains_many(other).mean()
    assert fp < 0.05, fp


def test_seen_shard_cold_construction_over_dirty_spill_dir(tmp_path):
    """A FRESH shard constructed over an existing spill_dir (actor
    restart / resume before the first checkpoint) must load the runs
    WITH filter coverage: before the r4 fix, contains_many (filter-first)
    returned false negatives for every spilled URL while
    test_and_set_many still refused to re-insert them — an internally
    contradictory shard."""
    d = str(tmp_path / "spill")
    urls = [f"http://h/{i}" for i in range(120)]
    s1 = SeenShard(0, capacity=4096, spill_dir=d, max_mem_urls=50)
    s1.add_many(urls)
    s2 = SeenShard(0, capacity=4096, spill_dir=d, max_mem_urls=50)
    assert s2.contains_many(urls).all()
    assert not s2.test_and_set_many(urls).any()
    # the two membership views must agree
    assert s2.contains_many(urls).all()


def test_parse_robots_agent_groups():
    """Consecutive User-agent lines form ONE group sharing the rules
    that follow (robots spec); a second agent line must not wipe the
    wildcard's membership in the group."""
    from owlcrawler_ray.state.politeness import parse_robots

    txt = "User-agent: *\nUser-agent: otherbot\nDisallow: /private\n"
    assert parse_robots(txt) == [("/private", False)]
    # a NEW group after rules resets membership
    txt2 = ("User-agent: otherbot\nDisallow: /a\n"
            "User-agent: *\nDisallow: /b\n")
    assert parse_robots(txt2) == [("/b", False)]
    # wildcard second in its group still counts
    txt3 = "User-agent: x\nUser-agent: *\nDisallow: /c\n"
    assert parse_robots(txt3) == [("/c", False)]


def test_parse_robots_rfc9309_groups_and_selection():
    """RFC 9309 upgrades (round-4 verdict item #7): Allow lines kept,
    empty Disallow dropped (allow-all form), specific-agent group
    selection with longest-token precedence over `*`."""
    from owlcrawler_ray.state.politeness import parse_robots

    txt = ("User-agent: *\nDisallow: /a\nAllow: /a/pub\n"
           "User-agent: owl\nDisallow: /b\n"
           "User-agent: owlcrawler\nDisallow: /c\nAllow: /c/ok\n")
    # no agent: only the * group
    assert parse_robots(txt) == [("/a", False), ("/a/pub", True)]
    # agent matching BOTH specific tokens: longest token ('owlcrawler')
    # wins and the * group is ignored entirely
    assert parse_robots(txt, agent="OwlCrawler/1.0") == [
        ("/c", False), ("/c/ok", True)]
    # agent matching only the short token
    assert parse_robots(txt, agent="owlbot") == [("/b", False)]
    # agent matching nothing falls back to *
    assert parse_robots(txt, agent="unrelated") == [
        ("/a", False), ("/a/pub", True)]
    # the allow-all form: empty Disallow is no rule at all
    assert parse_robots("User-agent: *\nDisallow:\n") == []


def test_robots_precedence_and_wildcards():
    """RFC 9309 matching: longest-pattern-octets precedence, Allow wins
    ties, `*` spans any octets, trailing `$` anchors the end, no match
    means allowed; query strings participate in the match."""
    from owlcrawler_ray.state.politeness import (
        PolitenessConfig, PolitenessGate, parse_robots)

    from owlcrawler_ray.state.politeness import _CompiledRules

    txt = ("User-agent: *\n"
           "Disallow: /shop/\n"
           "Allow: /shop/public/\n"
           "Disallow: /shop/public/*.json\n"
           "Disallow: /exact.html$\n"
           "Allow: /dup\n"
           "Disallow: /dup\n")
    r = _CompiledRules(parse_robots(txt))
    assert not r.allowed("/shop/cart")            # /shop/ (7)
    assert r.allowed("/shop/public/item")         # allow 14 > disallow 7
    assert not r.allowed("/shop/public/a.json")   # wildcard 21 > allow 14
    assert not r.allowed("/exact.html")           # anchored match
    assert r.allowed("/exact.html.bak")           # $ stops the match
    assert r.allowed("/dup")                      # tie -> Allow wins
    assert r.allowed("/anything-else")            # no match -> allowed
    # gate-level: query participates (pattern can hit it via *)
    gate = PolitenessGate(PolitenessConfig(
        disallow={"*": ["/search?*priv"]}))
    assert not gate.allowed("http://h.test/search?x=priv")
    assert gate.allowed("http://h.test/search?x=pub")


def test_politeness_allowed_survives_malformed_url():
    from owlcrawler_ray.state.politeness import (
        PolitenessConfig, PolitenessGate)

    g = PolitenessGate(PolitenessConfig())
    assert g.allowed("http://host/x") is True
    assert g.allowed("http://[x/p") is False  # malformed -> skip, not crash


def test_frontier_remove_seqs_idempotent_and_foreign_safe():
    """Replayed removes (after compaction re-armed the seq) and foreign
    seqs must not corrupt the live counter."""
    from owlcrawler_ray.state.frontier import FrontierShard, entries_table

    f = FrontierShard(0)
    f.push_table(entries_table(
        ["u0", "u1", "u2"], ["h", "h", "h"], [0, 0, 0],
        [0.0, 0.0, 0.0], [0, 1, 2]))
    assert f.remove_seqs([1]) == 2
    assert f.remove_seqs([1]) == 2   # replay after compaction: no-op
    assert f.remove_seqs([99]) == 2  # foreign seq: no-op
    assert f.peek(10).num_rows == 2
    assert f.remove_seqs([0, 2]) == 0


def test_codec_decode_raises_valueerror_on_all_corruption():
    """decode()'s documented contract is ValueError — truncated headers,
    unknown fmt codes and corrupt zlib streams must all normalize to it
    (callers' catch lists depend on this; a real fetch hands decode
    arbitrary bytes)."""
    import numpy as np
    import pytest

    from owlcrawler_ray.functions import codec

    good = codec.encode(
        np.zeros((4, 4, 3), dtype=np.uint8), "png")
    for bad in (
        codec.MAGIC,                      # truncated header
        codec.MAGIC + b"\xff" + good[5:], # unknown fmt code
        good[:10] + b"garbage",           # corrupt zlib stream
        b"not even close",                # foreign payload
    ):
        with pytest.raises(ValueError):
            codec.decode(bad)


def test_es_fragments_empty_terms_returns_nothing():
    from owlcrawler_ray.functions.textops import es_fragments

    assert es_fragments("hello world " * 5, ()) == []
