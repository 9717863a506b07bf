"""Unit tests for bench.py's adaptive headline-leg policy.

The policy decides, after each crawl leg, whether the recorded
min-of-legs is trustworthy ('stop'), needs another immediate leg
('retry' — the window is visibly moving), or should wait out a noisy
plateau ('wait'). It is a pure function so these tests pin the exact
behavior the round driver's BENCH capture depends on — no crawls run.
"""

from bench import leg_policy


QUIET = 20.0  # quiet band at 32 cpus (20.0 * 32/32)


def test_quiet_tight_legs_stop_immediately():
    assert leg_policy([13.1, 13.8], 32, 0.0) == "stop"


def test_band_scales_with_cpu_width():
    # 2-cpu quiet band is 20 * 32/2 = 320 s: a 130 s leg pair is quiet
    assert leg_policy([128.0, 131.0], 2, 0.0) == "stop"
    # the same seconds at 32 cpus are a noisy plateau
    assert leg_policy([128.0, 131.0], 32, 0.0) == "wait"


def test_slow_plateau_waits_rather_than_remeasures():
    # tight spread but both legs above the quiet band: the window is a
    # stable noisy plateau — sleep before the next leg
    assert leg_policy([30.2, 31.0], 32, 0.0) == "wait"


def test_wide_spread_with_quiet_min_retries_now():
    # min is inside the band but the legs disagree 1.25x+: the window is
    # moving, take another leg immediately to confirm the dip
    assert leg_policy([14.0, 29.0], 32, 0.0) == "retry"


def test_budget_exhaustion_stops_even_when_noisy():
    assert leg_policy([30.2, 31.0, 29.5], 32, 300.0) == "stop"
    assert leg_policy([14.0, 29.0], 32, 1e9) == "stop"


def test_budget_reserves_the_cost_of_the_next_action():
    # a 'wait' costs 45 s sleep + one leg at the slowest pace seen (31 s):
    # at 260 s spent, 260+76 > 300 must stop — the old post-spend check
    # would have slept and crawled ~76 s past the documented bound
    assert leg_policy([30.2, 31.0], 32, 260.0) == "stop"
    assert leg_policy([30.2, 31.0], 32, 200.0) == "wait"
    # a 'retry' reserves just the leg (no sleep): 280+29 > 300 stops,
    # 270+29 <= 300 still retries
    assert leg_policy([14.0, 29.0], 32, 280.0) == "stop"
    assert leg_policy([14.0, 29.0], 32, 270.0) == "retry"


def test_unconfirmed_dip_retries_then_confirmed_dip_stops():
    # a spaced leg caught a dip: one more immediate leg to confirm it...
    assert leg_policy([30.0, 31.0, 13.5], 32, 100.0) == "retry"
    # ...and once the two smallest legs agree inside the band, the
    # min-of-legs is trustworthy — noisy early legs must NOT keep the
    # policy retrying (spread is judged on the two smallest, not max/min)
    assert leg_policy([30.0, 31.0, 13.5, 13.9], 32, 200.0) == "stop"


def test_policy_is_order_insensitive():
    assert leg_policy([29.0, 14.0], 32, 0.0) == leg_policy(
        [14.0, 29.0], 32, 0.0)


def _run_default_with_legs(monkeypatch, secs_seq, tick_per_leg=0.0):
    """Drive bench.run_default with stubbed crawl legs / queries / Ray —
    returns (json_out, legs_taken, sleeps). tick_per_leg advances a fake
    perf_counter so the budget bound is testable without real minutes."""
    import time as _time

    import ray

    import bench

    calls = {"legs": 0, "sleeps": []}
    it = iter(secs_seq)
    clock = [0.0]

    def _leg(ncpu):
        calls["legs"] += 1
        clock[0] += tick_per_leg
        s = next(it)
        return {"crawl": {
            "sec": s, "fetched_urls": 100, "attempt_ticks": 110,
            "image_rows": 150, "urls_per_s": round(100 / s, 2),
            "image_rows_per_s": round(150 / s, 2), "seen_spill": False}}

    monkeypatch.setattr(bench, "_crawl_leg", _leg)
    monkeypatch.setattr(bench, "_init_ray", lambda: None)
    monkeypatch.setattr(bench, "_warm_page_cache", lambda: None)
    monkeypatch.setattr(
        bench, "_time_queries", lambda: {n: 0.1 for n in bench.BENCH_QUERIES})
    monkeypatch.setattr(ray, "shutdown", lambda: None)
    monkeypatch.setattr(_time, "sleep", lambda s: calls["sleeps"].append(s))
    if tick_per_leg:
        monkeypatch.setattr(_time, "perf_counter", lambda: clock[0])
    out = bench.run_default()
    return out, calls["legs"], calls["sleeps"]


def test_run_default_quiet_window_takes_two_legs(monkeypatch):
    out, legs, sleeps = _run_default_with_legs(monkeypatch, [13.5, 14.0])
    assert legs == 2 and not sleeps
    assert out["value"] == 13.5 and out["session"] == "quiet"
    assert len(out["crawl_legs"]) == 2


def test_run_default_waits_out_noise_and_confirms_dip(monkeypatch):
    out, legs, sleeps = _run_default_with_legs(
        monkeypatch, [30.0, 31.0, 14.2, 13.8])
    assert legs == 4 and sleeps and sleeps[0] == 45.0
    # min-of-legs caught the dip; the wide spread honestly flags the
    # session noisy even though the recorded minimum is representative
    assert out["value"] == 13.8 and out["session"] == "noisy"
    assert out["leg_spread"] > 2


def test_run_default_adds_third_query_pass_when_passes_disagree(monkeypatch):
    import time as _time

    import ray

    import bench

    passes = [
        {n: 0.1 for n in bench.BENCH_QUERIES},       # quiet pass
        {n: 0.3 for n in bench.BENCH_QUERIES},       # window degraded 3x
        {n: 0.12 for n in bench.BENCH_QUERIES},      # recovered
    ]
    it = iter(passes)
    taken = []

    def fake_pass():
        p = next(it)
        taken.append(p)
        return p

    def _leg(ncpu):
        return {"crawl": {
            "sec": 13.0, "fetched_urls": 100, "attempt_ticks": 110,
            "image_rows": 150, "urls_per_s": 7.7,
            "image_rows_per_s": 11.5, "seen_spill": False}}

    monkeypatch.setattr(bench, "_crawl_leg", _leg)
    monkeypatch.setattr(bench, "_init_ray", lambda: None)
    monkeypatch.setattr(bench, "_warm_page_cache", lambda: None)
    monkeypatch.setattr(bench, "_time_queries", fake_pass)
    monkeypatch.setattr(ray, "shutdown", lambda: None)
    monkeypatch.setattr(_time, "sleep", lambda s: None)
    out = bench.run_default()
    assert len(taken) == 3  # totals disagreed 3x -> third pass fired
    assert out["queries"][bench.BENCH_QUERIES[0]] == 0.1
    assert len(out["queries_runs"]) == 3

    # tight passes -> exactly two
    it = iter([{n: 0.1 for n in bench.BENCH_QUERIES},
               {n: 0.11 for n in bench.BENCH_QUERIES}])
    taken.clear()
    out = bench.run_default()
    assert len(taken) == 2


def _run_scaling_with_legs(monkeypatch, secs_by_call):
    """Drive bench.run_scaling with stubbed legs. secs_by_call is consumed
    in call order; the ncpu of every call is recorded so the interleaving
    contract is assertable."""
    import bench

    order = []
    it = iter(secs_by_call)

    def _leg(ncpu):
        order.append(ncpu)
        s = next(it)
        return {"crawl": {
            "sec": s, "fetched_urls": 100, "attempt_ticks": 110,
            "image_rows": 150, "urls_per_s": round(100 / s, 2),
            "image_rows_per_s": round(150 / s, 2), "seen_spill": False}}

    monkeypatch.setattr(bench, "_crawl_leg", _leg)
    return bench.run_scaling(), order


def test_run_scaling_interleaves_widths(monkeypatch):
    # quiet legs: two lo/hi rounds, alternating — never lo,lo,hi,hi
    out, order = _run_scaling_with_legs(
        monkeypatch, [100.0, 26.0, 102.0, 25.0])
    assert order == [2, 8, 2, 8]
    assert out["sec_lo"] == 100.0 and out["sec_hi"] == 25.0
    # efficiency = (100/25 urls-per-s ratio) / 4 = (4/1)/4 = 1.0
    assert out["scaling_efficiency"] == 1.0
    assert out["session"] == "quiet"
    assert out["minima_confirmed"] is True


def test_run_scaling_noisy_round_adds_a_leg_to_both_widths(monkeypatch):
    # lo legs disagree 1.3x -> one more INTERLEAVED round (both widths)
    out, order = _run_scaling_with_legs(
        monkeypatch, [130.0, 26.0, 100.0, 25.0, 101.0, 25.5])
    assert order == [2, 8, 2, 8, 2, 8]
    assert out["sec_lo"] == 100.0 and out["sec_hi"] == 25.0
    # the extra round CONFIRMED both minima (two smallest legs per width
    # agree) so the recorded RATIO is trustworthy — but the 130 s outlier
    # means the window moved, and the session flag (full max/min spread,
    # the headline bench's stance) must say so honestly
    assert out["session"] == "noisy"
    assert out["minima_confirmed"] is True
    assert out["legs_lo"] == [100.0, 101.0, 130.0]


def test_run_scaling_unconfirmed_minimum_is_flagged_noisy(monkeypatch):
    out, order = _run_scaling_with_legs(
        monkeypatch, [130.0, 26.0, 100.0, 25.0, 131.0, 25.5])
    assert order == [2, 8, 2, 8, 2, 8]
    # lo minimum 100 s was never reproduced within 1.25x: noisy, and the
    # ratio itself is unconfirmed
    assert out["session"] == "noisy"
    assert out["minima_confirmed"] is False


def test_run_default_stable_slow_plateau_is_flagged_noisy(monkeypatch):
    # the BENCH_r04 failure mode: every leg slow but tight-spread — the
    # session flag must NOT read "quiet" just because the legs agree
    out, legs, sleeps = _run_default_with_legs(
        monkeypatch, [30.0] * 50, tick_per_leg=60.0)
    assert out["value"] == 30.0 and out["session"] == "noisy"
    assert legs <= 11  # bounded by leg_policy's 300 s extra budget


def test_bench_queries_all_in_registry():
    """A registry rename must fail fast (and in CI), not after two
    multi-minute crawl legs inside the driver's bench run."""
    import bench
    from owlcrawler_ray.pipelines.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert missing == []


def test_sf_label_handles_suffixed_dirs(monkeypatch):
    import bench

    monkeypatch.setattr(bench, "SF_DIR", "/data/sf0.1")
    assert bench._sf_label() == "0.1"
    monkeypatch.setattr(bench, "SF_DIR", "/data/sf0.1_transfer/")
    assert bench._sf_label() == "0.1"
    monkeypatch.setattr(bench, "SF_DIR", "/tmp/sfx/sf0.001")
    assert bench._sf_label() == "0.001"
