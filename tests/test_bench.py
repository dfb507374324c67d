"""bench.py's adaptive timing harness (VERDICT r3 weak #1): the
measurement loop must tighten itself — collect pairs until the trimmed
spread meets the target — and say loudly when the budget capped it.
All off-device: the chain under test is a fake that sleeps.
"""

import time

import pytest

import bench


def test_summarize_trims_outliers():
    # 11 tight samples + 1 wild outlier: median robust, trimmed spread
    # excludes the outlier, raw range (via measure's min/max) keeps it
    samples = [100.0 + i * 0.1 for i in range(11)] + [140.0]
    median, spread, trim = bench._summarize(samples)
    assert trim == 1
    assert median == pytest.approx(100.55, abs=0.2)
    assert spread < 2.0  # outlier trimmed; raw range would be ~39%

    # small n: no trimming
    median, spread, trim = bench._summarize([100.0, 120.0])
    assert trim == 0
    assert spread == pytest.approx(100 * 20.0 / 110.0, rel=1e-6)


def _fake_chain(jitter):
    """A 'chain' whose runtime is iters*1ms, optionally alternating in
    speed so the sample spread stays large forever."""
    calls = {"n": 0}

    def chain(variables, images, iters):
        calls["n"] += 1
        scale = 1.0 + (jitter if (calls["n"] // 2) % 2 else 0.0)
        time.sleep(iters * 0.001 * scale)
        return 0.0

    return chain


def test_measure_stops_when_spread_met():
    stats = bench.measure(_fake_chain(0.0), None, batch=4,
                          k1=2, k2=12, repeats=3,
                          target_spread_pct=50.0, time_budget_s=30.0,
                          max_pairs=16)
    assert stats["n_pairs"] >= 3
    assert not stats["budget_capped"]
    assert stats["spread_pct"] <= 50.0
    # 4 faces * 10 iters / ~10ms -> ~4000 faces/sec order of magnitude
    assert 500 < stats["median"] < 20_000


def test_measure_budget_caps_and_reports():
    # alternating 2x jitter: spread can never reach 1%; the loop must
    # stop at max_pairs and mark the result budget-capped
    stats = bench.measure(_fake_chain(1.0), None, batch=4,
                          k1=2, k2=12, repeats=2,
                          target_spread_pct=1.0, time_budget_s=30.0,
                          max_pairs=6)
    assert stats["budget_capped"]
    assert stats["n_pairs"] == 6
    assert stats["spread_pct"] > 1.0


def test_measure_zero_target_keeps_fixed_repeats():
    stats = bench.measure(_fake_chain(0.0), None, batch=4,
                          k1=2, k2=12, repeats=3,
                          target_spread_pct=0.0, time_budget_s=30.0)
    assert stats["n_pairs"] == 3
    assert not stats["budget_capped"]
