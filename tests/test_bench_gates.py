"""Unit tests for bench.py's in-band pair-acceptance gates (pure Python —
no Spark). The scaling protocol's evidence quality rests on these gates
rejecting weather-contaminated pairs in BOTH directions, so their edge
behavior is pinned here.
"""

import importlib.util
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


class TestRoundDispersion:
    def test_flat_matched_rounds_pass(self):
        # clean pair: every steady round's lo/hi ratio ≈ the true speedup
        disp, ok = bench.round_dispersion(
            [30.0, 28.0, 27.0, 26.0, 25.0], [10.0, 8.5, 8.1, 7.9, 7.6]
        )
        assert ok and disp is not None and disp < 1.5

    def test_burst_in_low_leg_rejected(self):
        # 10x burst confined to the low leg's round 3 (flattering weather
        # for the OTHER rounds' ratio; the outlier itself is unflattering)
        disp, ok = bench.round_dispersion(
            [30.0, 28.0, 270.0, 26.0, 25.0], [10.0, 8.5, 8.1, 7.9, 7.6]
        )
        assert not ok and disp > bench.ROUND_UNIFORM_MAX

    def test_burst_in_high_leg_rejected(self):
        # symmetric: burst in the high leg drags one ratio DOWN
        disp, ok = bench.round_dispersion(
            [30.0, 28.0, 27.0, 26.0, 25.0], [10.0, 85.0, 8.1, 7.9, 7.6]
        )
        assert not ok and disp > bench.ROUND_UNIFORM_MAX

    def test_round1_cold_start_excluded(self):
        # round 1 carries one-time costs whose lo/hi ratio legitimately
        # differs — a wild round-1 ratio alone must NOT reject the pair
        disp, ok = bench.round_dispersion(
            [300.0, 28.0, 27.0, 26.0], [10.0, 8.5, 8.1, 7.9]
        )
        assert ok

    def test_too_few_steady_rounds_trivially_pass(self):
        assert bench.round_dispersion([30.0, 28.0], [10.0, 8.5]) == (None, True)
        assert bench.round_dispersion([], []) == (None, True)

    def test_unequal_round_counts_use_common_prefix(self):
        # defensive: legs SHOULD have identical round counts (deterministic
        # crawl); if they ever differ, only matched rounds are compared
        disp, ok = bench.round_dispersion(
            [30.0, 28.0, 27.0, 26.0, 999.0], [10.0, 8.5, 8.1, 7.9]
        )
        assert ok and disp < 1.5

    def test_zero_time_rounds_skipped(self):
        disp, ok = bench.round_dispersion(
            [30.0, 0.0, 27.0, 26.0, 25.0], [10.0, 8.5, 0.0, 7.9, 7.6]
        )
        assert ok and disp is not None


class TestSeedGateConstants:
    def test_directed_band(self):
        # the documented band: ≥0.9 (more cores cannot slow identical
        # work) and ≤8 (parallelism alone moves the seed a few x)
        assert bench.SEED_UNIFORM_MIN <= 1.0 <= bench.SEED_UNIFORM_MAX
        assert bench.SEED_UNIFORM_MAX <= 10.0

class TestStealGate:
    def test_steal_pct_between(self):
        # 100 steal ticks out of a 10_000-tick interval = 1%
        assert bench.steal_pct_between((1_000_000, 500), (1_010_000, 600)) == 1.0

    def test_zero_steal(self):
        assert bench.steal_pct_between((1_000_000, 500), (1_010_000, 500)) == 0.0

    def test_unreadable_stat_is_uninformative(self):
        # null (no /proc/stat) must pass trivially, like the dispersion
        # gate — uninformative, not failed
        assert bench.steal_pct_between(None, (1, 0)) is None
        assert bench.steal_pct_between((1, 0), None) is None

    def test_zero_interval_is_uninformative(self):
        assert bench.steal_pct_between((1_000, 5), (1_000, 5)) is None

    def test_live_counter_reads(self):
        # the box this protocol runs on exposes the aggregate cpu line;
        # two reads must be monotonic in total ticks
        a = bench.cpu_stat()
        assert a is not None and a[0] > 0 and a[1] >= 0
        b = bench.cpu_stat()
        assert b[0] >= a[0] and b[1] >= a[1]

    def test_threshold_separates_documented_populations(self):
        # lifetime average on this box ~0.7%; burst legs imply >=5%.
        # The default threshold must sit between those populations.
        assert 0.7 < bench.STEAL_MAX_PCT < 5.0
