"""Host-side logic of the benchmark harness (the device paths run on
hardware via `python bench.py`; see BASELINE.md "Measurement integrity"
for why these guards exist)."""

import sys

sys.path.insert(0, "/root/repo")

import bench


def test_credible_min_rejects_impossible_samples():
    # 104 GFLOP at the 197 TF/s peak floors out at ~0.53 ms: a 0.17 ms
    # sample is relay fiction and must not win the cross-repeat min.
    flops = 104e9
    dt, rejected = bench._credible_min([0.17e-3, 9.0e-3, 11.0e-3], flops)
    assert dt == 9.0e-3
    assert rejected == 1


def test_credible_min_no_flops_passthrough():
    dt, rejected = bench._credible_min([2.0, 1.0], 0.0)
    assert dt == 1.0 and rejected == 0


def test_credible_min_all_impossible_uses_slowest():
    dt, rejected = bench._credible_min([1e-6, 2e-6], 1e12)
    assert dt == 2e-6 and rejected == 2


def test_time_chained_threads_carry():
    calls = []

    def step(carry, x):
        calls.append((float(carry), x))
        return carry + x

    dt = bench._time_chained(step, [1.0, 2.0, 3.0], warmup=1)
    assert dt > 0
    # warmup consumed inputs[0]; the timed loop runs ONLY the remaining
    # inputs (re-timing the warmup input with the same zero carry would be
    # byte-identical and relay-cacheable), each seeded with the accumulated
    # carry (the dependency chain).
    assert [c for c, _ in calls] == [0.0, 1.0, 3.0]
