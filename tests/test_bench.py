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


# ---------------------------------------------------------------------------
# StageRunner: the budget-gated stage driver that gates the round's judged
# artifact (VERDICT r4 item 2 — it shipped untested and produced a degraded
# BENCH_r04). Pure host logic; stage fns are stubs.
# ---------------------------------------------------------------------------


def _result():
    return {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0,
            "extras": {}}


def _res(ms=5.0, pps=100.0):
    return {"panoramas_per_s": pps, "ms": ms, "spread_ms": [ms], "mfu": 0.2}


def test_stage_runner_skips_on_budget_but_always_tries_headline():
    r = bench.StageRunner(_result(), remaining=lambda: 50.0,
                          baseline_ms={}, tf_cpu_baseline=10.0)
    calls = []
    out = r.run("s", "k", lambda: calls.append(1) or _res(), est_s=100)
    assert out is None and calls == []
    assert r.extras["skipped_stages"] == ["k"]
    out = r.run("h", "hk", lambda: _res(pps=50.0), est_s=100,
                is_headline=True)
    assert out is not None
    assert r.result["value"] == 50.0
    assert r.result["vs_baseline"] == 5.0


def test_stage_runner_adaptive_gate_uses_observed_times():
    # Cold estimate 500s would not fit in 120s, but with two completed
    # stages the expected cost is min(500, max(60, 2*max)) = 60 -> fits.
    r = bench.StageRunner(_result(), remaining=lambda: 120.0,
                          baseline_ms={}, tf_cpu_baseline=10.0)
    r.stage_times = [1.0, 2.0]
    out = r.run("s", "k", _res, est_s=500)
    assert out is not None
    assert r.extras["k_ms"] == 5.0


def test_stage_runner_persists_error_and_retries_once():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("transient relay stall")
        return _res()

    r = bench.StageRunner(_result(), remaining=lambda: 1000.0,
                          baseline_ms={}, tf_cpu_baseline=10.0)
    out = r.run("s", "k", flaky, est_s=10)
    assert out is not None and len(calls) == 2
    assert "RuntimeError: transient relay stall" in \
        r.extras["failed_stage_errors"]["k"]
    assert r.extras["retried_ok_stages"] == ["k"]
    assert "failed_stages" not in r.extras
    assert r.extras["k_ms"] == 5.0


def test_stage_runner_double_failure_is_terminal():
    def bad():
        raise ValueError("boom")

    r = bench.StageRunner(_result(), remaining=lambda: 1000.0,
                          baseline_ms={}, tf_cpu_baseline=10.0)
    assert r.run("s", "k", bad, est_s=10) is None
    assert r.extras["failed_stages"] == ["k"]
    assert "ValueError: boom" in r.extras["failed_stage_errors"]["k"]


def test_stage_runner_no_retry_when_budget_gone():
    calls = []
    remaining = [1000.0]

    def bad():
        calls.append(1)
        remaining[0] = 10.0  # the failure burned the budget
        raise ValueError("boom")

    r = bench.StageRunner(_result(), remaining=lambda: remaining[0],
                          baseline_ms={}, tf_cpu_baseline=10.0)
    assert r.run("s", "k", bad, est_s=10) is None
    assert len(calls) == 1
    assert r.extras["failed_stages"] == ["k"]


def test_stage_runner_regression_sentinel():
    r = bench.StageRunner(_result(), remaining=lambda: 1000.0,
                          baseline_ms={"k": 2.0}, tf_cpu_baseline=10.0)
    r.run("s", "k", lambda: _res(ms=5.0), est_s=10)
    assert r.extras["regressed_vs_baseline"] == ["k"]
    r.run("s2", "k2", lambda: _res(ms=5.0), est_s=10)
    assert "k2" not in r.extras.get("regressed_vs_baseline", [])


def test_stage_runner_snapshot_is_isolated():
    r = bench.StageRunner(_result(), remaining=lambda: 1000.0,
                          baseline_ms={}, tf_cpu_baseline=10.0)
    r.run("s", "k", _res, est_s=10)
    snap = r.snapshot()
    r.extras.setdefault("failed_stages", []).append("later")
    r.extras["k_ms"] = 999.0
    assert "failed_stages" not in snap["extras"]
    assert snap["extras"]["k_ms"] == 5.0


def test_baseline_stage_ms_covers_all_stages():
    # Every stage key _run_stages can publish must have a baseline record,
    # or the regression sentinel silently never fires for it.
    import re

    src = open("/root/repo/bench.py").read()
    keys = set(re.findall(r'run\("[^"]+",\s*\n?\s*"([a-z0-9_]+)"', src)) | \
        set(re.findall(r'run\("[^"]+", "([a-z0-9_]+)"', src))
    assert keys, "stage-key regex found nothing — update the test"
    missing = keys - set(bench.BASELINE_STAGE_MS)
    assert not missing, f"stages without baseline records: {missing}"

def test_tunnel_established_parses_proc_net_tcp(tmp_path):
    # 0x1F92 == 8082. State field (4th col) "01" == ESTABLISHED.
    header = ("  sl  local_address rem_address   st tx_queue rx_queue tr "
              "tm->when retrnsmt   uid  timeout inode\n")
    estab = tmp_path / "tcp_estab"
    estab.write_text(header +
        "   0: 0100007F:C350 0100007F:1F92 01 00000000:00000000 00:00000000 "
        "00000000     0        0 12345\n")
    listen_only = tmp_path / "tcp_listen"
    listen_only.write_text(header +
        "   0: 0100007F:1F92 00000000:0000 0A 00000000:00000000 00:00000000 "
        "00000000     0        0 12345\n"
        "   1: 0100007F:C351 0100007F:0050 01 00000000:00000000 00:00000000 "
        "00000000     0        0 12346\n")
    assert bench._tunnel_established(proc_paths=(str(estab),)) is True
    # A LISTEN socket on 8082 (the local forwarder, which survives outages)
    # and unrelated ESTAB sockets must NOT count as a live tunnel.
    assert bench._tunnel_established(proc_paths=(str(listen_only),)) is False
    assert bench._tunnel_established(proc_paths=(str(tmp_path / "nope"),)) is None

def test_wait_for_tunnel_healthy_is_single_probe():
    import threading
    calls = []
    extras = {}
    ok = bench._wait_for_tunnel(extras, threading.Lock(),
                                probe=lambda: calls.append(1) or True)
    assert ok is True and len(calls) == 1 and extras == {}


def test_wait_for_tunnel_polls_until_recovery(monkeypatch):
    import threading
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_remaining", lambda: 500.0)
    seq = iter([False, False, True])
    extras = {}
    ok = bench._wait_for_tunnel(extras, threading.Lock(),
                                probe=lambda: next(seq), now=lambda: 7.0)
    assert ok is True
    assert extras["tunnel_outage_at_start"] is True
    assert extras["tunnel_recovered_after_s"] == 0.0


def test_wait_for_tunnel_gives_up_near_deadline(monkeypatch):
    import threading
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    remaining = [400.0]

    def fake_remaining():
        remaining[0] -= 100.0
        return remaining[0]

    monkeypatch.setattr(bench, "_remaining", fake_remaining)
    extras = {}
    ok = bench._wait_for_tunnel(extras, threading.Lock(), probe=lambda: False)
    assert ok is False and extras["tunnel_outage_at_start"] is True
    assert "tunnel_recovered_after_s" not in extras


def test_wait_for_tunnel_broken_probe_never_blocks():
    # None (probe infrastructure broke) must be treated as "unknown, go".
    import threading
    extras = {}
    ok = bench._wait_for_tunnel(extras, threading.Lock(), probe=lambda: None)
    assert ok is True and extras == {}
