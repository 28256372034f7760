"""bench.py must survive a device/tunnel outage with parseable evidence.

Round 3's driver bench died on the first device touch (BENCH_r03.json
rc=1, zero metric lines) when the TPU tunnel went down — a null round
indistinguishable from a broken bench. These tests simulate the outage by
monkeypatching the subprocess probe and assert the contract: one
`tunnel_down` JSON line per failed attempt, a final `tunnel_down` line,
and a clean exit (reference for the driver contract: bench.py docstring).
"""

import json
import subprocess
import sys


def _load_bench(monkeypatch):
    sys.modules.pop("bench", None)
    import bench
    return bench


def test_device_retry_emits_tunnel_down_and_gives_up(monkeypatch, capsys):
    bench = _load_bench(monkeypatch)

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # pin the clock past the retry cap so the loop gives up after attempt 1
    # (sleep is a no-op here, so real elapsed time would barely advance)
    monkeypatch.setattr(bench, "elapsed", lambda: 35.0)

    rtt = bench.device_up_or_retry(budget=90.0)
    assert rtt is None

    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert lines, "no diagnostic lines emitted during simulated outage"
    assert all(l["metric"] == "tunnel_down" for l in lines)
    assert lines[0]["value"] == 1.0


def test_device_retry_recovers_on_second_attempt(monkeypatch, capsys):
    bench = _load_bench(monkeypatch)
    calls = {"n": 0}

    class _OK:
        returncode = 0
        stdout = "UP\n"

    def flaky_run(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(cmd="probe", timeout=1)
        return _OK()

    monkeypatch.setattr(subprocess, "run", flaky_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "measure_rtt", lambda: 12.5)

    rtt = bench.device_up_or_retry(budget=600.0)
    assert rtt == 12.5
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert [l["metric"] for l in lines] == ["tunnel_down"]


def test_full_mode_outage_exits_zero_with_evidence(monkeypatch, capsys):
    """End-to-end: main() in full mode during an outage prints only
    tunnel_down lines (last line parseable) and returns normally."""
    bench = _load_bench(monkeypatch)

    monkeypatch.setattr(bench, "device_up_or_retry", lambda budget: None)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--budget", "60"])

    bench.main()

    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert out, "outage must still leave evidence on stdout"
    last = json.loads(out[-1])
    assert last["metric"] == "tunnel_down"
