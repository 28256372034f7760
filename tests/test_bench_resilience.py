"""bench.py must survive a device/tunnel outage with parseable evidence.

Round 3's driver bench died on the first device touch (BENCH_r03.json
rc=1, zero metric lines) when the TPU tunnel went down — a null round
indistinguishable from a broken bench. The probe design (one PATIENT
subprocess polled in slices, sized to the post-process re-init envelope;
kill-and-retry only when the probe CRASHES rather than hangs) is tested
here by faking `subprocess.Popen`: crash-loop, crash-then-recover, and
hang regimes each leave their distinct JSON evidence trail (reference for
the driver contract: bench.py docstring).
"""

import json
import subprocess
import sys


def _load_bench():
    sys.modules.pop("bench", None)
    import bench
    return bench


class _FakeProc:
    """A probe subprocess double: `script` is a list of behaviours, one per
    communicate() call — "hang" raises TimeoutExpired, ("out", rc) returns."""

    def __init__(self, script):
        self.script = list(script)
        self.killed = False
        self.returncode = None

    def communicate(self, timeout=None):
        step = self.script.pop(0) if self.script else "hang"
        if step == "hang":
            raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)
        out, self.returncode = step
        return out, ""

    def kill(self):
        self.killed = True


def _fake_clock(bench, monkeypatch, tick):
    """elapsed() advances `tick` seconds per call; sleep is a no-op."""
    t = {"now": 0.0}

    def elapsed():
        t["now"] += tick
        return t["now"]

    monkeypatch.setattr(bench, "elapsed", elapsed)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    return t


def test_crash_loop_emits_tunnel_down_and_gives_up(monkeypatch, capsys):
    """Every probe attempt crashes → one tunnel_down line per attempt,
    a final tunnel_down(-1), and a None return (bench keeps going)."""
    bench = _load_bench()
    procs = []

    def fake_popen(*a, **k):
        p = _FakeProc([("crash", 1)])
        procs.append(p)
        return p

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    _fake_clock(bench, monkeypatch, tick=120.0)

    rtt = bench.device_up_or_retry(budget=90.0)
    assert rtt is None
    assert len(procs) >= 2, "crashed probe must be retried"

    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert lines, "no diagnostic lines emitted during simulated outage"
    assert all(l["metric"] == "tunnel_down" for l in lines)
    assert lines[0]["value"] == 1.0
    assert lines[-1]["value"] == -1.0


def test_crash_then_recover(monkeypatch, capsys):
    """First probe crashes, second comes up → rtt returned, exactly one
    tunnel_down line, no give-up marker."""
    bench = _load_bench()
    scripts = [[("crash", 1)], [("UP\n", 0)]]

    def fake_popen(*a, **k):
        return _FakeProc(scripts.pop(0))

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setattr(bench, "measure_rtt", lambda: 12.5)
    _fake_clock(bench, monkeypatch, tick=5.0)

    rtt = bench.device_up_or_retry(budget=600.0)
    assert rtt == 12.5
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert [l["metric"] for l in lines] == ["tunnel_down"]
    assert lines[0]["value"] == 1.0


def test_hung_probe_is_not_killed_and_heartbeats(monkeypatch, capsys):
    """A HANGING probe (the post-process re-init regime) is waited on
    patiently — never kill-and-retried — with tunnel_probe_wait heartbeat
    evidence; past patience it is killed and tunnel_down(-1) recorded."""
    bench = _load_bench()
    procs = []

    def fake_popen(*a, **k):
        p = _FakeProc(["hang"] * 1000)
        procs.append(p)
        return p

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    _fake_clock(bench, monkeypatch, tick=30.0)

    rtt = bench.device_up_or_retry(budget=600.0)
    assert rtt is None
    assert len(procs) == 1, "a hung probe must NOT be restarted from scratch"
    assert procs[0].killed

    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    metrics = [l["metric"] for l in lines]
    assert "tunnel_probe_wait" in metrics, "no heartbeat during the stall"
    assert metrics[-1] == "tunnel_down" and lines[-1]["value"] == -1.0
    assert "tunnel_down" not in metrics[:-1], \
        "hang regime must not emit per-attempt tunnel_down lines"


def test_full_mode_outage_exits_zero_with_evidence(monkeypatch, capsys):
    """End-to-end: main() in full mode during an outage prints only
    tunnel_down lines (last line parseable) and returns normally."""
    bench = _load_bench()

    monkeypatch.setattr(bench, "device_up_or_retry", lambda budget: None)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--budget", "60"])

    bench.main()

    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert out, "outage must still leave evidence on stdout"
    last = json.loads(out[-1])
    assert last["metric"] == "tunnel_down"
