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


# ── round-5 driver-capture breadth (VERDICT r4 item 2) ─────────────────────


def _run_full_mode(bench, monkeypatch, *, budget, probe_wait=0.0,
                   phase_cost=60.0, engine_metrics=("ttfc_ms", "rtf_streaming"),
                   engine_dies_after=None):
    """Drive main() in full mode with faked phases on a faked clock.

    Returns (stdout lines, calls dict). Every fake phase advances the fake
    clock by `phase_cost` seconds; the probe advances it by `probe_wait`
    before succeeding."""
    t = {"now": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: t["now"])
    calls = {"tok": [], "engine": False}

    def fake_probe(budget):
        t["now"] += probe_wait
        return 10.0

    def fake_tok(args, backend):
        t["now"] += phase_cost
        metric = "talker_decode_tok_s" + bench._SUFFIX.get(backend, "")
        value = 1500.0 if "int8" in backend else 2000.0
        bench.emit(metric, value, "tok/s", value / 1000.0)
        calls["tok"].append(backend)
        return metric, value

    def fake_engine(args):
        t["now"] += phase_cost
        for i, m in enumerate(engine_metrics):
            if engine_dies_after is not None and i == engine_dies_after:
                raise KeyboardInterrupt  # a driver kill mid-phase
            bench.emit(m, 42.0, "ms", 1.0)
        calls["engine"] = True

    monkeypatch.setattr(bench, "device_up_or_retry", fake_probe)
    monkeypatch.setattr(bench, "bench_tok_s", fake_tok)
    monkeypatch.setattr(bench, "bench_engine", fake_engine)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--budget", str(budget)])
    try:
        bench.main()
    except KeyboardInterrupt:
        pass
    return calls


def test_headline_reemitted_after_every_phase_metric(monkeypatch, capsys):
    """After the headline is measured, every later metric line is followed
    by a headline re-emit — a driver kill landing after ANY metric still
    parses the headline as the last line."""
    bench = _load_bench()
    _run_full_mode(bench, monkeypatch, budget=10_000.0)
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    metrics = [l["metric"] for l in lines]
    head = "talker_decode_tok_s_int8_weights_kv8"
    assert metrics[-1] == head
    first_head = metrics.index(head)
    # breadth: ≥4 distinct metrics in one capture (headline, mixed, engine×2)
    assert len(set(metrics)) >= 4
    for i in range(first_head + 1, len(metrics)):
        if metrics[i] != head:
            assert metrics[i + 1] == head, (
                f"metric {metrics[i]!r} not followed by a headline re-emit")


def test_mid_phase_kill_still_parses_headline(monkeypatch, capsys):
    """A kill mid-engine-phase (after ttfc_ms, before rtf) leaves the
    headline as the last parseable line (round 4 would have left ttfc_ms)."""
    bench = _load_bench()
    _run_full_mode(bench, monkeypatch, budget=10_000.0, engine_dies_after=1)
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    assert lines[-1]["metric"] == "talker_decode_tok_s_int8_weights_kv8"
    assert "ttfc_ms" in [l["metric"] for l in lines]


def test_budget_clock_starts_at_tunnel_up(monkeypatch, capsys):
    """A long tunnel-re-init probe wait must NOT starve the optional
    phases: the budget clock starts when the probe succeeds (round 4's
    ~305 s wait consumed the whole 300 s budget → one-metric capture)."""
    bench = _load_bench()
    calls = _run_full_mode(bench, monkeypatch, budget=450.0,
                           probe_wait=400.0, phase_cost=60.0)
    assert "megagen-mixed-kv8" in calls["tok"], \
        "probe wait was charged against the budget (mixed row skipped)"
    assert calls["engine"], \
        "probe wait was charged against the budget (engine phase skipped)"
