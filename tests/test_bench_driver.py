"""Tests for bench.py's parent capture loop (no TPU, worker stubbed).

The parent's job (VERDICT r02 item 1): keep launching fresh-process
workers until one reports a healthy environment, keep the first valued
result as a fallback, and never hang on a wedged backend.
"""
import importlib.util
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


def run_main(bench, capsys, workers, monkeypatch):
    """Drive main() with a scripted sequence of worker results; returns
    the parsed stdout JSON line and the number of attempts consumed."""
    it = iter(workers)
    calls = []

    def fake_worker(timeout, level=0):
        calls.append(timeout)
        try:
            return next(it)
        except StopIteration:
            pytest.fail("parent launched more workers than scripted")

    monkeypatch.setattr(bench, "_run_worker", fake_worker)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"stdout must be ONE json line, got {out}"
    return json.loads(out[0]), len(calls)


def test_healthy_first_capture_stops(bench, capsys, monkeypatch):
    res = {"value": 100.0, "env_ok": True, "t_pre_s": 1.0,
           "t_elap_ms": 50.0, "pre_elap_ratio": 20.0, "method": "windowed"}
    out, n = run_main(bench, capsys, [dict(res)], monkeypatch)
    assert n == 1
    assert out["value"] == 100.0
    assert out["vs_baseline"] == round(100.0 / bench.BASELINE_GFLOPS, 4)
    assert "annotations" not in out


def test_init_hang_then_healthy(bench, capsys, monkeypatch):
    """A backend-init-hang attempt (no value) is followed by a retry; the
    healthy second capture wins and is annotated as a retry."""
    hang = {"annotations": ["backend-init-hang"]}
    good = {"value": 95.0, "env_ok": True}
    out, n = run_main(bench, capsys, [dict(hang), dict(good)], monkeypatch)
    assert n == 2
    assert out["value"] == 95.0
    assert any(a.startswith("retry:") for a in out["annotations"])


def test_degraded_value_kept_as_fallback(bench, capsys, monkeypatch):
    """env_ok=false captures keep retrying, but if the budget runs out the
    first valued (degraded) result is still reported, not dropped."""
    bad = {"value": 5.0, "env_ok": False,
           "annotations": ["degraded-environment:pre-probe"]}
    t = {"now": 0.0}
    monkeypatch.setattr(bench.time, "time", lambda: t["now"])

    def advance(timeout, level=0):
        t["now"] += 1300.0  # two attempts fit the 2700 s budget
        return dict(bad)

    monkeypatch.setattr(bench, "_run_worker", advance)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 5.0
    assert out["env_ok"] is False


def test_all_attempts_dead_reports_zero(bench, capsys, monkeypatch):
    t = {"now": 0.0}
    monkeypatch.setattr(bench.time, "time", lambda: t["now"])

    def dead(timeout, level=0):
        t["now"] += 1300.0
        return None

    monkeypatch.setattr(bench, "_run_worker", dead)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert "benchmark-failed-twice" in out["annotations"]


def test_post_init_hang_still_gets_a_retry(bench, capsys, monkeypatch):
    """A worker that hangs AFTER backend init (where the init watchdog
    can't see it) is capped at 1800 s, leaving budget for a fresh retry."""
    t = {"now": 0.0}
    monkeypatch.setattr(bench.time, "time", lambda: t["now"])
    calls = []
    good = {"value": 90.0, "env_ok": True}

    def fake(timeout, level=0):
        calls.append(timeout)
        if len(calls) == 1:
            t["now"] += timeout  # hang: consumed the whole attempt budget
            return None
        t["now"] += 400.0
        return dict(good)

    monkeypatch.setattr(bench, "_run_worker", fake)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert calls[0] <= 1800.0
    assert len(calls) == 2
    assert out["value"] == 90.0


def test_oom_attempt_escalates_the_config_ladder(bench, capsys, monkeypatch):
    """An OOM-annotated attempt (worker rc=4 path) must escalate each
    later attempt down the ladder (pinned mc=64 -> ell): after
    RESOURCE_EXHAUSTED the same config in the same footprint would just
    OOM again (docs/measurements.md)."""
    oom0 = {"annotations": ["oom:windowed"], "capture_level": 0}
    good = {"value": 30.8, "env_ok": True, "method": "ell",
            "annotations": ["oom-fallback:ell"], "capture_level": 1}
    it = iter([dict(oom0), dict(good)])
    levels = []

    def fake(timeout, level=0):
        levels.append(level)
        return next(it)

    monkeypatch.setattr(bench, "_run_worker", fake)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert levels == [0, 1]
    assert out["value"] == 30.8
    assert "oom-fallback:ell" in out["annotations"]


def test_later_healthy_beats_earlier_degraded(bench, capsys, monkeypatch):
    degraded = {"value": 5.0, "env_ok": False,
                "annotations": ["degraded-environment:post-probe"]}
    good = {"value": 110.0, "env_ok": True}
    out, n = run_main(bench, capsys, [dict(degraded), dict(good)],
                      monkeypatch)
    assert n == 2
    assert out["value"] == 110.0
    assert out["env_ok"] is True


def test_sigterm_mid_attempt_still_prints_one_line(tmp_path):
    """The one-line contract must hold when the DRIVER kills bench.py
    (VERDICT r03 item 1: rc=124 swallowed even the value-0 fallback).
    Run main() in a real process with a hanging worker, SIGTERM it, and
    require the JSON line on stdout."""
    import os
    import signal
    import subprocess
    import time as _time

    script = tmp_path / "drive.py"
    script.write_text(
        "import sys; sys.path.insert(0, %r)\n"
        "import importlib.util, time\n"
        "spec = importlib.util.spec_from_file_location('bench_mod', %r)\n"
        "mod = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(mod)\n"
        "def w(timeout, level=0):\n"
        "    open(%r, 'w').write('in-attempt')\n"
        "    time.sleep(3600)\n"
        "mod._run_worker = w\n"
        "mod.main()\n" % (os.getcwd(), os.path.abspath("bench.py"),
                           str(tmp_path / "ready")))
    p = subprocess.Popen([sys.executable, str(script)],
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    for _ in range(300):  # wait until it is inside the hanging attempt
        if (tmp_path / "ready").exists():
            break
        _time.sleep(0.1)
    else:
        pytest.fail("driver script never reached the worker attempt")
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=30)
    lines = out.decode().strip().splitlines()
    assert len(lines) == 1, lines
    d = json.loads(lines[0])
    assert d["value"] == 0.0
    assert any("killed-by-signal" in a for a in d["annotations"])


def test_sigterm_salvages_on_disk_result(tmp_path, monkeypatch):
    """A kill mid-attempt after the worker already emitted a valid result
    file must report that value, not 0."""
    import os
    import signal
    import subprocess
    import time as _time

    result = tmp_path / "result.json"
    # the worker writes RESULT *during* the attempt (a pre-existing file
    # from an earlier run is stale and must NOT be salvaged — covered by
    # test_sigterm_mid_attempt_still_prints_one_line's leftover-file
    # immunity via bench.main's mtime guard)
    script = tmp_path / "drive.py"
    script.write_text(
        "import sys; sys.path.insert(0, %r)\n"
        "import importlib.util, time, json\n"
        "spec = importlib.util.spec_from_file_location('bench_mod', %r)\n"
        "mod = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(mod)\n"
        "mod.RESULT = %r\n"
        "def w(timeout, level=0):\n"
        "    json.dump({'value': 88.5, 'env_ok': True}, open(%r, 'w'))\n"
        "    open(%r, 'w').write('in-attempt')\n"
        "    time.sleep(3600)\n"
        "mod._run_worker = w\n"
        "mod.main()\n"
        % (os.getcwd(), os.path.abspath("bench.py"), str(result),
           str(result), str(tmp_path / "ready")))
    p = subprocess.Popen([sys.executable, str(script)],
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    for _ in range(300):
        if (tmp_path / "ready").exists():
            break
        _time.sleep(0.1)
    else:
        pytest.fail("driver script never reached the worker attempt")
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=30)
    d = json.loads(out.decode().strip().splitlines()[-1])
    assert d["value"] == 88.5
