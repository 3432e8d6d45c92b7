"""Watchdog control-flow tests for bench.py (no accelerator, no children).

The watchdog parent is driver-critical: the round's recorded benchmark is
whatever it prints. These tests monkeypatch the child-process boundary and
the accelerator probe to pin the fallback ladder:

  * primary (Pallas) timeout -> one retry -> XLA lut -> CPU fallback,
  * the CPU fallback's provenance note distinguishes a dead tunnel from
    children that failed with the tunnel alive,
  * an explicit --cpu run skips the accelerator attempts entirely and is
    labeled as a user request, not a hardware failure.
"""

import json
import subprocess

import pytest

import bench


class FakeProc:
    def __init__(self, rc=0, stdout="", stderr=""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = stderr


JSON_LINE = json.dumps({"metric": "m", "value": 1.0})


def _parse_args(argv):
    """Run bench's REAL argparse (no workload) so these tests track the
    production defaults; only the watchdog timeout is shortened."""
    return bench.build_parser().parse_args(["--timeout", "1.0", *argv])


def test_success_first_attempt(monkeypatch, capsys):
    calls = []

    def fake_run(argv, **kw):
        calls.append(argv)
        return FakeProc(0, JSON_LINE + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    rc = bench._run_with_watchdog(_parse_args([]))
    assert rc == 0
    assert len(calls) == 1
    assert "--method" in calls[0] and "lut_pallas" in calls[0]
    assert JSON_LINE in capsys.readouterr().out


def test_timeout_retries_primary_then_lut_then_cpu_dead_tunnel(
    monkeypatch, capsys
):
    """Every accelerator child times out and the probe says the tunnel is
    dead after the first timeout: the ladder must go straight to the CPU
    fallback and label the line 'accelerator unreachable'."""
    calls = []

    def fake_run(argv, **kw):
        calls.append(argv)
        if "--cpu" in argv:
            return FakeProc(0, JSON_LINE + "\n")
        raise subprocess.TimeoutExpired(argv, kw.get("timeout", 1.0))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_accelerator_alive", lambda *a, **k: False)
    rc = bench._run_with_watchdog(_parse_args([]))
    assert rc == 0
    # first timeout -> probe dead -> no retry, no lut attempt: next child
    # is already the CPU fallback
    assert len(calls) == 2
    cpu_argv = calls[-1]
    assert "--cpu" in cpu_argv
    note = cpu_argv[cpu_argv.index("--cpu-note") + 1]
    assert "unreachable" in note
    assert "NOT the accelerator metric" in note


def test_children_fail_with_live_tunnel_is_not_dead_hardware(
    monkeypatch, capsys
):
    """Children crash (rc=1) while the tunnel probe succeeds: the CPU
    fallback must say the children failed, NOT that the accelerator was
    unreachable — a code failure must never be recorded as dead hardware."""
    calls = []

    def fake_run(argv, **kw):
        calls.append(argv)
        if "--cpu" in argv:
            return FakeProc(0, JSON_LINE + "\n")
        return FakeProc(1, "", "boom")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_accelerator_alive", lambda *a, **k: True)
    rc = bench._run_with_watchdog(_parse_args([]))
    assert rc == 0
    # lut_pallas x2 (a failure earns one same-method retry — transient
    # tunnel errors like "response body closed" are gone by the next
    # process) -> lut -> cpu
    assert len(calls) == 4
    note = calls[-1][calls[-1].index("--cpu-note") + 1]
    assert "children failed" in note and "tunnel alive" in note
    assert "unreachable" not in note


def test_timeout_retry_then_success(monkeypatch, capsys):
    """A single cold-compile timeout with a live tunnel retries the SAME
    method once (the killed attempt leaves the compile cache warm)."""
    calls = []

    def fake_run(argv, **kw):
        calls.append(argv)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(argv, kw.get("timeout", 1.0))
        return FakeProc(0, JSON_LINE + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_accelerator_alive", lambda *a, **k: True)
    rc = bench._run_with_watchdog(_parse_args([]))
    assert rc == 0
    assert len(calls) == 2
    # the retry replays the primary method, not the lut downgrade
    assert "lut_pallas" in calls[1]


def test_explicit_cpu_skips_accelerator(monkeypatch, capsys):
    calls = []

    def fake_run(argv, **kw):
        calls.append(argv)
        assert "--cpu" in argv  # accelerator children must never spawn
        return FakeProc(0, JSON_LINE + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    ns = _parse_args(["--cpu"])
    rc = bench._run_with_watchdog(ns)
    assert rc == 0
    assert len(calls) == 1
    note = calls[0][calls[0].index("--cpu-note") + 1]
    assert "explicit --cpu" in note
    assert "unreachable" not in note


def test_all_paths_fail_returns_nonzero(monkeypatch, capsys):
    def fake_run(argv, **kw):
        return FakeProc(1, "", "boom")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "_accelerator_alive", lambda *a, **k: True)
    assert bench._run_with_watchdog(_parse_args([])) == 1
