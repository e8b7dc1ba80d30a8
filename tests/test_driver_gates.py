"""The driver's round gates, under test.

The driver records each round's perf number by running `bench.py` and
parsing the LAST stdout line as JSON, and validates the multi-chip path by
calling `__graft_entry__.dryrun_multichip(n)`. Round 3's official record
was lost to exactly one failure mode: `timeout` SIGTERMed a cold-cache
bench before it had printed anything (`BENCH_r03.json: rc=124,
parsed=null`). bench.py is progressive now; these tests pin the contract
so it cannot silently regress:

  - any SIGTERM — even during startup/compile, before a single
    measurement exists — must still leave a complete, parseable JSON line
    as the stdout tail and exit with code 124;
  - once a provisional line has been emitted, the re-emitted tail must
    carry a real throughput number (value > 0);
  - every stdout line bench ever prints is a complete JSON object (the
    driver tails stdout, so nothing else may be written there);
  - `dryrun_multichip(8)` runs one full sharded CUT train step on the
    virtual 8-device mesh and returns finite losses.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


def _bench_env() -> dict[str, str]:
    """The scrubbed single-CPU-device environment for a bench subprocess
    (mirrors __graft_entry__.dryrun_multichip's re-exec scrub)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON")) or k == "PYTHONSTARTUP":
            env.pop(k, None)
    return env


def _spawn_bench() -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, str(REPO_ROOT / "bench.py")],
        cwd=str(REPO_ROOT), env=_bench_env(),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _assert_json_tail(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert lines, f"bench printed nothing to stdout:\n{stdout!r}"
    for ln in lines:  # the driver tails stdout: every line must be JSON
        json.loads(ln)
    tail = json.loads(lines[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in tail, (key, tail)
    assert tail["unit"] == "images/sec/chip"
    return tail


def _wait_for(stream, predicate, timeout: float, sink: list[str]) -> bool:
    """Read lines off a pipe until predicate(line) or timeout."""
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        line = stream.readline()
        if not line:
            time.sleep(0.05)
            continue
        sink.append(line)
        if predicate(line):
            return True
    return False


def test_bench_sigterm_during_startup_still_emits_json_line():
    """SIGTERM before ANY measurement exists → status-only JSON, rc 124.

    This is the exact BENCH_r03 failure shape: `timeout N python bench.py`
    dying while the step variants compile. The signal handler must leave a
    parseable tail even though no window was ever timed.
    """
    proc = _spawn_bench()
    try:
        seen: list[str] = []
        # first stderr log line = the handler is installed and main() is
        # alive; signal while it is still initializing (no stdout yet)
        assert _wait_for(proc.stderr, lambda ln: "[bench" in ln, 120, seen), (
            f"no bench stderr activity: {seen}")
        proc.send_signal(signal.SIGTERM)
        # generous join: the handler fires when the interpreter next checks
        # signals (a compile in flight must finish its C++ call first)
        stdout, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 124, proc.returncode
    tail = _assert_json_tail(stdout)
    assert tail.get("provisional") is True
    assert "terminated by signal" in tail.get("status", ""), tail


@pytest.mark.slow
def test_bench_sigterm_after_first_window_reemits_measurement():
    """Once the provisional warm-only line exists, a SIGTERM tail must be a
    real measurement (value > 0), not the status-only fallback."""
    proc = _spawn_bench()
    try:
        seen: list[str] = []
        ok = _wait_for(proc.stdout, lambda ln: ln.strip().startswith("{"),
                       900, seen)
        assert ok, f"no provisional stdout line within budget: {seen}"
        proc.send_signal(signal.SIGTERM)
        stdout, _ = proc.communicate(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 124, proc.returncode
    tail = _assert_json_tail("".join(seen) + stdout)
    assert tail["value"] > 0, tail
    assert tail["vs_baseline"] > 0, tail


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    """The driver's multi-chip gate: one full CUT train step (R1 branch,
    identity warmup, EMA, DiffAugment) GSPMD-sharded over the virtual
    8-device mesh, finite losses, step advanced."""
    sys.path.insert(0, str(REPO_ROOT))
    try:
        from __graft_entry__ import dryrun_multichip
    finally:
        sys.path.pop(0)
    dryrun_multichip(8)  # raises on non-finite losses or a failed step
