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
import threading
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


class _BenchProc:
    """bench.py child with both pipes drained by reader threads, so a
    chatty cold compile can never block the child on a full pipe buffer
    and waits enforce their deadline even when no line ever arrives."""

    def __init__(self) -> None:
        self.proc = subprocess.Popen(
            [sys.executable, str(REPO_ROOT / "bench.py")],
            cwd=str(REPO_ROOT), env=_bench_env(),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        self.stdout_lines: list[str] = []
        self.stderr_lines: list[str] = []
        self._threads = [
            threading.Thread(target=self._drain, args=(self.proc.stdout,
                                                       self.stdout_lines),
                             daemon=True),
            threading.Thread(target=self._drain, args=(self.proc.stderr,
                                                       self.stderr_lines),
                             daemon=True),
        ]
        for t in self._threads:
            t.start()

    @staticmethod
    def _drain(stream, sink: list[str]) -> None:
        for line in stream:  # list.append is atomic under the GIL
            sink.append(line)

    def wait_for(self, sink: list[str], predicate, timeout: float) -> bool:
        """Poll sink until some line satisfies predicate or deadline."""
        deadline = time.monotonic() + timeout
        scanned = 0
        while time.monotonic() < deadline:
            lines = sink[scanned:]
            scanned += len(lines)
            if any(predicate(ln) for ln in lines):
                return True
            if self.proc.poll() is not None and scanned == len(sink):
                # Child exited — but the drain threads may still hold
                # buffered pipe content (they append only when scheduled),
                # so join them to EOF and re-scan once before concluding
                # the line never arrived.
                for t in self._threads:
                    t.join(timeout=min(10.0, max(0.1,
                                                 deadline - time.monotonic())))
                lines = sink[scanned:]
                scanned += len(lines)
                return any(predicate(ln) for ln in lines)
            time.sleep(0.05)
        return False

    def finish(self, timeout: float) -> str:
        """Wait for exit, join readers, return full stdout."""
        try:
            self.proc.wait(timeout=timeout)
        finally:
            if self.proc.poll() is None:
                self.proc.kill()
                self.proc.wait()
        for t in self._threads:
            t.join(timeout=10)
        return "".join(self.stdout_lines)


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


def test_bench_sigterm_during_startup_still_emits_json_line():
    """SIGTERM before ANY measurement exists → status-only JSON, rc 124.

    This is the exact BENCH_r03 failure shape: `timeout N python bench.py`
    dying while the step variants compile. The signal handler must leave a
    parseable tail even though no window was ever timed.
    """
    bench = _BenchProc()
    try:
        # first stderr log line = the handler is installed and main() is
        # alive; signal while it is still initializing (no stdout yet)
        assert bench.wait_for(bench.stderr_lines, lambda ln: "[bench" in ln,
                              120), (
            f"no bench stderr activity: {bench.stderr_lines}")
        bench.proc.send_signal(signal.SIGTERM)
        # generous join: the handler fires when the interpreter next checks
        # signals (a compile in flight must finish its C++ call first)
        stdout = bench.finish(timeout=600)
    finally:
        if bench.proc.poll() is None:
            bench.proc.kill()
            bench.proc.wait()
    assert bench.proc.returncode == 124, bench.proc.returncode
    tail = _assert_json_tail(stdout)
    assert tail.get("provisional") is True
    assert "terminated by signal" in tail.get("status", ""), tail


@pytest.mark.slow
def test_bench_sigterm_after_first_window_reemits_measurement():
    """Once the provisional warm-only line exists, a SIGTERM tail must be a
    real measurement (value > 0), not the status-only fallback."""
    bench = _BenchProc()
    try:
        ok = bench.wait_for(bench.stdout_lines,
                            lambda ln: ln.strip().startswith("{"), 900)
        assert ok, f"no provisional stdout line within budget: " \
                   f"{bench.stderr_lines[-20:]}"
        bench.proc.send_signal(signal.SIGTERM)
        stdout = bench.finish(timeout=600)
    finally:
        if bench.proc.poll() is None:
            bench.proc.kill()
            bench.proc.wait()
    assert bench.proc.returncode == 124, bench.proc.returncode
    tail = _assert_json_tail(stdout)
    assert tail["value"] > 0, tail
    assert tail["vs_baseline"] > 0, tail


def test_bench_signal_handler_seals_torn_stdout_line():
    """The handler may interrupt _emit between print()'s text and newline
    writes; the re-emitted line must seal the torn partial line so the
    driver's tail json.loads still succeeds."""
    code = (
        "import sys, os; sys.path.insert(0, %r)\n"
        "import bench\n"
        "bench._LAST_LINE = '{\"metric\": \"m\", \"value\": 1.0, "
        "\"unit\": \"images/sec/chip\", \"vs_baseline\": 1.0}'\n"
        "os.write(1, b'{\"torn\": ')  # a write interrupted mid-line\n"
        "bench._on_signal(15, None)\n" % str(REPO_ROOT)
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=str(REPO_ROOT),
                          env=_bench_env(), capture_output=True, text=True,
                          timeout=120)
    assert proc.returncode == 124, (proc.returncode, proc.stderr)
    lines = proc.stdout.splitlines()
    assert lines[-1] == (
        '{"metric": "m", "value": 1.0, "unit": "images/sec/chip", '
        '"vs_baseline": 1.0}')
    tail = json.loads(lines[-1])
    assert tail["value"] == 1.0
    # the torn fragment was sealed onto its own line, not merged
    assert lines[0] == '{"torn": '


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


def test_warm_compile_parallel_surfaces_every_error():
    """bench.py relies on warm_compile(parallel=True); when variants fail,
    EVERY failure must be reported, not an arbitrary
    thread-completion-ordered first one (self-review r4)."""
    from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

    class Boom(CUTTrainer):
        def __init__(self):  # noqa: D401 - skip heavy init; only _jit_step used
            pass

        def _jit_step(self, state, p, m, do_r1, do_identity):
            raise ValueError(f"boom r1={do_r1} idt={do_identity}")

    t = Boom()
    with pytest.raises(RuntimeError) as ei:
        t.warm_compile(None, None, None, parallel=True)
    msg = str(ei.value)
    assert msg.count("failed with ValueError") == 4, msg
    assert ei.value.__cause__ is not None

    # single failure keeps its original exception type
    with pytest.raises(ValueError, match="boom r1=True idt=True"):
        t.warm_compile(None, None, None, variants=[(True, True)],
                       parallel=True)
