"""bench.py resilience: the driver-facing benchmark must print one valid
JSON line no matter what — normal completion, SIGTERM mid-curve, and wall
deadlines (VERDICT r2 #1: round 2's official artifact was lost to a tunnel
hiccup + driver timeout with nothing emitted).

These run bench.py as a subprocess exactly like the driver does; the
conftest env (JAX_PLATFORMS=cpu) makes the children run on CPU.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
REQUIRED_KEYS = {"metric", "value", "unit", "vs_baseline"}


def _check_line(line: str) -> dict:
    d = json.loads(line)
    assert REQUIRED_KEYS <= set(d), d
    assert d["value"] > 0
    return d


def test_bench_completes_with_valid_json(tmp_path):
    proc = subprocess.run(
        [sys.executable, BENCH, "--config", "tiny", "--platform", "cpu",
         "--no-curve", "--repeats", "1", "--max-steps", "32"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        timeout=600, cwd=str(tmp_path),
    )
    assert proc.returncode == 0
    d = _check_line(proc.stdout.decode().strip().splitlines()[-1])
    assert d["metric"].startswith("selfspec_speedup_vs_ar_tiny")


def test_bench_sigterm_emits_best_so_far():
    """Kill the bench at any moment after the first speculative measurement:
    a valid JSON line must still land on stdout."""
    sidecar = os.path.join(REPO, ".bench_partial_tiny.json")
    try:
        os.remove(sidecar)
    except OSError:
        pass
    proc = subprocess.Popen(
        [sys.executable, BENCH, "--config", "tiny", "--platform", "cpu",
         "--repeats", "1", "--max-steps", "32"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                with open(sidecar) as f:
                    if json.load(f).get("spec_backed"):
                        break
            except (OSError, ValueError):
                pass
            if proc.poll() is not None:
                break  # finished before we could kill it — still must emit
            time.sleep(0.2)
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
        try:
            os.remove(sidecar)
        except OSError:
            pass
    assert proc.returncode == 0
    d = _check_line(out.decode().strip().splitlines()[-1])
    assert d.get("spec_backed") is True
