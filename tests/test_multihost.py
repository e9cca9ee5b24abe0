"""Real multi-host execution (VERDICT #5): two localhost jax.distributed
processes (Gloo CPU collectives) build a global mesh and run an sp-sharded
Graph through the Scheduler; each process's local shard must bit-match the
single-process reference. The worker (multihost_worker.py) does the asserts;
this test orchestrates the processes."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).with_name("multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_scheduler_run():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(WORKER), str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=str(WORKER.parent.parent))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" +
                    "\n".join(o or "" for o in outs))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{outs[i][-3000:]}")
    assert any("[0] OK" in o for o in outs)
    assert any("[1] OK" in o for o in outs)


FAILURE_WORKER = Path(__file__).with_name("multihost_failure_worker.py")


def test_peer_death_fails_fast_and_diagnosably():
    """VERDICT r2 #4: one of two jax.distributed processes dies mid-run; the
    survivor must surface a GrError (watchdog collective-timeout escalation
    or a raising collective) well within the test deadline — never hang."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(FAILURE_WORKER), str(i), "2",
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=str(FAILURE_WORKER.parent.parent))
        for i in range(2)
    ]
    outs = ["", ""]
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=180)
            outs[i] = out
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("failure-semantics workers timed out (survivor hung):\n"
                    + "\n".join(outs))
    assert procs[1].returncode == 17, f"victim rc={procs[1].returncode}"
    assert procs[0].returncode == 0, (
        f"survivor rc={procs[0].returncode}:\n{outs[0][-3000:]}")
    assert "GOT-ERROR" in outs[0], outs[0][-3000:]
