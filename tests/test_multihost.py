"""Real multi-process distributed execution: 2 jax.distributed processes
over loopback, 2 virtual CPU devices each (4 global), per-host ingest +
globally sharded GROUP BY.

The reference never crossed a process boundary (SURVEY.md §3.4); this
exercises the pod-style path end-to-end on a dev machine.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from warpdb_tpu.parallel.multihost import plan_global_layout


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_group():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "OK" in out


def test_plan_global_layout_contiguous_prefix():
    # Single-process: stride == pad, host 0 owns everything.
    pad, per = plan_global_layout(5000)
    assert pad % per == 0
    assert per == pad  # one process in this test env
    assert pad >= 5000


def test_collective_model_wire_xcheck():
    """The analytic collective byte model survives a real-wire check
    (VERDICT r4 #8): a bare all_to_all's measured loopback bytes land
    within transport-framing range of the modeled cross-process volume
    (gloo + gRPC add ~1.5x; see scripts/collective_xcheck.py and
    DESIGN.md §6 for the full-pipeline decomposition)."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "scripts", "collective_xcheck.py")
    proc = subprocess.run(
        [sys.executable, script, "--rows", str(1 << 18), "--reps", "5"],
        capture_output=True, text=True, timeout=420, cwd=root,
    )
    assert proc.returncode == 0, proc.stdout[-3000:]
    out = None
    for line in proc.stdout.splitlines():
        try:
            out = json.loads(line)
        except ValueError:
            continue
    assert out is not None, proc.stdout[-2000:]
    ratio = out["pure_a2a_wire_vs_model"]
    # Below 0.9 the model overcounts; above 4 it undercounts badly even
    # allowing for transport framing.
    assert 0.9 <= ratio <= 4.0, out
