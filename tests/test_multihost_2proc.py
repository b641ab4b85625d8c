"""Real 2-process jax.distributed test of the multihost serving protocol.

Spawns two python processes that form a distributed CPU runtime, broadcast a
TickPlan from the leader, and run identical batcher programs (see
tests/multihost_worker.py). Verifies follower state/results match the leader
bit-for-bit. Marked slow: two cold JAX processes + a distributed handshake.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_plan_broadcast(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    # the distributed runtime must not inherit a single-process device pin
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"

    a = np.load(tmp_path / "proc0.npz")
    b = np.load(tmp_path / "proc1.npz")
    assert set(a.files) == set(b.files)
    # the leader emitted at least one request's codes, and every array —
    # device slot state and per-request results — is identical across hosts
    assert any(k.startswith("result_") for k in a.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
