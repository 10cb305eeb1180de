"""Multi-host SPMD, exercised for real: a 2-process local
jax.distributed CPU cluster (the DCN analogue of the reference's
torchrun multi-node wiring, generation/scripts/extract_features_vtp.sh:3-8).
Each process hosts 2 virtual devices; the workers build a global
4-device mesh, ingest per-host ShardedSampler slices, and check a
cross-host psum. See tests/multihost_worker.py for the worker body."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_cluster():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO, env=env,
        )
        for pid in range(2)
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
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST-OK pid={pid} sum=120.0" in out, out
    # SPMD determinism: the DiT step's global loss must agree across
    # both hosts (each printed it from its own process)
    losses = [out.split("dit_loss=")[1].split()[0] for out in outs]
    assert losses[0] == losses[1], losses
