"""Real 2-process jax.distributed test on CPU.

Round 1 validated multi-chip sharding only on a single-process virtual
mesh; this spawns TWO OS processes that join one jax.distributed process
group (coordinator on localhost), each bringing 2 virtual CPU devices, and
runs (a) a globally-sharded reduction and (b) an observation-sharded BA
step whose Schur reduce spans both processes — the cross-host collective
path SURVEY §2.2 requires, minus the physical second host."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed_cpu():
    port = _free_port()
    workers = []
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            TPU3D_COORDINATOR=f"127.0.0.1:{port}",
            TPU3D_NUM_PROCESSES="2",
            TPU3D_PROCESS_ID=str(pid),
            TPU3D_LOCAL_DEVICES="2",
            JAX_PLATFORMS="cpu",
        )
        # Each worker needs its own XLA_FLAGS (no inherited device count),
        # and must not run the axon sitecustomize hook — its PJRT plugin
        # registration initializes the XLA backend at interpreter start,
        # which forbids jax.distributed.initialize afterwards.
        env["XLA_FLAGS"] = ""
        env.pop("PALLAS_AXON_POOL_IPS", None)
        workers.append(subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "dist_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for w in workers:
        try:
            out, _ = w.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for w2 in workers:
                w2.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {pid} failed:\n{out}"
    ok_lines = [
        [ln for ln in out.splitlines() if ln.startswith("OK ")] for out in outs
    ]
    assert ok_lines[0] and ok_lines[1], f"missing OK lines:\n{outs}"
    # identical checksum/cost on both processes (replicated outputs agree)
    assert ok_lines[0][-1] == ok_lines[1][-1]
    # checksum = sum(0..G*8-1), G = 4 global devices
    checksum = float(ok_lines[0][-1].split()[1])
    g = 4 * 8
    assert checksum == g * (g - 1) / 2
