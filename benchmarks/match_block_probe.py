"""Per-execute overhead vs match-gate block size on the remote TPU.

The full-290 matching phase gates ~2400 candidate edges in pair_batch-sized
vmapped blocks; tpu_batch_s14 measured ~1.9 s per 32-edge block while the
device compute is ~1 ms — i.e. the phase is pure remote-execute overhead.
This probe times _match_and_gate_block at several block sizes with fresh
inputs per rep (the remote backend memoizes identical-arg executions) plus
a trivial jitted op as the pure-RTT floor.

Usage: python benchmarks/match_block_probe.py [--cpu]
"""
import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sizes", default="16,32,64,128")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.sfm.pipeline import _match_and_gate_block

    K, D = 2048, 128
    N_IMG = 40
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(0, 1, (N_IMG, K, D)).astype(np.float32))
    v = jnp.ones((N_IMG, K), jnp.float32)
    kp = jnp.asarray(rng.uniform(-300, 300, (N_IMG, K, 2)).astype(np.float32))
    focal, thr, ratio, hyp = 1189.0, 1.0, 0.95, 512

    # Pure execute-RTT floor.
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    t0 = time.time()
    reps = 5
    for i in range(reps):
        x = np.asarray(f(jnp.full((8,), float(i), jnp.float32)))
    rtt = (time.time() - t0) / reps
    print(f"trivial execute round trip: {rtt * 1e3:.0f} ms")

    for B in [int(s) for s in args.sizes.split(",")]:
        ii = jnp.asarray(rng.integers(0, N_IMG, B).astype(np.int32))
        jj = jnp.asarray(rng.integers(0, N_IMG, B).astype(np.int32))
        kb = jax.random.split(jax.random.PRNGKey(0), B)
        # Warm up the executable for this B.
        out = np.asarray(_match_and_gate_block(d, v, kp, ii, jj, kb, focal,
                                               thr, ratio, hyp,
                                               five_point=True))
        times = []
        for r in range(args.reps):
            ii = jnp.asarray(rng.integers(0, N_IMG, B).astype(np.int32))
            jj = jnp.asarray(rng.integers(0, N_IMG, B).astype(np.int32))
            kb = jax.random.split(jax.random.PRNGKey(r + 1), B)
            t0 = time.time()
            out = np.asarray(_match_and_gate_block(d, v, kp, ii, jj, kb,
                                                   focal, thr, ratio, hyp,
                                                   five_point=True))
            times.append(time.time() - t0)
        best = min(times)
        print(f"B={B:4d}: best {best:.3f} s  ({B / best:.1f} edges/s, "
              f"{best / B * 1e3:.1f} ms/edge, out {out.nbytes / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
