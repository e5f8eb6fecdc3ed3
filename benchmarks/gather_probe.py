"""Probe XLA/TPU gather+scatter throughput across layouts, to pick the
trilinear kernel design (flat row-gather widths, one-hot matmul, bf16).

Run on the real chip: python benchmarks/gather_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=10):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    N = 393216 * 8            # total rows to gather (points x corners)
    results = {}

    for V, C in [(256**3, 28), (256**3, 32), (64**3, 28), (256**3 // 4, 128)]:
        table = jnp.asarray(rng.normal(0, 1, (V, C)).astype(np.float32))
        n = N * 28 // C        # equalize byte volume
        idx = jnp.asarray(rng.integers(0, V, n).astype(np.int32))

        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
        dt = timeit(f, table, idx)
        gbs = n * C * 4 / dt / 1e9
        print(f"take   V={V:9d} C={C:3d} n={n:8d}: {dt*1000:8.2f} ms  {gbs:7.1f} GB/s")

        # scatter-add (the backward pattern)
        upd = jnp.asarray(rng.normal(0, 1, (n, C)).astype(np.float32))
        g = jax.jit(lambda t, i, u: t.at[i].add(u).sum())
        dt = timeit(g, table, idx, upd)
        gbs = n * C * 4 / dt / 1e9
        print(f"scatter V={V:9d} C={C:3d} n={n:8d}: {dt*1000:8.2f} ms  {gbs:7.1f} GB/s")

    # sorted indices (ray-coherent access): does locality help?
    V, C = 256**3, 28
    table = jnp.asarray(rng.normal(0, 1, (V, C)).astype(np.float32))
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, V, N).astype(np.int32)))
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    dt = timeit(f, table, idx_sorted)
    print(f"take sorted C=28: {dt*1000:8.2f} ms  {N*C*4/dt/1e9:7.1f} GB/s")

    # bf16 table
    table16 = table.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    dt = timeit(f, table16, idx)
    print(f"take bf16  C=28: {dt*1000:8.2f} ms  {N*C*2/dt/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
