"""Second-round gather probe: materialized outputs, decomposed trilinear.

Hypotheses for trilinear_sample's 2.3 GB/s:
  H1 trailing-28 outputs are lane-padded to 128 (4.5x waste + strided)
  H2 the (N, 8, C) reshape/slice layout is pathological
  H3 the gather itself is fine; the lerp chain isn't fused
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

    rng = np.random.default_rng(0)
    V = 256 ** 3
    Npt = 393216

    # 1. materialized take, C=28 vs C=128-packed
    for C, n in [(28, Npt * 8), (128, Npt * 2)]:
        table = jnp.asarray(rng.normal(0, 1, (V * 28 // C, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, table.shape[0], n).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, table, idx)
        print(f"take materialized C={C:3d} n={n}: {dt*1000:8.2f} ms  "
              f"{n*C*4/dt/1e9:7.1f} GB/s")

    # 2. gather exactly as trilinear does (N, 8) idx -> (N, 8, C) -> lerp
    from tpu3d.dense.grid import trilinear_sample

    grid = jnp.asarray(rng.normal(0, 1, (256, 256, 256, 28)).astype(np.float32))
    lo = jnp.asarray([-1.0, -1, -1]); hi = jnp.asarray([1.0, 1, 1])
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (Npt, 3)).astype(np.float32))

    f2 = jax.jit(lambda g, p: trilinear_sample(g, lo, hi, p)[0])
    dt = timeit(f2, grid, pts)
    print(f"trilinear fwd: {dt*1000:8.2f} ms  ({Npt*8*28*4/dt/1e9:.1f} GB/s useful)")

    # 3. gather-only with trilinear's index construction (sum-reduced)
    def gather_only(g, p):
        X, Y, Z = 256, 256, 256
        res = jnp.asarray([256, 256, 256], p.dtype)
        u = (p - lo) / (hi - lo)
        v = u * (res - 1.0)
        i0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, 254)
        base = (i0[:, 0] * Y + i0[:, 1]) * Z + i0[:, 2]
        offs = jnp.asarray([0, 1, Z, Z + 1, Y * Z, Y * Z + 1, Y * Z + Z, Y * Z + Z + 1], jnp.int32)
        idx = (base[:, None] + offs[None, :]).reshape(-1)
        flat = g.reshape(-1, 28)
        return jnp.take(flat, idx, axis=0).sum()

    dt = timeit(jax.jit(gather_only), grid, pts)
    print(f"gather-only(sum): {dt*1000:8.2f} ms  ({Npt*8*28*4/dt/1e9:.1f} GB/s)")

    # 4. materialized gather with trilinear's indices
    def gather_mat(g, p):
        res = jnp.asarray([256, 256, 256], p.dtype)
        u = (p - lo) / (hi - lo)
        v = u * (res - 1.0)
        i0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, 254)
        base = (i0[:, 0] * 256 + i0[:, 1]) * 256 + i0[:, 2]
        offs = jnp.asarray([0, 1, 256, 257, 65536, 65537, 65792, 65793], jnp.int32)
        idx = (base[:, None] + offs[None, :]).reshape(-1)
        return jnp.take(g.reshape(-1, 28), idx, axis=0)

    dt = timeit(jax.jit(gather_mat), grid, pts)
    print(f"gather materialized: {dt*1000:8.2f} ms  ({Npt*8*28*4/dt/1e9:.1f} GB/s)")

    # 5. real scatter (force materialization of the updated table)
    n = Npt * 8
    table = jnp.asarray(rng.normal(0, 1, (V, 28)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, n).astype(np.int32))
    upd = jnp.asarray(rng.normal(0, 1, (n, 28)).astype(np.float32))
    g = jax.jit(lambda t, i, u: t.at[i].add(u))
    dt = timeit(g, table, idx, upd)
    print(f"scatter materialized: {dt*1000:8.2f} ms  "
          f"({(n*28*4*2 + V*28*4*0)/dt/1e9:.1f} GB/s update traffic)")


if __name__ == "__main__":
    main()
