"""Trilinear grid-sample microbenchmark: forward and forward+backward at
dense-training shapes (the dominant cost of the dense stage — the prior
run measured 804 rays/s end-to-end, far below HBM speed-of-light for the
~8 full-grid passes per Adam step).

Usage: python benchmarks/trilinear_bench.py [resolution] [n_points] [--cpu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e HBM peak ~819 GB/s: the trilinear kernels are memory-bound, so the
# speed-of-light metric is achieved bytes/s of the minimum gather/scatter
# traffic, not FLOPs (VERDICT r2 #6).
_V5E_HBM_GBPS = 819.0


def _bar(x):
    """Real barrier: block_until_ready returns EARLY on the axon remote
    backend (BASELINE.md link facts). Fetch ONE element, not the array —
    a full device_get of a GB-scale output measures the tunnel, not the
    kernel (the r3e run's 12 s 'scatter' was mostly download)."""
    import jax

    np.asarray(jax.device_get(x.ravel()[:1]))
    return x


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    res = int(args[0]) if args else 256
    n = int(args[1]) if len(args) > 1 else 2048 * 192

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.dense.grid import VoxelGrid, trilinear_sample

    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.normal(0, 0.1, (res, res, res, 28)).astype(np.float32))
    lo = jnp.asarray([-1.0, -1, -1])
    hi = jnp.asarray([1.0, 1, 1])
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))

    fwd = jax.jit(lambda g, p: trilinear_sample(g, lo, hi, p)[0])

    def loss(g, p):
        return jnp.sum(trilinear_sample(g, lo, hi, p)[0] ** 2)

    fwdbwd = jax.jit(jax.grad(loss))

    out = fwd(grid, pts)
    _bar(out)
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        out = fwd(grid, pts)
    _bar(out)
    t_fwd = (time.time() - t0) / reps

    g = fwdbwd(grid, pts)
    _bar(g)
    t0 = time.time()
    for _ in range(reps):
        g = fwdbwd(grid, pts)
    _bar(g)
    t_bwd = (time.time() - t0) / reps

    bytes_gather = n * 8 * 28 * 4
    print(f"res={res} n={n}")
    print(f"XLA forward      {t_fwd*1000:8.2f} ms  ({bytes_gather/t_fwd/1e9:7.1f} GB/s gather traffic)")
    print(f"XLA fwd+backward {t_bwd*1000:8.2f} ms  "
          f"(equiv batch rate {n/192/t_bwd:8.0f} rays/s at 192 samples)")

    # ---- Pallas packed kernel pair (kernels/trilinear{,_grad}.py) ----
    from tpu3d.kernels.trilinear import CPAD, pack_grid
    from tpu3d.kernels.trilinear_grad import sample_packed_diff, scatter_grad

    interp = jax.default_backend() == "cpu"
    resT = (res, res, res)
    packed = jax.jit(pack_grid)(grid)
    packed.block_until_ready()

    pfwd = jax.jit(lambda p, q: sample_packed_diff(resT, interp, p, lo, hi, q)[0])

    def ploss(p, q):
        return jnp.sum(sample_packed_diff(resT, interp, p, lo, hi, q)[0] ** 2)

    pfwdbwd = jax.jit(jax.grad(ploss))

    o = pfwd(packed, pts)
    _bar(o)
    # spot-check vs XLA forward
    np.testing.assert_allclose(np.asarray(o[:, :28]), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
    t0 = time.time()
    for _ in range(reps):
        o = pfwd(packed, pts)
    _bar(o)
    t_pf = (time.time() - t0) / reps

    gp = pfwdbwd(packed, pts)
    _bar(gp)
    t0 = time.time()
    for _ in range(reps):
        gp = pfwdbwd(packed, pts)
    _bar(gp)
    t_pb = (time.time() - t0) / reps

    # backward alone (scatter kernel + on-device binning)
    ct = jnp.asarray(rng.normal(0, 1, (n, CPAD)).astype(np.float32))
    psc = jax.jit(lambda c, q: scatter_grad(c, lo, hi, resT, q, interp))
    gs = psc(ct, pts)
    _bar(gs)
    t0 = time.time()
    for _ in range(reps):
        gs = psc(ct, pts)
    _bar(gs)
    t_sc = (time.time() - t0) / reps

    print(f"Pallas forward       {t_pf*1000:8.2f} ms  ({t_fwd/t_pf:5.2f}x vs XLA; "
          f"{bytes_gather/t_pf/1e9:6.1f} GB/s = "
          f"{100*bytes_gather/t_pf/1e9/_V5E_HBM_GBPS:4.1f}% of v5e HBM peak)")
    print(f"Pallas fwd+backward  {t_pb*1000:8.2f} ms  ({t_bwd/t_pb:5.2f}x vs XLA; "
          f"equiv {n/192/t_pb:8.0f} rays/s; "
          f"{3*bytes_gather/t_pb/1e9:6.1f} GB/s = "
          f"{100*3*bytes_gather/t_pb/1e9/_V5E_HBM_GBPS:4.1f}% of peak at "
          f"fwd+scatter-read+scatter-write traffic)")
    print(f"Pallas scatter alone {t_sc*1000:8.2f} ms  "
          f"({2*bytes_gather/t_sc/1e9:6.1f} GB/s = "
          f"{100*2*bytes_gather/t_sc/1e9/_V5E_HBM_GBPS:4.1f}% of peak)")


if __name__ == "__main__":
    main()
