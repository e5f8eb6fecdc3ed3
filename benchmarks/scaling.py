"""Scaling-efficiency report: sharded dense-training throughput and
observation-sharded BA across device counts.

On a machine without multiple real chips, run with the virtual CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling.py

On a real slice it uses the actual devices. Prints a JSON report with
rays/s per device count and parallel efficiency vs 1 device (the north
star asks for >=70% at N>=2 hosts).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("TPU3D_FORCE_CPU"):  # this image pins jax_platforms=axon
    import jax

    jax.config.update("jax_platforms", "cpu")


def bench_dense(n_devices, steps=20, rays_per_device=2048, res=64):
    import jax
    import jax.numpy as jnp
    import optax

    from tpu3d.config import DenseConfig, MeshConfig
    from tpu3d.dense.grid import create_grid
    from tpu3d.dist import make_mesh, make_sharded_dense_step

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(MeshConfig(data_parallel=n_devices, model_parallel=1), devices)
    nb = rays_per_device * n_devices
    cfg = DenseConfig(grid_resolution=res, num_samples=96, near=1.0, far=5.0,
                      scene_scale=1.0, batch_size=nb)
    vg = create_grid(res, (-1, -1, -1), (1, 1, 1))
    opt = optax.adam(1e-2)
    rng = np.random.default_rng(0)
    o = rng.normal(0, 1, (nb, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    rgb = rng.uniform(0, 1, (nb, 3)).astype(np.float32)
    step, place = make_sharded_dense_step(cfg, opt, mesh)
    ga, os_, batch = place(vg.grid, opt.init(vg.grid),
                           np.asarray(o), np.asarray(d), np.asarray(rgb))
    bounds = jnp.stack([vg.min_bound, vg.max_bound])
    key = jax.random.PRNGKey(0)
    ga, os_, loss = step(ga, bounds, os_, key, *batch)  # compile
    loss.block_until_ready()
    t0 = time.time()
    for i in range(steps):
        ga, os_, loss = step(ga, bounds, os_, jax.random.fold_in(key, i), *batch)
    loss.block_until_ready()
    dt = time.time() - t0
    return nb * steps / dt


def main():
    import jax

    n_avail = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8) if c <= n_avail]
    report = {"platform": jax.default_backend(), "devices_available": n_avail, "dense": {}}
    base = None
    for c in counts:
        rps = bench_dense(c)
        if base is None:
            base = rps
        report["dense"][str(c)] = {
            "rays_per_s": round(rps),
            "speedup": round(rps / base, 2),
            "efficiency": round(rps / (base * c), 3),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
