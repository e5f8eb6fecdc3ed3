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


def bench_ba(n_devices, steps=5, n_cams=64, n_pts=4096, obs_per_device=8192):
    """Observation-sharded global BA (weak scaling over the obs axis)."""
    import jax
    import jax.numpy as jnp

    from tpu3d.config import MeshConfig
    from tpu3d.dist import make_mesh, sharded_bundle_adjust

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(MeshConfig(data_parallel=n_devices, model_parallel=1), devices)
    O = obs_per_device * n_devices
    rng = np.random.default_rng(0)
    cams = np.zeros((n_cams, 6), np.float32)
    cams[:, 5] = 4.0
    cams[:, :3] = rng.normal(0, 0.05, (n_cams, 3))
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    ci = rng.integers(0, n_cams, O).astype(np.int32)
    pi = rng.integers(0, n_pts, O).astype(np.int32)
    from tpu3d.core import lie

    uv = np.zeros((O, 2), np.float32)
    for c in range(n_cams):
        sel = ci == c
        R = lie.so3_exp_np(cams[c, :3])
        X = pts[pi[sel]] @ R.T + cams[c, 3:6]
        uv[sel] = X[:, :2] / X[:, 2:3]
    w = np.ones(O, np.float32)
    cam_fixed = np.zeros(n_cams, np.float32)
    cam_fixed[0] = 1.0
    st = sharded_bundle_adjust(
        mesh, jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci), jnp.asarray(pi),
        jnp.asarray(uv), jnp.asarray(w), jnp.asarray(cam_fixed),
        jnp.asarray(np.zeros(n_pts, np.float32)), max_iters=3, cg_iters=8,
    )
    jax.block_until_ready(st.cams)
    t0 = time.time()
    for _ in range(steps):
        st = sharded_bundle_adjust(
            mesh, jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci), jnp.asarray(pi),
            jnp.asarray(uv), jnp.asarray(w), jnp.asarray(cam_fixed),
            jnp.asarray(np.zeros(n_pts, np.float32)), max_iters=3, cg_iters=8,
        )
        jax.block_until_ready(st.cams)
    dt = time.time() - t0
    return O * steps / dt


def main():
    import jax

    n_avail = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8) if c <= n_avail]
    report = {
        "platform": jax.default_backend(),
        "devices_available": n_avail,
        "note": ("weak scaling: work per device fixed; on a CPU virtual mesh "
                 "all devices share the same host cores, so efficiency there "
                 "validates CORRECTNESS of the sharded programs, not speedup — "
                 "real efficiency must be read on a TPU slice"),
        "dense": {},
        "ba": {},
    }
    base = base_ba = None
    for c in counts:
        rps = bench_dense(c)
        if base is None:
            base = rps
        report["dense"][str(c)] = {
            "rays_per_s": round(rps),
            "speedup": round(rps / base, 2),
            "efficiency": round(rps / (base * c), 3),
        }
        ops = bench_ba(c)
        if base_ba is None:
            base_ba = ops
        report["ba"][str(c)] = {
            "obs_per_s": round(ops),
            "speedup": round(ops / base_ba, 2),
            "efficiency": round(ops / (base_ba * c), 3),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
