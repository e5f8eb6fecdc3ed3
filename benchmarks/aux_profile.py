"""Profile the dense aux-feature slowdown (VERDICT r2 #5): exposure
latents + SH background measured 2.2x slower training (6.5k vs 14.3k
rays/s) — this isolates WHERE the time goes by timing the packed
multi-step dispatch for each aux combination at a realistic shape, plus a
decomposition pass (bg-render-only, exposure-apply-only) that attributes
the gap.

Usage: python benchmarks/aux_profile.py [--cpu] [--res 160] [--steps 16]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def barrier(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda a: (np.asarray(jax.device_get(a.ravel()[:1]))
                   if hasattr(a, "shape") else a), tree)


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = 160
    steps = 16
    for a in sys.argv[1:]:
        if a.startswith("--res="):
            res = int(a.split("=")[1])
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from tpu3d.config import DenseConfig
    from tpu3d.dense.grid import create_grid
    from tpu3d.dense.train import (
        TrainState, init_background, init_exposure, make_multi_step,
        make_train_step, make_train_step_packed,
    )

    on_tpu = jax.default_backend() != "cpu"
    cfg = DenseConfig(grid_resolution=res, near=0.05, far=2.2,
                      scene_scale=1.0, scan_chunk=steps)
    rng = np.random.default_rng(0)
    NB = cfg.batch_size
    NTOT = NB * steps
    o = rng.normal(0, 1, (NTOT, 3)).astype(np.float32)
    o = 1.5 * o / np.linalg.norm(o, axis=1, keepdims=True)
    d = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    rgb = rng.uniform(0, 1, (NTOT, 3)).astype(np.float32)
    cid = rng.integers(0, 200, NTOT).astype(np.int32)
    o_dev, d_dev, rgb_dev, cid_dev = map(jnp.asarray, (o, d, rgb, cid))
    idx = jnp.asarray(np.arange(NTOT).reshape(steps, NB))

    out = {"backend": jax.default_backend(), "res": res, "steps": steps}
    for name, exp_on, bg_on in [("plain", False, False),
                                ("exposure", True, False),
                                ("background", False, True),
                                ("both", True, True)]:
        grid = create_grid(res, (-1, -1, -1), (1, 1, 1))
        opt = optax.adam(1e-2)
        if on_tpu:
            from tpu3d.kernels.trilinear import pack_grid

            garr = pack_grid(grid.grid)
            step_fn = make_train_step_packed(cfg, opt, grid.grid.shape[:3])
        else:
            garr = grid.grid
            step_fn = make_train_step(cfg, opt)
        from tpu3d.dense.grid import VoxelGrid

        state = TrainState(VoxelGrid(garr, grid.min_bound, grid.max_bound),
                           opt.init(garr), jnp.asarray(0),
                           init_exposure(200) if exp_on else None,
                           init_background() if bg_on else None)
        multi = make_multi_step(step_fn, with_occ=True)
        key = jax.random.PRNGKey(0)
        cids = cid_dev if exp_on else None
        state, losses = multi(state, key, np.uint32(0), idx, o_dev, d_dev,
                              rgb_dev, None, cid_all=cids)  # compile+run
        barrier(losses)
        t0 = time.time()
        state, losses = multi(state, key, np.uint32(steps), idx, o_dev,
                              d_dev, rgb_dev, None, cid_all=cids)
        barrier(losses)
        dt = time.time() - t0
        out[name] = {"sec_per_chunk": round(dt, 3),
                     "rays_per_s": int(NTOT / dt)}
        del state
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
