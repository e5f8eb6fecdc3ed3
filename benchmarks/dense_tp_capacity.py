"""Capacity validation for the brick-sharded dense trainer (VERDICT r3 #1):
train a >=320^3 grid — the shape that OOMs a single 16 GB chip under BOTH
Adam and RMSProp (BASELINE.md capacity facts) — on the virtual 8-device
mesh, and report the per-device memory split from XLA's own accounting.

Usage: PALLAS_AXON_POOL_IPS= python benchmarks/dense_tp_capacity.py [res] [dp] [mp]
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from tpu3d.config import DenseConfig, MeshConfig
from tpu3d.dense.grid import create_grid
from tpu3d.dense.train import TrainState, make_optimizer
from tpu3d.dist import make_mesh
from tpu3d.dist.dense_tp import make_tp_dense_step, psum_bytes_per_step


def main(res=320, dp=1, mp=8, steps=3, batch=4096, hier=True):
    rng = np.random.default_rng(0)
    cfg = DenseConfig(grid_resolution=res, batch_size=batch, epochs=1,
                      hierarchical=hier, n_coarse=64, n_fine=64,
                      num_samples=128, near=0.05, far=3.0, scene_scale=1.0,
                      optimizer="adam")
    mesh = make_mesh(MeshConfig(data_parallel=dp, model_parallel=mp))
    opt = make_optimizer(cfg, steps_per_epoch=100)
    grid = create_grid(res, (-1, -1, -1), (1, 1, 1))
    grid_bytes = int(np.prod(grid.grid.shape)) * 4
    step, place = make_tp_dense_step(cfg, opt, mesh, tuple(grid.grid.shape))
    state = TrainState(grid, opt.init(grid.grid), jnp.asarray(0))
    o = rng.uniform(-0.3, 0.3, (batch, 3)).astype(np.float32)
    d = rng.normal(0, 1, (batch, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = rng.uniform(0, 1, (batch, 3)).astype(np.float32)
    state, b = place(state, o, d, rgb)

    # XLA's per-device accounting of the compiled step
    lowered = step.jit_step.lower(state.grid.grid, state.grid.min_bound,
                                  state.grid.max_bound, state.opt_state,
                                  state.step, None, None,
                                  jax.random.PRNGKey(0), *b, None)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    report = {
        "res": res, "mesh": {"data": dp, "model": mp},
        "grid_bytes_total": grid_bytes,
        "grid_bytes_per_device": grid_bytes // mp,
        "psum_bytes_per_step_per_device": psum_bytes_per_step(cfg, mp, dp),
    }
    if mem is not None:
        report.update(
            xla_argument_bytes_per_device=int(mem.argument_size_in_bytes),
            xla_output_bytes_per_device=int(mem.output_size_in_bytes),
            xla_temp_bytes_per_device=int(mem.temp_size_in_bytes),
        )
        # state args per device = grid/mp + 2 adam moments/mp + batch/dp
        expect = 3 * grid_bytes // mp
        report["state_args_vs_one_third_expectation"] = round(
            mem.argument_size_in_bytes / expect, 3)

    losses = []
    t0 = time.time()
    for i in range(steps):
        state, loss = step(state, jax.random.PRNGKey(i), *b)
        losses.append(float(loss))
    report["losses"] = [round(l, 5) for l in losses]
    report["sec_per_step"] = round((time.time() - t0) / steps, 2)
    g = state.grid.grid
    report["grid_shard_shape"] = list(g.sharding.shard_shape(g.shape))
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:4]]
    main(*(a + [320, 1, 8][len(a):]))
