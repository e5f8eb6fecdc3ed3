"""Sharded training/BA steps: the pjit programs that scale the two
heavyweight workloads across the mesh.

1. Dense training step — rays DP over `data`, grid TP (voxel bricks) over
   `model`: each step's gather reads cross brick borders and the grid
   gradient reduces over the ray shards; XLA's SPMD partitioner inserts the
   halo/psum collectives from the sharding annotations alone (the
   "annotate shardings, let XLA insert collectives" recipe).

2. Global bundle adjustment — observations shard over `data`; every
   segment-sum in ba/lm.py becomes a partial sum + psum, i.e. the
   multi-host camera-reduced Schur system of BASELINE.json's north star.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3d.ba.lm import BAState, bundle_adjust
from tpu3d.config import DenseConfig
from tpu3d.dense.grid import VoxelGrid
from tpu3d.dense.render import render_rays
from tpu3d.dist.mesh import data_sharding, grid_sharding, replicated


def make_sharded_dense_step(cfg: DenseConfig, optimizer: optax.GradientTransformation, mesh: Mesh):
    """Jitted plenoxel train step with explicit input/output shardings.

    Returns (step_fn, place) where place(grid, opt_state, batch) moves the
    pytrees onto the mesh with the right layouts."""
    g_shard = grid_sharding(mesh)
    r_shard = data_sharding(mesh, ndim=2)
    rep = replicated(mesh)

    def loss_fn(grid_arr, bounds, key, ro, rd, rgb):
        vg = VoxelGrid(grid_arr, bounds[0], bounds[1])
        pred = render_rays(
            vg, key, ro, rd, cfg.near, cfg.far, cfg.num_samples, cfg.white_background
        )
        return jnp.mean((pred - rgb) ** 2)

    @functools.partial(
        jax.jit,
        in_shardings=(g_shard, rep, rep, rep, r_shard, r_shard, r_shard),
        out_shardings=(g_shard, rep, rep),
        donate_argnums=(0, 2),
    )
    def step(grid_arr, bounds, opt_state, key, ro, rd, rgb):
        loss, g = jax.value_and_grad(loss_fn)(grid_arr, bounds, key, ro, rd, rgb)
        updates, opt_state = optimizer.update(g, opt_state, grid_arr)
        return optax.apply_updates(grid_arr, updates), opt_state, loss

    def place(grid_arr, opt_state, *batch):
        grid_arr = jax.device_put(grid_arr, g_shard)
        opt_state = jax.device_put(opt_state, rep)
        batch = tuple(jax.device_put(b, r_shard) for b in batch)
        return grid_arr, opt_state, batch

    return step, place


def make_sharded_match_block(mesh: Mesh, focal: float, threshold_px: float,
                             ratio: float, num_hypotheses: int,
                             five_point: bool = False):
    """Candidate-edge matching + E-gating with the PAIR axis sharded over
    `data` (the matching stage is embarrassingly parallel across edges:
    descriptors/keypoints replicate, each device gates its pair shard —
    the multi-chip scale-out of the pipeline's dominant stage). Returns
    run(d, v, kp, ii, jj, keys) -> (B, K*3+14) packed rows."""
    from tpu3d.sfm.pipeline import _match_and_gate_block

    rep = replicated(mesh)
    s1 = data_sharding(mesh, ndim=1)
    s2 = data_sharding(mesh, ndim=2)

    def run(d, v, kp, ii, jj, keys):
        d = jax.device_put(d, rep)
        v = jax.device_put(v, rep)
        kp = jax.device_put(kp, rep)
        ii = jax.device_put(ii, s1)
        jj = jax.device_put(jj, s1)
        keys = jax.device_put(keys, s2)
        return _match_and_gate_block(
            d, v, kp, ii, jj, keys, focal, threshold_px, ratio,
            num_hypotheses, five_point)

    return run


def make_sharded_register_step(mesh: Mesh, focal: float, tri_thr_px: float,
                               num_hypotheses: int):
    """Frontier registration chunk with the IMAGE axis sharded over `data`:
    each device runs the fused PnP-RANSAC + edge-triangulation step
    (engine._register_step_batch) for its image shard. Images inside one
    BFS frontier round are independent — the chunk staleness this
    introduces is what the engine's fixpoint retry loop already absorbs —
    so the per-image hot path scales out with zero collectives."""
    from tpu3d.sfm.engine import _register_step_batch

    def run(keys, Xk, uvk, wk, pnp_thr, cams_i, uv_r, uv_n):
        put = lambda a: jax.device_put(a, data_sharding(mesh, ndim=a.ndim))
        return _register_step_batch(
            put(keys), put(Xk), put(uvk), put(wk), pnp_thr,
            put(cams_i), put(uv_r), put(uv_n), focal, tri_thr_px,
            num_hypotheses)

    return run


def sharded_bundle_adjust(
    mesh: Mesh,
    cams0,
    points0,
    cam_idx,
    pt_idx,
    uv,
    w,
    cam_fixed,
    pt_fixed=None,
    max_iters: int = 20,
    cg_iters: int = 32,
    pt_sorted: bool = False,
) -> BAState:
    """bundle_adjust with the observation axis sharded over `data` and
    camera/point states replicated. The jitted solver is unchanged —
    sharding propagation turns its segment-sums into psum-reduced partials."""
    obs_shard1 = data_sharding(mesh, ndim=1)
    obs_shard2 = data_sharding(mesh, ndim=2)
    rep = replicated(mesh)
    cams0 = jax.device_put(cams0, rep)
    points0 = jax.device_put(points0, rep)
    cam_idx = jax.device_put(cam_idx, obs_shard1)
    pt_idx = jax.device_put(pt_idx, obs_shard1)
    uv = jax.device_put(uv, obs_shard2)
    w = jax.device_put(w, obs_shard1)
    cam_fixed = jax.device_put(cam_fixed, rep)
    if pt_fixed is not None:
        pt_fixed = jax.device_put(pt_fixed, rep)
    return bundle_adjust(
        cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
        max_iters=max_iters, cg_iters=cg_iters, pt_sorted=pt_sorted,
    )
