"""Batched Amanatides–Woo DDA voxel traversal.

Parity component for the reference's voxel_travesal.py (a torch while-loop
over ragged per-ray step counts). TPU-native form: a `lax.scan` over a
static max step budget with per-ray done-masks — every ray advances in
lockstep, finished rays emit (-1,-1,-1), and the whole batch is one fused
program. Used for occupancy pruning / sparse-grid fusion.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_steps",))
def voxel_traversal(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    min_bound: jnp.ndarray,
    voxel_size: jnp.ndarray | float,
    grid_resolution: Tuple[int, int, int],
    max_steps: int = 256,
) -> jnp.ndarray:
    """Visited voxel indices (N, max_steps, 3); -1 marks unused slots.

    rays_o/rays_d: (N, 3); [t_near, t_far] the traversal interval
    (e.g. from dense.sdf.ray_aabb). Matches voxel_travesal.py:10-68
    semantics (first/last voxel from entry/exit points, per-axis step
    signs, tMax/tDelta advance on the axis with smallest tMax)."""
    res = jnp.asarray(grid_resolution)
    vs = jnp.broadcast_to(jnp.asarray(voxel_size, rays_o.dtype), (3,))
    eps = 1e-6

    p_in = rays_o + (t_near[:, None] + eps) * rays_d
    voxel0 = jnp.clip(jnp.floor((p_in - min_bound) / vs).astype(jnp.int32), 0, res - 1)

    step = jnp.where(rays_d > 0, 1, -1).astype(jnp.int32)
    safe_d = jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
    t_delta = jnp.abs(vs / safe_d)
    # Distance to the next voxel boundary along each axis.
    next_boundary = min_bound + (voxel0 + (step > 0)) * vs
    t_max0 = (next_boundary - rays_o) / safe_d
    t_max0 = jnp.where(jnp.abs(rays_d) < 1e-12, jnp.inf, t_max0)

    def body(carry, _):
        voxel, t_max, t_cur, done = carry
        out_voxel = jnp.where(done[:, None], -1, voxel)
        axis = jnp.argmin(t_max, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_voxel = voxel + onehot * step
        t_exit = jnp.min(t_max, axis=-1)
        new_t_max = t_max + onehot.astype(t_max.dtype) * t_delta
        oob = jnp.any((new_voxel < 0) | (new_voxel >= res), axis=-1)
        new_done = done | oob | (t_exit > t_far)
        return (new_voxel, new_t_max, t_exit, new_done), out_voxel

    done0 = t_far <= t_near
    (_, _, _, _), visited = jax.lax.scan(
        body, (voxel0, t_max0, t_near, done0), None, length=max_steps
    )
    return jnp.swapaxes(visited, 0, 1)  # (N, max_steps, 3)
