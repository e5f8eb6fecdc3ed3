"""SDF voxel grid + samplers (the sdf.py half of the reference's dense
stage).

Covers: ray-AABB slab intersection (sdf.py:154-165), jittered stratified
sampling (167-180), NeRF inverse-CDF importance sampling (188-218), the
gradient-magnitude-softmax proposal weights (237-242), SDF spatial
gradients (344-348, here by jax.grad through the trilinear interpolant),
and the SDF+SH grid queries (284-342). Unlike the reference, invalid rays
are masked, never boolean-filtered — shapes stay static under jit — and the
importance samples can actually be *used* (the reference computes then
discards them, sdf.py:248-252; `use_importance` keeps both behaviors
available)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpu3d.dense.grid import VoxelGrid, eval_sh, trilinear_sample


class SDFGrid(NamedTuple):
    grid: jnp.ndarray        # (X, Y, Z, 28): 1 SDF + 27 SH
    min_bound: jnp.ndarray
    max_bound: jnp.ndarray

    def as_voxel_grid(self) -> VoxelGrid:
        return VoxelGrid(self.grid, self.min_bound, self.max_bound)


def grid_bounds_from_cloud(points, max_resolution: int = 250, margin: float = 1.5):
    """Grid bounds = margin x cloud AABB, cubified into equal boxes
    (ref sdf.py:94-108). Returns (min_bound, max_bound, resolution xyz)."""
    import numpy as np

    mn = np.min(points, axis=0) * margin
    mx = np.max(points, axis=0) * margin
    size = mx - mn
    box = np.max(size) / max_resolution
    res = np.maximum(np.ceil(size / box).astype(int), 2)
    mx = mn + res * box
    return mn.astype(np.float32), mx.astype(np.float32), tuple(int(r) for r in res)


def ray_aabb(rays_o: jnp.ndarray, rays_d: jnp.ndarray, min_bound, max_bound) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab test (ref sdf.py:154-165). Returns (t_near, t_far, valid)."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    t0 = (min_bound - rays_o) * inv_d
    t1 = (max_bound - rays_o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    valid = t_far > t_near
    return t_near, t_far, valid


def sample_stratified(key: jax.Array, t_near: jnp.ndarray, t_far: jnp.ndarray, n: int, perturb: bool = True,
                      u: jnp.ndarray = None) -> jnp.ndarray:
    """Jittered uniform depths (N, n) (ref sdf.py:167-180 /
    plenoxel.py:73-79). u: optional pre-drawn (N, n) uniforms replacing the
    key draw — the sharded trainer keys them per-RAY so sampling is
    invariant to how rays shard over the mesh (dist/dense_tp.py)."""
    t = jnp.linspace(0.0, 1.0, n)
    z = t_near[:, None] * (1 - t)[None, :] + t_far[:, None] * t[None, :]
    if perturb:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mids], axis=-1)
        if u is None:
            u = jax.random.uniform(key, z.shape, z.dtype)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(key: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int, det: bool = False,
               u: jnp.ndarray = None) -> jnp.ndarray:
    """Inverse-CDF importance sampling (NeRF hierarchical sampling; ref
    sdf.py:188-218). bins: (N, B) depths, weights: (N, B). u: optional
    pre-drawn (N, n_samples) uniforms (see sample_stratified)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)      # (N, B+1)
    bins_pad = jnp.concatenate([bins[..., :1], bins], -1)               # (N, B+1)

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples), (*cdf.shape[:-1], n_samples))
    elif u is None:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), cdf.dtype)

    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(idx - 1, 0)
    above = jnp.minimum(idx, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bin_b = jnp.take_along_axis(bins_pad, below, -1)
    bin_a = jnp.take_along_axis(bins_pad, above, -1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bin_b + t * (bin_a - bin_b)


def get_sdf(sg: SDFGrid, pts: jnp.ndarray) -> jnp.ndarray:
    vals, _ = trilinear_sample(sg.grid[..., :1], sg.min_bound, sg.max_bound, pts)
    return vals[:, 0]


def get_sdf_gradient(sg: SDFGrid, pts: jnp.ndarray) -> jnp.ndarray:
    """Spatial gradient of the interpolated SDF (ref sdf.py:344-348 uses
    torch autograd; here jax.grad through the trilinear lerp — exact and
    batched)."""
    g = jax.grad(lambda p: get_sdf(sg, p[None])[0])
    return jax.vmap(g)(pts)


def gradient_softmax_weights(sg: SDFGrid, pts: jnp.ndarray) -> jnp.ndarray:
    """Proposal weights = softmax over |∇sdf| along each ray
    (ref sdf.py:237-242). pts: (N, S, 3) -> (N, S)."""
    flat = pts.reshape(-1, 3)
    gm = jnp.linalg.norm(get_sdf_gradient(sg, flat), axis=-1)
    return jax.nn.softmax(gm.reshape(pts.shape[:-1]), axis=-1)


def query_sdf_sh(sg: SDFGrid, pts: jnp.ndarray, dirs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma, rgb) for the SDF grid: density = relu(sdf channel)
    (ref sdf.py:376-377), color = SH(channels 1:28) (ref sdf.py:398)."""
    vals, in_bounds = trilinear_sample(sg.grid, sg.min_bound, sg.max_bound, pts)
    sigma = jax.nn.relu(vals[:, 0]) * in_bounds
    k = vals[:, 1:].reshape(*vals.shape[:-1], 3, 9)
    rgb = eval_sh(k, dirs) * in_bounds[:, None]
    return sigma, rgb
