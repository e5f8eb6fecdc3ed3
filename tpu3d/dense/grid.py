"""Dense voxel radiance grid (Plenoxels-style) in JAX.

Replaces the reference's NerfModel (plenoxel.py:19-43): a dense voxel grid
with 1 density + 27 SH channels, queried by trilinear interpolation. Design
differences for TPU:

  - channels-LAST layout (X, Y, Z, 28): the channel axis is the fastest
    varying one, so the 8-corner gather pulls contiguous 28-vectors and the
    SH evaluation below is a (N, 9) x (9,) contraction per color — vector
    lane friendly;
  - trilinear sampling is written as 8 explicit gathers + lerp (not a
    grid_sample emulation) so jax.grad produces exactly the 8-way
    scatter-add the backward pass needs;
  - the grid tensor is a plain array in a pytree — `pjit` shards it along
    the leading (X) axis into voxel bricks across the `model` mesh axis
    (dist/sharding.py).

SH evaluation matches the reference's real-SH degree-2 basis
(plenoxel.py:9-16, sdf.py:361-369; constants from google/spherical-harmonics).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VoxelGrid(NamedTuple):
    grid: jnp.ndarray        # (X, Y, Z, C) with C = 1 + 27
    min_bound: jnp.ndarray   # (3,)
    max_bound: jnp.ndarray   # (3,)

    @property
    def resolution(self) -> Tuple[int, int, int]:
        return self.grid.shape[:3]


def create_grid(resolution, min_bound, max_bound, channels: int = 28, init: float = 0.01, dtype=jnp.float32) -> VoxelGrid:
    """Uniform init 1/100 like the reference (plenoxel.py:27, sdf.py:278)."""
    if isinstance(resolution, int):
        resolution = (resolution, resolution, resolution)
    g = jnp.full((*resolution, channels), init, dtype)
    return VoxelGrid(g, jnp.asarray(min_bound, dtype), jnp.asarray(max_bound, dtype))


def resample_grid(g: jnp.ndarray, new_res) -> jnp.ndarray:
    """Align-corners trilinear resample of a (X, Y, Z, C) grid to new_res.

    Matches the sampler's node convention (v = u * (res - 1)): grid node i
    of the new grid lands exactly at i * (old - 1) / (new - 1) of the old —
    so upsampling a trained coarse grid preserves every value the renderer
    would have interpolated at the coarse nodes (Plenoxels-style
    coarse-to-fine growing)."""
    def axis_interp(a, axis, n_new):
        n_old = a.shape[axis]
        if n_new == n_old:
            return a
        pos = jnp.linspace(0.0, n_old - 1.0, n_new)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_old - 2)
        f = pos - i0
        a0 = jnp.take(a, i0, axis=axis)
        a1 = jnp.take(a, i0 + 1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = n_new
        f = f.reshape(shape)
        return a0 * (1.0 - f) + a1 * f

    for ax, n in enumerate(tuple(new_res)):
        g = axis_interp(g, ax, int(n))
    return g


def _corner_setup(grid_shape, min_bound, max_bound, pts):
    res = jnp.asarray(grid_shape, pts.dtype)
    u = (pts - min_bound) / (max_bound - min_bound)  # [0, 1] inside
    in_bounds = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
    v = u * (res - 1.0)
    i0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, jnp.asarray(grid_shape) - 2)
    # frac relative to the CLIPPED base so the upper boundary (v = res-1)
    # interpolates with frac=1 instead of re-reading node res-2.
    frac = v - i0.astype(v.dtype)
    return i0, frac, in_bounds


def _lerp8(c, fx, fy, fz):
    """c: tuple of 8 corner values in zyx bit order (c000..c111)."""
    c000, c001, c010, c011, c100, c101, c110, c111 = c
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def trilinear_sample(grid: jnp.ndarray, min_bound: jnp.ndarray, max_bound: jnp.ndarray, pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinearly interpolate (N, 3) world points into an (X, Y, Z, C)
    grid with align_corners=True semantics (ref grid_sample call,
    plenoxel.py:39). Returns (values (N, C), in_bounds (N,)).

    The 8 corner reads go through ONE flat row-gather on a (X·Y·Z, C)
    view (the embedding-lookup pattern XLA lowers well on TPU) instead of
    8 multi-dimensional advanced-indexing gathers; the backward pass
    correspondingly becomes one row scatter-add."""
    X, Y, Z = grid.shape[:3]
    i0, frac, in_bounds = _corner_setup(grid.shape[:3], min_bound, max_bound, pts)
    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]

    flat = grid.reshape(X * Y * Z, grid.shape[3])
    base = (x0 * Y + y0) * Z + z0                      # (N,)
    # zyx bit order: offsets for c000, c001, c010, c011, c100, ...
    offs = jnp.asarray([0, 1, Z, Z + 1, Y * Z, Y * Z + 1, Y * Z + Z, Y * Z + Z + 1], jnp.int32)
    idx = base[:, None] + offs[None, :]                # (N, 8)
    vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, grid.shape[3])
    out = _lerp8(tuple(vals[:, k] for k in range(8)), fx, fy, fz)
    return out * in_bounds[:, None], in_bounds


# Real SH degree-2 constants (google/spherical-harmonics; ref plenoxel.py:13-16).
_C0 = 0.282095
_C1 = 0.488603
_C2 = (1.092548, 1.092548, 0.315392, 1.092548, 0.546274)


def eval_sh(k: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Evaluate degree-2 real spherical harmonics.

    k: (..., 3, 9) per-channel coefficients, d: (..., 3) unit directions.
    Returns (..., 3) colors. Sign pattern matches the reference exactly
    (plenoxel.py:12-16)."""
    x, y, z = d[..., 0:1], d[..., 1:2], d[..., 2:3]
    return (
        _C0 * k[..., 0]
        - _C1 * y * k[..., 1]
        + _C1 * z * k[..., 2]
        - _C1 * x * k[..., 3]
        + _C2[0] * x * y * k[..., 4]
        - _C2[1] * y * z * k[..., 5]
        + _C2[2] * (2.0 * z * z - x * x - y * y) * k[..., 6]
        - _C2[3] * x * z * k[..., 7]
        + _C2[4] * (x * x - y * y) * k[..., 8]
    )


def query(vg: VoxelGrid, pts: jnp.ndarray, dirs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma (N,), rgb (N, 3)) at world points with view directions.
    Density = relu(channel 0) (ref plenoxel.py:42 / sdf.py:376)."""
    vals, in_bounds = trilinear_sample(vg.grid, vg.min_bound, vg.max_bound, pts)
    sigma = jax.nn.relu(vals[:, 0]) * in_bounds
    k = vals[:, 1:].reshape(*vals.shape[:-1], 3, 9)
    rgb = eval_sh(k, dirs) * in_bounds[:, None]
    return sigma, rgb
