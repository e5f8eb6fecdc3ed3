"""Occupancy-pruned ray marching.

The reference hints at this capability twice without shipping it: it
declares `nerfacc` (occupancy-grid-accelerated marching) as a dependency
that is never imported (requirement.txt:8), and carries an unused batched
Amanatides-Woo traversal (voxel_travesal.py:1-73) presumably intended for
the same purpose. Here it is a first-class component, designed for TPU
static shapes:

  * `occupancy_from_grid` max-pools the density channel of the dense
    voxel grid into a coarse (R/f)^3 cell grid and thresholds it — a pure
    reshape+max, no gather.
  * `tighten_bands` probes each ray's [t_near, t_far] band at `n_probes`
    uniform depths with nearest-cell occupancy lookups (one small flat
    gather — the coarse grid is ~1 MB, latency- not bandwidth-bound) and
    shrinks the band to the first..last occupied probe. Rays that hit
    nothing keep a degenerate band and composite to pure background.

Downstream sampling then spends its FULL static sample budget inside the
occupied sub-band: the speed/quality win is concentration, not dynamic
sample counts (which would break XLA's static shapes). Against the same
sample budget this is equivalent to marching only occupied space with a
proportionally finer step, which is exactly what nerfacc-style occupancy
skipping buys the reference's intended design.

Training uses a conservative schedule: occupancy starts all-ones (no
pruning) and is refreshed from the current density every
`DenseConfig.occupancy_every` epochs with a dilation step, so empty-space
classification can never freeze out regions the model still wants to
densify (the classic chicken-and-egg of occupancy-accelerated training).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def occupancy_from_grid(
    grid: jnp.ndarray,
    factor: int = 4,
    threshold: float = 0.5,
    dilate: bool = True,
) -> jnp.ndarray:
    """Coarse boolean occupancy from a dense (X, Y, Z, C) voxel grid.

    Cell (i,j,k) is occupied iff any voxel of its factor^3 block has
    density relu(ch0) > threshold. A one-cell 6-neighborhood dilation
    keeps the subsequent band-tightening conservative at cell borders
    (trilinear reads straddle cells).
    """
    return _occupancy_from_density(grid[..., 0], factor, threshold, dilate)


def occupancy_from_packed(
    packed: jnp.ndarray,
    shape,
    factor: int = 4,
    threshold: float = 0.5,
    dilate: bool = True,
) -> jnp.ndarray:
    """occupancy_from_grid for a pack_grid()-packed (X, Y, Zr+1, 2, 128)
    array — slices the density channel without materializing the unpacked
    28-channel grid (2 GB at 256^3)."""
    X, Y, Z, _ = shape
    zr1 = packed.shape[2]
    # (2, 128) lanes = (8 z-cells, 32 channels) folded; channel 0 = density.
    dens = packed.reshape(X, Y, zr1, 8, 32)[..., 0].reshape(X, Y, zr1 * 8)[:, :, :Z]
    return _occupancy_from_density(dens, factor, threshold, dilate)


def _occupancy_from_density(dens: jnp.ndarray, factor: int, threshold: float,
                            dilate: bool) -> jnp.ndarray:
    X, Y, Z = dens.shape
    f = factor
    px, py, pz = (-X) % f, (-Y) % f, (-Z) % f
    dens = jax.nn.relu(dens)
    dens = jnp.pad(dens, ((0, px), (0, py), (0, pz)))
    Xc, Yc, Zc = (X + px) // f, (Y + py) // f, (Z + pz) // f
    blocks = dens.reshape(Xc, f, Yc, f, Zc, f)
    occ = blocks.max(axis=(1, 3, 5)) > threshold
    if dilate:
        o = occ
        occ = (
            o
            | jnp.roll(o, 1, 0) | jnp.roll(o, -1, 0)
            | jnp.roll(o, 1, 1) | jnp.roll(o, -1, 1)
            | jnp.roll(o, 1, 2) | jnp.roll(o, -1, 2)
        )
    return occ


def probe_occupancy(
    occ: jnp.ndarray,
    min_bound: jnp.ndarray,
    max_bound: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    n_probes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-cell occupancy at `n_probes` uniform depths per ray.
    Returns (ts (N, P) probe depths, o (N, P) bool occupancy)."""
    n = rays_o.shape[0]
    Xc, Yc, Zc = occ.shape
    res = jnp.asarray([Xc, Yc, Zc], jnp.float32)
    step = (t_far - t_near) / (n_probes - 1)
    ts = t_near[:, None] + step[:, None] * jnp.arange(n_probes, dtype=jnp.float32)[None, :]
    pts = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    u = (pts - min_bound) / (max_bound - min_bound)
    idx = jnp.clip((u * res).astype(jnp.int32), 0, jnp.asarray([Xc - 1, Yc - 1, Zc - 1]))
    inb = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    flat = (idx[..., 0] * Yc + idx[..., 1]) * Zc + idx[..., 2]
    o = jnp.take(occ.reshape(-1), flat.reshape(-1)).reshape(n, n_probes) & inb
    return ts, o


def sample_occupied(
    key,
    occ: jnp.ndarray,
    min_bound: jnp.ndarray,
    max_bound: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    n_probes: int,
    n_samples: int,
    perturb: bool = True,
    empty_weight: float = 1e-2,
) -> jnp.ndarray:
    """Depth sampling concentrated on OCCUPIED space: inverse-CDF over the
    per-probe occupancy indicator (reusing the NeRF sample_pdf machinery).

    Strictly stronger than band tightening: samples skip interior empty
    gaps, not just empty margins — the static-shape equivalent of
    nerfacc's occupancy-grid ray marching (march only occupied segments),
    with the fixed sample budget redistributed instead of shortened.
    `empty_weight` keeps a trickle of samples in empty space so training
    can re-densify regions the occupancy classified out (the grid is
    refreshed from live density; a hard zero would freeze empty-space
    decisions permanently). Rays with no occupied probe degrade to
    uniform sampling — identical in expectation to the un-pruned path.
    Returns sorted (N, n_samples) depths.
    """
    from tpu3d.dense.sdf import sample_pdf

    ts, o = probe_occupancy(occ, min_bound, max_bound, rays_o, rays_d,
                            t_near, t_far, n_probes)
    w = o.astype(jnp.float32) + empty_weight
    z = sample_pdf(key, ts, w, n_samples, det=not perturb)
    return jnp.sort(z, axis=-1)


def tighten_bands(
    occ: jnp.ndarray,
    min_bound: jnp.ndarray,
    max_bound: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    n_probes: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shrink per-ray [t_near, t_far] to the occupied sub-band.

    Probes `n_probes` uniform depths per ray, looks up nearest-cell
    occupancy, and returns (t_near', t_far', hit). The tightened band is
    [first occupied probe - 1 step, last occupied probe + 1 step]
    (one-step margins bound the discretization error of the probe comb).
    Rays with no occupied probe get a degenerate band at t_near and
    hit=False — their samples all land in empty space and the ray
    composites to background, matching the un-pruned result.
    """
    n = rays_o.shape[0]
    step = (t_far - t_near) / (n_probes - 1)
    ts, o = probe_occupancy(occ, min_bound, max_bound, rays_o, rays_d,
                            t_near, t_far, n_probes)
    hit = jnp.any(o, axis=-1)
    first = jnp.argmax(o, axis=-1)
    last = n_probes - 1 - jnp.argmax(o[:, ::-1], axis=-1)
    t0 = ts[jnp.arange(n), first] - step
    t1 = ts[jnp.arange(n), last] + step
    t0 = jnp.maximum(t0, t_near)
    t1 = jnp.minimum(t1, t_far)
    t0 = jnp.where(hit, t0, t_near)
    t1 = jnp.where(hit, t1, t_near + 1e-4)
    return t0, t1, hit
