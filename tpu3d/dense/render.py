"""Differentiable volume rendering (compositing) — ref plenoxel.py:66-93 /
sdf.py:371-406, as pure jnp under jit/grad.

alpha = 1 - exp(-sigma * delta); transmittance = shifted cumprod(1 - alpha);
pixel = sum(w * c) + (1 - sum(w)) for a white background. The backward pass
through the grid gathers is the scatter-add the reference gets from torch
autograd; XLA emits it natively, and rays batch-shard over the `data` mesh
axis with the grid's gradient psum'd by pjit."""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu3d.dense.contract import contract as contract_pts
from tpu3d.dense.grid import VoxelGrid, query
from tpu3d.dense.sdf import SDFGrid, query_sdf_sh, ray_aabb, sample_pdf, sample_stratified


def composite(sigma: jnp.ndarray, rgb: jnp.ndarray, z: jnp.ndarray, white_bg: bool = True,
              bg=None) -> jnp.ndarray:
    """sigma: (N, S), rgb: (N, S, 3), z: (N, S) sorted depths -> (N, 3).

    bg: optional per-ray background color (N, 3) (or broadcastable) that
    replaces the white background — residual transmittance composites over
    it (the learnable view-directional sky of DenseConfig.sh_background;
    the reference hard-codes white, sdf.py:402/plenoxel.py:93)."""
    delta = jnp.concatenate([z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1)
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    w = (trans * alpha)[..., None]
    c = jnp.sum(w * rgb, axis=1)
    if bg is not None:
        c = c + (1.0 - jnp.sum(w, axis=(1, 2)))[..., None] * bg
    elif white_bg:
        c = c + 1.0 - jnp.sum(w, axis=(1, 2))[..., None]
    return c


def composite_weights(sigma: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Per-sample compositing weights w = T·alpha (for importance
    resampling). sigma, z: (N, S) -> (N, S)."""
    delta = jnp.concatenate([z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1)
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    return trans * alpha


# Euclidean reach of the background disparity tail under contraction: the
# contracted shell absorbs content out to this distance (normalized units
# where the scene core is ~1); beyond it the SH/white background takes over.
_CONTRACT_BG_FAR = 50.0


def _sample_z(key, occ, min_bound, max_bound, rays_o, rays_d, t_near, t_far,
              n_samples, perturb, n_probes, bg_far=None):
    """Depth sampling: plain stratified, or — given a coarse occupancy
    grid — inverse-CDF over the occupancy indicator so the fixed sample
    budget lands on occupied segments only (dense/occupancy.py).

    bg_far (contraction mode): reserve a quarter of the budget as a
    background tail uniform in DISPARITY from t_far out to bg_far —
    uniform-t over such a band would starve the scene core, and the
    contraction warp makes equal-disparity steps roughly equal-size in
    grid space out in the shell. The tail end is clamped per ray to
    max(bg_far, 1.05*t_far): auto_near_far's far is scene-derived and
    unclamped, and a tail that ENDED before t_far would emit decreasing
    depths, violating composite()'s sorted-z assumption."""
    if bg_far is not None:
        n_bg = n_samples // 4
        z_fg = sample_stratified(key, t_near, t_far, n_samples - n_bg, perturb)
        u = jnp.linspace(0.0, 1.0, n_bg + 1)[1:]
        bg_end = jnp.maximum(bg_far, t_far * 1.05)
        inv = (1.0 / jnp.maximum(t_far, 1e-6))[:, None] * (1.0 - u)[None, :] \
            + (1.0 / bg_end)[:, None] * u[None, :]
        return jnp.concatenate([z_fg, 1.0 / inv], axis=-1)
    if occ is None:
        return sample_stratified(key, t_near, t_far, n_samples, perturb)
    from tpu3d.dense.occupancy import sample_occupied

    return sample_occupied(key, occ, min_bound, max_bound, rays_o, rays_d,
                           t_near, t_far, n_probes, n_samples, perturb)


@functools.partial(jax.jit, static_argnames=("n_samples", "white_bg", "perturb", "clip_aabb", "occ_probes", "contract"))
def render_rays(
    vg: VoxelGrid,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int = 192,
    white_bg: bool = True,
    perturb: bool = True,
    clip_aabb: bool = False,
    occ: jnp.ndarray = None,
    occ_probes: int = 128,
    bg: jnp.ndarray = None,
    contract: bool = False,
    base_vg: VoxelGrid = None,
) -> jnp.ndarray:
    """Plenoxel-style [near, far] rendering (ref plenoxel.py:71-93).
    contract=True warps sample positions through the radius-2 radial
    contraction (dense/contract.py) before the grid query — the grid then
    spans [-2, 2]^3 with the scene core linear in the inner unit ball.
    clip_aabb=True additionally intersects each ray's band with the grid
    box (ref's SDF path semantics, sdf.py:154-165) — with cameras INSIDE
    the reconstructed scene a global band wastes most samples outside the
    volume for many rays.

    base_vg: optional frozen cascade BASE grid (r5) — `vg` becomes the
    core detail layer, composed pre-activation (see render_rays_packed)."""
    from tpu3d.dense.grid import eval_sh, trilinear_sample

    n = rays_o.shape[0]
    rb = base_vg if base_vg is not None else vg
    t_near = jnp.full((n,), near, rays_o.dtype)
    t_far = jnp.full((n,), far, rays_o.dtype)
    if clip_aabb:
        t0, t1, valid = ray_aabb(rays_o, rays_d, rb.min_bound, rb.max_bound)
        t_near = jnp.where(valid, jnp.maximum(t_near, t0), t_near)
        t_far = jnp.where(valid, jnp.clip(t1, t_near + 1e-4, far), t_near + 1e-4)
    z = _sample_z(key, occ, rb.min_bound, rb.max_bound, rays_o, rays_d,
                  t_near, t_far, n_samples, perturb, occ_probes,
                  bg_far=_CONTRACT_BG_FAR if contract else None)
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    if contract:
        pts = contract_pts(pts)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    if base_vg is None:
        sigma, rgb = query(vg, pts.reshape(-1, 3), dirs.reshape(-1, 3))
    else:
        p = pts.reshape(-1, 3)
        vals, in_b = trilinear_sample(vg.grid, vg.min_bound, vg.max_bound, p)
        bvals, bin_b = trilinear_sample(
            jax.lax.stop_gradient(base_vg.grid), base_vg.min_bound,
            base_vg.max_bound, p)
        vals = bvals * bin_b[:, None] + vals * in_b[:, None]
        sigma = jax.nn.relu(vals[:, 0])
        rgb = eval_sh(vals[:, 1:28].reshape(-1, 3, 9), dirs.reshape(-1, 3))
    return composite(sigma.reshape(n, n_samples), rgb.reshape(n, n_samples, 3), z, white_bg, bg)


@functools.partial(jax.jit, static_argnames=("n_samples", "white_bg", "perturb"))
def render_rays_aabb(
    sg: SDFGrid,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    n_samples: int = 160,
    white_bg: bool = True,
    perturb: bool = True,
    bg: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SDF-grid rendering with per-ray AABB bounds (ref sdf.py:391-406).
    Invalid (non-intersecting) rays are masked, not filtered — returns
    (rgb (N, 3), valid (N,))."""
    n = rays_o.shape[0]
    t_near, t_far, valid = ray_aabb(rays_o, rays_d, sg.min_bound, sg.max_bound)
    t_far = jnp.where(valid, t_far, t_near + 1.0)
    z = sample_stratified(key, t_near, t_far, n_samples, perturb)
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    sigma, rgb = query_sdf_sh(sg, pts.reshape(-1, 3), dirs.reshape(-1, 3))
    out = composite(sigma.reshape(n, n_samples), rgb.reshape(n, n_samples, 3), z, white_bg, bg)
    return out, valid


@functools.partial(jax.jit, static_argnames=("n_coarse", "n_fine", "white_bg", "perturb", "clip_aabb", "occ_probes", "contract"))
def render_rays_hierarchical(
    vg: VoxelGrid,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_coarse: int = 64,
    n_fine: int = 64,
    white_bg: bool = True,
    perturb: bool = True,
    clip_aabb: bool = False,
    occ: jnp.ndarray = None,
    occ_probes: int = 128,
    bg: jnp.ndarray = None,
    contract: bool = False,
) -> jnp.ndarray:
    """Two-pass hierarchical rendering (NeRF coarse→fine; the reference
    COMPUTES importance samples then throws them away, sdf.py:248-252 —
    here they are the point).

    Pass 1 reads only the 1-channel density grid at n_coarse stratified
    depths (cheap gather); its compositing weights drive inverse-CDF
    resampling; pass 2 reads the full 28-channel grid at the merged
    coarse+fine depths. For equal sample budgets this cuts the heavy
    wide-channel gather traffic roughly in half while concentrating
    samples at surfaces."""
    n = rays_o.shape[0]
    k1, k2 = jax.random.split(key)
    t_near = jnp.full((n,), near, rays_o.dtype)
    t_far = jnp.full((n,), far, rays_o.dtype)
    if clip_aabb:
        t0, t1, valid = ray_aabb(rays_o, rays_d, vg.min_bound, vg.max_bound)
        t_near = jnp.where(valid, jnp.maximum(t_near, t0), t_near)
        t_far = jnp.where(valid, jnp.clip(t1, t_near + 1e-4, far), t_near + 1e-4)
    z_c = _sample_z(k1, occ, vg.min_bound, vg.max_bound, rays_o, rays_d,
                    t_near, t_far, n_coarse, perturb, occ_probes,
                    bg_far=_CONTRACT_BG_FAR if contract else None)
    pts_c = rays_o[:, None, :] + z_c[..., None] * rays_d[:, None, :]
    if contract:
        pts_c = contract_pts(pts_c)
    from tpu3d.dense.grid import trilinear_sample

    dens, in_b = trilinear_sample(vg.grid[..., :1], vg.min_bound, vg.max_bound,
                                  pts_c.reshape(-1, 3))
    sigma_c = jax.nn.relu(dens[:, 0] * in_b).reshape(n, n_coarse)
    w = composite_weights(sigma_c, z_c)
    z_f = sample_pdf(k2, z_c, jax.lax.stop_gradient(w), n_fine)
    z = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    if contract:
        pts = contract_pts(pts)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    sigma, rgb = query(vg, pts.reshape(-1, 3), dirs.reshape(-1, 3))
    S = n_coarse + n_fine
    return composite(sigma.reshape(n, S), rgb.reshape(n, S, 3), z, white_bg, bg)


@functools.partial(jax.jit, static_argnames=("res", "n_samples", "white_bg", "perturb", "clip_aabb", "occ_probes", "contract", "base_res"))
def render_rays_packed(
    packed: jnp.ndarray,
    min_bound: jnp.ndarray,
    max_bound: jnp.ndarray,
    res,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int = 192,
    white_bg: bool = True,
    perturb: bool = False,
    clip_aabb: bool = False,
    occ: jnp.ndarray = None,
    occ_probes: int = 128,
    bg: jnp.ndarray = None,
    contract: bool = False,
    base_packed: jnp.ndarray = None,
    base_mb: jnp.ndarray = None,
    base_xb: jnp.ndarray = None,
    base_res=None,
) -> jnp.ndarray:
    """render_rays via the Pallas box-DMA sampler (kernels/trilinear.py) —
    ~5x over the XLA gather on a v5e for the full-grid access pattern.
    Forward-only (rendering/eval); training keeps the differentiable path.

    base_*: optional frozen cascade BASE grid (r5 capacity cascade). When
    given, `packed` is the core DETAIL layer: ray z-sampling and clipping
    run against the BASE bounds (rays must traverse the whole scene), the
    base raw channels are added pre-activation, and the detail grid only
    contributes inside its own (tighter, higher-voxels-per-unit) AABB."""
    from tpu3d.dense.grid import eval_sh
    from tpu3d.kernels.trilinear import sample_packed

    n = rays_o.shape[0]
    rb_mb = base_mb if base_res is not None else min_bound
    rb_xb = base_xb if base_res is not None else max_bound
    t_near = jnp.full((n,), near, rays_o.dtype)
    t_far = jnp.full((n,), far, rays_o.dtype)
    if clip_aabb:
        t0, t1, valid = ray_aabb(rays_o, rays_d, rb_mb, rb_xb)
        t_near = jnp.where(valid, jnp.maximum(t_near, t0), t_near)
        t_far = jnp.where(valid, jnp.clip(t1, t_near + 1e-4, far), t_near + 1e-4)
    z = _sample_z(key, occ, rb_mb, rb_xb, rays_o, rays_d,
                  t_near, t_far, n_samples, perturb, occ_probes,
                  bg_far=_CONTRACT_BG_FAR if contract else None)
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    if contract:
        pts = contract_pts(pts)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape).reshape(-1, 3)
    vals, in_b = sample_packed(packed, min_bound, max_bound, res, pts.reshape(-1, 3))
    if base_res is not None:
        bvals = _base_raw_vals((base_packed, base_mb, base_xb, base_res),
                               pts.reshape(-1, 3),
                               jax.default_backend() == "cpu")
        vals = bvals + vals * in_b[:, None]
        in_b = jnp.ones_like(in_b)
    sigma = jax.nn.relu(vals[:, 0]) * in_b
    k = vals[:, 1:28].reshape(-1, 3, 9)
    rgb = eval_sh(k, dirs) * in_b[:, None]
    return composite(sigma.reshape(n, n_samples), rgb.reshape(n, n_samples, 3), z, white_bg, bg)


def _query_packed_diff(packed, min_bound, max_bound, res, pts, dirs, interpret,
                       base_vals=None):
    """(sigma, rgb) from a packed grid through the custom_vjp Pallas
    sampler (forward = box DMA, backward = binned scatter kernel).

    base_vals: optional (N, CPAD) RAW channel values of a frozen base
    grid (cascade composition, r5): the trained grid becomes a RESIDUAL
    detail layer added pre-activation — sigma = relu(base + detail·in),
    SH coefficients likewise — so outside the detail AABB the base alone
    renders, and the seam is C0 in the raw channels."""
    from tpu3d.dense.grid import eval_sh
    from tpu3d.kernels.trilinear_grad import sample_packed_diff

    vals, in_b = sample_packed_diff(res, interpret, packed, min_bound, max_bound, pts)
    if base_vals is not None:
        vals = base_vals + vals * in_b[:, None]
        in_b = jnp.ones_like(in_b)
    sigma = jax.nn.relu(vals[:, 0]) * in_b
    rgb = eval_sh(vals[:, 1:28].reshape(-1, 3, 9), dirs) * in_b[:, None]
    return sigma, rgb


def _base_raw_vals(base, pts, interpret):
    """RAW (N, CPAD) values of the frozen cascade base grid at pts.
    base = (packed, min_bound, max_bound, res) — res static."""
    from tpu3d.kernels.trilinear import _sample_packed

    bp, bmb, bxb, bres = base
    vals, in_b = _sample_packed(jax.lax.stop_gradient(bp), bmb, bxb, bres,
                                pts, interpret)
    return vals * in_b[:, None]


@functools.partial(jax.jit, static_argnames=("res", "n_samples", "white_bg",
                                              "perturb", "clip_aabb", "interpret", "occ_probes", "contract", "base_res"))
def render_rays_packed_diff(
    packed: jnp.ndarray,
    min_bound: jnp.ndarray,
    max_bound: jnp.ndarray,
    res,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int = 192,
    white_bg: bool = True,
    perturb: bool = True,
    clip_aabb: bool = False,
    interpret: bool = False,
    occ: jnp.ndarray = None,
    occ_probes: int = 128,
    bg: jnp.ndarray = None,
    contract: bool = False,
    base_packed: jnp.ndarray = None,
    base_mb: jnp.ndarray = None,
    base_xb: jnp.ndarray = None,
    base_res=None,
) -> jnp.ndarray:
    """render_rays with BOTH passes of the Pallas kernel pair — the
    TRAINING path on the packed layout (vs render_rays_packed, which is
    forward-only for eval). Position gradients are zero by design
    (depth sampling carries no grid dependence here). base_*: frozen
    cascade base (see render_rays_packed) — gradients flow only into the
    detail layer `packed`."""
    n = rays_o.shape[0]
    rb_mb = base_mb if base_res is not None else min_bound
    rb_xb = base_xb if base_res is not None else max_bound
    t_near = jnp.full((n,), near, rays_o.dtype)
    t_far = jnp.full((n,), far, rays_o.dtype)
    if clip_aabb:
        t0, t1, valid = ray_aabb(rays_o, rays_d, rb_mb, rb_xb)
        t_near = jnp.where(valid, jnp.maximum(t_near, t0), t_near)
        t_far = jnp.where(valid, jnp.clip(t1, t_near + 1e-4, far), t_near + 1e-4)
    z = _sample_z(key, occ, rb_mb, rb_xb, rays_o, rays_d,
                  t_near, t_far, n_samples, perturb, occ_probes,
                  bg_far=_CONTRACT_BG_FAR if contract else None)
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    if contract:
        pts = contract_pts(pts)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape).reshape(-1, 3)
    bvals = (None if base_res is None else _base_raw_vals(
        (base_packed, base_mb, base_xb, base_res), pts.reshape(-1, 3),
        interpret))
    sigma, rgb = _query_packed_diff(packed, min_bound, max_bound, res,
                                    pts.reshape(-1, 3), dirs, interpret,
                                    base_vals=bvals)
    return composite(sigma.reshape(n, n_samples), rgb.reshape(n, n_samples, 3), z, white_bg, bg)


@functools.partial(jax.jit, static_argnames=("res", "n_coarse", "n_fine", "white_bg",
                                              "perturb", "clip_aabb", "interpret", "occ_probes", "contract", "base_res"))
def render_rays_hierarchical_packed(
    packed: jnp.ndarray,
    min_bound: jnp.ndarray,
    max_bound: jnp.ndarray,
    res,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_coarse: int = 64,
    n_fine: int = 64,
    white_bg: bool = True,
    perturb: bool = True,
    clip_aabb: bool = False,
    interpret: bool = False,
    occ: jnp.ndarray = None,
    occ_probes: int = 128,
    bg: jnp.ndarray = None,
    contract: bool = False,
    base_packed: jnp.ndarray = None,
    base_mb: jnp.ndarray = None,
    base_xb: jnp.ndarray = None,
    base_res=None,
) -> jnp.ndarray:
    """Hierarchical packed-layout training render. The coarse pass feeds
    only the stop-gradiented importance weights, so it uses the
    forward-only sampler; all grid gradients flow through pass 2's
    custom_vjp sampler (same autodiff structure as
    render_rays_hierarchical, where z_f = sample_pdf(stop_gradient(w))).
    base_*: frozen cascade base — composed in BOTH passes (the detail
    layer starts at zero, so detail-only importance weights would be
    uniform noise)."""
    from tpu3d.kernels.trilinear import _sample_packed

    n = rays_o.shape[0]
    rb_mb = base_mb if base_res is not None else min_bound
    rb_xb = base_xb if base_res is not None else max_bound
    k1, k2 = jax.random.split(key)
    t_near = jnp.full((n,), near, rays_o.dtype)
    t_far = jnp.full((n,), far, rays_o.dtype)
    if clip_aabb:
        t0, t1, valid = ray_aabb(rays_o, rays_d, rb_mb, rb_xb)
        t_near = jnp.where(valid, jnp.maximum(t_near, t0), t_near)
        t_far = jnp.where(valid, jnp.clip(t1, t_near + 1e-4, far), t_near + 1e-4)
    z_c = _sample_z(k1, occ, rb_mb, rb_xb, rays_o, rays_d,
                    t_near, t_far, n_coarse, perturb, occ_probes,
                    bg_far=_CONTRACT_BG_FAR if contract else None)
    pts_c = rays_o[:, None, :] + z_c[..., None] * rays_d[:, None, :]
    if contract:
        pts_c = contract_pts(pts_c)
    vals_c, in_c = _sample_packed(jax.lax.stop_gradient(packed), min_bound,
                                  max_bound, res, pts_c.reshape(-1, 3), interpret)
    if base_res is not None:
        bvals_c = _base_raw_vals((base_packed, base_mb, base_xb, base_res),
                                 pts_c.reshape(-1, 3), interpret)
        vals_c = bvals_c + vals_c * in_c[:, None]
        in_c = jnp.ones_like(in_c)
    sigma_c = (jax.nn.relu(vals_c[:, 0]) * in_c).reshape(n, n_coarse)
    w = composite_weights(sigma_c, z_c)
    z_f = sample_pdf(k2, z_c, jax.lax.stop_gradient(w), n_fine)
    z = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
    pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
    if contract:
        pts = contract_pts(pts)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape).reshape(-1, 3)
    bvals = (None if base_res is None else _base_raw_vals(
        (base_packed, base_mb, base_xb, base_res), pts.reshape(-1, 3),
        interpret))
    sigma, rgb = _query_packed_diff(packed, min_bound, max_bound, res,
                                    pts.reshape(-1, 3), dirs, interpret,
                                    base_vals=bvals)
    S = n_coarse + n_fine
    return composite(sigma.reshape(n, S), rgb.reshape(n, S, 3), z, white_bg, bg)


def render_image(
    vg: VoxelGrid,
    key: jax.Array,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int = 192,
    chunk: int = 4096,
    use_pallas: Optional[bool] = None,
    clip_aabb: bool = False,
    occ_prune: bool = False,
    occ_factor: int = 4,
    occ_threshold: float = 0.5,
    bg_sh: Optional[jnp.ndarray] = None,
    contract: bool = False,
    base_grid: Optional[VoxelGrid] = None,
) -> jnp.ndarray:
    """Chunked full-image render (ref plenoxel.py:46-61 `test`). Padding to
    a whole number of chunks keeps one compiled shape. On TPU backends the
    Pallas box-DMA sampler is used automatically (use_pallas overrides).
    occ_prune=True tightens every ray's band to occupied space first
    (dense/occupancy.py) — the trained grid is frozen here, so pruning is
    computed once for the whole image. bg_sh: learned (3, 9) background SH
    coefficients (DenseConfig.sh_background) — residual transmittance
    composites over the view-directional sky instead of white."""
    from tpu3d.dense.grid import eval_sh

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    occ = None
    if occ_prune:
        from tpu3d.dense.occupancy import occupancy_from_grid

        occ = occupancy_from_grid(vg.grid, occ_factor, occ_threshold)
    n = rays_o.shape[0]
    pad = (-n) % chunk
    ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3), rays_o.dtype)])
    rd = jnp.concatenate([rays_d, jnp.ones((pad, 3), rays_d.dtype)])
    packed = None
    base_kw = {}
    if use_pallas:
        from tpu3d.kernels.trilinear import pack_grid

        packed = pack_grid(vg.grid)
        res = vg.grid.shape[:3]
        if base_grid is not None:
            base_kw = dict(base_packed=pack_grid(jnp.asarray(base_grid.grid)),
                           base_mb=jnp.asarray(base_grid.min_bound),
                           base_xb=jnp.asarray(base_grid.max_bound),
                           base_res=tuple(base_grid.grid.shape[:3]))
    outs = []
    for s in range(0, n + pad, chunk):
        rd_c = rd[s : s + chunk]
        bg = None if bg_sh is None else eval_sh(
            jnp.broadcast_to(bg_sh, (rd_c.shape[0], 3, 9)), rd_c)
        if packed is not None:
            outs.append(render_rays_packed(
                packed, vg.min_bound, vg.max_bound, res, key,
                ro[s : s + chunk], rd_c, near, far, n_samples,
                clip_aabb=clip_aabb, occ=occ, bg=bg, contract=contract,
                **base_kw,
            ))
        else:
            outs.append(
                render_rays(vg, key, ro[s : s + chunk], rd_c, near, far,
                            n_samples, perturb=False, clip_aabb=clip_aabb,
                            occ=occ, bg=bg, contract=contract,
                            base_vg=base_grid)
            )
    return jnp.concatenate(outs)[:n]
