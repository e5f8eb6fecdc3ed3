"""Production voxel-brick tensor parallelism for dense training.

The single-chip dense trainer is hard-capped at 256^3 (grid + Adam moments
+ render temporaries exhaust a 16 GB chip — BASELINE.md capacity facts);
the reference never faces this only because it trains 250^3 on a 24 GB GPU
(ref sdf.py:94-108,274 full-AABB grid, plenoxel.py:19-29 256^3). This
module shards the grid itself so resolution scales with chip count.

Design (shard_map over a ('data', 'model') mesh):

  - The (X, Y, Z, C) grid shards into bricks along X over `model`; Adam/
    RMSProp moments shard identically, so per-device grid state is exactly
    1/m of the total — no replication anywhere.
  - Ray batches shard over `data`.
  - Trilinear interpolation is LINEAR in the grid, so each device computes
    the partial sum of the 8-corner lerp restricted to corners its brick
    OWNS (corner-wise ownership masks — a corner row at the brick boundary
    belongs to exactly one brick), and ONE psum over `model` of the (N, C)
    sample values reconstructs the exact global interpolation. The psum IS
    the halo exchange: no halo planes are stored, no grid-sized collective
    ever moves — the collective payload is the sample-value tensor
    (batch * samples * 28 floats), independent of grid resolution.
  - The backward pass is automatic: the VJP of the masked gather is a
    scatter-add into the local brick only, and grid gradients are averaged
    over `data` with a pmean. Optimizer update runs brick-locally.

This is the production wiring of the dryrun-only sharded step that VERDICT
r3 flagged: train_plenoxel/train_sdf take a `mesh` and route here, and
`cli densify --distributed` drives it end-to-end.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3d.config import DenseConfig
from tpu3d.dense.contract import contract as contract_pts
from tpu3d.dense.grid import VoxelGrid, eval_sh
from tpu3d.dense.render import _CONTRACT_BG_FAR, composite, composite_weights
from tpu3d.dense.sdf import ray_aabb, sample_pdf, sample_stratified
from tpu3d.dense.train import (
    TrainState, _exposure_adam, _exposure_apply, _ray_background,
    _sparsity_crop_loss, _tv_crop_loss,
)


def trilinear_partial(grid_local: jnp.ndarray, x_lo: jnp.ndarray,
                      global_res: Tuple[int, int, int],
                      min_bound: jnp.ndarray, max_bound: jnp.ndarray,
                      pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brick-local partial trilinear interpolation.

    grid_local: (Xl, Y, Z, C) — this device's brick, covering global x rows
    [x_lo, x_lo + Xl). Returns (partial (N, C), in_bounds (N,)) where
    psum(partial, model_axis) equals grid.trilinear_sample's values: each
    corner contribution w_c * grid[c] is emitted by exactly the device that
    owns corner row c (ownership masks are disjoint and cover [0, X-1]).
    """
    X, Y, Z = global_res
    Xl, C = grid_local.shape[0], grid_local.shape[3]
    res = jnp.asarray((X, Y, Z), pts.dtype)
    u = (pts - min_bound) / (max_bound - min_bound)
    in_bounds = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
    v = u * (res - 1.0)
    i0 = jnp.clip(jnp.floor(v).astype(jnp.int32),
                  0, jnp.asarray((X, Y, Z)) - 2)
    frac = v - i0.astype(v.dtype)
    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]

    flat = grid_local.reshape(Xl * Y * Z, C)
    wx = (1.0 - fx[:, 0], fx[:, 0])
    out = jnp.zeros((pts.shape[0], C), grid_local.dtype)
    # Split the 8-corner lerp by x-plane: the two x-planes x0 and x0+1 are
    # the only corner coordinates that can cross brick boundaries (bricks
    # shard along X). For each, gather the 4 (y, z) corners as one flat
    # row-gather on the local brick and weight by the x lerp factor times
    # the ownership mask.
    for bit in (0, 1):
        gx = x0 + bit
        lx = gx - x_lo
        own = (lx >= 0) & (lx < Xl)
        lxc = jnp.clip(lx, 0, Xl - 1)
        base = (lxc * Y + y0) * Z + z0
        offs = jnp.asarray([0, 1, Z, Z + 1], jnp.int32)
        idx = base[:, None] + offs[None, :]
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(-1, 4, C)
        c00 = vals[:, 0] * (1 - fz) + vals[:, 1] * fz
        c01 = vals[:, 2] * (1 - fz) + vals[:, 3] * fz
        plane = c00 * (1 - fy) + c01 * fy
        out = out + plane * (wx[bit][:, None] * own[:, None].astype(plane.dtype))
    return out, in_bounds


def _query_tp(grid_local, x_lo, gres, minb, maxb, pts, dirs, model_axis: str):
    """(sigma, rgb) at world points from the brick-sharded grid: partial
    interp + one psum over the model axis, then the same relu/SH epilogue
    as grid.query (the nonlinearities must run on the summed values)."""
    partial, in_b = trilinear_partial(grid_local, x_lo, gres, minb, maxb, pts)
    vals = jax.lax.psum(partial, model_axis)
    sigma = jax.nn.relu(vals[:, 0]) * in_b
    rgb = eval_sh(vals[:, 1:28].reshape(-1, 3, 9), dirs) * in_b[:, None]
    return sigma, rgb


def _ray_uniforms(key, gidx, salt: int, S: int):
    """(N, S) uniforms keyed by GLOBAL ray index: the jitter a ray draws
    is a function of the ray alone, so sampling — and therefore the whole
    training trajectory — is invariant to how rays shard over the mesh
    (pinned by tests/test_dense_tp.py's 1-vs-8-device equivalence)."""
    def one(i):
        return jax.random.uniform(
            jax.random.fold_in(jax.random.fold_in(key, salt), i), (S,))

    return jax.vmap(one)(gidx)


def _render_tp(cfg: DenseConfig, grid_local, x_lo, gres, minb, maxb,
               key, gidx, ro, rd, bg, model_axis: str, perturb: bool,
               sdf_mode: bool):
    """Sharded-grid mirror of render_rays / render_rays_hierarchical /
    render_rays_aabb (dense/render.py): identical depth sampling and
    compositing, with the grid query replaced by the psum-composed partial
    interpolation. sdf_mode = the SDF trainer's band semantics (pure
    per-ray AABB band, returns the valid mask for masked MSE)."""
    n = ro.shape[0]
    if sdf_mode:
        t_near, t_far, valid = ray_aabb(ro, rd, minb, maxb)
        t_far = jnp.where(valid, t_far, t_near + 1.0)
    else:
        t_near = jnp.full((n,), cfg.near, ro.dtype)
        t_far = jnp.full((n,), cfg.far, ro.dtype)
        valid = jnp.ones((n,), bool)
        if cfg.per_ray_aabb:
            t0, t1, v = ray_aabb(ro, rd, minb, maxb)
            t_near = jnp.where(v, jnp.maximum(t_near, t0), t_near)
            t_far = jnp.where(v, jnp.clip(t1, t_near + 1e-4, cfg.far),
                              t_near + 1e-4)
    bg_far = _CONTRACT_BG_FAR if (cfg.contraction and not sdf_mode) else None

    def _stratified(salt, tn, tf, S):
        # _sample_z's stratified/disparity-tail structure with per-ray
        # uniforms (occupancy pruning never routes here).
        if bg_far is not None:
            n_bg = S // 4
            n_fg = S - n_bg
            u = _ray_uniforms(key, gidx, salt, n_fg) if perturb else None
            z_fg = sample_stratified(key, tn, tf, n_fg, perturb, u=u)
            t = jnp.linspace(0.0, 1.0, n_bg + 1)[1:]
            bg_end = jnp.maximum(bg_far, tf * 1.05)
            inv = (1.0 / jnp.maximum(tf, 1e-6))[:, None] * (1.0 - t)[None, :] \
                + (1.0 / bg_end)[:, None] * t[None, :]
            return jnp.concatenate([z_fg, 1.0 / inv], axis=-1)
        u = _ray_uniforms(key, gidx, salt, S) if perturb else None
        return sample_stratified(key, tn, tf, S, perturb, u=u)

    hierarchical = cfg.hierarchical and not sdf_mode
    if hierarchical:
        z_c = _stratified(1, t_near, t_far, cfg.n_coarse)
        pts_c = ro[:, None, :] + z_c[..., None] * rd[:, None, :]
        if cfg.contraction:
            pts_c = contract_pts(pts_c)
        dens, in_c = trilinear_partial(
            jax.lax.stop_gradient(grid_local[..., :1]), x_lo, gres, minb,
            maxb, pts_c.reshape(-1, 3))
        dens = jax.lax.psum(dens, model_axis)
        sigma_c = jax.nn.relu(dens[:, 0] * in_c).reshape(n, cfg.n_coarse)
        w = composite_weights(sigma_c, z_c)
        z_f = sample_pdf(key, z_c, jax.lax.stop_gradient(w), cfg.n_fine,
                         u=_ray_uniforms(key, gidx, 2, cfg.n_fine))
        z = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
        S = cfg.n_coarse + cfg.n_fine
    else:
        S = cfg.num_samples
        z = _stratified(1, t_near, t_far, S)
    pts = ro[:, None, :] + z[..., None] * rd[:, None, :]
    if cfg.contraction and not sdf_mode:
        pts = contract_pts(pts)
    dirs = jnp.broadcast_to(rd[:, None, :], pts.shape).reshape(-1, 3)
    sigma, rgb = _query_tp(grid_local, x_lo, gres, minb, maxb,
                           pts.reshape(-1, 3), dirs, model_axis)
    out = composite(sigma.reshape(n, S), rgb.reshape(n, S, 3), z,
                    cfg.white_background, bg)
    return out, valid


def make_tp_dense_step(cfg: DenseConfig,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh,
                       global_shape: Tuple[int, int, int, int],
                       sdf_mode: bool = False,
                       perturb: bool = True,
                       with_exposure: bool = False,
                       with_background: bool = False):
    """Jitted DP x TP train step on the brick-sharded dense grid layout.

    Returns (step, place): step(state, key, ro, rd, rgb[, cid]) -> (state,
    loss) with state.grid.grid and every grid-shaped optimizer moment
    sharded P(model) along X — per-device grid memory is exactly 1/m with
    NO halo storage — and place(...) device_puts a host-built state/batch
    into those layouts. Unsupported-under-sharding knobs (occupancy
    pruning, the packed Pallas layout) are simply not routed here by
    train_plenoxel; TV/sparsity run as per-brick crop estimators averaged
    over the model axis (same prior, brick-local support).
    """
    data_ax, model_ax = mesh.axis_names
    n_model = mesh.shape[model_ax]
    X, Y, Z, C = global_shape
    if X % n_model:
        raise ValueError(f"grid X={X} must divide the model axis ({n_model})")
    Xl = X // n_model
    gres = (X, Y, Z)

    g_spec = P(model_ax, None, None, None)
    grid_shard = NamedSharding(mesh, g_spec)
    rep = NamedSharding(mesh, P())
    ray_shard = NamedSharding(mesh, P(data_ax))

    def _opt_spec(a):
        if getattr(a, "ndim", 0) == 4 and tuple(a.shape) == (X, Y, Z, C):
            return g_spec
        return P()

    opt_specs = jax.tree_util.tree_map(_opt_spec,
                                       jax.eval_shape(optimizer.init,
                                                      jax.ShapeDtypeStruct(
                                                          (X, Y, Z, C),
                                                          jnp.float32)))

    # Specs for the optional latents/cid: when absent the argument is None
    # (an empty pytree), so the spec never binds — P() keeps shard_map's
    # eager spec validation happy either way.
    lat_spec = P()
    bg_spec = P()
    cid_spec = P(data_ax)

    def body(grid_local, minb, maxb, opt_state, stepct, exposure, background,
             key, ro, rd, rgb, cid):
        x_lo = jax.lax.axis_index(model_ax) * Xl
        # Global ray indices of this shard's rays: all per-ray randomness
        # keys off these, so the training trajectory is independent of the
        # mesh shape (see _ray_uniforms).
        n_local = ro.shape[0]
        gidx = jax.lax.axis_index(data_ax) * n_local + jnp.arange(n_local)

        def loss_fn(grid_local, gains, bg_sh, key, rgb, cid):
            pred, valid = _render_tp(cfg, grid_local, x_lo, gres, minb, maxb,
                                     key, gidx, ro, rd,
                                     _ray_background(bg_sh, rd),
                                     model_ax, perturb, sdf_mode)
            pred = _exposure_apply(pred, gains, cid)
            if sdf_mode:
                # Global masked mean: the valid-ray DENOMINATOR must be
                # psum'ed over the data axis — per-shard ratios pmean'ed
                # would weight shards with fewer valid rays more, making
                # the trajectory mesh-shape-dependent (ADVICE r4). The
                # numerator stays local and is scaled by n_data so the
                # caller's pmean(value) / psum-then-divide-by-n_data grad
                # convention (shared with the plenoxel local-mean branch)
                # reproduces exactly num_global/den_global and its grad.
                w = valid.astype(pred.dtype)[:, None]
                num = jnp.sum(w * (pred - rgb) ** 2)
                den = jax.lax.psum(jnp.sum(w) * 3, data_ax)
                n_d = jax.lax.axis_size(data_ax)
                loss = n_d * num / jnp.maximum(den, 1.0)
            else:
                loss = jnp.mean((pred - rgb) ** 2)
            # Per-brick crop TV/sparsity, averaged over the model axis: a
            # stochastic estimator of the same smoothness/sparsity priors
            # with brick-local support (a crop never spans two bricks, so
            # its gradient stays local).
            if cfg.tv_sigma or cfg.tv_sh:
                tv_s, tv_c = _tv_crop_loss(grid_local,
                                           jax.random.fold_in(key, 7),
                                           cfg.tv_crop)
                loss = loss + jax.lax.pmean(
                    cfg.tv_sigma * tv_s + cfg.tv_sh * tv_c, model_ax)
            if getattr(cfg, "sparsity_sigma", 0.0):
                loss = loss + jax.lax.pmean(
                    cfg.sparsity_sigma * _sparsity_crop_loss(
                        grid_local, jax.random.fold_in(key, 11),
                        cfg.tv_crop), model_ax)
            return loss

        has_exp = with_exposure and cid is not None
        wrt = (0,) + ((1,) if has_exp else ()) + ((2,) if with_background else ())
        loss, grads = jax.value_and_grad(loss_fn, argnums=wrt)(
            grid_local,
            exposure[0] if has_exp else None,
            background[0] if with_background else None,
            key, rgb, cid if has_exp else None)
        grads = (grads,) if not isinstance(grads, tuple) else grads
        # Each ray shard produced a mean over ITS rays; the global-batch
        # gradient is the average over data shards. The grid/latent inputs
        # are data-INVARIANT under VMA tracking, so their cotangents come
        # back already psum'ed over `data` (transpose-of-broadcast) —
        # divide by n_data rather than pmean again.
        n_data = jax.lax.axis_size(data_ax)
        g = grads[0] / n_data
        loss = jax.lax.pmean(loss, data_ax)
        i = 1
        if has_exp:
            exposure = _exposure_adam(exposure, grads[i] / n_data,
                                      stepct, cfg.exposure_lr)
            i += 1
        if with_background:
            background = _exposure_adam(background, grads[i] / n_data,
                                        stepct, cfg.background_lr)
        updates, opt_state = optimizer.update(g, opt_state, grid_local)
        grid_local = optax.apply_updates(grid_local, updates)
        return grid_local, opt_state, stepct + 1, exposure, background, loss

    from jax import shard_map

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(g_spec, P(), P(), opt_specs, P(), lat_spec, bg_spec,
                  P(), P(data_ax), P(data_ax), P(data_ax), cid_spec),
        out_specs=(g_spec, opt_specs, P(), lat_spec, bg_spec, P()),
        # VMA tracking ON: it proves the psum'ed sample values are
        # replicated along `model`, making the psum's transpose the
        # identity. With it off, the conservative transpose is another
        # psum — every brick gradient silently scaled by n_model (caught
        # by the 1-vs-8-device equivalence test through Adam's eps).
    )

    @functools.partial(jax.jit, donate_argnums=(0, 3))
    def jit_step(grid_local, minb, maxb, opt_state, stepct, exposure,
                 background, key, ro, rd, rgb, cid):
        return sharded(grid_local, minb, maxb, opt_state, stepct, exposure,
                       background, key, ro, rd, rgb, cid)

    def step(state: TrainState, key, ro, rd, rgb, occ=None, cid=None):
        garr, opt_state, stepct, exposure, background, loss = jit_step(
            state.grid.grid, state.grid.min_bound, state.grid.max_bound,
            state.opt_state, state.step, state.exposure, state.background,
            key, ro, rd, rgb, cid if with_exposure else None)
        return TrainState(
            VoxelGrid(garr, state.grid.min_bound, state.grid.max_bound),
            opt_state, stepct, exposure, background), loss

    def place(state: TrainState, *batch):
        grid = VoxelGrid(jax.device_put(state.grid.grid, grid_shard),
                         jax.device_put(state.grid.min_bound, rep),
                         jax.device_put(state.grid.max_bound, rep))
        opt_state = jax.device_put(
            state.opt_state,
            jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                                   opt_specs))
        exposure = (jax.device_put(state.exposure, rep)
                    if state.exposure is not None else None)
        background = (jax.device_put(state.background, rep)
                      if state.background is not None else None)
        placed = TrainState(grid, opt_state,
                            jax.device_put(state.step, rep), exposure,
                            background)
        return placed, tuple(jax.device_put(jnp.asarray(b), ray_shard)
                             for b in batch)

    step.jit_step = jit_step
    step.ray_sharding = ray_shard
    step.grid_sharding = grid_shard
    return step, place


def psum_bytes_per_step(cfg: DenseConfig, n_model: int, n_data: int) -> int:
    """Collective payload of one TP train step per device (ring all-reduce
    over the model axis; zero when the grid isn't sharded). Independent of
    grid resolution — the point of the value-psum formulation."""
    if n_model <= 1:
        return 0
    B = cfg.batch_size // max(n_data, 1)
    S = (cfg.n_coarse + cfg.n_fine) if cfg.hierarchical else cfg.num_samples
    fine = B * S * 28 * 4
    coarse = B * cfg.n_coarse * 1 * 4 if cfg.hierarchical else 0
    # fwd psum + bwd psum (the transpose moves the same cotangent bytes)
    return 2 * (fine + coarse) * (n_model - 1) // n_model


def train_dense_tp(
    dataset,
    cfg: DenseConfig,
    mesh: Mesh,
    seed: int = 0,
    grid: Optional[VoxelGrid] = None,
    verbose: bool = True,
    log_every: int = 170,
    checkpoint_store=None,
    resume: bool = False,
    sdf_mode: bool = False,
):
    """Distributed (ray-DP x voxel-brick-TP) counterpart of train_plenoxel
    / train_sdf's epoch loop. Same schedule, batching, checkpoint protocol
    and (grid, losses) contract; the step runs on the brick-sharded dense
    layout (make_tp_dense_step) with one dispatch per step.

    Not routed here (single-device-only knobs): occupancy pruning (the
    coarse occupancy refresh reads the whole grid) and the packed Pallas
    layout (brick sharding uses the plain (X, Y, Z, C) layout; the psum
    formulation replaces the Pallas gather as the scaling mechanism).
    """
    import time

    import numpy as np

    from tpu3d.dense.grid import create_grid
    from tpu3d.dense.train import (
        _coarse_stage, init_background, init_exposure, load_checkpoint,
        make_optimizer, save_checkpoint,
    )

    if cfg.occupancy_prune:
        raise ValueError("occupancy_prune is not supported with a sharded "
                         "grid (the refresh reads the full grid); disable "
                         "it for --distributed dense training")
    n = len(dataset.origins)
    n_data_ax = mesh.shape[mesh.axis_names[0]]
    if cfg.batch_size % n_data_ax != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must be divisible by the data-axis "
            f"size {n_data_ax} of mesh {dict(mesh.shape)} (each ray shard "
            f"must be equal-length for NamedSharding placement)")
    steps_per_epoch = max(n // cfg.batch_size, 1)
    if grid is None:
        s = 2.0 if cfg.contraction else cfg.scene_scale
        grid = create_grid(cfg.grid_resolution, (-s, -s, -s), (s, s, s))
    pre_losses = []
    if cfg.coarse_epochs > 0 and cfg.epochs > cfg.coarse_epochs and not resume:
        def _recurse(ds, sub_cfg, seed=seed, grid=None, verbose=verbose,
                     log_every=log_every, packed=None):
            g, l = train_dense_tp(ds, sub_cfg, mesh, seed=seed, grid=grid,
                                  verbose=verbose, log_every=log_every,
                                  sdf_mode=sdf_mode)
            return g, l

        grid, pre_losses, cfg = _coarse_stage(
            _recurse, dataset, cfg, seed, grid, verbose, log_every, None,
            x_multiple=int(np.lcm(8, mesh.shape[mesh.axis_names[1]])))
    optimizer = make_optimizer(cfg, steps_per_epoch)
    exp0 = (init_exposure(int(dataset.cam_ids.max()) + 1)
            if cfg.exposure and dataset.cam_ids is not None else None)
    bg0 = init_background() if cfg.sh_background else None
    state = TrainState(grid, optimizer.init(grid.grid), jnp.asarray(0),
                       exp0, bg0)
    losses = list(pre_losses)
    start_epoch = 0
    if resume and checkpoint_store is not None:
        ck = load_checkpoint(checkpoint_store, optimizer)
        if ck is not None:
            state, start_epoch, losses = ck
            start_epoch += 1
            if verbose:
                print(f"[dense-tp] resumed at epoch {start_epoch}", flush=True)
    step, place = make_tp_dense_step(
        cfg, optimizer, mesh, tuple(state.grid.grid.shape),
        sdf_mode=sdf_mode,
        with_exposure=state.exposure is not None,
        with_background=state.background is not None)
    state, _ = place(state)
    cid_all = dataset.cam_ids if state.exposure is not None else None
    ray_shard = step.ray_sharding

    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    if verbose:
        d_ax, m_ax = mesh.axis_names
        print(f"[dense-tp] mesh {dict(mesh.shape)}: grid "
              f"{tuple(state.grid.grid.shape)} bricked x{mesh.shape[m_ax]}, "
              f"batch {cfg.batch_size} over {mesh.shape[d_ax]} shards, "
              f"psum {psum_bytes_per_step(cfg, mesh.shape[m_ax], mesh.shape[d_ax]) / 1e6:.1f} MB/step/device",
              flush=True)
    for epoch in range(start_epoch, cfg.epochs):
        key, pkey, ekey = jax.random.split(key, 3)
        perm = np.asarray(jax.random.permutation(pkey, n))
        for b in range(steps_per_epoch):
            idx = perm[b * cfg.batch_size:(b + 1) * cfg.batch_size]
            if len(idx) < cfg.batch_size:
                # Tiny dataset (n < batch_size): pad by wrapping the
                # permutation so every shard stays equal-length; repeated
                # rays only re-weight an already-stochastic SGD step.
                idx = np.resize(idx, cfg.batch_size)
            batch = [jax.device_put(jnp.asarray(dataset.origins[idx]), ray_shard),
                     jax.device_put(jnp.asarray(dataset.dirs[idx]), ray_shard),
                     jax.device_put(jnp.asarray(dataset.rgb[idx]), ray_shard)]
            cid = (jax.device_put(jnp.asarray(cid_all[idx]), ray_shard)
                   if cid_all is not None else None)
            state, loss = step(state, jax.random.fold_in(ekey, np.uint32(b)),
                               *batch, cid=cid)
            if b % log_every == 0:
                losses.append(float(loss))
                if verbose:
                    rate = (b + 1) * cfg.batch_size / (time.time() - t0)
                    print(f"[dense-tp] epoch {epoch} step {b}/{steps_per_epoch} "
                          f"loss {losses[-1]:.5f} ({rate:.0f} rays/s)",
                          flush=True)
        if checkpoint_store is not None:
            save_checkpoint(checkpoint_store, state, epoch, losses)
    from tpu3d.dense.train import _publish_aux

    _publish_aux(state)
    return state.grid, losses
