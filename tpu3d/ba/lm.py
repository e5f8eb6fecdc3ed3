"""Levenberg–Marquardt bundle adjustment with a camera-reduced Schur
complement, solved matrix-free by preconditioned conjugate gradients.

TPU-native replacement for scipy.optimize.least_squares + lil_matrix
sparsity pattern (ref sfm.py:36-50, 79-85). Design rationale:

- The normal equations have the classic arrow structure
      [U  W] [Δc]   [gc]
      [Wᵀ V] [Δp] = [gp]
  with U block-diag over cameras (6x6), V block-diag over points (3x3) and
  W coupling through observations.
- Instead of assembling the reduced camera system S = U − W V⁻¹ Wᵀ (block
  sparse, variable fill — hostile to a dense-tiled machine), we run CG on S
  *matrix-free*: one S·x product is two `segment_sum`s and two batched
  (O, 6, 3) block multiplies over the observation axis. Everything is fixed
  shape, fully batched, and the observation axis shards over the device
  mesh (`dist/`): each shard computes its partial segment-sums and a `psum`
  over the data axis completes the product — the multi-host Schur reduction
  called for by BASELINE.json's north star.
- Block-Jacobi preconditioning with U⁻¹ (6x6 Cholesky-sized inverses,
  batched over cameras).

Gauge freedom: callers pass `cam_fixed` (C,) to freeze cameras (first camera
= identity in the incremental engine, mirroring ref sfm.py:127-128).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.ba.residuals import observation_jacobians, reprojection_residuals


class BAState(NamedTuple):
    cams: jnp.ndarray     # (C, 6) [rvec|t]
    points: jnp.ndarray   # (P, 3)
    cost: jnp.ndarray     # scalar — final masked SSE
    lam: jnp.ndarray      # final damping
    # Plain-int default: a jnp.asarray default would initialize the XLA
    # backend at import time (breaking jax.distributed.initialize, which
    # must run first in multi-process setups).
    n_iters: jnp.ndarray | int = 0  # LM iterations actually run


def ba_cost(cams, points, cam_idx, pt_idx, uv, w) -> jnp.ndarray:
    r = reprojection_residuals(cams, points, cam_idx, pt_idx, uv, w)
    return jnp.sum(r * r)


def _seg_sum(x: jnp.ndarray, idx: jnp.ndarray, num: int,
             indices_sorted: bool = False) -> jnp.ndarray:
    return jax.ops.segment_sum(x, idx, num_segments=num,
                               indices_are_sorted=indices_sorted)


def _spd_inv3(V: jnp.ndarray, damp: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of damped 3x3 SPD blocks (adjugate closed form)."""
    A = V + damp[..., None, None] * jnp.eye(3, dtype=V.dtype)
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack(
        [
            jnp.stack([co00, co01, co02], -1),
            jnp.stack([co01, co11, co12], -1),
            jnp.stack([co02, co12, co22], -1),
        ],
        -2,
    )
    return inv / det[..., None, None]


@functools.partial(jax.jit, static_argnames=(
    "max_iters", "cg_iters", "robust_delta", "pt_sorted", "reuse_blocks",
    "seg_matmul"))
def _bundle_adjust_jit(
    cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
    max_iters, cg_iters, lam0, robust_delta, cg_tol, stall_tol,
    pt_sorted, reuse_blocks, seg_matmul,
) -> BAState:
    with jax.default_matmul_precision("float32"):  # bf16 MXU breaks normal eqs
        return _bundle_adjust_body(
            cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
            max_iters, cg_iters, lam0, robust_delta, cg_tol, stall_tol,
            pt_sorted, reuse_blocks, seg_matmul,
        )


def bundle_adjust(
    cams0: jnp.ndarray,
    points0: jnp.ndarray,
    cam_idx: jnp.ndarray,
    pt_idx: jnp.ndarray,
    uv: jnp.ndarray,
    w: jnp.ndarray,
    cam_fixed: jnp.ndarray,
    pt_fixed: jnp.ndarray | None = None,
    max_iters: int = 20,
    cg_iters: int = 32,
    lam0: float = 1e-3,
    robust_delta: float | None = None,
    cg_tol: float = 1e-3,
    stall_tol: float = 1e-5,
    pt_sorted: bool = False,
    reuse_blocks: bool = True,
    seg_matmul: bool | None = None,
) -> BAState:
    """Joint pose+structure refinement.

    cams0 (C, 6), points0 (P, 3); observations (O,) indexed+masked; cam_fixed
    (C,) 1 = frozen. All shapes static: pad observations with w=0 and points
    with pt_fixed=1 to reuse one compiled executable across problem sizes.

    seg_matmul: run the cam-axis segment sums as one-hot matmuls instead
    of scatter-adds. MEASURED AND REJECTED as a default (r4): the TPU
    probe showed a 21% per-LM-iteration win (0.19 -> 0.15 s at the 262k-
    obs ladder shape), but an A/B on identical full-dataset matches cost
    7-9 cameras of recall and 0.2 px of mean error (287 @ 0.454 px with
    segment_sum vs 280 @ 0.657 with the matmul) — the reduction-order
    numerics shift gate-cascade decisions the same way the historical
    backend-divergence cliffs did (BASELINE §2). Off unless explicitly
    requested (arg or TPU3D_BA_SEG_MATMUL=1)."""
    if seg_matmul is None:
        import os

        seg_matmul = os.environ.get("TPU3D_BA_SEG_MATMUL", "") == "1"
    return _bundle_adjust_jit(
        cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
        max_iters, cg_iters, lam0, robust_delta, cg_tol, stall_tol,
        pt_sorted, reuse_blocks, bool(seg_matmul),
    )


def _bundle_adjust_body(
    cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
    max_iters, cg_iters, lam0, robust_delta, cg_tol=1e-3, stall_tol=1e-5,
    pt_sorted=False, reuse_blocks=False, seg_matmul=False,
) -> BAState:
    C = cams0.shape[0]
    P = points0.shape[0]
    dtype = points0.dtype
    if pt_fixed is None:
        pt_fixed = jnp.zeros((P,), dtype)
    cam_free = (1.0 - cam_fixed.astype(dtype))[:, None]          # (C, 1)
    pt_free = (1.0 - pt_fixed.astype(dtype))[:, None]            # (P, 1)

    # A point with no valid observation must not move (its V block is
    # singular); freeze it too.
    obs_per_pt = _seg_sum(w, pt_idx, P, pt_sorted)
    pt_free = pt_free * (obs_per_pt > 0).astype(dtype)[:, None]

    # CAM-axis segment sums as one-hot matmuls. A few hundred segments fed
    # by 10^5+ rows is the worst case for TPU scatter-add (per-slot
    # collision serialization): the real-chip probe measured the block
    # rebuild at ~55 ms/LM-iter when its arithmetic is ~0.4 ms of
    # bandwidth (benchmarks/ba_iter_probe.py). A (C, O) x (O, k) matmul
    # does the same reduction on the MXU; under the observation-sharded
    # pjit path the O-contraction partitions into partial products + one
    # all-reduce, same as the segment-sum it replaces. Falls back to
    # segment_sum when the one-hot would exceed ~2 GB (huge scenes).
    O_total = cam_idx.shape[0]
    if seg_matmul and O_total * C * 4 <= 2**31:
        cam_onehot = jax.nn.one_hot(cam_idx, C, dtype=dtype)      # (O, C)

        def seg_cam(x):
            k = int(np.prod(x.shape[1:]))
            flat = jnp.einsum("oc,ok->ck", cam_onehot, x.reshape(O_total, k))
            return flat.reshape(C, *x.shape[1:])
    else:
        def seg_cam(x):
            return _seg_sum(x, cam_idx, C)

    def compute_blocks(cams, points):
        """Jacobian blocks + gradient of the (robustified) normal equations.

        Depends only on (cams, points) — NOT on lambda — so a rejected LM
        step can reuse the previous iteration's blocks (the state did not
        move). Rebuilding these is the dominant per-iteration cost at global
        BA shapes; the damping-dependent pieces (Vinv, Uinv) are cheap and
        stay inside lm_step."""
        r, Jc, Jp = observation_jacobians(cams, points, cam_idx, pt_idx, uv, w)
        if robust_delta is not None:
            # Huber IRLS: reweight residual rows by sqrt(ψ(|r|)/|r|) so the
            # normal equations solve the robustified problem. |r| is in the
            # residual's (focal-normalized) units.
            rn = jnp.linalg.norm(r, axis=-1)
            w_rob = jnp.sqrt(jnp.minimum(1.0, robust_delta / jnp.maximum(rn, 1e-12)))
            r = r * w_rob[:, None]
            Jc = Jc * w_rob[:, None, None]
            Jp = Jp * w_rob[:, None, None]
        # Zero out Jacobians of frozen variables (gauge fixing).
        Jc_m = Jc * cam_free[cam_idx][:, None, :]
        Jp_m = Jp * pt_free[pt_idx][:, None, :]

        Ucc = seg_cam(jnp.einsum("oia,oib->oab", Jc_m, Jc_m))               # (C,6,6)
        Vpp = _seg_sum(jnp.einsum("oia,oib->oab", Jp_m, Jp_m), pt_idx, P, pt_sorted)   # (P,3,3)
        Wcp = jnp.einsum("oia,oib->oab", Jc_m, Jp_m)                        # (O,6,3)
        gc = seg_cam(jnp.einsum("oia,oi->oa", Jc_m, r))                     # (C,6)
        gp = _seg_sum(jnp.einsum("oia,oi->oa", Jp_m, r), pt_idx, P, pt_sorted)  # (P,3)
        return (Ucc, Vpp, Wcp, gc, gp)

    def lm_step(carry, blocks):
        cams, points, lam, cost = carry
        Ucc, Vpp, Wcp, gc, gp = blocks

        damp_c = lam * (jnp.einsum("caa->ca", Ucc) + 1e-8)                  # (C,6)
        Vinv = _spd_inv3(Vpp, lam * (jnp.einsum("paa->pa", Vpp).mean(-1) + 1e-8))

        # Reduced RHS: b = gc − W V⁻¹ gp   (gathered per observation).
        Vinv_gp = jnp.einsum("pab,pb->pa", Vinv, gp)                        # (P,3)
        b = gc - seg_cam(
            jnp.einsum("oab,ob->oa", Wcp,
                       jnp.take(Vinv_gp, pt_idx, axis=0,
                                indices_are_sorted=pt_sorted)))

        def schur_matvec(x):  # x: (C, 6)
            Ux = jnp.einsum("cab,cb->ca", Ucc, x) + damp_c * x
            a = jnp.einsum("oab,oa->ob", Wcp, x[cam_idx])                   # Wᵀx per obs (3,)
            bp = _seg_sum(a, pt_idx, P, pt_sorted)                          # (P,3)
            cp = jnp.einsum("pab,pb->pa", Vinv, bp)
            d = jnp.einsum("oab,ob->oa", Wcp,
                           jnp.take(cp, pt_idx, axis=0,
                                    indices_are_sorted=pt_sorted))          # (O,6)
            return Ux - seg_cam(d)

        # Block-Jacobi preconditioner: (U + damp)⁻¹, INVERTED ONCE per LM
        # iteration. A batched 6x6 linalg.solve inside the CG body ran on
        # every CG iteration — batched small LU dominates TPU per-iteration
        # cost (seg_probe shows the gathers/segment-sums are ~0.1 ms; the
        # solver was the ~7 ms/iter mystery).
        Udamped = Ucc + damp_c[..., None] * jnp.eye(6, dtype=dtype)[None]
        # Guard frozen cameras: identity block keeps CG well-posed.
        eye6 = jnp.eye(6, dtype=dtype)[None]
        Udamped = Udamped * cam_free[:, :, None] + eye6 * (1.0 - cam_free[:, :, None])
        Uinv = jnp.linalg.inv(Udamped)

        def precond(v):
            return jnp.einsum("cab,cb->ca", Uinv, v) * cam_free

        # Preconditioned CG on S Δc = b, with an inexact-Newton forcing
        # tolerance: LM only needs the linear system solved to a fraction
        # of its initial residual (Eisenstat-Walker); each CG iteration
        # costs a full sweep of observation gathers, so stopping at
        # ||r||_M <= cg_tol * ||b||_M saves the dominant per-iter cost.
        def cg_cond(state):
            _, _, _, rz, it, rz0 = state
            return jnp.logical_and(it < cg_iters, rz > cg_tol * cg_tol * rz0)

        def cg_body(state):
            x, rr, p, rz, it, rz0 = state
            Ap = schur_matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return (x, rr, p, rz_new, it + 1, rz0)

        x0 = jnp.zeros_like(b)
        z0 = precond(b)
        rz0 = jnp.sum(b * z0)
        dc, *_ = jax.lax.while_loop(
            cg_cond, cg_body,
            (x0, b, z0, rz0, jnp.asarray(0, jnp.int32), rz0))
        dc = dc * cam_free

        # Back-substitute point updates: Δp = V⁻¹ (gp − Wᵀ Δc).
        a = _seg_sum(jnp.einsum("oab,oa->ob", Wcp, dc[cam_idx]), pt_idx, P)
        dp = jnp.einsum("pab,pb->pa", Vinv, gp - a) * pt_free

        new_cams = cams - dc
        new_points = points - dp
        new_cost = _cost(new_cams, new_points)
        accept = new_cost < cost
        cams = jnp.where(accept, new_cams, cams)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        cost = jnp.where(accept, new_cost, cost)
        return (cams, points, lam, cost), accept

    def _cost(cams, points):
        """Accept/reject on the robustified objective when IRLS is on —
        stepping down the Huber cost can legitimately raise the raw SSE."""
        r = reprojection_residuals(cams, points, cam_idx, pt_idx, uv, w)
        if robust_delta is None:
            return jnp.sum(r * r)
        rn = jnp.linalg.norm(r, axis=-1)
        quad = rn <= robust_delta
        return jnp.sum(jnp.where(quad, rn * rn, 2 * robust_delta * rn - robust_delta**2))

    cost0 = _cost(cams0, points0)

    # Early-exit LM: mid-run global BAs start near-converged (the previous
    # BA plus windowed refinements), so a fixed-length scan wastes most of
    # its iterations re-building Jacobians for no progress. Stop after 3
    # consecutive iterations without a relative cost improvement beyond
    # stall_tol (rejected LM steps need a couple of retries while lambda
    # climbs). stall_tol is a traced operand, so mid-run (loose) and final
    # (tight) solves share one executable.
    def _cond(state):
        it, stall = state[4], state[5]
        return jnp.logical_and(it < max_iters, stall < 3)

    # `stale` tracks whether the carried blocks still match (cams, points):
    # an ACCEPTED step moves the state (blocks must rebuild next iteration);
    # a REJECTED step leaves it unchanged (the blocks are still exact — only
    # lambda moved, which lives outside the blocks). With `reuse_blocks` the
    # rebuild happens under lax.cond, skipping the dominant per-iteration
    # cost on rejected/lambda-climb iterations. vmapped call sites must pass
    # reuse_blocks=False: vmap lowers cond to select, executing BOTH branches.
    def _body(state):
        cams, points, lam, cost, it, stall, blocks, stale = state
        if reuse_blocks:
            blocks = jax.lax.cond(
                stale,
                lambda args: compute_blocks(*args),
                lambda args: blocks,
                (cams, points),
            )
        else:
            blocks = compute_blocks(cams, points)
        (cams, points, lam, new_cost), accepted = lm_step(
            (cams, points, lam, cost), blocks)
        improved = new_cost < cost * (1.0 - stall_tol)
        stall = jnp.where(improved, 0, stall + 1)
        return (cams, points, lam, new_cost, it + 1, stall, blocks, accepted)

    if reuse_blocks:
        blocks0 = compute_blocks(cams0, points0)
    else:  # recomputed unconditionally in _body; carry zero placeholders
        O = cam_idx.shape[0]
        blocks0 = (jnp.zeros((C, 6, 6), dtype), jnp.zeros((P, 3, 3), dtype),
                   jnp.zeros((O, 6, 3), dtype), jnp.zeros((C, 6), dtype),
                   jnp.zeros((P, 3), dtype))
    cams, points, lam, cost, n_it, _, _, _ = jax.lax.while_loop(
        _cond, _body,
        (cams0, points0, jnp.asarray(lam0, dtype), cost0,
         jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
         blocks0, jnp.asarray(False)),
    )
    return BAState(cams, points, cost, lam, n_it)
