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


def _spd_inv3_flat(Vf: jnp.ndarray, damp: jnp.ndarray) -> jnp.ndarray:
    """Flat-layout batched damped 3x3 SPD inverse: Vf (..., 6) holds the
    symmetric components [v00 v01 v02 v11 v12 v22]; returns (..., 9) in
    row-major [i00..i22] order. Same adjugate math as _spd_inv3 — written
    on flat columns so no (..., 3, 3) operand forces XLA's (8, 128)
    trailing-dim register tiling (~114x layout inflation at P=45k)."""
    a = Vf[..., 0] + damp
    b, c = Vf[..., 1], Vf[..., 2]
    d = Vf[..., 3] + damp
    e = Vf[..., 4]
    f = Vf[..., 5] + damp
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return jnp.stack([co00, co01, co02, co01, co11, co12,
                      co02, co12, co22], -1) / det[..., None]


def _apply3_flat(Mf: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """y_i = sum_j Mf[..., 3i+j] * v[..., j], ascending-j association —
    the same multiply-add order XLA emits for the dense einsum."""
    return jnp.stack(
        [(Mf[..., 3 * i] * v[..., 0] + Mf[..., 3 * i + 1] * v[..., 1])
         + Mf[..., 3 * i + 2] * v[..., 2] for i in range(3)], -1)


def _wcp_apply_p(Wf: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(O, 18) x (O, 3) -> (O, 6): y_a = sum_b W[a, b] v_b (einsum
    'oab,ob->oa' on the flat [a*3+b] layout, ascending-b order)."""
    return jnp.stack(
        [(Wf[..., 3 * a] * v[..., 0] + Wf[..., 3 * a + 1] * v[..., 1])
         + Wf[..., 3 * a + 2] * v[..., 2] for a in range(6)], -1)


def _wcp_apply_c(Wf: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(O, 18) x (O, 6) -> (O, 3): y_b = sum_a W[a, b] x_a (einsum
    'oab,oa->ob', ascending-a order)."""
    cols = []
    for b in range(3):
        s = Wf[..., b] * x[..., 0]
        for a in range(1, 6):
            s = s + Wf[..., 3 * a + b] * x[..., a]
        cols.append(s)
    return jnp.stack(cols, -1)


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
    "seg_matmul", "flat_layout"))
def _bundle_adjust_jit(
    cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
    max_iters, cg_iters, lam0, robust_delta, cg_tol, stall_tol,
    pt_sorted, reuse_blocks, seg_matmul, flat_layout,
) -> BAState:
    with jax.default_matmul_precision("float32"):  # bf16 MXU breaks normal eqs
        return _bundle_adjust_body(
            cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
            max_iters, cg_iters, lam0, robust_delta, cg_tol, stall_tol,
            pt_sorted, reuse_blocks, seg_matmul, flat_layout,
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
    flat_layout: bool | None = None,
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
    # flat_layout: r5 experiment — component-packed blocks/CG operands to
    # dodge (O,2,6)/(O,6,3) register-tile inflation. MEASURED AND REJECTED
    # as a default: 0.388 vs 0.192 s/LM-iter at the 262k-obs shape — the
    # standalone-op inflation numbers do NOT survive whole-program layout
    # assignment (XLA already fuses the dense einsum path), and the 42-way
    # column stacks cost more than they save. Kept for A/B (TPU3D_BA_FLAT=1).
    if flat_layout is None:
        import os

        flat_layout = os.environ.get("TPU3D_BA_FLAT", "0") == "1"
    return _bundle_adjust_jit(
        cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
        max_iters, cg_iters, lam0, robust_delta, cg_tol, stall_tol,
        pt_sorted, reuse_blocks, bool(seg_matmul), bool(flat_layout),
    )


def _bundle_adjust_body(
    cams0, points0, cam_idx, pt_idx, uv, w, cam_fixed, pt_fixed,
    max_iters, cg_iters, lam0, robust_delta, cg_tol=1e-3, stall_tol=1e-5,
    pt_sorted=False, reuse_blocks=False, seg_matmul=False, flat_layout=False,
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

    def compute_blocks_dense(cams, points):
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

    def compute_blocks_flat(cams, points):
        """FLAT-LAYOUT blocks build (r5): every per-observation quantity is
        a rank<=2 array whose trailing dim is a packed component index, so
        XLA never tiles (O, 2, 6)/(O, 6, 3)-shaped operands onto (8, 128)
        registers (a 16-28x inflation that made the blocks build + every
        CG matvec bandwidth-pathological — measured 1 GB/read for Wcp at
        O=262k vs 19 MB of payload). The arithmetic replicates the dense
        path op-for-op in the SAME association order, and the segment sums
        add the same values in the same per-segment order, so the result
        is expected BIT-IDENTICAL to compute_blocks_dense (verified on the
        262k-obs probe) — this is the order-stable fast path VERDICT r4 #2
        asked for, where the one-hot-matmul attempt (different reduction
        order) cost 7-9 cameras of recall."""
        from tpu3d.core.lie import so3_exp

        R_all = jax.vmap(so3_exp)(cams[:, :3]).reshape(C, 9)
        dR_all = jax.vmap(jax.jacfwd(so3_exp))(cams[:, :3]).reshape(C, 27)
        R = R_all[cam_idx]                       # (O, 9) row-major
        dR = dR_all[cam_idx]                     # (O, 27) [i, j, k] row-major
        t = cams[cam_idx, 3:6]
        X = points[pt_idx]
        X0, X1, X2 = X[:, 0], X[:, 1], X[:, 2]
        Xc = [(R[:, 3 * i] * X0 + R[:, 3 * i + 1] * X1)
              + R[:, 3 * i + 2] * X2 + t[:, i] for i in range(3)]
        z = Xc[2]
        z_safe = jnp.where(jnp.abs(z) < 1e-8,
                           jnp.where(z < 0, -1e-8, 1e-8), z)
        r = [(Xc[i] / z_safe - uv[:, i]) * w for i in range(2)]
        inv_z = 1.0 / z_safe
        zero = jnp.zeros_like(inv_z)
        # dp rows (already weight-masked, like the dense path)
        dp = [[inv_z * w, zero, (-Xc[0] * inv_z * inv_z) * w],
              [zero, inv_z * w, (-Xc[1] * inv_z * inv_z) * w]]
        # Jp[i][j] = sum_a dp[i][a] R[a, j]
        Jp = [[(dp[i][0] * R[:, j] + dp[i][1] * R[:, 3 + j])
               + dp[i][2] * R[:, 6 + j] for j in range(3)] for i in range(2)]
        # dXc_drvec[a][k] = sum_j dR[a, j, k] X_j
        dXc = [[(dR[:, 9 * a + k] * X0 + dR[:, 9 * a + 3 + k] * X1)
                + dR[:, 9 * a + 6 + k] * X2 for k in range(3)]
               for a in range(3)]
        # Jc[i][0:3] = sum_a dp[i][a] dXc[a][k];  Jc[i][3:6] = dp[i]
        Jc = [[(dp[i][0] * dXc[0][k] + dp[i][1] * dXc[1][k])
               + dp[i][2] * dXc[2][k] for k in range(3)] + list(dp[i])
              for i in range(2)]
        if robust_delta is not None:
            rn = jnp.sqrt(r[0] * r[0] + r[1] * r[1])
            w_rob = jnp.sqrt(jnp.minimum(
                1.0, robust_delta / jnp.maximum(rn, 1e-12)))
            r = [ri * w_rob for ri in r]
            Jc = [[ja * w_rob for ja in Ji] for Ji in Jc]
            Jp = [[jj * w_rob for jj in Ji] for Ji in Jp]
        cf = cam_free[cam_idx][:, 0]
        pf = pt_free[pt_idx][:, 0]
        Jc = [[ja * cf for ja in Ji] for Ji in Jc]
        Jp = [[jj * pf for jj in Ji] for Ji in Jp]
        # One packed cam-axis segment sum: 36 Ucc + 6 gc components.
        cam_pack = jnp.stack(
            [Jc[0][a] * Jc[0][b] + Jc[1][a] * Jc[1][b]
             for a in range(6) for b in range(6)]
            + [Jc[0][a] * r[0] + Jc[1][a] * r[1] for a in range(6)], -1)
        cam_red = seg_cam(cam_pack)                                 # (C, 42)
        Ucc = cam_red[:, :36].reshape(C, 6, 6)
        gc = cam_red[:, 36:42]
        # One packed pt-axis segment sum: 6 sym Vpp + 3 gp components.
        pt_pack = jnp.stack(
            [Jp[0][j] * Jp[0][k] + Jp[1][j] * Jp[1][k]
             for j in range(3) for k in range(j, 3)]
            + [Jp[0][j] * r[0] + Jp[1][j] * r[1] for j in range(3)], -1)
        pt_red = _seg_sum(pt_pack, pt_idx, P, pt_sorted)            # (P, 9)
        Vpp_f = pt_red[:, :6]        # [v00 v01 v02 v11 v12 v22]
        gp = pt_red[:, 6:9]
        Wcp_f = jnp.stack([Jc[0][a] * Jp[0][b] + Jc[1][a] * Jp[1][b]
                           for a in range(6) for b in range(3)], -1)  # (O,18)
        return (Ucc, Vpp_f, Wcp_f, gc, gp)

    compute_blocks = compute_blocks_flat if flat_layout else compute_blocks_dense

    def lm_step(carry, blocks):
        cams, points, lam, cost = carry
        Ucc, Vpp, Wcp, gc, gp = blocks

        damp_c = lam * (jnp.einsum("caa->ca", Ucc) + 1e-8)                  # (C,6)
        if flat_layout:
            # Vpp is (P, 6) sym-flat, Wcp is (O, 18) flat.
            vdiag_mean = ((Vpp[:, 0] + Vpp[:, 3]) + Vpp[:, 5]) / 3.0
            Vinv_f = _spd_inv3_flat(Vpp, lam * (vdiag_mean + 1e-8))         # (P,9)
            Vinv_gp = _apply3_flat(Vinv_f, gp)                              # (P,3)
            b = gc - seg_cam(_wcp_apply_p(
                Wcp, jnp.take(Vinv_gp, pt_idx, axis=0,
                              indices_are_sorted=pt_sorted)))
        else:
            Vinv = _spd_inv3(Vpp, lam * (jnp.einsum("paa->pa", Vpp).mean(-1) + 1e-8))
            # Reduced RHS: b = gc − W V⁻¹ gp   (gathered per observation).
            Vinv_gp = jnp.einsum("pab,pb->pa", Vinv, gp)                    # (P,3)
            b = gc - seg_cam(
                jnp.einsum("oab,ob->oa", Wcp,
                           jnp.take(Vinv_gp, pt_idx, axis=0,
                                    indices_are_sorted=pt_sorted)))

        def schur_matvec(x):  # x: (C, 6)
            Ux = jnp.einsum("cab,cb->ca", Ucc, x) + damp_c * x
            if flat_layout:
                a = _wcp_apply_c(Wcp, x[cam_idx])                           # (O,3)
                bp = _seg_sum(a, pt_idx, P, pt_sorted)                      # (P,3)
                cp = _apply3_flat(Vinv_f, bp)
                d = _wcp_apply_p(Wcp, jnp.take(cp, pt_idx, axis=0,
                                               indices_are_sorted=pt_sorted))
                return Ux - seg_cam(d)
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
        if flat_layout:
            a = _seg_sum(_wcp_apply_c(Wcp, dc[cam_idx]), pt_idx, P)
            dp = _apply3_flat(Vinv_f, gp - a) * pt_free
        else:
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
        if flat_layout:
            blocks0 = (jnp.zeros((C, 6, 6), dtype), jnp.zeros((P, 6), dtype),
                       jnp.zeros((O, 18), dtype), jnp.zeros((C, 6), dtype),
                       jnp.zeros((P, 3), dtype))
        else:
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
