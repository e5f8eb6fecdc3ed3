"""Perspective-n-Point: batched DLT hypotheses + Levenberg–Marquardt polish.

Replaces cv2.solvePnPRansac (ref sfm.py:116). Hypotheses are 6-point DLT
solves `vmap`ed inside the generic RANSAC harness; the winner is polished by
a fixed-iteration masked LM on the inlier set (fixed shapes, jit-friendly).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu3d.core.lie import so3_exp, so3_log
from tpu3d.geometry.ransac import ransac

# Minimal DLT needs 6 points; sampling a few extra makes each hypothesis far
# more stable under pixel noise at negligible extra cost (the solve is one
# batched 12x12 eigenproblem either way).
PNP_SAMPLE_SIZE = 10


def pnp_dlt(X: jnp.ndarray, x: jnp.ndarray, weights: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direct linear transform PnP.

    X: (N, 3) world points, x: (N, 2) focal-normalized observations,
    weights: optional (N,) mask. Returns world->cam (R (3,3), t (3,)).
    Needs N >= 6 effective points."""
    if weights is None:
        weights = jnp.ones(X.shape[0], X.dtype)
    n = X.shape[0]
    # Hartley-style normalization of the 3D points: without it the DLT is
    # hopeless in float32 on real SfM clouds (triangulated depths span
    # orders of magnitude). Solve in the normalized frame X' = (X - c)/s,
    # then map the pose back: x_cam = R'(X - c)/s + t' up to the scale s,
    # so R = R', t = s t' - R' c (projection is scale-invariant).
    wsum = jnp.maximum(jnp.sum(weights), 1.0)
    c = jnp.sum(X * weights[:, None], axis=0) / wsum
    s = jnp.sqrt(jnp.sum(jnp.sum((X - c) ** 2, -1) * weights) / wsum) + 1e-9
    X = (X - c) / s
    ones = jnp.ones((n, 1), X.dtype)
    zeros = jnp.zeros((n, 4), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=-1)  # (N, 4)
    u = x[..., 0:1]
    v = x[..., 1:2]
    row0 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # (N, 12)
    row1 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([row0 * weights[:, None], row1 * weights[:, None]], axis=0)
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    p = V[:, 0]
    P = p.reshape(3, 4)
    # Fix the overall sign with cheirality: a valid P ≈ s·[R|t] with s > 0
    # puts the (majority of) points at positive projective depth P₃·Xh.
    depth = jnp.einsum("j,nj->n", P[2], Xh)
    P = P * jnp.sign(jnp.sum(jnp.sign(depth) * weights) + 0.5)
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    # Closest proper rotation (det safeguard via last-column sign flip).
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    R = (U * jnp.array([1.0, 1.0, 1.0])[None, :].at[0, 2].set(d)) @ Vt
    t_norm = P[:, 3] / jnp.maximum(jnp.mean(S), 1e-12)
    # De-normalize (see note above).
    t = s * t_norm - R @ c
    return R, t


def _reproj_residual(params: jnp.ndarray, X: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Masked reprojection residual, flattened (2N,). params = [rvec, t]."""
    R = so3_exp(params[:3])
    t = params[3:6]
    Xc = jnp.einsum("ij,nj->ni", R, X) + t
    z = Xc[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    pred = Xc[..., :2] / z_safe
    r = (pred - x) * w[:, None]
    return r.reshape(-1)


def refine_pose(
    R: jnp.ndarray,
    t: jnp.ndarray,
    X: jnp.ndarray,
    x: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 10,
    lm_lambda: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration Levenberg–Marquardt polish of a world->cam pose on
    focal-normalized observations. Masked, static shapes, jit-safe."""
    params0 = jnp.concatenate([so3_log(R), t])

    def step(carry, _):
        params, lam = carry
        r = _reproj_residual(params, X, x, weights)
        J = jax.jacfwd(_reproj_residual)(params, X, x, weights)  # (2N, 6)
        JtJ = J.T @ J
        g = J.T @ r
        H = JtJ + lam * jnp.diag(jnp.diag(JtJ) + 1e-8)
        delta = jnp.linalg.solve(H, g)
        new_params = params - delta
        new_r = _reproj_residual(new_params, X, x, weights)
        improved = jnp.sum(new_r**2) < jnp.sum(r**2)
        params = jnp.where(improved, new_params, params)
        lam = jnp.where(improved, lam * 0.3, lam * 3.0)
        return (params, lam), None

    (params, _), _ = jax.lax.scan(step, (params0, jnp.asarray(lm_lambda, X.dtype)), None, length=iters)
    return so3_exp(params[:3]), params[3:6]


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
def pnp_ransac(
    key: jax.Array,
    X: jnp.ndarray,
    x: jnp.ndarray,
    valid: jnp.ndarray,
    threshold_norm_sq: float,
    num_hypotheses: int = 256,
    refine_iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RANSAC PnP on padded arrays.

    X: (N, 3), x: (N, 2) focal-normalized, valid: (N,) mask,
    threshold_norm_sq: squared inlier threshold in normalized units
    ((px_threshold / focal)²). Returns (R, t, inlier_mask, inlier_count)."""
    with jax.default_matmul_precision("float32"):  # bf16 MXU breaks DLT/LM
        def solver(idx):
            # Polish every hypothesis to its sample's reprojection optimum
            # BEFORE scoring. The raw DLT null vector comes from a 12x12
            # eigh whose TPU (Jacobi) and CPU (LAPACK) last bits differ
            # enough to flip winner selection and accept gates on weak
            # problems (replay-measured: 8/645 accept flips, pose drift up
            # to 180 deg). Three damped GN steps put both backends at the
            # same optimum — same cure as refine_triangulation_gn for the
            # DLT triangulation gate.
            Rh, th = pnp_dlt(X[idx], x[idx])
            Rh, th = refine_pose(Rh, th, X[idx], x[idx],
                                 jnp.ones(idx.shape[0], X.dtype), iters=3)
            return jnp.concatenate([Rh.reshape(-1), th])

        def scorer(model):
            R = model[:9].reshape(3, 3)
            t = model[9:12]
            Xc = jnp.einsum("ij,nj->ni", R, X) + t
            z = Xc[..., 2:3]
            behind = z[..., 0] <= 1e-6
            z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
            pred = Xc[..., :2] / z_safe
            err = jnp.sum((pred - x) ** 2, axis=-1)
            return jnp.where(behind, jnp.inf, err)

        model, inliers, _ = ransac(
            key, solver, scorer, valid, PNP_SAMPLE_SIZE, num_hypotheses, threshold_norm_sq
        )
        R = model[:9].reshape(3, 3)
        t = model[9:12]
        R, t = refine_pose(R, t, X, x, inliers.astype(X.dtype), iters=refine_iters)
        # Recount against the polished pose — the polished model is strictly
        # better than the minimal hypothesis, so the support set grows.
        Rt = jnp.concatenate([R.reshape(-1), t])
        err = scorer(Rt)
        inliers = (err < threshold_norm_sq) & (valid > 0)
        return R, t, inliers, jnp.sum(inliers)
