"""Batched two-view triangulation.

Replaces cv2.triangulatePoints (ref sfm.py:27). The reference triangulates
one pair's points through OpenCV's DLT on the CPU; here the homogeneous DLT
is a per-point 4x4 symmetric eigenproblem, `vmap`ed over every point of the
pair in a single XLA batch.
"""
from __future__ import annotations

import jax.numpy as jnp


def _projection_rows(P: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows per view: [u·P₃ - P₁ ; v·P₃ - P₂]. P: (3,4) or (...,3,4),
    x: (..., 2) focal-normalized observations."""
    u = x[..., 0:1]
    v = x[..., 1:2]
    return jnp.stack(
        [
            u[..., 0, None] * P[..., 2, :] - P[..., 0, :],
            v[..., 0, None] * P[..., 2, :] - P[..., 1, :],
        ],
        axis=-2,
    )


def triangulate_dlt(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
) -> jnp.ndarray:
    """DLT triangulation of (..., N, 2) focal-normalized correspondences seen
    from world->camera poses (R0,t0) and (R1,t1). Returns (..., N, 3) world
    points. Works on padded inputs — garbage in, garbage out, mask downstream.
    """
    P0 = jnp.concatenate([R0, t0[..., :, None]], axis=-1)  # (..., 3, 4)
    P1 = jnp.concatenate([R1, t1[..., :, None]], axis=-1)
    rows0 = _projection_rows(P0[..., None, :, :], x0)  # (..., N, 2, 4)
    rows1 = _projection_rows(P1[..., None, :, :], x1)
    A = jnp.concatenate([rows0, rows1], axis=-2)  # (..., N, 4, 4)
    AtA = jnp.einsum("...nij,...nik->...njk", A, A)
    _, V = jnp.linalg.eigh(AtA)
    Xh = V[..., :, 0]  # (..., N, 4)
    w = Xh[..., 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return Xh[..., :3] / w_safe


def triangulate_midpoint(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
) -> jnp.ndarray:
    """Fast midpoint triangulation (used for cheirality voting inside pose
    recovery, where full DLT accuracy is unnecessary)."""
    # Camera centers and world-space ray directions.
    c0 = -jnp.einsum("...ji,...j->...i", R0, t0)
    c1 = -jnp.einsum("...ji,...j->...i", R1, t1)
    d0 = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    d1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    d0 = jnp.einsum("...ji,...nj->...ni", R0, d0)
    d1 = jnp.einsum("...ji,...nj->...ni", R1, d1)
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    b = c1 - c0
    d01 = jnp.einsum("...ni,...ni->...n", d0, d1)
    denom = jnp.maximum(1.0 - d01**2, 1e-9)
    bd0 = jnp.einsum("...i,...ni->...n", b, d0)
    bd1 = jnp.einsum("...i,...ni->...n", b, d1)
    s0 = (bd0 - d01 * bd1) / denom
    s1 = (d01 * bd0 - bd1) / denom
    p0 = c0[..., None, :] + s0[..., None] * d0
    p1 = c1[..., None, :] + s1[..., None] * d1
    return 0.5 * (p0 + p1)


def _solve33(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve via the adjugate (Cramer). Avoids batched LU on
    TPU for tiny systems and is exactly reproducible across backends."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    x0 = c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]
    x1 = c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]
    x2 = c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]
    return jnp.stack([x0, x1, x2], axis=-1) / det[..., None]


def refine_triangulation_gn(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    X: jnp.ndarray,
    iters: int = 2,
) -> jnp.ndarray:
    """Damped Gauss-Newton refinement of triangulated points against the
    two-view reprojection error (3 unknowns, 4 residuals per point).

    DLT via a 4x4 eigh is backend-precision-sensitive (TPU vs CPU eigh
    noise measurably flips downstream registration decisions); a couple of
    GN steps converge both backends to the same local optimum, decoupling
    the pipeline from eigh's least significant bits. Steps that would
    increase the residual are rejected, so this can never be worse than
    the DLT initialization. Fully batched over (..., N, 3) points.
    """

    def residual_and_jac(X):
        rows = []
        jacs = []
        for R, t, x in ((R0, t0, x0), (R1, t1, x1)):
            Xc = jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
            z = Xc[..., 2:3]
            z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
            pred = Xc[..., :2] / z_safe
            r = pred - x  # (..., N, 2)
            # d pred / d Xc = [I2 | -pred] / z ; chain through R.
            Rb = jnp.broadcast_to(R[..., None, :, :], (*Xc.shape[:-1], 3, 3))
            J = (Rb[..., :2, :] - pred[..., :, None] * Rb[..., 2:3, :]) / z_safe[..., None]
            rows.append(r)
            jacs.append(J)
        r = jnp.concatenate(rows, axis=-1)  # (..., N, 4)
        J = jnp.concatenate(jacs, axis=-2)  # (..., N, 4, 3)
        return r, J

    def step(X):
        r, J = residual_and_jac(X)
        JtJ = jnp.einsum("...nki,...nkj->...nij", J, J)
        Jtr = jnp.einsum("...nki,...nk->...ni", J, r)
        damp = 1e-9 + 1e-6 * jnp.trace(JtJ, axis1=-2, axis2=-1)
        JtJ = JtJ + damp[..., None, None] * jnp.eye(3, dtype=X.dtype)
        dX = _solve33(JtJ, Jtr)
        X_new = X - dX
        # Monotonic guard: keep the step only where it lowers the cost.
        cost_old = jnp.sum(r**2, axis=-1)
        r_new, _ = residual_and_jac(X_new)
        cost_new = jnp.sum(r_new**2, axis=-1)
        better = (cost_new < cost_old) & jnp.all(jnp.isfinite(X_new), axis=-1)
        return jnp.where(better[..., None], X_new, X)

    for _ in range(iters):
        X = step(X)
    return X
