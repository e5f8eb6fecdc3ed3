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
