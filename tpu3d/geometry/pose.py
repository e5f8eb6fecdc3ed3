"""Relative pose from an essential matrix + cheirality disambiguation.

Replaces cv2.recoverPose (ref sfm.py:118,120, matching.py:139). The four
(R, t) candidates from the SVD decomposition are all tested at once: each
candidate triangulates the full (masked) correspondence set in one batch and
the candidate with the most points in front of both cameras wins — the same
cheirality vote OpenCV does serially.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from tpu3d.geometry.triangulate import triangulate_midpoint


def decompose_essential(E: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E -> (Rs (4, 3, 3), ts (4, 3)): the four candidate world->cam1 poses
    (assuming cam0 = [I|0]), with unit-norm translation."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def cheirality_counts(
    Rs: jnp.ndarray,
    ts: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each of the 4 candidates, triangulate all points and count those
    with positive depth in both views. Returns (counts (4,), front (4, N))."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Rs.dtype), Rs.shape)
    zero = jnp.zeros_like(ts)
    X = triangulate_midpoint(eye, zero, Rs, ts, x0[None], x1[None])  # (4, N, 3)
    z0 = X[..., 2]
    Xc1 = jnp.einsum("cij,cnj->cni", Rs, X) + ts[:, None, :]
    z1 = Xc1[..., 2]
    front = (z0 > 0) & (z1 > 0) & (valid[None, :] > 0)
    return jnp.sum(front, axis=-1), front


def recover_pose(
    E: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick the cheirality-consistent (R, t) from E and focal-normalized
    correspondences (N, 2). Returns (R, t, front_mask (N,)) where front_mask
    marks points in front of both cameras for the winning candidate — the
    analog of cv2.recoverPose's inlier mask (ref sfm.py:118)."""
    if valid is None:
        valid = jnp.ones(x0.shape[0], x0.dtype)
    Rs, ts = decompose_essential(E)
    counts, front = cheirality_counts(Rs, ts, x0, x1, valid)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], front[best]
