"""Pinhole camera model in the reference's *centered* coordinate convention.

The reference stores keypoints with the principal point at the origin and the
y axis flipped up: ``u = x - W/2, v = -(y - H/2)`` (feature_extraction.py:34),
so its intrinsics are ``K = diag(f, f, 1)`` with zero principal point
(sfm.py:104, matching.py:133). We adopt the same convention: every 2D
coordinate flowing through geometry/sfm/ba is centered, and conversion to/from
pixel coordinates happens only at the image boundary (feature extraction and
dense-stage ray generation).

Note the y-flip makes the camera frame left-handed relative to the pixel
frame; since *both* views use the same flip, all two-view relations
(E matrix, triangulation, PnP) remain internally consistent — exactly as in
the reference.
"""
from __future__ import annotations

import jax.numpy as jnp


def intrinsics_matrix(focal: jnp.ndarray | float, dtype=jnp.float32) -> jnp.ndarray:
    """K = diag(f, f, 1) (ref sfm.py:104)."""
    f = jnp.asarray(focal, dtype=dtype)
    K = jnp.eye(3, dtype=dtype)
    K = K.at[0, 0].set(f).at[1, 1].set(f)
    return K


def pixel_to_centered(xy: jnp.ndarray, image_size: jnp.ndarray) -> jnp.ndarray:
    """(x, y) pixel -> centered y-up coords. image_size = (W, H).

    Mirrors feature_extraction.py:34."""
    w = image_size[..., 0:1]
    h = image_size[..., 1:2]
    return jnp.stack([xy[..., 0] - w[..., 0] / 2.0, -(xy[..., 1] - h[..., 0] / 2.0)], axis=-1)


def centered_to_pixel(uv: jnp.ndarray, image_size: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pixel_to_centered` (ref matching.py:109,116)."""
    w = image_size[..., 0:1]
    h = image_size[..., 1:2]
    return jnp.stack([uv[..., 0] + w[..., 0] / 2.0, -uv[..., 1] + h[..., 0] / 2.0], axis=-1)


def project_extrinsic(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, focal) -> jnp.ndarray:
    """Project world points (..., N, 3) through [R|t] into centered coords.

    TPU-native replacement for cv2.projectPoints (ref sfm.py:89,97).
    Returns (..., N, 2)."""
    Xc = jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
    z = Xc[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, jnp.where(z < 0, -1e-9, 1e-9), z)
    return focal * Xc[..., :2] / z_safe


def project(X: jnp.ndarray, focal) -> jnp.ndarray:
    """Project camera-frame points (..., N, 3) -> centered 2D."""
    z = X[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, jnp.where(z < 0, -1e-9, 1e-9), z)
    return focal * X[..., :2] / z_safe


def camera_center(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """World-space camera center C = -Rᵀ t for world->cam [R|t]."""
    return -jnp.einsum("...ji,...j->...i", R, t)


def camera_rays(R: jnp.ndarray, t: jnp.ndarray, uv: jnp.ndarray, focal) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World-space rays through centered image coords ``uv`` (..., N, 2).

    Returns (origins (..., 3), directions (..., N, 3), unit-normalized).
    Matches the reference's ray construction (sdf.py:138-141): pixel dir
    (u, v, 1)·K⁻¹ in the centered frame, rotated to world by Rᵀ."""
    d_cam = jnp.concatenate([uv / focal, jnp.ones_like(uv[..., :1])], axis=-1)
    d_world = jnp.einsum("...ji,...nj->...ni", R, d_cam)
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    origin = camera_center(R, t)
    return origin, d_world
