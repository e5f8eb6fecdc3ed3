"""Reprojection residuals + per-observation Jacobian blocks.

The reference's residual is cv2.projectPoints-based (sfm.py:87-91) with
finite-difference Jacobians driven by a scipy sparsity pattern (sfm.py:79-85).
Here the residual is pure jnp and the exact 2x6 / 2x3 Jacobian blocks come
from `jax.jacfwd` vmapped over observations — no sparsity pattern needed,
because the Schur solver (ba/lm.py) only ever touches per-observation blocks
and segment-sums.

Observation layout (the BA "problem matrix", fixed capacity, masked):
  cam_idx  (O,) int32   — camera id per observation
  pt_idx   (O,) int32   — point id per observation
  uv       (O, 2)       — focal-normalized centered observation
  w        (O,)         — 0/1 validity weight
Camera parametrization: (6,) = [so3_log(R), t], world->camera.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu3d.core.lie import so3_exp


def _project_one(cam: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    R = so3_exp(cam[:3])
    Xc = R @ X + cam[3:6]
    z = Xc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    return Xc[:2] / z_safe


def _residual_one(cam: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return (_project_one(cam, X) - uv) * w


@jax.jit
def reprojection_residuals(
    cams: jnp.ndarray,
    points: jnp.ndarray,
    cam_idx: jnp.ndarray,
    pt_idx: jnp.ndarray,
    uv: jnp.ndarray,
    w: jnp.ndarray,
) -> jnp.ndarray:
    """(O, 2) masked residuals."""
    return jax.vmap(_residual_one)(cams[cam_idx], points[pt_idx], uv, w)


def observation_jacobians(
    cams: jnp.ndarray,
    points: jnp.ndarray,
    cam_idx: jnp.ndarray,
    pt_idx: jnp.ndarray,
    uv: jnp.ndarray,
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-observation residuals and exact Jacobian blocks.

    Returns (r (O,2), Jc (O,2,6), Jp (O,2,3))."""

    def one(cam, X, uv_, w_):
        r = _residual_one(cam, X, uv_, w_)
        Jc = jax.jacfwd(_residual_one, argnums=0)(cam, X, uv_, w_)
        Jp = jax.jacfwd(_residual_one, argnums=1)(cam, X, uv_, w_)
        return r, Jc, Jp

    return jax.vmap(one)(cams[cam_idx], points[pt_idx], uv, w)
