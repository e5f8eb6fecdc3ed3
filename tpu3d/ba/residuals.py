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

    Returns (r (O,2), Jc (O,2,6), Jp (O,2,3)).

    Per-CAMERA factors (Rodrigues R and dR/drvec) are computed once over
    the C cameras and gathered per observation — the naive vmapped jacfwd
    re-evaluated so3_exp with 9 tangents per OBSERVATION (O/C ~ 500x
    redundant work; measured 94 ms per LM iteration at O=262k). The
    per-observation part is the closed-form pinhole chain rule:
        Xc = R X + t,  p = Xc[:2] / z
        dp/dXc = [[1/z, 0, -x/z^2], [0, 1/z, -y/z^2]]
        Jp = dp/dXc @ R          Jc_t = dp/dXc
        Jc_rvec[k] = dp/dXc @ (dR/drvec_k X)
    identical math to jacfwd (same chain rule), tested for equivalence."""
    R_all = jax.vmap(so3_exp)(cams[:, :3])                       # (C,3,3)
    dR_all = jax.vmap(jax.jacfwd(so3_exp))(cams[:, :3])          # (C,3,3,3) [out_i, out_j, param_k]
    R = R_all[cam_idx]                                           # (O,3,3)
    dR = dR_all[cam_idx]                                         # (O,3,3,3)
    t = cams[cam_idx, 3:6]
    X = points[pt_idx]
    Xc = jnp.einsum("oij,oj->oi", R, X) + t
    z = Xc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8,
                       jnp.where(z < 0, -1e-8, 1e-8), z)
    r = (Xc[:, :2] / z_safe[:, None] - uv) * w[:, None]
    inv_z = 1.0 / z_safe
    # dp/dXc: (O, 2, 3)
    zero = jnp.zeros_like(inv_z)
    dp = jnp.stack([
        jnp.stack([inv_z, zero, -Xc[:, 0] * inv_z * inv_z], -1),
        jnp.stack([zero, inv_z, -Xc[:, 1] * inv_z * inv_z], -1),
    ], -2)
    dp = dp * w[:, None, None]
    Jp = jnp.einsum("oia,oaj->oij", dp, R)                       # (O,2,3)
    dXc_drvec = jnp.einsum("oajk,oj->oak", dR, X)                # (O,3,3) [out_a, param_k]
    Jc_rot = jnp.einsum("oia,oak->oik", dp, dXc_drvec)           # (O,2,3)
    Jc = jnp.concatenate([Jc_rot, dp], axis=-1)                  # (O,2,6)
    return r, Jc, Jp


def _observation_jacobians_jacfwd(cams, points, cam_idx, pt_idx, uv, w):
    """Reference implementation (vmapped jacfwd) — kept for the
    equivalence test."""

    def one(cam, X, uv_, w_):
        r = _residual_one(cam, X, uv_, w_)
        Jc = jax.jacfwd(_residual_one, argnums=0)(cam, X, uv_, w_)
        Jp = jax.jacfwd(_residual_one, argnums=1)(cam, X, uv_, w_)
        return r, Jc, Jp

    return jax.vmap(one)(cams[cam_idx], points[pt_idx], uv, w)
