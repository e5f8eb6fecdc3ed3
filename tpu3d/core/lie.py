"""SO(3)/SE(3) closed-form exp/log maps.

TPU-native replacement for cv2.Rodrigues (used by the reference at
sfm.py:36,39,117 and sdf.py:55; the explicit Rodrigues formula also appears at
sdf.py:129-134). Everything here is pure jnp, differentiable, and `vmap`-safe:
the small-angle branches are implemented with `jnp.where` on Taylor-safe
expressions rather than python control flow, so gradients are finite at 0.
"""
from __future__ import annotations

import jax.numpy as jnp


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle vector -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    R = I + sinc(θ)·[w]ₓ + cosc(θ)·[w]ₓ² with θ = ‖w‖.

    Branches are expressed in θ² with the input to sqrt/sin/cos *also*
    where-guarded ("double-where"), so gradients are exact and finite at
    θ = 0 (jax.grad through a plain ‖w‖ would produce NaN there).
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    # sinc(θ) = sin(θ)/θ ; cosc(θ) = (1-cos(θ))/θ²
    sinc = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe)
    K = so3_hat(w)
    KK = K @ K
    a = sinc[..., None, None]
    b = cosc[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Uses the quaternion route for numerical stability near θ = π (where the
    classic trace formula loses the axis)."""
    q = rotation_to_quaternion(R)  # (w, x, y, z), w >= 0
    qw = jnp.clip(q[..., 0], -1.0, 1.0)
    qv = q[..., 1:]
    nv = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(nv, qw)
    small = nv < 1e-8
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-8), theta / jnp.where(small, 1.0, nv))
    return qv * scale[..., None]


def rotation_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> unit quaternion (..., 4) as (w, x, y, z) with w >= 0.

    Branch-free Shepperd's method: compute all four candidate constructions
    and select the best-conditioned one with `where` (vmap/jit-safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def cand(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    q0 = cand(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = cand(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = cand(m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21)
    q3 = cand(m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    onehot = (best[..., None] == jnp.arange(4)).astype(R.dtype)  # (..., 4)
    q = jnp.sum(qs * onehot[..., None], axis=-2)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Canonicalize sign: w >= 0.
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q * sign


def so3_exp_np(w):
    """Numpy twin of so3_exp for host-side bookkeeping (a single eager
    device op costs a full round-trip on remote-TPU backends)."""
    import numpy as np

    w = np.asarray(w, np.float64)
    theta = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if theta < 1e-8:
        return (np.eye(3) + K + 0.5 * K @ K).astype(np.float32)
    a = np.sin(theta) / theta
    b = (1 - np.cos(theta)) / theta**2
    return (np.eye(3) + a * K + b * K @ K).astype(np.float32)


def so3_log_np(R):
    """Numpy twin of so3_log (quaternion route)."""
    import numpy as np

    R = np.asarray(R, np.float64)
    tr = np.trace(R)
    q = np.empty(4)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q[:] = [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s]
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
        qv = np.empty(3)
        qv[i] = 0.25 * s
        qv[j] = (R[j, i] + R[i, j]) / s
        qv[k] = (R[k, i] + R[i, k]) / s
        q[:] = [(R[k, j] - R[j, k]) / s, *qv]
    if q[0] < 0:
        q = -q
    nv = np.linalg.norm(q[1:])
    if nv < 1e-12:
        return np.zeros(3, np.float32)
    theta = 2.0 * np.arctan2(nv, q[0])
    return (q[1:] / nv * theta).astype(np.float32)


def se3_apply(R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply world->camera transform: x_cam = R @ X + t.

    R: (..., 3, 3), t: (..., 3), X: (..., N, 3) or (..., 3)."""
    if X.ndim == R.ndim - 1:  # single point per batch element
        return jnp.einsum("...ij,...j->...i", R, X) + t
    return jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]


def se3_compose(R1, t1, R2, t2):
    """(R1,t1) ∘ (R2,t2): first apply (R2,t2), then (R1,t1)."""
    return R1 @ R2, jnp.einsum("...ij,...j->...i", R1, t2) + t1


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)
