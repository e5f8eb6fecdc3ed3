"""Essential-matrix estimation, TPU-native.

Replaces cv2.findEssentialMat (ref sfm.py:108, matching.py:134). The
reference relies on OpenCV's serial Nistér-5-point RANSAC; here estimation is
a *batched* normalized 8-point solver designed to be `vmap`ed over hypothesis
minibatches — hundreds of SVDs solved in one XLA batch instead of a serial
CPU loop. Points are pre-normalized by the focal length, so the pixel
threshold is converted once and conditioning is excellent in float32.
"""
from __future__ import annotations

import jax.numpy as jnp


def _hartley_normalize(x: jnp.ndarray, w: jnp.ndarray):
    """Weighted isotropic (Hartley) normalization of (..., N, 2) points.

    w is a (..., N) 0/1 mask of valid points. Returns (x_norm, T) with
    T the 3x3 similarity such that x_norm_h = T @ x_h."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(x * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    d = jnp.linalg.norm(x - mean, axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w, axis=-1, keepdims=True) / wsum, 1e-9)
    xn = (x - mean) * scale[..., None]
    s = scale[..., 0]
    mx = mean[..., 0, 0]
    my = mean[..., 0, 1]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * mx], axis=-1),
            jnp.stack([zeros, s, -s * my], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return xn, T


def _nullvec9_mgs(A: jnp.ndarray) -> jnp.ndarray:
    """Unit null vector of a batched (..., 8, 9) design matrix.

    Twice-iterated modified Gram–Schmidt on the rows, then the least-
    represented coordinate direction of the orthogonal complement. Fully
    unrolled vector arithmetic — on TPU this replaces a batched 9x9
    Jacobi eigensolve (the dominant cost of hypothesis batches; XLA's
    small-matrix eigh runs as a serial rotation loop). A rank-deficient
    (degenerate) sample yields a garbage vector that simply scores zero
    inliers downstream, exactly like eigh's noise vector would."""
    qs = []
    for k in range(A.shape[-2]):
        r = A[..., k, :]
        for _ in range(2):  # second MGS pass stabilizes f32
            for q in qs:
                r = r - jnp.sum(r * q, -1, keepdims=True) * q
        n = jnp.linalg.norm(r, axis=-1, keepdims=True)
        qs.append(r / jnp.maximum(n, 1e-12))
    Q = jnp.stack(qs, -2)                                        # (..., 8, 9)
    P = jnp.eye(9, dtype=A.dtype) - jnp.einsum("...ki,...kj->...ij", Q, Q)
    norms = jnp.linalg.norm(P, axis=-2)                          # (..., 9)
    j = jnp.argmax(norms, -1)
    v = jnp.take_along_axis(P, j[..., None, None], axis=-1)[..., 0]
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def essential_eight_point(x0: jnp.ndarray, x1: jnp.ndarray, weights: jnp.ndarray | None = None,
                          project: bool = True) -> jnp.ndarray:
    """Normalized 8-point essential matrix from focal-normalized correspondences.

    x0, x1: (..., N, 2) with N >= 8 (already divided by focal — i.e. in the
    canonical camera with K = I). weights: optional (..., N) mask; masked
    points get zero rows in the design matrix (enables fixed-capacity padded
    inputs under jit). Returns E (..., 3, 3), projected onto the essential
    manifold (singular values (1, 1, 0)), with the epipolar constraint
    x1ᵀ E x0 = 0.
    """
    if weights is None:
        weights = jnp.ones(x0.shape[:-1], x0.dtype)
    x0n, T0 = _hartley_normalize(x0, weights)
    x1n, T1 = _hartley_normalize(x1, weights)

    u0, v0 = x0n[..., 0], x0n[..., 1]
    u1, v1 = x1n[..., 0], x1n[..., 1]
    ones = jnp.ones_like(u0)
    # Row for x1^T F x0 = 0: [u1u0, u1v0, u1, v1u0, v1v0, v1, u0, v0, 1]
    A = jnp.stack([u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones], axis=-1)
    # Normalize by the effective row count: otherwise ||AtA|| grows with N
    # and the smallest eigenvalue of a many-point fit sinks below float32
    # eigh noise (absolute eigensolver error scales with the matrix norm).
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1.0)
    A = A * (weights / jnp.sqrt(wsum))[..., None]
    if A.shape[-2] == 8:
        # Minimal sample: exact one-dimensional null space — MGS instead
        # of eigh (see _nullvec9_mgs; this is the RANSAC hypothesis path,
        # hundreds of solves per candidate pair).
        f = _nullvec9_mgs(A)
    else:
        # Overdetermined fit: smallest eigvec of AᵀA (9x9).
        AtA = jnp.einsum("...ni,...nj->...ij", A, A)
        _, V = jnp.linalg.eigh(AtA)
        f = V[..., :, 0]  # eigenvector of smallest eigenvalue
    F = f.reshape(*f.shape[:-1], 3, 3)
    # Denormalize: F = T1ᵀ F T0
    F = jnp.swapaxes(T1, -1, -2) @ F @ T0
    if not project:
        # Hypothesis scoring can use the rank-unconstrained F directly
        # (Sampson consensus is insensitive to the manifold projection);
        # the caller projects only the winning model — this removes a
        # batched 3x3 SVD per hypothesis.
        return F
    return project_to_essential(F)


def project_to_essential(F: jnp.ndarray) -> jnp.ndarray:
    """Nearest essential matrix: singular values -> (1, 1, 0)."""
    U, S, Vt = jnp.linalg.svd(F)
    d = jnp.ones_like(S).at[..., 2].set(0.0)
    return U @ (d[..., :, None] * Vt)


def epipolar_residual(E: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Algebraic residual x1ᵀ E x0 for (..., N, 2) normalized points."""
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    Ex0 = jnp.einsum("...ij,...nj->...ni", E, x0h)
    return jnp.einsum("...ni,...ni->...n", x1h, Ex0)


def sampson_error(E: jnp.ndarray, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance², in normalized units.

    Multiply by focal² to get pixel². This is the scoring function for
    RANSAC, replacing OpenCV's internal error model."""
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    Ex0 = jnp.einsum("...ij,...nj->...ni", E, x0h)
    Etx1 = jnp.einsum("...ji,...nj->...ni", E, x1h)
    num = jnp.einsum("...ni,...ni->...n", x1h, Ex0) ** 2
    den = Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2 + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)
