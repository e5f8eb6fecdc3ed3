"""Batched five-point essential-matrix solver (Nistér's minimal problem),
formulated for TPU: no symbolic Gröbner elimination and no nonsymmetric
eigensolver (TPU has neither) — everything is fixed-shape batched linear
algebra:

  1. nullspace basis: the 4 smallest eigenvectors of QᵀQ (9x9 eigh) give
     E(x, y, z) = xW + yX + zY + Z;
  2. the 10 cubic constraints (det E = 0 and 2EEᵀE − tr(EEᵀ)E = 0) are
     never expanded symbolically: for a fixed z they are cubics in (x, y)
     whose 10 coefficients are recovered by EVALUATING the constraints at
     10 fixed generic (x, y) samples and multiplying by a precomputed
     inverse Vandermonde — giving the 10x10 matrix M(z) numerically;
  3. solutions require det M(z) = 0. d(z) has degree ≤ 10 (Nistér), so
     q(u) = cos^10(u)·d(tan u) is an 11-coefficient trig polynomial,
     reconstructed EXACTLY from 11 determinant samples at Chebyshev
     u-nodes; sign changes of q are scanned on a dense u-grid (one matmul)
     and refined by fixed-iteration bisection on q — all `vmap`ed;
  4. per root, (x, y) come from the nullvector of M(z) (10x10 eigh), and
     E is projected onto the essential manifold.

Each minimal sample yields up to MAX_ROOTS candidate models with a
validity mask, so the RANSAC layer scores (hypotheses x roots) models in
one batch. Replaces the capability of cv2.findEssentialMat's 5-point
kernel (ref sfm.py:108, matching.py:134); unlike the 8-point solver this
one handles planar scenes.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# r5 fast kernels (flat-layout constraints, unrolled GE determinant,
# closed-form essential projection) are the default; TPU3D_GATE_LEGACY=1
# restores the pre-r5 lowering for A/B runs, and TPU3D_GATE_FAST5=0
# disables only the five-point fast paths (granular bisect). Read at
# import time — the jitted gate functions trace whichever implementation
# is active.
_LEGACY = (os.environ.get("TPU3D_GATE_LEGACY", "") == "1"
           or os.environ.get("TPU3D_GATE_FAST5", "1") == "0")
# Component-level bisect knobs (r5): the full-dataset A/B showed the fast
# 5-point path costs recall; these isolate which kernel's rounding flips
# the gate cascades.
_LEGACY_DET = _LEGACY or os.environ.get("TPU3D_GATE_FAST5_DET", "1") == "0"
_LEGACY_PROJ = _LEGACY or os.environ.get("TPU3D_GATE_FAST5_PROJ", "1") == "0"
_LEGACY_CONSTR = (_LEGACY
                  or os.environ.get("TPU3D_GATE_FAST5_CONSTR", "1") == "0")

MAX_ROOTS = 10
GRID = 256           # sign-change scan resolution over the warped real line
BISECT_ITERS = 30

# --- constant xy-interpolation machinery (float64 on host, then frozen) ---
# monomial order: [x^3, x^2 y, x y^2, y^3, x^2, x y, y^2, x, y, 1]
_RNG = np.random.default_rng(12345)
_XY = _RNG.uniform(-1.5, 1.5, (10, 2))


def _monomials_xy(x, y):
    return np.stack([x**3, x**2 * y, x * y**2, y**3, x**2, x * y, y**2, x, y, np.ones_like(x)], -1)


_VXY = _monomials_xy(_XY[:, 0], _XY[:, 1])            # (10, 10)
_VXY_INV_T = np.linalg.inv(_VXY).T.astype(np.float32)  # M = C @ _VXY_INV_T


def _constraints(E: jnp.ndarray) -> jnp.ndarray:
    """The 10 Demazure constraints for a batch of E: (..., 3, 3) ->
    (..., 10): [det E, (2 E Eᵀ E − tr(E Eᵀ) E).flatten()]."""
    det = jnp.linalg.det(E)
    EEt = E @ jnp.swapaxes(E, -1, -2)
    tr = jnp.trace(EEt, axis1=-2, axis2=-1)
    G = 2.0 * (EEt @ E) - tr[..., None, None] * E
    return jnp.concatenate([det[..., None], G.reshape(*E.shape[:-2], 9)], axis=-1)


def _constraints_flat(e) -> jnp.ndarray:
    """The 10 Demazure constraints written COMPONENT-WISE: e is (9, ...)
    (the entries [a b c; d f g-row...] of E as separate arrays) -> (10, ...).

    Identical math to `_constraints`, but every operation is elementwise
    over the batch axes: the (..., 3, 3)-shaped formulation forces XLA to
    tile the trailing (3, 3) dims onto (8, 128) registers — a ~14x layout
    inflation that made `_M_of_z` the dominant cost of the whole match
    gate (r5 profile: 1.79 s standalone vs ~0.04 s of actual bandwidth at
    the production block shape)."""
    a, b, c, d, f, g, h, i, j = (e[k] for k in range(9))
    # E = [[a, b, c], [d, f, g], [h, i, j]]
    det = a * (f * j - g * i) - b * (d * j - g * h) + c * (d * i - f * h)
    # M = E Eᵀ (symmetric)
    m00 = a * a + b * b + c * c
    m01 = a * d + b * f + c * g
    m02 = a * h + b * i + c * j
    m11 = d * d + f * f + g * g
    m12 = d * h + f * i + g * j
    m22 = h * h + i * i + j * j
    tr = m00 + m11 + m22
    # G = 2 (E Eᵀ) E − tr·E, row-major components
    g0 = 2.0 * (m00 * a + m01 * d + m02 * h) - tr * a
    g1 = 2.0 * (m00 * b + m01 * f + m02 * i) - tr * b
    g2 = 2.0 * (m00 * c + m01 * g + m02 * j) - tr * c
    g3 = 2.0 * (m01 * a + m11 * d + m12 * h) - tr * d
    g4 = 2.0 * (m01 * b + m11 * f + m12 * i) - tr * f
    g5 = 2.0 * (m01 * c + m11 * g + m12 * j) - tr * g
    g6 = 2.0 * (m02 * a + m12 * d + m22 * h) - tr * h
    g7 = 2.0 * (m02 * b + m12 * f + m22 * i) - tr * i
    g8 = 2.0 * (m02 * c + m12 * g + m22 * j) - tr * j
    return jnp.stack([det, g0, g1, g2, g3, g4, g5, g6, g7, g8])


def _nullspace_basis(x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """(5, 2) correspondences -> (4, 3, 3) basis spanning the E nullspace.

    The (5, 9) design matrix has an EXACT 4-dimensional null space, so the
    basis comes from unrolled Gram–Schmidt instead of a 9x9 eigensolve
    (XLA's small eigh is a serial Jacobi loop — the hypothesis path runs
    hundreds of these per candidate pair): orthonormalize the 5 rows, form
    the orthogonal-complement projector, and orthonormalize its 4 most
    independent columns. Any orthonormal null basis is equally valid — the
    solver parametrizes E over the span, and the z-degree bound (Nistér)
    is basis-independent. A degenerate (rank<5) sample yields a bogus
    basis whose models score no inliers, as with eigh."""
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    ones = jnp.ones_like(u0)
    Q = jnp.stack([u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones], axis=-1)
    qs = []
    for k in range(5):
        r = Q[k]
        for _ in range(2):
            for q in qs:
                r = r - jnp.sum(r * q) * q
        qs.append(r / jnp.maximum(jnp.linalg.norm(r), 1e-12))
    Qo = jnp.stack(qs)                                   # (5, 9)
    P = jnp.eye(9, dtype=Q.dtype) - Qo.T @ Qo            # (9, 9) projector
    order = jnp.argsort(-jnp.linalg.norm(P, axis=0))     # most independent first
    cols = P.T[order]                                    # (9, 9) rows = candidate basis
    basis = []
    for k in range(4):
        r = cols[k]
        for _ in range(2):
            for q in basis:
                r = r - jnp.sum(r * q) * q
        basis.append(r / jnp.maximum(jnp.linalg.norm(r), 1e-12))
    return jnp.stack(basis).reshape(4, 3, 3)


def _M_of_z(basis: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Numeric M(z): (..., 10, 10) for a batch of z values.
    basis: (4, 3, 3) = [W, X, Y, Zb].

    Component-wise formulation (r5): E's 9 entries are separate flat
    arrays, so the constraint evaluation is pure elementwise VPU work —
    the (..., 3, 3)-shaped path inflated ~14x under XLA's (8, 128)
    register tiling of the trailing dims and dominated the match gate."""
    if _LEGACY_CONSTR:
        xs = jnp.asarray(_XY[:, 0], jnp.float32)
        ys = jnp.asarray(_XY[:, 1], jnp.float32)
        W, X, Y, Zb = basis[0], basis[1], basis[2], basis[3]
        E = (xs[:, None, None] * W + ys[:, None, None] * X
             + z[..., None, None, None] * Y + Zb)
        C = _constraints(E)
        C = jnp.swapaxes(C, -1, -2)
        return C @ jnp.asarray(_VXY_INV_T)
    bflat = basis.reshape(4, 9)
    xs = jnp.asarray(_XY[:, 0], jnp.float32)   # (S,)
    ys = jnp.asarray(_XY[:, 1], jnp.float32)
    z = jnp.asarray(z)
    # e[k][..., s] = xs_s W_k + ys_s X_k + z Y_k + Z_k : (9, ..., S)
    stat = (bflat[0][:, None] * xs[None, :]
            + bflat[1][:, None] * ys[None, :]
            + bflat[3][:, None])               # (9, S)
    sh = (9,) + (1,) * z.ndim + (xs.shape[0],)
    e = stat.reshape(sh) + bflat[2].reshape(sh[:-1] + (1,)) * z[None, ..., None]
    C = _constraints_flat(e)                   # (10, ..., S)
    # M[..., j, t] = sum_s C[j, ..., s] * VXY_INV_T[s, t]
    return jnp.einsum("j...s,st->...jt", C, jnp.asarray(_VXY_INV_T))


def _detM(basis: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.det(_M_of_z(basis, z))


def _det10_ge(A: jnp.ndarray) -> jnp.ndarray:
    """Batched 10x10 determinant by UNROLLED Gaussian elimination with
    partial pivoting: 9 straight-line steps of vectorized argmax + masked
    swap + rank-1 update. XLA's batched LU (jnp.linalg.det) is a serial
    per-matrix loop that measured ~2x slower at the gate's 90k-matrix
    batch (r5 probe: 0.146 s vs 0.280 s); same det up to f32 rounding."""
    n = A.shape[-1]
    det = jnp.ones(A.shape[:-2], A.dtype)
    rows = jnp.arange(n)
    for k in range(n - 1):
        col = jnp.abs(A[..., :, k])
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col, axis=-1)                      # (...,)
        pr = jnp.take_along_axis(
            A, p[..., None, None].repeat(n, -1), axis=-2)[..., 0, :]
        kr = A[..., k, :]
        det = jnp.where(p != k, -det, det)
        onehot_k = (rows == k).astype(A.dtype)[:, None]
        onehot_p = (rows[None] == p[..., None]).astype(A.dtype)[..., None]
        A = (A + onehot_k * (pr - kr)[..., None, :]
             + onehot_p * (kr - pr)[..., None, :])
        piv = A[..., k, k]
        det = det * piv
        piv_safe = jnp.where(jnp.abs(piv) < 1e-30, 1e-30, piv)
        factors = A[..., :, k] / piv_safe[..., None]
        factors = jnp.where(rows > k, factors, 0.0)
        A = A - factors[..., None] * A[..., k, :][..., None, :]
    return det * A[..., n - 1, n - 1]


def _project_essential_fast(E: jnp.ndarray) -> jnp.ndarray:
    """Closed-form projection onto the essential manifold (singular values
    -> (1, 1, 0)) without a batched 3x3 SVD (XLA lowers those to a serial
    Jacobi/QR loop; 3.5x slower at gate batches, r5 probe).

    Path: symmetric closed-form eigenvalues of EᵀE (trigonometric 3x3
    formula), smallest eigenvector v3 by the cross-product method, and the
    top-2 inverse-sqrt as the STABLE divided-difference linear spectral
    interpolant  g(A) = aA + b  with  a = -1/(s1 s2 (s1+s2)),  composed
    with the projector (I - v3 v3ᵀ):   E_ess = E (aEᵀE + bI)(I - v3v3ᵀ)
    = U diag(1,1,0) Vᵀ. Accuracy degrades only when sigma2 ~ sigma3 — a
    matrix far from the essential manifold, i.e. a RANSAC hypothesis that
    loses the vote anyway; per-edge WINNERS keep the exact SVD path."""
    a_, b_, c_ = E[..., 0, 0], E[..., 0, 1], E[..., 0, 2]
    d_, f_, g_ = E[..., 1, 0], E[..., 1, 1], E[..., 1, 2]
    h_, i_, j_ = E[..., 2, 0], E[..., 2, 1], E[..., 2, 2]
    # EtE (symmetric): columns of E dotted
    m00 = a_ * a_ + d_ * d_ + h_ * h_
    m01 = a_ * b_ + d_ * f_ + h_ * i_
    m02 = a_ * c_ + d_ * g_ + h_ * j_
    m11 = b_ * b_ + f_ * f_ + i_ * i_
    m12 = b_ * c_ + f_ * g_ + i_ * j_
    m22 = c_ * c_ + g_ * g_ + j_ * j_
    q = (m00 + m11 + m22) / 3.0
    a00, a11, a22 = m00 - q, m11 - q, m22 - q
    p2 = (a00 * a00 + a11 * a11 + a22 * a22
          + 2.0 * (m01 * m01 + m02 * m02 + m12 * m12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    # det of (EtE - qI)/p
    detB = (a00 * (a11 * a22 - m12 * m12)
            - m01 * (m01 * a22 - m12 * m02)
            + m02 * (m01 * m12 - a11 * m02)) / (p * p * p)
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # v3: largest cross product of rows of (EtE - e3 I)
    c00, c11, c22 = m00 - e3, m11 - e3, m22 - e3
    r0 = (c00, m01, m02)
    r1 = (m01, c11, m12)
    r2 = (m02, m12, c22)

    def cross(u, v):
        return (u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0])

    x01, x02, x12 = cross(r0, r1), cross(r0, r2), cross(r1, r2)
    n01 = x01[0] ** 2 + x01[1] ** 2 + x01[2] ** 2
    n02 = x02[0] ** 2 + x02[1] ** 2 + x02[2] ** 2
    n12 = x12[0] ** 2 + x12[1] ** 2 + x12[2] ** 2
    use02 = n02 > n01
    nbest = jnp.where(use02, n02, n01)
    use12 = n12 > nbest
    v3 = [jnp.where(use12, x12[k], jnp.where(use02, x02[k], x01[k]))
          for k in range(3)]
    nv = jnp.sqrt(jnp.maximum(
        v3[0] ** 2 + v3[1] ** 2 + v3[2] ** 2, 1e-30))
    v3 = [vk / nv for vk in v3]
    # stable top-2 inverse-sqrt interpolant
    s1 = jnp.sqrt(jnp.maximum(e1, 1e-30))
    s2 = jnp.sqrt(jnp.maximum(e2, 1e-30))
    av = -1.0 / (s1 * s2 * (s1 + s2))
    bv = 1.0 / s1 - av * e1
    # T = (a EtE + b I), then project out v3:  M = T (I - v3 v3ᵀ)
    T = [[av * m00 + bv, av * m01, av * m02],
         [av * m01, av * m11 + bv, av * m12],
         [av * m02, av * m12, av * m22 + bv]]
    Tv3 = [T[r][0] * v3[0] + T[r][1] * v3[1] + T[r][2] * v3[2]
           for r in range(3)]
    M = [[T[r][c] - Tv3[r] * v3[c] for c in range(3)] for r in range(3)]
    # E_ess = E @ M
    Erows = [(a_, b_, c_), (d_, f_, g_), (h_, i_, j_)]
    out = [[Erows[r][0] * M[0][c] + Erows[r][1] * M[1][c]
            + Erows[r][2] * M[2][c] for c in range(3)] for r in range(3)]
    return jnp.stack([jnp.stack(row, -1) for row in out], -2)


# --- trig-polynomial determinant reconstruction --------------------------
# Nistér's theorem: d(z) = det M(z) is a polynomial of degree ≤ 10 (the
# classic 10th-degree five-point polynomial). Substituting z = tan(u),
# q(u) = cos(u)^10 · d(tan u) = det(cos(u) · M(tan u)) is a real trig
# polynomial of even frequencies ≤ 10 with period π — exactly 11
# coefficients, with NO value crush at u → ±π/2 (q(±π/2) = d's leading
# coefficient). Evaluating 11 determinants at Chebyshev u-nodes and
# applying a fixed inverse basis matrix reconstructs q exactly; the root
# scan and bisection then evaluate q through tiny matvecs instead of
# 10×10 determinants. The previous path paid GRID + MAX_ROOTS·BISECT_ITERS
# ≈ 556 determinant evaluations per hypothesis; this one pays 11.
# (Verified: 11-node reconstruction matches direct determinants to 1e-13
# relative over |u| ≤ 1.55 incl. |z| > 40; node-matrix cond ≈ 7.5.)
_N_COEF = 11  # 1 + 5 cos + 5 sin
_U_MAX = 1.3
_U_NODES = _U_MAX * np.cos(np.pi * (2 * np.arange(_N_COEF) + 1) / (2 * _N_COEF))


def _trig_basis_np(u: np.ndarray) -> np.ndarray:
    m = np.arange(1, _N_COEF // 2 + 1)
    return np.concatenate([
        np.ones((*u.shape, 1)),
        np.cos(2.0 * u[..., None] * m),
        np.sin(2.0 * u[..., None] * m),
    ], axis=-1)


_BASIS_INV = np.linalg.inv(_trig_basis_np(_U_NODES)).astype(np.float32)  # (11, 11)
_U_GRID = np.linspace(-np.pi / 2, np.pi / 2, GRID)
_GRID_BASIS = _trig_basis_np(_U_GRID).astype(np.float32)  # (GRID, 11)
_M_RANGE = np.arange(1, _N_COEF // 2 + 1, dtype=np.float32)


def _trig_eval(coeffs: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the reconstructed q at arbitrary u. coeffs (..., 11),
    u (...,) broadcast-compatible."""
    ang = 2.0 * u[..., None] * jnp.asarray(_M_RANGE)
    basis = jnp.concatenate(
        [jnp.ones((*u.shape, 1)), jnp.cos(ang), jnp.sin(ang)], axis=-1)
    return jnp.sum(basis * coeffs, axis=-1)


def _det_coeffs(basis: jnp.ndarray) -> jnp.ndarray:
    """11 trig coefficients of q(u) = cos^10(u)·det M(tan u)."""
    u = jnp.asarray(_U_NODES, jnp.float32)
    M = _M_of_z(basis, jnp.tan(u))              # (11, 10, 10)
    N = jnp.cos(u)[:, None, None] * M           # det N = cos^10 · det M
    # one global scale keeps det in f32 range without changing the
    # polynomial structure (per-sample scaling would)
    lam = jnp.maximum(jnp.max(jnp.abs(N)), 1e-12)
    det = jnp.linalg.det if _LEGACY_DET else _det10_ge
    q = det(N / lam)                            # (11,)
    return jnp.asarray(_BASIS_INV) @ q


def essential_five_point(x0: jnp.ndarray, x1: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the 5-point problem for one minimal sample.

    x0, x1: (5, 2) focal-normalized correspondences.
    Returns (E (MAX_ROOTS, 3, 3), valid (MAX_ROOTS,))."""
    basis = _nullspace_basis(x0, x1)

    # 1. bracket real roots of q(u) ~ det M(tan u) over u ∈ (-π/2, π/2)
    coeffs = _det_coeffs(basis)                # (11,)
    d = jnp.asarray(_GRID_BASIS) @ coeffs      # (GRID,)
    us = jnp.asarray(_U_GRID, jnp.float32)
    sign = jnp.sign(d)
    change = (sign[:-1] * sign[1:]) < 0        # (GRID-1,)
    # take up to MAX_ROOTS brackets (prefer large |slope| changes = robust)
    idx = jnp.argsort(jnp.where(change, 0.0, 1.0))[:MAX_ROOTS]
    have = change[idx]
    lo = us[idx]
    hi = us[idx + 1]

    # 2. fixed-iteration bisection per bracket (on the trig polynomial)
    d_lo = d[idx]

    def bis(carry, _):
        lo, hi, d_lo = carry
        mid = 0.5 * (lo + hi)
        d_mid = _trig_eval(coeffs, mid)
        go_left = (d_lo * d_mid) < 0
        new_lo = jnp.where(go_left, lo, mid)
        new_hi = jnp.where(go_left, mid, hi)
        new_dlo = jnp.where(go_left, d_lo, d_mid)
        return (new_lo, new_hi, new_dlo), None

    (lo, hi, _), _ = jax.lax.scan(bis, (lo, hi, d_lo), None, length=BISECT_ITERS)
    roots = jnp.tan(0.5 * (lo + hi))           # (MAX_ROOTS,) back to z

    # 3. per root: nullvector of M(z) -> (x, y); build E. At a root M is
    # rank-9, so the smallest eigenvector of MᵀM is isolated — 3 rounds of
    # Cholesky inverse iteration on the regularized normal matrix converge
    # to it for a fraction of the cost of a batched 10x10 eigh (XLA lowers
    # small eigh to a serial Jacobi loop; Cholesky+triangular solves are
    # straight-line batched arithmetic).
    M = _M_of_z(basis, roots)                  # (MAX_ROOTS, 10, 10)
    MtM = jnp.swapaxes(M, -1, -2) @ M
    eps = 1e-7 * jnp.trace(MtM, axis1=-2, axis2=-1)[..., None, None] + 1e-30
    L = jnp.linalg.cholesky(MtM + eps * jnp.eye(10, dtype=MtM.dtype))
    v = jnp.ones((M.shape[0], 10), MtM.dtype) / jnp.sqrt(10.0)
    for _ in range(3):
        v = jax.scipy.linalg.cho_solve((L, True), v[..., None])[..., 0]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    w = v[..., 9]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    x = v[..., 7] / w_safe
    y = v[..., 8] / w_safe
    W_, X_, Y_, Zb = basis[0], basis[1], basis[2], basis[3]
    E = (
        x[:, None, None] * W_
        + y[:, None, None] * X_
        + roots[:, None, None] * Y_
        + Zb
    )
    # project to the essential manifold (closed form; candidates from a
    # polynomial root are near-essential, so sigma3 is isolated and the
    # fast projection is accurate exactly where it matters)
    if _LEGACY_PROJ:
        U, S, Vt = jnp.linalg.svd(E)
        dvals = jnp.ones_like(S).at[..., 2].set(0.0)
        E = U @ (dvals[..., :, None] * Vt)
    else:
        E = _project_essential_fast(E)
    valid = have & (jnp.abs(w) > 1e-9)
    return E, valid


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def five_point_ransac(
    key: jax.Array,
    uv0: jnp.ndarray,
    uv1: jnp.ndarray,
    valid: jnp.ndarray,
    focal,
    threshold_px: float = 1.0,
    num_hypotheses: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RANSAC over 5-point minimal samples; every hypothesis contributes up
    to MAX_ROOTS models, all scored in one (H*MAX_ROOTS, N) batch.

    Returns (E, inliers, count) in the same convention as the 8-point path
    (Sampson threshold in pixels converted to normalized units)."""
    from tpu3d.geometry.epipolar import sampson_error
    from tpu3d.geometry.ransac import _sample_indices

    with jax.default_matmul_precision("float32"):
        x0 = uv0 / focal
        x1 = uv1 / focal
        thr_sq = (threshold_px / focal) ** 2
        idx = _sample_indices(key, valid, num_hypotheses, 5)   # (H, 5)
        Es, ok = jax.vmap(lambda i: essential_five_point(x0[i], x1[i]))(idx)
        Es = Es.reshape(-1, 3, 3)                              # (H*R, 3, 3)
        ok = ok.reshape(-1)
        errors = jax.vmap(lambda E: sampson_error(E, x0, x1))(Es)
        inl = (errors < thr_sq) & (valid > 0)[None, :] & ok[:, None]
        counts = jnp.sum(inl, axis=-1)
        best = jnp.argmax(counts)
        return Es[best], inl[best], counts[best]
