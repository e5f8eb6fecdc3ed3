"""Round-5 gate micro-profile: sub-parts of the 5-point root extraction
and candidate TPU-friendly replacements, at the production batch shape
(B*H = 8192 solves, 10 roots each)."""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.geometry.fivepoint import _M_of_z, _nullspace_basis

BH = 64 * 128


def _get(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        _get(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        _get(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def det10_unrolled(A):
    """Batched 10x10 determinant by unrolled Gaussian elimination with
    partial pivoting: 9 straight-line steps of vectorized ops (argmax +
    masked swap + rank-1 update), no serial LU loop."""
    n = A.shape[-1]
    det = jnp.ones(A.shape[:-2], A.dtype)
    rows = jnp.arange(n)
    for k in range(n - 1):
        col = jnp.abs(A[..., :, k])
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col, axis=-1)                       # (...,)
        pr = jnp.take_along_axis(A, p[..., None, None].repeat(n, -1), axis=-2)[..., 0, :]
        kr = A[..., k, :]
        swapped = p != k
        det = jnp.where(swapped, -det, det)
        # write pivot row into k and k-th row into p
        onehot_k = (rows == k).astype(A.dtype)[..., :, None]
        onehot_p = (rows[None] == p[..., None]).astype(A.dtype)[..., :, None]
        A = A + onehot_k * (pr - kr)[..., None, :] + onehot_p * (kr - pr)[..., None, :]
        piv = A[..., k, k]
        det = det * piv
        piv_safe = jnp.where(jnp.abs(piv) < 1e-30, 1e-30, piv)
        factors = A[..., :, k] / piv_safe[..., None]
        factors = jnp.where(rows > k, factors, 0.0)
        A = A - factors[..., :, None] * A[..., k, :][..., None, :]
    return det * A[..., n - 1, n - 1]


def chol10_unrolled(A):
    """Batched unrolled Cholesky (10x10), straight-line."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        s = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        col = (A[..., :, j] - jnp.einsum("...ik,...k->...i", L[..., :, :j], L[..., j, :j])) / d[..., None]
        rows = jnp.arange(n)
        col = jnp.where(rows > j, col, 0.0)
        L = L.at[..., :, j].set(col)
        L = L.at[..., j, j].set(d)
    return L


def trisolve_unrolled(L, b, lower=True):
    """Batched unrolled triangular solve L x = b (10x10)."""
    n = L.shape[-1]
    x = []
    if lower:
        for i in range(n):
            s = b[..., i]
            for j in range(i):
                s = s - L[..., i, j] * x[j]
            x.append(s / L[..., i, i])
        return jnp.stack(x, -1)
    for i in range(n - 1, -1, -1):
        s = b[..., i]
        for j in range(i + 1, n):
            s = s - L[..., i, j] * x[n - 1 - j]
        x.append(s / L[..., i, i])
    return jnp.stack(x[::-1], -1)


def main():
    rng = np.random.default_rng(0)
    res = {}
    K = 2048
    FOCAL = 1035.0
    X = rng.uniform(-1, 1, (K, 3)) + np.array([0, 0, 4.0])
    uv0 = (X[:, :2] / X[:, 2:]) * FOCAL
    X1 = X + np.array([0.5, 0.1, 0.0])
    uv1 = (X1[:, :2] / X1[:, 2:]) * FOCAL
    x0 = jnp.asarray((uv0 / FOCAL).astype(np.float32))
    x1 = jnp.asarray((uv1 / FOCAL).astype(np.float32))
    idx = np.stack([rng.choice(K, 5, replace=False) for _ in range(BH)])
    s0, s1 = x0[jnp.asarray(idx)], x1[jnp.asarray(idx)]
    basis = jax.jit(jax.vmap(_nullspace_basis))(s0, s1)
    roots = jnp.asarray(rng.uniform(-3, 3, (BH, 10)).astype(np.float32))

    # --- sub-parts ---------------------------------------------------------
    mz = jax.jit(lambda b, z: jax.vmap(_M_of_z)(b, z))
    res["M_of_z_roots_s"] = timeit(lambda: mz(basis, roots))
    M = mz(basis, roots)                                  # (BH, 10, 10, 10)

    def chol_path(M):
        MtM = jnp.swapaxes(M, -1, -2) @ M
        eps = 1e-7 * jnp.trace(MtM, axis1=-2, axis2=-1)[..., None, None] + 1e-30
        L = jnp.linalg.cholesky(MtM + eps * jnp.eye(10, dtype=MtM.dtype))
        v = jnp.ones((*M.shape[:-2], 10), MtM.dtype) / jnp.sqrt(10.0)
        for _ in range(3):
            v = jax.scipy.linalg.cho_solve((L, True), v[..., None])[..., 0]
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
        return v

    res["cholpath_xla_s"] = timeit(jax.jit(chol_path), M)

    def chol_path_unrolled(M):
        MtM = jnp.swapaxes(M, -1, -2) @ M
        eps = 1e-7 * jnp.trace(MtM, axis1=-2, axis2=-1)[..., None, None] + 1e-30
        L = chol10_unrolled(MtM + eps * jnp.eye(10, dtype=MtM.dtype))
        v = jnp.ones((*M.shape[:-2], 10), MtM.dtype) / jnp.sqrt(10.0)
        for _ in range(3):
            y = trisolve_unrolled(L, v, lower=True)
            v = trisolve_unrolled(jnp.swapaxes(L, -1, -2), y, lower=False)
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
        return v

    res["cholpath_unrolled_s"] = timeit(jax.jit(chol_path_unrolled), M)
    # numeric agreement
    va = np.asarray(jax.jit(chol_path)(M))
    vb = np.asarray(jax.jit(chol_path_unrolled)(M))
    dots = np.abs(np.sum(va * vb, -1))
    res["cholpath_agree_mindot"] = float(np.min(dots))

    # --- 3x3 SVD projection ------------------------------------------------
    # (BH*10 = 81920 blows scoped VMEM in a standalone jit; time at 1/4 the
    # batch and scale — the op is batched-elementwise.)
    E = jnp.asarray(rng.standard_normal((BH * 10 // 4, 3, 3)).astype(np.float32))

    def proj_svd(E):
        U, S, Vt = jnp.linalg.svd(E)
        d = jnp.ones_like(S).at[..., 2].set(0.0)
        return U @ (d[..., :, None] * Vt)

    res["proj_svd3_s"] = timeit(jax.jit(proj_svd), E)

    def proj_polar(E):
        # E_ess = U diag(1,1,0) Vt. Compute via: G = E (EᵀE)^{-1/2} = U Vt
        # (polar), with (EᵀE)^{-1/2} by closed-form symmetric 3x3 eigs; then
        # E_ess = G - (G n) nᵀ where n = smallest right singular vector,
        # scaled: actually E_ess = U diag(1,1,0) Vt = G - u3 v3ᵀ. u3 v3ᵀ =
        # G v3 v3ᵀ. v3 = eigenvector of EᵀE for smallest eigenvalue.
        EtE = jnp.swapaxes(E, -1, -2) @ E
        # closed-form symmetric 3x3 eigenvalues
        q = jnp.trace(EtE, axis1=-2, axis2=-1) / 3.0
        A = EtE - q[..., None, None] * jnp.eye(3, dtype=E.dtype)
        p = jnp.sqrt(jnp.maximum(jnp.sum(A * A, axis=(-2, -1)) / 6.0, 1e-30))
        B = A / p[..., None, None]
        detB = jnp.linalg.det(B)
        phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
        # eigenvalues in decreasing order
        e1 = q + 2 * p * jnp.cos(phi)
        e3 = q + 2 * p * jnp.cos(phi + 2 * np.pi / 3)
        e2 = 3 * q - e1 - e3
        # smallest eigenvector via cross products of (EtE - e3 I) rows
        C = EtE - e3[..., None, None] * jnp.eye(3, dtype=E.dtype)
        c0 = jnp.cross(C[..., 0, :], C[..., 1, :])
        c1 = jnp.cross(C[..., 0, :], C[..., 2, :])
        c2 = jnp.cross(C[..., 1, :], C[..., 2, :])
        ns = jnp.stack([c0, c1, c2], -2)
        nrm = jnp.linalg.norm(ns, axis=-1)
        v3 = jnp.take_along_axis(
            ns, jnp.argmax(nrm, -1)[..., None, None].repeat(3, -1), -2)[..., 0, :]
        v3 = v3 / jnp.maximum(jnp.linalg.norm(v3, axis=-1, keepdims=True), 1e-30)
        # singular values: s1=sqrt(e1), s2=sqrt(e2)
        s1 = jnp.sqrt(jnp.maximum(e1, 1e-30))
        s2 = jnp.sqrt(jnp.maximum(e2, 1e-30))
        # U columns: u_i = E v_i / s_i; we need E_ess = s*(u1 v1ᵀ + u2 v2ᵀ)
        # with equalized s=1: E_ess = u1 v1ᵀ + u2 v2ᵀ. Get v1 likewise.
        C1 = EtE - e1[..., None, None] * jnp.eye(3, dtype=E.dtype)
        d0 = jnp.cross(C1[..., 0, :], C1[..., 1, :])
        d1 = jnp.cross(C1[..., 0, :], C1[..., 2, :])
        d2 = jnp.cross(C1[..., 1, :], C1[..., 2, :])
        ds = jnp.stack([d0, d1, d2], -2)
        dn = jnp.linalg.norm(ds, axis=-1)
        v1 = jnp.take_along_axis(
            ds, jnp.argmax(dn, -1)[..., None, None].repeat(3, -1), -2)[..., 0, :]
        v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-30)
        v2 = jnp.cross(v3, v1)
        u1 = jnp.einsum("...ij,...j->...i", E, v1) / s1[..., None]
        u2 = jnp.einsum("...ij,...j->...i", E, v2) / s2[..., None]
        return u1[..., :, None] * v1[..., None, :] + u2[..., :, None] * v2[..., None, :]

    res["proj_closed3_s"] = timeit(jax.jit(proj_polar), E)
    pa = np.asarray(jax.jit(proj_svd)(E))
    pb = np.asarray(jax.jit(proj_polar)(E))
    # compare up to sign-free: essential matrices defined up to scale; both
    # should be identical here (no sign ambiguity in truncated SVD recomb)
    res["proj_agree_maxerr"] = float(np.max(np.abs(pa - pb)))

    # --- 10x10 determinant -------------------------------------------------
    A10 = np.asarray(M[:, :1].reshape(BH, 10, 10)) + np.eye(10, dtype=np.float32)
    A10 = jnp.asarray(np.tile(A10, (11, 1, 1))[: BH * 11])  # det_coeffs batch shape
    res["det10_xla_s"] = timeit(jax.jit(lambda a: jnp.linalg.det(a)), A10)
    res["det10_unrolled_s"] = timeit(jax.jit(det10_unrolled), A10)
    da = np.asarray(jax.jit(lambda a: jnp.linalg.det(a))(A10))
    db = np.asarray(jax.jit(det10_unrolled)(A10))
    rel = np.abs(da - db) / np.maximum(np.abs(da), 1e-20)
    res["det10_relerr_p99"] = float(np.percentile(rel, 99))

    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
