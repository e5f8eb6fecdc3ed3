import numpy as np
import jax
import jax.numpy as jnp

from tpu3d.geometry import (
    essential_eight_point,
    sampson_error,
    find_essential_ransac,
    triangulate_dlt,
    pnp_dlt,
    pnp_ransac,
    refine_pose,
    recover_pose,
)


def make_pair(rng, n=300, focal=1000.0, noise=0.0, outlier_frac=0.0):
    from tpu3d.core import lie

    X = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 8, n)], -1
    ).astype(np.float32)
    w = np.array([0.05, -0.2, 0.03], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = np.array([1.0, 0.1, 0.05], np.float32)
    t = t / np.linalg.norm(t)
    uv0 = focal * X[:, :2] / X[:, 2:3]
    Xc = X @ R.T + t
    uv1 = focal * Xc[:, :2] / Xc[:, 2:3]
    if noise > 0:
        uv0 = uv0 + rng.normal(0, noise, uv0.shape)
        uv1 = uv1 + rng.normal(0, noise, uv1.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv1[idx] = rng.uniform(-500, 500, (n_out, 2))
    return X, R, t, uv0.astype(np.float32), uv1.astype(np.float32), focal


def test_eight_point_exact(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng)
    E = essential_eight_point(jnp.asarray(uv0) / focal, jnp.asarray(uv1) / focal)
    err = np.asarray(sampson_error(E, jnp.asarray(uv0) / focal, jnp.asarray(uv1) / focal))
    assert np.sqrt(np.mean(err)) * focal < 0.1  # sub-0.1px on clean data
    # E should match [t]x R up to scale
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ R
    E_np = np.asarray(E)
    E_np = E_np / np.linalg.norm(E_np) * np.sign(np.sum(E_np * E_gt))
    E_gt = E_gt / np.linalg.norm(E_gt)
    np.testing.assert_allclose(E_np, E_gt, atol=5e-3)


def test_recover_pose_exact(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng)
    E = essential_eight_point(jnp.asarray(uv0) / focal, jnp.asarray(uv1) / focal)
    R_est, t_est, front = recover_pose(E, jnp.asarray(uv0) / focal, jnp.asarray(uv1) / focal)
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-2)
    t_est = np.asarray(t_est)
    np.testing.assert_allclose(t_est / np.linalg.norm(t_est), t, atol=1e-2)
    assert np.mean(np.asarray(front)) > 0.99


def test_essential_ransac_with_outliers(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng, n=512, noise=0.3, outlier_frac=0.3)
    n = uv0.shape[0]
    valid = jnp.ones(n, jnp.float32)
    res = find_essential_ransac(
        jax.random.PRNGKey(0), jnp.asarray(uv0), jnp.asarray(uv1), valid, focal,
        threshold_px=1.5, num_hypotheses=256,
    )
    assert int(res.num_inliers) > 0.6 * n
    np.testing.assert_allclose(np.asarray(res.R), R, atol=0.02)
    t_est = np.asarray(res.t)
    np.testing.assert_allclose(t_est / np.linalg.norm(t_est), t, atol=0.02)


def test_essential_ransac_padded(rng):
    """Padded (masked-out) points must not affect the result."""
    X, R, t, uv0, uv1, focal = make_pair(rng, n=256, noise=0.2, outlier_frac=0.2)
    pad = 128
    uv0p = np.concatenate([uv0, np.full((pad, 2), 1e6, np.float32)])
    uv1p = np.concatenate([uv1, np.full((pad, 2), -1e6, np.float32)])
    valid = jnp.concatenate([jnp.ones(256), jnp.zeros(pad)])
    res = find_essential_ransac(
        jax.random.PRNGKey(1), jnp.asarray(uv0p), jnp.asarray(uv1p), valid, focal,
        threshold_px=1.5, num_hypotheses=256,
    )
    assert not np.any(np.asarray(res.inliers)[256:])
    np.testing.assert_allclose(np.asarray(res.R), R, atol=0.03)


def test_triangulate_exact(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng)
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    Xhat = triangulate_dlt(eye, zero, jnp.asarray(R), jnp.asarray(t),
                           jnp.asarray(uv0) / focal, jnp.asarray(uv1) / focal)
    np.testing.assert_allclose(np.asarray(Xhat), X, atol=5e-2)


def test_pnp_dlt_exact(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng, n=64)
    R_est, t_est = pnp_dlt(jnp.asarray(X), jnp.asarray(uv1) / focal)
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-2)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-2)


def test_pnp_ransac_with_outliers(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng, n=512, noise=0.3, outlier_frac=0.3)
    valid = jnp.ones(512, jnp.float32)
    thr = (2.0 / focal) ** 2
    R_est, t_est, inl, cnt = pnp_ransac(
        jax.random.PRNGKey(2), jnp.asarray(X), jnp.asarray(uv1) / focal, valid, thr,
        num_hypotheses=256,
    )
    assert int(cnt) > 0.6 * 512
    np.testing.assert_allclose(np.asarray(R_est), R, atol=0.02)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=0.05)


def test_refine_pose_improves(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng, n=128, noise=0.5)
    # perturb the pose
    from tpu3d.core import lie
    Rp = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.01, 0.015]))) @ R
    tp = t + np.array([0.03, -0.02, 0.01], np.float32)
    w = jnp.ones(128)
    x1 = jnp.asarray(uv1) / focal

    def cost(R_, t_):
        Xc = jnp.asarray(X) @ R_.T + t_
        pred = Xc[:, :2] / Xc[:, 2:3]
        return float(jnp.sum((pred - x1) ** 2))

    c0 = cost(jnp.asarray(Rp), jnp.asarray(tp))
    R_ref, t_ref = refine_pose(jnp.asarray(Rp), jnp.asarray(tp), jnp.asarray(X), x1, w)
    c1 = cost(R_ref, t_ref)
    assert c1 < c0 * 0.1


def test_refine_triangulation_gn(rng):
    from tpu3d.geometry import refine_triangulation_gn

    X, R, t, uv0, uv1, focal = make_pair(rng, n=256, noise=0.5)
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    x0 = jnp.asarray(uv0) / focal
    x1 = jnp.asarray(uv1) / focal
    X_dlt = triangulate_dlt(eye, zero, jnp.asarray(R), jnp.asarray(t), x0, x1)

    def cost(Xp):
        r0 = Xp[:, :2] / Xp[:, 2:3] - x0
        Xc = Xp @ jnp.asarray(R).T + jnp.asarray(t)
        r1 = Xc[:, :2] / Xc[:, 2:3] - x1
        return np.asarray(jnp.sum(r0**2 + r1**2, -1))

    X_gn = refine_triangulation_gn(eye, zero, jnp.asarray(R), jnp.asarray(t),
                                   x0, x1, X_dlt, iters=2)
    c_dlt, c_gn = cost(X_dlt), cost(X_gn)
    # Never worse per point, strictly better on average on noisy data.
    # (1e-10 slack: the in-kernel monotonic guard and this recomputation
    # round differently in f32.)
    assert np.all(c_gn <= c_dlt + 1e-10)
    assert c_gn.mean() < c_dlt.mean()

    # Backend-noise insensitivity: perturbed initializations (simulating
    # eigh's backend-dependent last bits, amplified 1000x) converge to the
    # same optimum after refinement.
    noise = jnp.asarray(rng.normal(0, 1e-3, X_dlt.shape).astype(np.float32))
    X_gn_b = refine_triangulation_gn(eye, zero, jnp.asarray(R), jnp.asarray(t),
                                     x0, x1, X_dlt + noise, iters=4)
    X_gn_a = refine_triangulation_gn(eye, zero, jnp.asarray(R), jnp.asarray(t),
                                     x0, x1, X_dlt, iters=4)
    dist = np.linalg.norm(np.asarray(X_gn_a - X_gn_b), axis=-1)
    init_dist = np.linalg.norm(np.asarray(noise), axis=-1)
    assert np.median(dist) < 0.1 * np.median(init_dist)


def test_nullvec9_mgs_matches_eigh(rng):
    """The MGS null vector of a random (8, 9) design matrix must match the
    eigh-based smallest eigenvector of AtA (up to sign) — an 8x9 system
    always has an exact one-dimensional null space."""
    import jax.numpy as jnp
    from tpu3d.geometry.epipolar import _nullvec9_mgs

    A = jnp.asarray(rng.normal(0, 1, (64, 8, 9)).astype(np.float32))
    v = np.asarray(_nullvec9_mgs(A))
    # Exact null property: ||A v|| ~ 0.
    res = np.linalg.norm(np.einsum("bij,bj->bi", np.asarray(A), v), axis=-1)
    assert res.max() < 1e-4
    AtA = np.einsum("bni,bnj->bij", np.asarray(A), np.asarray(A))
    w_, V = np.linalg.eigh(AtA)
    v_ref = V[..., :, 0]
    dots = np.abs(np.sum(v * v_ref, -1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)
