import numpy as np
import jax
import jax.numpy as jnp

from tpu3d.geometry.fivepoint import essential_five_point, five_point_ransac
from tpu3d.geometry.epipolar import sampson_error
from tests.test_geometry import make_pair


def test_five_point_exact_minimal(rng):
    """5 exact correspondences: one candidate must reproduce the true E."""
    X, R, t, uv0, uv1, focal = make_pair(rng, n=5)
    x0 = jnp.asarray(uv0) / focal
    x1 = jnp.asarray(uv1) / focal
    Es, valid = essential_five_point(x0, x1)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ R
    E_gt = E_gt / np.linalg.norm(E_gt)
    best = np.inf
    for E, v in zip(np.asarray(Es), np.asarray(valid)):
        if not v:
            continue
        En = E / np.linalg.norm(E)
        err = min(np.abs(En - E_gt).max(), np.abs(En + E_gt).max())
        best = min(best, err)
    assert best < 5e-3, f"no candidate matches true E (best {best})"


def test_five_point_candidates_satisfy_epipolar(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng, n=5)
    x0 = jnp.asarray(uv0) / focal
    x1 = jnp.asarray(uv1) / focal
    Es, valid = essential_five_point(x0, x1)
    err = np.asarray(jax.vmap(lambda E: sampson_error(E, x0, x1))(Es))
    v = np.asarray(valid)
    assert v.sum() >= 1
    # every valid candidate interpolates the 5 points (up to fp noise)
    assert (err[v].max(axis=-1) * focal**2 < 1.0).all()


def test_five_point_ransac_with_outliers(rng):
    X, R, t, uv0, uv1, focal = make_pair(rng, n=300, noise=0.3, outlier_frac=0.3)
    valid = jnp.ones(300, jnp.float32)
    E, inl, cnt = five_point_ransac(
        jax.random.PRNGKey(0), jnp.asarray(uv0), jnp.asarray(uv1), valid, focal,
        threshold_px=1.5, num_hypotheses=64,
    )
    assert int(cnt) > 0.55 * 300
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ R
    E_gt = E_gt / np.linalg.norm(E_gt)
    En = np.asarray(E) / np.linalg.norm(np.asarray(E))
    err = min(np.abs(En - E_gt).max(), np.abs(En + E_gt).max())
    assert err < 0.05


def test_five_point_planar_scene(rng):
    """Planar scenes break the 8-point solver (F-matrix ambiguity); the
    5-point solver must still recover E."""
    # points on a plane z = 5 + 0.3x + 0.2y
    n = 200
    x = rng.uniform(-2, 2, n)
    y = rng.uniform(-2, 2, n)
    X = np.stack([x, y, 5 + 0.3 * x + 0.2 * y], -1).astype(np.float32)
    from tpu3d.core import lie
    w = np.array([0.05, -0.15, 0.02], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = np.array([0.8, 0.1, 0.05], np.float32)
    t /= np.linalg.norm(t)
    focal = 1000.0
    uv0 = focal * X[:, :2] / X[:, 2:3]
    Xc = X @ R.T + t
    uv1 = focal * Xc[:, :2] / Xc[:, 2:3]
    uv0 += rng.normal(0, 0.2, uv0.shape)
    uv1 += rng.normal(0, 0.2, uv1.shape)
    E, inl, cnt = five_point_ransac(
        jax.random.PRNGKey(1), jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1, jnp.float32),
        jnp.ones(n), focal, threshold_px=1.5, num_hypotheses=64,
    )
    assert int(cnt) > 0.8 * n
    from tpu3d.geometry.pose import recover_pose
    R_est, t_est, front = recover_pose(E, jnp.asarray(uv0 / focal), jnp.asarray(uv1 / focal))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=0.03)
    t_e = np.asarray(t_est)
    np.testing.assert_allclose(t_e / np.linalg.norm(t_e), t, atol=0.05)
