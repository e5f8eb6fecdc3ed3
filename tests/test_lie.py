import numpy as np
import jax
import jax.numpy as jnp

from tpu3d.core import lie


def test_exp_identity():
    R = lie.so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_exp_known_rotation():
    # 90 degrees about z
    w = jnp.array([0.0, 0.0, np.pi / 2], jnp.float32)
    R = np.asarray(lie.so3_exp(w))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1.0, (64, 3)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_log_near_pi():
    axis = np.array([1.0, 0.0, 0.0], np.float32)
    w = axis * (np.pi - 1e-3)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-3)


def test_orthonormality_batch():
    rng = np.random.default_rng(1)
    w = rng.normal(0, 2.0, (32, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_grad_through_exp():
    def f(w):
        return jnp.sum(lie.so3_exp(w) @ jnp.array([1.0, 2.0, 3.0]))

    g = jax.grad(f)(jnp.array([0.0, 0.0, 0.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(f)(jnp.array([0.3, -0.2, 0.9]))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_se3_inverse_compose():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(0, 1, 3), jnp.float32)
    t = jnp.asarray(rng.normal(0, 1, 3), jnp.float32)
    R = lie.so3_exp(w)
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), np.zeros(3), atol=1e-6)
