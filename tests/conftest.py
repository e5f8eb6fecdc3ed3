import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def synthetic_scene(rng, n_points=200, n_cams=4, focal=1000.0, spread=2.0, depth=6.0):
    """Random world points in front of a ring of cameras, with exact
    projections. Returns dict of numpy arrays used across geometry tests."""
    import tpu3d.core.lie as lie
    import tpu3d.core.camera as cam
    import jax.numpy as jnp

    X = np.stack(
        [
            rng.uniform(-spread, spread, n_points),
            rng.uniform(-spread, spread, n_points),
            rng.uniform(depth - 2.0, depth + 2.0, n_points),
        ],
        axis=-1,
    )
    Rs, ts, uvs = [], [], []
    for c in range(n_cams):
        w = rng.normal(0, 0.1, 3)
        R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float64) if False else jnp.asarray(w, jnp.float32)))
        t = np.array([0.3 * c, 0.05 * c, 0.1 * c], np.float32)
        Xc = X @ R.T + t
        uv = focal * Xc[:, :2] / Xc[:, 2:3]
        Rs.append(R)
        ts.append(t)
        uvs.append(uv)
    return {
        "X": X.astype(np.float32),
        "R": np.stack(Rs).astype(np.float32),
        "t": np.stack(ts).astype(np.float32),
        "uv": np.stack(uvs).astype(np.float32),
        "focal": focal,
    }


@pytest.fixture
def scene(rng):
    return synthetic_scene(rng)
