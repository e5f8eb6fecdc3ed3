"""Novel-view pose interpolation (`cli render --orbit`, dense/eval.py)."""
import numpy as np

from tpu3d.core import lie
from tpu3d.dense.eval import interpolate_poses


def _cams(n, radius=2.0):
    """Cameras on an arc looking at the origin, as (n, 6) [rvec, t]."""
    out = []
    for a in np.linspace(0, np.pi / 2, n):
        c = radius * np.array([np.cos(a), np.sin(a), 0.0])
        z = -c / np.linalg.norm(c)          # look at origin
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])             # world-to-camera rows
        out.append(np.concatenate([lie.so3_log_np(R), -R @ c]))
    return np.stack(out)


def test_endpoints_exact():
    cams = _cams(4)
    path = interpolate_poses(cams, 7)
    np.testing.assert_allclose(path[0], cams[0], atol=1e-5)
    np.testing.assert_allclose(path[-1], cams[-1], atol=1e-5)


def test_rotations_orthonormal_and_centers_on_polyline():
    cams = _cams(5)
    Cs = np.stack([-lie.so3_exp_np(c[:3]).T @ c[3:6] for c in cams])
    path = interpolate_poses(cams, 21)
    seg_dirs = Cs[1:] - Cs[:-1]
    for p in path:
        R = lie.so3_exp_np(p[:3])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        c = -R.T @ p[3:6]
        # center must sit on one of the polyline segments
        dists = []
        for k in range(len(Cs) - 1):
            d = seg_dirs[k]
            a = np.clip(np.dot(c - Cs[k], d) / np.dot(d, d), 0, 1)
            dists.append(np.linalg.norm(Cs[k] + a * d - c))
        assert min(dists) < 1e-5


def test_uniform_arc_length():
    cams = _cams(3)
    path = interpolate_poses(cams, 9)
    Cs = np.stack([-lie.so3_exp_np(p[:3]).T @ p[3:6] for p in path])
    steps = np.linalg.norm(np.diff(Cs, axis=0), axis=1)
    # equal-radius arc: uniform arc-length sampling => near-equal steps
    assert steps.max() / steps.min() < 1.2


def test_single_camera():
    cams = _cams(1)
    path = interpolate_poses(cams, 4)
    assert path.shape == (4, 6)
    np.testing.assert_allclose(path, np.repeat(cams, 4, 0))
