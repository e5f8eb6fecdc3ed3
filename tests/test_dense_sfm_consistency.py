"""The dense stage must consume the sparse stage's output coherently: a ray
generated through the pixel where a 3D point projects must pass through
that point. (The reference's sdf stage builds its c2w by stacking the
world->cam [R|t] directly, sdf.py:135 — a frame inconsistency masked by its
externally-supplied training data.)"""
import numpy as np
import jax.numpy as jnp

from tpu3d.core import lie
from tpu3d.dense.train import rays_from_cameras


def test_rays_hit_triangulated_points(rng):
    focal = 500.0
    W, H = 64, 48
    # one camera with a nontrivial pose
    w = np.array([0.1, -0.2, 0.05], np.float32)
    t = np.array([0.3, -0.1, 0.2], np.float32)
    cam = np.concatenate([w, t])
    R = lie.so3_exp_np(w)

    # world points that project inside the image
    rng_pts = []
    while len(rng_pts) < 20:
        X = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(3, 6)], np.float32)
        Xw = R.T @ (X - t)  # put the point in front of the camera by design
        uv = focal * X[:2] / X[2]
        px = np.array([uv[0] + W / 2, -uv[1] + H / 2])
        if 1 <= px[0] < W - 1 and 1 <= px[1] < H - 1:
            rng_pts.append((Xw, px))
    imgs = np.zeros((1, H, W, 3), np.uint8)
    ds = rays_from_cameras(cam[None], imgs, focal, norm=None, stride=1)

    for Xw, px in rng_pts:
        idx = int(round(px[1])) * W + int(round(px[0]))
        o = ds.origins[idx]
        d = ds.dirs[idx]
        # distance from the 3D point to the ray
        v = Xw - o
        dist = np.linalg.norm(v - np.dot(v, d) * d)
        depth = np.dot(v, d)
        assert depth > 0, "point behind the ray"
        # sub-pixel ray quantization: tolerance = depth * (1 px / focal)
        assert dist < depth * 1.5 / focal, f"ray misses point by {dist}"
