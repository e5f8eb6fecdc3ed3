"""Round-5 gate profiling: where do the 40 ms/edge of the match gate go?

Times the fused block gate and its components standalone on the real chip
at full-run shapes (B=64 edges, K=2048 kpts, 512 hypotheses), so the
round-5 optimization attacks the measured bottleneck instead of the
suspected one. Prints one JSON dict.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.geometry.estimators import find_essential_ransac
from tpu3d.geometry.fivepoint import (_det_coeffs, _nullspace_basis,
                                      essential_five_point,
                                      five_point_ransac)
from tpu3d.matching.mnn import match_descriptors

B = 64       # edges per block
K = 2048     # keypoints per image
HYP = 512    # config num_hypotheses
FOCAL = 1035.0


def _get(x):
    # block_until_ready returns EARLY on the axon backend — the only real
    # barrier is a device_get (r2 finding, benchmarks/tpu_session.py).
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


def main():
    rng = np.random.default_rng(0)
    # Synthetic but geometrically real correspondences: a rotating/translating
    # camera pair over a random cloud, with 30% outliers — so RANSAC behaves
    # like production (consensus exists).
    X = rng.uniform(-1, 1, (K, 3)) + np.array([0, 0, 4.0])
    R = np.eye(3)
    t = np.array([0.5, 0.1, 0.0])
    uv0 = (X[:, :2] / X[:, 2:]) * FOCAL
    X1 = X @ R.T + t
    uv1 = (X1[:, :2] / X1[:, 2:]) * FOCAL
    out = rng.random(K) < 0.3
    uv1[out] = rng.uniform(-500, 500, (int(out.sum()), 2))
    uv0 = uv0.astype(np.float32)
    uv1 = uv1.astype(np.float32)
    valid = np.ones(K, np.float32)
    desc = rng.standard_normal((2, K, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)

    d_uv0 = jnp.asarray(np.tile(uv0, (B, 1, 1)))
    d_uv1 = jnp.asarray(np.tile(uv1, (B, 1, 1)))
    d_valid = jnp.asarray(np.tile(valid, (B, 1)))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    res = {}

    # --- full 5-point RANSAC over the block (as the gate calls it: HYP//4) ---
    f5 = jax.jit(jax.vmap(
        lambda k, a, b, v: five_point_ransac(
            k, a, b, v, FOCAL, threshold_px=1.0, num_hypotheses=HYP // 4)[2]))
    res["fivepoint_block_s"] = timeit(
        lambda: f5(keys, d_uv0, d_uv1, d_valid))
    # --- 8-point find_essential over the block at full HYP -----------------
    f8 = jax.jit(jax.vmap(
        lambda k, a, b, v: find_essential_ransac(
            k, a, b, v, FOCAL, threshold_px=1.0,
            num_hypotheses=HYP).num_inliers))
    res["eightpoint_block_s"] = timeit(
        lambda: f8(keys, d_uv0, d_uv1, d_valid))
    # --- matcher over the block -------------------------------------------
    dm = jax.jit(jax.vmap(lambda: match_descriptors(
        jnp.asarray(desc[0]), jnp.asarray(desc[1]),
        jnp.asarray(valid), jnp.asarray(valid), ratio=0.85).valid.sum(),
        axis_size=B))
    res["matcher_block_s"] = timeit(lambda: dm())

    # --- five-point internals, batched the way the RANSAC batches them ----
    H = HYP // 4
    x0 = jnp.asarray(uv0 / FOCAL)
    x1 = jnp.asarray(uv1 / FOCAL)
    idx = np.stack([rng.choice(K, 5, replace=False) for _ in range(B * H)])
    s0 = x0[jnp.asarray(idx)]            # (B*H, 5, 2)
    s1 = x1[jnp.asarray(idx)]

    nb = jax.jit(jax.vmap(_nullspace_basis))
    res["nullspace_BH_s"] = timeit(lambda: nb(s0, s1))
    basis = nb(s0, s1)
    dc = jax.jit(jax.vmap(_det_coeffs))
    res["detcoeffs_BH_s"] = timeit(lambda: dc(basis))
    ef = jax.jit(jax.vmap(lambda a, b: essential_five_point(a, b)[0]))
    res["full5pt_solver_BH_s"] = timeit(lambda: ef(s0, s1))

    # --- scoring matmul shape ---------------------------------------------
    from tpu3d.geometry.epipolar import sampson_error
    Es = jnp.asarray(rng.standard_normal((B, H * 10, 3, 3)).astype(np.float32))
    sc = jax.jit(lambda E: jax.vmap(
        lambda Eb: jax.vmap(lambda e: sampson_error(e, x0, x1))(Eb))(E).sum())
    res["scoring_BH10_s"] = timeit(lambda: sc(Es))

    res["per_edge_ms_5pt"] = res["fivepoint_block_s"] / B * 1e3
    res["per_edge_ms_8pt"] = res["eightpoint_block_s"] / B * 1e3
    res["backend"] = jax.default_backend()
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
