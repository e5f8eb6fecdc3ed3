"""Micro-benchmark of the matching stage's device work: which piece costs
what per candidate edge, and how much batching (pair_batch) buys.

Pieces timed at the production shape (K=2048 keypoints, 512 hypotheses):
  - mutual-NN ratio matcher alone
  - 8-point E-RANSAC alone
  - 5-point E-RANSAC alone (the Nistér det-scan path)
  - fused match+gate (single pair), 8pt and 5pt
  - fused block at pair_batch = 4 / 8 / 16 / 32 (per-edge amortized)

Usage: python benchmarks/match_bench.py [--cpu] [--hyps 512]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=3, warmup=1, **kw):
    """fn takes a rep index and must derive FRESH inputs from it: the
    remote backend memoizes (executable, args) -> result, so repeating
    identical args reports impossibly fast times."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(1000 + _, *args, **kw))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(i, *args, **kw))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hyps", type=int, default=512)
    ap.add_argument("--n-img", type=int, default=32)
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.geometry.estimators import find_essential_ransac
    from tpu3d.geometry.fivepoint import five_point_ransac
    from tpu3d.matching import match_descriptors
    from tpu3d.sfm.pipeline import _match_and_gate_block, _match_and_gate_packed

    K, F = 2048, 128
    focal = 1189.0
    rng = np.random.default_rng(0)
    # synthetic two-view geometry so RANSAC sees a real inlier structure
    X = rng.uniform(-1, 1, (K, 3)).astype(np.float32) + np.array([0, 0, 4], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.3, 0.0, 0.0], np.float32)
    uv0 = (X[:, :2] / X[:, 2:]) * focal
    Xc = X @ R.T + t
    uv1 = (Xc[:, :2] / Xc[:, 2:]) * focal + rng.normal(0, 0.5, (K, 2)).astype(np.float32)
    v = np.ones(K, np.float32)
    d0 = rng.normal(0, 1, (K, F)).astype(np.float32)
    d1 = d0 + 0.1 * rng.normal(0, 1, (K, F)).astype(np.float32)

    key = jax.random.PRNGKey(0)
    uv0j, uv1j, vj = jnp.asarray(uv0), jnp.asarray(uv1), jnp.asarray(v)
    d0j, d1j = jnp.asarray(d0), jnp.asarray(d1)

    res = {}
    res["matcher"] = timeit(
        lambda i: match_descriptors(d0j * (1.0 + 1e-6 * i), d1j, vj, vj,
                                    ratio=0.95).idx1)
    res["ransac_8pt"] = timeit(
        lambda i: find_essential_ransac(jax.random.PRNGKey(i), uv0j, uv1j, vj,
                                        focal, threshold_px=1.0,
                                        num_hypotheses=args.hyps).inliers)
    res["ransac_5pt"] = timeit(
        lambda i: five_point_ransac(jax.random.PRNGKey(i), uv0j, uv1j, vj,
                                    focal, threshold_px=1.0,
                                    num_hypotheses=max(args.hyps // 4, 64))[1])

    kp0 = jnp.asarray(uv0)
    kp1 = jnp.asarray(uv1)
    for fp in (False, True):
        res[f"fused_pair_{'5pt' if fp else '8pt'}"] = timeit(
            lambda i, fp=fp: _match_and_gate_packed(
                d0j, d1j, vj, vj, kp0, kp1, jax.random.PRNGKey(i), focal,
                1.0, 0.95, args.hyps, five_point=fp))

    # block path on an image set
    N = args.n_img
    d_all = jnp.asarray(rng.normal(0, 1, (N, K, F)).astype(np.float32))
    v_all = jnp.ones((N, K), jnp.float32)
    kp_all = jnp.asarray(np.tile(uv0[None], (N, 1, 1)))
    for B in (4, 8, 16, 32):
        ii = jnp.asarray(np.arange(B, dtype=np.int32) % N)
        jj = jnp.asarray((np.arange(B, dtype=np.int32) + 1) % N)
        keys = jax.random.split(key, B)
        dt = timeit(lambda i, B=B, ii=ii, jj=jj: _match_and_gate_block(
            d_all, v_all, kp_all, ii, jj,
            jax.random.split(jax.random.PRNGKey(i), B), focal, 1.0, 0.95,
            args.hyps, five_point=True))
        res[f"block_5pt_B{B}_per_edge"] = dt / B

    print({k: f"{1e3 * t:.1f} ms" for k, t in res.items()})


if __name__ == "__main__":
    main()
