"""Per-kernel steady-state throughput on the current platform.

  python benchmarks/kernel_bench.py          # real device (axon TPU here)
  TPU3D_FORCE_CPU=1 python benchmarks/kernel_bench.py

Reports one JSON dict: extraction images/s, matcher pairs/s, E-RANSAC/s,
PnP/s, triangulation/s, BA iteration/s, dense render rays/s.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("TPU3D_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def timeit(fn, n=20):
    fn()  # compile
    t0 = time.time()
    for _ in range(n):
        out = fn()
    _block(out)
    return (time.time() - t0) / n


def _block(out):
    # Real barrier through device_get: block_until_ready returns EARLY on
    # the axon remote backend (BASELINE.md link facts).
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
            break


# v5e peak: 197 TFLOP/s bf16 MXU (f32-scoped work runs as multi-pass bf16).
_V5E_PEAK_BF16 = 197e12


def flops_pct(jitted, *args, seconds=None, **kwargs):
    """XLA-cost-analysis FLOPs of one call + achieved %-of-bf16-peak (None
    for Pallas-dominated programs, which report 0 FLOPs)."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        fl = float(ca.get("flops", 0.0))
        if not fl:
            return None
        return {"gflops": round(fl / 1e9, 2),
                "pct_v5e_bf16_peak": round(100 * fl / seconds / _V5E_PEAK_BF16, 2)}
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp

    from tpu3d.ba.lm import bundle_adjust
    from tpu3d.config import FrontendConfig
    from tpu3d.dense.grid import create_grid
    from tpu3d.dense.render import render_rays
    from tpu3d.features import extract_features
    from tpu3d.geometry.estimators import find_essential_ransac
    from tpu3d.geometry.pnp import pnp_ransac
    from tpu3d.geometry.triangulate import triangulate_dlt
    from tpu3d.matching import match_descriptors

    rng = np.random.default_rng(0)
    report = {"platform": jax.default_backend()}

    # extraction (B=4 at ystad half-res)
    B, H, W = 4, 648, 968
    img = jnp.asarray(rng.integers(0, 255, (B, H, W), dtype=np.uint8))
    cfg = FrontendConfig(max_keypoints=2048, batch_size=B)
    dt = timeit(lambda: extract_features(img, cfg), n=10)
    report["extract_images_per_s"] = round(B / dt, 1)

    # matcher
    K = 2048
    d = jnp.asarray(rng.normal(0, 1, (K, 128)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    v = jnp.ones((K,), jnp.float32)
    dt = timeit(lambda: match_descriptors(d, d, v, v), n=30)
    report["match_pairs_per_s"] = round(1.0 / dt, 1)

    # E-RANSAC (512 hypotheses over 2048 matches)
    uv = jnp.asarray(rng.uniform(-300, 300, (K, 2)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    dt = timeit(lambda: find_essential_ransac(key, uv, uv, v, 1189.0, num_hypotheses=512), n=20)
    report["essential_ransac_per_s"] = round(1.0 / dt, 1)
    report["essential_ransac_mfu"] = flops_pct(
        find_essential_ransac, key, uv, uv, v, 1189.0, num_hypotheses=512,
        seconds=dt)

    # PnP-RANSAC
    X = jnp.asarray(np.concatenate([rng.uniform(-2, 2, (K, 2)), rng.uniform(4, 8, (K, 1))], -1).astype(np.float32))
    x = X[:, :2] / X[:, 2:3]
    dt = timeit(lambda: pnp_ransac(key, X, x, v, 1e-5, num_hypotheses=256), n=20)
    report["pnp_ransac_per_s"] = round(1.0 / dt, 1)
    report["pnp_ransac_mfu"] = flops_pct(
        pnp_ransac, key, X, x, v, 1e-5, num_hypotheses=256, seconds=dt)

    # triangulation (2048 points)
    eye = jnp.eye(3)
    z3 = jnp.zeros(3)
    t1 = jnp.asarray([1.0, 0, 0])
    dt = timeit(lambda: triangulate_dlt(eye, z3, eye, t1, x, x), n=30)
    report["triangulate_2048pts_per_s"] = round(1.0 / dt, 1)

    # BA: 64 cams, 8192 points, 32768 obs, 5 LM iters
    C, P, O = 64, 8192, 32768
    cams = jnp.asarray(rng.normal(0, 0.01, (C, 6)).astype(np.float32))
    pts = jnp.asarray(np.concatenate([rng.uniform(-2, 2, (P, 2)), rng.uniform(4, 8, (P, 1))], -1).astype(np.float32))
    ci = jnp.asarray(rng.integers(0, C, O, dtype=np.int32))
    pi = jnp.asarray(rng.integers(0, P, O, dtype=np.int32))
    uvb = pts[pi, :2] / pts[pi, 2:3]
    wb = jnp.ones((O,), jnp.float32)
    cf = jnp.zeros((C,), jnp.float32).at[0].set(1.0)
    dt = timeit(lambda: bundle_adjust(cams, pts, ci, pi, uvb, wb, cf, max_iters=5, cg_iters=16), n=5)
    report["ba_lm_iters_per_s"] = round(5.0 / dt, 1)
    report["ba_obs"] = O
    report["ba_mfu"] = flops_pct(bundle_adjust, cams, pts, ci, pi, uvb, wb,
                                 cf, max_iters=5, cg_iters=16, seconds=dt)

    # dense render (plenoxel fwd, 8192 rays x 128 samples, 192^3 grid)
    vg = create_grid(192, (-1, -1, -1), (1, 1, 1))
    n = 8192
    o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
    dvec = (-o / np.linalg.norm(o, axis=1, keepdims=True)).astype(np.float32)
    oj = jnp.asarray(o)
    dj = jnp.asarray(dvec)
    dt = timeit(lambda: render_rays(vg, key, oj, dj, 1.0, 5.0, 128), n=20)
    report["render_rays_per_s"] = round(n / dt)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
