"""Learned front-end throughput at bench shapes with random converted
weights (VERDICT r2 #8: the reference's production path IS DISK+LightGlue,
feature_extraction.py:10/28 + matching.py:20/122 — real checkpoints are
not downloadable here, but throughput/compile characteristics at the real
shapes don't depend on the weight VALUES).

Prints one JSON line: ms/image for DISK extraction at the e2e bench shape
(batch 4, 648x968 downscale-2 frames, 2048 keypoints) and ms/pair for
LightGlue matching at 2048x2048 keypoints, plus the classical-frontend
numbers at identical shapes for the cost table in BASELINE.md.

Usage: python benchmarks/learned_bench.py [--cpu]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def barrier(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda a: (np.asarray(jax.device_get(a.ravel()[:1]))
                   if hasattr(a, "shape") else a), tree)


def time_call(fn, reps=3, calls=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for _ in range(calls):
            out = fn()
        barrier(out)
        best = min(best, (time.time() - t0) / calls)
    return best


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tpu3d.config import FrontendConfig, MatchingConfig
    from tpu3d.features import extract_features
    from tpu3d.features.disk import DiskUNet
    from tpu3d.features.learned import _disk_featureset
    from tpu3d.matching import match_descriptors
    from tpu3d.matching.lightglue import LightGlue, filter_matches

    B, H, W, K = 4, 648, 968, 2048
    Hp, Wp = -(-H // 16) * 16, -(-W // 16) * 16
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend(), "batch": B, "hw": [H, W], "K": K}

    # --- DISK extraction (batched, padded to /16, FeatureSet protocol) ---
    params = DiskUNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rgb = jnp.asarray(rng.uniform(0, 1, (B, Hp, Wp, 3)).astype(np.float32))
    fn_disk = lambda: _disk_featureset(params, rgb, float(W), float(H), K)
    barrier(fn_disk())  # compile
    t = time_call(fn_disk)
    out["disk_ms_per_image"] = round(1e3 * t / B, 1)

    # --- classical frontend at the same shape (the production default) ---
    fcfg = FrontendConfig(max_keypoints=K, batch_size=B)
    gray = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    fn_cls = lambda: extract_features(gray, fcfg)
    barrier(fn_cls())
    t = time_call(fn_cls)
    out["classical_ms_per_image"] = round(1e3 * t / B, 1)

    # --- LightGlue pair at full depth / full keypoint budget ---
    lg = LightGlue(input_dim=128, n_layers=9)
    kp = jnp.asarray(rng.uniform(0, W, (1, K, 2)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (1, K, 128)).astype(np.float32))
    size = jnp.asarray(np.array([[float(W), float(H)]], np.float32))
    lg_params = lg.init(jax.random.PRNGKey(1), kp[:, :8], d[:, :8], size,
                        kp[:, :8], d[:, :8], size)
    app = jax.jit(lambda p, *a: filter_matches(lg.apply(p, *a))[0])
    fn_lg = lambda: app(lg_params, kp, d, size, kp, d, size)
    barrier(fn_lg())
    t = time_call(fn_lg)
    out["lightglue_ms_per_pair"] = round(1e3 * t, 1)

    # --- classical MNN matcher at the same shape ---
    mcfg = MatchingConfig()
    v = jnp.ones((K,), jnp.float32)
    fn_mnn = lambda: match_descriptors(d[0], d[0], v, v,
                                       ratio=mcfg.ratio_threshold)
    barrier(fn_mnn())
    t = time_call(fn_mnn)
    out["mnn_ms_per_pair"] = round(1e3 * t, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
