"""Phase split of the CURRENT classical extractor (post-restructure:
detect per octave -> global top-K merge -> one orientation + one
descriptor dispatch against the unified gradient stack), each phase its
own jitted function at the bench shape, barriered through device_get.

Usage: python benchmarks/extract_phase_probe2.py [--cpu] [--batch N]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bar(tree):
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "shape"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
            break


def bench(fn, *args, reps=5):
    out = fn(*args)
    bar(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    bar(out)
    return (time.time() - t0) / reps


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    B = 4
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            B = int(a.split("=")[1])
    import jax
    import jax.numpy as jnp

    from tpu3d.config import FrontendConfig
    from tpu3d.features import extract_features
    from tpu3d.features.descriptor import (gradients, keypoint_orientations,
                                           sift_descriptors)
    from tpu3d.features.detector import detect_octave
    from tpu3d.features.pyramid import build_pyramid

    cfg = FrontendConfig(max_keypoints=2048, batch_size=B)
    H, W = 648, 968
    O, S, K = cfg.num_octaves, cfg.scales_per_octave, cfg.max_keypoints
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    out = {"backend": jax.default_backend(), "batch": B}

    f32 = jax.default_matmul_precision("float32")

    @jax.jit
    def p_pyramid(x):
        with f32:
            return build_pyramid(x, O, S, cfg.sigma0)

    gauss, dogs = p_pyramid(img)
    out["pyramid_ms"] = round(1e3 * bench(p_pyramid, img), 1)

    @jax.jit
    def p_detect(dogs_in):
        with f32:
            return [detect_octave(d, K, cfg.contrast_threshold,
                                  cfg.edge_threshold, cfg.nms_radius)
                    for d in dogs_in]

    kps = p_detect(dogs)
    out["detect_all_octaves_ms"] = round(1e3 * bench(p_detect, dogs), 1)

    @jax.jit
    def p_detect0(d):
        with f32:
            return detect_octave(d, K, cfg.contrast_threshold,
                                 cfg.edge_threshold, cfg.nms_radius)

    out["detect_octave0_ms"] = round(1e3 * bench(p_detect0, dogs[0]), 1)

    # unified gradient stack build (the zeros + at[].set writes)
    Hp, Wp = -(-H // 8) * 8, -(-W // 128) * 128

    @jax.jit
    def p_stack(gauss_in):
        with f32:
            gx_u = jnp.zeros((B, O, S, Hp, Wp), jnp.float32)
            gy_u = jnp.zeros((B, O, S, Hp, Wp), jnp.float32)
            for o in range(O):
                g = gauss_in[o][:, 1 : S + 1]
                gx_o, gy_o = gradients(g)
                Ho, Wo = g.shape[-2:]
                gx_u = gx_u.at[:, o, :, :Ho, :Wo].set(gx_o)
                gy_u = gy_u.at[:, o, :, :Ho, :Wo].set(gy_o)
            return (gx_u.reshape(B * O * S, Hp, Wp),
                    gy_u.reshape(B * O * S, Hp, Wp))

    gx_u, gy_u = p_stack(gauss)
    out["gradient_stack_ms"] = round(1e3 * bench(p_stack, gauss), 1)

    # orientation + descriptor dispatches for B*K keypoints
    kx = jnp.asarray(rng.uniform(16, W - 16, B * K).astype(np.float32))
    ky = jnp.asarray(rng.uniform(16, H - 16, B * K).astype(np.float32))
    sig = jnp.asarray(rng.uniform(1.6, 3.2, B * K).astype(np.float32))
    lvlg = jnp.asarray(rng.integers(0, B * O * S, B * K).astype(np.int32))
    ymax = jnp.full((B * K,), H - 1.001, jnp.float32)
    xmax = jnp.full((B * K,), W - 1.001, jnp.float32)

    @jax.jit
    def p_orient(gx, gy):
        with f32:
            return keypoint_orientations(gx, gy, kx, ky, lvlg, sig, ymax, xmax)

    theta = p_orient(gx_u, gy_u)
    out["orientation_ms"] = round(1e3 * bench(p_orient, gx_u, gy_u), 1)

    @jax.jit
    def p_desc(gx, gy, th):
        with f32:
            return sift_descriptors(gx, gy, kx, ky, lvlg, sig, th, ymax, xmax)

    out["descriptor_ms"] = round(1e3 * bench(p_desc, gx_u, gy_u, theta), 1)

    full = lambda: extract_features(img, cfg)
    bar(full())
    out["full_extract_ms"] = round(1e3 * bench(lambda x: extract_features(x, cfg), img), 1)
    out["full_ms_per_image"] = round(out["full_extract_ms"] / B, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
