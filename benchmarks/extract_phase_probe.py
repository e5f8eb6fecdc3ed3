"""Split the classical extractor into its jitted sub-phases.

NOTE: the `descript` phase here still models the PRE-restructure
per-octave flow (descriptors for all O*K candidates); production now
merges the global top-K first and runs descriptors once
(features/frontend.py). `full` measures the real path; use
benchmarks/tpu_session.py for current numbers.

  pyramid    — Gaussian/DoG pyramid (XLA convs)
  detect     — per-octave extrema + NMS + top-K
  descript   — orientation histograms + SIFT descriptors (Pallas patch
               sampling; static per-image Python loop)
  merge      — cross-octave top-K merge

Each phase is timed as its own jitted function at the benchmark image
shape, f32-scoped exactly like the production path.

Usage: python benchmarks/extract_phase_probe.py [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench(fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    jax_tree_block(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax_tree_block(out)
    return (time.time() - t0) / reps, out


def jax_tree_block(tree):
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="648,968")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    from tpu3d.config import FrontendConfig
    from tpu3d.features.descriptor import (gradients, keypoint_orientations,
                                           sift_descriptors)
    from tpu3d.features.detector import detect_octave
    from tpu3d.features.pyramid import build_pyramid

    cfg = FrontendConfig()
    B = args.batch
    H, W = (int(x) for x in args.hw.split(","))
    S = cfg.scales_per_octave
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))

    @jax.jit
    def f_pyramid(x):
        with jax.default_matmul_precision("float32"):
            return build_pyramid(x, cfg.num_octaves, S, cfg.sigma0)

    t_pyr, (gauss, dogs) = _bench(f_pyramid, img)
    print(f"pyramid   {t_pyr * 1e3:7.1f} ms/batch")

    @functools.partial(jax.jit, static_argnames=("o",))
    def f_detect(dog, o=0):
        with jax.default_matmul_precision("float32"):
            return detect_octave(dog, cfg.max_keypoints,
                                 cfg.contrast_threshold, cfg.edge_threshold,
                                 cfg.nms_radius)

    t_det = 0.0
    kps = []
    for o in range(cfg.num_octaves):
        t, kp = _bench(f_detect, dogs[o], o=o)
        t_det += t
        kps.append(kp)
    print(f"detect    {t_det * 1e3:7.1f} ms/batch (all octaves)")

    @functools.partial(jax.jit, static_argnames=("o",))
    def f_desc(g_o, kp_x, kp_y, lvl, sig, o=0):
        with jax.default_matmul_precision("float32"):
            def per_image(g_b, kx, ky, lvl_b, sig_b):
                gx, gy = gradients(g_b)
                theta = keypoint_orientations(gx, gy, kx, ky, lvl_b, sig_b)
                return sift_descriptors(gx, gy, kx, ky, lvl_b, sig_b, theta)

            return jnp.stack([
                per_image(g_o[b], kp_x[b], kp_y[b], lvl[b], sig[b])
                for b in range(B)
            ])

    t_desc = 0.0
    for o in range(cfg.num_octaves):
        kp = kps[o]
        lvl = jnp.clip(jnp.round(kp.scale).astype(jnp.int32), 1, S)
        sig = cfg.sigma0 * (2.0 ** (kp.scale / S))
        t, _ = _bench(f_desc, gauss[o], kp.x, kp.y, lvl, sig, o=o)
        t_desc += t
        print(f"  desc oct{o} {t * 1e3:7.1f} ms")
    print(f"descript  {t_desc * 1e3:7.1f} ms/batch (all octaves)")

    from tpu3d.features import extract_features

    u8 = (np.asarray(img) * 255).astype(np.uint8)

    def f_full(x):
        return extract_features(x, cfg)

    t_full, _ = _bench(f_full, jnp.asarray(u8))
    print(f"full      {t_full * 1e3:7.1f} ms/batch ({t_full / B * 1e3:.0f} ms/img)")
    print(f"unaccounted (merge/top-k/etc): {(t_full - t_pyr - t_det - t_desc) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
