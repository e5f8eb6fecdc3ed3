"""Per-component cost of the match+gate block: mutual-NN matmul, 8-point
RANSAC (512 hyp), 5-point RANSAC (128 hyp) — vmapped over B=8 edges,
fresh-arg timing. Run on TPU to find the real device-compute split of the
~60 ms/edge gate cost (CPU: mnn 18 / 8pt 67 / 5pt 118 ms per edge).

Usage: python benchmarks/match_component_probe.py [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("-B", type=int, default=8)
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.matching.mnn import match_descriptors
    from tpu3d.geometry.estimators import find_essential_ransac
    from tpu3d.geometry.fivepoint import five_point_ransac

    K, D, B = 2048, 128, args.B
    rng = np.random.default_rng(0)
    v = jnp.ones((B, K), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    mm = jax.jit(jax.vmap(lambda a, b, va, vb: match_descriptors(a, b, va, vb, ratio=0.95).idx1))
    fe = jax.jit(jax.vmap(lambda k, a, b, vv: find_essential_ransac(
        k, a, b, vv, 1189.0, threshold_px=1.0, num_hypotheses=512).num_inliers))
    fp = jax.jit(jax.vmap(lambda k, a, b, vv: five_point_ransac(
        k, a, b, vv, 1189.0, threshold_px=1.0, num_hypotheses=128)[2]))

    def fresh():
        d0 = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
        d1 = jnp.asarray(rng.normal(0, 1, (B, K, D)).astype(np.float32))
        uv0 = jnp.asarray(rng.uniform(-300, 300, (B, K, 2)).astype(np.float32))
        uv1 = jnp.asarray(rng.uniform(-300, 300, (B, K, 2)).astype(np.float32))
        return d0, d1, uv0, uv1

    d0, d1, uv0, uv1 = fresh()
    for name, f, mk in [
        ("mnn", mm, lambda: (d0, d1, v, v)),
        ("8pt_ransac512", fe, lambda: (keys, uv0, uv1, v)),
        ("5pt_ransac128", fp, lambda: (keys, uv0, uv1, v)),
    ]:
        np.asarray(f(*mk()))  # compile
        best = 1e9
        for _ in range(3):
            d0, d1, uv0, uv1 = fresh()
            t0 = time.time()
            np.asarray(f(*mk()))
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f} s for B={B} ({best / B * 1e3:.1f} ms/edge)")


if __name__ == "__main__":
    main()
