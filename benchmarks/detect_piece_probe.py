"""Piece-wise timing of detect_octave's interior (TPU).

extract_phase_probe showed detect at 345-420 ms/batch and that swapping
the top-k implementation barely moves it — so the cost is elsewhere:
3x3x3 extrema pools, the 8-roll edge mask, NMS pool, top-k, or the
Pallas-patch subpixel refinement. Each piece is timed as its own jitted
function at octave-0 shape.

Usage: python benchmarks/detect_piece_probe.py [--cpu] [--batch 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, reps=10):
    import jax

    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        leaf.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        leaf.block_until_ready()
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="648,968")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.features import detector as D

    B = args.batch
    H, W = (int(x) for x in args.hw.split(","))
    S = 3
    rng = np.random.default_rng(0)
    dog = jnp.asarray(rng.normal(0, 0.02, (B, S + 2, H, W)).astype(np.float32))

    t = bench(jax.jit(lambda d: (D._maxpool3d(d), D._minpool3d(d))), dog)
    print(f"extrema pools   {t * 1e3:7.1f} ms")

    interior = dog[:, 1 : S + 1]
    t = bench(jax.jit(lambda d: D._edge_mask(d, 10.0)), interior)
    print(f"edge mask       {t * 1e3:7.1f} ms")

    score = jnp.abs(interior)
    t = bench(jax.jit(lambda s: jax.lax.reduce_window(
        s, -jnp.inf, jax.lax.max, (1, 1, 5, 5), (1, 1, 1, 1), "SAME")), score)
    print(f"nms pool        {t * 1e3:7.1f} ms")

    flat = score.reshape(B, -1)
    t = bench(jax.jit(lambda f: jax.lax.top_k(f, 2048)), flat)
    print(f"top_k sort      {t * 1e3:7.1f} ms")
    t = bench(jax.jit(lambda f: D._topk_threshold(f, 2048)), flat)
    print(f"topk threshold  {t * 1e3:7.1f} ms")

    vals, idx = jax.lax.top_k(flat, 2048)
    s_idx = (idx // (H * W)).astype(jnp.int32)
    rem = idx % (H * W)
    y_idx = (rem // W).astype(jnp.int32)
    x_idx = (rem % W).astype(jnp.int32)

    def subpix(d, si, yi, xi):
        return jnp.stack([
            D._subpixel_offsets(d[b], si[b] + 1, yi[b], xi[b]) for b in range(B)
        ])

    t = bench(jax.jit(subpix), dog, s_idx, y_idx, x_idx)
    print(f"subpixel        {t * 1e3:7.1f} ms")

    t = bench(jax.jit(lambda d: D.detect_octave(d, 2048, 0.006, 10.0, 2)), dog)
    print(f"detect_octave   {t * 1e3:7.1f} ms (oct0 whole)")


if __name__ == "__main__":
    main()
