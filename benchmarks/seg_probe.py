"""Primitive probe: the BA inner loop's gather/segment-sum costs on TPU.

Answers three questions at the real global-BA shape (O=262144 obs,
P=65536 points, C=512 cameras):
  1. Does `indices_are_sorted` make XLA's scatter-add (segment_sum) or
     gather measurably faster on TPU? (If yes: sort obs by point on the
     host once per solve.)
  2. What does a one-hot matmul replacement for the CAMERA-axis gather +
     segment-sum cost vs the native ops? (C=512 makes the one-hot matrix
     537 MB f32 — bandwidth-bound MXU work instead of latency-bound
     gathers.)
  3. Baseline per-op costs to sanity-check ba_bench's per-CG-iter number.

Usage: python benchmarks/seg_probe.py [--cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=5):
    """fn(rep_scale, *args): derive FRESH data from rep_scale — the remote
    backend memoizes identical-arg executions and reports ~0.05 ms."""
    import jax

    jax.block_until_ready(fn(1.5, *args))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(1.0 + 1e-6 * i, *args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--obs", type=int, default=262144)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--cams", type=int, default=512)
    args = ap.parse_args()
    import functools

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    O, P, C = args.obs, args.points, args.cams
    rng = np.random.default_rng(0)
    pt_idx = rng.integers(0, P, O).astype(np.int32)
    cam_idx = rng.integers(0, C, O).astype(np.int32)
    d3 = jnp.asarray(rng.normal(size=(O, 3)).astype(np.float32))
    d6 = jnp.asarray(rng.normal(size=(O, 6)).astype(np.float32))
    xc = jnp.asarray(rng.normal(size=(C, 6)).astype(np.float32))
    xp = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
    r = {"backend": jax.default_backend(),
         "shape": {"O": O, "P": P, "C": C}}

    @functools.partial(jax.jit, static_argnames=("srt",))
    def seg_p(c, d, i, srt):
        return jax.ops.segment_sum(d * c, i, num_segments=P,
                                   indices_are_sorted=srt)

    @functools.partial(jax.jit, static_argnames=("srt",))
    def gat(c, x, i, srt):
        return jnp.take(x * c, i, axis=0, indices_are_sorted=srt)

    i_rand = jnp.asarray(pt_idx)
    i_sort = jnp.asarray(np.sort(pt_idx))
    r["segsum_P_random"] = timeit(seg_p, d3, i_rand, False)
    r["segsum_P_sorted_hint"] = timeit(seg_p, d3, i_sort, True)
    r["gather_P_random"] = timeit(gat, xp, i_rand, False)
    r["gather_P_sorted_hint"] = timeit(gat, xp, i_sort, True)

    ci = jnp.asarray(cam_idx)
    r["gather_C_random"] = timeit(gat, xc, ci, False)

    @jax.jit
    def seg_c(c, d, i):
        return jax.ops.segment_sum(d * c, i, num_segments=C)

    r["segsum_C_random"] = timeit(seg_c, d6, ci)

    # one-hot replacements for the camera axis (built once per solve,
    # reused every CG iteration / LM iteration)
    onehot = jax.nn.one_hot(ci, C, dtype=jnp.float32)  # (O, C)
    jax.block_until_ready(onehot)

    @jax.jit
    def gat_mm(c, x, oh):
        with jax.default_matmul_precision("float32"):
            return oh @ (x * c)                 # (O, C) @ (C, 6)

    @jax.jit
    def seg_mm(c, d, oh):
        with jax.default_matmul_precision("float32"):
            return oh.T @ (d * c)               # (C, O) @ (O, 6)

    r["gather_C_onehot_mm"] = timeit(gat_mm, xc, onehot)
    r["segsum_C_onehot_mm"] = timeit(seg_mm, d6, onehot)
    r = {k: (round(v, 5) if isinstance(v, float) else v) for k, v in r.items()}
    print(json.dumps(r))


if __name__ == "__main__":
    main()
