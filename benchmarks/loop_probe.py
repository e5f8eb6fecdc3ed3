"""Does lax.while_loop cost a host round trip per iteration on the remote
axon backend? Times a trivial N-iteration while_loop vs N, plus the real
bundle_adjust at bench shapes vs max_iters.

Usage: python benchmarks/loop_probe.py [--cpu]
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
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(state):
            i, v = state
            return i + 1, v * 1.000001 + 1e-9

        def cond(state):
            return state[0] < n

        return jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), x))[1]

    x = jnp.ones((128, 128), jnp.float32)
    for n in (1, 10, 100, 1000):
        np.asarray(loop(x, n))  # compile
        t0 = time.time()
        for _ in range(3):
            np.asarray(loop(x * 1.0, n))
        print(f"[loop] while_loop n={n:5d}: {(time.time() - t0) / 3 * 1e3:8.1f} ms",
              flush=True)

    # Real solver scaling: bench-shaped global BA.
    from tpu3d.ba.lm import bundle_adjust

    rng = np.random.default_rng(0)
    C, P, O = 32, 16384, 65536
    cams = np.zeros((C, 6), np.float32)
    cams[:, 5] = np.linspace(0, 1, C)
    pts = rng.normal(0, 1, (P, 3)).astype(np.float32) + [0, 0, 6]
    ci = np.sort(rng.integers(0, 24, O)).astype(np.int32)
    pi = np.sort(rng.integers(0, P, O)).astype(np.int32)
    from tpu3d.ba.residuals import reprojection_residuals

    uv = np.asarray(reprojection_residuals(
        jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci), jnp.asarray(pi),
        jnp.zeros((O, 2), np.float32), jnp.ones(O, np.float32))) * -1.0
    uv += rng.normal(0, 1e-4, uv.shape).astype(np.float32)
    w = np.ones(O, np.float32)
    cam_fixed = np.zeros(C, np.float32)
    cam_fixed[0] = 1.0
    for mi in (5, 10, 20):
        args_d = (jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci),
                  jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w),
                  jnp.asarray(cam_fixed))
        st = bundle_adjust(*args_d, max_iters=mi, cg_iters=32,
                           stall_tol=0.0, pt_sorted=True)
        np.asarray(st.cams)
        t0 = time.time()
        for _ in range(3):
            st = bundle_adjust(*args_d, max_iters=mi, cg_iters=32,
                               stall_tol=0.0, pt_sorted=True)
            np.asarray(st.cams)
        print(f"[loop] bundle_adjust max_iters={mi:3d}: "
              f"{(time.time() - t0) / 3 * 1e3:8.1f} ms (n_iters={int(st.n_iters)})",
              flush=True)


if __name__ == "__main__":
    main()
