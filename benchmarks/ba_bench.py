"""Profile bundle_adjust at full-290 reconstruction shapes.

Differences out the LM phases by varying (max_iters, cg_iters):
  - jac+blocks cost  ~ t(max_iters=K, cg=1) - t(max_iters=K, cg=0 is
    impossible; use cg=1 as the floor)
  - per-CG-iter cost ~ (t(cg=32) - t(cg=1)) / 31 / iters
Runs a fixed-iteration variant (early exit disabled by construction:
synthetic noise keeps LM improving) so timings are per-iteration clean.

Usage:  python benchmarks/ba_bench.py [--cpu] [--obs 262144] [--cams 512]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cams", type=int, default=512)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--obs", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3d.ba.lm import bundle_adjust
    from tpu3d.ba.residuals import _project_one

    C, P, O = args.cams, args.points, args.obs
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    cams = np.zeros((C, 6), np.float32)
    cams[:, 1] = np.linspace(0, 2 * np.pi, C, endpoint=False)
    cams[:, 5] = 4.0
    cam_idx = rng.integers(0, C, O).astype(np.int32)
    pt_idx = rng.integers(0, P, O).astype(np.int32)
    uv = np.array(jax.vmap(_project_one)(jnp.asarray(cams)[cam_idx],
                                         jnp.asarray(pts)[pt_idx]))
    uv += rng.normal(0, 2e-4, uv.shape).astype(np.float32)
    w = np.ones(O, np.float32)
    cam_fixed = np.zeros(C, np.float32)
    cam_fixed[0] = 1.0
    cams_n = cams + rng.normal(0, 3e-3, cams.shape).astype(np.float32)
    pts_n = pts + rng.normal(0, 3e-3, pts.shape).astype(np.float32)
    A = (jnp.asarray(cams_n), jnp.asarray(pts_n), jnp.asarray(cam_idx),
         jnp.asarray(pt_idx), jnp.asarray(uv), jnp.asarray(w),
         jnp.asarray(cam_fixed))

    def timed(max_iters, cg_iters, cg_tol=0.0):
        st = bundle_adjust(*A, max_iters=max_iters, cg_iters=cg_iters,
                           cg_tol=cg_tol)
        jax.block_until_ready(st.cams)  # warm/compile
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            st = bundle_adjust(*A, max_iters=max_iters, cg_iters=cg_iters,
                               cg_tol=cg_tol)
            jax.block_until_ready(st.cams)
            ts.append(time.time() - t0)
        return min(ts), float(st.cost), int(st.n_iters)

    report = {"backend": jax.default_backend(),
              "shape": {"C": C, "P": P, "O": O}}
    # Host<->device transfer rates: on the remote-TPU tunnel these bound
    # every per-call upload (the BA problem is ~5.5 MB).
    report["transfer"] = {}
    for mb in (1, 4, 16):
        a = np.zeros((mb * 262144,), np.float32)
        t0 = time.time()
        d = jnp.asarray(a)
        jax.block_until_ready(d)
        t_up = time.time() - t0
        t0 = time.time()
        np.asarray(d)
        t_down = time.time() - t0
        report["transfer"][f"{mb}MB"] = {
            "up_s": round(t_up, 3), "down_s": round(t_down, 3)}
    t_full, cost_full, it_full = timed(20, 32)
    t_tol, cost_tol, it_tol = timed(20, 32, cg_tol=1e-3)
    t_cg1, cost_cg1, _ = timed(20, 1)
    t_it2, _, _ = timed(2, 32)
    t_it1, _, _ = timed(1, 32)
    report["lm_iters"] = {"cg32": it_full, "cg32_tol1e3": it_tol}
    # max_iters differencing gives a clean per-LM-iteration cost; cg
    # differencing attributes it between the CG loop and jac/blocks.
    per_lm_iter = t_it2 - t_it1
    report["seconds"] = {
        "full_20x32": round(t_full, 3),
        "full_20x32_tol1e3": round(t_tol, 3),
        "cg1_20x1": round(t_cg1, 3),
        "per_lm_iter_at_cg32": round(per_lm_iter, 4),
        "per_cg_iter": round((t_full - t_cg1) / (31 * 20), 5),
        "jac_blocks_per_iter": round(t_cg1 / 20, 4),
    }
    report["final_cost"] = {"cg32": cost_full, "cg32_tol1e3": cost_tol,
                            "cg1": cost_cg1}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
