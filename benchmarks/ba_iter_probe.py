"""Where do global-BA LM iterations spend their 0.35 s/iter (full-run
shapes)? Ablates CG budget, block rebuild, and problem size on the live
backend. Usage: python benchmarks/ba_iter_probe.py [backend]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

from tpu3d.ba.lm import bundle_adjust


def make_problem(C=296, P=45056, O=65536, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    X[:, 2] += 6.0
    cams = rng.normal(0, 0.01, (C, 6)).astype(np.float32)
    ci = rng.integers(0, C, O).astype(np.int32)
    pi = np.sort(rng.integers(0, P, O)).astype(np.int32)
    uv = (X[pi, :2] / X[pi, 2:3] + rng.normal(0, 1e-3, (O, 2))).astype(np.float32)
    w = np.ones(O, np.float32)
    cf = np.zeros(C, np.float32)
    cf[0] = 1.0
    pf = np.zeros(P, np.float32)
    return (jnp.asarray(cams), jnp.asarray(X), jnp.asarray(ci),
            jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w),
            jnp.asarray(cf), jnp.asarray(pf))


def timed(args, **kw):
    # Barrier through a real device_get: block_until_ready returns EARLY
    # on the axon remote backend (r2 finding) — r4's numbers from this
    # probe used it and may underestimate.
    st = bundle_adjust(*args, pt_sorted=True, **kw)
    np.asarray(st.cams[:1])  # compile
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        st = bundle_adjust(*args, pt_sorted=True, **kw)
        np.asarray(st.cams[:1])
        best = min(best, time.time() - t0)
    return best, int(st.n_iters)


def main():
    out = {"backend": jax.default_backend()}
    args = make_problem()
    for name, kw in [
        ("mid_12x24", dict(max_iters=12, cg_iters=24)),
        ("mid_12x8", dict(max_iters=12, cg_iters=8)),
        ("blocks_only_1x1", dict(max_iters=1, cg_iters=1)),
        ("full_20x32", dict(max_iters=20, cg_iters=32)),
        ("robust_12x24", dict(max_iters=12, cg_iters=24, robust_delta=1e-3)),
    ]:
        secs, it = timed(args, **kw)
        out[name] = {"s": round(secs, 3), "iters": it,
                     "s_per_lm_iter": round(secs / max(it, 1), 4)}
    # smaller problem (mid-run shapes)
    args_s = make_problem(C=64, P=8192, O=16384)
    secs, it = timed(args_s, max_iters=12, cg_iters=24)
    out["small_12x24"] = {"s": round(secs, 3), "iters": it}
    # the REAL full-dataset ladder endpoint: 290 cams x ~570 obs/cam
    args_xl = make_problem(C=296, P=45056, O=262144)
    for name, kw in [("xl_12x24", dict(max_iters=12, cg_iters=24)),
                     ("xl_12x8", dict(max_iters=12, cg_iters=8))]:
        secs, it = timed(args_xl, **kw)
        out[name] = {"s": round(secs, 3), "iters": it,
                     "s_per_lm_iter": round(secs / max(it, 1), 4)}
    print(json.dumps(out))


# --- r5 flat-layout A/B (appended; runs when invoked with 'flat') --------
def main_flat():
    import json as _json
    out = {"backend": jax.default_backend()}
    args_xl = make_problem(C=296, P=45056, O=262144)
    for name, kw in [
        ("xl_dense_12x24", dict(max_iters=12, cg_iters=24, flat_layout=False)),
        ("xl_flat_12x24", dict(max_iters=12, cg_iters=24, flat_layout=True)),
        ("xl_flat_robust", dict(max_iters=12, cg_iters=24, flat_layout=True,
                                robust_delta=1e-3)),
    ]:
        secs, it = timed(args_xl, **kw)
        out[name] = {"s": round(secs, 3), "iters": it,
                     "s_per_lm_iter": round(secs / max(it, 1), 4)}
    a = bundle_adjust(*args_xl, pt_sorted=True, max_iters=12, cg_iters=24,
                      flat_layout=False)
    b = bundle_adjust(*args_xl, pt_sorted=True, max_iters=12, cg_iters=24,
                      flat_layout=True)
    ca, cb = np.asarray(a.cams), np.asarray(b.cams)
    out["cost_dense"] = float(a.cost)
    out["cost_flat"] = float(b.cost)
    out["cams_maxdiff"] = float(np.max(np.abs(ca - cb)))
    out["cams_bitwise"] = bool(np.array_equal(ca, cb))
    print(_json.dumps(out))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "flat":
    main_flat()
    sys.exit(0)


if __name__ == "__main__":
    main()

