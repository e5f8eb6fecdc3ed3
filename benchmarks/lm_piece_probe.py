"""Per-piece timing of the LM/Schur-CG step at global-BA shape.

ba_bench's differencing says ~0.33 s per LM iteration (jac+blocks ~0.09,
CG-32 ~0.24) but the primitive probe says individual gathers/segment-sums
cost ~0.1 ms — this probe times each piece as its own jitted function
(fresh inputs per rep; the remote backend memoizes identical args):

  jacobians   — observation_jacobians (per-camera-factored)
  blocks      — Ucc/Vpp/Wcp/gc/gp from (r, Jc, Jp)
  matvec_x1   — one Schur matvec given blocks
  matvec_x16  — 16 matvecs under lax.fori_loop (loop-context per-iter cost)
  precond_x16 — 16 preconditioner applications (einsum with Uinv)

Usage: python benchmarks/lm_piece_probe.py [--cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, reps=5):
    import jax

    jax.block_until_ready(fn(1.5, *args))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(1.0 + 1e-6 * i, *args))
        ts.append(time.time() - t0)
    return round(min(ts), 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cams", type=int, default=512)
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--obs", type=int, default=262144)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from tpu3d.ba.lm import _seg_sum, _spd_inv3
    from tpu3d.ba.residuals import observation_jacobians

    C, P, O = args.cams, args.points, args.obs
    rng = np.random.default_rng(0)
    cams = jnp.asarray(rng.normal(0, 0.3, (C, 6)).astype(np.float32))
    pts = jnp.asarray((rng.normal(0, 1, (P, 3)) + [0, 0, 5]).astype(np.float32))
    ci = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
    pi = jnp.asarray(np.sort(rng.integers(0, P, O)).astype(np.int32))
    uv = jnp.asarray(rng.normal(0, 0.2, (O, 2)).astype(np.float32))
    w = jnp.ones((O,), jnp.float32)
    r = {"backend": jax.default_backend(), "shape": {"C": C, "P": P, "O": O}}

    @jax.jit
    def jac(c):
        with jax.default_matmul_precision("float32"):
            return observation_jacobians(cams * c, pts, ci, pi, uv, w)

    r["jacobians"] = timeit(jac)
    r_, Jc, Jp = jax.block_until_ready(jac(1.0))

    @jax.jit
    def blocks(c, r_, Jc, Jp):
        with jax.default_matmul_precision("float32"):
            Jc = Jc * c
            Ucc = _seg_sum(jnp.einsum("oia,oib->oab", Jc, Jc), ci, C)
            Vpp = _seg_sum(jnp.einsum("oia,oib->oab", Jp, Jp), pi, P, True)
            Wcp = jnp.einsum("oia,oib->oab", Jc, Jp)
            gc = _seg_sum(jnp.einsum("oia,oi->oa", Jc, r_), ci, C)
            gp = _seg_sum(jnp.einsum("oia,oi->oa", Jp, r_), pi, P, True)
            return Ucc, Vpp, Wcp, gc, gp

    r["blocks"] = timeit(blocks, r_, Jc, Jp)
    Ucc, Vpp, Wcp, gc, gp = jax.block_until_ready(blocks(1.0, r_, Jc, Jp))
    Vinv = jax.block_until_ready(_spd_inv3(Vpp, jnp.full((P,), 1e-4)))
    damp = jnp.abs(gc) * 0 + 1e-3

    def mv(x):
        Ux = jnp.einsum("cab,cb->ca", Ucc, x) + damp * x
        a = jnp.einsum("oab,oa->ob", Wcp, x[ci])
        bp = _seg_sum(a, pi, P, True)
        cp = jnp.einsum("pab,pb->pa", Vinv, bp)
        d = jnp.einsum("oab,ob->oa", Wcp,
                       jnp.take(cp, pi, axis=0, indices_are_sorted=True))
        return Ux - _seg_sum(d, ci, C)

    @jax.jit
    def mv1(c):
        with jax.default_matmul_precision("float32"):
            return mv(gc * c)

    @jax.jit
    def mv16(c):
        with jax.default_matmul_precision("float32"):
            return jax.lax.fori_loop(0, 16, lambda i, x: mv(x) * (1 - 1e-9), gc * c)

    r["matvec_x1"] = timeit(mv1)
    r["matvec_x16"] = timeit(mv16)

    Uinv = jax.block_until_ready(jnp.linalg.inv(
        Ucc + 1e-3 * jnp.eye(6, dtype=jnp.float32)[None]))

    @jax.jit
    def pre16(c):
        return jax.lax.fori_loop(
            0, 16, lambda i, v: jnp.einsum("cab,cb->ca", Uinv, v) * (1 - 1e-9),
            gc * c)

    r["precond_x16"] = timeit(pre16)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
