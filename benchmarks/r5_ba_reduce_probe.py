"""Round-5 BA probe: where does the 0.19 s/LM-iter go at the 262k-obs
shape, and is a cam-sorted stable-order segment reduction (a) faster than
the unsorted scatter and (b) BITWISE-identical to it?

The r4 seg_matmul attempt won 21 %/iter but shifted reduction-order
numerics enough to flip gate cascades (287 -> 280 cams). A stable sort by
cam index preserves each camera's per-observation accumulation ORDER, so
if TPU scatter-add serializes updates in operand order (it does: XLA
scatter on TPU is deterministic and sequential), a sorted-segment sum
adds exactly the same numbers in exactly the same order per segment —
candidate for a bit-identical fast path.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu3d.ba.residuals import observation_jacobians

C, P, O = 296, 45056, 262144


def _get(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        _get(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        _get(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    X[:, 2] += 6.0
    cams = rng.normal(0, 0.01, (C, 6)).astype(np.float32)
    ci = rng.integers(0, C, O).astype(np.int32)
    pi = np.sort(rng.integers(0, P, O)).astype(np.int32)
    uv = (X[pi, :2] / X[pi, 2:3] + rng.normal(0, 1e-3, (O, 2))).astype(np.float32)
    w = np.ones(O, np.float32)

    d_cams, d_X = jnp.asarray(cams), jnp.asarray(X)
    d_ci, d_pi = jnp.asarray(ci), jnp.asarray(pi)
    d_uv, d_w = jnp.asarray(uv), jnp.asarray(w)

    res = {"backend": jax.default_backend()}

    # --- jacobians alone --------------------------------------------------
    jac = jax.jit(lambda c, x: observation_jacobians(c, x, d_ci, d_pi, d_uv, d_w))
    res["jacobians_s"] = timeit(jac, d_cams, d_X)
    r, Jc, Jp = jac(d_cams, d_X)
    JcJc = jax.jit(lambda a: jnp.einsum("oia,oib->oab", a, a))(Jc)  # (O,6,6)

    # --- cam-axis reductions: three formulations --------------------------
    # NOTE: aux arrays must be jit ARGUMENTS — closure-captured device
    # arrays embed as HLO constants, and the 310 MB one-hot blew the axon
    # compile request (HTTP 413).
    def red_unsorted(x, ci_):
        return jax.ops.segment_sum(x, ci_, num_segments=C)

    # stable sort by cam: per-segment accumulation order preserved
    perm = np.argsort(ci, kind="stable").astype(np.int32)
    d_perm = jnp.asarray(perm)
    d_ci_sorted = jnp.asarray(ci[perm])

    def red_sorted(x, perm_, cis_):
        xs = jnp.take(x, perm_, axis=0)
        return jax.ops.segment_sum(xs, cis_, num_segments=C,
                                   indices_are_sorted=True)

    def red_matmul(x, ci_):
        k = int(np.prod(x.shape[1:]))
        onehot = jax.nn.one_hot(ci_, C, dtype=jnp.float32)
        with jax.default_matmul_precision("float32"):
            return jnp.einsum("oc,ok->ck", onehot,
                              x.reshape(O, k)).reshape(C, *x.shape[1:])

    res["red_unsorted_s"] = timeit(jax.jit(red_unsorted), JcJc, d_ci)
    res["red_sorted_s"] = timeit(jax.jit(red_sorted), JcJc, d_perm, d_ci_sorted)
    res["red_matmul_s"] = timeit(jax.jit(red_matmul), JcJc, d_ci)

    a = np.asarray(jax.jit(red_unsorted)(JcJc, d_ci))
    b = np.asarray(jax.jit(red_sorted)(JcJc, d_perm, d_ci_sorted))
    c = np.asarray(jax.jit(red_matmul)(JcJc, d_ci))
    res["sorted_bitwise_equal"] = bool(np.array_equal(a, b))
    res["matmul_bitwise_equal"] = bool(np.array_equal(a, c))
    res["sorted_maxrel"] = float(np.max(np.abs(a - b) / np.maximum(np.abs(a), 1e-12)))
    res["matmul_maxrel"] = float(np.max(np.abs(a - c) / np.maximum(np.abs(a), 1e-12)))

    # --- pt-axis reduction (45k segments, already sorted) ------------------
    JpJp = jax.jit(lambda a: jnp.einsum("oia,oib->oab", a, a))(Jp)
    res["red_pt_sorted_s"] = timeit(jax.jit(
        lambda x: jax.ops.segment_sum(x, d_pi, num_segments=P,
                                      indices_are_sorted=True)), JpJp)
    res["red_pt_unsortedflag_s"] = timeit(jax.jit(
        lambda x: jax.ops.segment_sum(x, d_pi, num_segments=P)), JpJp)

    # --- full blocks-build in the three modes ------------------------------
    def blocks(mode):
        def f(cams_, X_, ci_, pi_, uv_, w_, perm_, cis_):
            r, Jc, Jp = observation_jacobians(cams_, X_, ci_, pi_, uv_, w_)
            if mode == "unsorted":
                seg_cam = lambda x: red_unsorted(x, ci_)
            elif mode == "sorted":
                seg_cam = lambda x: red_sorted(x, perm_, cis_)
            else:
                seg_cam = lambda x: red_matmul(x, ci_)
            Ucc = seg_cam(jnp.einsum("oia,oib->oab", Jc, Jc))
            Vpp = jax.ops.segment_sum(jnp.einsum("oia,oib->oab", Jp, Jp),
                                      pi_, num_segments=P,
                                      indices_are_sorted=True)
            Wcp = jnp.einsum("oia,oib->oab", Jc, Jp)
            gc = seg_cam(jnp.einsum("oia,oi->oa", Jc, r))
            gp = jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jp, r), pi_,
                                     num_segments=P, indices_are_sorted=True)
            return Ucc, Vpp, Wcp, gc, gp
        return jax.jit(f)

    argsb = (d_cams, d_X, d_ci, d_pi, d_uv, d_w, d_perm, d_ci_sorted)
    res["blocks_unsorted_s"] = timeit(blocks("unsorted"), *argsb)
    res["blocks_sorted_s"] = timeit(blocks("sorted"), *argsb)
    res["blocks_matmul_s"] = timeit(blocks("matmul"), *argsb)

    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
